"""NativeDeviceConverter: device dedup pass + C++ merge/staging.

The TPU pipeline's per-level host half — LSM winner merge, overflow
accounting, flush ordering — runs inside the C++ engine
(native/pc_engine.cpp ``merge_level``) instead of Python/NumPy
(convert/device.py steps 3-4). The device still does the per-point work
(hex quantization + the fused 3-key sort + batch-winner flags,
ops/dedup.py); the engine consumes the pass output directly and keeps all
cell state in its flat-hash slot grids, so nothing is re-sorted or
re-uploaded host-side. Semantics contract as the other backends
(reference: point-converter/src/converter.rs:106-139, cell.rs:70-153);
stores are byte-identical to the host oracle
(tests/test_native_engine.py::TestNativeDeviceParity).

Per batch: while a level is at/above the host-cascade threshold, one
device pass -> one ``pc_engine_merge_level`` -> ``pc_engine_take_level``
feeds the next level; the sub-threshold tail finishes natively in one
``pc_engine_cascade_from`` call (no device dispatch latency on small
levels). Cross-batch pipelining reuses DeviceConverter's prefetch hook:
batch k+1's level-0 upload+sort overlaps batch k's native merging.

Spilling/incremental merge work exactly as in NativeConverter: the engine
lazily loads existing store cells on touch and spills the coldest cells
between batches when ``cache_size`` is exceeded.
"""

from __future__ import annotations

import ctypes

import numpy as np

from ..core.point import PointBatch
from ..utils.tracing import stage
from .device import DevicePrefetchMixin, HOST_CASCADE_THRESHOLD
from .native import NativeConverter


def _ptr(arr: np.ndarray) -> ctypes.c_void_p:
    return arr.ctypes.data_as(ctypes.c_void_p)


class NativeDeviceConverter(DevicePrefetchMixin, NativeConverter):
    """Device-pass converter whose cell state lives in the C++ engine."""

    def add_points_batch(self, batch: PointBatch) -> None:
        from ..ops.dedup import collect_dedup, dispatch_dedup

        self._update_bounding_box(batch)
        self.metadata.number_of_points += len(batch)
        if len(batch) == 0:
            return
        positions = np.ascontiguousarray(batch.positions, np.float32)
        colors = np.ascontiguousarray(batch.colors, np.uint8)
        prefetch_handle = self._take_prefetch(batch.positions)
        config = self.metadata.config
        lib, engine = self._lib, self._engine
        hierarchy = 0
        while len(positions):
            if (
                len(positions) < HOST_CASCADE_THRESHOLD
                and prefetch_handle is None
            ):
                # small tail: the engine finishes the cascade natively
                # (a device pass costs a fixed dispatch+transfer latency
                # small levels never amortize — see device.py)
                with stage("native_tail_cascade"):
                    lib.pc_engine_cascade_from(
                        engine, hierarchy, _ptr(positions), _ptr(colors),
                        len(positions),
                    )
                break
            cell_size = config.cell_size(hierarchy)
            sub_cell_size = config.sub_cell_size(cell_size)
            handle = prefetch_handle or dispatch_dedup(
                positions, cell_size, sub_cell_size
            )
            prefetch_handle = None
            with stage("device_dedup+rebuild"):
                perm, winner, cell_idx, sub_idx, dist, next_idx = (
                    collect_dedup(handle, positions, cell_size,
                                  sub_cell_size)
                )
            pos_s = np.ascontiguousarray(positions[perm])
            col_s = np.ascontiguousarray(colors[perm])
            with stage("native_merge_level"):
                n_out = lib.pc_engine_merge_level(
                    engine, hierarchy, len(pos_s), _ptr(pos_s),
                    _ptr(col_s),
                    _ptr(np.ascontiguousarray(cell_idx, np.int32)),
                    _ptr(np.ascontiguousarray(sub_idx, np.int32)),
                    _ptr(np.ascontiguousarray(dist, np.float32)),
                    _ptr(np.ascontiguousarray(winner, np.uint8)),
                    _ptr(np.ascontiguousarray(next_idx, np.int32)),
                )
                if n_out < 0:
                    self._raise_load_error()
                positions = np.empty((n_out, 3), np.float32)
                colors = np.empty((n_out, 4), np.uint8)
                lib.pc_engine_take_level(engine, _ptr(positions),
                                         _ptr(colors))
            hierarchy += 1
        if lib.pc_engine_end_batch(engine) < 0:
            self._raise_load_error()
        levels = lib.pc_engine_max_level(engine)
        if levels > self.metadata.hierarchies:
            self.metadata.hierarchies = levels

    def _raise_load_error(self) -> None:
        raise OSError(
            "corrupt or mismatched cell file encountered while lazily "
            "loading the existing store; conversion aborted (the store "
            "is left untouched — no writes happen after a load error)"
        )
