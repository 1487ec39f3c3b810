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
device pass -> one ``pc_engine_merge_level_raw`` (the engine gathers the
device's packed permutation, recomputes the hex keys bit-identically, and
resolves hash-collision suspects — all in C++) -> ``pc_engine_take_level``
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
from .device import DevicePrefetchMixin
from .native import NativeConverter

import os as _os

# the engine finishes sub-threshold cascade tails natively. Its insert
# loop runs ~5 Mrows/s on this host while a tunnel-linked device pass
# costs a fixed ~60-90 ms, so the break-even sits near 2^15 rows (the
# Python-cell converter keeps the lower device.py default — its host
# tail is NumPy, not the engine). Override with
# PCT_NATIVE_CASCADE_THRESHOLD (log2); on a PCIe host ~2^13 is right.
HOST_CASCADE_THRESHOLD = 1 << int(
    _os.environ.get("PCT_NATIVE_CASCADE_THRESHOLD", "15")
)


def _ptr(arr: np.ndarray) -> ctypes.c_void_p:
    return arr.ctypes.data_as(ctypes.c_void_p)


class NativeDeviceConverter(DevicePrefetchMixin, NativeConverter):
    """Device-pass converter whose cell state lives in the C++ engine."""

    def add_points_batch(self, batch: PointBatch) -> None:
        self._update_bounding_box(batch)
        self.metadata.number_of_points += len(batch)
        if len(batch) == 0:
            return
        self._run_cascade(
            np.ascontiguousarray(batch.positions, np.float32),
            np.ascontiguousarray(batch.colors, np.uint8),
            self._take_prefetch(batch.positions),
            seq=0,
        )

    # --- wavefront hooks (no-ops in the serial converter) -----------------

    def _wait_level(self, seq: int, hierarchy: int) -> None:
        """Block until the previous batch finished its ``hierarchy`` merge
        (engine cell mutations must happen in batch order per level)."""

    def _mark_level(self, seq: int, hierarchy: int) -> None:
        """Record that this batch finished its ``hierarchy`` merge."""

    import contextlib as _contextlib

    @_contextlib.contextmanager
    def _engine_guard(self):
        """Serialize engine calls (single lock in the pipelined variant)."""
        yield

    def _run_cascade(self, positions, colors, prefetch_handle,
                     seq: int) -> None:
        from ..ops.dedup import dispatch_dedup_auto
        from .device import RESIDENT_ENABLED

        config = self.metadata.config
        lib, engine = self._lib, self._engine
        hierarchy = 0
        # device-resident cascade state: src maps this level's rows into
        # the level-0 device buffer (engine take_level threads it through
        # the staging); levels >= 1 then upload 4 B/row of indices
        resident = None
        src: np.ndarray | None = None
        while len(positions):
            if (
                len(positions) < HOST_CASCADE_THRESHOLD
                and prefetch_handle is None
            ):
                # small tail: the engine finishes the cascade natively
                # (a device pass costs a fixed dispatch+transfer latency
                # small levels never amortize — see device.py). The tail
                # touches every level >= hierarchy, so it waits for the
                # predecessor batch to finish entirely
                self._wait_level(seq, 63)
                with stage("native_tail_cascade"), self._engine_guard():
                    lib.pc_engine_cascade_from(
                        engine, hierarchy, _ptr(positions), _ptr(colors),
                        len(positions),
                    )
                break
            cell_size = config.cell_size(hierarchy)
            sub_cell_size = config.sub_cell_size(cell_size)
            handle, resident, src, src_arr = dispatch_dedup_auto(
                resident, src, positions, cell_size, sub_cell_size,
                prefetch_handle=prefetch_handle,
                enabled=RESIDENT_ENABLED,
            )
            prefetch_handle = None
            # the engine's fused raw entry does the perm gather, the hex
            # key recompute, and the exact suspect re-dedup in one C++
            # pass (merge_level_raw) — the NumPy host_rebuild +
            # three perm-gathers this replaces cost ~1.6 s/Mpts on this
            # host vs ~0.2 s for the same math in the engine (PERF.md)
            n_rows = handle["n"]
            with stage("d2h_wait"):
                packed = np.ascontiguousarray(
                    np.asarray(handle["packed"])[:n_rows], np.int32
                )
            src_s = np.ascontiguousarray(src_arr, np.int32)
            self._wait_level(seq, hierarchy)
            with stage("native_merge_level"), self._engine_guard():
                n_out = lib.pc_engine_merge_level_raw(
                    engine, hierarchy, n_rows, _ptr(positions),
                    _ptr(colors), _ptr(src_s), _ptr(packed),
                )
                if n_out < 0:
                    self._raise_load_error()
                positions = np.empty((n_out, 3), np.float32)
                colors = np.empty((n_out, 4), np.uint8)
                src = np.empty(n_out, np.int32)
                lib.pc_engine_take_level(engine, _ptr(positions),
                                         _ptr(colors), _ptr(src))
            self._mark_level(seq, hierarchy)
            hierarchy += 1
        # end-of-batch bookkeeping (spill + error latch) runs strictly in
        # batch order: the predecessor marks fully-done only after ITS
        # end_batch
        self._wait_level(seq, 63)
        with self._engine_guard():
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


class NativeDevicePipelined(NativeDeviceConverter):
    """Wavefront variant: overlap consecutive batches' cascades.

    Same two-thread wavefront as convert/pipelined.py, adapted to the
    engine backend: batch k+1's device dispatch + d2h wait (the dominant
    per-level cost through a tunnel link) overlaps batch k's engine
    merges. Byte parity holds because the per-level barriers force every
    engine cell mutation into the exact serial order (the engine itself
    is additionally serialized by one lock — overlap happens between the
    device/link work and the engine, never engine-vs-engine), and
    end_batch (spill bookkeeping) runs strictly in batch order.
    """

    PIPELINE_DEPTH = 3  # measured knee through the tunnel (PERF.md)

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        import threading
        from concurrent.futures import ThreadPoolExecutor

        self._executor = ThreadPoolExecutor(self.PIPELINE_DEPTH)
        self._futures: list = []
        self._seq = 0
        self._cv = threading.Condition()
        self._level_progress: dict[int, int] = {}
        self._done_batches: set[int] = set()
        self._engine_lock = threading.RLock()
        self._pipe_error: BaseException | None = None

    def _wait_level(self, seq: int, hierarchy: int) -> None:
        if seq == 0:
            return
        with self._cv:
            self._cv.wait_for(
                lambda: (
                    (seq - 1) in self._done_batches
                    or self._level_progress.get(seq - 1, -1) >= hierarchy
                )
            )

    def _mark_level(self, seq: int, hierarchy: int) -> None:
        with self._cv:
            self._level_progress[seq] = hierarchy
            self._cv.notify_all()

    def _mark_done(self, seq: int) -> None:
        with self._cv:
            self._done_batches.add(seq)
            self._level_progress.pop(seq, None)
            self._cv.notify_all()

    import contextlib as _contextlib

    @_contextlib.contextmanager
    def _engine_guard(self):
        with self._engine_lock:
            yield

    def add_points_batch(self, batch: PointBatch) -> None:
        if self._pipe_error is not None:
            raise self._pipe_error
        self._update_bounding_box(batch)
        self.metadata.number_of_points += len(batch)
        if len(batch) == 0:
            return
        self.prefetch(batch)
        seq = self._seq
        self._seq += 1
        positions = np.ascontiguousarray(batch.positions, np.float32)
        colors = np.ascontiguousarray(batch.colors, np.uint8)
        prefetch_handle = self._take_prefetch(batch.positions)

        def job():
            try:
                self._run_cascade(positions, colors, prefetch_handle, seq)
            except BaseException as err:
                self._pipe_error = err
                raise
            finally:
                self._mark_done(seq)

        self._futures.append(self._executor.submit(job))
        while len(self._futures) > self.PIPELINE_DEPTH:
            self._futures.pop(0).result()

    def drain(self) -> None:
        for f in self._futures:
            f.result()
        self._futures.clear()
        if self._pipe_error is not None:
            raise self._pipe_error

    def close(self) -> None:
        # drain() re-raises a pipeline error; cleanup must still run or
        # the executor/worker threads leak and a context-manager exit
        # re-raises the same error over the first one
        try:
            self.drain()
        finally:
            self._executor.shutdown()
            super().close()
