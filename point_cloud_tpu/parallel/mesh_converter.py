"""Mesh-sharded converter: multi-chip conversion with a host-merged store.

Extends the device converter (convert/device.py) with a shard-local
pre-dedup: each level's batch shards across the mesh, every chip runs the
fused dedup on its rows (parallel/dedup.py), and only the shard winners —
typically a small fraction of the batch — enter the merged single-pass
against cell incumbents. Shard losers join the overflow staging directly.
Equivalence to the single-chip pipeline is argmin associativity (see
parallel/dedup.py docstring); tests assert byte-identical stores.

This is the TPU replacement for the reference's thread pool (reference:
thread-pool/src/lib.rs — the only parallelism the Rust app has): instead
of 2 worker threads contending on a channel, N chips each quantize, sort
and dedup 1/N of every batch with ICI-psum'd bounding boxes.
"""

from __future__ import annotations

import numpy as np

from ..convert.device import DeviceConverter
from .dedup import ShardedDedup
from .mesh import make_mesh

MESH_MIN_ROWS = 16_384  # below this the single-device pass is faster


class MeshConverter(DeviceConverter):
    def __init__(self, metadata, working_directory, n_devices=None,
                 cache_size=None, min_mesh_rows: int | None = None,
                 **kwargs):
        from ..convert.converter import DEFAULT_CACHE_SIZE

        super().__init__(
            metadata, working_directory,
            cache_size=cache_size or DEFAULT_CACHE_SIZE,
        )
        self.mesh = make_mesh(n_devices)
        self.sharded = ShardedDedup(self.mesh)
        # below this many rows the single-device pass is faster; 0 forces
        # the sharded path (dry runs / tests on tiny shapes)
        self.min_mesh_rows = (
            MESH_MIN_ROWS if min_mesh_rows is None else min_mesh_rows
        )

    def prefetch(self, batch) -> None:
        """No-op: the mesh path reduces batches through the sharded pass
        (whose dispatch is already asynchronous inside jax), so the
        single-device prefetch would be discarded work."""

    def _reduce_batch(self, hierarchy, positions, colors, cell_size,
                      sub_cell_size):
        if len(positions) < self.min_mesh_rows:
            return positions, colors, None

        out = self.sharded(positions, cell_size, sub_cell_size)
        valid = out["valid"]
        winner = out["winner"] & valid
        loser = (~out["winner"]) & valid
        arrival = out["global_arrival"]

        # winners re-enter the merged pass in global arrival order so the
        # incumbent-first tie-break matches the single-chip pipeline
        w_arrival = np.sort(arrival[winner])
        sel_pos = positions[w_arrival]
        sel_col = colors[w_arrival]

        l_arrival = arrival[loser]
        extra = {
            "positions": positions[l_arrival],
            "colors": colors[l_arrival],
            "cell_idx": out["cell_idx"][loser],
            "next_idx": out["next_idx"][loser],
        }
        return sel_pos, sel_col, extra


def make_mesh_converter_factory(n_devices: int):
    """Factory matching the Converter(metadata, dir, cache_size=...) signature
    (used by the CLI's --mesh flag)."""

    def factory(metadata, working_directory, cache_size=None):
        return MeshConverter(
            metadata, working_directory, n_devices=n_devices,
            cache_size=cache_size,
        )

    return factory
