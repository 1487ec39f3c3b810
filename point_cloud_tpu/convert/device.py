"""Device-accelerated converter: whole-batch dedup on the TPU.

Produces stores identical to the host :class:`~.converter.Converter` (same
winner sets, same counters, same metadata — tested in
tests/test_device_converter.py), but replaces the per-cell NumPy dedup with
one fused XLA pass per hierarchy level over the *entire* batch plus the
incumbents of every touched cell (ops/dedup.py). The reference's equivalent
work is a per-point HashMap insert loop (reference:
point-converter/src/converter.rs:114-139, cell.rs:70-106).

Per batch, per hierarchy level:

1. host computes the batch's cell indices (exact f32 floor-divide) and
   loads/creates each touched cell through the LRU cache,
2. incumbents (current grid points of touched cells) are concatenated ahead
   of the batch — earliest-arrival tie-breaking then makes stored points win
   ties, matching sequential insertion (cell.rs:80),
3. one `dedup_pass` sorts (cell, hex slot, distance, arrival) and flags
   winners; the sorted output is already grouped by cell, so the host
   splits it with boundary diffs — no per-point work,
4. winners replace each touched cell's grid; losers regroup by
   (cell, next-hierarchy cell) in one lexsort and run the overflow-limit
   accounting (Cell.add_points_in_overflow, host dict logic); flushed
   groups become the next level's input.
"""

from __future__ import annotations

import numpy as np

from ..core.cell import CellId
from ..core.point import PointBatch
from ..ops.dedup import dedup_batch_host
from .converter import Converter

# XLA TPU sort compile time scales with shape (~30 s at 2^16, ~2x per
# doubling); 2^17 balances one-time compile cost against per-chunk host
# overhead. The persistent compilation cache (ops/runtime.py) makes it a
# per-machine, not per-process, cost.
DEVICE_BATCH_SIZE = 1 << 17


def _row_boundaries(rows: np.ndarray) -> np.ndarray:
    """Start offsets of equal-row runs in a row-sorted (N, K) array."""
    if len(rows) == 0:
        return np.empty(0, np.int64)
    change = np.any(rows[1:] != rows[:-1], axis=1)
    return np.concatenate([[0], np.nonzero(change)[0] + 1])


class DeviceConverter(Converter):
    """Drop-in converter whose dedup math runs on the JAX default device."""

    def add_points_batch(self, batch: PointBatch) -> None:
        self._update_bounding_box(batch)
        self.metadata.number_of_points += len(batch)
        self._cascade(batch.positions, batch.colors, 0)

    def _add_points_in_hierarchy(self, hierarchy, grouped) -> None:
        # keep the host-grouped entry point working (e.g. for tests)
        batches = [grouped[k] for k in sorted(grouped)]
        merged = PointBatch.concat(batches)
        self._cascade(merged.positions, merged.colors, hierarchy)

    def _reduce_batch(self, hierarchy, positions, colors, cell_size,
                      sub_cell_size):
        """Hook: pre-reduce a level's batch before the merged pass.

        Returns (positions, colors, extra_losers) where extra_losers is
        None or a dict of arrays {positions, colors, cell_idx, next_idx}
        that joins the merged pass's losers in the overflow staging. The
        mesh-sharded converter overrides this to run shard-local dedup
        first (parallel/mesh_converter.py)."""
        return positions, colors, None

    def _cascade(
        self, positions: np.ndarray, colors: np.ndarray, hierarchy: int
    ) -> None:
        config = self.metadata.config
        while len(positions):
            self._create_hierarchy_folder(hierarchy)
            cell_size = config.cell_size(hierarchy)
            sub_cell_size = config.sub_cell_size(cell_size)

            positions, colors, extra_losers = self._reduce_batch(
                hierarchy, positions, colors, cell_size, sub_cell_size
            )

            # --- 1. touched cells + incumbents -----------------------------
            batch_cells = config.cell_index(positions, cell_size)
            touched = np.unique(batch_cells, axis=0)
            cells = [
                self.get_cell(CellId(hierarchy, tuple(int(v) for v in idx)))
                for idx in touched
            ]
            inc_pos = [c.points.positions for c in cells]
            inc_col = [c.points.colors for c in cells]
            n_inc = int(sum(len(p) for p in inc_pos))

            all_pos = np.concatenate(inc_pos + [positions])
            all_col = np.concatenate(inc_col + [colors])

            # --- 2. fused device pass --------------------------------------
            perm, winner, cell_idx_s, sub_idx_s, dist_s, next_idx_s = (
                dedup_batch_host(all_pos, cell_size, sub_cell_size)
            )
            pos_s = all_pos[perm]
            col_s = all_col[perm]

            # --- 3. winners -> cell grids ----------------------------------
            cell_map = {c.id.index: c for c in cells}
            starts = _row_boundaries(cell_idx_s)
            ends = np.append(starts[1:], len(cell_idx_s))
            # cells come back in hash order; under a (rare) cell-hash
            # collision one cell's rows can split into multiple spans
            seen: dict[tuple[int, int, int], list[tuple[int, int]]] = {}
            for s, e in zip(starts, ends):
                key = tuple(int(v) for v in cell_idx_s[s])
                seen.setdefault(key, []).append((int(s), int(e)))
            for key, spans in seen.items():
                cell = cell_map[key]
                rows = np.concatenate(
                    [np.arange(s, e) for s, e in spans]
                )
                win_rows = rows[winner[rows]]
                n_old = len(cell.points)
                cell.points = PointBatch(pos_s[win_rows], col_s[win_rows])
                cell.sub_indices = sub_idx_s[win_rows]
                newly = len(win_rows) - n_old
                cell.total_number_of_points += newly
                cell.number_of_points += newly

            # --- 4. losers -> overflow accounting --------------------------
            loser_rows = np.nonzero(~winner)[0]
            l_pos = pos_s[loser_rows]
            l_col = col_s[loser_rows]
            l_cell = cell_idx_s[loser_rows]
            l_next = next_idx_s[loser_rows]
            if extra_losers is not None:
                l_pos = np.concatenate([l_pos, extra_losers["positions"]])
                l_col = np.concatenate([l_col, extra_losers["colors"]])
                l_cell = np.concatenate([l_cell, extra_losers["cell_idx"]])
                l_next = np.concatenate([l_next, extra_losers["next_idx"]])
            if len(l_pos) == 0:
                return
            order = np.lexsort(
                (
                    l_next[:, 2], l_next[:, 1], l_next[:, 0],
                    l_cell[:, 2], l_cell[:, 1], l_cell[:, 0],
                )
            )
            l_pos = l_pos[order]
            l_col = l_col[order]
            l_cell = l_cell[order]
            l_next = l_next[order]

            next_chunks_pos: list[np.ndarray] = []
            next_chunks_col: list[np.ndarray] = []
            g_starts = _row_boundaries(np.concatenate([l_cell, l_next], axis=1))
            g_ends = np.append(g_starts[1:], len(l_pos))
            # group the (cell, next-cell) runs per cell, then apply the
            # overflow-limit accounting one cell at a time
            i = 0
            while i < len(g_starts):
                cell_key = tuple(int(v) for v in l_cell[g_starts[i]])
                grouped: dict[tuple[int, int, int], PointBatch] = {}
                while i < len(g_starts) and (
                    tuple(int(v) for v in l_cell[g_starts[i]]) == cell_key
                ):
                    s, e = g_starts[i], g_ends[i]
                    next_key = tuple(int(v) for v in l_next[s])
                    grouped[next_key] = PointBatch(l_pos[s:e], l_col[s:e])
                    i += 1
                cell = cell_map[cell_key]
                remaining = cell.add_points_in_overflow(grouped, config)
                for key in sorted(remaining):
                    next_chunks_pos.append(remaining[key].positions)
                    next_chunks_col.append(remaining[key].colors)

            if next_chunks_pos:
                positions = np.concatenate(next_chunks_pos)
                colors = np.concatenate(next_chunks_col)
            else:
                positions = np.empty((0, 3), np.float32)
                colors = np.empty((0, 4), np.uint8)
            hierarchy += 1
