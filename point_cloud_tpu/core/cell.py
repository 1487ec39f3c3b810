"""Cells: the hex-dedup point containers and their binary codec.

Capability parity with the reference's ``Cell`` (point-converter/src/cell.rs):

- each cell keeps at most one point per hexagonal-prism sub-grid slot; a new
  point displaces the stored one only if it is strictly closer to the slot's
  center (cell.rs:70-94),
- displaced/colliding points stage in an ``overflow`` buffer keyed by the
  *next* hierarchy's cell index, flushing downward once a slot exceeds
  ``cell_point_overflow_limit`` and tombstoning so later points pass straight
  through (cell.rs:108-153),
- the on-disk layout is Header(48B) + points + overflow entries
  (cell.rs:155-229, header at cell.rs:280-335).

TPU-first redesign: the reference inserts points one HashMap entry at a
time; here a cell is structure-of-arrays (positions/colors/sub-indices) and
``add_points`` is a single vectorized sort + segmented-argmin pass. Dedup
outcome parity: for distinct distances the winner set is identical to the
reference's sequential insertion; on exact distance ties the stored point
wins (matching cell.rs:80 ``new < old``) and among tied new points the
earliest in batch order wins (matching sequential arrival).

Canonical on-disk point order: the reference's order is FxHashMap iteration
order (non-deterministic across runs); readers re-derive sub-grid indices
from positions (cell.rs:189-195), so any order is readable. We write points
sorted by sub-grid index (x, y, z) and overflow entries sorted by key, making
our stores deterministic.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from . import hex as hexgrid
from .metadata import MetadataConfig, hierarchy_string
from .point import POINT_DTYPE, PointBatch

EXTENSION = "bin"

_HEADER_STRUCT = struct.Struct("<IiiiIIIfffff")  # 48 bytes, cell.rs:280-298
assert _HEADER_STRUCT.size == 48


@dataclass(frozen=True)
class CellId:
    hierarchy: int
    index: tuple[int, int, int]

    def path(self) -> str:
        """Relative store path ``h_<n>/c_<x>_<y>_<z>.bin`` (cell.rs:21-31)."""
        x, y, z = self.index
        return f"{hierarchy_string(self.hierarchy)}/c_{x}_{y}_{z}.{EXTENSION}"

    def index_string(self) -> str:
        x, y, z = self.index
        return f"c_{x}_{y}_{z}"


def _distance_sq_to_center(
    positions: np.ndarray, sub_indices: np.ndarray, sub_cell_radius: np.float32
) -> np.ndarray:
    """f32 squared distance from each point to its hex slot center.

    Mirrors the reference compare at cell.rs:75-79 (op order
    ``(dx*dx + dy*dy) + dz*dz``).
    """
    centers = hexgrid.offset_to_world(sub_indices, sub_cell_radius)
    d = positions - centers
    return (d[:, 0] * d[:, 0] + d[:, 1] * d[:, 1]) + d[:, 2] * d[:, 2]


class Cell:
    def __init__(
        self,
        cell_id: CellId,
        sub_cell_size: float,
        size: float,
        pos: np.ndarray,
    ):
        self.id = cell_id
        self.sub_cell_size = np.float32(sub_cell_size)
        self.size = np.float32(size)
        self.pos = np.asarray(pos, dtype=np.float32).copy()
        # header counters (cell.rs:238-261)
        self.total_number_of_points = 0
        self.number_of_points = 0
        self.number_of_overflow_points = 0
        # structure-of-arrays points grid: one point per hex slot
        self.points = PointBatch.empty()
        self.sub_indices = np.empty((0, 3), dtype=np.int32)
        # overflow staging: next-hierarchy cell index -> PointBatch | None
        self.overflow: dict[tuple[int, int, int], PointBatch | None] = {}

    # --- queries -----------------------------------------------------------

    def overflow_points(self) -> PointBatch:
        return PointBatch.concat(
            [b for b in self.overflow.values() if b is not None]
        )

    def all_points(self) -> PointBatch:
        return PointBatch.concat([self.points, self.overflow_points()])

    def sub_grid_indices_for(self, positions: np.ndarray) -> np.ndarray:
        """Hex sub-grid index per point (cell.rs:276-278)."""
        return hexgrid.offset_from_world(
            positions, self.sub_cell_size / np.float32(2.0)
        )

    # --- dedup insert (vectorized equivalent of cell.rs:70-106) -------------

    def add_points(self, batch: PointBatch) -> PointBatch:
        """Insert a batch; returns the displaced/colliding points.

        One winner per hex slot, chosen by least squared distance to the
        slot center; the incumbent stored point wins ties.
        """
        if len(batch) == 0:
            return PointBatch.empty()

        n_old = len(self.points)
        new_sub = self.sub_grid_indices_for(batch.positions)
        all_pos = np.concatenate([self.points.positions, batch.positions])
        all_col = np.concatenate([self.points.colors, batch.colors])
        all_sub = np.concatenate([self.sub_indices, new_sub])

        radius = self.sub_cell_size / np.float32(2.0)
        dist = _distance_sq_to_center(all_pos, all_sub, radius)
        # priority: incumbents first (0), then batch arrival order
        priority = np.arange(len(all_pos), dtype=np.int64)

        # lexsort: last key is primary. Group by slot, then distance, then
        # priority (incumbent / earliest arrival wins ties).
        order = np.lexsort(
            (priority, dist, all_sub[:, 2], all_sub[:, 1], all_sub[:, 0])
        )
        sorted_sub = all_sub[order]
        is_first = np.empty(len(order), dtype=bool)
        is_first[0] = True
        is_first[1:] = np.any(sorted_sub[1:] != sorted_sub[:-1], axis=1)

        winner_rows = order[is_first]
        loser_rows = order[~is_first]
        # preserve arrival order among losers (cascade determinism)
        loser_rows = np.sort(loser_rows)

        n_slots = int(is_first.sum())
        newly_occupied = n_slots - n_old  # incumbents had unique slots
        self.total_number_of_points += newly_occupied
        self.number_of_points += newly_occupied

        winner_rows = np.sort(winner_rows)
        self.points = PointBatch(all_pos[winner_rows], all_col[winner_rows])
        self.sub_indices = all_sub[winner_rows]
        return PointBatch(all_pos[loser_rows], all_col[loser_rows])

    # --- overflow cascade (cell.rs:108-153, exact accounting) ---------------

    @staticmethod
    def _canonical_overflow_order(points: PointBatch) -> PointBatch:
        """Sort a staged overflow group by full record bits.

        The reference stages overflow in arrival order, which depends on
        hash-map iteration (non-deterministic across its own runs). We
        canonicalize each staged group so the host and device pipelines —
        which produce losers in different orders — stage byte-identical
        overflow buffers. Bit patterns (not float values) are the keys so
        -0.0/0.0 and NaNs order deterministically; fully identical records
        are interchangeable.
        """
        if len(points) <= 1:
            return points
        pos_bits = points.positions.view(np.int32)
        c = points.colors
        order = np.lexsort(
            (c[:, 3], c[:, 2], c[:, 1], c[:, 0],
             pos_bits[:, 2], pos_bits[:, 1], pos_bits[:, 0])
        )
        return points[order]

    def add_points_in_overflow(
        self,
        grouped: dict[tuple[int, int, int], PointBatch],
        config: MetadataConfig,
    ) -> dict[tuple[int, int, int], PointBatch]:
        """Stage loser points per next-hierarchy cell; return flushed groups."""
        limit = int(config.cell_point_overflow_limit)
        remaining: dict[tuple[int, int, int], PointBatch] = {}

        for cell_index, points in grouped.items():
            points = self._canonical_overflow_order(points)
            if cell_index not in self.overflow:
                if len(points) <= limit:
                    self.total_number_of_points += len(points)
                    self.number_of_overflow_points += len(points)
                    self.overflow[cell_index] = points
                else:
                    remaining[cell_index] = points
                    self.overflow[cell_index] = None  # tombstone
            else:
                slot = self.overflow[cell_index]
                if slot is None:  # tombstoned: pass straight through
                    remaining[cell_index] = points
                else:
                    old_len = len(slot)
                    new_len = len(points)
                    merged = PointBatch.concat([slot, points])
                    if len(merged) < limit:
                        self.total_number_of_points += new_len
                        self.number_of_overflow_points += new_len
                        self.overflow[cell_index] = merged
                    else:
                        self.total_number_of_points -= old_len
                        self.number_of_overflow_points -= old_len
                        self.overflow[cell_index] = None
                        remaining[cell_index] = merged

        return remaining

    # --- binary codec (cell.rs:155-229) --------------------------------------

    def to_bytes(self) -> bytes:
        out = [
            _HEADER_STRUCT.pack(
                self.id.hierarchy,
                *self.id.index,
                self.total_number_of_points,
                self.number_of_points,
                self.number_of_overflow_points,
                float(self.size),
                float(self.sub_cell_size),
                *(float(v) for v in self.pos),
            )
        ]
        # canonical order: sort by sub-grid index
        if len(self.points):
            order = np.lexsort(
                (self.sub_indices[:, 2], self.sub_indices[:, 1], self.sub_indices[:, 0])
            )
            out.append(self.points[order].to_bytes())

        overflow_keys = sorted(self.overflow.keys())
        out.append(struct.pack("<B", len(overflow_keys)))
        for key in overflow_keys:
            points = self.overflow[key]
            out.append(struct.pack("<iii", *key))
            if points is None or len(points) == 0:
                out.append(struct.pack("<I", 0))  # 0 encodes the tombstone
            else:
                out.append(struct.pack("<I", len(points)))
                out.append(points.to_bytes())
        return b"".join(out)

    @staticmethod
    def from_bytes(data: bytes | memoryview) -> "Cell":
        mv = memoryview(data)
        (
            hierarchy,
            ix,
            iy,
            iz,
            total,
            n_points,
            n_overflow,
            size,
            sub_cell_size,
            px,
            py,
            pz,
        ) = _HEADER_STRUCT.unpack_from(mv, 0)
        offset = _HEADER_STRUCT.size

        cell = Cell(
            CellId(hierarchy, (ix, iy, iz)),
            sub_cell_size,
            size,
            np.array([px, py, pz], dtype=np.float32),
        )
        cell.total_number_of_points = total
        cell.number_of_points = n_points
        cell.number_of_overflow_points = n_overflow

        points = PointBatch.from_bytes(mv[offset : offset + n_points * POINT_DTYPE.itemsize])
        offset += n_points * POINT_DTYPE.itemsize
        # re-derive sub-grid indices from positions, like cell.rs:189-195
        cell.points = points
        cell.sub_indices = cell.sub_grid_indices_for(points.positions)

        (overflow_len,) = struct.unpack_from("<B", mv, offset)
        offset += 1
        for _ in range(overflow_len):
            kx, ky, kz, count = struct.unpack_from("<iiiI", mv, offset)
            offset += 16
            if count == 0:
                cell.overflow[(kx, ky, kz)] = None
            else:
                cell.overflow[(kx, ky, kz)] = PointBatch.from_bytes(
                    mv[offset : offset + count * POINT_DTYPE.itemsize]
                )
                offset += count * POINT_DTYPE.itemsize
        return cell

    @staticmethod
    def from_path(path) -> "Cell":
        with open(path, "rb") as f:
            return Cell.from_bytes(f.read())

    def write_to_path(self, path) -> None:
        with open(path, "wb") as f:
            f.write(self.to_bytes())
