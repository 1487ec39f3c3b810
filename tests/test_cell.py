"""Cell dedup semantics + binary codec tests.

Oracle: a sequential dict-based re-statement of the reference insertion
semantics (point-converter/src/cell.rs:70-153), run point-by-point.
"""

import numpy as np
import pytest

from point_cloud_tpu.core import hex as hexgrid
from point_cloud_tpu.core.cell import Cell, CellId, _distance_sq_to_center
from point_cloud_tpu.core.metadata import MetadataConfig
from point_cloud_tpu.core.point import PointBatch

f32 = np.float32


def make_cell(hierarchy=0, index=(0, 0, 0), config=None):
    config = config or MetadataConfig()
    cell_size = config.cell_size(hierarchy)
    return Cell(
        CellId(hierarchy, index),
        config.sub_cell_size(cell_size),
        cell_size,
        config.cell_pos(np.array(index, np.int32), cell_size),
    )


class SequentialOracle:
    """Point-at-a-time insertion mirroring cell.rs:70-94."""

    def __init__(self, sub_cell_size):
        self.sub_cell_size = f32(sub_cell_size)
        self.grid = {}  # sub index tuple -> (pos, color)
        self.n_inserted = 0

    def add_point(self, pos, color):
        radius = self.sub_cell_size / f32(2.0)
        idx = tuple(hexgrid.offset_from_world(pos[None], radius)[0])
        if idx not in self.grid:
            self.grid[idx] = (pos, color)
            self.n_inserted += 1
            return None
        center = hexgrid.offset_to_world(np.array([idx], np.int32), radius)[0]
        old_pos, old_color = self.grid[idx]
        d_old = _distance_sq_to_center(old_pos[None], np.array([idx], np.int32), radius)[0]
        d_new = _distance_sq_to_center(pos[None], np.array([idx], np.int32), radius)[0]
        del center
        if d_new < d_old:
            self.grid[idx] = (pos, color)
            return (old_pos, old_color)
        return (pos, color)


def random_batch(n, extent=500.0, seed=0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    col = rng.integers(0, 256, (n, 4), dtype=np.uint8)
    return PointBatch(pos, col)


class TestDedupParity:
    @pytest.mark.parametrize("n,extent", [(2000, 500.0), (5000, 20.0), (3000, 2.0)])
    def test_winner_set_matches_sequential_oracle(self, n, extent):
        """Batched segmented-argmin == sequential insertion (winner sets)."""
        cell = make_cell()
        batch = random_batch(n, extent=extent, seed=n)
        losers = cell.add_points(batch)

        oracle = SequentialOracle(cell.sub_cell_size)
        oracle_losers = 0
        for i in range(n):
            if oracle.add_point(batch.positions[i], batch.colors[i]) is not None:
                oracle_losers += 1

        assert cell.number_of_points == oracle.n_inserted
        assert len(losers) == oracle_losers
        # winner per slot must be identical
        got = {
            tuple(cell.sub_indices[i]): tuple(cell.points.positions[i])
            for i in range(len(cell.points))
        }
        expected = {k: tuple(v[0]) for k, v in oracle.grid.items()}
        assert got == expected

    def test_incremental_matches_single_shot_slots(self):
        """Splitting a batch in two gives the same winners (distinct dists)."""
        batch = random_batch(4000, extent=10.0, seed=9)
        one = make_cell()
        one.add_points(batch)
        two = make_cell()
        two.add_points(batch[: len(batch) // 2])
        two.add_points(batch[len(batch) // 2 :])
        w1 = {tuple(i): tuple(p) for i, p in zip(one.sub_indices, one.points.positions)}
        w2 = {tuple(i): tuple(p) for i, p in zip(two.sub_indices, two.points.positions)}
        assert w1 == w2

    def test_incumbent_wins_exact_tie(self):
        cell = make_cell()
        p = np.array([[1.0, 2.0, 3.0]], np.float32)
        cell.add_points(PointBatch(p, np.array([[1, 0, 0, 255]], np.uint8)))
        # identical position = identical distance -> incumbent stays
        losers = cell.add_points(PointBatch(p, np.array([[2, 0, 0, 255]], np.uint8)))
        assert len(losers) == 1
        assert losers.colors[0, 0] == 2
        assert cell.points.colors[0, 0] == 1


class TestOverflowCascade:
    def test_accumulate_under_limit(self):
        cell = make_cell()
        config = MetadataConfig(cell_point_overflow_limit=10)
        rem = cell.add_points_in_overflow({(0, 0, 0): random_batch(5)}, config)
        assert rem == {}
        assert cell.number_of_overflow_points == 5
        rem = cell.add_points_in_overflow({(0, 0, 0): random_batch(4)}, config)
        assert rem == {}
        assert cell.number_of_overflow_points == 9

    def test_flush_and_tombstone(self):
        cell = make_cell()
        config = MetadataConfig(cell_point_overflow_limit=10)
        cell.add_points_in_overflow({(0, 0, 0): random_batch(8)}, config)
        # 8 + 3 = 11 >= 10: flush all, subtract the old 8
        rem = cell.add_points_in_overflow({(0, 0, 0): random_batch(3, seed=1)}, config)
        assert len(rem[(0, 0, 0)]) == 11
        assert cell.number_of_overflow_points == 0
        assert cell.overflow[(0, 0, 0)] is None
        # tombstoned: everything passes straight through
        rem = cell.add_points_in_overflow({(0, 0, 0): random_batch(2, seed=2)}, config)
        assert len(rem[(0, 0, 0)]) == 2

    def test_vacant_over_limit_passes_through(self):
        cell = make_cell()
        config = MetadataConfig(cell_point_overflow_limit=10)
        rem = cell.add_points_in_overflow({(1, 2, 3): random_batch(11)}, config)
        assert len(rem[(1, 2, 3)]) == 11
        assert cell.overflow[(1, 2, 3)] is None
        assert cell.total_number_of_points == 0

    def test_vacant_exactly_limit_is_kept(self):
        # vacant keeps len <= limit (cell.rs:118), merged flushes at >= limit
        cell = make_cell()
        config = MetadataConfig(cell_point_overflow_limit=10)
        rem = cell.add_points_in_overflow({(0, 0, 0): random_batch(10)}, config)
        assert rem == {}
        assert cell.number_of_overflow_points == 10

    def test_staged_chunks_never_pin_source_views(self):
        """The device cascade stages per-group SLICES of a level's full
        loser arrays: the overflow buffer must copy them (or RSS grows
        by the cumulative loser footprint — buffers would keep whole
        level arrays alive for as long as the cell sits in the cache)."""
        from point_cloud_tpu.core.point import PointBatch

        cell = make_cell()
        config = MetadataConfig(cell_point_overflow_limit=100)
        big = random_batch(1_000)
        view = PointBatch._wrap(
            big.positions[10:14], big.colors[10:14]
        )
        # presorted=True is the device cascade's staging call: the group
        # is staged as-is (no canonical reorder), so pre-fix the buffer
        # held the raw pinning slice
        cell.add_points_in_overflow(
            {(0, 0, 0): view}, config, presorted=True
        )
        buf = cell.overflow[(0, 0, 0)]
        for chunk in buf.chunks:
            assert chunk.positions.base is None
            assert chunk.colors.base is None
        # and the values are untouched
        np.testing.assert_array_equal(
            buf.chunks[0].positions, big.positions[10:14]
        )


class TestCellCodec:
    def test_header_layout(self):
        cell = make_cell(hierarchy=2, index=(-1, 3, 7))
        data = cell.to_bytes()
        assert len(data) == 48 + 1  # header + overflow count byte
        # little-endian field spot checks
        assert int.from_bytes(data[0:4], "little") == 2
        assert int.from_bytes(data[4:8], "little", signed=True) == -1

    def test_round_trip(self):
        cell = make_cell()
        batch = random_batch(3000, extent=30.0, seed=5)
        losers = cell.add_points(batch)
        config = MetadataConfig(cell_point_overflow_limit=5)
        from point_cloud_tpu.convert.pipeline import group_points_host

        grouped = group_points_host(losers, 1, MetadataConfig())
        cell.add_points_in_overflow(grouped, config)

        restored = Cell.from_bytes(cell.to_bytes())
        assert restored.id == cell.id
        assert restored.total_number_of_points == cell.total_number_of_points
        assert restored.number_of_points == cell.number_of_points
        assert restored.number_of_overflow_points == cell.number_of_overflow_points
        assert restored.size == cell.size
        assert restored.sub_cell_size == cell.sub_cell_size
        assert np.array_equal(restored.pos, cell.pos)
        # winner set identical (order is canonical on disk)
        got = {tuple(i) for i in restored.sub_indices}
        assert got == {tuple(i) for i in cell.sub_indices}
        assert restored.overflow.keys() == cell.overflow.keys()
        for k in cell.overflow:
            a, b = cell.overflow[k], restored.overflow[k]
            if a is None:
                assert b is None
            else:
                assert np.array_equal(
                    np.sort(a.positions, axis=0), np.sort(b.positions, axis=0)
                )

    def test_deterministic_bytes(self):
        c1, c2 = make_cell(), make_cell()
        batch = random_batch(1000, extent=5.0, seed=3)
        c1.add_points(batch)
        c2.add_points(batch)
        assert c1.to_bytes() == c2.to_bytes()


class TestGenerationCounter:
    def test_reload_never_reuses_an_earlier_generation(self):
        """The renderer's device caches key on (cell_id, generation); a
        cell that is mutated, saved, and later re-read from disk must not
        reproduce a generation an earlier incarnation already exposed —
        the store format has no generation field, so a reload restarting
        at a fixed value would alias the pre-mutation cache entries."""
        cell = make_cell()
        seen = {cell.generation}
        cell.add_points(random_batch(100, extent=5.0, seed=11))
        assert cell.generation not in seen  # mutation advances
        seen.add(cell.generation)
        data = cell.to_bytes()

        reloaded = Cell.from_bytes(data)
        assert reloaded.generation not in seen
        seen.add(reloaded.generation)
        # a second reload of the SAME bytes is also a fresh incarnation
        reloaded2 = Cell.from_bytes(data)
        assert reloaded2.generation not in seen
