"""End-to-end converter tests: store invariants, dedup/overflow semantics,
incremental merge, own-format re-read, CLI."""

import json

import numpy as np
import pytest

from point_cloud_tpu.convert.converter import (
    Converter,
    convert_from_paths,
    load_metadata,
)
from point_cloud_tpu.core.cell import Cell, CellId
from point_cloud_tpu.core.metadata import Metadata, MetadataConfig
from point_cloud_tpu.core.point import PointBatch
from point_cloud_tpu.io.ply import write_ply


def random_batch(n, seed=0, lo=-100, hi=100):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    col = rng.integers(0, 256, (n, 4), dtype=np.uint8)
    col[:, 3] = 255
    return PointBatch(pos, col)


def store_points(store_dir, metadata):
    """Read back every point in a store (grid + overflow)."""
    chunks = []
    for h in range(metadata.hierarchies):
        hdir = store_dir / f"h_{h}"
        if not hdir.exists():
            continue
        for path in sorted(hdir.iterdir()):
            chunks.append(Cell.from_path(path).all_points())
    return PointBatch.concat(chunks)


def sorted_rows(batch):
    rows = np.concatenate(
        [batch.positions, batch.colors.astype(np.float32)], axis=1
    )
    return rows[np.lexsort(rows.T[::-1])]


class TestConverterStore:
    def test_all_points_preserved(self, tmp_path):
        batch = random_batch(20_000)
        with Converter(Metadata(), tmp_path) as conv:
            conv.add_points_batch(batch)
        metadata = Metadata.from_path(tmp_path / "metadata.json")
        assert metadata.number_of_points == 20_000
        out = store_points(tmp_path, metadata)
        assert len(out) == 20_000
        np.testing.assert_array_equal(
            sorted_rows(out), sorted_rows(batch)
        )

    def test_bounding_box_first_batch_replaces_default(self, tmp_path):
        batch = PointBatch(
            np.array([[5.0, 6.0, 7.0], [8.0, 9.0, 10.0]], np.float32)
        )
        with Converter(Metadata(), tmp_path) as conv:
            conv.add_points_batch(batch)
            # default Aabb is zeros; must have been replaced, not extended
            np.testing.assert_array_equal(
                conv.metadata.bounding_box.min, [5, 6, 7]
            )
            np.testing.assert_array_equal(
                conv.metadata.bounding_box.max, [8, 9, 10]
            )

    def test_total_counter_invariant(self, tmp_path):
        """Per cell: total == grid points + overflow points (cell.rs headers)."""
        batch = random_batch(50_000, lo=-2, hi=2)  # dense -> collisions
        with Converter(Metadata(), tmp_path) as conv:
            conv.add_points_batch(batch)
        metadata = Metadata.from_path(tmp_path / "metadata.json")
        seen = 0
        for h in range(metadata.hierarchies):
            for path in sorted((tmp_path / f"h_{h}").iterdir()):
                cell = Cell.from_path(path)
                assert cell.total_number_of_points == (
                    cell.number_of_points + cell.number_of_overflow_points
                )
                assert cell.number_of_points == len(cell.points)
                assert cell.number_of_overflow_points == len(
                    cell.overflow_points()
                )
                seen += cell.total_number_of_points
        assert seen == 50_000
        assert metadata.hierarchies >= 2  # dense cloud must cascade

    def test_one_point_per_hex_slot(self, tmp_path):
        batch = random_batch(30_000, lo=-1, hi=1)
        with Converter(Metadata(), tmp_path) as conv:
            conv.add_points_batch(batch)
        metadata = Metadata.from_path(tmp_path / "metadata.json")
        for h in range(metadata.hierarchies):
            for path in sorted((tmp_path / f"h_{h}").iterdir()):
                cell = Cell.from_path(path)
                if len(cell.points) == 0:
                    continue
                sub = cell.sub_indices
                uniq = np.unique(sub, axis=0)
                assert len(uniq) == len(sub)

    def test_winner_is_closest_to_slot_center(self, tmp_path):
        """Dedup keeps the point nearest the hex slot center (cell.rs:74-93)."""
        config = MetadataConfig()
        cell_size = config.cell_size(0)
        sub = config.sub_cell_size(cell_size)
        from point_cloud_tpu.core import hex as hexgrid

        center = hexgrid.offset_to_world(
            np.array([[3, 4, 5]], np.int32), np.float32(sub / 2)
        )[0]
        near = center + np.float32(sub * 0.01)
        far = center + np.float32(sub * 0.2)
        batch = PointBatch(np.stack([far, near]).astype(np.float32))
        cell = Cell(CellId(0, (0, 0, 0)), sub, cell_size, config.cell_pos(
            np.zeros(3, np.int32), cell_size))
        losers = cell.add_points(batch)
        assert len(cell.points) == 1
        np.testing.assert_array_equal(cell.points.positions[0], near)
        np.testing.assert_array_equal(losers.positions[0], far)

    def test_batch_splitting_does_not_change_store_counts(self, tmp_path):
        """Conversion in 1 batch vs many batches yields same point multiset."""
        batch = random_batch(8_000, lo=-3, hi=3)
        with Converter(Metadata(), tmp_path / "one") as conv:
            conv.add_points_batch(batch)
        m_one = Metadata.from_path(tmp_path / "one" / "metadata.json")
        with Converter(Metadata(), tmp_path / "many") as conv:
            for i in range(0, 8_000, 1_000):
                conv.add_points_batch(batch[i : i + 1_000])
        m_many = Metadata.from_path(tmp_path / "many" / "metadata.json")
        assert m_one.number_of_points == m_many.number_of_points
        np.testing.assert_array_equal(
            sorted_rows(store_points(tmp_path / "one", m_one)),
            sorted_rows(store_points(tmp_path / "many", m_many)),
        )

    def test_small_cache_evicts_losslessly(self, tmp_path):
        batch = random_batch(20_000, lo=-200, hi=200)  # many cells
        with Converter(Metadata(), tmp_path / "big") as conv:
            conv.add_points_batch(batch)
        with Converter(Metadata(), tmp_path / "small", cache_size=2) as conv:
            conv.add_points_batch(batch)
        m_big = Metadata.from_path(tmp_path / "big" / "metadata.json")
        m_small = Metadata.from_path(tmp_path / "small" / "metadata.json")
        assert m_big.dumps() == m_small.dumps()
        np.testing.assert_array_equal(
            sorted_rows(store_points(tmp_path / "big", m_big)),
            sorted_rows(store_points(tmp_path / "small", m_small)),
        )


class TestIncrementalMerge:
    def test_merge_extends_existing_store(self, tmp_path):
        a = random_batch(5_000, seed=1)
        b = random_batch(5_000, seed=2, lo=-150, hi=150)
        with Converter(load_metadata(tmp_path), tmp_path) as conv:
            conv.add_points_batch(a)
        with Converter(load_metadata(tmp_path), tmp_path) as conv:
            conv.add_points_batch(b)
        metadata = Metadata.from_path(tmp_path / "metadata.json")
        assert metadata.number_of_points == 10_000
        both = PointBatch.concat([a, b])
        np.testing.assert_array_equal(
            metadata.bounding_box.min, both.positions.min(axis=0)
        )
        np.testing.assert_array_equal(
            metadata.bounding_box.max, both.positions.max(axis=0)
        )
        out = store_points(tmp_path, metadata)
        np.testing.assert_array_equal(sorted_rows(out), sorted_rows(both))

    def test_merge_equals_single_run(self, tmp_path):
        """merge(A then B) point multiset == convert(A+B)."""
        a = random_batch(3_000, seed=3)
        b = random_batch(3_000, seed=4)
        with Converter(load_metadata(tmp_path / "m"), tmp_path / "m") as conv:
            conv.add_points_batch(a)
        with Converter(load_metadata(tmp_path / "m"), tmp_path / "m") as conv:
            conv.add_points_batch(b)
        with Converter(Metadata(), tmp_path / "s") as conv:
            conv.add_points_batch(a)
            conv.add_points_batch(b)
        m_m = Metadata.from_path(tmp_path / "m" / "metadata.json")
        m_s = Metadata.from_path(tmp_path / "s" / "metadata.json")
        assert m_m.number_of_points == m_s.number_of_points
        np.testing.assert_array_equal(
            sorted_rows(store_points(tmp_path / "m", m_m)),
            sorted_rows(store_points(tmp_path / "s", m_s)),
        )


class TestReadAhead:
    """_ReadAhead: the driver's parse-ahead thread must preserve batch
    order exactly (byte parity depends on it) and surface reader
    failures where the serial loop would have."""

    class _FakeReader:
        def __init__(self, batches, raise_at=None):
            self._batches = list(batches)
            self._raise_at = raise_at
            self._served = 0

        def remaining_points(self):
            return sum(len(b) for b in self._batches)

        def get_batch(self, size):
            if self._raise_at is not None and self._served == self._raise_at:
                raise OSError("bad sector")
            self._served += 1
            return self._batches.pop(0)

    def test_order_preserved(self):
        from point_cloud_tpu.convert.converter import _ReadAhead

        batches = [[i] * (i + 1) for i in range(20)]
        ra = _ReadAhead(self._FakeReader(batches), batch_size=1)
        got = []
        while True:
            kind, payload = ra.next()
            if kind != "batch":
                assert kind == "eof"
                break
            got.append(payload)
        ra.close()
        assert got == [[i] * (i + 1) for i in range(20)]

    def test_error_surfaces_in_order(self):
        from point_cloud_tpu.convert.converter import _ReadAhead

        ra = _ReadAhead(
            self._FakeReader([[1], [2], [3]], raise_at=2), batch_size=1
        )
        kinds = [ra.next(), ra.next(), ra.next()]
        ra.close()
        assert [k for k, _ in kinds[:2]] == ["batch", "batch"]
        assert kinds[2][0] == "error"
        assert isinstance(kinds[2][1], OSError)

    def test_close_unblocks_full_queue(self):
        from point_cloud_tpu.convert.converter import _ReadAhead

        # 10 batches vs depth 2: the producer blocks on a full queue;
        # close() must still join promptly without consuming anything
        ra = _ReadAhead(self._FakeReader([[i] for i in range(10)]),
                        batch_size=1)
        ra.close()
        assert not ra._thread.is_alive()


class TestConvertFromPaths:
    def test_ply_to_store_and_reconvert(self, tmp_path):
        batch = random_batch(4_000)
        src = tmp_path / "cloud.ply"
        write_ply(src, batch)
        out1 = tmp_path / "out1"
        convert_from_paths([src], out1)
        m1 = Metadata.from_path(out1 / "metadata.json")
        assert m1.number_of_points == 4_000
        np.testing.assert_array_equal(
            sorted_rows(store_points(out1, m1)), sorted_rows(batch)
        )
        # own-format re-conversion: metadata.json as source (lib.rs:74-77)
        out2 = tmp_path / "out2"
        convert_from_paths([out1 / "metadata.json"], out2)
        m2 = Metadata.from_path(out2 / "metadata.json")
        assert m2.number_of_points == 4_000
        np.testing.assert_array_equal(
            sorted_rows(store_points(out2, m2)), sorted_rows(batch)
        )

    def test_failed_add_is_not_retried(self, tmp_path):
        """A batch whose add_points_batch raised mid-add must NOT be
        re-added by the per-file failure handler: converters mutate
        metadata (point count, bbox) before the cascade, so a retry
        double-counts the batch and desyncs the store from
        metadata.json (advisor r3, converter.py flush sites)."""
        src = tmp_path / "pts.ply"
        write_ply(src, random_batch(50))
        added = []

        class Exploding:
            def __init__(self, metadata, output, cache_size=0):
                pass

            def __enter__(self):
                return self

            def __exit__(self, *exc):
                return False

            def prefetch(self, batch):
                pass

            def add_points_batch(self, batch):
                added.append(batch)
                if len(added) == 2:
                    raise RuntimeError("mid-add device failure")

        convert_from_paths(
            [src], tmp_path / "out", batch_size=10,
            converter_factory=Exploding,
        )
        # exactly the two attempted batches, each attempted once — the
        # failing batch never re-entered through the except-path flush
        assert len(added) == 2
        assert added[0] is not added[1]

    def test_eof_flush_failure_not_retried(self, tmp_path):
        """Same no-retry contract for the eof-flush site."""
        src = tmp_path / "pts.ply"
        write_ply(src, random_batch(30))
        added = []

        class ExplodeLast:
            def __init__(self, metadata, output, cache_size=0):
                pass

            def __enter__(self):
                return self

            def __exit__(self, *exc):
                return False

            def prefetch(self, batch):
                pass

            def add_points_batch(self, batch):
                added.append(batch)
                if len(added) == 3:  # 30 pts / batch 10: the eof flush
                    raise RuntimeError("mid-add failure at eof flush")

        convert_from_paths(
            [src], tmp_path / "out", batch_size=10,
            converter_factory=ExplodeLast,
        )
        assert len(added) == 3
        assert len({id(b) for b in added}) == 3

    def test_metadata_json_is_pretty_and_parses(self, tmp_path):
        src = tmp_path / "c.ply"
        write_ply(src, random_batch(100))
        convert_from_paths([src], tmp_path / "out")
        text = (tmp_path / "out" / "metadata.json").read_text()
        data = json.loads(text)
        assert data["version"] == "1.0"
        assert data["name"] == "Unknown"
        assert data["number_of_points"] == 100
        assert set(data["config"]) == {
            "cell_point_overflow_limit", "sub_grid_dimension", "max_cell_size"
        }
        assert text.startswith("{\n  \"version\"")  # serde_json pretty layout
        assert not text.endswith("\n")

    def test_cli(self, tmp_path):
        from point_cloud_tpu.convert.cli import main

        src_dir = tmp_path / "in"
        src_dir.mkdir()
        write_ply(src_dir / "a.ply", random_batch(500, seed=5))
        write_ply(src_dir / "b.ply", random_batch(500, seed=6))
        out = tmp_path / "out"
        assert main(["-o", str(out), "-d", str(src_dir)]) == 0
        metadata = Metadata.from_path(out / "metadata.json")
        assert metadata.number_of_points == 1_000

    def test_cli_no_input_warns(self, tmp_path, caplog):
        from point_cloud_tpu.convert.cli import main

        assert main(["-o", str(tmp_path)]) == 0
        assert not (tmp_path / "metadata.json").exists()

    def test_cli_device_path_matches_host(self, tmp_path):
        from point_cloud_tpu.convert.cli import main

        src = tmp_path / "c.ply"
        write_ply(src, random_batch(3_000, seed=7))
        # same batch size both ways: flush granularity is batch-dependent
        assert main(
            ["-o", str(tmp_path / "host"), "-f", str(src),
             "--batch-size", "10000"]
        ) == 0
        assert main(
            ["-o", str(tmp_path / "dev"), "-f", str(src), "--device",
             "--batch-size", "10000", "--profile"]
        ) == 0
        host_files = {
            p.relative_to(tmp_path / "host"): p.read_bytes()
            for p in sorted((tmp_path / "host").rglob("*")) if p.is_file()
        }
        dev_files = {
            p.relative_to(tmp_path / "dev"): p.read_bytes()
            for p in sorted((tmp_path / "dev").rglob("*")) if p.is_file()
        }
        assert host_files == dev_files


    def test_cli_backend_matrix_byte_identical(self, tmp_path):
        """EVERY CLI backend produces byte-identical stores at a pinned
        --batch-size, on a fixture whose overflow groups accumulate
        staged losers across MULTIPLE batches (the store serializes
        per-batch canonical chunks, so cross-batch staging order is
        where backends could silently diverge — the default per-backend
        batch sizes legitimately produce different bytes, which is why
        the batch schedule is pinned here and documented in the CLI
        help)."""
        from point_cloud_tpu.convert.cli import main

        src = tmp_path / "m.ply"
        # ±300 over cell size 1000 -> a handful of h0 cells, each
        # staging h1 losers across all six 10k batches
        write_ply(src, random_batch(60_000, seed=123, lo=-300, hi=300))

        modes = {"host": [], "device": ["--device"], "mesh": ["--mesh", "8"]}
        from point_cloud_tpu.native import hex_lockstep_ok

        if hex_lockstep_ok():
            modes["native"] = ["--native"]
            modes["device_native"] = ["--device-native"]
        stores = {}
        for name, flags in modes.items():
            out = tmp_path / name
            assert main(
                ["-o", str(out), "-f", str(src), "--batch-size", "10000"]
                + flags
            ) == 0
            stores[name] = {
                p.relative_to(out): p.read_bytes()
                for p in sorted(out.rglob("*")) if p.is_file()
            }
        base = stores.pop("host")
        # the fixture must actually exercise cross-batch staging
        from point_cloud_tpu.core.cell import Cell

        cell = Cell.from_path(next((tmp_path / "host" / "h_0").iterdir()))
        assert any(
            v is not None and len(v) > 0 for v in cell.overflow.values()
        )
        for name, files in stores.items():
            assert files == base, f"{name} store differs from host oracle"


class TestOverflowCascade:
    def test_overflow_limit_flushes_and_tombstones(self, tmp_path):
        """Exceeding cell_point_overflow_limit pushes points to the next
        hierarchy and tombstones the slot (cell.rs:108-153)."""
        config = MetadataConfig(cell_point_overflow_limit=50)
        metadata = Metadata(config=config)
        # a tight cluster: one hex slot at h0 catches everything
        n = 500
        pos = np.full((n, 3), 0.25, np.float32)
        pos += (np.arange(n, dtype=np.float32)[:, None] * 1e-6)
        with Converter(metadata, tmp_path) as conv:
            conv.add_points_batch(PointBatch(pos))
        m = Metadata.from_path(tmp_path / "metadata.json")
        assert m.hierarchies >= 2
        out = store_points(tmp_path, m)
        assert len(out) == n
        # h0 cell must have a tombstone: re-adding passes straight through
        h0_cells = sorted((tmp_path / "h_0").iterdir())
        assert len(h0_cells) == 1
        cell = Cell.from_path(h0_cells[0])
        assert any(v is None for v in cell.overflow.values())


def test_zero_cache_size_matches_default(tmp_path):
    """cache_size=0 floors to 1 resident cell: capacity 0 used to save a
    freshly created cell before the caller mutated it, silently losing
    every update (found by a round-2 verification probe)."""
    import numpy as np

    rng = np.random.default_rng(2)
    n = 12_000
    batch = PointBatch(
        rng.uniform(-200, 200, (n, 3)).astype(np.float32),
        rng.integers(0, 256, (n, 4)).astype(np.uint8),
    )

    def run(cache_size):
        out = tmp_path / f"c{cache_size}"
        with Converter(Metadata(), out, cache_size=cache_size) as conv:
            for i in range(0, n, 4_000):
                conv.add_points_batch(batch[i : i + 4_000])
        return {
            str(p.relative_to(out)): p.read_bytes()
            for p in out.rglob("*") if p.is_file()
        }

    assert run(0) == run(65_536)
