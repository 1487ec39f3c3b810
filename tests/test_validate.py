"""Store validator: clean stores pass, every corruption class is caught."""

import shutil
import struct

import numpy as np
import pytest

from point_cloud_tpu.convert.converter import Converter
from point_cloud_tpu.core.metadata import Metadata
from point_cloud_tpu.core.point import PointBatch
from point_cloud_tpu.validate import validate_store


@pytest.fixture()
def store(tmp_path):
    rng = np.random.default_rng(8)
    batch = PointBatch(
        rng.uniform(-200, 200, (20_000, 3)).astype(np.float32),
        rng.integers(0, 256, (20_000, 4)).astype(np.uint8),
    )
    out = tmp_path / "store"
    with Converter(Metadata(), out) as conv:
        conv.add_points_batch(batch)
    return out


def first_cell(store):
    return sorted((store / "h_0").glob("c_*.bin"))[0]


class TestValidateStore:
    def test_clean_store_passes(self, store):
        report = validate_store(store)
        assert report.ok, report.issues
        assert report.points + report.overflow_points == 20_000

    def test_counter_corruption_caught(self, store):
        path = first_cell(store)
        data = bytearray(path.read_bytes())
        # total_points is the u32 at offset 16 (after id u32 + 3x i32)
        total = struct.unpack_from("<I", data, 16)[0]
        struct.pack_into("<I", data, 16, total + 5)
        path.write_bytes(bytes(data))
        report = validate_store(store)
        assert any("total" in i or "number_of_points" in i
                   for i in report.issues), report.issues

    def test_misplaced_cell_file_caught(self, store):
        # a cell moved to the wrong name/hierarchy must be flagged
        src = first_cell(store)
        dst = store / "h_0" / "c_40_40_40.bin"
        shutil.move(src, dst)
        report = validate_store(store)
        assert any("c_40_40_40" in i and "filename" in i
                   for i in report.issues), report.issues

    def test_truncated_cell_caught(self, store):
        path = first_cell(store)
        path.write_bytes(path.read_bytes()[:37])
        report = validate_store(store)
        assert any("unparseable" in i for i in report.issues), report.issues

    def test_foreign_point_caught(self, store):
        # flip a stored point's x to a coordinate outside this cell
        path = first_cell(store)
        data = bytearray(path.read_bytes())
        struct.pack_into("<f", data, 48, 1e7)  # first point record
        path.write_bytes(bytes(data))
        report = validate_store(store)
        assert any("outside" in i for i in report.issues), report.issues

    def test_orphan_file_caught(self, store):
        (store / "h_0" / "notes.txt").write_text("hi")
        report = validate_store(store)
        assert any("unexpected file" in i for i in report.issues)

    def test_missing_metadata_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            validate_store(tmp_path)

    def test_cli(self, store, capsys):
        from point_cloud_tpu.validate import main

        assert main([str(store)]) == 0
        assert "store OK" in capsys.readouterr().out
        first_cell(store).write_bytes(b"junk")
        assert main([str(store)]) == 1
