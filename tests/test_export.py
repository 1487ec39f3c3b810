"""Store exporter tests: store -> LAS/LAZ/PLY round-trips.

The exporter reverses the reference's one-way pipeline (interchange ->
store, own.rs re-conversion only): every stored point must come back
out bit-exact (PLY) or within the declared quantization (LAS/LAZ), in
constant RAM (streamed batches), with the header counts taken from
metadata.json.
"""

import zlib
from pathlib import Path

import numpy as np
import pytest

from point_cloud_tpu.convert.converter import Converter
from point_cloud_tpu.core.cell import Cell
from point_cloud_tpu.core.metadata import Metadata
from point_cloud_tpu.core.point import PointBatch
from point_cloud_tpu.export import export_store
from point_cloud_tpu.io import get_batched_point_reader


def _build_store(tmp_path, n=20_000, seed=None):
    rng = np.random.default_rng(
        zlib.crc32(b"export") if seed is None else seed
    )
    pos = rng.uniform(-80, 80, (n, 3)).astype(np.float32)
    col = rng.integers(0, 256, (n, 4), dtype=np.uint8)
    store = tmp_path / "store"
    metadata = Metadata()
    with Converter(metadata, store) as conv:
        conv.add_points_batch(PointBatch(pos, col))
    return store


def _store_points(store) -> PointBatch:
    metadata = Metadata.from_path(store / "metadata.json")
    chunks = []
    for path in sorted(store.rglob("*.bin")):
        chunks.append(Cell.from_path(path).all_points())
    batch = PointBatch.concat(chunks)
    assert len(batch) == metadata.number_of_points
    return batch


def _sorted_rows(batch: PointBatch) -> np.ndarray:
    rows = np.concatenate(
        [batch.positions.view(np.uint32), batch.colors.astype(np.uint32)],
        axis=1,
    )
    order = np.lexsort(rows.T[::-1])
    return rows[order]


def _read_all(path) -> PointBatch:
    reader = get_batched_point_reader(path)
    chunks = []
    while reader.remaining_points():
        chunk = reader.get_batch(65_536)
        if not len(chunk):
            break
        chunks.append(chunk)
    return PointBatch.concat(chunks)


class TestExportPly:
    def test_ply_bit_exact(self, tmp_path):
        store = _build_store(tmp_path)
        out = tmp_path / "cloud.ply"
        written = export_store(store, out, batch_size=4_096)
        stored = _store_points(store)
        assert written == len(stored)
        back = _read_all(out)
        np.testing.assert_array_equal(
            _sorted_rows(back), _sorted_rows(stored)
        )

    def test_ascii_ply_round_trips(self, tmp_path):
        store = _build_store(tmp_path, n=500)
        out = tmp_path / "cloud.ply"
        export_store(store, out, encoding="ascii", batch_size=128)
        back = _read_all(out)
        stored = _store_points(store)
        np.testing.assert_array_equal(
            _sorted_rows(back), _sorted_rows(stored)
        )


def _expected_las(stored: PointBatch, store, scale: float,
                  color: bool) -> PointBatch:
    """The bit-exact PointBatch the LAS read path must produce: i32
    quantization against the exporter's offset (the store bbox min),
    reconstructed with the reader's own f64 arithmetic, colors
    widened u8->u16 then truncated back (identity), alpha forced 255."""
    metadata = Metadata.from_path(Path(store) / "metadata.json")
    offset = np.asarray(metadata.bounding_box.min, np.float64)
    raw = np.round(
        (stored.positions.astype(np.float64) - offset) / scale
    ).astype(np.int32)
    pos = (raw.astype(np.float64) * scale + offset).astype(np.float32)
    if color:
        col = stored.colors.copy()
        col[:, 3] = 255
    else:
        col = np.zeros_like(stored.colors)
        col[:, 3] = 255
    return PointBatch(pos, col)


class TestExportLas:
    @pytest.mark.parametrize("point_format", [0, 2, 3, 6, 8])
    def test_las_quantized_round_trip(self, tmp_path, point_format):
        store = _build_store(tmp_path)
        out = tmp_path / "cloud.las"
        scale = 0.001
        written = export_store(
            store, out, point_format=point_format,
            scale=(scale,) * 3, batch_size=4_096,
        )
        stored = _store_points(store)
        assert written == len(stored)
        back = _read_all(out)
        assert len(back) == len(stored)
        expected = _expected_las(
            stored, store, scale, color=point_format in (2, 3, 8)
        )
        np.testing.assert_array_equal(
            _sorted_rows(back), _sorted_rows(expected)
        )
        # the quantization the reader sees is within half a quantum
        np.testing.assert_allclose(
            expected.positions, stored.positions, atol=scale * 0.51
        )

    def test_batch_size_does_not_change_bytes(self, tmp_path):
        """Streaming is an implementation detail: the same store must
        produce byte-identical .las at any batch size (gps_base keeps
        the default GPS clock continuous across batches)."""
        store = _build_store(tmp_path, n=5_000)
        a, b = tmp_path / "a.las", tmp_path / "b.las"
        export_store(store, a, fmt="las", point_format=3, batch_size=512)
        export_store(store, b, fmt="las", point_format=3,
                     batch_size=1 << 20)
        assert a.read_bytes() == b.read_bytes()


class TestExportLaz:
    def test_laz_round_trip(self, tmp_path):
        pytest.importorskip("point_cloud_tpu.io.laz")
        from point_cloud_tpu.io import laz as laz_mod

        try:
            laz_mod._native()
        except NotImplementedError:
            pytest.skip("no C++ toolchain for the LAZ codec")
        store = _build_store(tmp_path)
        out = tmp_path / "cloud.laz"
        written = export_store(store, out, batch_size=4_096)
        stored = _store_points(store)
        assert written == len(stored)
        back = _read_all(out)
        expected = _expected_las(stored, store, 0.001, color=True)
        np.testing.assert_array_equal(
            _sorted_rows(back), _sorted_rows(expected)
        )


class TestExportErrors:
    def test_metadata_mismatch_fails_loudly(self, tmp_path):
        """A store whose cells disagree with metadata.json must raise
        (and remove the short output), not write a silently short file."""
        store = _build_store(tmp_path, n=2_000)
        # corrupt: claim more points than the cells hold
        metadata = Metadata.from_path(store / "metadata.json")
        metadata.number_of_points += 17
        metadata.write_to_path(store / "metadata.json")
        out = tmp_path / "cloud.ply"
        with pytest.raises(RuntimeError, match="validate"):
            export_store(store, out)
        assert not out.exists()

    def test_unknown_format_rejected(self, tmp_path):
        store = _build_store(tmp_path, n=100)
        with pytest.raises(ValueError, match="fmt"):
            export_store(store, tmp_path / "cloud.xyz")

    def test_overcount_metadata_fails_loudly(self, tmp_path):
        """Cells holding MORE points than metadata claims must also
        raise (the reader caps reads at the metadata total, which would
        otherwise truncate silently)."""
        store = _build_store(tmp_path, n=2_000)
        metadata = Metadata.from_path(store / "metadata.json")
        metadata.number_of_points -= 17
        metadata.write_to_path(store / "metadata.json")
        out = tmp_path / "cloud.ply"
        with pytest.raises(RuntimeError, match="more points"):
            export_store(store, out)
        assert not out.exists()

    def test_bad_params_leave_no_artifact(self, tmp_path):
        """Parameter validation runs before the output opens: a bad
        point_format or scale must neither create nor truncate out_path."""
        store = _build_store(tmp_path, n=100)
        out = tmp_path / "cloud.las"
        out.write_bytes(b"precious")
        with pytest.raises(ValueError, match="point_format"):
            export_store(store, out, point_format=5)
        with pytest.raises(ValueError, match="scale"):
            export_store(store, out, scale=(0.0, 0.0, 0.0))
        with pytest.raises(ValueError, match="i32"):
            export_store(store, out, scale=(1e-9, 1e-9, 1e-9))
        assert out.read_bytes() == b"precious"

    def test_write_las_bad_format_keeps_existing_file(self, tmp_path):
        from point_cloud_tpu.io.las import write_las

        out = tmp_path / "x.las"
        out.write_bytes(b"precious")
        with pytest.raises(ValueError):
            write_las(out, PointBatch.empty(), point_format=5)
        assert out.read_bytes() == b"precious"

    def test_las_header_extents_match_store_bbox(self, tmp_path):
        """External consumers trust the header Max/Min fields: they must
        carry the store bounding box, not zeros."""
        import struct

        store = _build_store(tmp_path, n=1_000)
        out = tmp_path / "cloud.las"
        export_store(store, out)
        metadata = Metadata.from_path(store / "metadata.json")
        head = out.read_bytes()[:227]
        for axis in range(3):
            hi = struct.unpack_from("<d", head, 179 + axis * 16)[0]
            lo = struct.unpack_from("<d", head, 187 + axis * 16)[0]
            assert lo == pytest.approx(
                float(metadata.bounding_box.min[axis]), abs=1e-6
            )
            assert hi == pytest.approx(
                float(metadata.bounding_box.max[axis]), abs=1e-6
            )
            assert hi > lo


class TestExportCli:
    def test_cli_end_to_end(self, tmp_path):
        from point_cloud_tpu.export import main

        store = _build_store(tmp_path, n=3_000)
        out = tmp_path / "cloud.ply"
        assert main([str(store), str(out)]) == 0
        back = _read_all(out)
        stored = _store_points(store)
        np.testing.assert_array_equal(
            _sorted_rows(back), _sorted_rows(stored)
        )

    def test_cli_las_flags(self, tmp_path):
        from point_cloud_tpu.export import main

        store = _build_store(tmp_path, n=1_000)
        out = tmp_path / "cloud.las"
        assert main([
            str(store), str(out), "--point-format", "3",
            "--scale", "0.01", "--batch-size", "256",
        ]) == 0
        back = _read_all(out)
        stored = _store_points(store)
        expected = _expected_las(stored, store, 0.01, color=True)
        np.testing.assert_array_equal(
            _sorted_rows(back), _sorted_rows(expected)
        )
