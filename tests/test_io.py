"""Reader tests: LAS, PLY (ascii/LE/BE), own-format round trips."""

import numpy as np
import pytest

from point_cloud_tpu.core.point import PointBatch
from point_cloud_tpu.io import get_batched_point_reader
from point_cloud_tpu.io.las import LasPointReader, write_las
from point_cloud_tpu.io.ply import PlyPointReader, write_ply


def random_batch(n, seed=0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-100, 100, (n, 3)).astype(np.float32)
    col = rng.integers(0, 256, (n, 4), dtype=np.uint8)
    col[:, 3] = 255
    return PointBatch(pos, col)


class TestLas:
    def test_round_trip_rgb(self, tmp_path):
        batch = random_batch(1000)
        path = tmp_path / "cloud.las"
        write_las(path, batch, point_format=2)
        reader = LasPointReader(path)
        assert reader.total_points() == 1000
        out = reader.get_batch(2000)
        assert len(out) == 1000
        assert reader.remaining_points() == 0
        # scale quantizes to 1mm; positions match within quantization
        np.testing.assert_allclose(out.positions, batch.positions, atol=2e-3)
        np.testing.assert_array_equal(out.colors, batch.colors)

    def test_no_color_defaults(self, tmp_path):
        batch = random_batch(10)
        path = tmp_path / "plain.las"
        write_las(path, batch, point_format=0)
        out = LasPointReader(path).get_batch(100)
        # missing color -> [0,0,0,255] (reference converter/las.rs:32)
        assert np.all(out.colors[:, :3] == 0)
        assert np.all(out.colors[:, 3] == 255)

    def test_batched_reads(self, tmp_path):
        batch = random_batch(250)
        path = tmp_path / "cloud.las"
        write_las(path, batch)
        reader = LasPointReader(path)
        sizes = []
        while reader.remaining_points() > 0:
            sizes.append(len(reader.get_batch(100)))
        assert sizes == [100, 100, 50]

    def test_u16_color_truncates_low_byte(self, tmp_path):
        """Rust `as u8` takes the low byte (converter/las.rs:39)."""
        import struct
        batch = random_batch(1)
        path = tmp_path / "c.las"
        write_las(path, batch, point_format=2)
        raw = bytearray(path.read_bytes())
        struct.pack_into("<HHH", raw, 227 + 20, 0x1FF, 0x100, 0xABCD)
        path.write_bytes(bytes(raw))
        out = LasPointReader(path).get_batch(1)
        assert list(out.colors[0]) == [0xFF, 0x00, 0xCD, 255]

    def test_compressed_flag_routes_to_laz_reader(self, tmp_path):
        # the plain LAS reader refuses compressed input (the dispatcher
        # open_las_or_laz routes it to LazPointReader; tests/test_laz.py
        # covers the actual decompression)
        batch = random_batch(1)
        path = tmp_path / "c.las"
        write_las(path, batch)
        raw = bytearray(path.read_bytes())
        raw[104] |= 0x80  # laszip compression bit
        laz = tmp_path / "c.laz"
        laz.write_bytes(bytes(raw))
        with pytest.raises(ValueError):
            LasPointReader(laz)


class TestPly:
    @pytest.mark.parametrize(
        "encoding", ["ascii", "binary_little_endian", "binary_big_endian"]
    )
    def test_round_trip(self, tmp_path, encoding):
        batch = random_batch(500)
        path = tmp_path / "cloud.ply"
        write_ply(path, batch, encoding=encoding)
        reader = PlyPointReader(path)
        assert reader.total_points() == 500
        out = PointBatch.concat(list(reader.batches(128)))
        np.testing.assert_array_equal(out.positions, batch.positions)
        np.testing.assert_array_equal(out.colors, batch.colors)

    def test_double_positions_cast_to_f32(self, tmp_path):
        batch = random_batch(100)
        path = tmp_path / "d.ply"
        write_ply(path, batch, double_pos=True)
        out = PlyPointReader(path).get_batch(100)
        np.testing.assert_array_equal(out.positions, batch.positions)

    def test_no_color_defaults(self, tmp_path):
        batch = random_batch(10)
        path = tmp_path / "p.ply"
        write_ply(path, batch, color=False)
        out = PlyPointReader(path).get_batch(10)
        assert np.all(out.colors[:, :3] == 0)
        assert np.all(out.colors[:, 3] == 255)

    def test_extra_and_reordered_properties(self, tmp_path):
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            "element vertex 2\n"
            "property float nx\n"        # ignored
            "property float z\n"         # out of order
            "property uchar red\n"
            "property float x\n"
            "property ushort weird\n"    # ignored
            "property float y\n"
            "end_header\n"
        ).encode()
        rec = np.zeros(2, dtype=[("nx", "<f4"), ("z", "<f4"), ("red", "u1"),
                                 ("x", "<f4"), ("weird", "<u2"), ("y", "<f4")])
        rec["x"] = [1.0, 4.0]
        rec["y"] = [2.0, 5.0]
        rec["z"] = [3.0, 6.0]
        rec["red"] = [7, 8]
        path = tmp_path / "odd.ply"
        path.write_bytes(header + rec.tobytes())
        out = PlyPointReader(path).get_batch(10)
        np.testing.assert_array_equal(
            out.positions, [[1, 2, 3], [4, 5, 6]]
        )
        np.testing.assert_array_equal(out.colors[:, 0], [7, 8])
        np.testing.assert_array_equal(out.colors[:, 1], [0, 0])

    def test_skips_leading_non_vertex_element(self, tmp_path):
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            "element junk 3\n"
            "property ushort a\n"
            "element vertex 1\n"
            "property float x\nproperty float y\nproperty float z\n"
            "end_header\n"
        ).encode()
        junk = np.arange(3, dtype="<u2").tobytes()
        vert = np.array([(9.0, 8.0, 7.0)], dtype="<f4,<f4,<f4").tobytes()
        path = tmp_path / "skip.ply"
        path.write_bytes(header + junk + vert)
        out = PlyPointReader(path).get_batch(5)
        np.testing.assert_array_equal(out.positions, [[9, 8, 7]])

    def test_float_color_normalized(self, tmp_path):
        """Divergence from the reference's `(v/255.0) as u8` truncation bug:
        float colors are treated as normalized [0,1]."""
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            "element vertex 1\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property float red\n"
            "end_header\n"
        ).encode()
        vert = np.array([(0.0, 0.0, 0.0, 0.5)],
                        dtype="<f4,<f4,<f4,<f4").tobytes()
        path = tmp_path / "fc.ply"
        path.write_bytes(header + vert)
        out = PlyPointReader(path).get_batch(1)
        assert out.colors[0, 0] == 128


class TestDispatch:
    def test_extension_dispatch(self, tmp_path):
        from point_cloud_tpu.io.las import LasPointReader
        from point_cloud_tpu.io.ply import PlyPointReader

        batch = random_batch(5)
        las = tmp_path / "a.las"
        ply = tmp_path / "b.ply"
        write_las(las, batch)
        write_ply(ply, batch)
        assert isinstance(get_batched_point_reader(las), LasPointReader)
        assert isinstance(get_batched_point_reader(ply), PlyPointReader)
        assert get_batched_point_reader(tmp_path / "x.xyz") is None


class TestLas14:
    def test_las_1_4_u64_count_wins(self, tmp_path):
        """LAS 1.4 headers carry the point count at offset 247 (u64); it
        overrides the legacy u32 field when nonzero."""
        import struct

        batch = random_batch(50, seed=9)
        path = tmp_path / "v14.las"
        write_las(path, batch, point_format=2)
        raw = bytearray(path.read_bytes())
        # upgrade the header: version 1.4, header size 375, data offset 375
        body = raw[227:]
        header = bytearray(375)
        header[: 227] = raw[:227]
        header[24], header[25] = 1, 4
        struct.pack_into("<H", header, 94, 375)
        struct.pack_into("<I", header, 96, 375)
        struct.pack_into("<I", header, 107, 0)      # legacy count zeroed
        struct.pack_into("<Q", header, 247, 50)     # 1.4 count
        path.write_bytes(bytes(header) + bytes(body))

        reader = LasPointReader(path)
        assert reader.total_points() == 50
        out = reader.get_batch(100)
        assert len(out) == 50
        np.testing.assert_allclose(out.positions, batch.positions, atol=2e-3)


class TestQuantizationSaturation:
    def test_out_of_range_coordinates_saturate(self, tmp_path):
        """Coordinates beyond ±i32·scale saturate to the representable
        range instead of wrapping through an undefined C cast, NaN rows
        pin to the offset, and non-finite rows no longer poison the
        header offset/bbox min-fold (fuzz findings, round 5); the LAZ
        twin quantizes identically."""
        import warnings

        from point_cloud_tpu.io import get_batched_point_reader
        from point_cloud_tpu.io.las import write_las
        from point_cloud_tpu.io.laz import write_laz
        from point_cloud_tpu.core.point import PointBatch

        pos = np.array(
            [
                [0.0, 0.0, 0.0],           # finite anchor: offset = 0
                [1e30, 5.0, 6.0],          # x far beyond the i32 range
                [np.nan, 1.0, -1.0],       # NaN pins to the offset
                [2.0, 3.0, 4.0],           # ordinary row unaffected
            ],
            np.float32,
        )
        col = np.full((4, 4), 255, np.uint8)
        las = tmp_path / "sat.las"
        laz = tmp_path / "sat.laz"
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # the old cast warned
            write_las(las, PointBatch(pos, col))
            write_laz(laz, PointBatch(pos, col))
        a = get_batched_point_reader(las).get_batch(4)
        b = get_batched_point_reader(laz).get_batch(4)
        np.testing.assert_array_equal(a.positions, b.positions)
        lim = (2**31 - 1) * 0.001  # saturated x at mm scale, offset 0
        np.testing.assert_allclose(
            a.positions[1], [lim, 5.0, 6.0], rtol=1e-6, atol=2e-3
        )
        # NaN x pinned to offset (= the finite min, here -1? no: x
        # finite min is 0.0 from the anchor row)
        np.testing.assert_allclose(a.positions[2], [0.0, 1.0, -1.0],
                                   atol=2e-3)
        np.testing.assert_allclose(a.positions[3], [2.0, 3.0, 4.0],
                                   atol=2e-3)
        # the header offset stayed finite despite the NaN/1e30 rows
        from point_cloud_tpu.io.las import LasHeader

        header = LasHeader(las.read_bytes()[:375])
        assert np.isfinite(header.offset).all()
        np.testing.assert_array_equal(header.offset, [0.0, 0.0, 0.0])
