"""Property-based tests (hypothesis) for the core math invariants."""

import numpy as np
from hypothesis import given, settings, strategies as st

from point_cloud_tpu.core import hex as hexgrid
from point_cloud_tpu.core.json_compat import format_f32, format_f64

finite_f32 = st.floats(
    min_value=-(2.0**100), max_value=2.0**100, allow_nan=False,
    allow_infinity=False, width=32,
)
any_f32 = st.floats(allow_nan=True, allow_infinity=True, width=32)
small_i32 = st.integers(min_value=-(2**20), max_value=2**20 - 1)
radius_f32 = st.floats(min_value=2.0**-10, max_value=2.0**13,
                       allow_nan=False, width=32)


class TestHexProperties:
    @given(st.lists(small_i32, min_size=3, max_size=3))
    @settings(max_examples=200, deadline=None)
    def test_offset_axial_round_trip(self, idx):
        offset = np.asarray([idx], np.int32)
        back = hexgrid.axial_to_offset(hexgrid.offset_to_axial(offset))
        np.testing.assert_array_equal(back, offset)
        axial = np.asarray([idx], np.int32)
        back = hexgrid.offset_to_axial(hexgrid.axial_to_offset(axial))
        np.testing.assert_array_equal(back, axial)

    @given(st.lists(st.integers(-500, 500), min_size=3, max_size=3),
           radius_f32)
    @settings(max_examples=150, deadline=None)
    def test_hex_center_quantizes_to_itself(self, idx, radius):
        """to_world of a slot re-quantizes into the same slot.

        Exact in XY (hex centers are interior points). Z is a faithful
        reference quirk: ``to_world`` returns the layer *base* ``h *
        radius`` (hex.rs:55-65) and ``from_world`` truncates ``z /
        radius`` (hex.rs:83), so f32 rounding on the boundary can land one
        layer down — allowed within 1.
        """
        offset = np.asarray([idx], np.int32)
        center = hexgrid.offset_to_world(offset, np.float32(radius))
        if not np.isfinite(center).all():
            return
        requant = hexgrid.offset_from_world(center, np.float32(radius))
        np.testing.assert_array_equal(requant[:, :2], offset[:, :2])
        assert abs(int(requant[0, 2]) - idx[2]) <= 1

    @given(st.lists(finite_f32, min_size=3, max_size=3), radius_f32)
    @settings(max_examples=100, deadline=None)
    def test_quantization_deterministic_and_finite(self, pos, radius):
        p = np.asarray([pos], np.float32)
        a = hexgrid.offset_from_world(p, np.float32(radius))
        b = hexgrid.offset_from_world(p, np.float32(radius))
        np.testing.assert_array_equal(a, b)
        assert a.dtype == np.int32


class TestSaturationProperties:
    @given(any_f32)
    @settings(max_examples=300, deadline=None)
    def test_saturating_cast_total(self, v):
        """NaN -> 0, +big -> i32::MAX, -big -> i32::MIN, in-range exact."""
        out = int(hexgrid._np_saturating_i32(np.float32(v)))
        f = np.float32(v)
        if np.isnan(f):
            assert out == 0
        elif f >= 2147483648.0:
            assert out == 2**31 - 1
        elif f <= -2147483904.0:
            assert out == -(2**31)
        else:
            assert out == int(f)  # truncation toward zero


class TestRyuProperties:
    @given(any_f32)
    @settings(max_examples=500, deadline=None)
    def test_f32_shortest_round_trip(self, v):
        """Our serde_json-style text parses back to the exact same f32."""
        f = np.float32(v)
        text = format_f32(float(f))
        if np.isnan(f) or np.isinf(f):
            assert text == "null"
            return
        assert np.float32(float(text)) == f or (
            f == 0.0 and float(text) == 0.0
        )
        # serde_json pretty floats always contain '.' or 'e'
        assert "." in text or "e" in text

    @given(st.floats(allow_nan=False, allow_infinity=False))
    @settings(max_examples=300, deadline=None)
    def test_f64_shortest_round_trip(self, v):
        text = format_f64(v)
        assert float(text) == v or (v == 0.0 and float(text) == 0.0)


class TestCellProperties:
    @given(st.integers(1, 400), st.integers(0, 2**31))
    @settings(max_examples=30, deadline=None)
    def test_add_points_conserves_points(self, n, seed):
        """winners + losers == inputs, one winner per slot."""
        from point_cloud_tpu.core.cell import Cell, CellId
        from point_cloud_tpu.core.metadata import MetadataConfig
        from point_cloud_tpu.core.point import PointBatch

        rng = np.random.default_rng(seed)
        config = MetadataConfig()
        cell_size = config.cell_size(0)
        cell = Cell(
            CellId(0, (0, 0, 0)), config.sub_cell_size(cell_size), cell_size,
            config.cell_pos(np.zeros(3, np.int32), cell_size),
        )
        pos = rng.uniform(0, float(cell_size), (n, 3)).astype(np.float32)
        losers = cell.add_points(PointBatch(pos))
        assert len(cell.points) + len(losers) == n
        sub = cell.sub_indices
        assert len(np.unique(sub, axis=0)) == len(sub)
        # counters consistent
        assert cell.number_of_points == len(cell.points)

    @given(st.integers(1, 200), st.integers(0, 2**31))
    @settings(max_examples=20, deadline=None)
    def test_codec_round_trip_any_batch(self, n, seed):
        from point_cloud_tpu.core.cell import Cell, CellId
        from point_cloud_tpu.core.metadata import MetadataConfig
        from point_cloud_tpu.core.point import PointBatch

        rng = np.random.default_rng(seed)
        config = MetadataConfig()
        cell_size = config.cell_size(3)
        cell = Cell(
            CellId(3, (-2, 5, 1)), config.sub_cell_size(cell_size), cell_size,
            config.cell_pos(np.asarray([-2, 5, 1], np.int32), cell_size),
        )
        pos = rng.uniform(-1000, 1000, (n, 3)).astype(np.float32)
        col = rng.integers(0, 256, (n, 4), dtype=np.uint8)
        cell.add_points(PointBatch(pos, col))
        data = cell.to_bytes()
        restored = Cell.from_bytes(data)
        assert restored.to_bytes() == data  # codec idempotent
