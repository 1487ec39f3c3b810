"""Property tests for the hex-prism sub-grid quantization.

Oracle: a direct scalar transcription of the reference formulas
(point-converter/src/hex.rs) evaluated with explicit float32 steps.
"""

import numpy as np
import pytest

from point_cloud_tpu.core import hex as hexgrid

f32 = np.float32
SQRT_3 = hexgrid.SQRT_3


def scalar_axial_from_world(pos, radius):
    """Scalar float32 transcription of hex.rs:67-85."""
    radius = f32(radius)
    px, py, pz = (f32(v) for v in pos)
    x = f32(px / f32(radius * SQRT_3))
    y = f32(py / f32(-radius * SQRT_3))
    t = f32(f32(SQRT_3 * y) + f32(1.0))
    temp1 = f32(np.floor(f32(t + x)))
    temp2 = f32(t - x)
    temp3 = f32(f32(f32(2.0) * x) + f32(1.0))
    qf = f32(f32(temp1 + temp3) / f32(3.0))
    rf = f32(f32(temp1 + temp2) / f32(3.0))
    q = int(np.floor(qf))
    r = -int(np.floor(rf))
    h = int(np.trunc(f32(pz / radius)))  # `as i32` truncates
    return (q, r, h)


def scalar_axial_to_world(axial, radius):
    """Scalar float32 transcription of hex.rs:55-65."""
    radius = f32(radius)
    q, r, h = (f32(v) for v in axial)
    x = f32(radius * f32(f32(SQRT_3 * q) + f32(f32(SQRT_3 / f32(2.0)) * r)))
    y = f32(f32(f32(radius * f32(3.0)) / f32(2.0)) * r)
    z = f32(h * radius)
    return np.array([x, y, z], dtype=np.float32)


@pytest.fixture
def random_positions():
    rng = np.random.default_rng(42)
    return rng.uniform(-500, 500, size=(5000, 3)).astype(np.float32)


class TestOffsetAxial:
    def test_round_trip(self):
        rng = np.random.default_rng(0)
        idx = rng.integers(-10_000, 10_000, size=(10_000, 3)).astype(np.int32)
        assert np.array_equal(
            hexgrid.axial_to_offset(hexgrid.offset_to_axial(idx)), idx
        )
        assert np.array_equal(
            hexgrid.offset_to_axial(hexgrid.axial_to_offset(idx)), idx
        )

    def test_negative_parity(self):
        # Rust (y & 1) on negatives matches Python's two's-complement &
        offs = np.array([[0, -3, 0], [5, -4, 2], [-7, 7, -1]], np.int32)
        ax = hexgrid.offset_to_axial(offs)
        # q = x - (y - (y & 1)) / 2
        expected_q = [0 - (-3 - 1) // 2, 5 - (-4 - 0) // 2, -7 - (7 - 1) // 2]
        assert list(ax[:, 0]) == expected_q


class TestFromWorld:
    @pytest.mark.parametrize("radius", [0.0520833333, 0.5, 5.2083335, 96.0])
    def test_matches_scalar_oracle(self, random_positions, radius):
        got = hexgrid.axial_from_world(random_positions, radius)
        for i in range(0, len(random_positions), 37):
            expected = scalar_axial_from_world(random_positions[i], radius)
            assert tuple(got[i]) == expected, (i, random_positions[i])

    def test_z_truncation_not_floor(self):
        # z-layer uses `as i32` (truncation): -0.5/1.0 -> 0, not -1
        idx = hexgrid.axial_from_world(np.array([[0.0, 0.0, -0.5]], np.float32), 1.0)
        assert idx[0, 2] == 0
        idx = hexgrid.axial_from_world(np.array([[0.0, 0.0, -1.5]], np.float32), 1.0)
        assert idx[0, 2] == -1


class TestToWorld:
    def test_matches_scalar_oracle(self):
        rng = np.random.default_rng(7)
        idx = rng.integers(-1000, 1000, size=(500, 3)).astype(np.int32)
        got = hexgrid.axial_to_world(idx, 2.5)
        for i in range(0, len(idx), 13):
            expected = scalar_axial_to_world(idx[i], 2.5)
            assert np.array_equal(got[i], expected)

    def test_quantize_center_round_trip(self):
        """from_world(to_world(idx)) == idx for hex centers (XY)."""
        rng = np.random.default_rng(3)
        axial = rng.integers(-200, 200, size=(2000, 3)).astype(np.int32)
        radius = 0.25
        world = hexgrid.axial_to_world(axial, radius)
        # z centers: to_world puts z at layer boundary h*radius; nudge into
        # the layer interior (truncation makes boundaries half-open and
        # denormal-sensitive for negative h)
        world[:, 2] += np.float32(radius) * np.sign(world[:, 2] + 0.25) * 0.25
        back = hexgrid.axial_from_world(world, radius)
        assert np.array_equal(back[:, :2], axial[:, :2])


class TestJaxParity:
    def test_jax_matches_numpy(self, random_positions):
        import jax.numpy as jnp

        for radius in [0.052083332, 1.0, 10.416667]:
            np_idx = hexgrid.offset_from_world(random_positions, radius)
            jax_idx = np.asarray(
                hexgrid.jax_offset_from_world(jnp.asarray(random_positions), radius)
            )
            assert np.array_equal(np_idx, jax_idx)

    def test_jax_to_world_matches_numpy(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(11)
        idx = rng.integers(-1000, 1000, size=(512, 3)).astype(np.int32)
        np_w = hexgrid.offset_to_world(idx, 0.5)
        jax_w = np.asarray(hexgrid.jax_offset_to_world(jnp.asarray(idx), 0.5))
        assert np.array_equal(np_w, jax_w)
