"""Property tests for correctly-rounded device division."""

import numpy as np

from point_cloud_tpu.ops.exact import exact_div


class TestExactDiv:
    def test_random_uniform(self):
        import jax

        rng = np.random.default_rng(0)
        a = rng.uniform(-1e6, 1e6, 200_000).astype(np.float32)
        b = rng.uniform(0.001, 1000.0, 200_000).astype(np.float32)
        b *= np.where(rng.random(200_000) < 0.5, -1, 1).astype(np.float32)
        got = np.asarray(jax.jit(exact_div)(a, b))
        assert np.array_equal(got, a / b)

    def test_wide_exponents(self):
        import jax

        rng = np.random.default_rng(1)
        a = (rng.normal(0, 1, 100_000) * 10.0 ** rng.integers(-20, 20, 100_000)).astype(
            np.float32
        )
        b = (rng.normal(0, 1, 100_000) * 10.0 ** rng.integers(-20, 20, 100_000)).astype(
            np.float32
        )
        b = np.where(b == 0, np.float32(1.0), b)
        got = np.asarray(jax.jit(exact_div)(a, b))
        with np.errstate(all="ignore"):
            ref = a / b
        # contract: correctly rounded for normal results; subnormal results
        # are flushed by XLA backends and are excluded from the guarantee.
        ok = np.isfinite(ref) & (np.abs(ref) >= np.float32(1.1754944e-38))
        assert np.array_equal(got[ok], ref[ok])

    def test_near_tie_products(self):
        """Quotients constructed to sit within an ulp of a representable."""
        import jax

        rng = np.random.default_rng(2)
        q = rng.uniform(0.5, 2.0, 50_000).astype(np.float32)
        b = rng.uniform(0.5, 2.0, 50_000).astype(np.float32)
        # a near q*b so the quotient is near-representable
        a = (q.astype(np.float64) * b.astype(np.float64)).astype(np.float32)
        jitter = rng.integers(-2, 3, 50_000)
        a = np.frombuffer(
            (a.view(np.int32) + jitter.astype(np.int32)).tobytes(), dtype=np.float32
        )
        got = np.asarray(jax.jit(exact_div)(a, b))
        assert np.array_equal(got, a / b)

    def test_exact_quotients(self):
        import jax

        a = np.array([1.0, 2.0, -6.0, 1000.0, 0.125], np.float32)
        b = np.array([2.0, 2.0, 3.0, 8.0, 0.5], np.float32)
        got = np.asarray(jax.jit(exact_div)(a, b))
        assert np.array_equal(got, a / b)


class TestNearTieMask:
    """ops.dedup._near_tie_mask: the fma-contraction defense (round-5
    fuzz finding). The device distance can drift from the host IEEE
    value by a few ulps directly, plus a cancellation-amplified term of
    ~|p| * sqrt(dist) * 2^-24 — ambiguous pairs must route to the exact
    host fallback, well-separated pairs must not."""

    def _mask(self, dists, positions, same_hash):
        import jax.numpy as jnp
        import jax

        from point_cloud_tpu.ops.dedup import _near_tie_mask

        db = np.asarray(dists, np.float32).view(np.int32)
        out = _near_tie_mask(
            jnp.asarray(np.asarray(same_hash, bool)),
            jnp.asarray(db),
            jnp.asarray(np.asarray(positions, np.float32)),
            jnp.ones(len(dists), bool),
        )
        return np.asarray(out)

    def test_cancellation_amplified_pair_flagged(self):
        # the measured failure shape: dist ~0.018 at |p| ~ 500, device
        # drift ~100 ulp — a ~96-ulp gap must be ambiguous
        d0 = np.float32(0.0181)
        d1 = np.float32(
            (d0.view(np.int32) + 96).astype(np.int32).view(np.float32)
        )
        pos = [[488.0, -202.0, -66.0]] * 2
        m = self._mask([d0, d1], pos, [False, True])
        assert m[1]

    def test_well_separated_pair_not_flagged(self):
        # 2% apart at moderate coordinates: unambiguous at f32
        pos = [[14.0, 3.0, -7.0]] * 2
        m = self._mask([4.5, 4.6], pos, [False, True])
        assert not m[1]

    def test_bit_floor_flags_tiny_distances(self):
        # the float threshold rounds to ~0 for tiny coords; the flat
        # 8-ulp floor still catches near-exact ties
        d0 = np.float32(1e-12)
        d1 = np.float32(
            (d0.view(np.int32) + 3).astype(np.int32).view(np.float32)
        )
        pos = [[1e-3, 1e-3, 1e-3]] * 2
        m = self._mask([d0, d1], pos, [False, True])
        assert m[1]

    def test_run_boundary_never_flags(self):
        # the pair must share a slot run (same_hash gate)
        m = self._mask([0.0181, 0.0181], [[488.0, 0.0, 0.0]] * 2,
                       [False, False])
        assert not m.any()
