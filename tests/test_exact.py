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
