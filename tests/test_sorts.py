"""Sort backend tests: lax-loop bitonic + experimental Pallas kernel
(interpret mode) against the NumPy lexsort oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from point_cloud_tpu.ops.bitonic import bitonic_sort4


def oracle(cols, arrival):
    order = np.lexsort((arrival, cols[2], cols[1], cols[0]))
    return np.stack(
        [cols[0][order], cols[1][order], cols[2][order], arrival[order]],
        axis=1,
    )


def run_case(fn, n, seed, lo=-1000, hi=1000):
    rng = np.random.default_rng(seed)
    cols = [rng.integers(lo, hi, n).astype(np.int32) for _ in range(3)]
    arrival = np.arange(n, dtype=np.int32)
    out = fn(*(jnp.asarray(c) for c in cols), jnp.asarray(arrival))
    got = np.stack([np.asarray(o) for o in out], axis=1)
    np.testing.assert_array_equal(got, oracle(cols, arrival))


class TestBitonic:
    @pytest.mark.parametrize("n", [2, 8, 1 << 10, 1 << 14])
    def test_matches_lexsort(self, n):
        run_case(bitonic_sort4, n, seed=n)

    def test_many_duplicates_stable_by_arrival(self):
        run_case(bitonic_sort4, 1 << 12, seed=1, lo=0, hi=4)

    def test_extreme_values(self):
        n = 1 << 10
        rng = np.random.default_rng(2)
        cols = [
            rng.integers(-(2**31), 2**31, n, dtype=np.int64).astype(np.int32)
            for _ in range(3)
        ]
        cols[0][:4] = [2**31 - 1, -(2**31), 0, -1]
        arrival = np.arange(n, dtype=np.int32)
        out = bitonic_sort4(*(jnp.asarray(c) for c in cols), jnp.asarray(arrival))
        got = np.stack([np.asarray(o) for o in out], axis=1)
        np.testing.assert_array_equal(got, oracle(cols, arrival))


class TestPallasSortInterpret:
    """Semantic validation of the tiled kernel via the Pallas interpreter
    (off-TPU it auto-selects interpret mode, see sort_pallas.py)."""

    # < one tile (pad path), exactly one tile, and multi-tile (the
    # cross-tile XLA merge + the scalar-prefetch merge kernel)
    @pytest.mark.parametrize("n", [1 << 10, 1 << 14, 1 << 16, 1 << 18])
    def test_matches_lexsort(self, n):
        from point_cloud_tpu.ops.sort_pallas import pallas_sort4

        run_case(pallas_sort4, n, seed=n)

    def test_many_duplicates_total_by_arrival(self):
        from point_cloud_tpu.ops.sort_pallas import pallas_sort4

        run_case(pallas_sort4, 1 << 16, seed=1, lo=0, hi=4)

    def test_dedup_shaped_keys(self):
        """Keys shaped like the dedup pipeline's: clamped hashes, padding
        rows at i32::MAX, arrival = iota (< 2^30, the padding contract)."""
        from point_cloud_tpu.ops.sort_pallas import pallas_sort4

        n = 1 << 14
        rng = np.random.default_rng(7)
        ch = rng.integers(0, 2**31 - 1, n).astype(np.int32)
        sh = rng.integers(-(2**31), 2**31, n, dtype=np.int64).astype(np.int32)
        db = rng.integers(0, 2**31 - 1, n).astype(np.int32)
        ch[-37:] = 2**31 - 1  # "padding" rows of a padded batch
        sh[-37:] = 0
        db[-37:] = 2**31 - 1
        arrival = np.arange(n, dtype=np.int32)
        out = pallas_sort4(
            *(jnp.asarray(c) for c in (ch, sh, db)), jnp.asarray(arrival)
        )
        got = np.stack([np.asarray(o) for o in out], axis=1)
        np.testing.assert_array_equal(got, oracle([ch, sh, db], arrival))
