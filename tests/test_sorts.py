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
    """Semantic validation of the experimental kernel via the Pallas
    interpreter (the TPU-compiled path is opt-in, see sort_pallas.py)."""

    @pytest.mark.parametrize("n", [1 << 10, 1 << 12])
    def test_matches_lexsort(self, n):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from point_cloud_tpu.ops import sort_pallas as sp

        rng = np.random.default_rng(n)
        cols = [rng.integers(-500, 500, n).astype(np.int32) for _ in range(3)]
        arrival = np.arange(n, dtype=np.int32)
        rows = n // sp.LANES
        outs = pl.pallas_call(
            sp._make_kernel(n),
            out_shape=[jax.ShapeDtypeStruct((rows, sp.LANES), jnp.int32)] * 4,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            interpret=True,
        )(
            *[jnp.asarray(c).reshape(rows, sp.LANES) for c in cols],
            jnp.asarray(arrival).reshape(rows, sp.LANES),
        )
        got = np.stack([np.asarray(o).reshape(n) for o in outs], axis=1)
        np.testing.assert_array_equal(got, oracle(cols, arrival))
