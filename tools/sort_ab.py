"""A/B the tiled Pallas sort against the lax bitonic on the real chip.

Usage: python tools/sort_ab.py [log2_sizes...]   (default: 20 22 23)

Timing follows PERF.md's measurement rules: steady state after one
warmup, and a scalar readback forces completion because
``block_until_ready`` acks at enqueue through this tunnel.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from point_cloud_tpu.ops.runtime import setup_jax_cache

setup_jax_cache()

from point_cloud_tpu.ops.bitonic import bitonic_sort4  # noqa: E402
from point_cloud_tpu.ops.sort_pallas import pallas_sort4  # noqa: E402


def _chain(fn, cols, reps):
    t0 = time.perf_counter()
    out = list(cols)
    for _ in range(reps):
        out = list(fn(*out))
    float(out[0][0])  # scalar readback = true sync (PERF.md trap #1)
    return time.perf_counter() - t0


def _time(fn, cols, k1=2, k2=10):
    """Per-rep time via rep-difference: chain k1 and k2 sorts
    output->input (the network is data-oblivious, so per-rep work is
    identical) and divide the sync-time difference by k2-k1 — the
    ~28 ms tunnel readback latency cancels exactly."""
    _chain(fn, cols, 1)  # warmup (compile + program upload)
    _chain(fn, cols, 1)  # PERF.md trap #2: first timed loop runs slow
    best = float("inf")
    for _ in range(2):
        t_lo = _chain(fn, cols, k1)
        t_hi = _chain(fn, cols, k2)
        best = min(best, (t_hi - t_lo) / (k2 - k1))
    return best, fn(*cols)


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [20, 22, 23]
    rng = np.random.default_rng(7)
    for lg in sizes:
        n = 1 << lg
        k123 = rng.integers(-(2**31), 2**31, size=(3, n), dtype=np.int64)
        cols = [jnp.asarray(k.astype(np.int32)) for k in k123]
        cols.append(jnp.asarray(np.arange(n, dtype=np.int32)))
        tp, outp = _time(lambda *c: pallas_sort4(*c), cols)
        tb, outb = _time(lambda *c: bitonic_sort4(*c), cols)
        eq = all(
            bool(jnp.array_equal(a, b)) for a, b in zip(outp, outb)
        )
        print(
            f"2^{lg}: pallas {tp*1e3:8.1f} ms ({n/tp/1e6:6.1f} Mrows/s)"
            f"  bitonic {tb*1e3:8.1f} ms  speedup {tb/tp:4.2f}x"
            f"  equal={eq}"
        )


if __name__ == "__main__":
    main()
