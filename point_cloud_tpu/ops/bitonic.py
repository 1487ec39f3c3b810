"""Bitonic multi-key sort with shape-independent compile time.

XLA's TPU sort emitter unrolls the comparison network, so compile time
grows with both array size and key count (~36 s for the 3-key dedup sort
at 2^18, minutes at 2^20 — see PERF.md). This implementation expresses the
same bitonic network as a ``lax.fori_loop`` whose body uses *dynamic*
partner indices (``iota ^ distance``), so the loop body is traced exactly
once: compile time is constant in the array length (~seconds), at the cost
of explicit gathers per stage.

Sorts four int32 key columns lexicographically, ascending (the fourth is
the arrival index in the dedup pipeline, which also makes the ordering
total — bitonic networks are not stable, a total order sidesteps that).
Length must be a power of two (the dedup pipeline's buckets are).

Select with PCT_SORT=bitonic (ops/dedup.py) when sort-compile latency
matters more than the last millisecond of run time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _lex_gt(a1, a2, a3, a4, b1, b2, b3, b4):
    """(a1..a4) > (b1..b4) lexicographically."""
    return (
        (a1 > b1)
        | ((a1 == b1) & (a2 > b2))
        | ((a1 == b1) & (a2 == b2) & (a3 > b3))
        | ((a1 == b1) & (a2 == b2) & (a3 == b3) & (a4 > b4))
    )


@jax.jit
def bitonic_sort4(k1, k2, k3, k4):
    """Sort (k1, k2, k3, k4) rows ascending; returns the sorted columns.

    All inputs are equal-length power-of-two int32 arrays.
    """
    n = k1.shape[0]
    log_n = int(np.log2(n))
    assert (1 << log_n) == n, "bitonic sort requires power-of-two length"
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape(n)

    def substage(carry, stage, sub):
        a1, a2, a3, a4 = carry
        d = jnp.int32(1) << sub
        is_low_pair = (idx & d) == 0
        # partner = idx ^ d: +d for the low half of each pair, -d for the
        # high half — two contiguous rolls instead of a random gather
        # (TPU gathers serialize; rolls are shifts)
        def partner(col):
            return jnp.where(
                is_low_pair, jnp.roll(col, -d), jnp.roll(col, d)
            )

        b1 = partner(a1)
        b2 = partner(a2)
        b3 = partner(a3)
        b4 = partner(a4)
        # ascending block if bit `stage` of the index is 0
        block_up = (idx & (jnp.int32(1) << stage)) == 0
        is_low = is_low_pair
        gt = _lex_gt(a1, a2, a3, a4, b1, b2, b3, b4)
        lt = _lex_gt(b1, b2, b3, b4, a1, a2, a3, a4)
        # the low element of each pair keeps the min in ascending blocks;
        # expressed symmetrically so both pair members agree
        want_swap = jnp.where(
            block_up,
            jnp.where(is_low, gt, lt),
            jnp.where(is_low, lt, gt),
        )
        a1 = jnp.where(want_swap, b1, a1)
        a2 = jnp.where(want_swap, b2, a2)
        a3 = jnp.where(want_swap, b3, a3)
        a4 = jnp.where(want_swap, b4, a4)
        return (a1, a2, a3, a4)

    def outer(stage, carry):
        def inner(m, c):
            return substage(c, stage, stage - 1 - m)

        return jax.lax.fori_loop(0, stage, inner, carry)

    return jax.lax.fori_loop(1, log_n + 1, outer, (k1, k2, k3, k4))
