"""Pallas TPU kernel: VMEM-resident bitonic multi-key sort.

The lax-loop bitonic sort (ops/bitonic.py) round-trips HBM on every
substage: at 2^18 rows that is ~171 substages x 4 MB of traffic, ~30 ms.
This kernel loads the four int32 key columns into VMEM once, runs the
whole network on-chip with statically-unrolled substages, and writes back
once — HBM traffic drops from ~1.4 GB to 8 MB.

TPU-shaped details: data lives as (rows, 128) — Mosaic crashes on 1-D
rolls but handles 2-D lane/sublane rolls natively. The flattened partner
exchange ``roll by d`` decomposes into a sublane (row) roll for the
``d // 128`` part plus a lane roll with a row-carry select for ``d % 128``
(all shifts static, so each lowers to a cheap vector shift).

STATUS — experimental, off by default (PCT_SORT=pallas to opt in).
Round-2 measurement on the v5e (PERF.md): at 2^14 rows the first call
takes 131 s (Mosaic compile happens server-side through the tunnel) and
steady state runs 250 ms — the lax-loop bitonic sorts 16x the rows in
~30 ms, i.e. this kernel is ~130x slower per element. The per-substage
full-array compare/roll/select path is the bottleneck, so a *tiled*
variant assembled from the same substages cannot close the gap; closing
it needs a different algorithm inside the tile (e.g. a rank-based
counting merge or per-lane sorting networks over registers). Until then
the lax-loop bitonic (ops/bitonic.py, ~2 s compile / ~30 ms at 2^18)
remains the default. Kept for the record plus a Mosaic pitfall it
documents: selects with i1-valued branches crash this libtpu's compiler
— use boolean algebra.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_PALLAS_ROWS = 1 << 18
LANES = 128


def _lex_gt(a, b):
    a1, a2, a3, a4 = a
    b1, b2, b3, b4 = b
    return (
        (a1 > b1)
        | ((a1 == b1) & (a2 > b2))
        | ((a1 == b1) & (a2 == b2) & (a3 > b3))
        | ((a1 == b1) & (a2 == b2) & (a3 == b3) & (a4 > b4))
    )


def _roll_flat(x, d: int, lane_idx):
    """Roll the row-major flattening of (R, 128) right by static d."""
    rows = x.shape[0]
    n = rows * LANES
    d = d % n
    q, r = divmod(d, LANES)
    if q:
        x = pltpu.roll(x, q, 0)
    if r:
        a = pltpu.roll(x, r, 1)  # lane roll (within rows)
        b = pltpu.roll(a, 1, 0)  # row-carry for the wrapped lanes
        x = jnp.where(lane_idx >= r, a, b)
    return x


def _make_kernel(n: int):
    log_n = int(np.log2(n))
    rows = n // LANES

    def kernel(k1, k2, k3, k4, o1, o2, o3, o4):
        row_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
        lane_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
        idx = row_idx * LANES + lane_idx
        cols = [k1[:], k2[:], k3[:], k4[:]]

        for stage in range(1, log_n + 1):
            block_up = (idx & np.int32(1 << stage)) == 0
            for sub in range(stage - 1, -1, -1):
                d = 1 << sub
                is_low = (idx & np.int32(d)) == 0
                partners = [
                    jnp.where(
                        is_low,
                        _roll_flat(c, n - d, lane_idx),  # left by d
                        _roll_flat(c, d, lane_idx),  # right by d
                    )
                    for c in cols
                ]
                gt = _lex_gt(cols, partners)
                lt = _lex_gt(partners, cols)
                # NB: boolean algebra, not where() — Mosaic (this libtpu)
                # crashes on selects with i1-valued branches
                same = block_up == is_low
                want_swap = (same & gt) | (jnp.logical_not(same) & lt)
                cols = [
                    jnp.where(want_swap, p, c)
                    for c, p in zip(cols, partners)
                ]

        o1[:] = cols[0]
        o2[:] = cols[1]
        o3[:] = cols[2]
        o4[:] = cols[3]

    return kernel


def pallas_bitonic_sort4(k1, k2, k3, k4):
    """Sort four equal-length pow2 int32 columns lexicographically.

    Length must be a power of two, >= 1024 (so the (rows, 128) layout has
    at least 8 sublanes) and <= MAX_PALLAS_ROWS (VMEM budget).
    """
    n = k1.shape[0]
    assert n <= MAX_PALLAS_ROWS, "exceeds VMEM budget; use bitonic_sort4"
    assert n >= 1024 and n % LANES == 0, "needs n = pow2 >= 1024"
    rows = n // LANES
    shape2d = (rows, LANES)
    out_shape = [jax.ShapeDtypeStruct(shape2d, jnp.int32)] * 4
    outs = pl.pallas_call(
        _make_kernel(n),
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
    )(
        k1.reshape(shape2d), k2.reshape(shape2d),
        k3.reshape(shape2d), k4.reshape(shape2d),
    )
    return tuple(o.reshape(n) for o in outs)
