"""Pallas TPU kernel: tiled VMEM bitonic multi-key sort.

The lax-loop bitonic (ops/bitonic.py) round-trips HBM on every substage
(~210 substages x 16 MB at 2^20). This kernel sorts 2^15-element tiles
entirely in VMEM and only touches HBM for the cross-tile merge substages,
with a layout chosen for how Mosaic actually lowers data movement:

* Round 1's kernel (see git history) flattened the array row-major across
  lanes, so every small-distance exchange was a lane roll plus a row-carry
  select — measured ~130x SLOWER than the lax bitonic (PERF.md): Mosaic
  lowers cross-lane rolls + i1-mask selects to scalar-ish code.
* This version stores a tile SUBLANE-MAJOR: element i lives at
  (row = i % SUB, lane = i // SUB) of a (SUB, 128) block. A bitonic
  exchange at distance d < SUB — 92 of a tile sort's 120 substages — is
  then a pure *sublane regrouping*: reshape (SUB, 128) ->
  (SUB/2d, 2, d, 128), compare the two halves, select, stack back. No
  rolls, no carries, last dim stays 128 throughout. Only the 28 substages
  with d >= SUB cross lanes (two static lane rolls + select; the
  lane-splitting reshape is rejected by this libtpu's Mosaic:
  "infer-vector-layout: unsupported shape cast").
* Cross-tile substages at d > TILE run OUTSIDE the kernel as plain XLA
  elementwise min/max over a (T/2dt, 2, dt*SUB, 128) reshape —
  contiguous and fusable. The d = TILE substage folds INTO the merge
  kernel (a two-tile stacked block makes it a row exchange at distance
  SUB), saving one dispatch + HBM round trip per merge stage.

Two Mosaic limits shape the decomposition (both hit and measured, see
PERF.md): compile time grows superlinearly with the unrolled substage
count (one 136-substage kernel ran >20 min server-side), and scoped VMEM
tops out at 16 MB (a 2^16-element tile needed 17.6 MB of stack) — hence
2^15-element tiles and stage-chunked kernels.

Direction bits come free: stage s's direction is (i >> s) & 1, which for
in-tile stages is a static iota mask and for merge stages depends only on
the tile index — computed from pl.program_id, so ONE compiled merge
kernel (stage passed as a scalar-prefetch arg) serves every merge level,
and one set of sort kernels serves every tile count via the grid.

Sorts four i32 columns lexicographically ascending, any pow2 n >= 1024
(n < TILE pads up with +inf-like rows; the 4th column must stay below
2^30 so padding sorts strictly last — the dedup pipeline's arrival column
always does). See ops/dedup.py for the caller contract; select with
PCT_SORT=pallas.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 256  # sublane extent of a tile block
LANES = 128  # lane extent (fixed by the VPU)
TILE = SUB * LANES  # 2^15 elements per tile
LOG_TILE = TILE.bit_length() - 1
_I32_MAX = np.int32(2**31 - 1)
_PAD_ARRIVAL_BASE = np.int32(1 << 30)


def _lex_gt4(a, b):
    a1, a2, a3, a4 = a
    b1, b2, b3, b4 = b
    return (a1 > b1) | (
        (a1 == b1)
        & (
            (a2 > b2)
            | ((a2 == b2) & ((a3 > b3) | ((a3 == b3) & (a4 > b4))))
        )
    )


def _swap_halves(lo, hi, up):
    """Compare-exchange: ascending pairs where ``up``. Strict total order
    assumed (the arrival column is unique), so descending uses not(gt).
    NB boolean algebra on masks only — i1-valued select *branches* crash
    this libtpu's Mosaic (round-1 finding, still avoided)."""
    gt = _lex_gt4(lo, hi)
    swap = gt == up  # up: swap iff lo>hi; down: swap iff not(lo>hi)
    new_lo = [jnp.where(swap, h, l) for l, h in zip(lo, hi)]
    new_hi = [jnp.where(swap, l, h) for l, h in zip(lo, hi)]
    return new_lo, new_hi


def _exchange_rows(cols, d: int, up, rows: int = SUB):
    """Row-regrouping compare-exchange at row distance ``d`` (< rows) on
    four (rows, LANES) sublane-major columns."""
    shape = (rows // (2 * d), 2, d, LANES)
    r = [c.reshape(shape) for c in cols]
    lo = [x[:, 0] for x in r]
    hi = [x[:, 1] for x in r]
    nl, nh = _swap_halves(lo, hi, up)
    return [
        jnp.stack([l, h], axis=1).reshape(rows, LANES)
        for l, h in zip(nl, nh)
    ]


def _exchange_lanes(cols, dl: int, up, rows: int = SUB):
    """Lane-crossing compare-exchange at lane distance ``dl`` via two
    static lane rolls + select (rows-agnostic: every row is independent,
    so stacked multi-tile blocks work unchanged)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    is_lo = (lane & dl) == 0
    partners = [
        jnp.where(
            is_lo,
            pltpu.roll(c, LANES - dl, 1),
            pltpu.roll(c, dl, 1),
        )
        for c in cols
    ]
    gt = _lex_gt4(cols, partners)
    lt = _lex_gt4(partners, cols)
    same = up == is_lo
    want = (same & gt) | (~same & lt)
    return [jnp.where(want, p, c) for c, p in zip(cols, partners)]


def _exchange(cols, d: int, up):
    """One bitonic substage at element distance ``d`` (static, < TILE) on
    four (SUB, LANES) sublane-major columns. ``up`` is a bool array
    broadcastable to the lo-half shape (or a scalar)."""
    if d < SUB:
        return _exchange_rows(cols, d, up)
    return _exchange_lanes(cols, d // SUB, up)


def _up_slice(up_full, d: int):
    """Slice a (SUB, LANES) direction mask to the lo-half shape of the
    ``d``-distance exchange (pairs share their direction bit)."""
    if d < SUB:
        return up_full.reshape(SUB // (2 * d), 2, d, LANES)[:, 0]
    return up_full  # lane case needs the full mask (roll formulation)


# stage chunks per kernel, (first, last) inclusive — bounds each Mosaic
# program's compile time and stack footprint (module docstring)
_SORT_STAGE_CHUNKS = ((1, 8), (9, 11), (12, 13), (14, LOG_TILE))


def _make_sort_chunk_kernel(first_st: int, last_st: int):
    def kernel(k1, k2, k3, k4, o1, o2, o3, o4):
        cols = [k1[:], k2[:], k3[:], k4[:]]
        row = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)
        i_local = lane * SUB + row  # sublane-major element index
        for st in range(first_st, last_st + 1):
            if st < LOG_TILE:
                up_full = (i_local & np.int32(1 << st)) == 0
            for sub in range(st - 1, -1, -1):
                d = 1 << sub
                if st < LOG_TILE:
                    up = _up_slice(up_full, d)
                else:
                    # the final sort stage's direction is the tile-index
                    # parity: the first cross-tile merge then sees
                    # alternating asc/desc tiles, the bitonic invariant
                    up = (pl.program_id(0) & 1) == 0
                cols = _exchange(cols, d, up)
        o1[:] = cols[0]
        o2[:] = cols[1]
        o3[:] = cols[2]
        o4[:] = cols[3]

    kernel.__name__ = f"sort_tile_st{first_st}_{last_st}"
    return kernel


_SORT_CHUNK_KERNELS = [
    _make_sort_chunk_kernel(a, b) for a, b in _SORT_STAGE_CHUNKS
]


def _merge_pair_kernel(shift_ref, k1, k2, k3, k4, o1, o2, o3, o4):
    """Adjacent-tile substage (d = TILE) plus all in-tile substages
    (d = TILE/2..1) of a merge stage s > LOG_TILE, fused over a two-tile
    stacked block (2*SUB, LANES) — one dispatch and one HBM round trip
    per merge stage instead of two.

    Folding is exact because with shift = s - LOG_TILE >= 1 both tiles
    of an adjacent pair share the stage's direction bit
    ((2p >> shift) == (2p+1 >> shift) == p >> (shift-1)); the d = TILE
    substage pairs equal in-tile offsets of the two tiles, which in the
    stacked layout is a row exchange at distance SUB; in-tile row
    substages (d < SUB) regroup within 2d-row blocks that never span the
    tile boundary (SUB % 2d == 0); and lane substages act on each row
    independently."""
    up = ((pl.program_id(0) >> (shift_ref[0] - 1)) & 1) == 0
    cols = [k1[:], k2[:], k3[:], k4[:]]
    cols = _exchange_rows(cols, SUB, up, rows=2 * SUB)  # d = TILE
    for sub in range(LOG_TILE - 1, -1, -1):
        d = 1 << sub
        if d < SUB:
            cols = _exchange_rows(cols, d, up, rows=2 * SUB)
        else:
            cols = _exchange_lanes(cols, d // SUB, up, rows=2 * SUB)
    o1[:] = cols[0]
    o2[:] = cols[1]
    o3[:] = cols[2]
    o4[:] = cols[3]


def _tile_specs(n_tiles: int):
    spec = pl.BlockSpec(
        (SUB, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM
    )
    out_shape = [
        jax.ShapeDtypeStruct((n_tiles * SUB, LANES), jnp.int32)
    ] * 4
    return spec, out_shape


def _call_sort_tiles(cols, n_tiles: int, interpret: bool):
    spec, out_shape = _tile_specs(n_tiles)
    for kernel in _SORT_CHUNK_KERNELS:
        cols = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            out_shape=out_shape,
            in_specs=[spec] * 4,
            out_specs=[spec] * 4,
            interpret=interpret,
        )(*cols)
    return list(cols)


def _call_merge_pairs(cols, n_tiles: int, shift: int, interpret: bool):
    _, out_shape = _tile_specs(n_tiles)
    # index maps under PrefetchScalarGridSpec also receive the scalar ref
    spec = pl.BlockSpec(
        (2 * SUB, LANES), lambda t, s_ref: (t, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles // 2,),
        in_specs=[spec] * 4,
        out_specs=[spec] * 4,
    )
    return pl.pallas_call(
        _merge_pair_kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.asarray([shift], jnp.int32), *cols)


def _cross_exchange(cols, n_tiles: int, d: int, stage: int):
    """Cross-tile substage (d >= TILE) as plain XLA elementwise compare:
    reshape pairs tile t with t ^ (d/TILE) block-aligned — contiguous,
    fully fusable, no gathers."""
    dt = d // TILE
    rows = n_tiles * SUB
    shape = (n_tiles // (2 * dt), 2, dt * SUB, LANES)
    tile_of_row = np.arange(rows, dtype=np.int64) // SUB
    up_rows = ((tile_of_row >> (stage - LOG_TILE)) & 1) == 0
    up = up_rows.reshape(n_tiles // (2 * dt), 2, dt * SUB, 1)[:, 0]
    r = [c.reshape(shape) for c in cols]
    lo = [x[:, 0] for x in r]
    hi = [x[:, 1] for x in r]
    nl, nh = _swap_halves(lo, hi, jnp.asarray(up))
    return [
        jnp.stack([l, h], axis=1).reshape(rows, LANES)
        for l, h in zip(nl, nh)
    ]


def _transpose_block_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:].T


def _transpose_blocks(c, in_shape, out_shape, n_tiles: int,
                      interpret: bool):
    """Per-tile 2-D transpose as a Pallas kernel: XLA's transpose of
    these (128, 256) blocks runs ~26x slower than Mosaic's native
    relayout (measured at 2^20, PERF.md)."""
    return pl.pallas_call(
        _transpose_block_kernel,
        grid=(n_tiles,),
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles * out_shape[0], out_shape[1]), jnp.int32
        ),
        in_specs=[
            pl.BlockSpec(in_shape, lambda t: (t, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(out_shape, lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(c)


def _to_tiles(c, n_tiles: int, interpret: bool):
    """flat (n,) -> (T*SUB, LANES) with element i at (t*SUB + i%SUB,
    (i%TILE)//SUB) — the sublane-major tile layout."""
    return _transpose_blocks(
        c.reshape(n_tiles * LANES, SUB), (LANES, SUB), (SUB, LANES),
        n_tiles, interpret,
    )


def _from_tiles(c, n_tiles: int, interpret: bool):
    return _transpose_blocks(
        c, (SUB, LANES), (LANES, SUB), n_tiles, interpret
    ).reshape(n_tiles * TILE)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_sort4_impl(k1, k2, k3, k4, interpret: bool):
    n = k1.shape[0]
    if n < TILE:
        pad = TILE - n
        fill = jnp.full(pad, _I32_MAX, jnp.int32)
        arrival = _PAD_ARRIVAL_BASE + jax.lax.broadcasted_iota(
            jnp.int32, (pad, 1), 0
        ).reshape(pad)
        k1, k2, k3 = (
            jnp.concatenate([k, fill]) for k in (k1, k2, k3)
        )
        k4 = jnp.concatenate([k4, arrival])
    n_pad = k1.shape[0]
    n_tiles = n_pad // TILE
    log_n = n_pad.bit_length() - 1

    cols = [_to_tiles(c, n_tiles, interpret) for c in (k1, k2, k3, k4)]
    cols = _call_sort_tiles(cols, n_tiles, interpret)
    for s in range(LOG_TILE + 1, log_n + 1):
        # d = TILE folds into the pair kernel; only d > TILE stay in XLA
        for sub in range(s - 1, LOG_TILE, -1):
            cols = _cross_exchange(cols, n_tiles, 1 << sub, s)
        cols = _call_merge_pairs(cols, n_tiles, s - LOG_TILE, interpret)
    out = [_from_tiles(c, n_tiles, interpret) for c in cols]
    return tuple(o[:n] for o in out)


def pallas_sort4(k1, k2, k3, k4, interpret: bool | None = None):
    """Sort four equal-length pow2 i32 columns lexicographically.

    Length must be pow2 >= 1024. For n < TILE the columns are padded with
    (i32::MAX, i32::MAX, i32::MAX, 2^30 + i) rows, which sort strictly
    last provided every real k4 is < 2^30 (the dedup arrival column is).
    ``interpret`` defaults to True off-TPU so tests run on the CPU mesh.
    """
    n = k1.shape[0]
    assert n >= 1024 and (n & (n - 1)) == 0, "needs n = pow2 >= 1024"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _pallas_sort4_impl(k1, k2, k3, k4, interpret)
