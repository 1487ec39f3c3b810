"""Splat rasterization on TPU: depth-tested circular point splats.

TPU-native re-design of the reference's indirect splat draw (reference:
src/plugins/render/point/pipelines/render.wgsl:70-138 + the per-bucket
orchestration in src/plugins/render/point.rs:117-218). There is no
rasterizer on a TPU, so the billboard-quad + fragment-discard pipeline
becomes a fragment-expansion + scatter pass:

- each visible point's splat footprint is expanded to a static KxK pixel
  window around its projected center; pixels outside the projected circle
  are masked out (the WGSL ``discard`` at render.wgsl:106-108),
- depth per fragment: flat mode uses the point's NDC z; voronoi mode
  offsets the view-space z by ``radius * (1 - |p|^2)`` and reprojects
  (render.wgsl:110-116), which makes overlapping splats partition the
  screen like a Voronoi diagram,
- the depth test is a scatter-min of f32 depths followed by a masked
  scatter-min of point ids among the exact-minimum fragments, which makes
  the winner deterministic (ties go to the lowest point id; the GPU's
  outcome is submission-order dependent). Depth semantics are LessEqual.

The clear color (0.16 grey) and depth (1.0) match the reference's clear
pass (src/plugins/wgpu.rs:301-332).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

CLEAR_COLOR = (0.16, 0.16, 0.16)  # wgpu.rs:310-316
# the same grey as an 8-bit pixel: round(0.16 * 255 + 0.5) — what
# write_png produced from the f32 clear color before frames went u8
CLEAR_COLOR_U8 = tuple(int(c * 255.0 + 0.5) for c in CLEAR_COLOR)
CLEAR_DEPTH = 1.0
# static KxK fragment window per splat. Each fragment costs ~15 ns across
# the two XLA scatter-mins (PERF.md), so the footprint is the raster knob:
# 5 covers splats up to 2.5 px half-extent at 25 frags/pt; 9 covers 4.5 px
# at 81 frags/pt (the renderer's window ladder routes each splat to the
# smallest exact window, so large footprints only tax the splats that
# need them). Splats larger than the window render clipped — the
# scatter rasterizer's documented divergence from the reference's
# billboard-quad hardware rasterization (render.wgsl:70-95).
DEFAULT_FOOTPRINT = 5

_NO_ID = np.int32(2**31 - 1)


class Framebuffer(NamedTuple):
    depth: jax.Array  # (H*W,) f32
    point_id: jax.Array  # (H*W,) i32, _NO_ID where uncovered


def make_framebuffer(height: int, width: int) -> Framebuffer:
    return Framebuffer(
        depth=jnp.full((height * width,), CLEAR_DEPTH, jnp.float32),
        point_id=jnp.full((height * width,), _NO_ID, jnp.int32),
    )


@partial(jax.jit, static_argnames=("out_size",))
def compact_rows(keep, view_pos, ndc, radius, point_id, out_size: int):
    """Pack the cull survivors into a dense ``out_size``-row buffer.

    The scatter-min rasterizer pays ~15 ns per fragment whether a row is
    a survivor, a culled point, or pow2 padding — compacting first makes
    raster cost track the *visible* count (typically 20-40% of rows).
    Survivors beyond ``out_size`` are dropped (mode="drop"); the renderer
    sizes ``out_size`` from the previous frame's survivor count with
    headroom, so that only ever clips a frame right after a large
    visibility jump, and self-corrects on the next frame.

    Scatter cost is per element, so only a 1-element/row permutation
    index scatters; the row payloads follow as (cheap) gathers.
    """
    n = keep.shape[0]
    count = jnp.sum(keep.astype(jnp.int32))
    idx = jnp.cumsum(keep.astype(jnp.int32)) - 1
    dest = jnp.where(keep, idx, out_size)  # non-survivors scatter to OOB
    perm = jnp.zeros(out_size, jnp.int32).at[dest].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop"
    )
    out_valid = jnp.arange(out_size, dtype=jnp.int32) < count
    return (
        view_pos[perm],
        ndc[perm],
        radius[perm],
        point_id[perm],
        out_valid,
    )


@jax.jit
def compact_classes(masks):
    """Rank C exclusive footprint classes with ONE index scatter.

    ``masks`` is (C, N) bool, one row per class, rows disjoint. Returns
    a (2N,) permutation buffer ``perm`` where class i's survivor row
    indices sit densely at [offsets[i], offsets[i] + counts[i]), plus
    the (C,) ``counts`` and ``offsets`` — both DEVICE values, so this
    program's compile key is only the bucket shape (C, N).

    Two measured traps shaped this formulation (bench orbit, v5e):

    - A first cut keyed the program on the static tuple of per-class
      buffer sizes; any single class resizing under the sticky ladder
      minted a whole new executable (5-17 s compile + ~1 s first-run
      cost through the tunnel) — 0.37 fps vs 5. Offsets must be
      device values, never shape.
    - A second cut gathered the row payloads (view_pos/ndc/radius/ids)
      into 2N-row staging buffers here; four materializing gathers
      over bucket rows cost ~25 ms per bucket (~10 ns/row each,
      PERF.md). Only the 4-byte perm index is worth materializing —
      payload gathers belong in :func:`rasterize_class_slice`, sized
      by the class's out_size slice and fused into the raster program
      (the same economics as :func:`compact_rows`).

    The buffer is padded to 2N rows (pad = N, an always-invalid row
    index masked by the raster's `arange < count`) so a class slice
    (start <= N, length <= N) never clamps — a clamped start would
    misalign that valid mask.
    """
    c, n = masks.shape
    masks_i = masks.astype(jnp.int32)
    counts = jnp.sum(masks_i, axis=1)  # (C,)
    offsets = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1]]
    )
    ranks = jnp.cumsum(masks_i, axis=1) - 1  # (C, N) rank within class
    dest = jnp.full(n, 2 * n, jnp.int32)  # untouched rows -> OOB ("drop")
    for i in range(c):
        dest = jnp.where(masks[i], offsets[i] + ranks[i], dest)
    perm = jnp.zeros(2 * n, jnp.int32).at[dest].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop"
    )  # unfilled slots gather row 0; the raster's valid mask drops them
    return perm, counts, offsets


def splat_pixel_radii(view_pos, radius, projection, width: int, height: int):
    """Projected splat half-extents in pixels (exact raster arithmetic).

    Shared by :func:`rasterize_splats` and the renderer's footprint
    classifier — both must see bit-identical f32 values: a point with
    rx < 0.5 and ry < 0.5 can only ever light its center pixel (every
    neighbour fragment sits >= 0.5 px from the true center in some axis,
    so its normalized offset exceeds 1 and fails the inside-circle test),
    which is what makes the footprint-1 fast path image-identical.
    """
    w_clip = jnp.maximum(-view_pos[:, 2], 1e-6)  # perspective_rh: w = -z
    rx = radius * projection[0, 0] / w_clip * (0.5 * width)
    ry = radius * projection[1, 1] / w_clip * (0.5 * height)
    rx = jnp.maximum(rx, 1e-6)
    ry = jnp.maximum(ry, 1e-6)
    return rx, ry


_GATHER_BANK = 8


def banked_gather(values, idx):
    """``values[idx]`` via an (M, 8)-row gather + one-hot lane select.

    A materializing 1-D gather costs ~10 ns/index on this chip; gathering
    8-wide rows and selecting the lane with a where/sum one-hot is ~2.8x
    faster at the same index count (measured, PERF.md primitive table). The select
    keeps the exact gathered lane (where, not multiply, so NaN in other
    lanes never leaks); the one caveat vs a direct gather is -0.0
    returning as +0.0 through the sum — equal under every comparison the
    callers make. Falls back to the direct gather when values' length is
    not bank-aligned.
    """
    n = values.shape[0]
    if n % _GATHER_BANK:
        return values[idx]
    banked = values.reshape(-1, _GATHER_BANK)
    rows = banked[idx >> 3]  # (M, 8)
    lane = (idx & (_GATHER_BANK - 1))[:, None]
    sel = jnp.arange(_GATHER_BANK, dtype=jnp.int32)[None, :] == lane
    return jnp.sum(
        jnp.where(sel, rows, jnp.zeros((), values.dtype)), axis=1
    )


def _make_fragments(view_pos, ndc, radius, point_id, valid, projection,
                    height: int, width: int, k: int, voronoi: bool,
                    invalid_idx: int):
    """Expand N splats into N*k*k fragments (flat pixel index, f32 depth,
    point id); invalid fragments carry ``invalid_idx`` as their index.

    The single source of fragment math: the scatter rasterizer and the
    sorted rasterizer both consume these exact values, which is what
    makes the two paths image-identical (tests/test_render_kernel.py).
    """
    # projected center in pixels (wgsl viewport transform, compute.wgsl:185)
    px = (ndc[:, 0] * 0.5 + 0.5) * width
    py = (ndc[:, 1] * -0.5 + 0.5) * height

    # splat radius in pixels: r_ndc = radius * P[0,0] / w  (w = clip w)
    rx, ry = splat_pixel_radii(view_pos, radius, projection, width, height)

    # window placement: odd k centers on round(center) and covers
    # [-(k-1)/2, (k-1)/2]; even k bases on floor(center) and covers
    # [-(k/2-1), k/2]. Both are image-exact for half-extents < k/2
    # (every pixel within r of the true center falls in the window:
    # ceil(c-r) >= floor(c)-k/2+1 and floor(c+r) <= floor(c)+k/2 when
    # r < k/2) — even windows halve the fragment count of the next odd
    # rung for the splats that fit them (4 vs 9, 16 vs 25).
    if k % 2:
        half = (k - 1) // 2
        base_x, base_y = jnp.round(px), jnp.round(py)
    else:
        half = k // 2 - 1
        base_x, base_y = jnp.floor(px), jnp.floor(py)
    offs = jnp.arange(-half, k - half, dtype=jnp.float32)
    dx = jnp.tile(offs, k)  # (k*k,)
    dy = jnp.repeat(offs, k)

    frag_x = base_x[:, None] + dx[None, :]  # (N, k*k)
    frag_y = base_y[:, None] + dy[None, :]

    # normalized offset from the true (unrounded) center, in radius units
    nx = (frag_x - px[:, None]) / rx[:, None]
    ny = (frag_y - py[:, None]) / ry[:, None]
    d2 = nx * nx + ny * ny
    inside = d2 <= 1.0  # render.wgsl:106-108

    if voronoi:
        # paraboloid depth: z_view + radius * (1 - |p|^2), reprojected
        # (render.wgsl:110-116)
        weight = 1.0 - d2
        depth_off = radius[:, None] * weight
        moved_z = view_pos[:, 2:3] + depth_off
        clip_z = projection[2, 2] * moved_z + projection[2, 3] * 1.0
        clip_w = -moved_z  # perspective_rh row 3 = (0, 0, -1, 0)
        frag_depth = clip_z / clip_w
    else:
        frag_depth = jnp.broadcast_to(ndc[:, 2:3], d2.shape)
    frag_depth = frag_depth.astype(jnp.float32)

    on_screen = (
        (frag_x >= 0) & (frag_x < width) & (frag_y >= 0) & (frag_y < height)
    )
    frag_valid = inside & on_screen & valid[:, None]
    frag_valid &= (frag_depth >= 0.0) & (frag_depth <= 1.0)

    flat_idx = (
        frag_y.astype(jnp.int32) * width + frag_x.astype(jnp.int32)
    ).reshape(-1)
    flat_idx = jnp.where(
        frag_valid.reshape(-1), flat_idx, jnp.int32(invalid_idx)
    )
    frag_depth_flat = frag_depth.reshape(-1)
    frag_ids = jnp.broadcast_to(
        point_id[:, None].astype(jnp.int32), d2.shape
    ).reshape(-1)
    return flat_idx, frag_depth_flat, frag_ids


def _rasterize_body(
    framebuffer: Framebuffer,
    view_pos,  # (N, 4) f32 view-space positions
    ndc,  # (N, 3) f32
    radius,  # (N,) f32 world-space splat radius (hierarchy spacing)
    point_id,  # (N,) i32 global point ids (index into the color table)
    valid,  # (N,) bool
    projection,  # (4, 4) f32
    height: int,
    width: int,
    footprint: int,
    voronoi: bool,
) -> Framebuffer:
    """Depth-test ``N`` splats into ``framebuffer``; returns the new buffer."""
    # invalid fragments get an index one past the buffer: mode="drop"
    # discards out-of-bounds indices, but NOT -1 (JAX scatter indices
    # wrap, so -1 would silently hit the last pixel — a corner-pixel
    # corruption this exact test setup caught)
    oob = height * width
    flat_idx, frag_depth_flat, frag_ids = _make_fragments(
        view_pos, ndc, radius, point_id, valid, projection,
        height, width, footprint, voronoi, invalid_idx=oob,
    )

    old_depth = framebuffer.depth
    new_depth = old_depth.at[flat_idx].min(frag_depth_flat, mode="drop")

    # winner resolution: pixels whose depth improved take ids only from this
    # pass's exact-minimum fragments; exact ties keep the smallest id
    improved = new_depth < old_depth
    ids = jnp.where(improved, _NO_ID, framebuffer.point_id)
    min_at_frag = banked_gather(new_depth, jnp.clip(flat_idx, 0, oob - 1))
    is_winner = (frag_depth_flat == min_at_frag) & (flat_idx < oob)
    ids = ids.at[jnp.where(is_winner, flat_idx, oob)].min(
        frag_ids, mode="drop"
    )
    return Framebuffer(depth=new_depth, point_id=ids)


@partial(jax.jit, static_argnames=("height", "width", "footprint", "voronoi"))
def rasterize_splats(
    framebuffer: Framebuffer,
    view_pos,
    ndc,
    radius,
    point_id,
    valid,
    projection,
    height: int = 720,
    width: int = 1280,
    footprint: int = DEFAULT_FOOTPRINT,
    voronoi: bool = True,
) -> Framebuffer:
    """Jitted :func:`_rasterize_body` (see there for semantics)."""
    return _rasterize_body(
        framebuffer, view_pos, ndc, radius, point_id, valid, projection,
        height, width, footprint, voronoi,
    )


@partial(
    jax.jit,
    static_argnames=("height", "width", "footprint", "voronoi", "out_size"),
)
def rasterize_class_slice(
    framebuffer: Framebuffer,
    view_pos,  # (N, ...) ORIGINAL bucket payloads (not staged copies)
    ndc,
    radius,
    point_id,
    perm,  # (2N,) i32 class-ranked row indices from compact_classes
    start,  # i32 device scalar: the class's offset into perm
    count,  # i32 device scalar: the class's survivor count
    projection,
    height: int,
    width: int,
    footprint: int,
    voronoi: bool,
    out_size: int,
) -> Framebuffer:
    """Raster one footprint class through its slice of the class perm.

    Slices ``out_size`` perm entries at the class's device-side
    ``start`` (static length, dynamic offset — shape-stable), gathers
    the row payloads for just those rows (fused into this program;
    see compact_classes' docstring for why payloads must not be staged
    eagerly), and masks rows beyond ``count``. ``out_size`` comes from
    the renderer's sticky pow2 ladder, so the compile key matches the
    per-class vocabulary the old per-class compaction had; survivors
    beyond ``out_size`` are dropped (the ladder's self-correcting clip
    contract).
    """
    p = jax.lax.dynamic_slice_in_dim(perm, start, out_size)
    valid = jnp.arange(out_size, dtype=jnp.int32) < count
    # materialize the gathered rows ONCE: without the barrier XLA fuses
    # each gather into its (out_size, k*k)-broadcast consumers in the
    # fragment expansion, re-executing it per fragment instead of per row
    vp, nd, rd, pid = jax.lax.optimization_barrier(
        (view_pos[p], ndc[p], radius[p], point_id[p])
    )
    return _rasterize_body(
        framebuffer, vp, nd, rd, pid, valid,
        projection, height, width, footprint, voronoi,
    )


@partial(
    jax.jit,
    static_argnames=("height", "width", "footprint", "voronoi", "out_size"),
)
def emit_fragments(
    keep, view_pos, ndc, radius, point_id, projection,
    height: int, width: int, footprint: int, voronoi: bool, out_size: int,
):
    """Compact ``keep`` survivors to ``out_size`` rows and expand them to
    fragments for the sorted rasterizer (one fused pass per footprint
    class). Invalid fragments carry i32::MAX so the fragment sort pushes
    them to the tail."""
    rows = compact_rows(keep, view_pos, ndc, radius, point_id, out_size)
    view_c, ndc_c, radius_c, ids_c, valid_c = rows
    return _make_fragments(
        view_c, ndc_c, radius_c, ids_c, valid_c, projection,
        height, width, footprint, voronoi, invalid_idx=int(_NO_ID),
    )


_PART_CHUNK = 1024  # lanes per independent partition chunk (pow2)


def _partition_chunks(key, *cols, chunk: int = _PART_CHUNK):
    """Sort each ``chunk``-lane slice of the columns ascending by ``key``
    (unique within its chunk), independently per chunk.

    The ops/bitonic.py formulation (fori_loop substages, roll-based
    partners — the loop body traces ONCE, so compile time and live
    memory stay constant in n; an unrolled reshape network OOM'd HBM at
    2^21 rows) restricted to in-chunk distances: 55 substages for a
    1024-lane chunk instead of the full array's 210+. Direction bits
    come from the LOCAL index (bit ``stage`` of i % chunk — zero at the
    final stage, so every chunk independently sorts ascending); rolls
    fetch i ^ d, which stays inside the chunk for every d < chunk."""
    n = key.shape[0]
    assert n % chunk == 0
    log_c = chunk.bit_length() - 1
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape(n)
    local = idx & jnp.int32(chunk - 1)
    all_cols = (key,) + tuple(cols)

    def substage(carry, stage, sub):
        d = jnp.int32(1) << sub
        is_low = (idx & d) == 0

        def partner(c):
            return jnp.where(is_low, jnp.roll(c, -d), jnp.roll(c, d))

        k = carry[0]
        pk = partner(k)
        block_up = (local & (jnp.int32(1) << stage)) == 0
        gt = k > pk
        lt = pk > k  # keys unique within a chunk: no tie handling
        want_swap = jnp.where(
            block_up,
            jnp.where(is_low, gt, lt),
            jnp.where(is_low, lt, gt),
        )
        return tuple(jnp.where(want_swap, partner(c), c) for c in carry)

    def outer(stage, carry):
        def inner(m, c):
            return substage(c, stage, stage - 1 - m)

        return jax.lax.fori_loop(0, stage, inner, carry)

    return jax.lax.fori_loop(1, log_c + 1, outer, all_cols)


def compact_winner_rows(pix, depth_bits, ids, win, n_pix: int):
    """Compact the ``win`` rows of a pixel-sorted fragment list to the
    front (order preserved), padded per 128-lane block; loser/pad rows
    carry pix == _NO_ID.

    Scatter cost on this chip is per row PROCESSED (~7.5 ns), not per
    row landed (PERF.md "Sorted raster: measured negative result"), so
    the framebuffer merge must not see the full fragment width. Three
    steps, none a full-width scatter:

    1. per-chunk stable partition (``_partition_chunks``): key =
       rank-among-winners for winners (exclusive cumsum), chunk+lane
       for losers — winners land at the chunk front in original order,
    2. per-chunk block counts -> aligned block offsets (tiny cumsum),
    3. squeeze: one 128-lane-row gather moves each chunk's winner
       blocks to their packed position (block b of the output maps to
       exactly one source block because offsets are 128-aligned).

    Output length: static bound min(n, blocks(n_pix) + one pad block
    per chunk) * 128 — at 2^21 fragments on a 640x480 frame that is
    ~3.6x fewer scatter rows; denser frames squeeze harder. Returns
    (pix, depth_bits, ids) compacted."""
    n = pix.shape[0]
    chunk = _PART_CHUNK
    n_chunks = n // chunk
    npix_blocks = (n_pix + 127) // 128
    nb_out = min(n // 128, npix_blocks + n_chunks)
    if n % chunk or nb_out * 128 >= n:
        # tiny or incompressible bucket: the merge would process the
        # same rows either way — skip the partition entirely
        return jnp.where(win, pix, _NO_ID), depth_bits, ids

    winc = win.reshape(n_chunks, chunk).astype(jnp.int32)
    rank = jnp.cumsum(winc, axis=1) - winc
    lane = jax.lax.broadcasted_iota(jnp.int32, (n_chunks, chunk), 1)
    key = jnp.where(winc > 0, rank, chunk + lane).reshape(n)
    pix_m = jnp.where(win, pix, _NO_ID)
    _, pix_p, db_p, ids_p = _partition_chunks(
        key, pix_m, depth_bits, ids, chunk=chunk
    )

    counts = jnp.sum(winc, axis=1)
    blocks_c = (counts + 127) // 128
    ends = jnp.cumsum(blocks_c)
    boff = ends - blocks_c
    total_blocks = ends[-1]
    b = jnp.arange(nb_out, dtype=jnp.int32)
    c = (
        jnp.searchsorted(boff, b, side="right").astype(jnp.int32) - 1
    )
    c = jnp.clip(c, 0, n_chunks - 1)
    src = c * (chunk // 128) + (b - boff[c])
    src = jnp.where(b < total_blocks, src, jnp.int32(n // 128))

    def squeeze(col, fill):
        rows = jnp.concatenate(
            [col.reshape(-1, 128), jnp.full((1, 128), fill, col.dtype)]
        )
        return rows[src].reshape(-1)

    return (
        squeeze(pix_p, _NO_ID),
        squeeze(db_p, jnp.int32(0)),
        squeeze(ids_p, jnp.int32(0)),
    )


@jax.jit
def sorted_raster_merge(framebuffer: Framebuffer, pix, depth, ids):
    """One depth-tested merge of a fragment list into the framebuffer via
    the fragment sort (ROADMAP #8 / VERDICT r2 item 3).

    Sort all fragments by (pixel, depth-bits, id): the first row of each
    pixel run is that pixel's winning fragment — min depth, ties to the
    smallest id, exactly the scatter path's LessEqual semantics — so the
    two framebuffer scatters touch one fragment per covered pixel
    instead of every fragment, and one sorted pass replaces the
    per-footprint-class scatter cascade. Depths are in [0, 1] (the
    fragment validity mask enforces it), so their f32 bit patterns sort
    like the floats.

    Merging with the existing buffer keeps the same rule: a strictly
    closer winner replaces the pixel's id; an exactly-equal depth takes
    the smaller id.
    """
    n_pix = framebuffer.depth.shape[0]
    # canonicalize -0.0 -> +0.0 before keying on the bit pattern: -0.0
    # passes the depth >= 0 validity mask but bitcasts to 0x80000000,
    # which would sort BEFORE +0.0 and crown the -0.0 fragment's id
    # regardless of the min-id tie rule the scatter path applies to
    # equal depths. An explicit select, not `depth + 0.0` — XLA's
    # simplifier folds the add away and -0.0 survives (measured)
    depth = jnp.where(
        depth == jnp.float32(0.0), jnp.float32(0.0), depth
    )
    depth_bits = jax.lax.bitcast_convert_type(depth, jnp.int32)
    depth_bits = jnp.where(pix == _NO_ID, _NO_ID, depth_bits)

    pix_s, depth_bits_s, ids_s, _ = _sort4_frags(pix, depth_bits, ids)
    valid_s = pix_s != _NO_ID
    first = (pix_s != jnp.roll(pix_s, 1)).at[0].set(True)
    win = first & valid_s

    # winners (<= 1 per covered pixel) compact before the framebuffer
    # merge: the scatters then process the packed winner blocks instead
    # of every fragment (compact_winner_rows; this is what round 3's
    # sorted formulation was missing — its scatters stayed full-width)
    pix_c, db_c, ids_c = compact_winner_rows(
        pix_s, depth_bits_s, ids_s, win, n_pix
    )
    valid_c = pix_c != _NO_ID
    depth_c = jax.lax.bitcast_convert_type(db_c, jnp.float32)

    target = jnp.where(valid_c, pix_c, jnp.int32(n_pix))
    old_depth = framebuffer.depth
    new_depth = old_depth.at[target].min(depth_c, mode="drop")

    improved = new_depth < old_depth
    ids0 = jnp.where(improved, _NO_ID, framebuffer.point_id)
    min_at = banked_gather(
        new_depth, jnp.clip(pix_c, 0, n_pix - 1)
    )
    ok = valid_c & (depth_c == min_at)
    new_ids = ids0.at[jnp.where(ok, pix_c, jnp.int32(n_pix))].min(
        ids_c, mode="drop"
    )
    return Framebuffer(depth=new_depth, point_id=new_ids)


def _sort4_frags(pix, depth_bits, ids):
    """Backend-dispatched 4-key sort for the fragment stream (pallas on
    TPU, bitonic elsewhere — the shared dedup dispatch, so a runtime
    pallas degrade reaches this path too)."""
    from ..ops import dedup as dedup_mod

    n = pix.shape[0]
    arrival = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape(n)
    return dedup_mod.dispatch_sort4(
        pix, depth_bits, ids, arrival, num_keys=3
    )


# --- chunked rung rasterization ------------------------------------------
#
# The budget-ladder raster prices each rung at a STATIC row buffer
# (pow2 / coarse-ladder snapped) because XLA shapes must be static —
# and pays for every padded row in both scatter-mins (scatter cost is
# per row processed, not landed, PERF.md). Rung occupancies swing 2-3x
# across an orbit, so the ladder either overshoots (up to 2.6x wasted
# fragments on the dominant rungs) or re-mints the megakernel compile.
# The chunked formulation rasters each rung's compact_classes region in
# fixed-size chunks under a lax.while_loop: rows processed =
# ceil(count / chunk) * chunk (waste < one chunk), the trip count is
# dynamic (data-dependent, never in the compile key), and an empty rung
# costs one predicate. Chunk sizes target a constant fragment count so
# every iteration's scatter work is uniform across window sizes.

RUNG_CHUNK_FRAGS = 1 << 16
# fragment cap per OVERFLOW rung (k > footprint): caps a pathological
# frame (camera inside the cloud, thousands of huge splats) at
# RUNG_CAP_CHUNKS * RUNG_CHUNK_FRAGS ~ 4M fragments per rung; rows
# beyond the cap render clipped through the footprint window for that
# frame — the same self-limiting contract as the budget path's spill
RUNG_CAP_CHUNKS = 64


def rung_chunk_rows(k: int, n: int) -> int:
    """Rows per chunk for a k x k rung: the pow2 that keeps a chunk near
    RUNG_CHUNK_FRAGS fragments, clamped to [8, 8192] and the bucket
    size (the dynamic_slice start stays <= 2N - chunk, the perm pad
    contract in :func:`compact_classes`)."""
    ch = max(RUNG_CHUNK_FRAGS // (k * k), 8)
    ch = 1 << (ch.bit_length() - 1)
    return max(min(ch, 8192, n), 1)


def _raster_rung_chunked(
    framebuffer: Framebuffer,
    view_pos, ndc, radius, point_id,  # ORIGINAL bucket payloads (N rows)
    perm,  # (2N,) i32 class-ranked row indices (compact_classes)
    start,  # i32 device scalar: the rung's region offset into perm
    count,  # i32 device scalar: rows of the region to raster
    projection, height: int, width: int, k: int, voronoi: bool,
    chunk_rows: int,
) -> Framebuffer:
    """Raster ``count`` perm rows at ``start`` through a k x k window in
    ``chunk_rows``-row chunks (dynamic trip count, static shapes)."""
    count = jnp.asarray(count, jnp.int32)
    start = jnp.asarray(start, jnp.int32)

    def cond(carry):
        _, c = carry
        return c * chunk_rows < count

    def body(carry):
        fb, c = carry
        s = start + c * chunk_rows
        p = jax.lax.dynamic_slice_in_dim(perm, s, chunk_rows)
        valid = (
            jnp.arange(chunk_rows, dtype=jnp.int32) + c * chunk_rows
        ) < count
        # materialize the gathered rows once (rasterize_class_slice
        # rationale: unfused gathers re-execute per fragment)
        vp, nd, rd, pid = jax.lax.optimization_barrier(
            (view_pos[p], ndc[p], radius[p], point_id[p])
        )
        fb = _rasterize_body(
            fb, vp, nd, rd, pid, valid, projection,
            height, width, k, voronoi,
        )
        return fb, c + 1

    framebuffer, _ = jax.lax.while_loop(
        cond, body, (framebuffer, jnp.int32(0))
    )
    return framebuffer


def _render_bucket_body(
    framebuffer: Framebuffer,
    positions,  # (N, 3) f32
    hier_base,  # (N,) i32 cached LOD-walk result (kernel.lod_select)
    valid,  # (N,) bool
    point_id,  # (N,) i32
    view, projection, cam_pos, spacings, far_distances,
    size_by_distance, max_hierarchy,
    depth=None,
    height: int = 720,
    width: int = 1280,
    footprint: int = DEFAULT_FOOTPRINT,
    voronoi: bool = True,
    use_occlusion: bool = False,
    use_pyramid: bool = False,
    out_size: int = 1 << 10,
    overflow_rows: tuple = (),
    overflow_ks: tuple = (),
    sub_rows: tuple = (),
    sub_ks: tuple = (),
    chunked: bool = False,
):
    """One bucket's ENTIRE frame chain in a single XLA program.

    Fuses the camera cull (+ occlusion), survivor compaction, the
    footprint raster, and one lax.cond-gated raster per overflow rung
    (renderer.LARGE_WINDOWS semantics: nested fit bands, last rung is
    the catch-all remainder). An empty rung's cond branch never
    executes, so large-splat fidelity is always on at ~zero cost when
    nothing is oversized.

    Why a megakernel: through the bench tunnel each dispatch costs
    ~2.4 ms when executables alternate (~4.5 ms with fresh host
    uploads, PERF.md dispatch-cost table) — the multi-dispatch frame
    (~30 calls) paid >100 ms of pure dispatch overhead, more than its
    device compute. This pass brings a frame to ~(buckets + 1) calls.

    ``overflow_rows`` is a tuple of per-rung row budgets, snapped to a
    COARSE ladder (64/1024/16384/65536/N — fine steps re-keyed the compile on
    a drifting tuple, the trap PERF.md documents; a shared budget
    instead priced every rung at the largest rung's occupancy, e.g. 70
    splats rastering an 8192-row window). A rung's rows beyond its
    budget SPILL into the footprint raster — rendered clipped for a
    frame instead of dropped (a fixed budget silently erased most
    splats in small-viewport scenes where nearly everything is
    oversized).

    ``sub_ks``/``sub_rows`` add SUB-footprint rungs (k < footprint, the
    SMALL_WINDOWS semantics): a splat with projected half-extent under
    k/2 rasters image-identically through a k x k window instead of
    footprint^2 fragments (splat_pixel_radii docs), and in a deep store
    the far majority of splats are 1-3 px — the fragment savings are
    several-fold. The multi-dispatch ladder paid one dispatch per rung
    for this (measured slower through the tunnel, PERF.md "even raster
    windows"); in here each rung is one cond-gated branch of the same
    program, so the savings come at ~zero dispatch cost. Rows beyond a
    sub-rung's budget spill UP into the footprint raster — a wider
    window is exact for a smaller splat, so spill costs fragments, not
    correctness.

    Returns (framebuffer, counts_vec) where counts_vec is
    [kept total, then each rung's EXCLUSIVE survivor count in
    (sub_ks..., footprint, overflow_ks...) order] — landed host-side
    for buffer sizing and stats (renderer._land_count_vecs,
    kind="excl").
    """
    from .kernel import _cull_body

    keep, hierarchy, ndc, view_pos, radius = _cull_body(
        positions, hier_base, valid, view, projection, cam_pos, spacings,
        far_distances, size_by_distance, max_hierarchy, depth,
        use_occlusion, use_pyramid,
    )
    rx, ry = splat_pixel_radii(view_pos, radius, projection, width, height)
    rmax = jnp.maximum(rx, ry)

    if not chunked:
        assert len(overflow_rows) == len(overflow_ks)
        assert len(sub_rows) == len(sub_ks)
    rungs = tuple(sub_ks) + (footprint,) + tuple(overflow_ks)
    fp_i = len(sub_ks)  # the footprint rung's index in ``rungs``
    # exclusive fit bands, ascending k; the last rung is the catch-all
    masks = []
    covered = None
    for j, k in enumerate(rungs):
        if j == len(rungs) - 1:
            m = keep if covered is None else (
                keep & jnp.logical_not(covered)
            )
        else:
            f = keep & (rmax < jnp.float32(k / 2.0))
            m = f if covered is None else f & jnp.logical_not(covered)
            covered = f if covered is None else covered | f
        masks.append(m)
    counts = [jnp.sum(m.astype(jnp.int32)) for m in masks]

    if chunked:
        # chunked rung raster (see rung_chunk_rows): one index scatter
        # packs every rung's survivors into perm regions, then each rung
        # rasters its region in fixed-size chunks — rows processed track
        # the actual occupancy (waste < one chunk) and the compile key
        # carries NO budget tuple, so survivor drift never recompiles
        n = keep.shape[0]
        perm, counts_d, offsets = compact_classes(jnp.stack(masks))
        fb = framebuffer
        order = [fp_i] + [j for j in range(len(rungs)) if j != fp_i]
        for j in order:
            k = rungs[j]
            ch = rung_chunk_rows(k, n)
            eff = counts_d[j]
            if k > footprint:
                eff = jnp.minimum(eff, jnp.int32(ch * RUNG_CAP_CHUNKS))
            fb = _raster_rung_chunked(
                fb, view_pos, ndc, radius, point_id, perm,
                offsets[j], eff, projection, height, width, k,
                voronoi, ch,
            )
        # capped overflow tails render clipped through the footprint
        # window (the budget path's spill contract)
        ch_fp = rung_chunk_rows(footprint, n)
        for j, k in enumerate(rungs):
            if k <= footprint:
                continue
            cap = rung_chunk_rows(k, n) * RUNG_CAP_CHUNKS
            tail = jnp.maximum(counts_d[j] - cap, 0)
            fb = _raster_rung_chunked(
                fb, view_pos, ndc, radius, point_id, perm,
                offsets[j] + cap, tail, projection, height, width,
                footprint, voronoi, ch_fp,
            )
        counts_vec = jnp.concatenate(
            [jnp.sum(keep.astype(jnp.int32))[None], counts_d]
        )
        return fb, counts_vec

    budgets = tuple(sub_rows) + (None,) + tuple(overflow_rows)

    # rows beyond any non-footprint rung's budget spill into the
    # footprint raster (sub rungs: rendered exactly through the wider
    # window; overflow rungs: clipped for this frame; either way the
    # budget grows next frame)
    fp_mask = masks[fp_i]
    for j, m in enumerate(masks):
        if j == fp_i:
            continue
        rank = jnp.cumsum(m.astype(jnp.int32)) - 1
        fp_mask = fp_mask | (m & (rank >= budgets[j]))

    # main footprint raster over the sticky compacted buffer
    vp, nd, rd, pid, ok = compact_rows(
        fp_mask, view_pos, ndc, radius, point_id, out_size
    )
    fb = _rasterize_body(
        framebuffer, vp, nd, rd, pid, ok, projection,
        height, width, footprint, voronoi,
    )

    for j, k in enumerate(rungs):
        if j == fp_i:
            continue
        m = masks[j]
        budget = budgets[j]

        def _raster_rung(fb, m=m, k=k, budget=budget):
            r = compact_rows(
                m, view_pos, ndc, radius, point_id, budget
            )
            return _rasterize_body(
                fb, r[0], r[1], r[2], r[3], r[4], projection,
                height, width, k, voronoi,
            )

        fb = jax.lax.cond(counts[j] > 0, _raster_rung, lambda f: f, fb)

    counts_vec = jnp.concatenate(
        [jnp.sum(keep.astype(jnp.int32))[None]]
        + [c[None] for c in counts]
    )
    return fb, counts_vec


render_bucket_pass = partial(
    jax.jit,
    static_argnames=(
        "height", "width", "footprint", "voronoi", "use_occlusion",
        "use_pyramid", "out_size", "overflow_rows", "overflow_ks",
        "sub_rows", "sub_ks", "chunked",
    ),
)(_render_bucket_body)


@partial(
    jax.jit,
    static_argnames=(
        "height", "width", "footprint", "voronoi", "use_occlusion",
        "use_pyramid", "bucket_static", "with_depth", "chunked",
    ),
)
def render_frame_pass(
    bucket_arrays,  # tuple of (pos, hier_base, valid, ids) per bucket
    view, projection, cam_pos, spacings, far_distances,
    size_by_distance, max_hierarchy,
    colors,  # (C, 4) u8 padded color table for the device resolve
    height: int, width: int, footprint: int, voronoi: bool,
    use_occlusion: bool,
    # per-bucket (out_size, overflow_rows, overflow_ks, sub_rows, sub_ks)
    bucket_static: tuple,
    with_depth: bool,
    chunked: bool = False,
    use_pyramid: bool = False,
):
    """The WHOLE frame — every bucket's megakernel chain plus the packed
    resolve — as ONE XLA program: one dispatch + one readback per frame.

    The per-bucket megakernel (``render_bucket_pass``) brought a frame
    to ~(buckets + 1) dispatches; through a high-latency link each
    remaining executable switch still costs ~2.4-4.5 ms (PERF.md
    dispatch-cost table). Threading the framebuffer through the buckets
    inside one program removes them all, and the near-to-far occlusion
    ordering is preserved exactly: bucket b's cull reads the running
    framebuffer's depth (the same value the host loop passed between
    dispatches — point.rs:117-218 semantics).

    The compile key is the concatenation of every bucket's shape and
    sticky budget tuple, so any single bucket resizing re-mints the
    whole frame program — the per-bucket path recompiles only the
    bucket that moved. That trade is measured, not assumed
    (``RenderSettings.frame_fusion``): fused wins on steady orbits
    whose shape vocabulary has stabilized; the per-bucket path is the
    safer default while shapes churn.

    Returns (packed u8 frame buffer as ``pack_frame``, with every
    bucket's exclusive counts vector concatenated into the counts tail).
    """
    fb = make_framebuffer(height, width)
    vecs = []
    for (pos, hier_base, valid, ids), (out_size, orows, oks, srows, sks) \
            in zip(bucket_arrays, bucket_static):
        depth = fb.depth.reshape(height, width) if use_occlusion else None
        fb, counts_vec = _render_bucket_body(
            fb, pos, hier_base, valid, ids, view, projection, cam_pos,
            spacings, far_distances, size_by_distance, max_hierarchy,
            depth=depth, height=height, width=width, footprint=footprint,
            voronoi=voronoi, use_occlusion=use_occlusion,
            use_pyramid=use_pyramid,
            out_size=out_size, overflow_rows=orows, overflow_ks=oks,
            sub_rows=srows, sub_ks=sks, chunked=chunked,
        )
        vecs.append(counts_vec)
    counts = (
        jnp.concatenate(vecs) if vecs else jnp.zeros(1, jnp.int32)
    )
    return _pack_frame_body(fb, colors, counts, height, width, with_depth)


@partial(jax.jit, static_argnames=("height", "width"))
def resolve_framebuffer(framebuffer: Framebuffer, colors, height: int, width: int):
    """Framebuffer -> (rgb image (H, W, 3) u8, depth (H, W) f32).

    ``colors`` is the (N, 4) u8 color table indexed by point id. RGB
    resolves to u8 *on device*: point pixels take the exact table color,
    clear pixels the 8-bit wgpu clear grey (CLEAR_COLOR_U8) — identical
    bytes to the old f32->PNG conversion at 1/4 the host-link traffic
    (PERF.md: the frame readback rides a ~40 MB/s tunnel here).
    """
    hit = framebuffer.point_id != _NO_ID
    ids = jnp.where(hit, framebuffer.point_id, 0)
    rgb = colors[ids, :3]
    clear = jnp.asarray(CLEAR_COLOR_U8, jnp.uint8)
    rgb = jnp.where(hit[:, None], rgb, clear[None, :])
    return (
        rgb.reshape(height, width, 3),
        framebuffer.depth.reshape(height, width),
    )


# fixed count-slot tail; static packed-frame shape. Sized for the
# deepest realistic frame: ~6 distance buckets x the 10-rung window
# ladder — overflowing it silently downgrades every frame to the
# synchronous fallback readback (renderer.render_start), so keep
# headroom; the tail costs 4 bytes/slot against a ~1 MB image
PACK_COUNTS = 96


def _pack_frame_body(framebuffer: Framebuffer, colors, counts, height: int,
                     width: int, with_depth: bool):
    """Resolve a frame and flatten EVERYTHING the host reads into one u8
    buffer: [rgb | PACK_COUNTS i32 counts | optional f32 depth].

    Through a high-latency link every device->host array costs its own
    round trip (~19-28 ms here, PERF.md); a frame's outputs — the image,
    the per-class survivor counts for next frame's buffer sizing, the
    visible-total stat, and optionally the depth plane — ride one
    transfer instead of three. ``counts`` is padded/truncated to
    PACK_COUNTS so the shape stays static.
    """
    rgb, depth = resolve_framebuffer(framebuffer, colors, height, width)
    n = counts.shape[0]
    counts = jnp.concatenate(
        [counts.astype(jnp.int32),
         jnp.zeros(max(PACK_COUNTS - n, 0), jnp.int32)]
    )[:PACK_COUNTS]
    parts = [
        rgb.reshape(-1),
        jax.lax.bitcast_convert_type(counts, jnp.uint8).reshape(-1),
    ]
    if with_depth:
        parts.append(
            jax.lax.bitcast_convert_type(depth, jnp.uint8).reshape(-1)
        )
    return jnp.concatenate(parts)


pack_frame = partial(
    jax.jit, static_argnames=("height", "width", "with_depth")
)(_pack_frame_body)
