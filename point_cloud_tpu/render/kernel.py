"""The fused cull + LOD + occlusion frame kernel (TPU hot path).

TPU-native re-design of the reference's per-cell WGSL compute pass
(reference: src/plugins/render/point/pipelines/compute.wgsl:170-206): one
jitted XLA program processes *all* loaded points at once instead of one
128-thread dispatch per cell:

- project every point view -> clip -> NDC; keep points inside the NDC cube
  (compute.wgsl:180-184),
- LOD selection (compute.wgsl:85-155): walk from the point's own hierarchy
  toward finer ones while the containing finer cell is loaded; the WGSL
  per-thread binary search over the sorted loaded-cells buffer becomes a
  device *hash-table probe* (:func:`hash_member` — MAX_PROBE independent
  gathers instead of log2(M) dependent rounds; 14x measured, PERF.md),
  unrolled over the store's actual hierarchy count (static arg); an
  optional distance-based override promotes points to coarser hierarchies
  by comparing camera distance against per-hierarchy streaming-frustum far
  distances (compute.wgsl:88-96),
- optional occlusion against a depth buffer (compute.wgsl:185-196): move
  the point toward the camera by its splat radius and keep it if it is not
  clearly behind the pre-rendered depth,
- output is a visibility mask + selected hierarchy (the WGSL packs the
  hierarchy into the color alpha byte and compacts with an atomic append;
  XLA-side compaction uses a cumsum, see :func:`compact_visible`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

MAX_HIERARCHIES = 24  # static unroll bound for the LOD walk


def _lex_less(row_a, row_b):
    """Elementwise lexicographic < between (..., 4) int32 key rows
    (the WGSL comparison at compute.wgsl:142-147)."""
    a0, a1, a2, a3 = (row_a[..., i] for i in range(4))
    b0, b1, b2, b3 = (row_b[..., i] for i in range(4))
    return (
        (a0 < b0)
        | ((a0 == b0) & (a1 < b1))
        | ((a0 == b0) & (a1 == b1) & (a2 < b2))
        | ((a0 == b0) & (a1 == b1) & (a2 == b2) & (a3 < b3))
    )


# --- loaded-cell membership: device hash table --------------------------
#
# The WGSL walks a sorted buffer with a per-thread binary search
# (compute.wgsl:127-155) — ~13 dependent gather rounds on TPU. The
# TPU-native structure is a BUCKETIZED hash table: the host packs up to
# BUCKET_ROWS candidate rows into one contiguous 16-lane bucket, so a
# membership test is ONE row gather + BUCKET_ROWS in-register compares
# (exact: every candidate compares the full key row). Round 2 used
# linear probing with 4 separate gathers; the gather count — not the
# compare count — is the cost on this chip (PERF.md primitive table), so
# one 16-lane gather beats four 4-lane gathers ~4x.

HASH_EMPTY = np.int32(np.iinfo(np.int32).min)  # sentinel row value
BUCKET_ROWS = 4  # rows per aligned bucket: one gather probes all four
MAX_PROBE = BUCKET_ROWS  # kept name: bound on candidates per membership

_HC1 = np.uint32(0x9E3779B1)
_HC2 = np.uint32(0x85EBCA77)
_HC3 = np.uint32(0xC2B2AE3D)


def _hash_rows_np(rows: np.ndarray) -> np.ndarray:
    """uint32 hash of (M, 4) int32 rows (NumPy side, wraparound)."""
    h = np.uint32(0x1000193)
    out = np.full(len(rows), h, np.uint32)
    for i in range(4):
        out = (out ^ (rows[:, i].astype(np.uint32) * _HC1)) * _HC2
        out ^= out >> np.uint32(15)
    out *= _HC3
    return out ^ (out >> np.uint32(13))


def _hash_rows_jnp(rows):
    """jnp mirror of :func:`_hash_rows_np` (same wraparound math)."""
    out = jnp.full(rows.shape[:-1], 0x1000193, jnp.uint32)
    for i in range(4):
        out = (out ^ (rows[..., i].astype(jnp.uint32) * _HC1)) * _HC2
        out = out ^ (out >> 15)
    out = out * _HC3
    return out ^ (out >> 13)


def build_loaded_cells_hash(table: np.ndarray) -> np.ndarray:
    """Bucketized table of (h, x, y, z) rows -> (NB, BUCKET_ROWS*4) i32.

    NB is a power of two with NB*BUCKET_ROWS >= 2*M; each key lands in
    bucket ``hash & (NB-1)``; a bucket that would exceed BUCKET_ROWS rows
    grows the whole table (so lookups never probe a second bucket).
    Empty lanes hold HASH_EMPTY rows, which can never equal a real probe
    target (targets carry h >= 1). Duplicate input rows are deduplicated
    so they cannot artificially overflow a bucket.
    """
    rows = np.asarray(table, np.int32).reshape(-1, 4)
    if len(rows):
        rows = np.unique(rows, axis=0)
    nb = 64
    while nb * BUCKET_ROWS < 2 * max(len(rows), 1):
        nb *= 2
    while True:
        slots = np.full((nb, BUCKET_ROWS * 4), HASH_EMPTY, np.int32)
        fill = np.zeros(nb, np.int32)
        ok = True
        bucket = (_hash_rows_np(rows) & np.uint32(nb - 1)).astype(np.int64)
        for row, b in zip(rows, bucket):
            k = fill[b]
            if k >= BUCKET_ROWS:
                ok = False
                break
            slots[b, 4 * k : 4 * k + 4] = row
            fill[b] = k + 1
        if ok:
            return slots
        nb *= 2


def hash_member(hash_table, targets):
    """Exact membership of (N, 4) i32 target rows in a table built by
    :func:`build_loaded_cells_hash`: ONE 16-lane bucket gather per
    target, then BUCKET_ROWS full-row compares in registers."""
    nb = hash_table.shape[0]
    bucket = _hash_rows_jnp(targets) & jnp.uint32(nb - 1)
    lanes = hash_table[bucket.astype(jnp.int32)]  # (N, BUCKET_ROWS*4)
    cand = lanes.reshape(-1, BUCKET_ROWS, 4)
    return jnp.any(
        jnp.all(cand == targets[:, None, :], axis=-1), axis=-1
    )


def loaded_cells_member(table, targets):
    """Vectorized membership of (N, 4) target rows in a row-sorted (M, 4)
    table: lock-step lexicographic binary search (compute.wgsl:127-155).

    Kept as the oracle-shaped reference implementation (tests compare it
    against the WGSL semantics); the frame kernel uses :func:`hash_member`.
    """
    m = table.shape[0]
    n = targets.shape[0]
    if m == 0:
        return jnp.zeros(n, bool)
    lo = jnp.zeros(n, jnp.int32)
    hi = jnp.full(n, m, jnp.int32)
    steps = max(1, int(np.ceil(np.log2(m + 1))) + 1)
    for _ in range(steps):
        mid = (lo + hi) // 2
        mid_c = jnp.clip(mid, 0, m - 1)
        rows = table[mid_c]
        less = _lex_less(rows, targets) & (mid < m)
        lo = jnp.where(less, mid + 1, lo)
        hi = jnp.where(less, hi, mid)
    lo_c = jnp.clip(lo, 0, m - 1)
    return (lo < m) & jnp.all(table[lo_c] == targets, axis=-1)


def _cell_index(position, cell_size):
    """floor(pos / cell_size) — the WGSL copy of the converter formula
    (compute.wgsl:80-83). Rendering does not require bit-exact IEEE
    division (a point on a cell boundary resolves to either neighbor), so
    the native divide is used here; the converter path uses exact_div."""
    return jnp.floor(position / cell_size).astype(jnp.int32)


def _lod_walk_body(positions, point_hierarchy, cell_sizes,
                   num_hierarchies: int, loaded_cells):
    """LOD selection: search_smallest_hierarchy (compute.wgsl:101-125).

    Walks from each point's own hierarchy toward finer ones while the
    containing finer cell is loaded. Depends only on (positions, the
    loaded set, the hierarchy table) — NOT the camera — which is what
    lets the renderer cache its result across frames (``lod_select``).
    """
    n = positions.shape[0]
    last = num_hierarchies - 1
    own = jnp.minimum(point_hierarchy, last)
    result = own
    alive = jnp.ones(n, bool)
    for h in range(1, num_hierarchies):
        idx = _cell_index(positions, cell_sizes[h])
        target = jnp.concatenate(
            [jnp.full((n, 1), h, jnp.int32), idx], axis=1
        )
        found = hash_member(loaded_cells, target)
        relevant = (h > own) & (h <= last)
        alive = jnp.where(relevant, alive & found, alive)
        step = relevant & alive
        result = jnp.where(step, h, result)
    return result


lod_select = jax.jit(_lod_walk_body, static_argnames=("num_hierarchies",))


PYRAMID_TILE = 8  # px per coarse occlusion tile (depth-pyramid pre-cull)


def _cull_body(
    positions, hier_base, valid, view, projection, cam_pos, spacings,
    far_distances, size_by_distance, max_hierarchy, depth, use_occlusion,
    use_pyramid=False,
):
    """Camera-dependent half of the frame kernel: projection + NDC cull,
    distance override, occlusion. ``hier_base`` is the LOD walk's result
    (``_lod_walk_body``), recomputed per frame by :func:`cull_lod_pass`
    or served from the renderer's per-loaded-set cache."""
    n = positions.shape[0]
    ones = jnp.ones((n, 1), jnp.float32)
    hpos = jnp.concatenate([positions, ones], axis=1)  # (N, 4)

    view_pos = hpos @ view.T  # (N, 4)
    clip = view_pos @ projection.T
    ndc = clip[:, :3] / clip[:, 3:4]

    inside = (
        (jnp.abs(ndc[:, 0]) <= 1.0)
        & (jnp.abs(ndc[:, 1]) <= 1.0)
        & (jnp.abs(ndc[:, 2] - 0.5) <= 0.5)
        & valid
    )
    result = hier_base

    # --- distance override (compute.wgsl:85-99) ------------------------------
    delta = positions - cam_pos[None, :]
    dist_cam = jnp.sqrt(jnp.sum(delta * delta, axis=1))
    hier_ids = jnp.arange(MAX_HIERARCHIES, dtype=jnp.int32)
    cand = (
        (hier_ids[None, :] > result[:, None])
        & (hier_ids[None, :] <= max_hierarchy)
        & (dist_cam[:, None] < far_distances[None, :])
    )
    override = jnp.max(
        jnp.where(cand, hier_ids[None, :], jnp.int32(-1)), axis=1
    )
    use_override = size_by_distance & (override >= 0)
    hierarchy = jnp.where(use_override, override, result)

    keep = inside

    # per-point splat radius: 24-entry table lookup as a one-hot select —
    # the materializing 1-D gather is the slow TPU class, MAX_HIERARCHIES
    # compares per row are not (PERF.md primitive table)
    radius = jnp.sum(
        jnp.where(
            hier_ids[None, :] == hierarchy[:, None],
            spacings[None, :],
            jnp.float32(0.0),
        ),
        axis=1,
    )

    # --- occlusion (compute.wgsl:185-196) ------------------------------------
    if use_occlusion:
        assert depth is not None
        from .splat import banked_gather

        hgt, wid = depth.shape
        u = (ndc[:, 0] * 0.5 + 0.5) * wid
        v = (ndc[:, 1] * -0.5 + 0.5) * hgt
        ui = jnp.clip(u.astype(jnp.int32), 0, wid - 1)
        vi = jnp.clip(v.astype(jnp.int32), 0, hgt - 1)
        # banked gather: a materializing 1-D fetch is the slow TPU
        # gather class (~10 ns/index, PERF.md primitive table)
        depth_at = banked_gather(depth.reshape(-1), vi * wid + ui)

        moved_view = jnp.stack(
            [view_pos[:, 0], view_pos[:, 1], view_pos[:, 2] + radius,
             view_pos[:, 3]],
            axis=1,
        )
        moved_clip = moved_view @ projection.T
        moved_z = moved_clip[:, 2] / moved_clip[:, 3]
        radius_z = ndc[:, 2] - moved_z
        keep = keep & (
            (moved_z < depth_at) | ((moved_z - depth_at) < radius_z * 3.0)
        )

        # --- depth-pyramid pre-cull (VERDICT r4 #3) ---------------------
        # An EXTRA conservative gate on top of the center-sample test:
        # reject a splat only when its nearest possible fragment depth
        # (moved_z — the center moved toward the camera by the full
        # radius, a lower bound on every fragment's depth in both flat
        # and voronoi modes) is strictly behind the FARTHEST depth
        # recorded anywhere a fragment could land. "Anywhere" is bounded
        # by one gather into a dilated coarse max-depth grid: tile t's
        # value is the max depth over the 3Tx3T pixel region centered on
        # its TxT tile (max-pool + 3x3 dilate), which contains the whole
        # footprint of any splat whose center lies in t with pixel
        # half-extent <= T. Larger splats (rare) pass unconditionally.
        # Rejected splats provably lose the scatter-min at every pixel
        # they could touch, so images are BIT-IDENTICAL with the gate on
        # or off (tests/test_render_kernel.py) — this is a pure
        # fragment-count lever aimed at the scatter-row floor, unlike
        # the center test whose 3x slack both over- and under-culls.
        # (Hierarchical-z culling; the WGSL analogue would extend
        # compute.wgsl:185-196's single sample to a depth mip.)
        if use_pyramid:
            from .splat import splat_pixel_radii

            t = PYRAMID_TILE
            hp = (hgt + t - 1) // t * t
            wp = (wid + t - 1) // t * t
            dpad = depth
            if hp != hgt or wp != wid:
                dpad = jnp.pad(
                    depth, ((0, hp - hgt), (0, wp - wid)),
                    constant_values=1.0,  # clear depth: never rejects
                )
            coarse = dpad.reshape(hp // t, t, wp // t, t).max(axis=(1, 3))
            for ax in (0, 1):
                # roll wraps at the borders — the wrapped neighbour only
                # ADDS area to the max, which keeps the bound conservative
                coarse = jnp.maximum(
                    coarse,
                    jnp.maximum(
                        jnp.roll(coarse, 1, ax), jnp.roll(coarse, -1, ax)
                    ),
                )
            gw = wp // t
            coarse_at = banked_gather(
                coarse.reshape(-1), (vi // t) * gw + (ui // t)
            )
            rx, ry = splat_pixel_radii(
                view_pos, radius, projection, wid, hgt
            )
            rmax_px = jnp.maximum(rx, ry)
            # in-front-of-camera guard: if the moved center crosses the
            # eye plane the reprojection is meaningless — never reject
            in_front = (view_pos[:, 2] + radius) < 0.0
            # t - 1, not t: ui truncates the true center, so fragments
            # reach up to rmax + 1 px from the gathered tile's anchor
            reject = (
                in_front
                & (rmax_px <= jnp.float32(t - 1))
                & (moved_z > coarse_at)
            )
            keep = keep & jnp.logical_not(reject)

    return keep, hierarchy, ndc, view_pos, radius


@partial(
    jax.jit,
    static_argnames=("num_hierarchies", "use_occlusion", "use_pyramid"),
)
def cull_lod_pass(
    positions,  # (N, 3) f32
    point_hierarchy,  # (N,) i32: hierarchy of each point's owning cell
    valid,  # (N,) bool
    view,  # (4, 4) f32
    projection,  # (4, 4) f32
    cam_pos,  # (3,) f32
    cell_sizes,  # (MAX_HIERARCHIES,) f32 per-hierarchy cell size
    spacings,  # (MAX_HIERARCHIES,) f32 per-hierarchy splat radius
    num_hierarchies,  # static int: hierarchy count of the active store
    loaded_cells,  # (M2, 4) i32 hash table (build_loaded_cells_hash)
    far_distances,  # (MAX_HIERARCHIES,) f32 streaming-frustum far distances
    size_by_distance,  # bool scalar
    max_hierarchy,  # i32 scalar (distance-override coarsest hierarchy)
    depth=None,  # (H, W) f32 depth buffer, required if use_occlusion
    use_occlusion: bool = False,
    use_pyramid: bool = False,
):
    """Returns (visible (N,) bool, hierarchy (N,) i32, ndc (N, 3) f32).

    ``num_hierarchies`` is static: the LOD walk unrolls exactly that many
    levels (a store has one fixed count, so this costs one compile per
    store instead of a 24-level unroll for every frame).

    The fused one-shot form (LOD walk + cull in one program); the
    renderer's steady frame instead caches the camera-independent walk
    (:func:`lod_select`) per loaded set and runs only
    :func:`cull_classify_pass` per frame.
    """
    hier_base = _lod_walk_body(
        positions, point_hierarchy, cell_sizes, num_hierarchies,
        loaded_cells,
    )
    keep, hierarchy, ndc, _, _ = _cull_body(
        positions, hier_base, valid, view, projection, cam_pos, spacings,
        far_distances, size_by_distance, max_hierarchy, depth,
        use_occlusion, use_pyramid,
    )
    return keep, hierarchy, ndc


@partial(
    jax.jit,
    static_argnames=("width", "height", "use_occlusion", "use_pyramid"),
)
def cull_classify_pass(
    positions, hier_base, valid, view, projection, cam_pos, spacings,
    far_distances, size_by_distance, max_hierarchy,
    fit_thresholds,  # (W,) f32 pixel half-extent ladder rungs (k/2)
    width: int, height: int, depth=None, use_occlusion: bool = False,
    use_pyramid: bool = False,
):
    """The renderer's per-frame kernel: camera cull + distance override +
    occlusion (``_cull_body``) fused with the footprint classification
    the old ``classify_splats`` dispatch recomputed separately (the
    view-space transform and the radius one-hot ran twice per bucket).

    Returns (keep, hierarchy, ndc, view_pos, radius, rmax, counts_vec):
    ``rmax`` is the per-point max projected pixel half-extent (a k x k
    raster window is image-exact iff rmax < k/2, splat.py).
    ``counts_vec`` is ONE (W+1,) i32 vector: [kept total, then the
    number of kept splats with rmax < fit_thresholds[i] for each rung]
    — the cumulative window-ladder occupancy. One vector per bucket is
    the whole counts side-channel: it rides the packed frame transfer
    and every per-window number (class sizing, empty-rung skips, the
    adaptive ladder's activation, the visible-points stat) is derived
    host-side after it lands. An earlier cut derived per-rung counts as
    individual device scalars — ~6 tiny dispatches per bucket per frame
    at ~0.4-0.8 ms each (measured dispatch cost, PERF.md).
    """
    from .splat import splat_pixel_radii

    keep, hierarchy, ndc, view_pos, radius = _cull_body(
        positions, hier_base, valid, view, projection, cam_pos, spacings,
        far_distances, size_by_distance, max_hierarchy, depth,
        use_occlusion, use_pyramid,
    )
    rx, ry = splat_pixel_radii(view_pos, radius, projection, width, height)
    rmax = jnp.maximum(rx, ry)
    fits = keep[None, :] & (rmax[None, :] < fit_thresholds[:, None])
    counts_vec = jnp.concatenate([
        jnp.sum(keep.astype(jnp.int32))[None],
        jnp.sum(fits.astype(jnp.int32), axis=1),
    ])
    return keep, hierarchy, ndc, view_pos, radius, rmax, counts_vec


def compact_visible(mask, *arrays):
    """Stable compaction: gather rows where ``mask`` holds to the front.

    The XLA replacement for the WGSL atomic-append (compute.wgsl:202-203)
    — deterministic (stable order) unlike the atomic version. Returns
    (count, compacted arrays); tail rows beyond ``count`` are filled from
    row 0 (callers slice by count on host).
    """
    n = mask.shape[0]
    count = jnp.sum(mask.astype(jnp.int32))
    idx = jnp.nonzero(mask, size=n, fill_value=0)[0]
    return count, tuple(a[idx] for a in arrays)
