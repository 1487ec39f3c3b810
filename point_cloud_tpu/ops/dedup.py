"""Device-side hex dedup: the TPU replacement for the reference's hot loop.

The reference dedups points one at a time with a HashMap insert per point
(reference: point-converter/src/cell.rs:70-106, hex quantization at
point-converter/src/hex.rs:67-85). The TPU-native formulation processes a
whole batch in one fused XLA program:

1. quantize every point to its (cell index, hex sub-grid slot) pair and
   compute its f32 squared distance to the slot center (VPU, exact ops —
   see ops/exact.py for why division is reconstructed),
2. one stable 3-key ``lax.sort`` over (cell-hash, slot-hash, distance)
   groups cells into contiguous runs, slots into contiguous sub-runs, and
   orders each slot's candidates best-first; stability preserves arrival
   order on exact distance ties (the host feeds incumbents before batch
   points, so a stored point beats an equal-distance newcomer, matching
   cell.rs:80 ``new < old``),
3. a shifted-compare marks the first row of each slot run — the winners;
   every other row is a loser that cascades to the next hierarchy.

Why hashes instead of the raw (3 + 3) int32 key columns: TPU sort
compilation scales with key count (~15 s per key per shape) and the raw
form needs 7 keys; two 31-bit hashes + the distance give a 3-key sort
that compiles once and reuses across every hierarchy level (grid scalars
are traced values). Hash collisions cannot corrupt results: rows are
re-checked against their true keys after the sort, any run that mixes two
real keys is flagged, and flagged rows fall back to an exact host-side
dedup (tests force this path; expected frequency is ~2^-22 per pair, and
the fallback also guards cell-hash collisions in the grouping).

Shapes are static: callers pad batches to pow2 buckets; padded rows carry
a cell-hash of i32::MAX (real hashes are clamped below it) so they sort to
the tail and are dropped by the valid mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.hex import jax_axial_from_world, jax_axial_to_offset, jax_cell_index

_I32_MAX = np.int32(2**31 - 1)

# near-tie floor (in ulps of the f32 distance) — see _near_tie_mask
_NEAR_TIE_ULPS = np.int32(8)
# cancellation-drift safety factor — see _near_tie_mask
_NEAR_TIE_SCALE = np.float32(64.0 * 2.0**-24)


def _near_tie_mask(same_hash, db_s, pos_s, valid_s):
    """Adjacent-pair near-tie detection, robust to fma-contraction drift.

    XLA backends may contract the distance chain's mul+add steps into
    fmas at LLVM codegen (measured on XLA:CPU; no HLO barrier, bitcast
    trick, or XLA flag prevents it), so the device's f32 distance can
    drift from the host IEEE value by two error terms:

    - a few ulps of direct rounding drift on the products/sums — the
      flat ``_NEAR_TIE_ULPS`` bit floor covers it;
    - a CANCELLATION-AMPLIFIED term: the slot-center products drift by
      ~1 ulp of the COORDINATE (|p| * 2^-24), which enters
      dist = |pos - center|^2 as ~2*|d|*|p|*2^-24 however small dist
      is — at |p| ~ 500 and dist ~ 0.02 that is ~100 ulp OF DIST
      (measured, round-5 fuzz seed 1063496344), unboundable in dist
      ulps. The float threshold ``C * |p|_max * sqrt(dist) * 2^-24``
      bounds it with C = 64x headroom.

    Runs containing a flagged adjacent pair resolve exactly on the
    host via the existing suspect fallback, making the winner choice
    bit-identical to the host oracle on every backend; the fallback
    costs only rows genuinely ambiguous at f32 resolution.
    """
    prev_bits = jnp.roll(db_s, 1)
    gap_bits = db_s - prev_bits
    d_f = jax.lax.bitcast_convert_type(db_s, jnp.float32)
    prev_f = jax.lax.bitcast_convert_type(prev_bits, jnp.float32)
    pmax = jnp.max(jnp.abs(pos_s), axis=-1)
    thr = _NEAR_TIE_SCALE * pmax * jnp.sqrt(jnp.maximum(d_f, 0.0))
    near = (gap_bits <= _NEAR_TIE_ULPS) | ((d_f - prev_f) <= thr)
    return same_hash & near & valid_s

# sort backend (PCT_SORT):
#   "auto"    — pallas on TPU, bitonic elsewhere (the measured winners)
#   "pallas"  — tiled VMEM kernel (ops/sort_pallas.py): 12.2 ms vs the
#               bitonic's 15.6 ms at 2^20 on the v5e, 7.1 vs 11.7 ms at
#               2^18 (PERF.md); interpret-mode (slow) off-TPU
#   "bitonic" — lax-loop network (ops/bitonic.py), seconds to compile at
#               any shape; the CPU-mesh/test default
#   "xla"     — lax.sort; compile time grows with shape (~36 s at 2^18)
import os as _os

_SORT_BACKEND = _os.environ.get("PCT_SORT", "auto")


# set when the pallas backend fails to compile/launch (e.g. a Mosaic
# regression on a different libtpu): auto-selection then degrades to the
# bitonic permanently for the process (see dispatch_dedup)
_PALLAS_BROKEN = False

# set after the first pallas-backed dispatch completes a synchronous
# readback: async launch failures (which surface at the d2h transfer, not
# at dispatch) are forced to appear inside dispatch_dedup's try block on
# the first call so they trigger the same bitonic degrade
_PALLAS_VETTED = False


def _resolve_backend() -> str:
    if _SORT_BACKEND == "auto":
        if _PALLAS_BROKEN or jax.default_backend() != "tpu":
            return "bitonic"
        return "pallas"
    return _SORT_BACKEND


def dispatch_sort4(k1, k2, k3, k4, *, num_keys: int = 4,
                   is_stable: bool = False):
    """THE backend-dispatched 4-column lex sort (pallas on TPU, bitonic
    elsewhere, ``PCT_SORT=xla`` for lax.sort).

    The single owner of the eligibility policy — every sorting call site
    (the dedup pass, the owner-sharded mesh merge, the sorted-raster
    fragment stream) resolves through this module's attributes so a
    runtime pallas degrade (``_PALLAS_BROKEN``) reaches all of them.
    The pallas kernel needs power-of-two lengths >= 1024 (its sub-tile
    padding contract); ineligible shapes fall back to the bitonic
    network. pallas/bitonic always sort all four columns (a total
    order); ``num_keys``/``is_stable`` shape only the lax.sort branch —
    callers must pass a unique 4th column (e.g. an arrival iota)
    whenever trailing-column order matters.
    """
    n = k1.shape[0]
    backend = _resolve_backend()
    if backend == "pallas" and n >= 1024 and (n & (n - 1)) == 0:
        from .sort_pallas import pallas_sort4

        return pallas_sort4(k1, k2, k3, k4)
    if backend == "xla":
        return jax.lax.sort(
            (k1, k2, k3, k4), num_keys=num_keys, is_stable=is_stable
        )
    from .bitonic import bitonic_sort4

    return bitonic_sort4(k1, k2, k3, k4)

def _i32(v: int) -> np.int32:
    """Python int (as u32 bit pattern) -> i32 constant."""
    return np.int32(v - 2**32 if v >= 2**31 else v)


# multiplicative mixing constants (odd, high-entropy)
_PRIMES_A = tuple(_i32(v) for v in (0x85EBCA6B, 0xC2B2AE35, 0x27D4EB2F))
_PRIMES_B = tuple(
    _i32(v)
    for v in (0x165667B1, 0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D, 0x27D4EB4F,
              0x94D049BB)
)


def pad_to_bucket(n: int, minimum: int = 1024) -> int:
    """Next power-of-two bucket size (bounds the compiled-shape count)."""
    size = minimum
    while size < n:
        size *= 2
    return size


def _mix(h):
    """Final avalanche (murmur3-style), int32 wraparound arithmetic."""
    h = h ^ (h >> 16)
    h = h * np.int32(-2048144789)  # 0x85EBCA6B as i32
    h = h ^ (h >> 13)
    h = h * np.int32(-1028477387)  # 0xC2B2AE35 as i32
    return h ^ (h >> 16)


def _hash_cols(cols, primes):
    h = jnp.zeros_like(cols[0])
    for col, p in zip(cols, primes):
        h = (h + col * p) * np.int32(-1640531527)  # golden-ratio constant
    return _mix(h)


def hex_keys(positions, cell_size, sub_cell_radius):
    """Per-point (cell index, hex slot, distance^2-to-slot-center).

    ``cell_size`` / ``sub_cell_radius`` are traced f32 scalars so one
    compiled program serves every hierarchy level.
    """
    cell_idx = jax_cell_index(positions, cell_size)
    axial = jax_axial_from_world(positions, sub_cell_radius)
    sub_idx = jax_axial_to_offset(axial)

    # slot center (core/hex.py jax_axial_to_world, inlined to reuse axial)
    sqrt3 = jnp.float32(1.73205080757)
    q = axial[..., 0].astype(jnp.float32)
    r = axial[..., 1].astype(jnp.float32)
    h = axial[..., 2].astype(jnp.float32)
    # optimization_barrier pins the IEEE mul-then-add op order: XLA:CPU's
    # LLVM pipeline contracts a*b + c into fma(a, b, c), whose single
    # rounding differs from the host NumPy path by 1 ulp — measured
    # 10,349/16,384 dist-bit mismatches at batch shape, enough to flip
    # closest-to-center winners on near-ties and break the store
    # byte-parity invariant on the CPU backend (round-5 fuzz finding;
    # the TPU backend measured 0 mismatches but is pinned anyway).
    # Materializing the products costs one extra elementwise pass —
    # noise against the sort that follows.
    t1, t2 = jax.lax.optimization_barrier(
        (sqrt3 * q, (sqrt3 / 2.0) * r)
    )
    # the centers are products, so the subtractions below are further
    # fnma candidates (pos - radius*s) — barrier them too
    cx, cy, cz = jax.lax.optimization_barrier((
        sub_cell_radius * (t1 + t2),
        sub_cell_radius * 1.5 * r,
        h * sub_cell_radius,
    ))

    dx = positions[..., 0] - cx
    dy = positions[..., 1] - cy
    dz = positions[..., 2] - cz
    # reference op order: (dx*dx + dy*dy) + dz*dz (cell.rs:75-79)
    xx, yy, zz = jax.lax.optimization_barrier((dx * dx, dy * dy, dz * dz))
    dist = (xx + yy) + zz
    return cell_idx, sub_idx, dist


def _hash_sort(positions, valid, cell_size, sub_cell_radius):
    """Shared front half: hex keys -> hashes -> 4-column sort.

    Returns (ch_s, sh_s, perm, cell_idx, sub_idx, dist). Padding rows
    carry ch == i32::MAX (real hashes are clamped to 0x7FFFFFFE), so
    ``ch_s != i32::MAX`` recovers the sorted valid mask without a gather.
    """
    n = positions.shape[0]
    cell_idx, sub_idx, dist = hex_keys(positions, cell_size, sub_cell_radius)

    cols_cell = tuple(cell_idx[:, i] for i in range(3))
    cols_all = cols_cell + tuple(sub_idx[:, i] for i in range(3))
    cell_hash = _hash_cols(cols_cell, _PRIMES_A) & np.int32(0x7FFFFFFE)
    slot_hash = _hash_cols(cols_all, _PRIMES_B)
    cell_hash = jnp.where(valid, cell_hash, _I32_MAX)  # padding sorts last
    slot_hash = jnp.where(valid, slot_hash, np.int32(0))

    # distance as order-preserving int bits (f32 >= 0; inf/nan sort high)
    dist_bits = jax.lax.bitcast_convert_type(dist, jnp.int32)
    dist_bits = jnp.where(valid, dist_bits, _I32_MAX)

    arrival = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape(n)
    # under shard_map the fori_loop carry must have uniform varying-axis
    # types; mixing an unvarying iota with varying keys trips the check, so
    # tie arrival to a varying operand (no-op arithmetic)
    arrival = arrival + (cell_hash & jnp.int32(0))
    # arrival as the 4th column makes the pallas/bitonic total order
    # equal the stable 3-key lax.sort (the arrival values are < 2^30,
    # which the pallas sub-tile padding contract requires)
    ch_s, sh_s, db_s, perm = dispatch_sort4(
        cell_hash, slot_hash, dist_bits, arrival, num_keys=3, is_stable=True
    )
    return ch_s, sh_s, db_s, perm, cell_idx, sub_idx, dist


@jax.jit
def dedup_pass(positions, valid, cell_size, sub_cell_radius, next_cell_size):
    """One fused dedup pass over a padded batch.

    Args:
      positions: (N, 3) f32 world positions (padding rows arbitrary).
      valid: (N,) bool mask of real rows.
      cell_size: f32 scalar, cell edge length at this hierarchy.
      sub_cell_radius: f32 scalar, hex slot radius (sub_cell_size / 2).
      next_cell_size: f32 scalar, cell edge length at hierarchy + 1 (for
        loser regrouping).

    Returns (all sorted by (cell-hash, slot-hash, distance, arrival)):
      perm: (N,) i32 permutation into the input batch,
      winner: (N,) bool, first valid row of each slot run,
      valid_s: (N,) bool sorted valid mask,
      cell_idx_s: (N, 3) i32 sorted cell indices,
      sub_idx_s: (N, 3) i32 sorted hex slot indices,
      dist_s: (N,) f32 sorted distances,
      next_cell_idx_s: (N, 3) i32 cell index at the next hierarchy,
      suspect: (N,) bool, rows inside hash-collision runs (host fallback).
    """
    n = positions.shape[0]
    ch_s, sh_s, db_s, perm, cell_idx, sub_idx, dist = _hash_sort(
        positions, valid, cell_size, sub_cell_radius
    )
    next_cell_idx = jax_cell_index(positions, next_cell_size)

    cell_idx_s = cell_idx[perm]
    sub_idx_s = sub_idx[perm]
    dist_s = dist[perm]
    next_cell_idx_s = next_cell_idx[perm]
    valid_s = valid[perm]

    same_hash = (ch_s == jnp.roll(ch_s, 1)) & (sh_s == jnp.roll(sh_s, 1))
    first = jnp.logical_not(same_hash).at[0].set(True)
    winner = first & valid_s

    # collision audit: a run mixing two real keys has an adjacent mismatch
    key_s = jnp.concatenate([cell_idx_s, sub_idx_s], axis=1)
    diff_prev = jnp.any(key_s != jnp.roll(key_s, 1, axis=0), axis=1)
    mismatch = same_hash & diff_prev & valid_s
    # near-tie audit (_near_tie_mask): ambiguous-distance runs resolve
    # exactly on the host, immunizing winner choice against backend
    # fma contraction of the distance formula
    pos_s = positions[perm]
    near_tie = _near_tie_mask(same_hash, db_s, pos_s, valid_s)
    mismatch = (mismatch | near_tie).at[0].set(False)
    seg_id = jnp.cumsum(first.astype(jnp.int32)) - 1
    seg_bad = jnp.zeros(n, jnp.int32).at[seg_id].max(
        mismatch.astype(jnp.int32)
    )
    suspect = (seg_bad[seg_id] > 0) & valid_s

    return (
        perm, winner, valid_s, cell_idx_s, sub_idx_s, dist_s,
        next_cell_idx_s, suspect,
    )


def resolve_suspects_host(perm, winner, cell_idx_s, sub_idx_s, dist_s,
                          suspect) -> np.ndarray:
    """Exact host-side re-dedup of hash-collision rows (rare).

    Recomputes winner flags for suspect rows with a full-key lexsort; the
    result is exactly the winner set a collision-free sort would produce.
    Returns the corrected winner array.
    """
    rows = np.nonzero(suspect)[0]
    if len(rows) == 0:
        return winner
    keys = np.concatenate(
        [cell_idx_s[rows], sub_idx_s[rows]], axis=1
    )
    dist = dist_s[rows]
    arrival = perm[rows]
    order = np.lexsort(
        (arrival, dist, keys[:, 5], keys[:, 4], keys[:, 3],
         keys[:, 2], keys[:, 1], keys[:, 0])
    )
    k_sorted = keys[order]
    is_first = np.ones(len(rows), bool)
    is_first[1:] = np.any(k_sorted[1:] != k_sorted[:-1], axis=1)
    winner = winner.copy()
    winner[rows[order]] = is_first
    return winner


def _dedup_light_body(positions, valid, cell_size, sub_cell_radius):
    """Traced body shared by :func:`dedup_pass_light` and
    :func:`dedup_pass_resident` (see the former's docstring).

    Returns ONE int32 array packing (perm | winner << 30 | suspect << 29)
    — 4 bytes/point and a single device-to-host transfer instead of ~47
    bytes over several (the tunnel in the bench environment costs ~30 ms
    latency per transfer at ~45 MB/s). The remaining per-row data
    (cell/slot indices, distances) is bit-identical when recomputed on the
    host from the permuted positions (core/hex.py keeps the NumPy and jnp
    paths in IEEE lockstep), so callers rebuild it locally. Batches are
    capped at 2^29 rows by the packing (far above any practical bucket).

    Unlike :func:`dedup_pass`, the collision audit here is gather-free:
    TPU per-row gathers/scatters at 2^20 rows cost more than the sort
    itself (PERF.md), so instead of gathering the 6 true key columns and
    scattering per-segment flags, this path gathers only the 3 position
    columns, recomputes the keys on-device (bit-identical: same
    elementwise f32 program), and propagates mismatch flags across the
    contiguous sorted runs with cumsum/cummax fills. The packed result is
    bit-identical to the dedup_pass formulation (byte-parity suites
    compare the resulting stores against the host oracle).
    """
    n = positions.shape[0]
    ch_s, sh_s, db_s, perm, _, _, _ = _hash_sort(
        positions, valid, cell_size, sub_cell_radius
    )
    valid_s = ch_s != _I32_MAX  # real hashes are clamped below i32::MAX

    same_hash = (ch_s == jnp.roll(ch_s, 1)) & (sh_s == jnp.roll(sh_s, 1))
    first = jnp.logical_not(same_hash).at[0].set(True)
    winner = first & valid_s

    # audit: recompute true keys of the sorted rows from permuted
    # positions (3-column gather instead of 6) and flag runs where the
    # hash pair repeats but the true key changes. The gather stays
    # direct: its only consumers are fused elementwise key math, which
    # XLA folds into the gather (a banked (N/8,24)+one-hot variant
    # measured slightly SLOWER here, 21.8 vs 20.2 ms for the whole pass
    # — banking only pays for materializing gathers, PERF.md).
    pos_s = positions[perm]
    cell_idx_s = jax_cell_index(pos_s, cell_size)
    axial_s = jax_axial_from_world(pos_s, sub_cell_radius)
    sub_idx_s = jax_axial_to_offset(axial_s)
    key_s = jnp.concatenate([cell_idx_s, sub_idx_s], axis=1)
    diff_prev = jnp.any(key_s != jnp.roll(key_s, 1, axis=0), axis=1)
    mismatch = same_hash & diff_prev & valid_s
    # near-tie audit (_near_tie_mask): ambiguous-distance runs resolve
    # exactly on the host, immunizing winner choice against backend
    # fma contraction of the distance formula
    near_tie = _near_tie_mask(same_hash, db_s, pos_s, valid_s)
    mismatch = (mismatch | near_tie).at[0].set(False)

    # run-fill without segment scatters: runs are contiguous, so "any
    # mismatch in my run" = cumsum(mismatch) rose between the run's start
    # and its end; start/end values spread via (reverse-)cummax fills.
    # mismatch is always False on a run's first row (same_hash is), so the
    # cumsum at the start equals the pre-run value.
    # s is nondecreasing, so a forward cummax lands on the most recent
    # run start, and a reverse cummin on the nearest following run end
    s = jnp.cumsum(mismatch.astype(jnp.int32))
    start_s = jax.lax.cummax(jnp.where(first, s, np.int32(-1)))
    last = jnp.roll(first, -1).at[n - 1].set(True)  # run's last row
    end_vals = jnp.where(last, s, _I32_MAX)
    end_s = jnp.flip(jax.lax.cummin(jnp.flip(end_vals)))
    suspect = (end_s > start_s) & valid_s

    return (
        perm
        | (winner.astype(jnp.int32) << 30)
        | (suspect.astype(jnp.int32) << 29)
    )


dedup_pass_light = jax.jit(_dedup_light_body)


def _dedup_resident_body(resident, src_packed, extras, cell_size,
                         sub_cell_radius):
    """Device-resident cascade level: gather this level's rows on-device.

    ``src_packed`` encodes each row's source: >= 0 indexes into
    ``resident`` (the batch's level-0 device buffer — the row never
    crossed the link again), < 0 encodes ``~index`` into ``extras`` (the
    small host-uploaded set: displaced incumbents + points staged in
    earlier batches), and i32::MAX marks bucket padding. Levels >= 1 thus
    upload 4 B/continuing row + 12 B/foreign row instead of 12 B/row —
    the round-2 bottleneck was every level re-uploading its positions
    (2.82x cascade amplification, VERDICT r2 Weak #2).

    The gathered positions are bit-identical to a host upload, so the
    sort and the packed result are unchanged (byte-parity suites cover
    this path end-to-end).
    """
    valid = src_packed != _I32_MAX
    is_res = src_packed >= 0
    res_idx = jnp.where(is_res, src_packed, 0)
    ext_idx = jnp.where(is_res, 0, jnp.invert(src_packed))
    positions = jnp.where(
        is_res[:, None], resident[res_idx], extras[ext_idx]
    )
    return _dedup_light_body(positions, valid, cell_size, sub_cell_radius)


dedup_pass_resident = jax.jit(_dedup_resident_body)


def host_keys(positions, cell_size, sub_cell_size):
    """NumPy mirror of :func:`hex_keys` (same f32 ops -> same bits)."""
    from ..core import hex as hexgrid
    from ..core.metadata import MetadataConfig

    config = MetadataConfig()
    cell_idx = config.cell_index(positions, np.float32(cell_size))
    radius = np.float32(sub_cell_size) / np.float32(2.0)
    sub_idx = hexgrid.offset_from_world(positions, radius)
    centers = hexgrid.offset_to_world(sub_idx, radius)
    d = positions - centers
    # extreme coordinates overflow to inf — IEEE-defined, identical on
    # the jnp and C++ paths (lockstep-tested); silence only the warning
    with np.errstate(over="ignore"):
        dist = (d[:, 0] * d[:, 0] + d[:, 1] * d[:, 1]) + d[:, 2] * d[:, 2]
    return cell_idx, sub_idx, dist


def host_keys_full(positions, cell_size, sub_cell_size):
    """(cell_idx, sub_idx, dist, next_cell_idx) — C++ kernel when built
    (bit-identical, multi-threaded), NumPy otherwise."""
    cell_size = np.float32(cell_size)
    sub_cell_size = np.float32(sub_cell_size)
    next_cell_size = np.float32(cell_size / np.float32(2.0))
    from ..native import hex_keys_native

    out = hex_keys_native(
        positions, cell_size,
        np.float32(sub_cell_size / np.float32(2.0)), next_cell_size,
    )
    if out is not None:
        return out
    cell_idx, sub_idx, dist = host_keys(positions, cell_size, sub_cell_size)
    from ..core.metadata import MetadataConfig

    next_idx = MetadataConfig().cell_index(positions, next_cell_size)
    return cell_idx, sub_idx, dist, next_idx


def dispatch_dedup(positions: np.ndarray, cell_size, sub_cell_size,
                   n_valid: int | None = None) -> dict:
    """Start the device pass asynchronously; returns a handle for
    :func:`collect_dedup`.

    JAX dispatch is non-blocking, so the host-to-device upload and the
    sort overlap whatever host work happens before collection — the
    cross-batch pipelining hook used by DeviceConverter.prefetch.
    """
    n = len(positions) if n_valid is None else n_valid
    # bucket floor 2^15: fewer distinct shapes = fewer expensive TPU sort
    # compiles; padded rows cost ~nothing at run time
    n_pad = pad_to_bucket(max(n, 1), minimum=1 << 15)
    pos_pad = np.zeros((n_pad, 3), np.float32)
    pos_pad[:n] = positions[:n]
    valid = np.zeros(n_pad, bool)
    valid[:n] = True

    pos_dev = jnp.asarray(pos_pad)
    args = (
        pos_dev,
        jnp.asarray(valid),
        jnp.float32(np.float32(cell_size)),
        jnp.float32(np.float32(sub_cell_size) / np.float32(2.0)),
    )
    packed = _guarded_call(lambda: dedup_pass_light(*args))
    _start_readback(packed)
    # pos_dev stays in the handle: the device-resident cascade gathers
    # deeper levels' rows from this buffer instead of re-uploading them
    return {"n": n, "packed": packed, "pos_dev": pos_dev}


def _start_readback(packed) -> None:
    """Kick off the d2h copy as soon as the device pass finishes (the
    transfer then overlaps whatever host work precedes collect_dedup's
    blocking np.asarray — worth a full link round-trip per level)."""
    try:
        packed.copy_to_host_async()
    except AttributeError:
        pass


def dispatch_dedup_resident(resident, src: np.ndarray, extras: np.ndarray,
                            cell_size, sub_cell_size) -> dict:
    """Dispatch a cascade level whose rows mostly live on-device already.

    Args:
      resident: the batch's level-0 device buffer (``pos_dev`` from the
        level-0 :func:`dispatch_dedup` handle).
      src: (n,) int32 — >= 0: row index into ``resident``; < 0: ``~index``
        into ``extras``.
      extras: (m, 3) f32 host rows (displaced incumbents, earlier-batch
        staged points) that must be uploaded.
    """
    n = len(src)
    n_pad = pad_to_bucket(max(n, 1), minimum=1 << 15)
    src_pad = np.full(n_pad, _I32_MAX, np.int32)
    src_pad[:n] = src
    m_pad = pad_to_bucket(max(len(extras), 1), minimum=1 << 10)
    extras_pad = np.zeros((m_pad, 3), np.float32)
    extras_pad[: len(extras)] = extras

    args = (
        resident,
        jnp.asarray(src_pad),
        jnp.asarray(extras_pad),
        jnp.float32(np.float32(cell_size)),
        jnp.float32(np.float32(sub_cell_size) / np.float32(2.0)),
    )
    packed = _guarded_call(lambda: dedup_pass_resident(*args))
    _start_readback(packed)
    return {"n": n, "packed": packed}


def dispatch_dedup_auto(resident, src, positions, cell_size, sub_cell_size,
                        prefetch_handle=None, enabled=True):
    """Choose resident-buffer dispatch vs a fresh full upload for a level.

    Shared by DeviceConverter and NativeDeviceConverter so the
    resident-majority gate and the ``~index`` extras packing can never
    diverge between them (their stores must stay byte-identical,
    CLAUDE.md invariant #1).

    The resident path pays off only when most rows still live in the
    device buffer; heavily-foreign levels re-base with a full upload,
    which also refreshes the resident buffer.

    Returns ``(handle, resident, src, src_arr)``:
      handle: for :func:`collect_dedup`.
      resident, src: the cascade state to carry to the next level
        (replaced on a fresh upload).
      src_arr: (n,) int32 mapping this level's rows into the CURRENT
        resident buffer — identity after a fresh upload, pass-through
        of ``src`` otherwise.
    """
    use_resident = (
        enabled
        and prefetch_handle is None
        and resident is not None
        and src is not None
        and (src >= 0).sum() * 2 >= len(src)
    )
    if use_resident:
        foreign = src < 0
        extras = np.ascontiguousarray(positions[foreign])
        src_packed = src.astype(np.int32)
        src_packed[foreign] = ~np.arange(
            int(foreign.sum()), dtype=np.int32
        )
        handle = dispatch_dedup_resident(
            resident, src_packed, extras, cell_size, sub_cell_size
        )
    else:
        handle = prefetch_handle or dispatch_dedup(
            positions, cell_size, sub_cell_size
        )
        resident = handle.get("pos_dev")
        src = None
    src_arr = (
        src if src is not None
        else np.arange(len(positions), dtype=np.int32)
    )
    return handle, resident, src, src_arr


def mark_pallas_broken() -> None:
    """Degrade the sort backend to the bitonic for the whole process.

    The backend choice is baked into traced jaxprs and jit._clear_cache
    does NOT drop the trace cache (measured), so recovery rebinds fresh
    jit wrappers around the original bodies. Callers that compiled their
    own programs over these bodies (e.g. the shard_map mesh pass,
    parallel/dedup.py) must also rebuild their compiled functions.
    """
    global _PALLAS_BROKEN
    global dedup_pass_light, dedup_pass, dedup_pass_resident
    _PALLAS_BROKEN = True
    # fresh lambdas guarantee empty trace caches (a re-jit of the
    # same function object could reuse the pallas-baked trace)
    dedup_pass_light = jax.jit(
        lambda *a, _f=_dedup_light_body: _f(*a)
    )
    dedup_pass = jax.jit(lambda *a, _f=dedup_pass.__wrapped__: _f(*a))
    dedup_pass_resident = jax.jit(
        lambda *a, _f=_dedup_resident_body: _f(*a)
    )


def _guarded_call(thunk):
    """Run a jitted dedup dispatch with the pallas->bitonic degrade.

    The auto backend picks the Pallas sort on TPU; a Mosaic compile or
    launch failure on an unvetted libtpu must degrade to the
    always-available bitonic, not kill the conversion. Compile errors
    surface at call (jit compilation is synchronous); async launch
    errors are forced to surface here once via a 4-byte readback.
    """
    global _PALLAS_VETTED
    try:
        packed = thunk()
        if not _PALLAS_VETTED and _resolve_backend() == "pallas":
            np.asarray(packed[:1])
            _PALLAS_VETTED = True
        return packed
    except Exception:
        if _resolve_backend() != "pallas":
            raise
        import logging

        logging.getLogger(__name__).warning(
            "pallas sort backend failed; falling back to bitonic",
            exc_info=True,
        )
        mark_pallas_broken()
        return thunk()


def audit_device_runs(winner, suspect, cell_idx, sub_idx) -> np.ndarray:
    """Host-key audit of the device's run structure; returns the
    extended suspect mask (round-5 fuzz finding).

    The ON-DEVICE audits compare device-recomputed keys, which carry
    the same fma-contraction drift as the sort keys — a boundary-exact
    coordinate whose quantization flipped on the device looks
    self-consistent there (measured: a point at x == 0.0 exactly on a
    hex edge quantized to a different slot than the host). With the
    EXACT host keys of the sorted rows, two global invariants close the
    hole:

    1. a device run boundary (winner flag) must coincide exactly with a
       true-key change — the XOR catches runs that mixed two true keys
       AND one true key split across two runs,
    2. no true key may carry two winners — catches a mis-slotted row
       that formed its own clean run under the wrong hash (invisible
       to any run-local check).

    Every row of every affected true key becomes suspect, so
    :func:`resolve_suspects_host` re-decides those keys exactly; the
    audit costs one winners-only lexsort (no conflicts, the common
    case) plus an isin pass only when something flagged."""
    n = len(winner)
    if n == 0:
        return suspect
    keys = np.ascontiguousarray(
        np.concatenate([cell_idx, sub_idx], axis=1)
    )
    change = np.empty(n, bool)
    change[0] = True
    change[1:] = np.any(keys[1:] != keys[:-1], axis=1)
    bad = np.zeros(n, bool)
    xb = winner[1:] != change[1:]
    bad[1:] |= xb
    bad[:-1] |= xb  # both sides of a bad boundary
    w = np.nonzero(winner)[0]
    if len(w) > 1:
        wk = keys[w]
        order = np.lexsort(wk.T[::-1])
        wks = wk[order]
        dup = np.all(wks[1:] == wks[:-1], axis=1)
        if dup.any():
            dup_rows = np.concatenate(
                [w[order[1:][dup]], w[order[:-1][dup]]]
            )
            bad[dup_rows] = True
    if not bad.any():
        return suspect
    kb = keys.view(f"V{keys.dtype.itemsize * keys.shape[1]}").reshape(-1)
    mark = np.isin(kb, np.unique(kb[bad]))
    return suspect | mark


def collect_dedup(handle: dict, positions: np.ndarray, cell_size,
                  sub_cell_size):
    """Block on a dispatched pass and rebuild the per-row data host-side."""
    from ..utils.tracing import stage

    n = handle["n"]
    with stage("d2h_wait"):
        packed = np.asarray(handle["packed"])[:n]  # padding sorts last
    with stage("host_rebuild"):
        perm = packed & ((1 << 29) - 1)
        winner = (packed >> 30) & 1 == 1
        suspect = (packed >> 29) & 1 == 1

        pos_s = np.asarray(positions[:n], np.float32)[perm]
        cell_idx, sub_idx, dist, next_cell_idx = host_keys_full(
            pos_s, cell_size, sub_cell_size
        )
        suspect = audit_device_runs(winner, suspect, cell_idx, sub_idx)
        winner = resolve_suspects_host(
            perm, winner, cell_idx, sub_idx, dist, suspect
        )
    return perm, winner, cell_idx, sub_idx, dist, next_cell_idx


def dedup_batch_host(positions: np.ndarray, cell_size, sub_cell_size,
                     n_valid: int | None = None):
    """Pad, run the light device pass, rebuild row data on the host.

    ``positions`` rows [0, n_valid) are real; the rest is padding.
    Hash-collision runs are corrected exactly via
    :func:`resolve_suspects_host`.

    NOTE: rows come back grouped by *hash* order — same cell contiguous
    (up to cell-hash collisions, which the suspect mask also flags), but
    cells in hash order, not index order.
    """
    handle = dispatch_dedup(positions, cell_size, sub_cell_size, n_valid)
    return collect_dedup(handle, positions, cell_size, sub_cell_size)
