"""Device-side hex dedup: the TPU replacement for the reference's hot loop.

The reference dedups points one at a time with a HashMap insert per point
(reference: point-converter/src/cell.rs:70-106, hex quantization at
point-converter/src/hex.rs:67-85). The TPU-native formulation processes a
whole batch in one fused XLA program:

1. quantize every point to its (cell index, hex sub-grid slot) pair and
   compute its f32 squared distance to the slot center (VPU, exact ops —
   see ops/exact.py for why division is reconstructed),
2. one multi-key ``lax.sort`` over (cell.xyz, slot.xyz, distance, arrival)
   groups equal slots together with the best candidate first,
3. a shifted-compare marks the first row of each (cell, slot) run — the
   winners; every other row is a loser that cascades to the next hierarchy.

Winner-set parity with the reference's sequential insertion: for distinct
distances argmin is arrival-order independent; on ties the earliest arrival
wins (the host feeds incumbents before batch points, so a stored point beats
an equal-distance newcomer, matching cell.rs:80 ``new < old``).

Shapes are static: callers pad batches to pow2 buckets; padded rows carry a
key of i32::MAX so they sort to the tail and are dropped by the valid mask.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.hex import jax_axial_from_world, jax_axial_to_offset, jax_cell_index
from ..ops.exact import exact_div

_I32_MAX = np.int32(2**31 - 1)


def pad_to_bucket(n: int, minimum: int = 1024) -> int:
    """Next power-of-two bucket size (bounds jit recompilation count)."""
    size = minimum
    while size < n:
        size *= 2
    return size


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
    cx = sub_cell_radius * (sqrt3 * q + (sqrt3 / 2.0) * r)
    cy = sub_cell_radius * 1.5 * r
    cz = h * sub_cell_radius

    dx = positions[..., 0] - cx
    dy = positions[..., 1] - cy
    dz = positions[..., 2] - cz
    # reference op order: (dx*dx + dy*dy) + dz*dz (cell.rs:75-79)
    dist = (dx * dx + dy * dy) + dz * dz
    return cell_idx, sub_idx, dist


@partial(jax.jit, donate_argnums=())
def dedup_pass(positions, valid, cell_size, sub_cell_radius, next_cell_size):
    """One fused dedup pass over a padded batch.

    Args:
      positions: (N, 3) f32 world positions (padding rows arbitrary).
      valid: (N,) bool mask of real rows.
      cell_size: f32 scalar, cell edge length at this hierarchy.
      sub_cell_radius: f32 scalar, hex slot radius (sub_cell_size / 2).
      next_cell_size: f32 scalar, cell edge length at hierarchy + 1 (for
        loser regrouping).

    Returns (all sorted by (cell, slot, distance, arrival)):
      perm: (N,) i32 permutation into the input batch,
      winner: (N,) bool, first valid row of each (cell, slot) run,
      valid_s: (N,) bool sorted valid mask,
      cell_idx_s: (N, 3) i32 sorted cell indices,
      sub_idx_s: (N, 3) i32 sorted hex slot indices,
      dist_s: (N,) f32 sorted distances,
      next_cell_idx_s: (N, 3) i32 cell index at the next hierarchy.
    """
    n = positions.shape[0]
    cell_idx, sub_idx, dist = hex_keys(positions, cell_size, sub_cell_radius)
    next_cell_idx = jax_cell_index(positions, next_cell_size)

    arrival = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape(n)

    # leading key = !valid so padding sorts strictly after every real row
    # (saturated real indices may equal i32::MAX and must not interleave)
    (invalid_s, kx, ky, kz, sx, sy, sz, dist_s, perm, nx, ny, nz) = jax.lax.sort(
        (
            jnp.logical_not(valid).astype(jnp.int32),
            cell_idx[:, 0],
            cell_idx[:, 1],
            cell_idx[:, 2],
            sub_idx[:, 0],
            sub_idx[:, 1],
            sub_idx[:, 2],
            dist,
            arrival,  # tie-break: earliest arrival wins (incumbents first)
            next_cell_idx[:, 0],
            next_cell_idx[:, 1],
            next_cell_idx[:, 2],
        ),
        num_keys=9,
    )

    same_as_prev = (
        (kx == jnp.roll(kx, 1))
        & (ky == jnp.roll(ky, 1))
        & (kz == jnp.roll(kz, 1))
        & (sx == jnp.roll(sx, 1))
        & (sy == jnp.roll(sy, 1))
        & (sz == jnp.roll(sz, 1))
    )
    first = jnp.logical_not(same_as_prev).at[0].set(True)
    valid_s = invalid_s == 0
    winner = first & valid_s

    cell_idx_s = jnp.stack([kx, ky, kz], axis=-1)
    sub_idx_s = jnp.stack([sx, sy, sz], axis=-1)
    next_cell_idx_s = jnp.stack([nx, ny, nz], axis=-1)
    return perm, winner, valid_s, cell_idx_s, sub_idx_s, dist_s, next_cell_idx_s


def dedup_batch_host(positions: np.ndarray, cell_size, sub_cell_size,
                     n_valid: int | None = None):
    """Host wrapper: pad, run :func:`dedup_pass`, return NumPy results.

    ``positions`` rows [0, n_valid) are real (incumbents first, then batch
    arrivals); the rest is padding.
    """
    n = len(positions) if n_valid is None else n_valid
    n_pad = pad_to_bucket(max(n, 1))
    pos_pad = np.zeros((n_pad, 3), np.float32)
    pos_pad[:n] = positions[:n]
    valid = np.zeros(n_pad, bool)
    valid[:n] = True

    cell_size = np.float32(cell_size)
    sub_cell_size = np.float32(sub_cell_size)
    out = dedup_pass(
        jnp.asarray(pos_pad),
        jnp.asarray(valid),
        jnp.float32(cell_size),
        jnp.float32(sub_cell_size / np.float32(2.0)),
        jnp.float32(cell_size / np.float32(2.0)),
    )
    perm, winner, valid_s, cell_idx, sub_idx, dist, next_cell_idx = map(
        np.asarray, out
    )
    # padding occupies the tail; truncate to the n valid rows
    return (
        perm[:n],
        winner[:n],
        cell_idx[:n],
        sub_idx[:n],
        dist[:n],
        next_cell_idx[:n],
    )
