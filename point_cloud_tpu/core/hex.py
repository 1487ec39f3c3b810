"""Hexagonal-prism sub-grid quantization (vectorized).

The reference dedup grid inside each cell is a hexagonal-prism grid: hex
cells in the XY plane, integer layers in Z (reference:
point-converter/src/hex.rs:1-86). Points are quantized with the
Charles-Chambers hex algorithm; the reference stores indices in "offset"
coordinates and converts through "axial" coordinates.

This module provides batched implementations of the same math:

- a NumPy float32 path that mirrors the reference's f32 operation order
  exactly (used by the host store code and by parity oracles), and
- a jax.numpy path with identical semantics for use inside jitted device
  pipelines (ops/ and convert/).

All functions operate on arrays: positions are ``(..., 3)`` float32, indices
``(..., 3)`` int32 (offset: x, y, z / axial: q, r, h).

Casting semantics replicated from Rust:
- ``f.floor() as i32`` — floor, then saturating cast (NaN -> 0),
- ``f as i32`` (used for the z layer) — truncation toward zero, saturating.
"""

from __future__ import annotations

import numpy as np

SQRT_3 = np.float32(1.73205080757)  # same literal as hex.rs:3

_I32_MIN = -(2**31)
_I32_MAX = 2**31 - 1


def _np_saturating_i32(v: np.ndarray) -> np.ndarray:
    """Rust `as i32` on an already-integral float: saturate, NaN -> 0.

    Explicit bounds comparisons (not clip+cast): 2^31-1 is not
    representable in f32, so a clipped value of 2^31 would wrap in the
    cast. The in-range cast is exact because callers pass floor/trunc
    results. The C++ (native/pc_native.cpp sat_i32) and jnp versions
    implement the identical rule.
    """
    v = np.asarray(v, dtype=np.float32)
    nan = np.isnan(v)
    hi = v >= np.float32(2147483648.0)
    lo = v <= np.float32(-2147483904.0)  # first f32 below i32::MIN
    safe = np.where(nan | hi | lo, 0.0, v).astype(np.int32)
    out = np.where(hi, np.int32(_I32_MAX), safe)
    out = np.where(lo, np.int32(_I32_MIN), out)
    return np.where(nan, np.int32(0), out)


def offset_to_axial(offset: np.ndarray) -> np.ndarray:
    """Offset (x, y, z) -> axial (q, r, h). Mirrors hex.rs:18-24."""
    x = offset[..., 0].astype(np.int64)
    y = offset[..., 1].astype(np.int64)
    q = x - (y - (y & 1)) // 2
    return np.stack(
        [q.astype(np.int32), offset[..., 1], offset[..., 2]], axis=-1
    )


def axial_to_offset(axial: np.ndarray) -> np.ndarray:
    """Axial (q, r, h) -> offset (x, y, z). Mirrors hex.rs:45-51."""
    q = axial[..., 0].astype(np.int64)
    r = axial[..., 1].astype(np.int64)
    x = q + (r - (r & 1)) // 2
    return np.stack(
        [x.astype(np.int32), axial[..., 1], axial[..., 2]], axis=-1
    )


def axial_to_world(axial: np.ndarray, cell_radius: float) -> np.ndarray:
    """Hex center world position for axial indices. Mirrors hex.rs:55-65."""
    radius = np.float32(cell_radius)
    q = axial[..., 0].astype(np.float32)
    r = axial[..., 1].astype(np.float32)
    h = axial[..., 2].astype(np.float32)
    x = radius * (SQRT_3 * q + np.float32(SQRT_3 / np.float32(2.0)) * r)
    y = radius * np.float32(3.0) / np.float32(2.0) * r
    z = h * radius
    return np.stack([x, y, z], axis=-1)


def axial_from_world(pos: np.ndarray, cell_radius: float) -> np.ndarray:
    """Quantize world positions to axial hex indices. Mirrors hex.rs:67-85.

    Every intermediate is computed in float32 in the same operation order as
    the reference so quantization boundaries land on identical points.
    """
    radius = np.float32(cell_radius)
    pos = np.asarray(pos, dtype=np.float32)
    # extreme coordinates overflow to +/-inf here (and inf - inf makes
    # NaN, which _np_saturating_i32 casts deterministically) — the
    # IEEE-defined results the Rust reference, the C++ kernel, and jnp
    # all produce, lockstep-tested; silence only the warnings
    with np.errstate(over="ignore", invalid="ignore"):
        x = pos[..., 0] / (radius * SQRT_3)
        y = pos[..., 1] / (-radius * SQRT_3)
        # Charles-Chambers hex quantization (hex.rs:71-82)
        t = SQRT_3 * y + np.float32(1.0)
        temp1 = np.floor(t + x).astype(np.float32)
        temp2 = t - x
        temp3 = np.float32(2.0) * x + np.float32(1.0)
        qf = (temp1 + temp3) / np.float32(3.0)
        rf = (temp1 + temp2) / np.float32(3.0)
        q = _np_saturating_i32(np.floor(qf))
        r = -_np_saturating_i32(np.floor(rf))
        # `(pos.z / cell_radius) as i32` truncates toward zero (hex.rs:83)
        h = _np_saturating_i32(np.trunc(pos[..., 2] / radius))
    return np.stack([q, r, h], axis=-1)


def offset_from_world(pos: np.ndarray, cell_radius: float) -> np.ndarray:
    """World positions -> offset hex indices (the stored sub-grid index)."""
    return axial_to_offset(axial_from_world(pos, cell_radius))


def offset_to_world(offset: np.ndarray, cell_radius: float) -> np.ndarray:
    """Offset hex index -> hex center world position."""
    return axial_to_world(offset_to_axial(offset), cell_radius)


# ---------------------------------------------------------------------------
# JAX versions — identical math, usable inside jit. Kept separate (not
# jnp-polymorphic) so the NumPy path stays import-light for host tools.
# ---------------------------------------------------------------------------


def _jax_ops():
    import jax.numpy as jnp

    return jnp


def _jax_saturating_i32(v):
    """Device version of Rust ``as i32``: saturate, NaN -> 0 (matches
    :func:`_np_saturating_i32` so device and host quantize identically)."""
    jnp = _jax_ops()
    nan = jnp.isnan(v)
    hi = v >= jnp.float32(2147483648.0)
    lo = v <= jnp.float32(-2147483904.0)
    safe = jnp.where(nan | hi | lo, jnp.float32(0.0), v).astype(jnp.int32)
    out = jnp.where(hi, jnp.int32(_I32_MAX), safe)
    out = jnp.where(lo, jnp.int32(_I32_MIN), out)
    return jnp.where(nan, jnp.int32(0), out)


def jax_axial_from_world(pos, cell_radius):
    """jnp version of :func:`axial_from_world` (same f32 op order).

    Divisions use :func:`point_cloud_tpu.ops.exact.exact_div` because the
    TPU VPU's native f32 divide is 1-2 ulp approximate, which would shift
    quantization boundaries relative to the IEEE/host semantics.
    """
    jnp = _jax_ops()
    from ..ops.exact import exact_div

    radius = jnp.float32(cell_radius)
    sqrt3 = jnp.float32(SQRT_3)
    pos = pos.astype(jnp.float32)
    import jax as _jax

    x = exact_div(pos[..., 0], radius * sqrt3)
    y = exact_div(pos[..., 1], -radius * sqrt3)
    # barrier: keep sqrt3*y + 1.0 as two IEEE roundings (an fma here
    # shifts the floor boundary below by 1 ulp vs the host path —
    # ops/dedup.py hex_keys rationale)
    sy = _jax.lax.optimization_barrier(sqrt3 * y)
    t = sy + 1.0
    temp1 = jnp.floor(t + x)
    temp2 = t - x
    temp3 = 2.0 * x + 1.0
    qf = exact_div(temp1 + temp3, jnp.float32(3.0))
    rf = exact_div(temp1 + temp2, jnp.float32(3.0))
    q = _jax_saturating_i32(jnp.floor(qf))
    r = -_jax_saturating_i32(jnp.floor(rf))
    h = _jax_saturating_i32(jnp.trunc(exact_div(pos[..., 2], radius)))
    return jnp.stack([q, r, h], axis=-1)


def jax_cell_index(pos, cell_size):
    """Device ``floor(pos / cell_size)`` cell indexing (metadata.rs:100-102).

    Must stay in sync with :meth:`MetadataConfig.cell_index`; uses exact
    division for IEEE parity with the host path.
    """
    jnp = _jax_ops()
    from ..ops.exact import exact_div

    return _jax_saturating_i32(
        jnp.floor(exact_div(pos.astype(jnp.float32), jnp.float32(cell_size)))
    )


def jax_axial_to_offset(axial):
    jnp = _jax_ops()
    q = axial[..., 0]
    r = axial[..., 1]
    x = q + (r - (r & 1)) // 2
    return jnp.stack([x, r, axial[..., 2]], axis=-1)


def jax_offset_to_axial(offset):
    jnp = _jax_ops()
    x = offset[..., 0]
    y = offset[..., 1]
    q = x - (y - (y & 1)) // 2
    return jnp.stack([q, y, offset[..., 2]], axis=-1)


def jax_axial_to_world(axial, cell_radius):
    jnp = _jax_ops()
    import jax as _jax

    radius = jnp.float32(cell_radius)
    sqrt3 = jnp.float32(SQRT_3)
    q = axial[..., 0].astype(jnp.float32)
    r = axial[..., 1].astype(jnp.float32)
    h = axial[..., 2].astype(jnp.float32)
    # barrier pins mul-then-add IEEE order against XLA:CPU FMA
    # contraction (ops/dedup.py hex_keys rationale — the round-5 fuzz
    # measured 1-ulp drift vs NumPy at batch shapes without it)
    t1, t2 = _jax.lax.optimization_barrier(
        (sqrt3 * q, (sqrt3 / 2.0) * r)
    )
    x = radius * (t1 + t2)
    y = radius * 1.5 * r
    z = h * radius
    return jnp.stack([x, y, z], axis=-1)


def jax_offset_from_world(pos, cell_radius):
    return jax_axial_to_offset(jax_axial_from_world(pos, cell_radius))


def jax_offset_to_world(offset, cell_radius):
    return jax_axial_to_world(jax_offset_to_axial(offset), cell_radius)
