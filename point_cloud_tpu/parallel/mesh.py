"""Mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """A 1-D data-parallel mesh over the first ``n_devices`` devices.

    Conversion is data-parallel over points (SURVEY.md section 7: the
    batch axis is the only scaling axis — there is no model to
    tensor/pipeline-shard), so a 1-D mesh is the natural topology; on a
    v5e-8 it maps onto the 2x4 ICI torus as a ring.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(
            f"requested {n_devices} devices, only {len(devices)} available"
        )
    return Mesh(np.asarray(devices[:n_devices]), (axis,))
