"""Mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


import logging

log = logging.getLogger(__name__)


def make_mesh(
    n_devices: int | None = None, axis: str = "data", strict: bool = False,
    local: bool = False,
) -> Mesh:
    """A 1-D data-parallel mesh over the first ``n_devices`` devices.

    Conversion is data-parallel over points (SURVEY.md section 7: the
    batch axis is the only scaling axis — there is no model to
    tensor/pipeline-shard), so a 1-D mesh is the natural topology; on a
    v5e-8 it maps onto the 2x4 ICI torus as a ring.

    When fewer than ``n_devices`` devices exist the mesh degrades
    gracefully to all available devices (results are identical — the mesh
    width only changes how batches shard, not what they compute); pass
    ``strict=True`` to raise instead. To *test* an N-way mesh without N
    chips, bootstrap virtual CPU devices before JAX initializes
    (``XLA_FLAGS=--xla_force_host_platform_device_count=N`` — see
    tests/conftest.py and __graft_entry__.dryrun_multichip).

    ``local=True`` builds the mesh over this process's own chips only
    (``jax.local_devices()``) — the multi-host converter topology, where
    each worker runs an independent single-controller pipeline over its
    local slice and hosts coordinate through files (parallel/launch.py).
    """
    devices = jax.local_devices() if local else jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        if strict:
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} "
                "available"
            )
        log.warning(
            "requested %d devices, only %d available; using %d",
            n_devices, len(devices), len(devices),
        )
        n_devices = len(devices)
    return Mesh(np.asarray(devices[:n_devices]), (axis,))
