"""Model registry: the framework's flagship compute pipelines.

The reference is a data framework, not an ML stack — its "models" are the
two production pipelines; this package builds runnable (fn, example_args)
pairs for them (used by the driver entry point, __graft_entry__.entry,
and by profiling/smoke tooling):

- ``conversion`` — the batched hex-dedup cascade
  (ops/dedup.py + convert/device.py): quantize -> multi-key sort ->
  segmented argmin -> LSM merge -> overflow cascade.
- ``frame`` — the per-frame render pipeline (render/kernel.py +
  render/splat.py): project -> cull -> LOD walk -> occlusion -> splat
  rasterize.
"""

from __future__ import annotations

import numpy as np

PIPELINES = ("conversion", "frame")


def get_pipeline(name: str, n: int = 1 << 16, seed: int = 0):
    """(jittable_fn, example_args) for a named flagship pipeline.

    The returned function is pure and shape-stable: ``jax.jit(fn)(*args)``
    compiles and runs it on the default device.
    """
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    if name == "conversion":
        from ..ops.dedup import dedup_pass

        positions = jnp.asarray(
            rng.uniform(-100, 100, (n, 3)).astype(np.float32)
        )
        valid = jnp.ones(n, bool)
        args = (
            positions, valid, jnp.float32(1000.0),
            jnp.float32(1000.0 / 96.0 / 2.0), jnp.float32(500.0),
        )

        def conversion_fn(positions, valid, cell_size, sub_radius,
                          next_cell_size):
            return dedup_pass(positions, valid, cell_size, sub_radius,
                              next_cell_size)

        return conversion_fn, args

    if name == "frame":
        from ..render.camera import Camera
        from ..render.kernel import (
            MAX_HIERARCHIES, build_loaded_cells_hash, cull_lod_pass,
        )

        cam = Camera()
        positions = jnp.asarray(
            rng.uniform(-400, 400, (n, 3)).astype(np.float32)
        )
        table = np.unique(
            rng.integers(-4, 4, (2000, 4)).astype(np.int32), axis=0
        )
        cell_sizes = jnp.asarray(
            [1000.0 / 2**h for h in range(MAX_HIERARCHIES)], np.float32
        )
        args = (
            positions,
            jnp.zeros(n, jnp.int32),
            jnp.ones(n, bool),
            jnp.asarray(cam.view_matrix()),
            jnp.asarray(cam.projection_matrix()),
            jnp.asarray(cam.transform.translation, jnp.float32),
            cell_sizes,
            cell_sizes / 96.0,
            jnp.asarray(build_loaded_cells_hash(table)),
            jnp.full(MAX_HIERARCHIES, 1e9, jnp.float32),
            jnp.bool_(False),
            jnp.int32(0),
        )

        def frame_fn(positions, point_hierarchy, valid, view, projection,
                     cam_pos, cell_sizes, spacings, loaded_hash,
                     far_distances, size_by_distance, max_hierarchy):
            return cull_lod_pass(
                positions, point_hierarchy, valid, view, projection,
                cam_pos, cell_sizes, spacings, 6, loaded_hash,
                far_distances, size_by_distance, max_hierarchy,
            )

        return frame_fn, args

    raise KeyError(f"unknown pipeline {name!r}; one of {PIPELINES}")
