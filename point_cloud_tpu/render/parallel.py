"""Mesh-sharded frame rendering: the frame hot loop over N chips.

The reference renders on exactly one GPU (its whole render stack hangs
off a single wgpu Device/Queue, reference: src/plugins/wgpu.rs:66-113).
This module is new capability with no reference counterpart: the frame
hot loop — cull + LOD + occlusion + splat rasterization — data-parallel
over a ``jax.sharding.Mesh``.

Why it scales: the measured frame bottleneck is the scatter-min raster,
whose cost is linear in fragment rows processed (~7.5 ns/row each for
the depth and id scatters, PERF.md primitive table) and embarrassingly
parallel over fragments. Sharding the points N ways gives each chip
1/N of the fragment rows and a private framebuffer; the only
inter-chip traffic is the framebuffer merge over ICI:

- depth plane: one ``lax.pmin`` (H*W f32 — ~1.2 MB at 640x480, trivial
  against ICI bandwidth),
- id plane: ``where(local_depth == global_depth, local_id, NO_ID)``
  followed by one more ``pmin`` — exactly the scatter path's
  deterministic tie rule (equal depths take the smallest point id,
  splat.py), so the merged image is bit-identical to the single-device
  raster, not merely similar.

Occlusion ordering is preserved across the mesh: buckets raster
near-to-far, and between buckets the partial depth planes ``pmin`` so
every shard's next cull tests against the depth of ALL nearer points,
exactly like the single-device bucket loop (renderer.py). That makes
the sharded frame *provably* equal to the single-device frame: by
induction each bucket sees the same merged depth, hence culls the same
points, hence emits the same fragment set.

What is and isn't validated here: image equality vs the single-device
renderer is tested on the virtual 8-device CPU mesh
(tests/test_render_parallel.py); multi-chip wall-clock scaling is NOT
hardware-validated (this environment has one chip — same caveat as the
owner-sharded converter cascade, PERF.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.metadata import Metadata
from .camera import Camera
from .kernel import (
    MAX_HIERARCHIES,
    _cull_body,
    _lod_walk_body,
    build_loaded_cells_hash,
)
from .renderer import RenderSettings, hierarchy_tables
from .splat import (
    CLEAR_DEPTH,
    _NO_ID,
    Framebuffer,
    _rasterize_body,
    resolve_framebuffer,
)


def _make_sharded_frame(mesh, axis: str, n_buckets: int, height: int,
                        width: int, footprint: int, voronoi: bool,
                        use_occlusion: bool, num_hierarchies: int,
                        use_pyramid: bool = False):
    """Compile one whole-frame program for a fixed bucket-shape tuple.

    The body runs per shard: every bucket's LOD walk + camera cull +
    scatter raster over the shard's rows, with a depth ``pmin`` between
    buckets (the cross-shard occlusion barrier) and the two-phase
    (depth, id) merge at the end. Outputs are replicated.
    """
    from jax import shard_map

    def body(*args):
        bucket_args = args[: 4 * n_buckets]
        (view, proj, cam_pos, cell_sizes, spacings, fars, sbd, maxh,
         loaded_hash) = args[4 * n_buckets:]
        merged_depth = jnp.full(height * width, CLEAR_DEPTH, jnp.float32)
        fb = Framebuffer(
            depth=jnp.full(height * width, CLEAR_DEPTH, jnp.float32),
            point_id=jnp.full(height * width, _NO_ID, jnp.int32),
        )
        visible = jnp.int32(0)
        for b in range(n_buckets):
            pos, hier, valid, ids = bucket_args[4 * b : 4 * b + 4]
            hier_base = _lod_walk_body(
                pos, hier, cell_sizes, num_hierarchies, loaded_hash
            )
            depth_img = (
                merged_depth.reshape(height, width) if use_occlusion
                else None
            )
            keep, _, ndc, view_pos, radius = _cull_body(
                pos, hier_base, valid, view, proj, cam_pos, spacings,
                fars, sbd, maxh, depth_img, use_occlusion,
                use_pyramid,
            )
            visible = visible + jnp.sum(keep.astype(jnp.int32))
            fb = _rasterize_body(
                fb, view_pos, ndc, radius, ids, keep, proj,
                height, width, footprint, voronoi,
            )
            if use_occlusion and b + 1 < n_buckets:
                merged_depth = jax.lax.pmin(fb.depth, axis)
        gdepth = jax.lax.pmin(fb.depth, axis)
        cand = jnp.where(fb.depth == gdepth, fb.point_id, _NO_ID)
        gid = jax.lax.pmin(cand, axis)
        return gdepth, gid, jax.lax.psum(visible, axis)

    shard = (P(axis, None), P(axis), P(axis), P(axis))
    in_specs = shard * n_buckets + (P(),) * 9
    fn = shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=(P(), P(), P()),
    )
    return jax.jit(fn)


class MeshPointRenderer:
    """Data-parallel counterpart of :class:`renderer.PointRenderer`.

    Renders one frame from a streamer's loaded set with the points
    sharded across ``mesh``'s first axis. Images are bit-identical to
    the single-device renderer's plain raster path (``compact_raster``
    / ``megakernel`` / ``classing`` off) — the sharding changes where
    fragments raster, never what wins a pixel.

    Only the sharding-relevant settings apply here (width/height,
    footprint, voronoi, occlusion, size_by_distance, max_hierarchy,
    hidden_hierarchies); the single-device renderer's compaction and
    window-ladder machinery is per-shard tuning that belongs in a later
    pass and does not change images.
    """

    def __init__(self, metadata: Metadata, mesh=None,
                 axis: str | None = None,
                 settings: RenderSettings | None = None):
        if mesh is None:
            from ..parallel.mesh import make_mesh

            mesh = make_mesh()
        self.metadata = metadata
        self.mesh = mesh
        self.axis = axis or mesh.axis_names[0]
        self.settings = settings or RenderSettings()
        self._fns: dict = {}
        self._bucket_cache: dict = {}
        self._n_dev = int(np.prod(mesh.devices.shape))

    def _pad_rows(self, n_real: int) -> int:
        from ..ops.dedup import pad_to_bucket

        n = pad_to_bucket(max(n_real, 1), minimum=1 << 12)
        if n % self._n_dev:
            n += self._n_dev - (n % self._n_dev)
        return n

    def render_start(self, streamer, camera: Camera,
                     streaming_frustums=None, paused: bool = False) -> dict:
        """Dispatch a frame's device chain without blocking; returns an
        opaque handle for :meth:`render_finish` (the single-device
        renderer's start/finish contract, so Viewer/serve swap
        renderers transparently and the double-buffered loop overlaps
        the readback with the next frame's dispatch)."""
        s = self.settings
        use_occ = s.occlusion and not paused

        # bucket the loaded cells exactly like the single-device path
        # (ilog2 distance groups, near to far — renderer.gather_points)
        from .renderer import PointRenderer

        gather = PointRenderer.gather_points
        cells = gather(self, streamer, camera)

        # camera-independent constants, cached like the single-device
        # renderer's (_const_cache / _hash_cache): rebuilding the hash
        # + re-uploading the tables per frame is measured host cost
        # (renderer.py cProfile notes)
        rep = NamedSharding(self.mesh, P())
        const_key = (id(self.metadata), int(self.metadata.hierarchies))
        cached = getattr(self, "_const_cache", None)
        if cached is None or cached[0] != const_key:
            cell_sizes, spacings = hierarchy_tables(self.metadata)
            cached = self._const_cache = (
                const_key,
                jax.device_put(cell_sizes, rep),
                jax.device_put(spacings, rep),
            )
        _, sizes_dev, spacings_dev = cached
        table = streamer.loaded_cells_table()
        table_key = table.tobytes()
        hcached = getattr(self, "_hash_cache", None)
        if hcached is None or hcached[0] != table_key:
            hcached = self._hash_cache = (
                table_key,
                jax.device_put(build_loaded_cells_hash(table), rep),
            )
        loaded_hash_dev = hcached[1]
        far_distances = np.zeros(MAX_HIERARCHIES, np.float32)
        if streaming_frustums is not None:
            fd = streamer.frustum_far_distances(
                streaming_frustums, camera.transform
            )
            far_distances[: len(fd)] = fd

        if not cells:
            hw = s.height * s.width
            fb = Framebuffer(
                depth=jnp.full(hw, CLEAR_DEPTH, jnp.float32),
                point_id=jnp.full(hw, _NO_ID, jnp.int32),
            )
            rgb, depth = resolve_framebuffer(
                fb, jnp.zeros((1024, 4), jnp.uint8), s.height, s.width
            )
            return {
                "rgb_dev": rgb,
                "depth_dev": depth if s.transfer_depth else None,
                "visible_dev": jnp.int32(0),
                "stats": {"cells": 0, "points_in": 0},
            }

        # group into buckets and build shard-divisible padded arrays
        buckets = []
        i = 0
        while i < len(cells):
            bucket = cells[i][0]
            group = []
            while i < len(cells) and cells[i][0] == bucket:
                group.append(cells[i])
                i += 1
            buckets.append(group)

        bucket_arrays = []
        all_colors = [np.zeros((1, 4), np.uint8)]
        id_base = 1
        total_in = 0
        row_spec = NamedSharding(self.mesh, P(self.axis))
        mat_spec = NamedSharding(self.mesh, P(self.axis, None))
        for group in buckets:
            # device-resident sharded bucket arrays, cached per (cell
            # ids + generations, id_base): an orbiting camera costs zero
            # host->device point traffic until the loaded set changes —
            # the same contract as the single-device renderer's
            # _bucket_device_arrays
            ckey = (tuple((g[2], g[4]) for g in group), id_base)
            cached = self._bucket_cache.get(ckey)
            if cached is None:
                positions = np.concatenate([g[3].positions for g in group])
                colors = np.concatenate([g[3].colors for g in group])
                hier = np.concatenate([
                    np.full(len(g[3]), g[2].hierarchy, np.int32)
                    for g in group
                ])
                n_real = len(positions)
                n = self._pad_rows(n_real)
                pos_pad = np.zeros((n, 3), np.float32)
                pos_pad[:n_real] = positions
                hier_pad = np.zeros(n, np.int32)
                hier_pad[:n_real] = hier
                valid = np.zeros(n, bool)
                valid[:n_real] = True
                ids = np.zeros(n, np.int32)
                ids[:n_real] = np.arange(
                    id_base, id_base + n_real, dtype=np.int32
                )
                cached = (
                    (
                        jax.device_put(pos_pad, mat_spec),
                        jax.device_put(hier_pad, row_spec),
                        jax.device_put(valid, row_spec),
                        jax.device_put(ids, row_spec),
                    ),
                    colors,
                    n_real,
                )
                if len(self._bucket_cache) > 64:
                    self._bucket_cache.pop(next(iter(self._bucket_cache)))
                self._bucket_cache[ckey] = cached
            arrays, colors, n_real = cached
            total_in += n_real
            bucket_arrays += list(arrays)
            all_colors.append(colors)
            id_base += n_real

        key = (
            tuple(a.shape for a in bucket_arrays[::4]),
            s.height, s.width, s.footprint, s.voronoi, use_occ,
            use_occ and s.depth_pyramid,
            max(int(self.metadata.hierarchies), 1),
        )
        fn = self._fns.get(key)
        if fn is None:
            fn = self._fns[key] = _make_sharded_frame(
                self.mesh, self.axis, len(buckets), s.height, s.width,
                s.footprint, s.voronoi, use_occ,
                max(int(self.metadata.hierarchies), 1),
                use_pyramid=use_occ and s.depth_pyramid,
            )
            if len(self._fns) > 32:
                self._fns.pop(next(iter(self._fns)))

        consts = [
            jax.device_put(np.asarray(camera.view_matrix(), np.float32), rep),
            jax.device_put(np.asarray(camera.projection_matrix(), np.float32), rep),
            jax.device_put(np.asarray(camera.transform.translation, np.float32), rep),
            sizes_dev,
            spacings_dev,
            jax.device_put(far_distances, rep),
            jax.device_put(np.bool_(s.size_by_distance), rep),
            jax.device_put(np.int32(s.max_hierarchy), rep),
            loaded_hash_dev,
        ]
        gdepth, gid, visible = fn(*bucket_arrays, *consts)

        from ..ops.dedup import pad_to_bucket

        color_table = np.concatenate(all_colors)
        padded = pad_to_bucket(len(color_table), minimum=1 << 10)
        if padded != len(color_table):
            color_table = np.concatenate([
                color_table,
                np.zeros((padded - len(color_table), 4), np.uint8),
            ])
        rgb, depth = resolve_framebuffer(
            Framebuffer(depth=gdepth, point_id=gid),
            jnp.asarray(color_table), s.height, s.width,
        )
        for arr in (rgb, depth, visible):
            try:  # start the d2h copies now; render_finish may run a
                arr.copy_to_host_async()  # whole frame later (pipelined)
            except AttributeError:
                pass
        return {
            "rgb_dev": rgb,
            "depth_dev": depth if s.transfer_depth else None,
            "visible_dev": visible,
            "stats": {"cells": len(cells), "points_in": total_in},
        }

    def render_finish(self, handle):
        """Block on a frame dispatched by :meth:`render_start`."""
        stats = handle["stats"]
        stats["points_visible"] = int(handle["visible_dev"])
        depth = handle["depth_dev"]
        return (
            np.asarray(handle["rgb_dev"]),
            np.asarray(depth) if depth is not None else None,
            stats,
        )

    def render(self, streamer, camera: Camera, streaming_frustums=None,
               paused: bool = False):
        """Returns (rgb (H,W,3) u8, depth (H,W) f32 or None, stats)."""
        return self.render_finish(
            self.render_start(streamer, camera, streaming_frustums, paused)
        )

    def render_pipelined(self, streamer, camera: Camera,
                         streaming_frustums=None, paused: bool = False):
        """Double-buffered frames, same contract as the single-device
        renderer: dispatch this frame, return the PREVIOUS one (None on
        the first call)."""
        handle = self.render_start(
            streamer, camera, streaming_frustums, paused
        )
        prev = getattr(self, "_inflight_frame", None)
        self._inflight_frame = handle
        if prev is None:
            return None
        return self.render_finish(prev)

    def render_flush(self):
        prev = getattr(self, "_inflight_frame", None)
        self._inflight_frame = None
        if prev is None:
            return None
        return self.render_finish(prev)
