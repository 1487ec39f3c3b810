"""Frame orchestration: streamed cells -> culled splats -> image.

TPU-native re-design of the reference's draw loop (reference:
src/plugins/render/point.rs:117-218): visible cells are sorted by camera
distance and grouped into ilog2(distance) buckets (point.rs:128-143);
buckets render near-to-far, and each bucket's cull pass tests occlusion
against the depth produced by the nearer buckets — reproducing the
same-frame compute/render interleaving the reference gets from its GPU
submission order. Occlusion is skipped when streaming is paused, like
point.rs:140.

Everything per bucket is two fused XLA calls (cull_classify_pass +
rasterize_splats); the host only slices per-bucket arrays. The
camera-independent LOD walk (kernel.lod_select) is cached per
(bucket, loaded set), so a steady orbit never re-probes the hash table.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..core.metadata import Metadata
from .camera import Camera
from .kernel import MAX_HIERARCHIES, cull_classify_pass, lod_select
from .splat import (
    make_framebuffer,
    rasterize_splats,
    resolve_framebuffer,
)
from .streaming import CellStreamer


# overflow windows for splats wider than the configured footprint: the
# widest (65) renders half-extents up to 32.5 px exactly; only closer
# splats still clip (the remaining bounded divergence from the
# reference's unbounded billboard quads, render.wgsl:70-95). Rung
# spacing ~2x in half-extent keeps per-splat fragment waste under ~4x
# of the exact circle; a coarser ladder (5 -> 17 measured) blew frame
# fragment counts up 4-5x in coarse-LOD scenes where most splats sit
# in the 2.5-4.5 px band
LARGE_WINDOWS = (9, 17, 33, 65)

# sub-footprint rungs of the window ladder. Even rungs (floor-based
# placement, splat._make_fragments — supported and image-exact,
# tests/test_render_kernel.py test_even_windows_exact) halve the
# fragment cost of the next odd rung for splats that fit them (4 vs 9,
# 16 vs 25 fragments), but MEASURED SLOWER as defaults on the v5e orbit
# bench (2.5 vs 3.8 fps warm): two more classes per bucket cost more in
# dispatch/bookkeeping than the fragment rows they save, because the
# raster is not fragment-bound at these scales. Revisit on PCIe hosts
# where per-dispatch overhead is lower.
SMALL_WINDOWS = (1, 3, 5, 7)


def raster_bucket(n: int, minimum: int = 1 << 10) -> int:
    """Power-of-two raster buffer size.

    NEGATIVE RESULT (measured, do not retry blindly): a quarter-step
    ladder ({1, 1.25, 1.5, 1.75} * 2^k) cuts the mean rounding waste
    from ~1.44x to ~1.11x, but survivor counts swing 2-3x across an
    orbit and drift between orbits, so the finer boundaries kept
    minting NEW compiled shapes mid-flight (5-17 s each on TPU) —
    measured fps fell from 3.9 to 1.5-2.7 despite the cheaper steady
    state. Shape-vocabulary stability beats rounding waste when
    compiles are this expensive; pow2's 2x-wide steps keep the
    vocabulary at 1-2 shapes per (bucket, class) key.
    """
    size = minimum
    while size < n:
        size *= 2
    return size


@dataclass
class RenderSettings:
    width: int = 1280
    height: int = 720
    voronoi: bool = True  # render.wgsl fs_voronoi vs fs_no_voronoi
    size_by_distance: bool = False  # FrustumsSettings (cell/shader.rs:173-195)
    max_hierarchy: int = 0
    occlusion: bool = True
    # depth-pyramid pre-cull (kernel._cull_body, VERDICT r4 #3): an
    # extra provably-conservative occlusion gate — a splat whose nearest
    # possible fragment is behind the FARTHEST depth in a dilated coarse
    # max-depth tile containing its whole footprint cannot win any
    # pixel, so rejecting it leaves images BIT-IDENTICAL while its
    # k x k fragment expansion never reaches the scatter. Only applies
    # when ``occlusion`` is on (it reads the same inter-bucket depth).
    # A/B knob: bench.py --fps-ab depth_pyramid
    depth_pyramid: bool = True
    footprint: int = 5  # splat.py DEFAULT_FOOTPRINT rationale
    # per-hierarchy visibility toggles (debug plugin, src/plugins/debug.rs:344-371)
    hidden_hierarchies: set = field(default_factory=set)
    # transfer the f32 depth plane to the host with every frame. RGB-only
    # consumers (the PNG server, fps bench) turn this off: through a thin
    # accelerator link the depth plane costs more than the u8 RGB image
    transfer_depth: bool = True
    # compact cull survivors before rasterizing and split them into
    # footprint classes: the scatter-min pays per fragment row, and
    # (a) culled/padding rows cost the same as survivors, (b) sub-pixel
    # splats (the far majority in a deep store) can only ever light
    # their center pixel, so they raster image-identically with a 1x1
    # window instead of footprint^2 fragments. Buffers are sized from
    # the previous frame's per-class survivor counts (read back
    # asynchronously — no new device syncs); a frame right after a big
    # visibility jump may clip its newest splats, self-correcting next
    # frame
    compact_raster: bool = True
    # raster formulation: "sorted" ranks each bucket's fragment list
    # with one multi-key sort (pixel, depth, id) before the framebuffer
    # scatters; "scatter" is the per-class scatter-min cascade. Both are
    # image-identical (tests/test_render_kernel.py). "auto" = scatter:
    # measured on the v5e, sorted ran 1.16 fps vs scatter's 4.86 in the
    # bench orbit — the sort (one per bucket, 2^19-2^21 fragments) adds
    # ~10-15 ms/bucket while the scatters stay full-width because
    # winners are not compacted (a compaction pass would itself cost a
    # full-width scatter, see PERF.md "Sorted raster")
    raster_mode: str = "auto"
    # fuse the per-class survivor compactions into one index scatter per
    # bucket (splat.compact_classes + rasterize_class_slice) vs the
    # per-class compact_rows cascade. Both image-identical; A/B knob
    fused_compaction: bool = True
    # footprint-window ladder policy. "auto" (default): buckets whose
    # landed overflow counts are all zero raster ONCE at the footprint
    # (the ladder's per-rung dispatches cost more than their fragment
    # savings on a latency-bound link — 7.5 vs 4.9 fps measured,
    # PERF.md) and the overflow ladder (footprint + large rungs, no
    # sub-rungs) switches on per bucket the frame after an oversized
    # splat shows up in the cull pass's fit counts — large-splat
    # fidelity is kept with single-raster speed. True: always run the
    # full ladder (sub-footprint rungs included — the right choice when
    # the raster, not the link, is the bottleneck). False: never
    # (oversized splats render clipped).
    classing: object = "auto"
    # fuse each bucket's whole chain (cull + compact + footprint raster
    # + cond-gated overflow rungs) into ONE XLA program
    # (splat.render_bucket_pass). Through the bench link every
    # executable switch costs ~2.4-4.5 ms (PERF.md dispatch-cost
    # table), so the multi-dispatch frame paid >100 ms of dispatch
    # overhead alone; the megakernel brings a frame to ~(buckets + 1)
    # dispatches. Off: the multi-dispatch paths below (classing,
    # fused_compaction, raster_mode knobs all apply; they are also the
    # fallback when raster_mode="sorted")
    megakernel: bool = True
    # megakernel-only: route splats to SUB-footprint windows (1x1/3x3
    # for footprint 5) inside the same program — image-identical for
    # fitting splats (splat_pixel_radii docs) at a fraction of the
    # fragment rows. The multi-dispatch ladder paid one dispatch per
    # rung for this (net slower through a high-latency link, PERF.md
    # "even raster windows"); cond-gated rungs in one program keep the
    # savings without the dispatches
    sub_rungs: bool = True
    # sub_rungs-only: extend the sub-footprint ladder with the EVEN
    # windows too (1,2,3,4 for footprint 5 instead of 1,3) — a splat
    # with half-extent < k/2 rasters image-exactly through the even
    # k x k window at roughly half the next odd rung's fragments (4 vs
    # 9, 16 vs 25; splat._make_fragments floor placement). As separate
    # dispatches this measured SLOWER (SMALL_WINDOWS note above), but
    # under the chunked megakernel an extra rung is one more cond-gated
    # while_loop in the SAME program — fragment savings at zero
    # dispatch cost. MEASURED ON (v5e orbit A/B, PERF.md "dense window
    # ladders"): 7.17 vs 7.02 alone, +8.6% stacked with
    # even_overflow_rungs. A/B knob (bench.py --fps-ab even_sub_rungs)
    even_sub_rungs: bool = True
    # densify the OVERFLOW ladder with every integer window between the
    # footprint and the first large window (6/7/8 for footprint 5): a
    # splat with half-extent in the 2.5-4.5 px band rasters through
    # 36/49/64 fragments instead of 81 — the frame profile shows that
    # band carrying ~55% of all fragment rows in the bench orbit, so
    # the savings target the single largest scatter cost. Same
    # cond-gated-rung economics as even_sub_rungs. MEASURED ON (v5e
    # orbit A/B, PERF.md "dense window ladders"): 7.10 vs 6.86 alone,
    # +8.6% stacked with even_sub_rungs. A/B knob
    # (bench.py --fps-ab even_overflow_rungs)
    even_overflow_rungs: bool = True
    # megakernel-only: raster each window rung's survivors in fixed-size
    # chunks under a lax.while_loop (splat.rung_chunk_rows) instead of a
    # static per-rung row budget. Rows processed track the ACTUAL rung
    # occupancy (waste < one chunk vs the budget ladder's 1.3-2.6x pow2 /
    # coarse-ladder overshoot — scatter cost is per row processed,
    # PERF.md), and the compile key carries no budget tuple, so survivor
    # drift across an orbit never re-mints the megakernel executable.
    # Image-identical to the budget path (tests/test_render_kernel.py)
    chunked_raster: bool = True
    # fuse the WHOLE frame (every bucket's megakernel chain + the packed
    # resolve) into ONE XLA program: one dispatch + one readback per
    # frame (splat.render_frame_pass). Image-identical to the per-bucket
    # megakernel. Trade-off: the compile key concatenates every bucket's
    # shape + budget tuple, so any one bucket resizing re-mints the
    # whole-frame executable (5-17 s on TPU) where the per-bucket path
    # recompiles only the moved bucket — enable on steady scenes whose
    # shape vocabulary has settled; A/B before changing the default
    frame_fusion: bool = False


def hierarchy_tables(metadata: Metadata) -> tuple[np.ndarray, np.ndarray]:
    """(cell_size, spacing) per hierarchy, padded to MAX_HIERARCHIES
    (the GPU hierarchy buffer, src/plugins/metadata/shader.rs:7-73)."""
    sizes = np.zeros(MAX_HIERARCHIES, np.float32)
    spacings = np.zeros(MAX_HIERARCHIES, np.float32)
    for h in range(min(metadata.hierarchies, MAX_HIERARCHIES)):
        cs = metadata.config.cell_size(h)
        sizes[h] = cs
        spacings[h] = metadata.config.cell_spacing(cs)
    return sizes, spacings


class PointRenderer:
    """Renders one frame from a CellStreamer's loaded set."""

    def __init__(self, metadata: Metadata, settings: RenderSettings | None = None):
        self.metadata = metadata
        self.settings = settings or RenderSettings()

    def gather_points(self, streamer: CellStreamer, camera: Camera):
        """Concatenate loaded cells into flat arrays + per-cell buckets."""
        cells = []
        cam = camera.transform.translation
        for cell_id, cell in streamer.loaded.items():
            if cell_id.hierarchy in self.settings.hidden_hierarchies:
                continue  # Visibility component (camera.rs:96-105)
            pts = cell.all_points()
            if len(pts) == 0:
                continue
            delta = cell.pos - cam
            distance = float(np.linalg.norm(delta))
            # ilog2 bucket (point.rs:128-143); distance < 1 -> bucket 0
            bucket = max(int(distance).bit_length() - 1, 0)
            # the cell's content generation rides along so every device
            # cache keyed on bucket composition invalidates when the
            # in-app converter mutates a loaded cell in place
            cells.append(
                (bucket, distance, cell_id, pts, cell.generation)
            )
        cells.sort(key=lambda c: (c[0], c[1]))
        return cells

    def _bucket_device_arrays(self, bucket_cells):
        """Device-resident (positions, hierarchy, valid, colors, n_real)
        for one bucket of cells, padded to a pow2 row count.

        The reference uploads each cell's points to a GPU vertex buffer
        once when it loads (cell/shader.rs:23-132) and per frame only
        binds buffers; the XLA analogue caches the padded device arrays
        keyed by the bucket's cell-id tuple, so an orbiting camera costs
        zero host->device point traffic until the loaded set changes.
        """
        import jax.numpy as jnp

        from ..ops.dedup import pad_to_bucket

        key = tuple((c[2], c[4]) for c in bucket_cells)
        cache = getattr(self, "_bucket_cache", None)
        if cache is None:
            cache = self._bucket_cache = {}
        hit = cache.get(key)
        if hit is not None:
            return hit

        pos_chunks, hier_chunks, col_chunks = [], [], []
        for _, _, cell_id, pts, _ in bucket_cells:
            pos_chunks.append(pts.positions)
            col_chunks.append(pts.colors)
            hier_chunks.append(
                np.full(len(pts), cell_id.hierarchy, np.int32)
            )
        positions = np.concatenate(pos_chunks)
        colors = np.concatenate(col_chunks)
        point_hier = np.concatenate(hier_chunks)
        n_real = len(positions)
        # pad to pow2 buckets: per-frame point counts vary every frame
        # and each unique shape would recompile the kernels (~seconds
        # on TPU); the valid mask drops the padding
        n = pad_to_bucket(max(n_real, 1), minimum=1 << 12)
        if n != n_real:
            positions = np.concatenate(
                [positions, np.zeros((n - n_real, 3), np.float32)]
            )
            point_hier = np.concatenate(
                [point_hier, np.zeros(n - n_real, np.int32)]
            )
        valid = np.zeros(n, bool)
        valid[:n_real] = True

        entry = (
            jnp.asarray(positions),
            jnp.asarray(point_hier),
            jnp.asarray(valid),
            colors,
            n_real,
        )
        # bound stale buckets (old camera distances, despawned cells)
        if len(cache) > 64:
            cache.pop(next(iter(cache)))
        cache[key] = entry
        return entry

    # --- raster compaction sizing (previous-frame survivor counts) ---------
    #
    # Counts flow: the cull pass emits ONE (keep, cumulative-fits...)
    # vector per bucket; the vectors ride the packed frame transfer and
    # land as ints in ``_survivor_counts`` at render_finish
    # (_land_count_vecs). Sizing reads only landed ints, so an in-flight
    # pipelined frame never forces a sync.

    def _survivor_buffer_size(self, key, n: int, minimum: int = 1 << 10):
        """Sticky quarter-step compacted-raster size from the latest
        landed survivor count; None until the key has history.

        Sticky: frame-to-frame survivor counts jitter a few percent as
        the camera moves, and every NEW buffer size is a fresh raster
        compile (5-17 s on TPU) — quarter steps without hysteresis
        flapped across ladder boundaries mid-orbit and halved measured
        fps. The held size only changes when the count outgrows it
        (< 15% headroom left) or shrinks well below it (< half used)."""
        counts = getattr(self, "_survivor_counts", None)
        if counts is None or key not in counts:
            return None
        count = counts[key]
        sizes = getattr(self, "_buffer_sizes", None)
        if sizes is None:
            sizes = self._buffer_sizes = {}
        held = sizes.get(key)
        if held is not None and count * 1.15 <= held <= count * 2.6:
            return held
        held = raster_bucket(max(int(count * 1.3), 1), minimum)
        sizes[key] = held
        return held

    def _small_ladder(self) -> tuple:
        """Sub-footprint window rungs per settings: the odd
        SMALL_WINDOWS by default, every integer window below the
        footprint when ``even_sub_rungs`` is on."""
        s = self.settings
        if s.even_sub_rungs:
            return tuple(range(1, s.footprint))
        return tuple(k for k in SMALL_WINDOWS if k < s.footprint)

    def _overflow_ladder(self) -> tuple:
        """Overflow window rungs per settings: the doubling
        LARGE_WINDOWS by default; ``even_overflow_rungs`` fills in
        every integer window between the footprint and the first large
        window so the dominant 2.5-4.5 px half-extent band pays 36-64
        fragments instead of 81."""
        s = self.settings
        ks = []
        if s.even_overflow_rungs:
            ks += [
                k for k in range(s.footprint + 1, LARGE_WINDOWS[0])
            ]
        ks += [k for k in LARGE_WINDOWS if k > s.footprint]
        return tuple(k for k in ks if k > s.footprint)

    def _ladder_thresholds(self):
        """(rung list, device (W,) f32 half-extent thresholds) for the
        full window ladder — cached (one tiny upload per settings, not
        per bucket). The cull pass folds cumulative fit counts over
        these rungs into its output so the adaptive "auto" classing can
        watch overflow occupancy with zero extra dispatches."""
        import jax.numpy as jnp

        s = self.settings
        ks = list(self._small_ladder())
        ks.append(s.footprint)
        ks += list(self._overflow_ladder())
        cached = getattr(self, "_thresholds_cache", None)
        if cached is not None and cached[0] == ks:
            return cached[1], cached[2]
        dev = jnp.asarray([k / 2.0 for k in ks], jnp.float32)
        self._thresholds_cache = (ks, ks, dev)
        return ks, dev

    def render(self, streamer: CellStreamer, camera: Camera,
               streaming_frustums=None, paused: bool = False):
        """Returns (rgb (H,W,3) u8, depth (H,W) f32 or None, stats dict).

        ``depth`` is None unless ``settings.transfer_depth`` is set (the
        depth plane stays on device to keep the per-frame readback small).
        Synchronous: dispatch + block. For overlapped steady-state frame
        loops use :meth:`render_pipelined`.
        """
        return self.render_finish(
            self.render_start(streamer, camera, streaming_frustums, paused)
        )

    def render_start(self, streamer: CellStreamer, camera: Camera,
                     streaming_frustums=None, paused: bool = False) -> dict:
        """Dispatch a frame's full device chain without blocking; returns
        an opaque handle for :meth:`render_finish`."""
        s = self.settings
        view = camera.view_matrix()
        proj = camera.projection_matrix()
        cam_pos = camera.transform.translation

        sizes, spacings = hierarchy_tables(self.metadata)
        loaded_table = streamer.loaded_cells_table()
        # device membership structure: open-addressing hash table (pow2
        # size — stable shapes, no per-loaded-count recompiles); rebuilt
        # only when the loaded set changes
        from .kernel import build_loaded_cells_hash

        import jax.numpy as jnp

        table_key = loaded_table.tobytes()
        cached = getattr(self, "_hash_cache", None)
        if cached is None or cached[0] != table_key:
            # device-resident: re-uploading the table per frame would cost
            # a host->device transfer per bucket
            cached = (
                table_key,
                jnp.asarray(build_loaded_cells_hash(loaded_table)),
            )
            self._hash_cache = cached
        loaded_hash = cached[1]

        far_distances = np.zeros(MAX_HIERARCHIES, np.float32)
        if streaming_frustums is not None:
            fd = streamer.frustum_far_distances(
                streaming_frustums, camera.transform
            )
            far_distances[: len(fd)] = fd

        cells = self.gather_points(streamer, camera)
        framebuffer = make_framebuffer(s.height, s.width)
        all_colors = [np.zeros((1, 4), np.uint8)]
        id_base = 1
        total_in = 0
        # one (W+1,) counts vector per bucket (kernel counts_vec): the
        # frame's whole counts side-channel — concatenated into the
        # packed transfer, unpacked host-side at render_finish
        frame_vecs: list = []
        frame_bucket_keys: list = []

        # per-frame device scalars/tables, converted ONCE (a cProfile of
        # the steady orbit found ~43 jnp conversions per frame at
        # ~0.5 ms host time each because these sat inside the bucket
        # loop). The metadata tables are cached across frames.
        # key includes the hierarchy count: live in-app conversion grows
        # metadata.hierarchies IN PLACE on the same object, and a stale
        # table would give new levels spacing 0 (radius-0 splats never
        # raster) and cell size 0 (garbage LOD hash probes)
        const_key = (id(self.metadata), int(self.metadata.hierarchies))
        const_cache = getattr(self, "_const_cache", None)
        if const_cache is None or const_cache[0] != const_key:
            const_cache = self._const_cache = (
                const_key,
                jnp.asarray(sizes),
                jnp.asarray(spacings),
            )
        _, sizes_dev, spacings_dev = const_cache
        view_dev = jnp.asarray(view, jnp.float32)
        proj_dev = jnp.asarray(proj)
        cam_dev = jnp.asarray(cam_pos)
        fars_dev = jnp.asarray(far_distances)
        sbd_dev = jnp.bool_(s.size_by_distance)
        maxh_dev = jnp.int32(s.max_hierarchy)
        use_occ = s.occlusion and not paused
        use_pyr = use_occ and s.depth_pyramid
        ladder_ks, thresholds_dev = self._ladder_thresholds()

        # group consecutive same-bucket cells; near buckets raster first so
        # farther buckets' occlusion test sees their depth (point.rs:144-215)
        i = 0
        # whole-frame fusion (frame_fusion): collect every bucket's args
        # and dispatch ONE program after the loop instead of one per
        # bucket. Eligibility is settings-only, so a frame is either
        # fully fused or fully per-bucket
        fused_args: list = []
        fused_static: list = []

        while i < len(cells):
            bucket = cells[i][0]
            bucket_cells = []
            while i < len(cells) and cells[i][0] == bucket:
                bucket_cells.append(cells[i])
                i += 1
            pos_dev, hier_dev, valid_dev, colors, n_real = (
                self._bucket_device_arrays(bucket_cells)
            )
            n = pos_dev.shape[0]
            total_in += n_real

            depth_now = (
                framebuffer.depth.reshape(s.height, s.width)
                if use_occ
                else None
            )
            # the LOD walk (hash probes per hierarchy level) depends only
            # on (bucket points, loaded set) — not the camera — so its
            # result is cached per (bucket, loaded-set) and the steady
            # orbit frame runs only the camera half (cull_classify_pass);
            # one fused dispatch also ends the double view-transform the
            # separate classify_splats call paid
            bucket_key = tuple((c[2], c[4]) for c in bucket_cells)
            lod_cache = getattr(self, "_lod_cache", None)
            if lod_cache is None:
                lod_cache = self._lod_cache = {}
            lkey = (bucket_key, table_key)
            hier_base = lod_cache.get(lkey)
            if hier_base is None:
                hier_base = lod_select(
                    pos_dev,
                    hier_dev,
                    sizes_dev,
                    max(int(self.metadata.hierarchies), 1),
                    loaded_hash,
                )
                if len(lod_cache) > 64:
                    lod_cache.pop(next(iter(lod_cache)))
                lod_cache[lkey] = hier_base

            # the global point-id rows are device-cached per (bucket,
            # id_base): re-uploading them each frame cost up to
            # 4 B x bucket rows through the ~45 MB/s link — ~60 ms per
            # steady frame, the single largest host-side line in the
            # orbit cProfile
            ids_cache = getattr(self, "_ids_cache", None)
            if ids_cache is None:
                ids_cache = self._ids_cache = {}
            ikey = (bucket_key, id_base)
            ids_dev = ids_cache.get(ikey)
            if ids_dev is None:
                point_ids = np.zeros(n, np.int32)
                point_ids[:n_real] = np.arange(
                    id_base, id_base + n_real, dtype=np.int32
                )
                ids_dev = jnp.asarray(point_ids)
                if len(ids_cache) > 64:
                    ids_cache.pop(next(iter(ids_cache)))
                ids_cache[ikey] = ids_dev

            use_mega = (
                s.megakernel
                and s.compact_raster
                and s.footprint > 1
                and s.raster_mode != "sorted"
            )
            if use_mega:
                from .splat import render_bucket_pass

                mega_rungs = self._overflow_ladder()
                mega_subs = self._small_ladder() if s.sub_rungs else ()
                if s.chunked_raster:
                    # chunked rungs size themselves (fixed chunks,
                    # dynamic trip counts): no budget tuple, no sticky
                    # buffer bookkeeping, one executable per bucket shape
                    static_cfg = (0, (), mega_rungs, (), mega_subs)
                    if s.frame_fusion:
                        fused_args.append(
                            (pos_dev, hier_base, valid_dev, ids_dev)
                        )
                        fused_static.append(static_cfg)
                        counts_vec = None
                    else:
                        framebuffer, counts_vec = render_bucket_pass(
                            framebuffer, pos_dev, hier_base, valid_dev,
                            ids_dev, view_dev, proj_dev, cam_dev,
                            spacings_dev, fars_dev, sbd_dev, maxh_dev,
                            depth=depth_now,
                            height=s.height, width=s.width,
                            footprint=s.footprint, voronoi=s.voronoi,
                            use_occlusion=use_occ,
                            use_pyramid=use_pyr,
                            out_size=0, overflow_rows=(),
                            overflow_ks=mega_rungs,
                            sub_rows=(), sub_ks=mega_subs,
                            chunked=True,
                        )
                    frame_vecs.append(
                        (bucket, mega_subs + (s.footprint,) + mega_rungs,
                         counts_vec, "excl")
                    )
                    all_colors.append(colors)
                    frame_bucket_keys.append(bucket_key)
                    id_base += n_real
                    continue

                # with sub rungs active the footprint raster carries
                # only its exclusive band (+ transient spill), so it
                # sizes from its own landed count; without them it
                # carries every small splat = the kept total
                held = self._survivor_buffer_size(
                    (bucket, s.footprint if mega_subs else "a"), n
                )

                def rung_budget(k, ladder=(64, 1024, 16384, 65536)):
                    # per-rung sticky budget snapped to a COARSE ladder:
                    # fine steps would re-key the megakernel compile on
                    # a drifting tuple (PERF.md trap #1 of the
                    # compaction rework)
                    held_k = self._survivor_buffer_size(
                        (bucket, k), n, minimum=ladder[0]
                    )
                    v = min(held_k or ladder[0], n)
                    for c in ladder:
                        if v <= c:
                            return min(c, n)
                    return n

                static_cfg = (
                    min(held, n) if held else n,
                    tuple(rung_budget(k) for k in mega_rungs),
                    mega_rungs,
                    # sub rungs carry the bulk of a deep store's splats:
                    # a coarser, larger ladder than the (rare) overflow
                    # windows
                    tuple(
                        rung_budget(k, ladder=(1024, 16384, 65536))
                        for k in mega_subs
                    ),
                    mega_subs,
                )
                if s.frame_fusion:
                    fused_args.append(
                        (pos_dev, hier_base, valid_dev, ids_dev)
                    )
                    fused_static.append(static_cfg)
                    counts_vec = None  # produced by the fused program
                else:
                    framebuffer, counts_vec = render_bucket_pass(
                        framebuffer, pos_dev, hier_base, valid_dev,
                        ids_dev, view_dev, proj_dev, cam_dev,
                        spacings_dev, fars_dev, sbd_dev, maxh_dev,
                        depth=depth_now,
                        height=s.height, width=s.width,
                        footprint=s.footprint, voronoi=s.voronoi,
                        use_occlusion=use_occ,
                        use_pyramid=use_pyr,
                        out_size=static_cfg[0],
                        overflow_rows=static_cfg[1],
                        overflow_ks=static_cfg[2],
                        sub_rows=static_cfg[3],
                        sub_ks=static_cfg[4],
                    )
                frame_vecs.append(
                    (bucket, mega_subs + (s.footprint,) + mega_rungs,
                     counts_vec, "excl")
                )
                all_colors.append(colors)
                frame_bucket_keys.append(bucket_key)
                id_base += n_real
                continue

            (keep, hierarchy, ndc, view_pos, radius, rmax,
             counts_vec) = cull_classify_pass(
                pos_dev,
                hier_base,
                valid_dev,
                view_dev,
                proj_dev,
                cam_dev,
                spacings_dev,
                fars_dev,
                sbd_dev,
                maxh_dev,
                thresholds_dev,
                s.width,
                s.height,
                depth=depth_now,
                use_occlusion=use_occ,
                use_pyramid=use_pyr,
            )
            frame_vecs.append(
                (bucket, tuple(ladder_ks), counts_vec, "cum")
            )

            def raster_subset(fb, mask, out_size, footprint):
                row_args = (view_pos, ndc, radius, ids_dev)
                valid = mask
                if out_size is not None and out_size < n:
                    from .splat import compact_rows

                    *row_args, valid = compact_rows(
                        mask, *row_args, out_size
                    )
                return rasterize_splats(
                    fb, *row_args, valid, proj_dev,
                    height=s.height, width=s.width,
                    footprint=footprint, voronoi=s.voronoi,
                )

            # footprint classing: a k x k raster window is image-exact
            # for splats with pixel half-extent < k/2 (every excluded
            # fragment fails the inside-circle test, splat_pixel_radii
            # docs), so survivors route to the smallest exact window —
            # LOD keeps most radii near 1-3 px, so at footprint >= 7 the
            # bulk renders through the 25-fragment window instead of
            # footprint^2. First sight of a bucket has no survivor
            # history: raster everything through the full-footprint path
            # (also identical) and start the counters.
            #
            # classing="auto" (default): the ladder is per-dispatch
            # overhead the tunnel-bound frame cannot afford when nothing
            # needs it (measured 7.5 vs 4.9 fps, PERF.md) — buckets
            # whose landed overflow counts are all zero raster once at
            # the footprint, and the ladder (footprint + overflow rungs
            # only) switches on per bucket the frame after an oversized
            # splat appears in the cull pass's fit counts.
            landed = getattr(self, "_survivor_counts", None) or {}
            overflow_ks = list(self._overflow_ladder())
            auto_mode = s.classing == "auto"
            if auto_mode:
                ladder_on = any(
                    (landed.get((bucket, k)) or 0) > 0 for k in overflow_ks
                )
                use_classes = (
                    s.compact_raster and s.footprint > 1 and ladder_on
                )
            else:
                use_classes = (
                    s.compact_raster and s.footprint > 1 and bool(s.classing)
                )
            if use_classes:
                if auto_mode:
                    windows = [s.footprint]
                else:
                    windows = list(self._small_ladder())
                    windows.append(s.footprint)
                # large-splat overflow ladder: near-camera splats whose
                # half-extent exceeds footprint/2 route to wider windows
                # instead of rendering as clipped squares (the round-2
                # divergence from render.wgsl:70-95 billboard semantics).
                # The last window takes every remaining splat, so only
                # half-extents beyond LARGE_WINDOWS[-1]/2 px still clip.
                windows += list(self._overflow_ladder())
                masks = []
                covered = None
                for k in windows:
                    if k == windows[-1]:
                        m = keep if covered is None else (
                            keep & jnp.logical_not(covered)
                        )
                    else:
                        fits = rmax < jnp.float32(k / 2.0)
                        m = keep & fits if covered is None else (
                            keep & fits & jnp.logical_not(covered)
                        )
                        covered = fits if covered is None else (
                            covered | fits
                        )
                    masks.append((k, m))
                def class_key(k):
                    # the auto ladder's footprint rung carries ALL
                    # small splats (cumulative fits mask), so it sizes
                    # and skips from the bucket's total-survivor count;
                    # every other rung uses its exclusive landed count
                    if auto_mode and k == s.footprint:
                        return (bucket, "a")
                    return (bucket, k)

                outs = [
                    self._survivor_buffer_size(
                        class_key(k), n,
                        # wide windows are rare (a handful of splats fill
                        # the screen): tiny buffers keep their fragment
                        # cost bounded at 4 * k^2
                        minimum=4 if k > s.footprint else 1 << 10,
                    )
                    for k, _ in masks
                ]
                # a window whose landed survivor count is 0 skips its
                # raster dispatch entirely (large windows: nothing is
                # that close, the common case; small rungs: far buckets
                # whose splats all land in one class). Counts land every
                # frame from the cull pass's counts_vec, so a class
                # re-enables the frame after a splat grows into it —
                # same one-frame self-correction contract as the
                # buffer-size headroom
                def class_skipped(k):
                    return landed.get(class_key(k)) == 0

                if all(o is not None for o in outs):
                    if s.raster_mode == "sorted":
                        # sorted raster (ROADMAP #8): every class's
                        # fragments join one list, one fragment sort per
                        # bucket ranks them by (pixel, depth, id), and
                        # the framebuffer scatters touch one fragment
                        # per covered pixel instead of every fragment
                        from ..ops.dedup import pad_to_bucket
                        from .splat import (
                            _NO_ID,
                            emit_fragments,
                            sorted_raster_merge,
                        )

                        parts = [
                            emit_fragments(
                                m, view_pos, ndc, radius, ids_dev,
                                proj_dev, s.height, s.width, k,
                                s.voronoi, out_k,
                            )
                            for (k, m), out_k in zip(masks, outs)
                            if not class_skipped(k)
                        ]
                        if not parts:
                            # every class skipped (all splats culled
                            # last frame): nothing to raster
                            all_colors.append(colors)
                            frame_bucket_keys.append(bucket_key)
                            id_base += n_real
                            continue
                        pix = jnp.concatenate([p[0] for p in parts])
                        dep = jnp.concatenate([p[1] for p in parts])
                        fid = jnp.concatenate([p[2] for p in parts])
                        f = pix.shape[0]
                        f_pad = pad_to_bucket(f, minimum=1 << 10)
                        if f_pad != f:
                            pad = f_pad - f
                            pix = jnp.concatenate(
                                [pix, jnp.full(pad, _NO_ID, jnp.int32)]
                            )
                            dep = jnp.concatenate(
                                [dep, jnp.zeros(pad, jnp.float32)]
                            )
                            fid = jnp.concatenate(
                                [fid, jnp.zeros(pad, jnp.int32)]
                            )
                        framebuffer = sorted_raster_merge(
                            framebuffer, pix, dep, fid
                        )
                    elif not s.fused_compaction:
                        # per-class compact+raster cascade (the A/B
                        # reference for the fused path below)
                        for (k, m), out_k in zip(masks, outs):
                            if class_skipped(k):
                                continue
                            framebuffer = raster_subset(
                                framebuffer, m, out_k, k
                            )
                    else:
                        # one fused compaction for ALL classes: the index
                        # scatter (the expensive primitive, ~7.5 ns/row)
                        # runs once over the bucket instead of once per
                        # class. Class regions live at DEVICE-side
                        # offsets (compact_classes docstring: static
                        # per-class region sizes keyed a compile on the
                        # whole size tuple and any one class resizing
                        # re-minted it — measured 0.37 fps); each class
                        # rasters a dynamic_slice of the staging buffers.
                        # Survivor counts fall out of the same pass.
                        from .splat import (
                            compact_classes,
                            rasterize_class_slice,
                        )

                        m_stack = jnp.stack([m for _, m in masks])
                        perm_c, counts_c, offs_c = compact_classes(m_stack)
                        for ci, ((k, m), out_k) in enumerate(
                            zip(masks, outs)
                        ):
                            if class_skipped(k):
                                continue
                            if out_k >= n:
                                # budget >= the bucket: compaction buys
                                # nothing, raster the uncompacted rows
                                # (image-identical; old-path contract)
                                framebuffer = rasterize_splats(
                                    framebuffer, view_pos, ndc, radius,
                                    ids_dev, m, proj_dev,
                                    height=s.height, width=s.width,
                                    footprint=k, voronoi=s.voronoi,
                                )
                                continue
                            framebuffer = rasterize_class_slice(
                                framebuffer, view_pos, ndc, radius,
                                ids_dev, perm_c, offs_c[ci], counts_c[ci],
                                proj_dev, height=s.height, width=s.width,
                                footprint=k, voronoi=s.voronoi,
                                out_size=out_k,
                            )
                else:
                    framebuffer = raster_subset(
                        framebuffer, keep, None, s.footprint
                    )
            else:
                out_all = (
                    self._survivor_buffer_size((bucket, "a"), n)
                    if s.compact_raster else None
                )
                framebuffer = raster_subset(
                    framebuffer, keep, out_all, s.footprint
                )
            all_colors.append(colors)
            frame_bucket_keys.append(bucket_key)
            id_base += n_real

        # pad to pow2: the table length is total-points+1, different every
        # frame — unpadded it recompiles resolve_framebuffer per frame
        # (VERDICT round 1, weak #5); ids only index the real prefix.
        # The padded table is device-cached per frame cell composition:
        # rebuilding + re-uploading ~4 B x points each frame cost a
        # second multi-MB transfer per steady frame (orbit cProfile)
        from ..ops.dedup import pad_to_bucket

        ckey = tuple(frame_bucket_keys)
        color_cache = getattr(self, "_color_cache", None)
        if color_cache is None:
            color_cache = self._color_cache = {}
        color_dev = color_cache.get(ckey)
        if color_dev is None:
            color_table = np.concatenate(all_colors)
            padded = pad_to_bucket(len(color_table), minimum=1 << 10)
            if padded != len(color_table):
                color_table = np.concatenate(
                    [color_table,
                     np.zeros((padded - len(color_table), 4), np.uint8)]
                )
            color_dev = jnp.asarray(color_table)
            if len(color_cache) > 16:
                color_cache.pop(next(iter(color_cache)))
            color_cache[ckey] = color_dev
        # one packed device->host transfer for the image + the per-bucket
        # counts vectors (+ depth when requested): each separate
        # np.asarray costs a link round trip (PERF.md)
        from .splat import PACK_COUNTS, pack_frame

        vec_meta = [
            (b, ks, len(ks) + 1, kind) for b, ks, _, kind in frame_vecs
        ]
        total_counts = sum(m[2] for m in vec_meta)
        stats = {"cells": len(cells), "points_in": total_in}
        if fused_args and total_counts > PACK_COUNTS:
            # the packed counts tail can't carry this frame's vectors:
            # fall back to per-bucket dispatches for the collected
            # buckets (identical chain, one program each) and take the
            # synchronous path below
            from .splat import render_bucket_pass as _bucket_pass

            for bi, (args, cfg) in enumerate(zip(fused_args, fused_static)):
                depth_now = (
                    framebuffer.depth.reshape(s.height, s.width)
                    if use_occ else None
                )
                framebuffer, counts_vec = _bucket_pass(
                    framebuffer, *args, view_dev, proj_dev, cam_dev,
                    spacings_dev, fars_dev, sbd_dev, maxh_dev,
                    depth=depth_now, height=s.height, width=s.width,
                    footprint=s.footprint, voronoi=s.voronoi,
                    use_occlusion=use_occ, use_pyramid=use_pyr,
                    out_size=cfg[0],
                    overflow_rows=cfg[1], overflow_ks=cfg[2],
                    sub_rows=cfg[3], sub_ks=cfg[4],
                    chunked=s.chunked_raster,
                )
                b, ks, _, kind = frame_vecs[bi]
                frame_vecs[bi] = (b, ks, counts_vec, kind)
            fused_args = []
        if total_counts <= PACK_COUNTS:
            if fused_args:
                from .splat import render_frame_pass

                packed = render_frame_pass(
                    tuple(fused_args), view_dev, proj_dev, cam_dev,
                    spacings_dev, fars_dev, sbd_dev, maxh_dev, color_dev,
                    height=s.height, width=s.width,
                    footprint=s.footprint, voronoi=s.voronoi,
                    use_occlusion=use_occ,
                    use_pyramid=use_pyr,
                    bucket_static=tuple(fused_static),
                    with_depth=s.transfer_depth,
                    chunked=s.chunked_raster,
                )
            else:
                packed = pack_frame(
                    framebuffer,
                    color_dev,
                    (jnp.concatenate([v for _, _, v, _ in frame_vecs])
                     if frame_vecs else jnp.zeros(1, jnp.int32)),
                    s.height,
                    s.width,
                    with_depth=s.transfer_depth,
                )
            try:  # start the d2h copy now: render_finish may run a whole
                packed.copy_to_host_async()  # frame later (pipelined mode)
            except AttributeError:
                pass
            return {
                "packed": packed,
                "vec_meta": vec_meta,
                "stats": stats,
                "height": s.height,
                "width": s.width,
                "with_depth": s.transfer_depth,
            }
        # fallback (more buckets than pack count slots): resolve and read
        # back synchronously
        rgb, depth = resolve_framebuffer(
            framebuffer, color_dev, s.height, s.width
        )
        if frame_vecs:
            flat = np.asarray(
                jnp.concatenate([v for _, _, v, _ in frame_vecs])
            )
            stats["points_visible"] = self._land_count_vecs(vec_meta, flat)
        else:
            stats["points_visible"] = 0
        return {
            "rgb": np.asarray(rgb),
            "depth": np.asarray(depth) if s.transfer_depth else None,
            "stats": stats,
        }

    def _land_count_vecs(self, vec_meta, flat) -> int:
        """Land a frame's concatenated counts vectors into the
        ``_survivor_counts`` table; returns the frame's visible total.

        Every per-window number is derived HOST-side here, from one
        counts vector per bucket — deriving them as individual device
        scalars cost ~6 extra ~0.5 ms dispatches per bucket per frame
        (PERF.md dispatch-cost table). Vector kinds: "cum" =
        (keep, cumulative fits per rung) from cull_classify_pass;
        "excl" = (keep, exclusive rung counts) from render_bucket_pass.
        Stored entries: (bucket, "a") = kept total; (bucket, k) = the
        k-rung's exclusive count, with the ladder's last window as the
        catch-all remainder.
        """
        counts = getattr(self, "_survivor_counts", None)
        if counts is None:
            counts = self._survivor_counts = {}
        visible = 0
        pos = 0
        for bucket, ks, length, kind in vec_meta:
            vals = flat[pos : pos + length]
            pos += length
            keep_total = int(vals[0])
            visible += keep_total
            counts[(bucket, "a")] = keep_total
            if kind == "excl":
                for i, k in enumerate(ks):
                    counts[(bucket, k)] = int(vals[1 + i])
                continue
            prev = 0
            for i, k in enumerate(ks):
                cum = int(vals[1 + i])
                if k == ks[-1]:
                    counts[(bucket, k)] = keep_total - prev
                else:
                    counts[(bucket, k)] = cum - prev
                prev = cum
        return visible

    def render_finish(self, handle: dict):
        """Block on a frame started by :meth:`render_start`; returns
        (rgb, depth, stats) and lands the frame's survivor counts."""
        if "rgb" in handle:
            return handle["rgb"], handle["depth"], handle["stats"]
        from .splat import PACK_COUNTS

        height, width = handle["height"], handle["width"]
        stats = handle["stats"]
        buf = np.asarray(handle["packed"])
        hw3 = height * width * 3
        rgb = buf[:hw3].reshape(height, width, 3)
        cvals = np.frombuffer(
            bytes(buf[hw3 : hw3 + 4 * PACK_COUNTS]), np.int32
        )
        stats["points_visible"] = self._land_count_vecs(
            handle["vec_meta"], cvals
        )
        depth = None
        if handle["with_depth"]:
            off = hw3 + 4 * PACK_COUNTS
            depth = np.frombuffer(
                bytes(buf[off:]), np.float32
            ).reshape(height, width)
        return rgb, depth, stats

    def render_pipelined(self, streamer: CellStreamer, camera: Camera,
                         streaming_frustums=None, paused: bool = False):
        """Double-buffered frame pipeline: dispatch this frame's device
        work, return the PREVIOUS frame's completed image (None for the
        very first call). Through a high-latency link this overlaps the
        ~50 ms image readback and the host-side decode with the next
        frame's device chain — the classic one-frame-latency render
        pipeline (the reference's AutoVsync swapchain has the same
        latency structure, src/plugins/wgpu.rs:107).

        Call :meth:`render_flush` to drain the last in-flight frame.
        """
        handle = self.render_start(
            streamer, camera, streaming_frustums, paused
        )
        prev = getattr(self, "_inflight_frame", None)
        self._inflight_frame = handle
        if prev is None:
            return None
        return self.render_finish(prev)

    def render_flush(self):
        """Finish the in-flight pipelined frame (None if none)."""
        prev = getattr(self, "_inflight_frame", None)
        self._inflight_frame = None
        if prev is None:
            return None
        return self.render_finish(prev)
