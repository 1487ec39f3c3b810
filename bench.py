#!/usr/bin/env python
"""End-to-end conversion benchmark (the BASELINE.json headline metric).

Headline: sustained points/sec through the full conversion pipeline —
synthetic LiDAR-like cloud -> hex-dedup cascade -> on-disk cell store
(metadata.json + h_n/c_*.bin) — the workload the reference's
`point_converter` CLI runs single-threaded on CPU (reference:
point-converter/src/lib.rs:11-60). Uses the fastest backend for this
environment: the C++ engine (convert/native.py), whose stores are
byte-identical to every other backend (tests/test_native_engine.py).
Why not the TPU path here: this environment reaches its chip through a
~45 MB/s tunnel, which caps any device-backed conversion at ~2 Mpts/s
for 12 B/point uploads alone (PERF.md "tunnel caveat"); on a co-located
TPU host the device pipeline (convert/pipelined.py) is the headline
path and rides the same driver loop.

The TPU kernels are reported alongside (same JSON line, `extra`):
- device_dedup_sort_mpts: the fused hex-dedup sort pass executing on the
  chip, steady state, no host transfer in the timed region,
- render_cull_lod_mpts: the fused cull+LOD frame kernel on the chip
  (BASELINE config 4's hot loop),
- tunnel_pipeline_mpts: the device-backed end-to-end converter through
  the tunnel (what BENCH_r01 measured), for round-over-round tracking.

Baseline: the reference publishes no numbers (see BASELINE.md); the
BASELINE.json north star is 100 Mpts/s on a v5e-8, i.e. 12.5 Mpts/s per
chip. vs_baseline reports the per-chip share achieved against that
target.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

N_POINTS = 2 << 20  # 2 Mi points
BATCH = 1 << 18
KERNEL_ROWS = 1 << 20
TARGET_PER_CHIP = 12.5e6  # BASELINE.json: 100 Mpts/s on 8 chips

_T0 = time.monotonic()


def _bc(msg: str) -> None:
    """Per-extra stderr breadcrumb (VERDICT r4 #1c): each device extra
    narrates its progress (imports / data staged / compiled / rep N) so
    a timeout is attributable post-mortem — the parent captures the
    child's stderr and folds the LAST breadcrumb into the error string."""
    print(f"[bc +{time.monotonic() - _T0:.0f}s] {msg}",
          file=sys.stderr, flush=True)


def synth_cloud(n: int, seed: int = 0) -> np.ndarray:
    """LiDAR-like mix: a ground plane sheet + building clusters + scatter."""
    rng = np.random.default_rng(seed)
    n_ground = n // 2
    n_clusters = n // 4
    n_scatter = n - n_ground - n_clusters

    ground = np.empty((n_ground, 3), np.float32)
    ground[:, :2] = rng.uniform(-400, 400, (n_ground, 2))
    ground[:, 2] = rng.normal(0.0, 0.3, n_ground)

    centers = rng.uniform(-350, 350, (64, 3)).astype(np.float32)
    centers[:, 2] = rng.uniform(5, 40, 64)
    which = rng.integers(0, 64, n_clusters)
    clusters = centers[which] + rng.normal(0, 8.0, (n_clusters, 3))

    scatter = rng.uniform(-500, 500, (n_scatter, 3))
    return np.concatenate(
        [ground, clusters.astype(np.float32), scatter.astype(np.float32)]
    ).astype(np.float32)


def synth_indoor(n: int, seed: int = 2) -> np.ndarray:
    """Indoor-scan-like cloud (BASELINE config 2): a 50x20x3 m building —
    floor/ceiling sheets, four walls, and furniture-scale clutter
    clusters. Dense, highly-collideable: the hierarchy build's worst
    case for dedup + overflow cascades."""
    rng = np.random.default_rng(seed)
    n_sheets = n // 3
    n_walls = n // 3
    n_clutter = n - n_sheets - n_walls

    sheets = np.empty((n_sheets, 3), np.float32)
    sheets[:, 0] = rng.uniform(0, 50, n_sheets)
    sheets[:, 1] = rng.uniform(0, 20, n_sheets)
    sheets[:, 2] = np.where(
        rng.random(n_sheets) < 0.5, 0.0, 3.0
    ) + rng.normal(0, 0.01, n_sheets)

    walls = np.empty((n_walls, 3), np.float32)
    side = rng.integers(0, 4, n_walls)
    walls[:, 0] = np.where(
        side < 2, side * 50.0, rng.uniform(0, 50, n_walls)
    ) + rng.normal(0, 0.01, n_walls)
    walls[:, 1] = np.where(
        side < 2, rng.uniform(0, 20, n_walls), (side - 2) * 20.0
    ) + rng.normal(0, 0.01, n_walls)
    walls[:, 2] = rng.uniform(0, 3, n_walls)

    centers = rng.uniform([2, 2, 0], [48, 18, 1.5], (200, 3))
    which = rng.integers(0, 200, n_clutter)
    clutter = centers[which] + rng.normal(0, 0.4, (n_clutter, 3))
    return np.concatenate(
        [sheets, walls, clutter.astype(np.float32)]
    ).astype(np.float32)


def bench_hierarchy_build() -> float:
    """BASELINE config 2: wall-time (seconds) for the full hierarchy
    build — batch AABB fits + hex quantization + dedup cascade + store
    write — over a 10M-pt indoor scan, C++ engine, median of 3 (the
    shared vCPU swings single runs 2x; PERF.md). Host metric: needs no
    accelerator."""
    n = 10_000_000
    positions = synth_indoor(n)
    rng = np.random.default_rng(5)
    colors = rng.integers(0, 256, (n, 4), dtype=np.uint8)
    colors[:, 3] = 255

    from point_cloud_tpu.convert.native import NativeConverter

    return statistics.median(
        _convert_once(NativeConverter, positions, colors, n)
        for _ in range(3)
    )


def bench_incremental_merge() -> float:
    """BASELINE config 3 (streaming merge): Mpts/s merging a second
    2 Mi-point cloud into an EXISTING converted store — every batch
    dedups against on-disk cell occupancy through the engine's lazy
    cell loads (the reference's resume path, point-converter/src/
    lib.rs:86-101). Host metric: needs no accelerator."""
    from point_cloud_tpu.convert.converter import load_metadata
    from point_cloud_tpu.convert.native import NativeConverter
    from point_cloud_tpu.core.metadata import Metadata
    from point_cloud_tpu.core.point import PointBatch

    rng = np.random.default_rng(9)
    base = synth_cloud(N_POINTS, seed=3)
    extra = synth_cloud(N_POINTS, seed=4)
    col_a = rng.integers(0, 256, (N_POINTS, 4), dtype=np.uint8)
    col_b = rng.integers(0, 256, (N_POINTS, 4), dtype=np.uint8)

    out_dir = tempfile.mkdtemp(prefix="pct_bench_merge_")
    try:
        with NativeConverter(Metadata(), out_dir) as conv:
            for i in range(0, N_POINTS, BATCH):
                conv.add_points_batch(
                    PointBatch(base[i : i + BATCH], col_a[i : i + BATCH])
                )
        t0 = time.perf_counter()
        metadata = load_metadata(Path(out_dir))
        with NativeConverter(metadata, out_dir) as conv:
            for i in range(0, N_POINTS, BATCH):
                conv.add_points_batch(
                    PointBatch(extra[i : i + BATCH], col_b[i : i + BATCH])
                )
        elapsed = time.perf_counter() - t0
        assert conv.metadata.number_of_points == 2 * N_POINTS
        return N_POINTS / elapsed / 1e6
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def _convert_once(converter_cls, positions, colors, n_points) -> float:
    from point_cloud_tpu.core.metadata import Metadata
    from point_cloud_tpu.core.point import PointBatch

    out_dir = tempfile.mkdtemp(prefix="pct_bench_")
    try:
        t0 = time.perf_counter()
        with converter_cls(Metadata(), out_dir) as conv:
            # same read-ahead the convert_from_paths driver runs: batch
            # k+1's device dispatch overlaps batch k's host/native merge
            can_prefetch = hasattr(conv, "prefetch")
            pending = None
            for i in range(0, n_points, BATCH):
                batch = PointBatch(
                    positions[i : i + BATCH], colors[i : i + BATCH]
                )
                if can_prefetch:
                    conv.prefetch(batch)
                    if pending is not None:
                        conv.add_points_batch(pending)
                    pending = batch
                else:
                    conv.add_points_batch(batch)
            if pending is not None:
                conv.add_points_batch(pending)
        elapsed = time.perf_counter() - t0
        assert conv.metadata.number_of_points == n_points
        return elapsed
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def bench_mesh_dedup(positions) -> float:
    """Steady-state Mpts/s of the owner-sharded mesh cascade
    (parallel/owner_cascade.py: stage-A local dedup -> all_to_all ->
    stage-B owner merge) on a 1-device mesh through shard_map — the
    sharded conversion path's round-over-round regression tracker on
    single-chip hardware (VERDICT r3 #6). Device-resident inputs;
    the timed region syncs via a scalar readback (tunnel acks
    block_until_ready at enqueue, PERF.md)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from point_cloud_tpu.ops import dedup as dedup_mod
    from point_cloud_tpu.parallel.owner_cascade import OwnerShardedPass

    n = KERNEL_ROWS
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("data",))
    opass = OwnerShardedPass(mesh)
    n_pad = dedup_mod.pad_to_bucket(n, minimum=1024 * opass.n)
    if n_pad % opass.n:
        n_pad += opass.n - (n_pad % opass.n)
    capacity = opass._capacity_for(n_pad // opass.n)
    pos_pad = np.zeros((n_pad, 3), np.float32)
    pos_pad[:n] = positions[:n]
    valid = np.zeros(n_pad, bool)
    valid[:n] = True
    pos_dev = jax.device_put(
        pos_pad, NamedSharding(mesh, P("data", None))
    )
    valid_dev = jax.device_put(valid, NamedSharding(mesh, P("data")))
    args = (
        pos_dev, valid_dev, jnp.float32(1000.0),
        jnp.float32(1000.0 / 96.0 / 2.0),
    )
    fn = opass._get_fn(n_pad, capacity)
    _bc("data sharded on the mesh; compiling the owner cascade")
    a, b = fn(*args)
    float(jnp.int32(0) + jnp.sum(a) + jnp.sum(b))  # compile + warm
    _bc("compiled+warm; timing")
    reps = 5
    t0 = time.perf_counter()
    acc = jnp.int32(0)
    for _ in range(reps):
        a, b = fn(*args)
        acc = acc + jnp.sum(a) + jnp.sum(b)
    float(acc)
    dt = (time.perf_counter() - t0) / reps
    return n / dt / 1e6


def bench_device_sort(positions) -> float:
    """Steady-state Mpts/s of the fused dedup pass on the accelerator
    (arrays device-resident; the timed region holds no host transfer)."""
    import jax
    import jax.numpy as jnp

    from point_cloud_tpu.ops.dedup import dedup_pass_light

    n = KERNEL_ROWS
    pos = jnp.asarray(positions[:n])
    valid = jnp.ones(n, bool)
    cs = jnp.float32(1000.0)
    radius = jnp.float32(1000.0 / 96.0 / 2.0)

    # NOTE: through the tunnel, block_until_ready acks at enqueue — only a
    # device-to-host readback truly synchronizes (PERF.md). A 4-byte scalar
    # reduce forces each run's completion while amortizing the ~30 ms RPC
    # latency over all reps.
    _bc("data on device; compiling dedup_pass_light")
    out = dedup_pass_light(pos, valid, cs, radius)  # compile + warm
    float(jnp.int32(0) + jnp.sum(out))  # also compiles the probe reduces
    _bc("compiled+warm; timing")
    reps = 5
    t0 = time.perf_counter()
    acc = jnp.int32(0)
    for _ in range(reps):
        acc = acc + jnp.sum(dedup_pass_light(pos, valid, cs, radius))
    float(acc)
    dt = (time.perf_counter() - t0) / reps
    return n / dt / 1e6


def bench_device_cascade(positions) -> float:
    """Full multi-level conversion cascade, device-resident, ONE XLA
    program (VERDICT r4 #2: the honest per-chip proxy for the ≥100
    Mpts/s v5e-8 north star — measures the complete device compute of
    `/root/reference/point-converter/src/converter.rs:114-139`, not one
    level).

    A `lax.while_loop` carries (positions, valid, cell_size) across
    hierarchy levels entirely on-chip: each iteration runs the dedup
    sort (hex keys -> hashes -> 4-column pallas sort), marks per-slot
    winners (the argmin), partitions losers onward by applying the sort
    permutation and masking winners out (the winner partition), and
    re-keys the survivors at the halved cell size (the overflow
    re-key) — exactly the per-level device work of
    convert/device.py::_cascade_level, minus the host store merge. The
    loop exits where production hands the tail to the host
    (HOST_CASCADE_THRESHOLD = 2^14 rows). No host transfer in the
    timed region; sync is a scalar readback (tunnel acks
    block_until_ready at enqueue, PERF.md).

    Conservative vs production shapes: every level sorts the full
    N-row buffer (static shapes under jit) where production shrinks
    deeper levels to smaller pow2 buckets — the reported Mpts/s is a
    floor, not a flattering proxy.
    """
    import jax
    import jax.numpy as jnp

    from point_cloud_tpu.ops import dedup as dd
    from point_cloud_tpu.ops.exact import exact_div

    _bc("imports done")
    n = KERNEL_ROWS
    threshold = 1 << 14  # convert/device.py HOST_CASCADE_THRESHOLD
    max_levels = 12

    @jax.jit
    def cascade(pos, valid, cs0):
        def cond(carry):
            _, valid, _, _, lvl = carry
            return (jnp.sum(valid.astype(jnp.int32)) >= threshold) & (
                lvl < max_levels
            )

        def body(carry):
            pos, valid, cs, processed, lvl = carry
            # sub-cell radius: IEEE-correct divide (TPU hw divide is
            # approximate; production computes this scalar on the host)
            radius = exact_div(cs, jnp.float32(96.0)) * jnp.float32(0.5)
            ch_s, sh_s, _, perm, _, _, _ = dd._hash_sort(
                pos, valid, cs, radius
            )
            valid_s = ch_s != dd._I32_MAX
            same = (ch_s == jnp.roll(ch_s, 1)) & (
                sh_s == jnp.roll(sh_s, 1)
            )
            winner = jnp.logical_not(same).at[0].set(True) & valid_s
            pos_s = pos[perm]  # the winner/loser partition gather
            processed = processed + jnp.sum(valid.astype(jnp.int32))
            # losers cascade; next iteration re-keys them at cs/2
            return (
                pos_s, valid_s & ~winner, cs * jnp.float32(0.5),
                processed, lvl + 1,
            )

        pos, valid, cs, processed, lvl = jax.lax.while_loop(
            cond, body, (pos, valid, cs0, jnp.int32(0), jnp.int32(0))
        )
        # fold every carry into scalars so nothing dead-code-eliminates
        checksum = jnp.sum(
            jnp.where(valid[:, None], pos, 0.0), dtype=jnp.float32
        )
        return processed, lvl, jnp.sum(valid.astype(jnp.int32)), checksum

    pos = jnp.asarray(positions[:n])
    valid = jnp.ones(n, bool)
    cs0 = jnp.float32(1000.0)
    _bc("data on device; compiling the while_loop cascade")
    t_c = time.perf_counter()
    processed, levels, tail, _ = cascade(pos, valid, cs0)
    processed_i, levels_i, tail_i = (
        int(processed), int(levels), int(tail),
    )  # readback = true sync
    _bc(
        f"compiled+warm in {time.perf_counter() - t_c:.1f}s: "
        f"{levels_i} levels, {processed_i} rows processed, "
        f"{tail_i} tail rows to the host"
    )
    reps = 3
    t0 = time.perf_counter()
    acc = jnp.int32(0)
    for i in range(reps):
        p, _, t, _ = cascade(pos, valid, cs0)
        acc = acc + p + t
        _bc(f"rep {i + 1}/{reps} dispatched")
    int(acc)
    dt = (time.perf_counter() - t0) / reps
    _bc(
        f"timed: {dt * 1e3:.1f} ms/cascade, "
        f"{dt / max(levels_i, 1) * 1e3:.1f} ms/level, "
        f"{dt * 1e9 / n:.1f} ns/input-pt, "
        f"{dt * 1e9 / max(processed_i, 1):.2f} ns/row"
    )
    return n / dt / 1e6


def bench_render_kernel(positions) -> float:
    """Steady-state Mpts/s of the fused cull+LOD pass (BASELINE config 4)."""
    import jax
    import jax.numpy as jnp

    from point_cloud_tpu.render.camera import Camera
    from point_cloud_tpu.render.kernel import (
        MAX_HIERARCHIES, build_loaded_cells_hash, cull_lod_pass,
    )

    n = KERNEL_ROWS
    pos = jnp.asarray(positions[:n])
    hier = jnp.zeros(n, jnp.int32)
    valid = jnp.ones(n, bool)
    cam = Camera()
    view = jnp.asarray(cam.view_matrix())
    proj = jnp.asarray(cam.projection_matrix())
    cam_pos = jnp.asarray(cam.transform.translation, jnp.float32)
    cell_sizes = jnp.asarray(
        [1000.0 / 2**h for h in range(MAX_HIERARCHIES)], jnp.float32
    )
    spacings = cell_sizes / 96.0
    rng = np.random.default_rng(3)
    table = np.unique(
        rng.integers(-4, 4, (5000, 4)).astype(np.int32), axis=0
    )
    loaded = jnp.asarray(build_loaded_cells_hash(table))
    fars = jnp.full(MAX_HIERARCHIES, 1e9, jnp.float32)

    def run():
        return cull_lod_pass(
            pos, hier, valid, view, proj, cam_pos, cell_sizes, spacings,
            6, loaded, fars, jnp.bool_(True), jnp.int32(5),
        )

    def probe():  # scalar readback = the only true sync via the tunnel
        keep, hierarchy, _ = run()
        return jnp.sum(keep.astype(jnp.int32)) + jnp.sum(hierarchy)

    _bc("data on device; compiling cull_lod_pass")
    float(jnp.int32(0) + probe())  # compile + warm (incl. the accumulate)
    _bc("compiled+warm; timing")
    reps = 5
    t0 = time.perf_counter()
    acc = jnp.int32(0)
    for _ in range(reps):
        acc = acc + probe()
    float(acc)
    dt = (time.perf_counter() - t0) / reps
    return n / dt / 1e6


def bench_render_kernel_steady(positions) -> float:
    """Steady-frame camera kernel Mpts/s: cull_classify_pass alone. The
    renderer caches the camera-independent LOD walk per loaded set
    (kernel.lod_select), so the steady orbit runs ONLY this pass —
    cull_lod_pass above stays reported for round-over-round
    comparability of the combined (first-sight) kernel."""
    import jax.numpy as jnp

    from point_cloud_tpu.render.camera import Camera
    from point_cloud_tpu.render.kernel import (
        MAX_HIERARCHIES, cull_classify_pass,
    )

    n = KERNEL_ROWS
    pos = jnp.asarray(positions[:n])
    hier_base = jnp.zeros(n, jnp.int32)
    valid = jnp.ones(n, bool)
    cam = Camera()
    view = jnp.asarray(cam.view_matrix())
    proj = jnp.asarray(cam.projection_matrix())
    cam_pos = jnp.asarray(cam.transform.translation, jnp.float32)
    cell_sizes = jnp.asarray(
        [1000.0 / 2**h for h in range(MAX_HIERARCHIES)], jnp.float32
    )
    spacings = cell_sizes / 96.0
    fars = jnp.full(MAX_HIERARCHIES, 1e9, jnp.float32)
    thresholds = jnp.asarray([0.5, 1.5, 2.5, 3.5, 4.5], jnp.float32)

    def probe():
        out = cull_classify_pass(
            pos, hier_base, valid, view, proj, cam_pos, spacings, fars,
            jnp.bool_(True), jnp.int32(5), thresholds, 640, 480,
        )
        return jnp.sum(out[6])  # the counts vector sums the frame

    _bc("data on device; compiling cull_classify_pass")
    float(jnp.int32(0) + probe())
    _bc("compiled+warm; timing")
    reps = 5
    t0 = time.perf_counter()
    acc = jnp.int32(0)
    for _ in range(reps):
        acc = acc + probe()
    float(acc)
    dt = (time.perf_counter() - t0) / reps
    return n / dt / 1e6


def bench_render_fps(positions, colors, settings_overrides=None) -> float:
    """End-to-end frames/s over an animated camera path (BASELINE
    config 4): streamed store -> cull+LOD -> splat raster -> resolved
    RGB on the host, 640x480, orbiting camera.

    ``settings_overrides`` (dict of RenderSettings fields) supports
    A/B runs — e.g. ``{"frame_fusion": True}`` via
    ``python bench.py --fps-ab frame_fusion``."""
    import math

    from point_cloud_tpu.convert.native import NativeConverter
    from point_cloud_tpu.core.cell import Cell
    from point_cloud_tpu.core.metadata import Metadata
    from point_cloud_tpu.core.point import PointBatch
    from point_cloud_tpu.render.camera import Camera
    from point_cloud_tpu.render.frustums import update_streaming_frustums
    from point_cloud_tpu.render.renderer import PointRenderer, RenderSettings
    from point_cloud_tpu.render.streaming import CellStreamer

    n = 1 << 19
    out_dir = tempfile.mkdtemp(prefix="pct_bench_render_")
    try:
        metadata = Metadata()
        with NativeConverter(metadata, out_dir) as conv:
            conv.add_points_batch(PointBatch(positions[:n], colors[:n]))

        store = Path(out_dir)

        def loader(cell_id):
            path = store / cell_id.path()
            return Cell.from_path(path) if path.exists() else None

        streamer = CellStreamer(metadata, loader=loader)
        settings = RenderSettings(
            width=640, height=480, occlusion=True, transfer_depth=False,
        )
        for key, value in (settings_overrides or {}).items():
            setattr(settings, key, value)
        renderer = PointRenderer(metadata, settings)

        def frame(yaw: float):
            cam = Camera()
            cam.projection.far = float(metadata.config.max_cell_size * 5.0)
            bbox = metadata.bounding_box
            center = bbox.center()
            d = float(np.linalg.norm(bbox.extends())) * 1.5
            cam.transform.translation = (center + np.array(
                [d * math.cos(yaw), d * math.sin(yaw), d * 0.45], np.float32
            )).astype(np.float32)
            cam.transform.look_at(
                center, np.array([0.0, 0.0, 1.0], np.float32)
            )
            frustums = update_streaming_frustums(
                metadata, cam.transform, cam.projection, cam.frustum()
            )
            streamer.update(frustums, cam.transform)
            for _ in range(10_000):
                if not streamer.fill_load_slots():
                    break
            return renderer.render(streamer, cam, frustums)

        def frame_pipelined(yaw: float):
            cam = Camera()
            cam.projection.far = float(metadata.config.max_cell_size * 5.0)
            bbox = metadata.bounding_box
            center = bbox.center()
            d = float(np.linalg.norm(bbox.extends())) * 1.5
            cam.transform.translation = (center + np.array(
                [d * math.cos(yaw), d * math.sin(yaw), d * 0.45], np.float32
            )).astype(np.float32)
            cam.transform.look_at(
                center, np.array([0.0, 0.0, 1.0], np.float32)
            )
            frustums = update_streaming_frustums(
                metadata, cam.transform, cam.projection, cam.frustum()
            )
            streamer.update(frustums, cam.transform)
            for _ in range(10_000):
                if not streamer.fill_load_slots():
                    break
            return renderer.render_pipelined(streamer, cam, frustums)

        # warm one full orbit: every pow2 bucket-shape combination the
        # path hits compiles once (persistent-cached); the timed pass is
        # the steady-state orbit — same camera path, loaded sets still
        # shift frame to frame. Steady state runs the double-buffered
        # pipeline (one frame of latency, like the reference's AutoVsync
        # swapchain): frame k+1's device chain overlaps frame k's image
        # readback; fps counts completed frames over the whole pass.
        # The warm orbit MUST also run pipelined: survivor counts land
        # one frame later than in the sync path, so the pipelined orbit
        # walks a different buffer-budget sequence — warming with sync
        # frames left the timed pass minting new shapes mid-measurement
        # (measured 1.7 vs 4.1 fps, a pure harness artifact)
        reps = 6
        yaws = [0.5 + i * 0.35 for i in range(reps)]
        _bc("store converted; first frame (streaming + resolve compile)")
        frame(0.0)  # first streaming + resolve compile
        for i, yaw in enumerate(yaws):
            frame_pipelined(yaw)
            _bc(f"warm orbit frame {i + 1}/{reps}")
        renderer.render_flush()
        _bc("warm orbit done; timing two orbits")

        def timed_pass(offset: float) -> float:
            t0 = time.perf_counter()
            done = 0
            for yaw in yaws:
                if frame_pipelined(yaw + offset) is not None:
                    done += 1
            if renderer.render_flush() is not None:
                done += 1
            return done / (time.perf_counter() - t0)

        # best of two timed orbits (same camera path modulo 2*pi, so the
        # same shapes/budgets — no compiles in either): this container's
        # shared vCPU and tunnel flap between full speed and ~1/30th
        # minute to minute (PERF.md "host_memcpy_gbs"); the steady-state
        # capability is the better pass, the gap is contention
        return max(timed_pass(2.0 * math.pi), timed_pass(4.0 * math.pi))
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def bench_tunnel_pipeline(positions, colors) -> float:
    """Device-backed end-to-end conversion through the host<->TPU link
    (BENCH_r01's configuration), 1 Mi points. Uses the fastest
    device-backed backend: device dedup pass + C++ merge engine on a
    3-deep cross-batch wavefront with the device-resident cascade
    (convert/native_device.py NativeDevicePipelined); falls back to the
    Python-merge wavefront when no C++ toolchain exists."""
    from point_cloud_tpu.native import hex_lockstep_ok

    if hex_lockstep_ok():  # same gate NativeDeviceConverter's ctor applies
        from point_cloud_tpu.convert.native_device import (
            NativeDevicePipelined as cls,
        )
    else:
        from point_cloud_tpu.convert.pipelined import PipelinedConverter as cls

    n = 1 << 20
    _bc(f"backend {cls.__name__}; warm conversion (compiles)")
    _convert_once(cls, positions, colors, n)  # compile/warm
    _bc("warm done; timing 3 conversions")
    times = [_convert_once(cls, positions, colors, n) for _ in range(3)]
    # best of 3, same rationale as the fps orbit: the runs are identical
    # warm work (zero compiles), so the spread between them is tunnel/
    # host contention, not pipeline capability; the host-only headline
    # keeps medians because its noise source (the shared vCPU) is part
    # of what that metric measures
    return n / min(times) / 1e6


def bench_render_fps_fused(positions, colors) -> float:
    """The same orbit with RenderSettings.frame_fusion ON (one XLA
    program + one readback per frame) — the A/B that decides whether
    fusion becomes the default (ROADMAP #10); reported alongside
    render_fps_640x480 so every bench run on real hardware records the
    comparison even when interactive tunnel time is unavailable."""
    return bench_render_fps(positions, colors, {"frame_fusion": True})


# insertion order = run priority: when the global wall budget runs
# short (flapping tunnel burning per-extra timeouts), the metrics that
# matter most for round-over-round tracking are measured first —
# never-yet-recorded metrics BEFORE anything that has a number on the
# books (VERDICT r4 #1b: mesh_dedup_mpts sat behind the extra that
# wedged and has never recorded)
_EXTRAS = {
    # fast kernels first (~1-2 min each incl. tunnel setup): a slow or
    # wedged fps orbit must not starve them of the global budget
    # (observed: fps ran 2nd, burned 750 s, five extras recorded
    # nothing)
    "device_dedup_sort_mpts": (bench_device_sort, False),
    "mesh_dedup_mpts": (bench_mesh_dedup, False),
    "device_cascade_mpts": (bench_device_cascade, False),
    "render_cull_lod_mpts": (bench_render_kernel, False),
    "render_cull_steady_mpts": (bench_render_kernel_steady, False),
    # the long ones: end-to-end fps orbit, tunnel pipeline, fused A/B
    "render_fps_640x480": (bench_render_fps, True),
    "tunnel_pipeline_mpts": (bench_tunnel_pipeline, True),
    "render_fps_fused_640x480": (bench_render_fps_fused, True),
}

# host metrics that need no accelerator but CAN eat the whole budget on
# a degraded shared host (VERDICT r3: the in-process 10M hierarchy
# build alone sank BENCH_r03) — run as deadline-gated subprocesses with
# hard wall timeouts, exactly like the device extras
_HOST_EXTRAS = {
    "hierarchy_build_10m_wall_s": bench_hierarchy_build,
    "incremental_merge_mpts": bench_incremental_merge,
}

# generous per-metric wall budgets (first compiles + tunnel latency);
# a healthy run finishes far below these, a wedged device can't exceed
# them. The device-health precheck below keeps the all-wedged worst
# case to one timeout, not four — and the GLOBAL budget below bounds
# the whole run regardless of when the tunnel wedges.
_EXTRA_TIMEOUT_S = 1500
_HEALTH_TIMEOUT_S = 300
# hard wall budget for the ENTIRE bench run: the driver records the
# round artifact from this process's stdout, so bench must ALWAYS
# print its JSON line — a tunnel that wedges MID-run (observed: probe
# healthy at start, fps extra hung 25 min later) would otherwise sink
# every remaining metric AND the artifact. Each stage (host AND device)
# gets min(its own budget, time left); once the budget is spent the
# rest report budget-exhausted errors instead of running. 900 s keeps
# the whole run safely inside any plausible external timeout (VERDICT
# r3 #1: 2400 was not safely below the driver's kill at rc=124) —
# and because a COMPLETE artifact line is re-printed after every
# metric, even an external SIGKILL mid-run leaves a parseable tail.
_BENCH_BUDGET_S = float(os.environ.get("PCT_BENCH_BUDGET_S", "900"))
# minimum useful slice: below this a device extra can't even finish
# tunnel setup (~30 s) + one compile, so don't bother starting it
_EXTRA_FLOOR_S = 90.0


def _run_extra(name: str, deadline: float | None = None,
               extras_left: int = 1):
    """One extra metric in a subprocess with a hard wall timeout.

    The device metrics must not be able to sink the bench: through this
    environment's tunnel a wedged TPU endpoint hangs PJRT client
    creation *inside a C extension* — uninterruptible from Python, so
    in-process try/except can never bound it. A subprocess + timeout
    can. Prints the value on the last stdout line when run with
    --extra <name>.

    ``extras_left`` is informational only (it rides into the error
    string). Deliberately NO fair-share cap: on a cold-cache day (a
    tunnel-endpoint restart changes the compilation-cache key, so every
    program recompiles — observed 2026-08-20: 274 s for a pass that
    warm-runs in 9 s) no device extra fits a fractional slice, so
    splitting the budget records NOTHING; spending it front-to-back
    records the highest-priority extras, which is what the _EXTRAS
    ordering is for."""
    import subprocess

    budget = _EXTRA_TIMEOUT_S
    if deadline is not None:
        budget = min(budget, deadline - time.monotonic())
        if budget < _EXTRA_FLOOR_S:
            return "error: bench wall budget exhausted before this metric"
    try:
        proc = subprocess.run(
            [sys.executable, __file__, "--extra", name],
            capture_output=True, text=True, timeout=budget,
        )
    except subprocess.TimeoutExpired as exc:
        # fold the child's LAST breadcrumb into the error so the timeout
        # is attributable (VERDICT r4 #1c: render_cull_steady died at
        # 278 s with no trace of compile vs tunnel vs harness)
        err = exc.stderr or b""
        if isinstance(err, bytes):
            err = err.decode(errors="replace")
        crumbs = [
            ln for ln in err.strip().splitlines() if ln.startswith("[bc ")
        ]
        last = f" (last: {crumbs[-1]})" if crumbs else " (no breadcrumb)"
        return f"error: timed out after {int(budget)}s{last}"
    if proc.returncode != 0:
        tail = (proc.stderr or "").strip().splitlines()
        return "error: " + (tail[-1] if tail else f"rc={proc.returncode}")
    try:
        return round(float(proc.stdout.strip().splitlines()[-1]), 3)
    except (ValueError, IndexError):
        return f"error: unparseable output {proc.stdout[-80:]!r}"


def _probe_device_once(timeout_s: float) -> bool:
    """One bounded subprocess probe of the accelerator (jax.devices()
    through a wedged tunnel blocks forever, so never probe in-process)."""
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('ok')"],
            capture_output=True, text=True, timeout=timeout_s,
        )
        return proc.returncode == 0 and "ok" in proc.stdout
    except subprocess.TimeoutExpired:
        return False


def _device_healthy(deadline: float | None = None) -> bool:
    """Can this process family reach the accelerator at all?

    The tunnel endpoint FLAPS (observed down for stretches of an hour+,
    PERF.md): one failed probe at bench time would silently cost the
    run every device metric, so the gate retries a few times with a
    pause between probes (PCT_BENCH_HEALTH_RETRIES / _RETRY_S to tune).
    Retries never run the run past `deadline` — the host metrics and
    the artifact always come out within the global budget."""
    retries = int(os.environ.get("PCT_BENCH_HEALTH_RETRIES", "3"))
    pause_s = float(os.environ.get("PCT_BENCH_HEALTH_RETRY_S", "120"))
    for attempt in range(max(retries, 1)):
        timeout_s = _HEALTH_TIMEOUT_S
        if deadline is not None:
            timeout_s = min(timeout_s, deadline - time.monotonic())
            if timeout_s < 10:
                return False
        if _probe_device_once(timeout_s):
            return True
        if attempt + 1 < max(retries, 1):
            if (
                deadline is not None
                and time.monotonic() + pause_s > deadline
            ):
                return False
            time.sleep(pause_s)
    return False


def _wait_for_device(deadline: float | None) -> tuple[bool, str]:
    """Probe-at-intervals until the tunnel flaps back or the budget runs
    out (VERDICT r4 #1a). Returns (healthy, note): on failure the note
    is the durable artifact evidence — how many probes ran over how much
    wall — since stderr breadcrumbs may not survive the driver."""
    attempts = 0
    t_start = time.monotonic()
    while True:
        remaining = (
            deadline - time.monotonic() if deadline is not None else 600.0
        )
        if remaining < _EXTRA_FLOOR_S + 15:
            waited = int(time.monotonic() - t_start)
            return False, (
                f"error: device unreachable; {attempts} re-probes over "
                f"{waited}s exhausted the bench budget"
            )
        attempts += 1
        _bc(f"device re-probe #{attempts} ({int(remaining)}s budget left)")
        if _probe_device_once(min(60.0, remaining - _EXTRA_FLOOR_S)):
            _bc(f"device back after {attempts} probe(s)")
            return True, ""
        pause = 30.0
        if deadline is not None:
            pause = min(
                pause,
                max(0.0, deadline - time.monotonic() - _EXTRA_FLOOR_S - 15),
            )
        time.sleep(pause)


def main() -> None:
    from point_cloud_tpu.ops.runtime import setup_jax_cache

    setup_jax_cache()
    deadline = time.monotonic() + _BENCH_BUDGET_S

    positions = synth_cloud(N_POINTS)
    rng = np.random.default_rng(1)
    colors = rng.integers(0, 256, (N_POINTS, 4), dtype=np.uint8)
    colors[:, 3] = 255

    if len(sys.argv) >= 3 and sys.argv[1] == "--extra":
        name = sys.argv[2]
        if name in _EXTRAS:
            fn, wants_colors = _EXTRAS[name]
            args = (positions, colors) if wants_colors else (positions,)
            print(fn(*args))
        else:
            print(_HOST_EXTRAS[name]())
        return

    if len(sys.argv) >= 3 and sys.argv[1] == "--fps-ab":
        # A/B the orbit fps with one RenderSettings boolean flipped ON
        # (e.g. --fps-ab frame_fusion); prints baseline then variant
        knob = sys.argv[2]
        import dataclasses

        from point_cloud_tpu.render.renderer import RenderSettings

        valid = {f.name for f in dataclasses.fields(RenderSettings)}
        if knob not in valid:
            # a typo'd knob would silently run two identical baselines
            # and mislabel one as the variant — the A/B is a default-
            # flipping decision gate, so fail loudly instead
            raise SystemExit(
                f"unknown RenderSettings knob {knob!r}; "
                f"choose from {sorted(valid)}"
            )
        # the variant flips the knob RELATIVE TO ITS DEFAULT (a knob
        # that defaults on, e.g. chunked_raster, A/Bs against off) so
        # the run always measures two distinct configurations
        default = RenderSettings().__getattribute__(knob)
        flipped = not default
        base = bench_render_fps(positions, colors)
        variant = bench_render_fps(positions, colors, {knob: flipped})
        tag = "on" if flipped else "off"
        print(json.dumps({"baseline_fps": round(base, 3),
                          f"{knob}_{tag}_fps": round(variant, 3)}))
        return

    extra = {}

    def emit(value: float) -> None:
        # a COMPLETE artifact line after every metric, flushed: the
        # driver parses the stdout TAIL, so the last complete line wins
        # and an external kill at any moment after the first headline
        # run still records a non-null value (VERDICT r3 #1 — the
        # single print-at-the-end lost all of round 3's numbers)
        print(
            json.dumps(
                {
                    "metric": "end_to_end_conversion_throughput",
                    "value": round(value, 3),
                    "unit": "Mpts/s",
                    "vs_baseline": round(
                        value * 1e6 / TARGET_PER_CHIP, 3
                    ),
                    "extra": extra,
                }
            ),
            flush=True,
        )

    # shared-host health indicator: this container's one vCPU is shared
    # and flaps between ~0.1 and ~3.4 GB/s memcpy (PERF.md); the copy
    # bandwidth at bench time contextualizes run-to-run headline swings
    buf = np.zeros(1 << 27, np.uint8)
    t0 = time.perf_counter()
    buf.copy()
    extra["host_memcpy_gbs"] = round(
        (1 << 27) / (time.perf_counter() - t0) / 1e9, 2
    )

    # headline first (the host C++ engine needs no accelerator), one
    # run at a time with the artifact re-emitted after each: run 0
    # warms (native build, page cache) and seeds the artifact; the
    # reported value is the median of the post-warm runs. Deadline-
    # gated per run so a 20x-degraded host can't eat the whole budget.
    from point_cloud_tpu.convert.native import NativeConverter

    times: list[float] = []
    value = 0.0
    for _ in range(4):
        if times and time.monotonic() + 1.2 * min(times) > deadline:
            extra["headline_note"] = (
                f"budget stopped the headline after {len(times)} run(s)"
            )
            break
        times.append(
            _convert_once(NativeConverter, positions, colors, N_POINTS)
        )
        measured = times[1:] if len(times) > 1 else times
        value = N_POINTS / statistics.median(measured) / 1e6
        extra["headline_runs"] = len(times)
        emit(value)

    # host metrics (BASELINE configs 2 + 3): subprocesses with hard
    # wall timeouts, same machinery as the device extras — in-process
    # they are unbounded and sank round 3's artifact on a slow host
    for name in _HOST_EXTRAS:
        extra[name] = _run_extra(name, deadline)
        emit(value)

    healthy = _device_healthy(deadline)
    down_note = (
        "error: device unreachable (health gate: "
        f"{os.environ.get('PCT_BENCH_HEALTH_RETRIES', '3')} "
        f"probes x {_HEALTH_TIMEOUT_S}s)"
    )
    for pos, name in enumerate(_EXTRAS):
        if not healthy:
            # probe-at-intervals (VERDICT r4 #1a): the tunnel FLAPS —
            # round 4's single 60 s re-probe forfeited 5 metrics. Keep
            # probing within the remaining budget and resume the moment
            # it flaps back; give up only when too little budget is
            # left to run anything anyway.
            healthy, down_note = _wait_for_device(deadline)
        if not healthy:
            extra[name] = down_note
            emit(value)
            continue
        result = _run_extra(name, deadline, len(_EXTRAS) - pos)
        extra[name] = result
        emit(value)
        if isinstance(result, str) and result.startswith(
            "error: timed out"
        ):
            healthy = False  # wedged mid-run: next loop iteration probes


if __name__ == "__main__":
    sys.exit(main())
