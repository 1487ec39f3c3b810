"""Per-stage device-time profile of one steady-state frame.

Builds the bench store (2^19 points), streams one camera pose, then
times each stage of the render pipeline with forced scalar-readback
syncs (PERF.md trap #1). Stages re-run several times; min reported.

Usage: python tools/frame_profile.py [scatter|sorted]
"""

import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from point_cloud_tpu.ops.runtime import setup_jax_cache

setup_jax_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from point_cloud_tpu.convert.native import NativeConverter  # noqa: E402
from point_cloud_tpu.core.cell import Cell  # noqa: E402
from point_cloud_tpu.core.metadata import Metadata  # noqa: E402
from point_cloud_tpu.core.point import PointBatch  # noqa: E402
from point_cloud_tpu.render.camera import Camera  # noqa: E402
from point_cloud_tpu.render.frustums import update_streaming_frustums  # noqa: E402
from point_cloud_tpu.render.renderer import (  # noqa: E402
    PointRenderer,
    RenderSettings,
)
from point_cloud_tpu.render.streaming import CellStreamer  # noqa: E402


def sync(x):
    float(jnp.asarray(x).reshape(-1)[0])


def timeit(fn, reps=3):
    fn()  # warm (compile)
    fn()  # PERF.md trap #2
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "scatter"
    n = 1 << 19
    positions = bench.synth_cloud(n)
    rng = np.random.default_rng(1)
    colors = rng.integers(0, 256, (n, 4), dtype=np.uint8)
    colors[:, 3] = 255

    out_dir = tempfile.mkdtemp(prefix="pct_profile_")
    try:
        metadata = Metadata()
        with NativeConverter(metadata, out_dir) as conv:
            conv.add_points_batch(PointBatch(positions, colors))

        from pathlib import Path

        store = Path(out_dir)

        def loader(cell_id):
            path = store / cell_id.path()
            return Cell.from_path(path) if path.exists() else None

        streamer = CellStreamer(metadata, loader=loader)
        settings = RenderSettings(
            width=640, height=480, occlusion=True, transfer_depth=False,
        )
        settings.raster_mode = mode
        renderer = PointRenderer(metadata, settings)

        cam = Camera()
        cam.projection.far = float(metadata.config.max_cell_size * 5.0)
        bbox = metadata.bounding_box
        center = bbox.center()
        d = float(np.linalg.norm(bbox.extends())) * 1.5
        yaw = 0.5
        cam.transform.translation = (center + np.array(
            [d * math.cos(yaw), d * math.sin(yaw), d * 0.45], np.float32
        )).astype(np.float32)
        cam.transform.look_at(center, np.array([0, 0, 1], np.float32))
        frustums = update_streaming_frustums(
            metadata, cam.transform, cam.projection, cam.frustum()
        )
        streamer.update(frustums, cam.transform)
        for _ in range(10_000):
            if not streamer.fill_load_slots():
                break

        # settle shapes/counters with full frames
        for _ in range(3):
            renderer.render(streamer, cam, frustums)

        t_frame = timeit(lambda: renderer.render(streamer, cam, frustums))
        print(f"full frame ({mode}): {t_frame:8.1f} ms  "
              f"({1e3/t_frame:.2f} fps)")

        # stage instrumentation: monkeypatch-time the jitted pieces
        import point_cloud_tpu.render.kernel as K
        import point_cloud_tpu.render.splat as SP
        import point_cloud_tpu.render.renderer as R

        acc = {}

        def wrap(mod, name):
            orig = getattr(mod, name)

            def timed(*a, **k):
                t0 = time.perf_counter()
                out = orig(*a, **k)
                flat = jax.tree_util.tree_leaves(out)
                if flat:
                    sync(flat[0])
                acc[name] = acc.get(name, 0.0) + (
                    time.perf_counter() - t0
                )
                return out

            setattr(mod, name, timed)
            return orig

        saved = []
        for mod, name in (
            # renderer namespace (top-level imports bind there)
            (R, "cull_classify_pass"),
            (R, "lod_select"),
            (R, "rasterize_splats"),
            # splat namespace (call-time `from .splat import ...`)
            (SP, "compact_rows"),
            (SP, "compact_classes"),
            (SP, "rasterize_class_slice"),
            (SP, "emit_fragments"),
            (SP, "sorted_raster_merge"),
            (SP, "render_bucket_pass"),
            (SP, "pack_frame"),
        ):
            if hasattr(mod, name):
                saved.append((mod, name, wrap(mod, name)))

        renderer.render(streamer, cam, frustums)  # warm the sync path
        acc.clear()
        renderer.render(streamer, cam, frustums)
        total = sum(acc.values())
        print(f"instrumented frame (serialized syncs): {total*1e3:.1f} ms")
        for name, v in sorted(acc.items(), key=lambda kv: -kv[1]):
            print(f"  {name:24s} {v*1e3:8.1f} ms")
        for mod, name, orig in saved:
            setattr(mod, name, orig)

        # the landed per-(bucket, rung) survivor counts: the window-
        # ladder occupancy that decides what the sub/overflow rungs save
        counts = getattr(renderer, "_survivor_counts", {})
        print("survivor counts (bucket, rung):")
        for key in sorted(counts, key=str):
            print(f"  {key!s:14s} {counts[key]:8d}")
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
