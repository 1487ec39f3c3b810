#!/usr/bin/env python
"""End-to-end demo: synthesize a cloud -> convert -> stream -> render.

Run: python examples/demo.py [out_dir]

Produces a converted store, prints viewer stats, writes orbit PNG frames,
and (optionally, --serve) serves the store over HTTP.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root


def main() -> int:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("demo_out")
    out.mkdir(parents=True, exist_ok=True)

    from point_cloud_tpu.convert.converter import Converter, load_metadata
    from point_cloud_tpu.core.point import PointBatch
    from point_cloud_tpu.ops.runtime import (
        pin_cpu_if_unreachable,
        setup_jax_cache,
    )
    from point_cloud_tpu.render.renderer import RenderSettings
    from point_cloud_tpu.viewer import Viewer
    from point_cloud_tpu.viewer.offscreen import render_orbit

    # entry-point JAX hygiene: persistent compile cache + degrade to the
    # CPU platform when the accelerator is unreachable (a bare first
    # dispatch would hang forever in PJRT client creation on a wedged
    # tunnel — see ops/runtime.py)
    setup_jax_cache()
    pin_cpu_if_unreachable()

    # 1. synthesize a scene: a wavy ground sheet + a few colored towers
    rng = np.random.default_rng(0)
    n = 200_000
    ground = np.empty((n, 3), np.float32)
    ground[:, :2] = rng.uniform(-60, 60, (n, 2))
    ground[:, 2] = 2.0 * np.sin(ground[:, 0] * 0.2) * np.cos(ground[:, 1] * 0.2)
    colors = np.empty((n, 4), np.uint8)
    height = (ground[:, 2] + 2.0) / 4.0
    colors[:, 0] = (60 + 160 * height).astype(np.uint8)
    colors[:, 1] = (120 + 80 * height).astype(np.uint8)
    colors[:, 2] = 80
    colors[:, 3] = 255

    towers = []
    for cx, cy, col in [(-25, -25, (230, 80, 80)), (25, 25, (80, 120, 230)),
                        (-25, 25, (230, 200, 60))]:
        m = 20_000
        t = np.empty((m, 3), np.float32)
        t[:, 0] = cx + rng.normal(0, 2.0, m)
        t[:, 1] = cy + rng.normal(0, 2.0, m)
        t[:, 2] = rng.uniform(0, 25, m)
        c = np.zeros((m, 4), np.uint8)
        c[:, :3] = col
        c[:, 3] = 255
        towers.append((t, c))

    pos = np.concatenate([ground] + [t for t, _ in towers]).astype(np.float32)
    col = np.concatenate([colors] + [c for _, c in towers])

    # 2. convert into a store (incremental merge if run twice)
    store = out / "store"
    print(f"converting {len(pos):,} points -> {store}")
    with Converter(load_metadata(store), store) as conv:
        for i in range(0, len(pos), 100_000):
            conv.add_points_batch(PointBatch(pos[i:i+100_000], col[i:i+100_000]))

    # 3. stream + render an orbit
    viewer = Viewer(RenderSettings(width=640, height=480))
    viewer.load_metadata(store / "metadata.json")
    print("metadata:", viewer.stats()["metadata"])
    frames = render_orbit(viewer, out / "frames", n_frames=8)
    print(f"wrote {len(frames)} frames to {out/'frames'}")
    print("viewer stats:", viewer.stats())
    viewer.close()

    if "--serve" in sys.argv:
        from point_cloud_tpu.serve import serve

        httpd = serve(store, port=8080)
        print("serving on http://127.0.0.1:8080 (/render?yaw=0.6)")
        httpd.serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
