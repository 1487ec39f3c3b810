"""Render the docs gallery: representative frames of every visual mode.

Reproducible evidence of render fidelity (docs/gallery/*.png): the
demo city scene converted and streamed, then rendered with each
user-visible mode — voronoi vs flat splats, the debug line overlays
(reference src/plugins/debug.rs:21-36), per-hierarchy visibility,
forced-coarse LOD, a near-camera close-up (large-splat window
overflow), and a mesh-sharded frame that must be bit-identical to the
single-device one.

    JAX_PLATFORMS=cpu python tools/gallery.py [out_dir]

Writes docs/gallery/ by default plus a GALLERY.md index.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_scene():
    """The demo scene: wavy ground sheet + three colored towers."""
    rng = np.random.default_rng(0)
    n = 200_000
    ground = np.empty((n, 3), np.float32)
    ground[:, :2] = rng.uniform(-60, 60, (n, 2))
    ground[:, 2] = (
        2.0 * np.sin(ground[:, 0] * 0.2) * np.cos(ground[:, 1] * 0.2)
    )
    colors = np.empty((n, 4), np.uint8)
    height = (ground[:, 2] + 2.0) / 4.0
    colors[:, 0] = (60 + 160 * height).astype(np.uint8)
    colors[:, 1] = (120 + 80 * height).astype(np.uint8)
    colors[:, 2] = 80
    colors[:, 3] = 255

    parts_p, parts_c = [ground], [colors]
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
        parts_p.append(t)
        parts_c.append(c)
    return (
        np.concatenate(parts_p).astype(np.float32),
        np.concatenate(parts_c),
    )


def settle(viewer, frames=400):
    for _ in range(frames):
        viewer.update()
        if (
            not viewer.streamer.loading
            and len(viewer.streamer.should_load) == 0
        ):
            break


def main() -> int:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else (
        Path(__file__).resolve().parent.parent / "docs" / "gallery"
    )
    out.mkdir(parents=True, exist_ok=True)

    import tempfile

    from point_cloud_tpu.convert.converter import Converter, load_metadata
    from point_cloud_tpu.core.point import PointBatch
    from point_cloud_tpu.ops.runtime import setup_jax_cache
    from point_cloud_tpu.render.renderer import RenderSettings
    from point_cloud_tpu.viewer import Viewer
    from point_cloud_tpu.viewer.offscreen import write_png

    setup_jax_cache()
    pos, col = build_scene()
    store = Path(tempfile.mkdtemp(prefix="pct_gallery_"))
    with Converter(load_metadata(store), store) as conv:
        for i in range(0, len(pos), 100_000):
            conv.add_points_batch(
                PointBatch(pos[i:i + 100_000], col[i:i + 100_000])
            )

    entries = []  # (filename, caption)

    def shoot(name, caption, rgb):
        write_png(out / name, rgb)
        entries.append((name, caption))
        print(f"[gallery] {name}")

    def fresh_viewer(**settings_kw):
        kw = dict(width=640, height=480)
        kw.update(settings_kw)
        v = Viewer(RenderSettings(**kw))
        v.load_metadata(store / "metadata.json")
        # three-quarter view of the scene
        bbox = v.metadata.bounding_box
        center = bbox.center()
        extent = float(np.linalg.norm(bbox.extends()))
        eye = center + np.array([0.9, -1.1, 0.55], np.float32) * extent * 0.8
        v.fly_cam.transform.translation = eye.astype(np.float32)
        v.fly_cam.transform.look_at(
            center, np.array([0.0, 0.0, 1.0], np.float32)
        )
        v._camera_dirty = True
        settle(v)
        return v

    # 1/2. voronoi vs flat fragment modes (render.wgsl fs_voronoi /
    # fs_no_voronoi)
    viewer = fresh_viewer()
    rgb, _, _ = viewer.render()
    shoot("voronoi.png", "Voronoi splats (paraboloid frag depth, "
          "render.wgsl:102-121 equivalent)", rgb)
    viewer.settings.voronoi = False
    rgb, _, _ = viewer.render()
    shoot("flat.png", "Flat circular splats (fs_no_voronoi)", rgb)
    viewer.settings.voronoi = True

    # 3. debug overlays (debug.rs:21-36): bbox, frustum wireframe +
    # plane normals, cell grid, streaming far-plane rects
    viewer.freeze_frustum()
    viewer.debug.show_bounding_box = True
    viewer.debug.show_frustum = True
    viewer.debug.show_plane_normals = True
    viewer.debug.show_cell_grid = True
    viewer.debug.show_streaming_rects = True
    rgb, _, _ = viewer.render()
    shoot("debug_overlays.png", "All six debug visualizations: cloud "
          "bbox, frozen frustum wireframe + plane normals, hierarchy "
          "cell grids, streaming-frustum far-plane rects", rgb)
    viewer.debug = type(viewer.debug)()  # reset

    # 4. per-hierarchy visibility: hide hierarchy 0 (the coarse points)
    viewer.settings.hidden_hierarchies = {0}
    rgb, _, _ = viewer.render()
    shoot("hide_h0.png", "Hierarchy 0 hidden (per-hierarchy visibility "
          "toggles, debug.rs:344-371)", rgb)
    viewer.settings.hidden_hierarchies = set()

    # 5. size_by_distance LOD coarsening (cell/shader.rs:173-207)
    viewer.settings.size_by_distance = True
    rgb, _, _ = viewer.render()
    shoot("size_by_distance.png", "size_by_distance on: distant points "
          "promote to coarser hierarchies by streaming-frustum distance",
          rgb)
    viewer.settings.size_by_distance = False

    # 6. near-camera close-up: projected splats exceed the footprint
    # window and tile overflow windows (large-splat fidelity)
    bbox = viewer.metadata.bounding_box
    center = bbox.center()
    eye = center + np.array([6.0, -8.0, 4.0], np.float32)
    viewer.fly_cam.transform.translation = eye.astype(np.float32)
    viewer.fly_cam.transform.look_at(
        center + np.array([0, 0, 2], np.float32),
        np.array([0.0, 0.0, 1.0], np.float32),
    )
    viewer._camera_dirty = True
    settle(viewer)
    rgb, _, _ = viewer.render()
    shoot("closeup.png", "Near-camera close-up: splats beyond the max "
          "footprint window tile exact overflow windows instead of "
          "clipping", rgb)
    viewer.close()

    # 7. mesh-sharded frame (render/parallel.py): must be bit-identical
    # to the single-device frame
    import jax

    if len(jax.devices()) >= 2:
        # the sharded body mirrors the PLAIN raster path (one
        # full-footprint raster per bucket); compare against the same
        # single-device configuration, as tests/test_render_parallel.py
        # does — the default megakernel/ladder path differs only in
        # transient budget clipping right after a visibility jump
        plain = dict(width=640, height=480, compact_raster=False,
                     megakernel=False, classing=False)
        single = fresh_viewer(**{k: v for k, v in plain.items()
                                 if k not in ("width", "height")})
        rgb_one, _, _ = single.render()
        single.close()
        mesh = Viewer(RenderSettings(**plain), mesh_devices=2)
        mesh.load_metadata(store / "metadata.json")
        bbox = mesh.metadata.bounding_box
        center = bbox.center()
        extent = float(np.linalg.norm(bbox.extends()))
        eye = center + np.array([0.9, -1.1, 0.55], np.float32) * extent * 0.8
        mesh.fly_cam.transform.translation = eye.astype(np.float32)
        mesh.fly_cam.transform.look_at(
            center, np.array([0.0, 0.0, 1.0], np.float32)
        )
        mesh._camera_dirty = True
        settle(mesh)
        rgb_mesh, _, _ = mesh.render()
        mesh.close()
        identical = np.array_equal(rgb_one, rgb_mesh)
        shoot("mesh_2dev.png", "2-device mesh-sharded frame "
              f"(render/parallel.py) — bit-identical to single-device: "
              f"{identical}", rgb_mesh)
        if not identical:
            print("[gallery] WARNING: mesh frame diverged", file=sys.stderr)
            return 1

    index = out / "GALLERY.md"
    lines = [
        "# Render gallery",
        "",
        "Generated by `JAX_PLATFORMS=cpu python tools/gallery.py` from",
        "the demo city scene (examples/demo.py). Every frame is the real",
        "streaming + cull/LOD + raster pipeline, not a mock.",
        "",
    ]
    for name, caption in entries:
        lines += [f"## {name}", "", f"![{name}]({name})", "", caption, ""]
    index.write_text("\n".join(lines))
    print(f"[gallery] wrote {index}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
