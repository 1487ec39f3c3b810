"""Mesh-sharded frame rendering: image equality vs the single-device path.

The sharded frame (render/parallel.py) must be BIT-identical to the
single-device renderer's plain raster path — the sharding moves
fragments between chips, it never changes which fragment wins a pixel
(two-phase pmin merge = the scatter path's smallest-id tie rule), and
the inter-bucket depth pmin reproduces the same-frame occlusion
ordering exactly.
"""

import numpy as np
import pytest

from point_cloud_tpu.convert.converter import Converter
from point_cloud_tpu.core.cell import Cell
from point_cloud_tpu.core.metadata import Metadata
from point_cloud_tpu.core.point import PointBatch
from point_cloud_tpu.parallel.mesh import make_mesh
from point_cloud_tpu.render.camera import Camera
from point_cloud_tpu.render.frustums import update_streaming_frustums
from point_cloud_tpu.render.parallel import MeshPointRenderer
from point_cloud_tpu.render.renderer import PointRenderer, RenderSettings
from point_cloud_tpu.render.streaming import CellStreamer


def _build_scene(tmp_path, n=30_000, seed=21):
    rng = np.random.default_rng(seed)
    # a corridor along x: h0 cell centers sit at x = -1500/-500/500/1500,
    # so a camera near the -x end sees cell distances spanning several
    # octaves -> multiple ilog2 buckets (the inter-bucket occlusion pmin
    # barrier is exercised, not just the final merge)
    pos = np.stack([
        rng.uniform(-1600, 1600, n),
        rng.uniform(-200, 200, n),
        rng.uniform(-200, 200, n),
    ], axis=1).astype(np.float32)
    col = rng.integers(0, 256, (n, 4), dtype=np.uint8)
    metadata = Metadata()
    with Converter(metadata, tmp_path) as conv:
        conv.add_points_batch(PointBatch(pos, col))
    metadata = Metadata.from_path(tmp_path / "metadata.json")

    cam = Camera()
    cam.projection.far = metadata.config.max_cell_size * 5.0
    cam.transform.translation = np.array([-1400.0, 60.0, 90.0], np.float32)
    cam.transform.look_at(
        np.array([1500.0, 0.0, 0.0], np.float32),
        np.array([0, 0, 1], np.float32),
    )

    def loader(cell_id):
        path = tmp_path / cell_id.path()
        return Cell.from_path(path) if path.exists() else None

    streamer = CellStreamer(metadata, loader=loader)
    frustums = update_streaming_frustums(
        metadata, cam.transform, cam.projection, cam.frustum()
    )
    streamer.update(frustums, cam.transform)
    for _ in range(500):
        if not streamer.fill_load_slots():
            break
    assert streamer.stats().loaded_points > 0
    return metadata, cam, streamer, frustums


def _plain_settings(**kw):
    """The single-device configuration the sharded body mirrors: one
    full-footprint raster per bucket, no compaction/ladder machinery."""
    return RenderSettings(
        width=320, height=240, compact_raster=False, megakernel=False,
        classing=False, transfer_depth=True, **kw
    )


class TestMeshFrameEquality:
    @pytest.mark.parametrize("occlusion", [True, False])
    def test_image_identical_to_single_device(self, tmp_path, occlusion):
        metadata, cam, streamer, frustums = _build_scene(tmp_path)
        single = PointRenderer(metadata, _plain_settings(occlusion=occlusion))
        # the scene must exercise more than one distance bucket or the
        # inter-bucket depth merge is untested
        buckets = {c[0] for c in single.gather_points(streamer, cam)}
        assert len(buckets) > 1

        rgb_1, depth_1, stats_1 = single.render(streamer, cam, frustums)

        mesh = make_mesh(8)
        sharded = MeshPointRenderer(
            metadata, mesh, settings=_plain_settings(occlusion=occlusion)
        )
        rgb_n, depth_n, stats_n = sharded.render(streamer, cam, frustums)

        assert stats_n["points_visible"] == stats_1["points_visible"] > 0
        np.testing.assert_array_equal(depth_n, depth_1)
        np.testing.assert_array_equal(rgb_n, rgb_1)
        assert (depth_1 < 1.0).sum() > 50  # frame actually covered

    def test_hidden_hierarchies_and_pause(self, tmp_path):
        metadata, cam, streamer, frustums = _build_scene(tmp_path, n=8_000)
        settings = _plain_settings()
        settings.hidden_hierarchies = {0}
        single = PointRenderer(metadata, settings)
        rgb_1, depth_1, stats_1 = single.render(
            streamer, cam, frustums, paused=True
        )
        sharded = MeshPointRenderer(metadata, make_mesh(8), settings=settings)
        rgb_n, depth_n, stats_n = sharded.render(
            streamer, cam, frustums, paused=True
        )
        assert stats_n["points_visible"] == stats_1["points_visible"]
        np.testing.assert_array_equal(depth_n, depth_1)
        np.testing.assert_array_equal(rgb_n, rgb_1)

    def test_empty_loaded_set(self, tmp_path):
        metadata, cam, _, frustums = _build_scene(tmp_path, n=2_000)
        empty = CellStreamer(metadata, loader=lambda cid: None)
        sharded = MeshPointRenderer(
            metadata, make_mesh(8), settings=_plain_settings()
        )
        rgb, depth, stats = sharded.render(empty, cam, frustums)
        assert stats["points_visible"] == 0
        assert (depth == 1.0).all()

    def test_serve_mesh_backend(self, tmp_path):
        """The --mesh server flag renders frames through the sharded
        renderer (wiring test: Viewer(mesh_devices) + serve plumbing)."""
        import threading
        import urllib.request

        from point_cloud_tpu.serve import serve

        _build_scene(tmp_path, n=4_000)
        httpd = serve(
            tmp_path, host="127.0.0.1", port=0, width=64, height=48,
            mesh_devices=8,
        )
        thread = threading.Thread(target=httpd.serve_forever, daemon=True)
        thread.start()
        try:
            base = f"http://127.0.0.1:{httpd.server_address[1]}"
            with urllib.request.urlopen(
                f"{base}/render?yaw=0.3", timeout=180
            ) as resp:
                body = resp.read()
            assert resp.status == 200
            assert body[:8] == b"\x89PNG\r\n\x1a\n"
        finally:
            httpd.shutdown()

    def test_viewer_mesh_devices_renders(self, tmp_path):
        """Viewer(mesh_devices=8) produces the same image as the default
        single-device Viewer for the plain raster configuration."""
        from point_cloud_tpu.render.parallel import MeshPointRenderer
        from point_cloud_tpu.viewer.app import Viewer

        _build_scene(tmp_path, n=4_000)

        frames = []
        for mesh_devices in (0, 8):
            settings = _plain_settings()
            v = Viewer(settings, mesh_devices=mesh_devices)
            v.load_metadata(tmp_path / "metadata.json")
            if mesh_devices:
                assert isinstance(v.renderer, MeshPointRenderer)
            for _ in range(300):
                v.update(0.0)
                if not v.streamer.loading and not v.streamer.should_load:
                    break
            frames.append(v.render())
        rgb_1, depth_1, stats_1 = frames[0]
        rgb_n, depth_n, stats_n = frames[1]
        assert stats_n["points_visible"] == stats_1["points_visible"]
        np.testing.assert_array_equal(rgb_n, rgb_1)
        np.testing.assert_array_equal(depth_n, depth_1)

    def test_pipelined_matches_sync(self, tmp_path):
        """The mesh renderer's double-buffered loop returns each frame
        one call late with bytes identical to the synchronous render."""
        metadata, cam, streamer, frustums = _build_scene(tmp_path, n=5_000)
        r = MeshPointRenderer(
            metadata, make_mesh(8), settings=_plain_settings()
        )
        sync = r.render(streamer, cam, frustums)
        assert r.render_pipelined(streamer, cam, frustums) is None
        piped = r.render_pipelined(streamer, cam, frustums)
        flushed = r.render_flush()
        for got in (piped, flushed):
            np.testing.assert_array_equal(got[0], sync[0])
            np.testing.assert_array_equal(got[1], sync[1])
            assert got[2]["points_visible"] == sync[2]["points_visible"]
        assert r.render_flush() is None

    def test_mesh_width_does_not_change_image(self, tmp_path):
        """2-way and 8-way meshes produce the same bytes (the scaling
        axis is free to follow the hardware)."""
        metadata, cam, streamer, frustums = _build_scene(tmp_path, n=6_000)
        imgs = []
        for n_dev in (2, 3, 8):  # incl. a non-pow2 width (padding path)
            r = MeshPointRenderer(
                metadata, make_mesh(n_dev), settings=_plain_settings()
            )
            imgs.append(r.render(streamer, cam, frustums))
        for rgb, depth, _ in imgs[1:]:
            np.testing.assert_array_equal(imgs[0][0], rgb)
            np.testing.assert_array_equal(imgs[0][1], depth)
