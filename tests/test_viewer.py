"""Viewer app + interactive converter tests."""

import time

import numpy as np

from point_cloud_tpu.convert.converter import Converter
from point_cloud_tpu.core.cell import Cell
from point_cloud_tpu.core.metadata import Metadata
from point_cloud_tpu.core.point import PointBatch
from point_cloud_tpu.io.ply import write_ply
from point_cloud_tpu.render.renderer import RenderSettings
from point_cloud_tpu.viewer import Viewer, ViewerInput
from point_cloud_tpu.viewer.interactive import (
    ConversionState,
    InteractiveConverter,
)


def random_batch(n, seed=0, lo=-50, hi=50):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    col = rng.integers(0, 256, (n, 4), dtype=np.uint8)
    col[:, 3] = 255
    return PointBatch(pos, col)


def make_store(tmp_path, n=20_000, seed=14):
    batch = random_batch(n, seed=seed)
    with Converter(Metadata(), tmp_path) as conv:
        conv.add_points_batch(batch)
    return batch


def pump(viewer, frames=300, dt=0.016):
    """Run update frames until streaming goes idle."""
    for _ in range(frames):
        viewer.update(dt)
        s = viewer.streamer
        if (
            not s.loading
            and len(s.should_load) == 0
            and not viewer.cell_assets._loading
        ):
            # one more update to drain completions
            viewer.update(dt)
            if not s.loading and len(s.should_load) == 0:
                break
        time.sleep(0.002)


class TestViewer:
    def test_stream_and_render_from_store(self, tmp_path):
        make_store(tmp_path)
        viewer = Viewer(RenderSettings(width=160, height=120))
        viewer.load_metadata(tmp_path / "metadata.json")
        assert viewer.metadata.number_of_points == 20_000
        pump(viewer)
        stats = viewer.stats()
        assert stats["cells"]["loaded"] > 0
        assert stats["points"]["loaded"] > 0
        rgb, depth, rstats = viewer.render()
        assert rgb.shape == (120, 160, 3)
        assert (depth < 1.0).sum() > 10
        viewer.close()

    def test_pause_stops_streaming(self, tmp_path):
        make_store(tmp_path)
        viewer = Viewer(RenderSettings(width=64, height=64))
        viewer.load_metadata(tmp_path / "metadata.json")
        viewer.stream_enabled = False
        for _ in range(5):
            viewer.update()
        assert viewer.stats()["cells"]["loaded"] == 0
        viewer.stream_enabled = True
        pump(viewer)
        assert viewer.stats()["cells"]["loaded"] > 0
        viewer.close()

    def test_camera_motion_marks_dirty_and_restreams(self, tmp_path):
        make_store(tmp_path)
        viewer = Viewer(RenderSettings(width=64, height=64))
        viewer.load_metadata(tmp_path / "metadata.json")
        pump(viewer)
        loaded_before = viewer.stats()["cells"]["loaded"]
        assert loaded_before > 0
        # turn the camera fully around several times; cells despawn/respawn
        viewer.update(inputs=ViewerInput(looking=True, cursor_delta=(1600.0, 0.0)))
        pump(viewer)
        viewer.close()

    def test_debug_overlays_render(self, tmp_path):
        make_store(tmp_path)
        viewer = Viewer(RenderSettings(width=64, height=64))
        viewer.load_metadata(tmp_path / "metadata.json")
        pump(viewer)
        viewer.debug.show_bounding_box = True
        viewer.debug.show_cell_grid = True
        viewer.freeze_frustum()
        rgb, _, _ = viewer.render()
        assert rgb.shape == (64, 64, 3)
        viewer.close()

    def test_plane_normals_and_streaming_rects_render(self, tmp_path):
        """The two round-1 debug stragglers: frustum plane normals
        (debug.rs:115-202) and streaming-frustum far-plane rectangles
        (debug.rs:306-342) must both change the frame when toggled."""
        make_store(tmp_path)
        viewer = Viewer(RenderSettings(width=96, height=96))
        viewer.load_metadata(tmp_path / "metadata.json")
        pump(viewer)
        base, _, _ = viewer.render()

        viewer.freeze_frustum()
        viewer.debug.show_frustum = False  # isolate the normals toggle
        viewer.debug.show_plane_normals = True
        with_normals, _, _ = viewer.render()
        assert not np.array_equal(base, with_normals)

        viewer.debug.show_plane_normals = False
        viewer.debug.show_streaming_rects = True
        with_rects, _, _ = viewer.render()
        assert not np.array_equal(base, with_rects)
        assert not np.array_equal(with_normals, with_rects)
        viewer.close()

    def test_stats_shape(self, tmp_path):
        viewer = Viewer(RenderSettings(width=32, height=32))
        viewer.update()
        stats = viewer.stats()
        assert set(stats) == {"fps", "frame_time_ms", "metadata", "cells", "points"}
        viewer.close()


class TestInteractiveConverter:
    def test_frame_sliced_conversion_matches_offline(self, tmp_path):
        batch = random_batch(8_000, seed=15)
        src = tmp_path / "cloud.ply"
        write_ply(src, batch)

        conv = InteractiveConverter(batch_size=10_000)
        conv.choose_files([src])
        conv.save_at(tmp_path / "store")
        conv.start()
        for _ in range(10_000):
            conv.update()
            if conv.state == ConversionState.FINISHED:
                break
        assert conv.state == ConversionState.FINISHED
        assert conv.files[0].state == "finished"
        conv.flush()

        metadata = Metadata.from_path(tmp_path / "store" / "metadata.json")
        assert metadata.number_of_points == 8_000
        total = 0
        for h in range(metadata.hierarchies):
            hdir = tmp_path / "store" / f"h_{h}"
            if not hdir.exists():
                continue
            for p in hdir.iterdir():
                total += Cell.from_path(p).total_number_of_points
        assert total == 8_000

    def test_failed_file_recorded_and_skipped(self, tmp_path):
        bad = tmp_path / "bad.ply"
        bad.write_bytes(b"not a ply at all")
        good = tmp_path / "good.ply"
        write_ply(good, random_batch(100, seed=16))

        conv = InteractiveConverter(batch_size=10_000)
        conv.choose_files([bad, good, tmp_path / "skip.xyz"])
        conv.save_at(tmp_path / "store")
        conv.start()
        for _ in range(5_000):
            conv.update()
            if conv.state == ConversionState.FINISHED:
                break
        states = [f.state for f in conv.progress()]
        assert states[0] == "failed"
        assert states[1] == "finished"
        assert states[2] == "no_reader"
        assert conv.metadata.number_of_points == 100

    def test_live_feed_into_viewer(self, tmp_path):
        src = tmp_path / "c.ply"
        write_ply(src, random_batch(3_000, seed=17, lo=-20, hi=20))
        viewer = Viewer(RenderSettings(width=64, height=64))
        conv = InteractiveConverter(viewer=viewer)
        conv.choose_files([src])
        conv.start()
        for _ in range(5_000):
            conv.update()
            if conv.state == ConversionState.FINISHED:
                break
            time.sleep(0.001)  # yield to the async batch-read thread
        assert conv.state == ConversionState.FINISHED
        assert viewer.stats()["cells"]["loaded"] > 0
        viewer.camera.look_at_aabb(conv.metadata.bounding_box)
        rgb, depth, _ = viewer.render()
        assert (depth < 1.0).sum() > 0
        viewer.close()

    def test_mid_conversion_frames_track_cell_growth(self, tmp_path):
        """Frames rendered DURING conversion must include each batch's
        points as it lands: the converter mutates already-loaded cells
        in place (converter.rs:553-592), so the renderer's device caches
        have to invalidate on content, not just cell identity."""
        src = tmp_path / "c.ply"
        write_ply(src, random_batch(30_000, seed=19, lo=-20, hi=20))
        viewer = Viewer(RenderSettings(width=64, height=64))
        conv = InteractiveConverter(viewer=viewer, batch_size=10_000)
        conv.choose_files([src])
        conv.start()

        seen_points_in = []
        for _ in range(5_000):
            conv.update()
            done = conv.state == ConversionState.FINISHED
            if viewer.stats()["cells"]["loaded"] > 0:
                viewer.camera.look_at_aabb(conv.metadata.bounding_box)
                _, _, stats = viewer.render()
                seen_points_in.append(stats["points_in"])
            if done:
                break
            time.sleep(0.001)
        assert conv.state == ConversionState.FINISHED
        assert seen_points_in, "no frame rendered during conversion"
        # the last frame sees every converted point; a stale cache would
        # freeze points_in at the first batch's count
        assert seen_points_in[-1] == 30_000
        assert seen_points_in[-1] > seen_points_in[0] or (
            seen_points_in[0] == 30_000
        )
        viewer.close()


class TestStopResume:
    def test_stop_pauses_and_start_resumes(self, tmp_path):
        src = tmp_path / "c.ply"
        write_ply(src, random_batch(30_000, seed=18))
        conv = InteractiveConverter(batch_size=10_000)
        conv.choose_files([src])
        conv.save_at(tmp_path / "store")
        conv.start()
        for _ in range(3):
            conv.update()
        conv.stop()
        points_at_stop = conv.metadata.number_of_points
        for _ in range(20):
            conv.update()  # paused: no progress
        assert conv.metadata.number_of_points == points_at_stop
        conv.start()
        for _ in range(20_000):
            conv.update()
            if conv.state == ConversionState.FINISHED:
                break
        assert conv.state == ConversionState.FINISHED
        assert conv.metadata.number_of_points == 30_000


class TestScreenshot:
    def test_screenshot_writes_png(self, tmp_path):
        make_store(tmp_path / "store", n=5_000)
        from point_cloud_tpu import Viewer  # top-level export

        viewer = Viewer(RenderSettings(width=64, height=48))
        viewer.load_metadata(tmp_path / "store" / "metadata.json")
        pump(viewer, frames=100)
        out = tmp_path / "shot.png"
        stats = viewer.screenshot(out)
        assert out.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"
        assert stats["points_in"] > 0
        viewer.close()

    def test_tight_update_loop_still_streams(self, tmp_path):
        """A zero-delay update loop must not starve the asset pool (GIL
        starvation found in round 2): cells must load without the caller
        sleeping between frames."""
        make_store(tmp_path)
        viewer = Viewer(RenderSettings(width=32, height=32))
        viewer.load_metadata(tmp_path / "metadata.json")
        for _ in range(400):  # no sleeps: the tightest possible loop
            viewer.update(0.0)
            if viewer.stats()["cells"]["loaded"] > 0:
                break
        assert viewer.stats()["cells"]["loaded"] > 0
        viewer.close()


class TestPipelinedViewer:
    def test_pipelined_matches_sync_and_overlay_camera(self, tmp_path):
        """Viewer.render_pipelined returns each frame one call late,
        byte-identical to a synchronous render of the same state —
        including debug overlays, which must be drawn with the
        view-projection captured when THEIR frame was dispatched, not
        the camera's position at readback time."""
        make_store(tmp_path)

        def fresh():
            v = Viewer(RenderSettings(width=160, height=120))
            v.load_metadata(tmp_path / "metadata.json")
            v.debug.show_bounding_box = True
            pump(v)
            return v

        v_sync = fresh()
        ref_a, _, _ = v_sync.render()
        v_sync.close()

        v_pipe = fresh()
        assert v_pipe.render_pipelined() is None  # first call: in flight
        # move the camera BEFORE the frame lands: the returned frame A
        # must still carry pose A's image and pose A's bbox wireframe
        v_pipe.update(0.016, inputs=ViewerInput(forward=1.0))
        out = v_pipe.render_pipelined()
        assert out is not None
        np.testing.assert_array_equal(out[0], ref_a)
        # drain frame B; afterwards nothing is in flight
        assert v_pipe.render_flush() is not None
        assert v_pipe.render_flush() is None
        v_pipe.close()
