"""Asset manager, sources, thread pool, fly cam tests."""

import time

import numpy as np
import pytest

from point_cloud_tpu.utils.assets import (
    AssetEventKind,
    AssetHandle,
    AssetManager,
)
from point_cloud_tpu.utils.source import (
    Directory,
    NoSource,
    PathSource,
    SourceError,
    UrlSource,
)
from point_cloud_tpu.utils.thread_pool import ThreadPool


def wait_for(pred, timeout=5.0):
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        if pred():
            return True
        time.sleep(0.005)
    return False


def poll_until_events(manager, timeout=5.0):
    """Poll the manager until at least one event arrives."""
    events = []
    wait_for(lambda: events.extend(manager.poll_events()) or events, timeout)
    return events


class TestThreadPool:
    def test_execute_runs_jobs(self):
        results = []
        with ThreadPool(2) as pool:
            for i in range(20):
                pool.execute(lambda i=i: results.append(i))
            assert wait_for(lambda: len(results) == 20)
        assert sorted(results) == list(range(20))

    def test_execute_async(self):
        results = []

        async def job(i):
            results.append(i)

        with ThreadPool(2) as pool:
            for i in range(5):
                pool.execute_async(job(i))
            assert wait_for(lambda: len(results) == 5)

    def test_job_failure_does_not_kill_worker(self):
        results = []
        with ThreadPool(1) as pool:
            pool.execute(lambda: 1 / 0)
            pool.execute(lambda: results.append("ok"))
            assert wait_for(lambda: results == ["ok"])

    def test_close_joins(self):
        pool = ThreadPool(2)
        pool.close()
        with pytest.raises(RuntimeError):
            pool.execute(lambda: None)


class TestSources:
    def test_path_source_round_trip(self, tmp_path):
        src = PathSource(tmp_path / "sub" / "file.bin")
        src.save(b"hello")
        assert src.load() == b"hello"

    def test_directory_join_rejects_escape(self, tmp_path):
        d = Directory(tmp_path)
        with pytest.raises(SourceError):
            d.join("../evil")
        with pytest.raises(SourceError):
            d.join("/abs")
        assert d.join("h_0/c_0_0_0.bin") == PathSource(
            tmp_path / "h_0" / "c_0_0_0.bin"
        )

    def test_url_source_404_is_not_found(self):
        import http.server
        import threading

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                if self.path == "/exists":
                    body = b"data!"
                    self.send_response(200)
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self.send_error(404)

            def log_message(self, *args):
                pass

        server = http.server.HTTPServer(("127.0.0.1", 0), Handler)
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        try:
            port = server.server_address[1]
            assert UrlSource(f"http://127.0.0.1:{port}/exists").load() == b"data!"
            with pytest.raises(FileNotFoundError):
                UrlSource(f"http://127.0.0.1:{port}/missing").load()
        finally:
            server.shutdown()

    def test_url_directory_join(self):
        d = Directory("http://host/store")
        assert d.join("h_0/c.bin") == UrlSource("http://host/store/h_0/c.bin")


class TestAssetManager:
    def make_manager(self, **kwargs):
        return AssetManager(
            parse=lambda b: b.decode(),
            serialize=lambda s: s.encode(),
            **kwargs,
        )

    def test_async_load_and_events(self, tmp_path):
        (tmp_path / "a.txt").write_bytes(b"content")
        m = self.make_manager()
        m.load("a", PathSource(tmp_path / "a.txt"))
        events = poll_until_events(m)
        assert [e.kind for e in events] == [AssetEventKind.LOADED]
        assert not m.is_loading("a")
        assert m.get("a") == "content"
        m.close()

    def test_load_error_event(self, tmp_path):
        m = self.make_manager()
        m.load("missing", PathSource(tmp_path / "nope.txt"))
        events = poll_until_events(m)
        assert events[0].kind == AssetEventKind.ERROR
        assert isinstance(events[0].error, FileNotFoundError)
        assert m.get("missing") is None
        m.close()

    def test_duplicate_loads_coalesce(self, tmp_path):
        (tmp_path / "a.txt").write_bytes(b"x")
        m = self.make_manager()
        for _ in range(5):
            m.load("a", PathSource(tmp_path / "a.txt"))
        events = poll_until_events(m)
        assert sum(e.kind == AssetEventKind.LOADED for e in events) == 1
        m.close()

    def test_refcount_eviction_with_auto_save(self, tmp_path):
        m = self.make_manager(auto_save=True)
        target = tmp_path / "b.txt"
        handle = m.insert("b", "dirty-content", PathSource(target))
        assert "b" in m
        handle2 = handle.clone()
        handle.release()
        assert "b" in m  # still one handle
        handle2.release()
        assert "b" not in m  # evicted
        assert target.read_bytes() == b"dirty-content"  # auto-saved

    def test_eviction_without_auto_save_drops(self, tmp_path):
        m = self.make_manager(auto_save=False)
        target = tmp_path / "c.txt"
        handle = m.insert("c", "content", PathSource(target))
        handle.release()
        assert not target.exists()

    def test_get_mut_marks_dirty_and_save_all(self, tmp_path):
        m = self.make_manager()
        target = tmp_path / "d.txt"
        handle = m.insert("d", "v1", PathSource(target), saved=True)
        assert m.save_all() == 0
        assert m.get_mut("d") == "v1"
        assert m.save_all() == 1
        assert target.read_bytes() == b"v1"
        events = m.poll_events()
        assert AssetEventKind.CHANGED in [e.kind for e in events]


class TestFlyCam:
    def test_move_forward_planar(self):
        from point_cloud_tpu.render.fly_cam import FlyCam

        cam = FlyCam()
        cam._apply_rotation()  # yaw=0, pitch=0 -> forward = +Y (Z-up frame)
        np.testing.assert_allclose(
            cam.transform.forward(), [0, 1, 0], atol=1e-6
        )
        cam.speed = 10.0
        cam.move(0.5, forward=1.0)
        np.testing.assert_allclose(
            cam.transform.translation, [0, 5, 0], atol=1e-5
        )

    def test_pitch_clamped(self):
        from point_cloud_tpu.render.fly_cam import PITCH_LIMIT, FlyCam

        cam = FlyCam()
        cam.looking = True
        cam.rotate(0.0, -1e6)
        assert cam.pitch == pytest.approx(PITCH_LIMIT)
        # looking straight up-ish: forward ~ +Z
        assert cam.transform.forward()[2] > 0.99

    def test_no_rotate_or_speed_unless_looking(self):
        from point_cloud_tpu.render.fly_cam import FlyCam

        cam = FlyCam()
        cam.rotate(100.0, 100.0)
        assert cam.yaw == 0.0 and cam.pitch == 0.0
        s0 = cam.speed
        cam.adjust_speed(3)
        assert cam.speed == s0
        cam.looking = True
        cam.adjust_speed(3)
        assert cam.speed == s0 + 15.0

    def test_speed_clamped(self):
        from point_cloud_tpu.render.fly_cam import SPEED_MAX, SPEED_MIN, FlyCam

        cam = FlyCam()
        cam.looking = True
        cam.adjust_speed(1e6)
        assert cam.speed == SPEED_MAX
        cam.adjust_speed(-1e6)
        assert cam.speed == SPEED_MIN

    def test_ascend_world_z(self):
        from point_cloud_tpu.render.fly_cam import FlyCam

        cam = FlyCam()
        cam.looking = True
        cam.rotate(500.0, 200.0)  # arbitrary orientation
        cam.speed = 10.0
        cam.move(1.0, ascend=1.0)
        np.testing.assert_allclose(
            cam.transform.translation, [0, 0, 10], atol=1e-5
        )


class TestUrlErrors:
    def test_server_error_is_source_error_not_missing(self):
        import http.server
        import threading

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                self.send_error(500)

            def log_message(self, *args):
                pass

        server = http.server.HTTPServer(("127.0.0.1", 0), Handler)
        threading.Thread(target=server.serve_forever, daemon=True).start()
        try:
            port = server.server_address[1]
            with pytest.raises(SourceError):
                UrlSource(f"http://127.0.0.1:{port}/x").load()
        finally:
            server.shutdown()
