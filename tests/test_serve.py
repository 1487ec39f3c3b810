"""Store HTTP server tests: static streaming + remote render, plus a
remote Viewer streaming from the server (the web-viewer-over-HTTP parity)."""

import threading
import urllib.request

import numpy as np
import pytest

from point_cloud_tpu.convert.converter import Converter
from point_cloud_tpu.core.metadata import Metadata
from point_cloud_tpu.core.point import PointBatch


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("servestore")
    rng = np.random.default_rng(20)
    pos = rng.uniform(-40, 40, (15_000, 3)).astype(np.float32)
    col = rng.integers(0, 256, (15_000, 4), dtype=np.uint8)
    with Converter(Metadata(), tmp) as conv:
        conv.add_points_batch(PointBatch(pos, col))
    return tmp


_HTTPD = {}


@pytest.fixture(scope="module")
def server(store):
    from point_cloud_tpu.serve import serve

    httpd = serve(store, host="127.0.0.1", port=0, width=96, height=64)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    _HTTPD["main"] = httpd
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


@pytest.fixture()
def store_server(server):
    """The default StoreServer behind the module HTTP server."""
    httpd = _HTTPD["main"]
    return httpd.registry.get(httpd.registry.default)


def get(url):
    # generous timeout: the first /render compiles kernels
    with urllib.request.urlopen(url, timeout=180) as resp:
        return resp.status, resp.read()


class TestStoreServer:
    def test_metadata_served_verbatim(self, server, store):
        status, body = get(f"{server}/metadata.json")
        assert status == 200
        assert body == (store / "metadata.json").read_bytes()

    def test_cell_files_served(self, server, store):
        cell = next((store / "h_0").iterdir())
        status, body = get(f"{server}/h_0/{cell.name}")
        assert status == 200
        assert body == cell.read_bytes()

    def test_missing_cell_404(self, server):
        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as err:
            get(f"{server}/h_0/c_999_999_999.bin")
        assert err.value.code == 404

    def test_path_escape_rejected(self, server):
        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as err:
            get(f"{server}/h_0/..%2f..%2fetc%2fpasswd")
        assert err.value.code in (400, 403, 404)

    def test_remote_render_returns_png(self, server):
        status, body = get(f"{server}/render?yaw=0.5&pitch=-0.5")
        assert status == 200
        assert body[:8] == b"\x89PNG\r\n\x1a\n"
        assert len(body) > 100

    def test_remote_viewer_streams_over_http(self, server):
        """A Viewer on 'another machine' streams cells via UrlSource."""
        from point_cloud_tpu.render.renderer import RenderSettings
        from point_cloud_tpu.viewer import Viewer

        viewer = Viewer(RenderSettings(width=96, height=64))
        viewer.load_metadata(f"{server}/metadata.json")
        assert viewer.metadata.number_of_points == 15_000
        import time

        for _ in range(400):
            viewer.update()
            if (
                not viewer.streamer.loading
                and len(viewer.streamer.should_load) == 0
                and not viewer.cell_assets._loading
            ):
                break
            time.sleep(0.005)
        assert viewer.stats()["cells"]["loaded"] > 0
        rgb, depth, _ = viewer.render()
        assert (depth < 1.0).sum() > 0
        viewer.close()


class TestBrowserClient:
    def test_index_serves_interactive_page(self, server):
        status, body = get(f"{server}/")
        assert status == 200
        text = body.decode()
        assert "point-cloud-tpu viewer" in text
        assert "/render?" in text          # the page drives the render API
        assert "pointerdown" in text       # mouse orbit wiring
        assert "wheel" in text             # zoom wiring
        assert "/stats" in text            # stats panel data source
        assert "conv_upload" in text       # bring-your-own-cloud upload
        assert "/upload?filename=" in text

    def test_stats_endpoint(self, server):
        import json

        status, body = get(f"{server}/stats")
        assert status == 200
        stats = json.loads(body)
        assert stats["number_of_points"] == 15_000
        assert stats["hierarchies"] >= 1
        assert stats["auto_distance"] > 0

    def test_camera_params_round_trip(self, server):
        import urllib.request

        url = f"{server}/render?yaw=1.25&pitch=-0.5&dist=77.5"
        with urllib.request.urlopen(url, timeout=180) as resp:
            assert resp.status == 200
            echo = resp.headers["X-Camera"]
            body = resp.read()
        assert echo == "yaw=1.25 pitch=-0.5 orbit dist=77.5"
        assert body[:8] == b"\x89PNG\r\n\x1a\n"

    def test_bad_camera_param_is_400(self, server):
        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as err:
            get(f"{server}/render?yaw=sideways")
        assert err.value.code == 400

    def test_different_angles_differ(self, server):
        _, a = get(f"{server}/render?yaw=0.3&pitch=-0.4")
        _, b = get(f"{server}/render?yaw=2.4&pitch=-0.2")
        assert a != b


class TestMultiStore:
    @pytest.fixture(scope="class")
    def multi_root(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("stores")
        for name, seed in (("alpha", 1), ("beta", 2)):
            rng = np.random.default_rng(seed)
            with Converter(Metadata(), root / name) as conv:
                conv.add_points_batch(PointBatch(
                    rng.uniform(-30, 30, (3_000, 3)).astype(np.float32),
                    rng.integers(0, 256, (3_000, 4)).astype(np.uint8),
                ))
        (root / "not_a_store").mkdir()
        return root

    @pytest.fixture(scope="class")
    def multi_server(self, multi_root):
        from point_cloud_tpu.serve import serve

        httpd = serve(multi_root, host="127.0.0.1", port=0,
                      width=64, height=48)
        thread = threading.Thread(target=httpd.serve_forever, daemon=True)
        thread.start()
        yield f"http://127.0.0.1:{httpd.server_address[1]}"
        httpd.shutdown()

    def test_store_listing(self, multi_server):
        import json

        _, body = get(f"{multi_server}/stores")
        info = json.loads(body)
        assert info["stores"] == ["alpha", "beta"]  # not_a_store excluded
        assert info["default"] == "alpha"

    def test_scoped_endpoints(self, multi_server, multi_root):
        _, meta_b = get(f"{multi_server}/s/beta/metadata.json")
        assert meta_b == (multi_root / "beta" / "metadata.json").read_bytes()
        _, stats = get(f"{multi_server}/s/beta/stats")
        import json

        assert json.loads(stats)["number_of_points"] == 3_000
        status, png = get(f"{multi_server}/s/beta/render?yaw=0.4")
        assert status == 200 and png[:8] == b"\x89PNG\r\n\x1a\n"

    def test_unknown_store_404(self, multi_server):
        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as err:
            get(f"{multi_server}/s/gamma/stats")
        assert err.value.code == 404

    def test_default_store_unscoped(self, multi_server, multi_root):
        # unscoped endpoints keep working against the default store
        _, meta = get(f"{multi_server}/metadata.json")
        assert meta == (multi_root / "alpha" / "metadata.json").read_bytes()

    def test_page_has_picker_wiring(self, multi_server):
        _, body = get(f"{multi_server}/")
        text = body.decode()
        assert "/stores" in text and 'id="store"' in text

    def test_percent_encoded_store_name(self, tmp_path):
        """Store directories with URL-unsafe names must resolve through
        the client's encodeURIComponent requests."""
        from point_cloud_tpu.serve import serve

        rng = np.random.default_rng(4)
        name = "my store #1"
        with Converter(Metadata(), tmp_path / name) as conv:
            conv.add_points_batch(PointBatch(
                rng.uniform(-10, 10, (500, 3)).astype(np.float32),
                rng.integers(0, 256, (500, 4)).astype(np.uint8),
            ))
        httpd = serve(tmp_path, host="127.0.0.1", port=0, width=32,
                      height=24)
        thread = threading.Thread(target=httpd.serve_forever, daemon=True)
        thread.start()
        try:
            from urllib.parse import quote

            base = f"http://127.0.0.1:{httpd.server_address[1]}"
            import json

            _, body = get(f"{base}/stores")
            assert json.loads(body)["stores"] == [name]
            _, stats = get(f"{base}/s/{quote(name, safe='')}/stats")
            assert json.loads(stats)["number_of_points"] == 500
        finally:
            httpd.shutdown()


class TestFlyCamera:
    def test_fly_pose_renders(self, server):
        import urllib.request

        url = (f"{server}/render?px=10.5&py=-20&pz=30&yaw=2.0&pitch=-0.1")
        with urllib.request.urlopen(url, timeout=180) as resp:
            assert resp.status == 200
            echo = resp.headers["X-Camera"]
            body = resp.read()
        assert echo == "yaw=2.0 pitch=-0.1 fly eye=(10.5,-20.0,30.0)"
        assert body[:8] == b"\x89PNG\r\n\x1a\n"

    def test_fly_differs_from_orbit(self, server):
        _, orbit = get(f"{server}/render?yaw=2.0&pitch=-0.1")
        _, fly = get(f"{server}/render?px=10.5&py=-20&pz=30&yaw=2.0&pitch=-0.1")
        assert orbit != fly

    def test_partial_eye_params_400(self, server):
        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as err:
            get(f"{server}/render?px=1&py=2")  # pz missing
        assert err.value.code == 400

    def test_stats_center(self, server):
        import json

        _, body = get(f"{server}/stats")
        center = json.loads(body)["center"]
        assert len(center) == 3

    def test_page_has_fly_wiring(self, server):
        _, body = get(f"{server}/")
        text = body.decode()
        assert "keydown" in text and "enterFlyMode" in text


def post_json(url, payload):
    import json

    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=180) as resp:
        return resp.status, json.loads(resp.read())


def get_json(url):
    import json

    status, body = get(url)
    return status, json.loads(body)


class TestSettingsEndpoint:
    """The egui panel surface over HTTP (ui.rs:122-146, debug.rs:21-36,
    frustums.rs:14-25, cell/shader.rs:173-207)."""

    def test_settings_round_trip(self, server):
        status, s = get_json(f"{server}/settings")
        assert status == 200
        assert s["stream_enabled"] is True
        assert s["streaming_scale"] == 2.0
        assert s["debug"]["show_bounding_box"] is False

        assert len(s["camera_position"]) == 3  # camera.rs:193-204
        assert s["fly_speed"] == 50.0  # fly_cam.rs default

        patch = {
            "voronoi": False,
            "size_by_distance": True,
            "max_hierarchy": 2,
            "footprint": 7,
            "occlusion": False,
            "hidden_hierarchies": [1],
            "stream_enabled": False,
            "streaming_scale": 3.5,
            "fly_speed": 20000.0,  # clamped to SPEED_MAX
            "debug": {"show_bounding_box": True, "show_cell_grid": True},
        }
        status, s2 = post_json(f"{server}/settings", patch)
        assert status == 200
        assert s2["voronoi"] is False
        assert s2["size_by_distance"] is True
        assert s2["max_hierarchy"] == 2
        assert s2["footprint"] == 7
        assert s2["occlusion"] is False
        assert s2["hidden_hierarchies"] == [1]
        assert s2["stream_enabled"] is False
        assert s2["streaming_scale"] == 3.5
        assert s2["fly_speed"] == 1000.0
        assert s2["debug"]["show_bounding_box"] is True
        assert s2["debug"]["show_cell_grid"] is True

        status, s3 = get_json(f"{server}/settings")
        assert s3 == s2

        # restore for other tests
        post_json(f"{server}/settings", {
            "voronoi": True, "size_by_distance": False, "max_hierarchy": 0,
            "footprint": 5, "occlusion": True, "hidden_hierarchies": [],
            "stream_enabled": True, "streaming_scale": 2.0,
            "debug": {"show_bounding_box": False, "show_cell_grid": False},
        })

    def test_bad_settings_rejected(self, server):
        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as err:
            post_json(f"{server}/settings", {"footprint": 4})
        assert err.value.code == 400

    def test_render_voronoi_param_is_per_request(self, server):
        """GET /render?voronoi=... overrides one frame only — persistent
        changes go through POST /settings — and boolean spellings parse
        case-insensitively ('False' must not mean true)."""
        _, before = get_json(f"{server}/settings")
        flipped = "0" if before["voronoi"] else "1"
        status, _ = get(f"{server}/render?voronoi={flipped}")
        assert status == 200
        _, after = get_json(f"{server}/settings")
        assert after["voronoi"] == before["voronoi"]  # not sticky

        _, img_false = get(f"{server}/render?voronoi=False")
        _, img_zero = get(f"{server}/render?voronoi=0")
        _, img_true = get(f"{server}/render?voronoi=1")
        assert img_false == img_zero  # 'False' parses as false
        assert img_false != img_true  # and the override takes effect

    def test_freeze_frustum_renders_overlay(self, server):
        status, _ = post_json(
            f"{server}/settings", {"freeze_frustum": True}
        )
        assert status == 200
        status, s = get_json(f"{server}/settings")
        assert s["debug"]["show_frustum"] is True
        status, png = get(f"{server}/render?yaw=0.3")
        assert status == 200 and png[:4] == b"\x89PNG"
        post_json(f"{server}/settings",
                  {"debug": {"show_frustum": False}})

    def test_converter_disabled_without_root(self, server):
        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as err:
            get(f"{server}/convert/files?dir=")
        assert err.value.code == 403


@pytest.fixture()
def conv_server(store, tmp_path):
    from point_cloud_tpu.io.ply import write_ply

    root = tmp_path / "inputs"
    root.mkdir()
    rng = np.random.default_rng(44)
    batch = PointBatch(
        rng.uniform(-30, 30, (9_000, 3)).astype(np.float32),
        rng.integers(0, 256, (9_000, 4)).astype(np.uint8),
    )
    write_ply(root / "cloud.ply", batch)
    (root / "out").mkdir()

    from point_cloud_tpu.serve import serve

    httpd = serve(store, host="127.0.0.1", port=0, width=64,
                  height=48, convert_root=root)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}", root, batch
    httpd.shutdown()


class TestConvertEndpoint:
    """The in-app converter driven over HTTP (converter.rs:723-848):
    choose files / save at / start / per-file progress, and the
    resulting store must be byte-correct."""

    def test_http_conversion_byte_correct(self, conv_server, tmp_path):
        import time

        url, root, batch = conv_server
        status, body = get_json(f"{url}/convert/files?dir=")
        assert status == 200
        assert "cloud.ply" in body["files"]

        post_json(f"{url}/convert", {"action": "new_cloud"})
        # batch-size knob (reference slider 10k-500k, converter.rs:594-607):
        # round-trips through status and clamps out-of-range requests
        status, st = post_json(
            f"{url}/convert", {"action": "batch_size", "value": 20_000})
        assert status == 200 and st["batch_size"] == 20_000
        status, st = post_json(
            f"{url}/convert", {"action": "batch_size", "value": 1})
        assert st["batch_size"] == 10_000
        post_json(f"{url}/convert", {"action": "batch_size",
                                     "value": 50_000})
        post_json(f"{url}/convert",
                  {"action": "choose", "files": ["cloud.ply"]})
        post_json(f"{url}/convert", {"action": "save_at",
                                     "directory": "out"})
        status, st = post_json(f"{url}/convert", {"action": "start"})
        assert status == 200
        deadline = time.time() + 300
        while time.time() < deadline:
            status, st = get_json(f"{url}/convert")
            if st["state"] == "finished":
                break
            time.sleep(0.3)
        assert st["state"] == "finished", st
        assert st["files"][0]["state"] == "finished"
        assert st["files"][0]["remaining"] == 0

        # byte-correctness: offline conversion of the same input
        with Converter(Metadata(), tmp_path / "offline") as conv:
            for i in range(0, len(batch), 50_000):
                conv.add_points_batch(batch[i : i + 50_000])
        offline = {
            p.relative_to(tmp_path / "offline"): p.read_bytes()
            for p in sorted((tmp_path / "offline").rglob("*"))
            if p.is_file()
        }
        http_store = {
            p.relative_to(root / "out"): p.read_bytes()
            for p in sorted((root / "out").rglob("*")) if p.is_file()
        }
        assert set(offline) == set(http_store)
        for name in offline:
            assert offline[name] == http_store[name], name

    def test_escape_rejected(self, conv_server):
        import urllib.error

        url, _, _ = conv_server
        with pytest.raises(urllib.error.HTTPError) as err:
            get(f"{url}/convert/files?dir=../")
        assert err.value.code == 403

    def test_concurrent_starts_spawn_one_pump(self, conv_server):
        """ThreadingHTTPServer handles requests in parallel: racing
        start POSTs must not spawn two pump threads (each would run
        conv.update()/flush(), double-driving the conversion)."""
        import concurrent.futures

        url, _, _ = conv_server
        post_json(f"{url}/convert",
                  {"action": "choose", "files": ["cloud.ply"]})
        with concurrent.futures.ThreadPoolExecutor(8) as pool:
            results = list(pool.map(
                lambda _: post_json(f"{url}/convert", {"action": "start"}),
                range(8),
            ))
        assert all(status == 200 for status, _ in results)
        pumps = [
            t for t in threading.enumerate()
            if t.name == "pct-convert-pump" and t.is_alive()
        ]
        assert len(pumps) <= 1, pumps


class TestExportEndpoint:
    def test_ply_download_round_trips(self, server, store, tmp_path):
        from point_cloud_tpu.core.cell import Cell
        from point_cloud_tpu.io.ply import PlyPointReader

        status, body = get(f"{server}/export?format=ply")
        assert status == 200
        out = tmp_path / "dl.ply"
        out.write_bytes(body)
        reader = PlyPointReader(out)
        total = reader.total_points()
        meta = Metadata.from_path(store / "metadata.json")
        assert total == meta.number_of_points
        batch = reader.get_batch(total)
        chunks = []
        for path in sorted(store.rglob("*.bin")):
            chunks.append(Cell.from_path(path).all_points())
        stored = PointBatch.concat(chunks)

        def rows(b):
            r = np.concatenate(
                [b.positions.view(np.uint32),
                 b.colors.astype(np.uint32)], axis=1,
            )
            return r[np.lexsort(r.T[::-1])]

        np.testing.assert_array_equal(rows(batch), rows(stored))

    def test_las_download_parses(self, server, tmp_path):
        from point_cloud_tpu.io.las import LasPointReader

        status, body = get(f"{server}/export?format=las&point_format=3")
        assert status == 200
        out = tmp_path / "dl.las"
        out.write_bytes(body)
        reader = LasPointReader(out)
        assert reader.total_points() > 0
        assert len(reader.get_batch(1024)) == 1024

    def test_bad_format_400(self, server):
        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as err:
            get(f"{server}/export?format=xyz")
        assert err.value.code == 400

    def test_hostile_format_400(self, server):
        """Slash/traversal format values must 400 before they reach a
        tempfile suffix (no hung connection, no file outside tmp)."""
        import urllib.error

        for hostile in ("a%2Fb", "..%2F..%2Ftmp%2Fx", "." , "%2e%2e"):
            with pytest.raises(urllib.error.HTTPError) as err:
                get(f"{server}/export?format={hostile}")
            assert err.value.code == 400

    def test_bad_scale_400(self, server):
        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as err:
            get(f"{server}/export?format=las&scale=0")
        assert err.value.code == 400

    def test_page_has_export_wiring(self, server):
        status, body = get(f"{server}/")
        page = body.decode()
        assert "export_btn" in page and "export?format=" in page

    def test_hostile_store_name_cannot_inject_headers(
        self, server, store_server
    ):
        """metadata.name comes from the (possibly hostile) store's
        metadata.json; quotes/CRLF must not corrupt Content-Disposition
        (response-header injection, advisor r3)."""
        prev = store_server.metadata.name
        store_server.metadata.name = 'ev"il\r\nSet-Cookie: pwned=1\x7f'
        try:
            with urllib.request.urlopen(
                f"{server}/export?format=ply", timeout=180
            ) as resp:
                cd = resp.headers["Content-Disposition"]
                assert resp.headers.get("Set-Cookie") is None
                assert "\r" not in cd and "\n" not in cd
                # the injection attempt is neutralized into a plain
                # in-quotes filename (quotes/CR/LF/control chars gone)
                assert cd == (
                    'attachment; filename="evilSet-Cookie: pwned=1.ply"'
                )
        finally:
            store_server.metadata.name = prev


class TestRenderOverrideHygiene:
    def test_voronoi_override_restored_on_early_exception(
        self, store_server
    ):
        """A per-request ?voronoi override must be restored even when the
        handler fails before v.render() (advisor r3: the old try/finally
        started too late and leaked the override into settings)."""
        v = store_server.viewer
        prev = v.settings.voronoi
        orig = store_server._drain_streaming
        store_server._drain_streaming = lambda: (_ for _ in ()).throw(
            RuntimeError("streaming blew up")
        )
        try:
            with pytest.raises(RuntimeError):
                store_server.render_png(voronoi=not prev)
            assert v.settings.voronoi == prev
        finally:
            store_server._drain_streaming = orig


class TestUploadEndpoint:
    """Bring-your-own-cloud (reference: src/web.rs:5-53 client-side dir
    access; here: raw-body POST /upload -> /convert -> rendered frame),
    with size limits and path hygiene."""

    def _post_raw(self, url, data, timeout=120):
        import urllib.request

        req = urllib.request.Request(url, data=data, method="POST")
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.status, resp.read()

    def test_upload_convert_render(self, conv_server, tmp_path):
        import time

        from point_cloud_tpu.io.las import write_las

        url, root, _ = conv_server
        rng = np.random.default_rng(55)
        batch = PointBatch(
            rng.uniform(-20, 20, (4_000, 3)).astype(np.float32),
            rng.integers(0, 256, (4_000, 4)).astype(np.uint8),
        )
        src = tmp_path / "mine.las"
        write_las(src, batch)

        status, body = self._post_raw(
            f"{url}/upload?filename=mine.las", src.read_bytes()
        )
        assert status == 200
        import json as _json

        rel = _json.loads(body)["path"]
        assert rel == "uploads/mine.las"
        assert (root / rel).read_bytes() == src.read_bytes()

        # same name again: never clobbered, uniquified
        status, body = self._post_raw(
            f"{url}/upload?filename=mine.las", src.read_bytes()
        )
        assert _json.loads(body)["path"] == "uploads/mine_1.las"

        # convert the uploaded file into a fresh store
        post_json(f"{url}/convert", {"action": "new_cloud"})
        post_json(f"{url}/convert", {"action": "choose", "files": [rel]})
        status, st = post_json(f"{url}/convert", {"action": "start"})
        assert status == 200
        deadline = time.time() + 300
        while time.time() < deadline:
            status, st = get_json(f"{url}/convert")
            if st["state"] == "finished":
                break
            time.sleep(0.3)
        assert st["state"] == "finished", st
        assert st["number_of_points"] == 4_000

        # the converted cloud renders (cells published live)
        status, png = get(f"{url}/render?yaw=0.3&pitch=-0.4")
        assert status == 200
        assert png[:8] == b"\x89PNG\r\n\x1a\n"

    def test_upload_path_hygiene(self, conv_server):
        import urllib.error

        url, root, _ = conv_server
        # traversal collapses to a basename inside uploads/
        status, body = self._post_raw(
            f"{url}/upload?filename=..%2F..%2Fevil.ply", b"x" * 16
        )
        assert status == 200
        import json as _json

        rel = _json.loads(body)["path"]
        assert rel.startswith("uploads/") and ".." not in rel
        assert (root / rel).exists()
        # unknown suffixes rejected
        with pytest.raises(urllib.error.HTTPError) as err:
            self._post_raw(f"{url}/upload?filename=a.exe", b"x")
        assert err.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as err:
            self._post_raw(f"{url}/upload?filename=", b"x")
        assert err.value.code == 400

    def test_upload_size_limit(self, conv_server, monkeypatch):
        import urllib.error

        from point_cloud_tpu import serve as serve_mod

        url, _, _ = conv_server
        monkeypatch.setattr(serve_mod, "UPLOAD_LIMIT_BYTES", 64)
        with pytest.raises(urllib.error.HTTPError) as err:
            self._post_raw(f"{url}/upload?filename=big.ply", b"x" * 65)
        assert err.value.code == 413
        status, _ = self._post_raw(
            f"{url}/upload?filename=ok.ply", b"x" * 64
        )
        assert status == 200

    def test_upload_disabled_without_convert_root(self, server):
        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as err:
            self._post_raw(f"{server}/upload?filename=a.ply", b"x")
        assert err.value.code == 403


class TestStoreUpload:
    """Open an EXISTING converted store from the browser (closes SURVEY
    L9; the reference streams one client-side via the File System
    Access API, src/web.rs:5-53, metadata.rs:444-491): the store's
    files POST chunked + resumable into the registry, the server
    fsck-validates the result (validate.py), and every /s/<name>/
    endpoint then serves it like a local store."""

    def _post_raw(self, url, data, timeout=120):
        req = urllib.request.Request(url, data=data, method="POST")
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.status, resp.read()

    def _make_store(self, base_dir, seed=61, n=3_000):
        out = base_dir / "mystore"
        rng = np.random.default_rng(seed)
        with Converter(Metadata(), out) as conv:
            conv.add_points_batch(PointBatch(
                rng.uniform(-25, 25, (n, 3)).astype(np.float32),
                rng.integers(0, 256, (n, 4)).astype(np.uint8),
            ))
        return out

    def _upload_file(self, url, name, rel, data, chunk=None):
        from urllib.parse import quote

        chunk = chunk or max(len(data), 1)
        off = 0
        while True:
            part = data[off : off + chunk]
            status, _ = self._post_raw(
                f"{url}/upload_store?name={quote(name)}"
                f"&path={quote(rel, safe='')}&offset={off}",
                part,
            )
            assert status == 200
            off += len(part)
            if off >= len(data):
                return

    def _upload_store(self, url, src, name, chunk=None):
        for p in sorted(p for p in src.rglob("*") if p.is_file()):
            rel = p.relative_to(src).as_posix()
            self._upload_file(url, name, rel, p.read_bytes(), chunk)

    def test_upload_register_and_render(self, conv_server, tmp_path):
        import json as _json

        url, root, _ = conv_server
        src = self._make_store(tmp_path)
        # small chunks exercise the offset-append path on every file
        self._upload_store(url, src, "uploaded", chunk=1024)
        status, body = self._post_raw(
            f"{url}/upload_store/finish?name=uploaded", b""
        )
        assert status == 200
        fin = _json.loads(body)
        assert fin["registered"] is True
        assert fin["number_of_points"] == 3_000

        # listed, served verbatim, and renderable like any local store
        status, listing = get_json(f"{url}/stores")
        assert "uploaded" in listing["stores"]
        status, meta = get(f"{url}/s/uploaded/metadata.json")
        assert meta == (src / "metadata.json").read_bytes()
        a_cell = next((src / "h_0").glob("c_*.bin"))
        status, cell = get(f"{url}/s/uploaded/h_0/{a_cell.name}")
        assert cell == a_cell.read_bytes()
        status, png = get(f"{url}/s/uploaded/render?yaw=0.4&pitch=-0.5")
        assert status == 200
        assert png[:8] == b"\x89PNG\r\n\x1a\n"

    def test_resume_probe_and_offset_mismatch(self, conv_server):
        import json as _json
        import urllib.error

        url, _, _ = conv_server
        self._upload_file(url, "resume", "metadata.json", b"{", chunk=1)
        status, body = get(
            f"{url}/upload_store?name=resume&path=metadata.json"
        )
        assert _json.loads(body)["bytes"] == 1
        # wrong offset: rejected, current size reported for resume
        with pytest.raises(urllib.error.HTTPError) as err:
            self._post_raw(
                f"{url}/upload_store?name=resume&path=metadata.json"
                "&offset=5",
                b"xx",
            )
        assert err.value.code == 400
        assert b"current" in err.value.read()
        # the right offset continues
        status, _ = self._post_raw(
            f"{url}/upload_store?name=resume&path=metadata.json&offset=1",
            b"}",
        )
        assert status == 200
        status, body = get(
            f"{url}/upload_store?name=resume&path=metadata.json"
        )
        assert _json.loads(body)["bytes"] == 2

    def test_bad_paths_and_names_rejected(self, conv_server):
        import urllib.error

        url, _, _ = conv_server
        for bad in (
            "..%2Fmetadata.json", "h_0%2F..%2F..%2Fx.bin", "a.bin",
            "h_0%2Fc_0_0_0.txt", "metadata.json%2Fx", "h_x%2Fc_0_0_0.bin",
        ):
            with pytest.raises(urllib.error.HTTPError) as err:
                self._post_raw(
                    f"{url}/upload_store?name=ok&path={bad}", b"x"
                )
            assert err.value.code == 400, bad
        for badname in ("..", ".hidden", "a%2Fb", ""):
            with pytest.raises(urllib.error.HTTPError) as err:
                self._post_raw(
                    f"{url}/upload_store?name={badname}"
                    "&path=metadata.json",
                    b"x",
                )
            assert err.value.code == 400, badname

    def test_fsck_gates_registration(self, conv_server, tmp_path):
        import urllib.error

        url, _, _ = conv_server
        src = self._make_store(tmp_path, seed=62)
        self._upload_store(url, src, "fscked")
        a_cell = next((src / "h_0").glob("c_*.bin"))
        rel = f"h_0/{a_cell.name}"
        # corrupt one cell file; finish must refuse to register
        self._upload_file(url, "fscked", rel, b"garbage-not-a-cell")
        with pytest.raises(urllib.error.HTTPError) as err:
            self._post_raw(f"{url}/upload_store/finish?name=fscked", b"")
        assert err.value.code == 400
        assert b"validation" in err.value.read()
        status, listing = get_json(f"{url}/stores")
        assert "fscked" not in listing["stores"]
        # fix just the bad file and retry — now registers
        self._upload_file(url, "fscked", rel, a_cell.read_bytes())
        status, _ = self._post_raw(
            f"{url}/upload_store/finish?name=fscked", b""
        )
        assert status == 200
        status, listing = get_json(f"{url}/stores")
        assert "fscked" in listing["stores"]

    def test_finish_without_metadata_400(self, conv_server):
        import urllib.error

        url, _, _ = conv_server
        self._upload_file(url, "nometa", "h_0/c_0_0_0.bin", b"x" * 16)
        with pytest.raises(urllib.error.HTTPError) as err:
            self._post_raw(f"{url}/upload_store/finish?name=nometa", b"")
        assert err.value.code == 400

    def test_cannot_shadow_local_store(self, conv_server):
        import urllib.error

        url, _, _ = conv_server
        _, listing = get_json(f"{url}/stores")
        local = listing["default"]
        with pytest.raises(urllib.error.HTTPError) as err:
            self._post_raw(
                f"{url}/upload_store?name={local}&path=metadata.json",
                b"{}",
            )
        assert err.value.code == 400
        assert b"taken" in err.value.read()

    def test_disabled_without_convert_root(self, server):
        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as err:
            self._post_raw(
                f"{server}/upload_store?name=x&path=metadata.json", b"x"
            )
        assert err.value.code == 403

    def test_page_has_store_upload_wiring(self, server):
        _, page = get(f"{server}/")
        assert b"store_upload" in page
        assert b"upload_store" in page
        assert b"webkitdirectory" in page

    def test_chunked_raw_upload_appends(self, conv_server, tmp_path):
        """The raw-cloud /upload path (VERDICT r4 #7): chunked offset
        append assembles the same bytes one POST per chunk, and a
        too-large total is rejected at the offset sum."""
        import json as _json
        import urllib.error

        from point_cloud_tpu.io.ply import write_ply

        url, root, _ = conv_server
        rng = np.random.default_rng(63)
        batch = PointBatch(
            rng.uniform(-10, 10, (500, 3)).astype(np.float32),
            rng.integers(0, 256, (500, 4)).astype(np.uint8),
        )
        src = tmp_path / "chunky.ply"
        write_ply(src, batch)
        data = src.read_bytes()
        chunk = 1000
        name = "chunky.ply"
        rel = None
        for off in range(0, len(data), chunk):
            status, body = self._post_raw(
                f"{url}/upload?filename={name}&offset={off}",
                data[off : off + chunk],
            )
            assert status == 200
            rel = _json.loads(body)["path"]
            name = rel.split("/")[-1]  # server may uniquify chunk 0
        assert (root / rel).read_bytes() == data
        # offset mismatch rejected with the current size
        with pytest.raises(urllib.error.HTTPError) as err:
            self._post_raw(
                f"{url}/upload?filename={name}&offset=7", b"zz"
            )
        assert err.value.code == 400
