"""Store server: serve a converted cloud over HTTP + remote render API.

The reference ships a WASM/WebGPU build whose viewer streams cells over
HTTP from any static host (reference: src/web.rs, src/plugins/asset/
source.rs URL loading, index.html). The TPU-native equivalent serves both
halves:

- static store streaming — GET /metadata.json and /h_<n>/c_x_y_z.bin serve
  the raw files, so any :class:`~point_cloud_tpu.utils.source.UrlSource`
  viewer (including another machine running :class:`Viewer`) streams cells
  exactly like the reference's web viewer does,
- server-side rendering — GET /render?yaw=..&pitch=..&dist=..&w=..&h=..
  returns a PNG rendered on this host's accelerator, which is the
  TPU-deployment story: the heavy frame kernel runs next to the data and
  thin clients receive images.

Run: ``python -m point_cloud_tpu.serve <store_dir> [--port 8080]``.
"""

from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import parse_qs, unquote, urlparse

import numpy as np


class StoreServer:
    def __init__(self, store_dir, width=640, height=480):
        from .core.cell import Cell
        from .core.metadata import Metadata
        from .render.camera import Camera
        from .render.frustums import update_streaming_frustums
        from .render.renderer import PointRenderer, RenderSettings
        from .render.streaming import CellStreamer

        self.store_dir = Path(store_dir)
        self.metadata = Metadata.from_path(self.store_dir / "metadata.json")
        self._render_lock = threading.Lock()
        # PNG frames need RGB only; skipping the f32 depth plane halves
        # the per-frame device->host traffic (renderer.RenderSettings)
        self._settings = RenderSettings(
            width=width, height=height, transfer_depth=False
        )
        self._renderer = PointRenderer(self.metadata, self._settings)

        def loader(cell_id):
            path = self.store_dir / cell_id.path()
            return Cell.from_path(path) if path.exists() else None

        self._streamer = CellStreamer(self.metadata, loader=loader)
        self._camera_factory = Camera
        self._update_streaming = update_streaming_frustums

    def render_png(self, yaw=0.0, pitch=-0.4, dist=None,
                   voronoi=None, eye=None) -> bytes:
        """Stream the view's cells in and render one frame server-side.

        Two camera modes: orbit (default — yaw/pitch/dist around the
        cloud center) and fly (``eye`` = absolute camera position;
        yaw/pitch become the look direction — the reference's
        FlyCamController pose, fly_cam.rs:111-128)."""
        from .viewer.offscreen import write_png

        with self._render_lock:
            if voronoi is not None:
                self._settings.voronoi = bool(voronoi)
            camera = self._camera_factory()
            camera.projection.far = float(
                self.metadata.config.max_cell_size * 5.0
            )
            bbox = self.metadata.bounding_box
            center = bbox.center()
            up = np.array([0.0, 0.0, 1.0], np.float32)
            if eye is not None:
                pos = np.asarray(eye, np.float32)
                forward = np.array(
                    [
                        np.cos(yaw) * np.cos(pitch),
                        np.sin(yaw) * np.cos(pitch),
                        np.sin(pitch),
                    ],
                    np.float32,
                )
                camera.transform.translation = pos
                camera.transform.look_at(pos + forward, up)
            else:
                extent = float(np.linalg.norm(bbox.extends()))
                d = dist if dist is not None else extent * 2.0
                pos = center + np.array(
                    [
                        d * np.cos(yaw) * np.cos(pitch),
                        d * np.sin(yaw) * np.cos(pitch),
                        -d * np.sin(pitch),
                    ],
                    np.float32,
                )
                camera.transform.translation = pos.astype(np.float32)
                camera.transform.look_at(center, up)

            frustums = self._update_streaming(
                self.metadata, camera.transform, camera.projection,
                camera.frustum(),
            )
            self._streamer.update(frustums, camera.transform)
            for _ in range(10_000):
                if not self._streamer.fill_load_slots():
                    break
            rgb, _, _ = self._renderer.render(
                self._streamer, camera, frustums
            )
            buf = io.BytesIO()
            write_png(buf, rgb)
            return buf.getvalue()


class StoreRegistry:
    """One or many stores under a root directory.

    The reference picks a store with a native file dialog / web directory
    picker (src/plugins/metadata.rs:395-491); the server equivalent: point
    it at a directory of stores and the browser client offers a picker
    (`/stores` lists them, `/s/<name>/...` scopes every endpoint).
    """

    def __init__(self, root, width=640, height=480):
        self.root = Path(root)
        self._width, self._height = width, height
        self._servers: dict[str, StoreServer] = {}
        self._lock = threading.Lock()
        if (self.root / "metadata.json").exists():
            self.names = [self.root.name or "store"]
            self._dirs = {self.names[0]: self.root}
        else:
            self._dirs = {
                p.name: p
                for p in sorted(self.root.iterdir())
                if (p / "metadata.json").exists()
            }
            self.names = list(self._dirs)
            if not self.names:
                raise FileNotFoundError(
                    f"{self.root} holds no store (no metadata.json in it "
                    "or any child directory)"
                )

    @property
    def default(self) -> str:
        return self.names[0]

    def get(self, name: str) -> "StoreServer | None":
        if name not in self._dirs:
            return None
        # ThreadingHTTPServer handlers race the lazy construction (the
        # client fires /stats and /render concurrently on first load)
        with self._lock:
            if name not in self._servers:
                self._servers[name] = StoreServer(
                    self._dirs[name], width=self._width,
                    height=self._height,
                )
            return self._servers[name]


def make_handler(registry: StoreRegistry):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def _send(self, code, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Access-Control-Allow-Origin", "*")
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            path = url.path.lstrip("/")
            if path == "stores":
                self._send(
                    200,
                    json.dumps(
                        {"stores": registry.names,
                         "default": registry.default}
                    ).encode(),
                    "application/json",
                )
                return
            # store-scoped endpoints: /s/<name>/<rest> (the client
            # percent-encodes names, and browsers escape regardless)
            store_name = registry.default
            if path.startswith("s/"):
                parts = path.split("/", 2)
                if len(parts) < 3:
                    self._send(404, b"not found", "text/plain")
                    return
                store_name, path = unquote(parts[1]), parts[2]
            server = registry.get(store_name)
            if server is None:
                self._send(404, f"no store {store_name!r}".encode(),
                           "text/plain")
                return
            if path in ("", "index.html"):
                # the interactive client (reference: index.html + the
                # WASM viewer; here orbit/zoom drive /render server-side)
                page = (
                    Path(__file__).parent / "viewer" / "client.html"
                ).read_bytes()
                self._send(200, page, "text/html; charset=utf-8")
                return
            if path == "stats":
                stats = {
                    "name": server.metadata.name,
                    "number_of_points": server.metadata.number_of_points,
                    "hierarchies": server.metadata.hierarchies,
                    "auto_distance": float(
                        np.linalg.norm(
                            server.metadata.bounding_box.extends()
                        ) * 2.0
                    ),
                    "center": [
                        float(v)
                        for v in server.metadata.bounding_box.center()
                    ],
                    "endpoints": ["/metadata.json", "/h_<n>/c_x_y_z.bin",
                                   "/render?yaw=&pitch=&dist=", "/stats"],
                }
                self._send(200, json.dumps(stats).encode(), "application/json")
                return
            if path == "render":
                q = parse_qs(url.query)
                try:
                    yaw = float(q.get("yaw", ["0"])[0])
                    pitch = float(q.get("pitch", ["-0.4"])[0])
                    dist = float(q["dist"][0]) if "dist" in q else None
                    has_eye = any(k in q for k in ("px", "py", "pz"))
                    eye = (
                        [float(q["px"][0]), float(q["py"][0]),
                         float(q["pz"][0])]
                        if has_eye  # any one present requires all three
                        else None
                    )
                    voronoi = (
                        q["voronoi"][0] not in ("0", "false")
                        if "voronoi" in q
                        else None
                    )
                except (ValueError, IndexError, KeyError) as err:
                    self._send(400, f"bad camera parameter: {err}".encode(),
                               "text/plain")
                    return
                try:
                    png = server.render_png(
                        yaw=yaw, pitch=pitch, dist=dist, voronoi=voronoi,
                        eye=eye,
                    )
                except Exception as err:  # pragma: no cover - defensive
                    self._send(500, str(err).encode(), "text/plain")
                    return
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(png)))
                self.send_header("Access-Control-Allow-Origin", "*")
                # camera round-trip echo (clients + tests confirm what
                # the server actually rendered)
                pose = (
                    f"fly eye=({eye[0]},{eye[1]},{eye[2]})"
                    if eye is not None
                    else f"orbit dist={'auto' if dist is None else dist}"
                )
                self.send_header(
                    "X-Camera", f"yaw={yaw} pitch={pitch} {pose}"
                )
                self.end_headers()
                self.wfile.write(png)
                return
            # static store files, escape-safe
            rel = Path(path)
            if rel.is_absolute() or ".." in rel.parts:
                self._send(403, b"forbidden", "text/plain")
                return
            target = server.store_dir / rel
            if not target.is_file():
                self._send(404, b"not found", "text/plain")
                return
            ctype = (
                "application/json" if target.suffix == ".json"
                else "application/octet-stream"
            )
            self._send(200, target.read_bytes(), ctype)

    return Handler


def serve(store_dir, host="127.0.0.1", port=8080, width=640, height=480):
    """Build and return the HTTP server (call serve_forever on it).

    ``store_dir`` may be one store (holds metadata.json) or a directory
    of stores (each child with a metadata.json gets served under
    ``/s/<name>/`` and the browser client shows a picker)."""
    registry = StoreRegistry(store_dir, width=width, height=height)
    httpd = ThreadingHTTPServer((host, port), make_handler(registry))
    return httpd


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="point-cloud-serve",
        description="Serve a converted point-cloud store over HTTP.",
    )
    parser.add_argument("store", type=Path)
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--width", type=int, default=640)
    parser.add_argument("--height", type=int, default=480)
    args = parser.parse_args(argv)
    httpd = serve(args.store, args.host, args.port, args.width, args.height)
    print(f"serving {args.store} on http://{args.host}:{args.port}")
    httpd.serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
