"""Local window layer (viewer/window.py) — headless tests.

The WindowLoop is backend-agnostic: these tests drive it with a scripted
FakeBackend (no display needed) and assert the full event-loop contract
the reference's winit layer provides (winit.rs:112-159): frames render
and blit, WASD moves the camera, right-drag rotates, wheel adjusts
speed, Resized reconfigures the surface, CloseRequested exits.
"""

import numpy as np
import pytest

from point_cloud_tpu.render.renderer import RenderSettings
from point_cloud_tpu.viewer.app import Viewer
from point_cloud_tpu.viewer.window import (
    WindowEvent,
    WindowLoop,
    rgb_to_ppm,
    translate_button,
    translate_keysym,
)


class FakeBackend:
    """Scripted backend: hands out queued event batches, records blits."""

    def __init__(self, batches=None):
        self.batches = list(batches or [])
        self.blits = []
        self.titles = []
        self.alive = True
        self.closed = False

    def poll_events(self):
        return self.batches.pop(0) if self.batches else []

    def blit(self, rgb):
        self.blits.append(np.asarray(rgb))

    def set_title(self, title):
        self.titles.append(title)

    def close(self):
        self.closed = True
        self.alive = False


@pytest.fixture
def viewer(tmp_path):
    v = Viewer(RenderSettings(width=64, height=48))
    yield v
    v.close()


def test_translations():
    assert translate_keysym("Shift_L") == "shift"
    assert translate_keysym("Shift_R") == "shift"
    assert translate_keysym("space") == "space"
    assert translate_keysym("W") == "w"
    assert translate_button(1) == "left"
    assert translate_button(3) == "right"
    assert translate_button(9) is None


def test_ppm_roundtrip():
    rgb = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    data = rgb_to_ppm(rgb)
    assert data.startswith(b"P6 3 2 255\n")
    assert data[len(b"P6 3 2 255\n"):] == rgb.tobytes()


def test_loop_renders_and_blits(viewer):
    backend = FakeBackend()
    loop = WindowLoop(viewer, backend)
    n = loop.run(max_frames=2)
    assert n == 2
    assert len(backend.blits) == 2
    assert backend.blits[0].shape == (48, 64, 3)
    assert backend.blits[0].dtype == np.uint8


def test_wasd_moves_camera(viewer):
    start = np.array(viewer.camera.transform.translation)
    backend = FakeBackend([[WindowEvent("key_down", key="w")]])
    WindowLoop(viewer, backend).run(max_frames=2)
    moved = np.array(viewer.camera.transform.translation)
    assert not np.allclose(start, moved)


def test_right_drag_rotates(viewer):
    start = np.array(viewer.camera.transform.rotation)
    backend = FakeBackend([
        [
            WindowEvent("button_down", button="right"),
            WindowEvent("cursor", x=10, y=10),
        ],
        [WindowEvent("cursor", x=60, y=30)],
    ])
    WindowLoop(viewer, backend).run(max_frames=3)
    assert not np.allclose(start, np.array(viewer.camera.transform.rotation))


def test_wheel_adjusts_fly_speed(viewer):
    speed = viewer.fly_cam.speed
    backend = FakeBackend([
        [
            WindowEvent("button_down", button="right"),
            WindowEvent("wheel", steps=3.0),
        ],
    ])
    WindowLoop(viewer, backend).run(max_frames=1)
    assert viewer.fly_cam.speed != speed


def test_resize_reconfigures_surface(viewer):
    backend = FakeBackend([[WindowEvent("resize", x=80, y=40)]])
    WindowLoop(viewer, backend).run(max_frames=1)
    assert (viewer.settings.width, viewer.settings.height) == (80, 40)
    assert backend.blits[-1].shape == (40, 80, 3)
    assert viewer.camera.projection.aspect_ratio == pytest.approx(2.0)


def test_close_request_exits_loop(viewer):
    backend = FakeBackend([
        [],
        [WindowEvent("close")],
        [],
    ])
    loop = WindowLoop(viewer, backend)
    n = loop.run(max_frames=10)
    assert n == 1  # one frame before the close event landed
    assert not loop.running


def test_run_window_with_store(tmp_path):
    """End-to-end over a real converted store through run_window."""
    from point_cloud_tpu.convert.converter import Converter
    from point_cloud_tpu.core.metadata import Metadata
    from point_cloud_tpu.core.point import PointBatch
    from point_cloud_tpu.viewer.window import run_window

    rng = np.random.default_rng(11)
    batch = PointBatch(
        rng.uniform(-20, 20, (2000, 3)).astype(np.float32),
        rng.integers(0, 256, (2000, 4)).astype(np.uint8),
    )
    conv = Converter(Metadata(), str(tmp_path))
    conv.add_points_batch(batch)
    conv.close()

    backend = FakeBackend()
    frames = run_window(
        str(tmp_path / "metadata.json"), width=64, height=48,
        max_frames=3, backend=backend,
    )
    assert frames == 3
    assert backend.closed
    # streaming should have loaded cells and rendered some points
    assert backend.blits[-1].shape == (48, 64, 3)

    # the documented CLI form passes the store DIRECTORY
    backend2 = FakeBackend()
    assert run_window(
        str(tmp_path), width=64, height=48, max_frames=1, backend=backend2,
    ) == 1

    # --mesh N renders through the sharded renderer (same loop contract)
    backend3 = FakeBackend()
    assert run_window(
        str(tmp_path), width=64, height=48, max_frames=2,
        backend=backend3, mesh_devices=8,
    ) == 2
    assert backend3.blits[-1].shape == (48, 64, 3)


def test_hotkeys_toggle_runtime_settings(viewer):
    """The keyboard control surface flips the same runtime state the
    reference's egui panel exposes (ui.rs:122-146, debug.rs:21-36)."""
    from point_cloud_tpu.viewer.window import WindowLoop

    loop = WindowLoop(viewer, FakeBackend())

    def press(key):
        loop.apply_event(WindowEvent("key_down", key=key))
        loop.apply_event(WindowEvent("key_up", key=key))

    assert viewer.stream_enabled
    press("p")
    assert not viewer.stream_enabled
    press("p")
    assert viewer.stream_enabled

    assert viewer.settings.voronoi
    press("v")
    assert not viewer.settings.voronoi

    assert not viewer.settings.size_by_distance
    press("o")
    assert viewer.settings.size_by_distance

    for key, attr in (
        ("b", "show_bounding_box"),
        ("g", "show_cell_grid"),
        ("x", "show_streaming_rects"),
    ):
        assert not getattr(viewer.debug, attr)
        press(key)
        assert getattr(viewer.debug, attr)

    # frustum freeze + plane normals capture a frozen frustum
    assert viewer.debug.frozen_frustum is None
    press("c")
    assert viewer.debug.show_frustum
    assert viewer.debug.frozen_frustum is not None
    press("c")
    assert not viewer.debug.show_frustum
    press("n")
    assert viewer.debug.show_plane_normals

    # streaming scale steps, clamped to the reference slider range 1..5
    start = viewer.streaming_scale
    press("bracketright")
    assert viewer.streaming_scale == start + 0.5
    for _ in range(20):
        press("bracketleft")
    assert viewer.streaming_scale == 1.0
    for _ in range(20):
        press("bracketright")
    assert viewer.streaming_scale == 5.0

    # hierarchy visibility digits
    press("2")
    assert 2 in viewer.settings.hidden_hierarchies
    press("2")
    assert 2 not in viewer.settings.hidden_hierarchies


def test_hotkey_autorepeat_does_not_flicker(viewer):
    """Tk auto-repeat delivers held keys as repeated KeyPress events;
    a toggle must fire once per press edge, not per repeat."""
    from point_cloud_tpu.viewer.window import WindowLoop

    loop = WindowLoop(viewer, FakeBackend())
    loop.apply_event(WindowEvent("key_down", key="p"))
    loop.apply_event(WindowEvent("key_down", key="p"))  # auto-repeat
    loop.apply_event(WindowEvent("key_down", key="p"))
    assert not viewer.stream_enabled  # toggled exactly once
    loop.apply_event(WindowEvent("key_up", key="p"))
    loop.apply_event(WindowEvent("key_down", key="p"))
    assert viewer.stream_enabled


def test_x11_auto_repeat_pairs_filtered():
    """X11 reports a held key as KeyRelease+KeyPress pairs sharing one
    timestamp; the filter must drop exactly those pairs and keep real
    releases/presses (distinct timestamps or no timestamps)."""
    from point_cloud_tpu.viewer.window import filter_auto_repeat

    up = lambda k, t: WindowEvent("key_up", key=k, time_ms=t)
    down = lambda k, t: WindowEvent("key_down", key=k, time_ms=t)
    move = WindowEvent("cursor", x=1, y=2)

    # repeat pairs vanish, interleaved non-key events survive
    out = filter_auto_repeat([up("p", 10), down("p", 10), move,
                              up("p", 40), down("p", 40)])
    assert out == [move]
    # a real release (later timestamp, or trailing) is kept
    out = filter_auto_repeat([up("p", 10), down("p", 11), up("p", 50)])
    assert [e.kind for e in out] == ["key_up", "key_down", "key_up"]
    # events from backends without timestamps pass through untouched
    raw = [WindowEvent("key_up", key="p"), WindowEvent("key_down", key="p")]
    assert filter_auto_repeat(list(raw)) == raw
    # pairs of different keys are independent
    out = filter_auto_repeat([up("w", 10), down("s", 10), down("w", 10)])
    assert [e.key for e in out] == ["s"]


def test_x11_auto_repeat_does_not_flicker_toggle(viewer):
    """A held hotkey on X11 (release+press repeat pairs) toggles once,
    stays in the pressed set across the batch, and a real release+press
    cycle toggles again."""
    from point_cloud_tpu.viewer.window import WindowLoop

    backend = FakeBackend([
        [WindowEvent("key_down", key="p", time_ms=100)],
        [WindowEvent("key_up", key="p", time_ms=500),
         WindowEvent("key_down", key="p", time_ms=500),
         WindowEvent("key_up", key="p", time_ms=530),
         WindowEvent("key_down", key="p", time_ms=530)],
        [WindowEvent("key_up", key="p", time_ms=900)],
        [],
        [WindowEvent("key_down", key="p", time_ms=1500)],
    ])
    loop = WindowLoop(viewer, backend)
    loop.step()
    assert not viewer.stream_enabled  # press edge toggled
    loop.step()  # the held-key repeat batch
    assert not viewer.stream_enabled  # no flicker
    assert "p" in loop.input.pressed_keys  # still held
    loop.step()  # real release: held back one poll (split-pair guard)
    assert "p" in loop.input.pressed_keys
    loop.step()  # deferred release lands on the next (empty) poll
    assert "p" not in loop.input.pressed_keys
    loop.step()  # a fresh press toggles again
    assert viewer.stream_enabled


def test_x11_auto_repeat_pair_split_across_polls(viewer):
    """A repeat pair whose key_up lands at one batch's tail and whose
    matching key_down leads the next batch must still cancel out — the
    loop carries the unmatched trailing key_up across polls."""
    backend = FakeBackend([
        [WindowEvent("key_down", key="p", time_ms=100)],
        [WindowEvent("key_up", key="p", time_ms=500)],
        [WindowEvent("key_down", key="p", time_ms=500)],
        [],
    ])
    loop = WindowLoop(viewer, backend)
    loop.step()
    assert not viewer.stream_enabled  # press edge toggled once
    loop.step()  # tail key_up — held back, key stays pressed
    assert "p" in loop.input.pressed_keys
    loop.step()  # matching key_down at the next batch head: pair drops
    assert not viewer.stream_enabled  # no re-toggle
    assert "p" in loop.input.pressed_keys  # movement never stuttered
    loop.step()
    assert "p" in loop.input.pressed_keys


class DialogBackend(FakeBackend):
    """FakeBackend plus scripted native-dialog answers (the rfd pickers:
    metadata.rs:395-442, converter.rs:764-794)."""

    def __init__(self, batches=None, open_file=None, open_files=None,
                 directory=None, save_file=None):
        super().__init__(batches)
        self._open_file = open_file
        self._open_files = open_files or []
        self._directory = directory
        self._save_file = save_file
        self.dialog_calls = []

    def ask_open_file(self, title, filetypes):
        self.dialog_calls.append(("open_file", title, tuple(filetypes)))
        return self._open_file

    def ask_open_files(self, title, filetypes):
        self.dialog_calls.append(("open_files", title, tuple(filetypes)))
        return list(self._open_files)

    def ask_directory(self, title):
        self.dialog_calls.append(("directory", title))
        return self._directory

    def ask_save_file(self, title, filetypes):
        self.dialog_calls.append(("save_file", title, tuple(filetypes)))
        return self._save_file


def _write_ply(path, n=512, seed=7):
    from point_cloud_tpu.core.point import PointBatch
    from point_cloud_tpu.io.ply import write_ply

    rng = np.random.default_rng(seed)
    positions = rng.uniform(-40, 40, (n, 3)).astype(np.float32)
    colors = rng.integers(0, 256, (n, 4), dtype=np.uint8)
    colors[:, 3] = 255
    write_ply(path, PointBatch(positions, colors))
    return positions


def test_window_converter_flow(tmp_path, viewer):
    """The full in-window conversion story — choose files (f), save-at
    (u), start (t) — converts to a real store and publishes cells live
    into the renderer (the reference's native converter panel,
    converter.rs:740-848, driven by hotkeys + native dialogs here)."""
    from point_cloud_tpu.core.metadata import Metadata
    from point_cloud_tpu.viewer.interactive import ConversionState

    ply = tmp_path / "cloud.ply"
    _write_ply(ply)
    store = tmp_path / "store"

    backend = DialogBackend(open_files=[str(ply)], directory=str(store))
    loop = WindowLoop(viewer, backend)

    def press(key):
        loop.apply_event(WindowEvent("key_down", key=key))
        loop.apply_event(WindowEvent("key_up", key=key))

    press("f")  # choose files
    assert loop.converter is not None
    assert [f.path for f in loop.converter.progress()] == [ply]
    press("u")  # save at
    assert loop.converter.auto_save
    press("t")  # start
    assert loop.converter.state == ConversionState.CONVERTING

    for _ in range(200):
        if not loop.step():
            break
        if loop.converter.state == ConversionState.FINISHED:
            break
    assert loop.converter.state == ConversionState.FINISHED
    # stopping the loop flushes the store (asset save-on-exit)
    loop.running = False
    loop.run()

    meta = Metadata.loads((store / "metadata.json").read_text())
    assert meta.number_of_points == 512
    cells = list(store.glob("h_*/c_*.bin"))
    assert cells
    # cells published live into the streaming table
    assert viewer.streamer.loaded

    # start/stop toggles back off mid-run
    press("t")
    assert loop.converter.state != ConversionState.CONVERTING


def test_window_open_store_dialog(tmp_path, viewer):
    """'m' opens a store picked from the native dialog
    (metadata.rs:395-442)."""
    from point_cloud_tpu.convert.converter import Converter
    from point_cloud_tpu.core.metadata import Metadata
    from point_cloud_tpu.core.point import PointBatch

    rng = np.random.default_rng(3)
    positions = rng.uniform(-20, 20, (256, 3)).astype(np.float32)
    colors = rng.integers(0, 256, (256, 4), dtype=np.uint8)
    with Converter(Metadata(), tmp_path) as conv:
        conv.add_points_batch(PointBatch(positions, colors))

    backend = DialogBackend(open_file=str(tmp_path / "metadata.json"))
    loop = WindowLoop(viewer, backend)
    loop.apply_event(WindowEvent("key_down", key="m"))
    assert viewer.metadata.number_of_points == 256
    assert backend.dialog_calls[0][0] == "open_file"


def test_window_export_hotkey(tmp_path, viewer):
    """'e' exports the open store through the save dialog; the .ply
    round-trips bit-exact against the store cells."""
    from point_cloud_tpu.convert.converter import Converter
    from point_cloud_tpu.core.cell import Cell
    from point_cloud_tpu.core.metadata import Metadata
    from point_cloud_tpu.core.point import PointBatch
    from point_cloud_tpu.io.ply import PlyPointReader

    rng = np.random.default_rng(5)
    positions = rng.uniform(-20, 20, (300, 3)).astype(np.float32)
    colors = rng.integers(0, 256, (300, 4), dtype=np.uint8)
    store = tmp_path / "store"
    with Converter(Metadata(), store) as conv:
        conv.add_points_batch(PointBatch(positions, colors))

    out = tmp_path / "exported.ply"
    backend = DialogBackend(
        open_file=str(store / "metadata.json"), save_file=str(out)
    )
    loop = WindowLoop(viewer, backend)
    loop.apply_event(WindowEvent("key_down", key="m"))  # open the store
    loop.apply_event(WindowEvent("key_up", key="m"))
    loop.apply_event(WindowEvent("key_down", key="e"))  # export it
    # the export runs off the event loop (a big store must not freeze
    # the window): join its worker thread
    import threading
    import time

    deadline = time.monotonic() + 30
    while time.monotonic() < deadline:
        workers = [
            t for t in threading.enumerate() if t.name == "pct-export"
        ]
        if not workers:
            break
        workers[0].join(0.05)
    assert out.exists()
    reader = PlyPointReader(out)
    back = reader.get_batch(reader.total_points())
    chunks = [
        Cell.from_path(p).all_points() for p in sorted(store.rglob("*.bin"))
    ]
    stored = PointBatch.concat(chunks)

    def rows(b):
        r = np.concatenate(
            [b.positions.view(np.uint32), b.colors.astype(np.uint32)],
            axis=1,
        )
        return r[np.lexsort(r.T[::-1])]

    np.testing.assert_array_equal(rows(back), rows(stored))


def test_window_export_without_store_is_noop(tmp_path, viewer):
    """'e' with no store open logs and returns (no dialog, no crash)."""
    backend = DialogBackend(save_file=str(tmp_path / "x.ply"))
    loop = WindowLoop(viewer, backend)
    loop.apply_event(WindowEvent("key_down", key="e"))
    assert not (tmp_path / "x.ply").exists()
    assert ("save_file",) not in [c[:1] for c in backend.dialog_calls]


def test_window_export_refuses_stale_store_after_new_cloud(tmp_path, viewer):
    """'k' (new cloud) clears the working directory: 'e' afterwards must
    NOT export the previously opened store (it no longer backs the
    displayed cloud)."""
    from point_cloud_tpu.convert.converter import Converter
    from point_cloud_tpu.core.metadata import Metadata
    from point_cloud_tpu.core.point import PointBatch

    rng = np.random.default_rng(6)
    store = tmp_path / "store"
    with Converter(Metadata(), store) as conv:
        conv.add_points_batch(PointBatch(
            rng.uniform(-10, 10, (64, 3)).astype(np.float32),
            rng.integers(0, 256, (64, 4), dtype=np.uint8),
        ))
    out = tmp_path / "stale.ply"
    backend = DialogBackend(
        open_file=str(store / "metadata.json"), save_file=str(out)
    )
    loop = WindowLoop(viewer, backend)
    loop.apply_event(WindowEvent("key_down", key="m"))  # open store
    loop.apply_event(WindowEvent("key_up", key="m"))
    loop.apply_event(WindowEvent("key_down", key="k"))  # new cloud
    loop.apply_event(WindowEvent("key_up", key="k"))
    loop.apply_event(WindowEvent("key_down", key="e"))  # export: refuse
    assert not out.exists()
    assert ("save_file",) not in [c[:1] for c in backend.dialog_calls]


def test_window_dialog_hotkeys_safe_without_dialogs(viewer):
    """A backend without dialog support (headless stub) makes the
    file-dialog hotkeys no-ops instead of crashes."""
    loop = WindowLoop(viewer, FakeBackend())
    for key in ("m", "f", "u", "t", "k", "e"):
        loop.apply_event(WindowEvent("key_down", key=key))
        loop.apply_event(WindowEvent("key_up", key=key))
    assert loop.viewer.metadata.number_of_points == 0
