"""Offscreen export + input state tests."""

import struct
import zlib

import numpy as np

from point_cloud_tpu.viewer.input import InputState
from point_cloud_tpu.viewer.offscreen import write_png


class TestPng:
    def test_png_round_trips_via_manual_decode(self, tmp_path):
        rng = np.random.default_rng(0)
        img = rng.random((16, 24, 3)).astype(np.float32)
        path = tmp_path / "t.png"
        write_png(path, img)
        data = path.read_bytes()
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        # parse chunks
        off = 8
        chunks = {}
        while off < len(data):
            (length,) = struct.unpack_from(">I", data, off)
            tag = data[off + 4 : off + 8]
            chunks[tag] = data[off + 8 : off + 8 + length]
            off += 12 + length
        w, h, depth, color = struct.unpack_from(">IIBB", chunks[b"IHDR"])
        assert (w, h, depth, color) == (24, 16, 8, 2)
        raw = zlib.decompress(chunks[b"IDAT"])
        rows = np.frombuffer(raw, np.uint8).reshape(16, 1 + 24 * 3)
        assert (rows[:, 0] == 0).all()  # filter type none
        decoded = rows[:, 1:].reshape(16, 24, 3)
        expected = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
        np.testing.assert_array_equal(decoded, expected)

    def test_uint8_and_gray(self, tmp_path):
        img = np.zeros((4, 4), np.uint8)
        write_png(tmp_path / "g.png", img)
        assert (tmp_path / "g.png").stat().st_size > 0


class TestInputState:
    def test_axes_from_keys(self):
        s = InputState()
        s.key_down("W")
        s.key_down("d")
        s.key_down("space")
        inp = s.sample()
        assert inp.forward == 1.0 and inp.right == 1.0 and inp.ascend == 1.0
        s.key_up("w")
        s.key_down("s")
        assert s.sample().forward == -1.0

    def test_cursor_delta_accumulates_and_resets(self):
        s = InputState()
        s.cursor_moved(10, 10)  # first sample sets origin
        s.cursor_moved(15, 12)
        s.cursor_moved(18, 11)
        inp = s.sample()
        assert inp.cursor_delta == (8.0, 1.0)
        assert s.sample().cursor_delta == (0.0, 0.0)

    def test_look_button(self):
        s = InputState()
        assert not s.sample().looking
        s.button_down("right")
        assert s.sample().looking
        s.button_up("right")
        assert not s.sample().looking

    def test_wheel_accumulates(self):
        s = InputState()
        s.wheel(1)
        s.wheel(2)
        assert s.sample().wheel == 3.0
        assert s.sample().wheel == 0.0
