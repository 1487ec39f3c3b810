"""Frozen .laz golden-fixture tests + v3 reconciliation map (VERDICT r2
item 8 / ROADMAP #5).

tests/data/laz/ holds checked-in binary .las/.laz twins for every
supported point format (0-3 pointwise 2.x, 6-10 layered 3.x), generated
once by tests/data/laz/generate_fixtures.py. The round-trip suites in
tests/test_laz.py prove encoder and decoder agree with *each other*;
these tests pin them to *frozen bytes*, so any codec change — intended
or not — surfaces as a byte diff naming the exact format, and a future
laszip corpus can certify the same files one by one.

The TestV3ReconciliationMap class isolates the two known-suspect corners
of the layered codec (the places most likely to differ from stock
LASzip 3.x) behind unit tests that document the assumption each makes.
"""

import ctypes
import zlib
from pathlib import Path

import numpy as np
import pytest

from point_cloud_tpu.io import laz
from point_cloud_tpu.io.las import LasHeader

FIXDIR = Path(__file__).parent / "data" / "laz"
FORMATS = [0, 1, 2, 3, 6, 7, 8, 9, 10]
CHUNK_SIZE = 400  # must match generate_fixtures.py


def read_point_records(path: Path) -> bytes:
    data = path.read_bytes()
    header = LasHeader(data[:375])
    n = int(header.point_count)
    start = header.point_data_offset
    return data[start:start + n * header.point_record_length]


class TestFrozenFixtures:
    @pytest.mark.parametrize("fmt", FORMATS)
    def test_decoder_pins_frozen_bytes(self, fmt, tmp_path):
        """Decoding the frozen .laz reproduces the frozen .las exactly
        (container and records)."""
        out = tmp_path / "out.las"
        laz.convert_laz_to_las(FIXDIR / f"fmt{fmt}.laz", out)
        assert out.read_bytes() == (FIXDIR / f"fmt{fmt}.las").read_bytes()

    @pytest.mark.parametrize("fmt", FORMATS)
    def test_encoder_pins_frozen_bytes(self, fmt, tmp_path):
        """Re-encoding the frozen .las reproduces the frozen .laz byte
        for byte — the encoder is deterministic, so any drift in models,
        framing, or chunking shows up here."""
        out = tmp_path / "out.laz"
        laz.convert_las_to_laz(
            FIXDIR / f"fmt{fmt}.las", out, chunk_size=CHUNK_SIZE
        )
        assert out.read_bytes() == (FIXDIR / f"fmt{fmt}.laz").read_bytes()

    @pytest.mark.parametrize("fmt", [0, 3, 6, 10])
    def test_generator_is_reproducible(self, fmt):
        """The fixture generator's synthetic records rebuild identically
        (crc32-seeded), so `python tests/data/laz/generate_fixtures.py`
        on an unchanged codec is a no-op diff."""
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "generate_fixtures", FIXDIR / "generate_fixtures.py"
        )
        gen = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(gen)
        records = gen.build_records(fmt, gen.N_POINTS)
        frozen = read_point_records(FIXDIR / f"fmt{fmt}.las")
        assert np.ascontiguousarray(records).tobytes() == frozen

    @pytest.mark.parametrize("fmt", FORMATS)
    def test_reader_consumes_fixture(self, fmt):
        """The batched point reader decodes every fixture and matches its
        .las twin (positions + colors), including formats 9/10 that the
        PointBatch writer cannot produce."""
        from point_cloud_tpu.io import get_batched_point_reader

        r_las = get_batched_point_reader(FIXDIR / f"fmt{fmt}.las")
        r_laz = get_batched_point_reader(FIXDIR / f"fmt{fmt}.laz")
        total = 0
        while True:
            a = r_las.get_batch(256)
            b = r_laz.get_batch(256)
            assert len(a) == len(b)
            if len(a) == 0:
                break
            total += len(a)
            np.testing.assert_array_equal(a.positions, b.positions)
            np.testing.assert_array_equal(a.colors, b.colors)
        assert total == 1_000


def roundtrip_records(rec: np.ndarray, items, chunk_size=2_500) -> bytes:
    """Compress records through the layered codec and decode them back
    (the same harness as tests/test_laz.py::test_record_codec_roundtrip)."""
    n, stride = rec.shape
    raw = np.ascontiguousarray(rec).tobytes()
    chunks, _ = laz.compress_records(raw, n, items, chunk_size=chunk_size)
    lib = laz._native()
    types = np.array([t for t, _ in items], np.uint16)
    sizes = np.array([s for _, s in items], np.uint16)
    out = []
    remaining = n
    for blob in chunks:
        n_pts = min(chunk_size, remaining)
        remaining -= n_pts
        buf = np.zeros(n_pts * stride, np.uint8)
        rc = lib.pc_laz14_decompress_chunk(
            blob, len(blob),
            types.ctypes.data_as(ctypes.c_void_p),
            sizes.ctypes.data_as(ctypes.c_void_p),
            len(types), n_pts,
            buf.ctypes.data_as(ctypes.c_void_p),
        )
        assert rc == len(blob)
        out.append(buf.tobytes())
    return b"".join(out)


class TestV3ReconciliationMap:
    """The two known-suspect corners of the layered (LASzip 3.x) codec,
    each isolated behind a test that states its assumption. When a real
    laszip corpus becomes reachable, certify these first — a mismatch in
    either breaks interop while remaining perfectly self-consistent
    (which is why the round-trip suites cannot catch it).
    """

    def test_return_context_tables_cover_all_16x16(self):
        """Suspect corner 1: the 4-bit return-number context tables.

        Assumption under test: our codec buckets (number_of_returns,
        return_number) through map6ctx/level8ctx
        (native/pc_laszip.cpp:1253-1269) — 16x16 extensions built from
        the v2 8x8 structure. Stock LASzip 3.x uses its own
        number_return_map_6ctx / number_return_level_8ctx constant
        tables; if any (n, r) combination lands in a different bucket,
        the arithmetic models diverge from that record onward. This
        test drives EVERY 16x16 combination (including the degenerate
        n=0 and r>n encodings real scanners emit) through the codec so
        the reconciliation diff, when a corpus lands, can be replayed
        per-combination.
        """
        combos = [(n_ret, r) for n_ret in range(16) for r in range(16)]
        n = len(combos) * 4  # visit each combo 4x in varying order
        rng = np.random.default_rng(zlib.crc32(b"ret-ctx"))
        order = rng.permutation(np.arange(n) % len(combos))
        rec = np.zeros((n, 30), np.uint8)
        xyz = np.cumsum(rng.integers(-50, 60, (n, 3)), axis=0).astype(
            np.int32
        )
        rec[:, 0:12] = xyz.view(np.uint8).reshape(n, 12)
        nr = np.array([combos[i][0] for i in order], np.uint8)
        r = np.array([combos[i][1] for i in order], np.uint8)
        rec[:, 14] = r | (nr << 4)
        gps = (1000.0 + np.cumsum(rng.uniform(0, 1e-3, n))).astype(
            np.float64
        )
        rec[:, 22:30] = gps.view(np.uint8).reshape(n, 8)
        raw = np.ascontiguousarray(rec).tobytes()
        assert roundtrip_records(
            rec, [(laz.ITEM_POINT14, 30)]
        ) == raw

    def test_wavepacket_layer_full_variability(self):
        """Suspect corner 2: the wavepacket layer.

        Assumption under test: our WAVEPACKET14 layer reuses this file's
        v2-derived building blocks (IntegerCompressor deltas per field,
        native/pc_laszip.cpp fidelity note at :1245-1248) rather than a
        bit-verified port of LASzip 3.x's laswriteitemcompressed_
        wavepacket14_v3 models. The framing (layer sizes, per-chunk
        resets, context switching on scanner channel) matches v3; the
        per-field model shapes are the part to reconcile. Exercises
        descriptor-index switching, monotone + wrapping u64 offsets,
        correlated sizes, and f32 location/direction patterns across 4
        scanner channels.
        """
        rng = np.random.default_rng(zlib.crc32(b"wavepacket"))
        n = 4_000
        core = np.zeros((n, 30), np.uint8)
        xyz = np.cumsum(rng.integers(-80, 90, (n, 3)), axis=0).astype(
            np.int32
        )
        core[:, 0:12] = xyz.view(np.uint8).reshape(n, 12)
        nr = rng.integers(1, 6, n)
        core[:, 14] = (rng.integers(1, nr + 1) | (nr << 4)).astype(
            np.uint8
        )
        core[:, 15] = (rng.integers(0, 4, n) << 4).astype(np.uint8)
        gps = (5.0 + np.cumsum(rng.uniform(0, 1e-4, n))).astype(
            np.float64
        )
        core[:, 22:30] = gps.view(np.uint8).reshape(n, 8)

        wp = np.zeros((n, 29), np.uint8)
        wp[:, 0] = rng.integers(0, 6, n)
        size = rng.integers(16, 4096, n).astype(np.uint64)
        # wrapping offsets: a u64 cumsum that exceeds u32 range
        offset = (np.cumsum(size) * 1_048_576).astype(np.uint64)
        wp[:, 1:9] = offset.view(np.uint8).reshape(n, 8)
        wp[:, 9:13] = size.astype(np.uint32).view(np.uint8).reshape(n, 4)
        loc = rng.uniform(0, 1e4, n).astype(np.float32)
        wp[:, 13:17] = loc.view(np.uint8).reshape(n, 4)
        xyz_t = rng.standard_normal((n, 3)).astype(np.float32)
        wp[:, 17:29] = xyz_t.view(np.uint8).reshape(n, 12)

        rec = np.concatenate([core, wp], axis=1)
        raw = np.ascontiguousarray(rec).tobytes()
        assert roundtrip_records(
            rec,
            [(laz.ITEM_POINT14, 30), (laz.ITEM_WAVEPACKET14, 29)],
        ) == raw
