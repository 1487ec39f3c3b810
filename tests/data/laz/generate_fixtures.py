"""Regenerate the frozen .las/.laz golden fixtures (VERDICT r2 item 8).

Run from the repo root::

    python tests/data/laz/generate_fixtures.py

Every fixture is deterministic (seeded via zlib.crc32 of its name), so a
regeneration on an unchanged codec reproduces the checked-in bytes
exactly — tests/test_laz_fixtures.py enforces both directions against
the frozen files, so any codec change shows up as a byte diff pointing
at the exact format.

The records exercise full field variability (returns/counts, flags,
channels, GPS sequences, wavepackets), far beyond what the PointBatch
writer emits — these are the bytes a future laszip corpus certifies
against (ROADMAP #5).
"""

from __future__ import annotations

import struct
import sys
import zlib
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))

from point_cloud_tpu.io import laz  # noqa: E402

HERE = Path(__file__).parent
N_POINTS = 1_000
CHUNK_SIZE = 400  # 3 chunks: exercises the chunk table + model resets

RECORD_LEN = {0: 20, 1: 28, 2: 26, 3: 34, 6: 30, 7: 36, 8: 38, 9: 59,
              10: 67}


def rng_for(name: str) -> np.random.Generator:
    return np.random.default_rng(zlib.crc32(name.encode()))


def synth_point10(n, rng):
    """Full-variability LAS 1.2 core records (20 bytes)."""
    rec = np.zeros((n, 20), np.uint8)
    xyz = np.cumsum(rng.integers(-100, 120, (n, 3)), axis=0).astype(
        np.int32
    )
    rec[:, 0:12] = xyz.view(np.uint8).reshape(n, 12)
    inten = rng.integers(0, 3000, n).astype(np.uint16)
    rec[:, 12:14] = inten.view(np.uint8).reshape(n, 2)
    nr = rng.integers(1, 6, n)  # 3-bit fields in LAS 1.2
    r = rng.integers(1, nr + 1)
    direction = rng.integers(0, 2, n)
    edge = rng.integers(0, 2, n)
    rec[:, 14] = (
        r | (nr << 3) | (direction << 6) | (edge << 7)
    ).astype(np.uint8)
    rec[:, 15] = rng.integers(0, 32, n)  # classification
    angle = (rng.integers(-90, 91, n) & 0xFF).astype(np.uint8)
    rec[:, 16] = angle
    rec[:, 17] = rng.integers(0, 4, n)  # user data
    psid = rng.integers(0, 5, n).astype(np.uint16)
    rec[:, 18:20] = psid.view(np.uint8).reshape(n, 2)
    return rec


def synth_point14(n, rng, channels=4):
    """Full-variability POINT14 records (30 bytes, LAS 1.4)."""
    rec = np.zeros((n, 30), np.uint8)
    xyz = np.cumsum(rng.integers(-100, 120, (n, 3)), axis=0).astype(
        np.int32
    )
    rec[:, 0:12] = xyz.view(np.uint8).reshape(n, 12)
    inten = rng.integers(0, 3000, n).astype(np.uint16)
    rec[:, 12:14] = inten.view(np.uint8).reshape(n, 2)
    nr = rng.integers(1, 6, n)
    r = rng.integers(1, nr + 1)
    rec[:, 14] = (r | (nr << 4)).astype(np.uint8)
    chan = rng.integers(0, channels, n)
    rec[:, 15] = (
        rng.integers(0, 16, n) | (chan << 4)
        | (rng.integers(0, 2, n) << 6) | (rng.integers(0, 2, n) << 7)
    ).astype(np.uint8)
    rec[:, 16] = rng.integers(0, 64, n)  # classification
    rec[:, 17] = rng.integers(0, 8, n)  # user data
    sa = (rng.integers(-15000, 15000, n) & 0xFFFF).astype(np.uint16)
    rec[:, 18:20] = sa.view(np.uint8).reshape(n, 2)
    psid = rng.integers(0, 5, n).astype(np.uint16)
    rec[:, 20:22] = psid.view(np.uint8).reshape(n, 2)
    gps = (300000.0 + np.cumsum(rng.uniform(0, 2e-4, n))).astype(
        np.float64
    )
    rec[:, 22:30] = gps.view(np.uint8).reshape(n, 8)
    return rec


def synth_rgb(n, rng, with_nir=False):
    w = 8 if with_nir else 6
    ch = 4 if with_nir else 3
    rgb = rng.integers(0, 1 << 16, (n, ch)).astype(np.uint16)
    return rgb.view(np.uint8).reshape(n, w)


def synth_gps(n, rng):
    gps = (250000.0 + np.cumsum(rng.uniform(0, 3e-4, n))).astype(
        np.float64
    )
    return gps.view(np.uint8).reshape(n, 8)


def synth_wavepacket(n, rng):
    """29-byte wavepacket: descriptor u8, offset u64, size u32,
    return-point location f32, xt/yt/zt f32."""
    rec = np.zeros((n, 29), np.uint8)
    rec[:, 0] = rng.integers(0, 4, n)  # descriptor index (few in use)
    size = rng.integers(64, 257, n).astype(np.uint64)
    offset = np.cumsum(size).astype(np.uint64)
    rec[:, 1:9] = offset.view(np.uint8).reshape(n, 8)
    rec[:, 9:13] = size.astype(np.uint32).view(np.uint8).reshape(n, 4)
    loc = rng.uniform(0, 500, n).astype(np.float32)
    rec[:, 13:17] = loc.view(np.uint8).reshape(n, 4)
    xyz_t = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    rec[:, 17:29] = xyz_t.view(np.uint8).reshape(n, 12)
    return rec


def build_records(fmt: int, n: int) -> np.ndarray:
    rng = rng_for(f"fmt{fmt}")
    if fmt <= 3:
        parts = [synth_point10(n, rng)]
        if fmt in (1, 3):
            parts.append(synth_gps(n, rng))
        if fmt in (2, 3):
            parts.append(synth_rgb(n, rng))
    else:
        parts = [synth_point14(n, rng)]
        if fmt == 7:
            parts.append(synth_rgb(n, rng))
        if fmt in (8, 10):
            parts.append(synth_rgb(n, rng, with_nir=True))
        if fmt in (9, 10):
            parts.append(synth_wavepacket(n, rng))
    rec = np.concatenate(parts, axis=1)
    assert rec.shape == (n, RECORD_LEN[fmt]), rec.shape
    return rec


def write_las_raw(path: Path, fmt: int, records: np.ndarray) -> None:
    """Hand-built LAS container for raw records (supports formats the
    PointBatch writer doesn't: 9/10 and full-variability fields)."""
    n, record_len = records.shape
    las14 = fmt >= 6
    header_size = 375 if las14 else 227
    header = bytearray(header_size)
    header[0:4] = b"LASF"
    header[24] = 1
    header[25] = 4 if las14 else 2
    struct.pack_into("<H", header, 94, header_size)
    struct.pack_into("<I", header, 96, header_size)  # point data offset
    struct.pack_into("<I", header, 100, 0)  # vlr count
    header[104] = fmt
    struct.pack_into("<H", header, 105, record_len)
    struct.pack_into("<I", header, 107, 0 if las14 else n)
    struct.pack_into("<3d", header, 131, 0.001, 0.001, 0.001)  # scale
    struct.pack_into("<3d", header, 155, 0.0, 0.0, 0.0)  # offset
    if las14:
        struct.pack_into("<Q", header, 247, n)
    with open(path, "wb") as f:
        f.write(bytes(header))
        f.write(np.ascontiguousarray(records).tobytes())


def main() -> None:
    for fmt in (0, 1, 2, 3, 6, 7, 8, 9, 10):
        records = build_records(fmt, N_POINTS)
        las_path = HERE / f"fmt{fmt}.las"
        laz_path = HERE / f"fmt{fmt}.laz"
        write_las_raw(las_path, fmt, records)
        laz.convert_las_to_laz(las_path, laz_path, chunk_size=CHUNK_SIZE)
        ratio = laz_path.stat().st_size / las_path.stat().st_size
        print(
            f"fmt{fmt}: las {las_path.stat().st_size:6d} B -> "
            f"laz {laz_path.stat().st_size:6d} B ({ratio:.2f})"
        )


if __name__ == "__main__":
    main()
