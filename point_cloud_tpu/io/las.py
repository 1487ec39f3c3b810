"""LAS / LAZ reader (from-scratch, vectorized NumPy).

Capability parity with the reference's LAS path (reference:
point-converter/src/converter/las.rs:22-55, which delegates parsing to the
``las`` crate): coordinates come out as ``raw_i32 * scale + offset`` in f64
and are cast to f32; u16 color channels are truncated to their low byte
(Rust ``as u8`` semantics, las.rs:39); points without color get
``[0, 0, 0, 255]``.

This implementation parses the LAS 1.0-1.4 header and point record formats
0-10 directly with structured NumPy dtypes, so a whole batch decodes as a
handful of array ops instead of a per-point loop (the feed path must sustain
the TPU conversion pipeline, see SURVEY.md section 7 "hard parts").

LAZ (laszip-compressed) files are detected (compressor bit in the point
format byte / laszip VLR) and routed to the from-scratch LASzip codec in
io/laz.py + native/pc_laszip.cpp (formats 0-3 via v2 pointwise chunks,
LAS 1.4 formats 6-10 via v3 layered chunks).
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

from ..core.point import PointBatch
from . import BatchedPointReader

# offset (bytes) of the u16 RGB triple inside each point record, per format
_COLOR_OFFSET = {2: 20, 3: 28, 5: 28, 7: 30, 8: 30, 10: 30}
# minimum record length per point data record format
_MIN_RECORD_LEN = {
    0: 20, 1: 28, 2: 26, 3: 34, 4: 57, 5: 63,
    6: 30, 7: 36, 8: 38, 9: 59, 10: 67,
}


class LasHeader:
    """Parsed LAS public header block."""

    def __init__(self, data: bytes):
        if data[:4] != b"LASF":
            raise ValueError("not a LAS file (missing LASF signature)")
        self.version = (data[24], data[25])
        (self.header_size,) = struct.unpack_from("<H", data, 94)
        (self.point_data_offset,) = struct.unpack_from("<I", data, 96)
        (self.n_vlrs,) = struct.unpack_from("<I", data, 100)
        fmt_byte = data[104]
        self.is_compressed = bool(fmt_byte & 0x80)  # laszip sets bit 7
        self.point_format = fmt_byte & 0x3F
        (self.point_record_length,) = struct.unpack_from("<H", data, 105)
        (legacy_count,) = struct.unpack_from("<I", data, 107)
        self.scale = np.array(struct.unpack_from("<3d", data, 131), np.float64)
        self.offset = np.array(struct.unpack_from("<3d", data, 155), np.float64)
        self.point_count = legacy_count
        if self.version >= (1, 4) and self.header_size >= 255:
            (count_14,) = struct.unpack_from("<Q", data, 247)
            if count_14:
                self.point_count = count_14
        if self.point_format not in _MIN_RECORD_LEN:
            raise ValueError(f"unsupported LAS point format {self.point_format}")
        if self.point_record_length < _MIN_RECORD_LEN[self.point_format]:
            raise ValueError(
                f"record length {self.point_record_length} too small for "
                f"format {self.point_format}"
            )


def _record_dtype(header: LasHeader) -> np.dtype:
    """Structured dtype selecting xyz (+rgb if present) out of each record."""
    names = ["x", "y", "z"]
    formats = ["<i4", "<i4", "<i4"]
    offsets = [0, 4, 8]
    color_off = _COLOR_OFFSET.get(header.point_format)
    if color_off is not None:
        names += ["red", "green", "blue"]
        formats += ["<u2", "<u2", "<u2"]
        offsets += [color_off, color_off + 2, color_off + 4]
    return np.dtype(
        {
            "names": names,
            "formats": formats,
            "offsets": offsets,
            "itemsize": header.point_record_length,
        }
    )


def open_las_or_laz(path) -> BatchedPointReader:
    """LAS reader, or the LAZ reader when the file is laszip-compressed
    (the extension alone is not trusted — the header decides)."""
    with open(path, "rb") as f:
        header = LasHeader(f.read(375))
    if header.is_compressed:
        from .laz import LazPointReader

        return LazPointReader(path)
    return LasPointReader(path)


class LasPointReader(BatchedPointReader):
    def __init__(self, path):
        self.path = Path(path)
        self._file = open(self.path, "rb")
        head = self._file.read(375)
        self.header = LasHeader(head)
        if self.header.is_compressed:
            self._file.close()
            raise ValueError(
                "laszip-compressed file; use io.laz.LazPointReader "
                "(open_las_or_laz dispatches automatically)"
            )
        self._dtype = _record_dtype(self.header)
        self._file.seek(self.header.point_data_offset)
        self._read = 0
        # f32 cast of (i32 * f64 scale + f64 offset), like the las crate +
        # the `as f32` casts at converter/las.rs:34-38
        self._scale = self.header.scale
        self._offset = self.header.offset

    def get_batch(self, size: int) -> PointBatch:
        n = min(size, self.remaining_points())
        if n <= 0:
            return PointBatch.empty()
        raw = self._file.read(n * self.header.point_record_length)
        rec = np.frombuffer(raw, dtype=self._dtype)
        n = len(rec)
        self._read += n

        raw_xyz = np.stack(
            [rec["x"], rec["y"], rec["z"]], axis=-1
        ).astype(np.float64)
        positions = (raw_xyz * self._scale + self._offset).astype(np.float32)

        colors = np.empty((n, 4), np.uint8)
        if "red" in rec.dtype.names:
            # Rust `color.red as u8` truncates to the low byte (las.rs:39)
            colors[:, 0] = rec["red"].astype(np.uint8)
            colors[:, 1] = rec["green"].astype(np.uint8)
            colors[:, 2] = rec["blue"].astype(np.uint8)
        else:
            colors[:, :3] = 0  # Color::default() (las.rs:32)
        colors[:, 3] = 255
        return PointBatch(positions, colors)

    def total_points(self) -> int:
        return int(self.header.point_count)

    def remaining_points(self) -> int:
        return self.total_points() - self._read

    def close(self):
        self._file.close()


_WRITE_RECORD_LEN = {0: 20, 1: 28, 2: 26, 3: 34, 6: 30, 7: 36, 8: 38}


def las_header_bytes(point_format: int, n: int, scale, offset,
                     bbox_min=None, bbox_max=None) -> bytes:
    """Public LAS header for :func:`write_las` / the store exporter.

    Point formats 0-3 produce LAS 1.2 (227-byte header); formats 6-8
    produce LAS 1.4 (375-byte header, u64 point count, legacy count zero
    per spec). ``bbox_min``/``bbox_max`` fill the spec's Max/Min X Y Z
    extent fields (offsets 179-226) — external consumers (spatial
    filters, initial camera fits) trust them, so the exporter passes the
    store bounding box and :func:`write_las` the batch extents.
    """
    if point_format not in _WRITE_RECORD_LEN:
        raise ValueError("write_las supports formats 0-3 and 6-8")
    las14 = point_format >= 6
    scale = np.asarray(scale, np.float64)
    offset = np.asarray(offset, np.float64)
    record_len = _WRITE_RECORD_LEN[point_format]
    header_size = 375 if las14 else 227
    header = bytearray(header_size)
    header[0:4] = b"LASF"
    header[24] = 1
    header[25] = 4 if las14 else 2
    struct.pack_into("<H", header, 94, header_size)
    struct.pack_into("<I", header, 96, header_size)
    struct.pack_into("<I", header, 100, 0)
    header[104] = point_format
    struct.pack_into("<H", header, 105, record_len)
    # formats >= 6 must leave the legacy u32 count zero (LAS 1.4 spec)
    struct.pack_into("<I", header, 107, 0 if las14 else n)
    struct.pack_into("<3d", header, 131, *scale)
    struct.pack_into("<3d", header, 155, *offset)
    if bbox_min is not None and bbox_max is not None:
        lo = np.asarray(bbox_min, np.float64)
        hi = np.asarray(bbox_max, np.float64)
        # interleaved per spec: Max X, Min X, Max Y, Min Y, Max Z, Min Z
        for axis in range(3):
            struct.pack_into("<d", header, 179 + axis * 16, hi[axis])
            struct.pack_into("<d", header, 187 + axis * 16, lo[axis])
    if las14:
        struct.pack_into("<Q", header, 247, n)
    return bytes(header)


def las_record_bytes(batch: PointBatch, point_format: int, scale, offset,
                     gps_time=None, gps_base: int = 0) -> bytes:
    """Point records for one batch (the streaming half of the writer).

    Colors are widened u8->u16 by byte duplication (v * 257), the
    standard 8->16 bit upscale, so the truncating read path round-trips
    them exactly. ``gps_time`` (f64 per point) fills formats 1/3/6-8;
    default is a plausible increasing GPS clock starting at global point
    index ``gps_base`` (so streamed batches continue the same clock the
    whole-batch writer emits).
    """
    if point_format not in _WRITE_RECORD_LEN:
        raise ValueError("write_las supports formats 0-3 and 6-8")
    las14 = point_format >= 6
    n = len(batch)
    scale = np.asarray(scale, np.float64)
    offset = np.asarray(offset, np.float64)
    record_len = _WRITE_RECORD_LEN[point_format]

    quant = np.round(
        (batch.positions.astype(np.float64) - offset) / scale
    )
    # saturate instead of tripping the undefined out-of-range C cast
    # (fuzz finding: coordinates beyond ±i32·scale — ±2.1e6 m at the
    # default mm scale — wrapped to garbage with a RuntimeWarning; a
    # too-big coordinate cannot round-trip at this scale either way,
    # so pin the behavior: clamp to the representable range, NaN -> 0)
    quant = np.nan_to_num(
        quant, nan=0.0, posinf=float(2**31 - 1), neginf=float(-(2**31))
    )
    raw = np.clip(quant, -(2.0**31), 2.0**31 - 1).astype(np.int32)
    gps_formats = (1, 3, 6, 7, 8)
    color_offsets = {2: 20, 3: 28, 7: 30, 8: 30}
    dtype_fields = {
        "names": ["x", "y", "z"],
        "formats": ["<i4", "<i4", "<i4"],
        "offsets": [0, 4, 8],
        "itemsize": record_len,
    }
    if point_format in gps_formats:
        dtype_fields["names"] += ["gps_time"]
        dtype_fields["formats"] += ["<f8"]
        dtype_fields["offsets"] += [22 if las14 else 20]
    if point_format in color_offsets:
        color_off = color_offsets[point_format]
        dtype_fields["names"] += ["red", "green", "blue"]
        dtype_fields["formats"] += ["<u2", "<u2", "<u2"]
        dtype_fields["offsets"] += [color_off, color_off + 2, color_off + 4]
    if las14:
        dtype_fields["names"] += ["returns"]
        dtype_fields["formats"] += ["<u1"]
        dtype_fields["offsets"] += [14]
    rec = np.zeros(n, dtype=np.dtype(dtype_fields))
    rec["x"], rec["y"], rec["z"] = raw[:, 0], raw[:, 1], raw[:, 2]
    if point_format in gps_formats:
        if gps_time is None:
            gps_time = 300_000.0 + (
                gps_base + np.arange(n, dtype=np.float64)
            ) * 1e-4
        rec["gps_time"] = np.asarray(gps_time, np.float64)
    if point_format in color_offsets:
        rec["red"] = batch.colors[:, 0].astype(np.uint16) * 257
        rec["green"] = batch.colors[:, 1].astype(np.uint16) * 257
        rec["blue"] = batch.colors[:, 2].astype(np.uint16) * 257
    if las14:
        rec["returns"] = 0x11  # return 1 of 1
    return rec.tobytes()


def write_las(path, batch: PointBatch, point_format: int = 2,
              scale=(0.001, 0.001, 0.001), gps_time=None) -> None:
    """Minimal LAS writer (test fixtures + export tool): one header +
    one record block (:func:`las_header_bytes` / :func:`las_record_bytes`
    are the streaming halves the store exporter composes per batch)."""
    n = len(batch)
    if n:
        pos64 = batch.positions.astype(np.float64)
        # header offset/bbox from fully-finite rows only: a NaN/inf
        # coordinate would poison the min fold and push EVERY point's
        # quantization to garbage (fuzz finding, round 5); non-finite
        # rows themselves quantize through the saturating cast below
        finite = pos64[np.isfinite(pos64).all(axis=1)]
        ref = finite if len(finite) else np.zeros((1, 3), np.float64)
        offset = ref.min(axis=0)
        bbox_min, bbox_max = offset, ref.max(axis=0)
    else:
        offset = np.zeros(3, np.float64)
        bbox_min = bbox_max = offset
    # build both blocks BEFORE opening: a bad point_format must not
    # truncate an existing file at `path`
    header = las_header_bytes(point_format, n, scale, offset,
                              bbox_min=bbox_min, bbox_max=bbox_max)
    records = las_record_bytes(batch, point_format, scale, offset,
                               gps_time=gps_time)
    with open(path, "wb") as f:
        f.write(header)
        f.write(records)
