"""Bounded-RAM streaming-conversion scale proof (BASELINE configs 3/5).

Reproducible harness behind the PERF.md scale anchors (the 100M-point
city scan, and the 1B-point run): converts an arbitrarily large
synthetic city scan through the C++ engine with a fixed cell budget, so
RSS stays bounded no matter the point count, then fscks the result with
``point_cloud_tpu.validate``. Nothing is ever fully resident: each scan
region is generated on the fly (mirroring the reference's batch loop
over an unbounded reader, point-converter/src/lib.rs:31-52) and handed
to the engine in converter batches.

    python tools/scale_proof.py --points 100_000_000
    python tools/scale_proof.py --points 1_000_000_000 --cache 1024

Prints one JSON summary line (wall time, Mpts/s, peak RSS, store size,
fsck verdict) and exits non-zero if the fsck finds any issue.
"""

from __future__ import annotations

import argparse
import json
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REGION_POINTS = 2_000_000
# Region tiles step 800 m in a square grid: synth_cloud spans +-500 m,
# so neighbouring regions overlap at the seams like real flight lines.
REGION_SPACING = 800.0


def _region(k: int, n: int) -> np.ndarray:
    """Region k of the city scan: the bench's LiDAR mix, translated."""
    from bench import synth_cloud

    # near-square row-major grid walk, deterministic in k
    gx, gy = k % 32, k // 32
    pos = synth_cloud(n, seed=k)
    pos[:, 0] += np.float32(gx * REGION_SPACING)
    pos[:, 1] += np.float32(gy * REGION_SPACING)
    return pos


def _colors(rng: np.random.Generator, n: int) -> np.ndarray:
    c = rng.integers(0, 256, (n, 4), dtype=np.int64).astype(np.uint8)
    c[:, 3] = 255
    return c


def _peak_rss_gb() -> float:
    for line in open("/proc/self/status"):
        if line.startswith("VmHWM"):
            return int(line.split()[1]) / 1e6  # kB -> GB
    return float("nan")


def _dir_size_gb(path: Path) -> float:
    total = 0
    for p in path.rglob("*"):
        if p.is_file():
            total += p.stat().st_size
    return total / 1e9


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--points", type=int, default=100_000_000)
    ap.add_argument("--batch", type=int, default=1 << 19,
                    help="converter batch size (points)")
    ap.add_argument("--cache", type=int, default=512,
                    help="engine cell budget (cells kept in RAM; "
                         "colder cells spill to the store between batches)")
    ap.add_argument("--out", default=None,
                    help="store directory (default: temp dir, deleted "
                         "after the fsck)")
    ap.add_argument("--keep", action="store_true",
                    help="keep the store directory")
    ap.add_argument("--skip-fsck", action="store_true")
    ap.add_argument("--export", default=None, choices=("las", "laz", "ply"),
                    help="after the fsck, stream-export the store to this "
                         "format and record wall/throughput/RSS growth "
                         "(proves the exporter's constant-RAM claim at "
                         "scale)")
    args = ap.parse_args()

    from point_cloud_tpu.convert.native import NativeConverter
    from point_cloud_tpu.core.metadata import Metadata
    from point_cloud_tpu.core.point import PointBatch

    out = Path(args.out) if args.out else Path(
        tempfile.mkdtemp(prefix="pct_scale_")
    )
    cleanup = args.out is None and not args.keep
    n_regions = (args.points + REGION_POINTS - 1) // REGION_POINTS
    rng = np.random.default_rng(12345)

    print(f"[scale_proof] {args.points:,} points, {n_regions} regions, "
          f"batch {args.batch}, cell budget {args.cache} -> {out}",
          file=sys.stderr)

    t0 = time.perf_counter()
    fed = 0
    try:
        with NativeConverter(Metadata(), out, cache_size=args.cache) as conv:
            for k in range(n_regions):
                take = min(REGION_POINTS, args.points - fed)
                if take <= 0:
                    break
                pos = _region(k, take)
                for i in range(0, take, args.batch):
                    j = min(i + args.batch, take)
                    conv.add_points_batch(
                        PointBatch(pos[i:j], _colors(rng, j - i))
                    )
                fed += take
                if (k + 1) % 25 == 0 or k == n_regions - 1:
                    el = time.perf_counter() - t0
                    print(f"[scale_proof] region {k + 1}/{n_regions}  "
                          f"{fed / 1e6:.0f} Mpts  {el:.0f}s  "
                          f"{fed / el / 1e6:.2f} Mpts/s  "
                          f"rss {_peak_rss_gb():.2f} GB", file=sys.stderr)
        wall = time.perf_counter() - t0

        meta = json.load(open(out / "metadata.json"))
        assert meta["number_of_points"] == fed, (
            meta["number_of_points"], fed)
        cells = sum(1 for _ in out.rglob("*.bin"))
        result = {
            "points": fed,
            "wall_s": round(wall, 1),
            "mpts_per_s": round(fed / wall / 1e6, 3),
            "peak_rss_gb": round(_peak_rss_gb(), 2),
            "cells": cells,
            "hierarchies": meta["hierarchies"],
            "store_gb": round(_dir_size_gb(out), 2),
            "cell_budget": args.cache,
        }

        if not args.skip_fsck:
            t1 = time.perf_counter()
            proc = subprocess.run(
                [sys.executable, "-m", "point_cloud_tpu.validate", str(out)],
                capture_output=True, text=True,
                cwd=Path(__file__).resolve().parent.parent,
            )
            result["fsck_ok"] = proc.returncode == 0
            result["fsck_s"] = round(time.perf_counter() - t1, 1)
            if proc.returncode != 0:
                print(proc.stdout + proc.stderr, file=sys.stderr)
            else:
                # surface the validator's reconciliation line
                for line in proc.stdout.splitlines():
                    print(f"[fsck] {line}", file=sys.stderr)

        if args.export:
            from point_cloud_tpu.export import export_store

            dst = out / f"exported.{args.export}"
            rss_before = _peak_rss_gb()
            t2 = time.perf_counter()
            n_exp = export_store(out, dst, fmt=args.export)
            export_wall = time.perf_counter() - t2
            result["export_fmt"] = args.export
            result["export_points"] = n_exp
            result["export_wall_s"] = round(export_wall, 1)
            result["export_mpts_per_s"] = round(
                n_exp / export_wall / 1e6, 3
            )
            result["export_file_gb"] = round(
                dst.stat().st_size / 1024**3, 2
            )
            # VmHWM growth during export = the exporter's real working
            # set beyond the conversion's (streamed batches => ~0)
            result["export_rss_growth_gb"] = round(
                _peak_rss_gb() - rss_before, 2
            )
            if not args.keep:
                dst.unlink()

        print(json.dumps(result))
        return 0 if result.get("fsck_ok", True) else 1
    finally:
        if cleanup:
            shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
