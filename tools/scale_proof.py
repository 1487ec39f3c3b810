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


def _strip_region(k: int, n: int) -> np.ndarray:
    """Region k of a 1-D strip city (sharded mode): tiles step along x
    only, so the spatial adjacency structure — which tile pairs share
    hex cones — is explicit and the worker partition can be reasoned
    about (contiguous blocks share cones only at block boundaries)."""
    from bench import synth_cloud

    pos = synth_cloud(n, seed=k)
    pos[:, 0] += np.float32(k * REGION_SPACING)
    return pos


def run_sharded(args) -> int:
    """BASELINE config 5 shape at scale (VERDICT r4 #5): N workers each
    convert a file shard (`parallel.multihost.convert_sharded`), then the
    staging stores reduce through a binary `merge_stores` tree — the
    virtual-pod version of the 8-host build. Reports per-worker walls,
    the tree's per-level merge walls, the merge share against the
    pod-parallel critical path (slowest worker + the merge tree), peak
    RSS, and the final store's fsck verdict."""
    from point_cloud_tpu.convert.native import NativeConverter
    from point_cloud_tpu.io.ply import write_ply
    from point_cloud_tpu.parallel.multihost import (
        convert_sharded, merge_stores,
    )
    from point_cloud_tpu.core.point import PointBatch

    n_workers = args.workers
    root = Path(args.out) if args.out else Path(
        tempfile.mkdtemp(prefix="pct_pod_")
    )
    cleanup = args.out is None and not args.keep
    inputs = root / "inputs"
    staging = root / "staging"
    inputs.mkdir(parents=True, exist_ok=True)
    staging.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(777)

    n_regions = (args.points + REGION_POINTS - 1) // REGION_POINTS
    n_regions -= n_regions % n_workers  # equal blocks
    n_regions = max(n_regions, n_workers)
    per = n_regions // n_workers
    base, rem = divmod(args.points, n_regions)  # spread points evenly
    total = 0

    # File naming pins the spatial partition: worker_file_shard deals
    # files round-robin over SORTED names, so sorted position j maps to
    # region (j % N) * per + j // N — worker w then receives the
    # CONTIGUOUS block [w*per, (w+1)*per) of strip tiles, the flight-
    # line partition a real pod uses (cross-worker cone overlap only at
    # the N-1 block seams, which is what the cell-level merge is for).
    t0 = time.perf_counter()
    for r in range(n_regions):
        take = base + (1 if r < rem else 0)
        pos = _strip_region(r, take)
        j = (r % per) * n_workers + r // per
        write_ply(
            inputs / f"part_{j:04d}.ply",
            PointBatch(pos, _colors(rng, take)),
        )
        total += take
    gen_wall = time.perf_counter() - t0
    paths = sorted(inputs.glob("*.ply"))
    print(f"[scale_proof] sharded: {total:,} pts, {n_regions} region "
          f"files, {n_workers} workers x {per} regions "
          f"(input gen {gen_wall:.0f}s) -> {root}", file=sys.stderr)

    def factory(metadata, out_dir, cache_size=None, **kw):
        return NativeConverter(
            metadata, out_dir, cache_size=cache_size or args.cache, **kw
        )

    worker_walls = []
    worker_dirs = []
    try:
        for w in range(n_workers):
            t1 = time.perf_counter()
            out_w = convert_sharded(
                paths, staging, w, n_workers,
                converter_factory=factory, batch_size=args.batch,
                cache_size=args.cache,
            )
            worker_walls.append(time.perf_counter() - t1)
            worker_dirs.append(out_w)
            print(f"[scale_proof] worker {w}: {worker_walls[-1]:.0f}s "
                  f"rss {_peak_rss_gb():.2f} GB", file=sys.stderr)
        shutil.rmtree(inputs, ignore_errors=True)  # bound disk

        # binary merge tree: level l merges pairs of the previous
        # level. On a real pod each level's merges run on DIFFERENT
        # hosts concurrently, so the pod-parallel critical path counts
        # the slowest merge per level; this 1-core harness runs them
        # sequentially and reports both accountings.
        level = list(worker_dirs)
        merge_walls = []       # per level: sum over its merges (this host)
        merge_walls_max = []   # per level: slowest single merge (pod)
        lvl = 0
        while len(level) > 1:
            lvl += 1
            nxt = []
            walls = []
            for i in range(0, len(level) - 1, 2):
                dest = staging / f"m{lvl}_{i // 2}"
                t2 = time.perf_counter()
                merge_stores(
                    [level[i], level[i + 1]], dest,
                    converter_factory=factory, batch_size=args.batch,
                    cache_size=args.cache,
                )
                walls.append(time.perf_counter() - t2)
                shutil.rmtree(level[i], ignore_errors=True)
                shutil.rmtree(level[i + 1], ignore_errors=True)
                nxt.append(dest)
            if len(level) % 2:
                nxt.append(level[-1])
            merge_walls.append(round(sum(walls), 1))
            merge_walls_max.append(round(max(walls), 1))
            print(f"[scale_proof] merge level {lvl}: {merge_walls[-1]}s "
                  f"(slowest single merge {merge_walls_max[-1]}s)",
                  file=sys.stderr)
            level = nxt
        final = level[0]

        meta = json.load(open(final / "metadata.json"))
        assert meta["number_of_points"] == total, (
            meta["number_of_points"], total)
        # pod-parallel critical path: workers run concurrently on a real
        # pod, then each merge level's slowest merge gates the next
        critical = max(worker_walls) + sum(merge_walls_max)
        result = {
            "mode": "sharded",
            "workers": n_workers,
            "points": total,
            "worker_walls_s": [round(w, 1) for w in worker_walls],
            "convert_wall_max_s": round(max(worker_walls), 1),
            "convert_wall_sum_s": round(sum(worker_walls), 1),
            "merge_walls_s": merge_walls,
            "merge_walls_max_s": merge_walls_max,
            "merge_wall_s": round(sum(merge_walls), 1),
            "merge_share": round(sum(merge_walls_max) / critical, 3),
            "pod_critical_path_s": round(critical, 1),
            "pod_mpts_per_s": round(total / critical / 1e6, 3),
            "peak_rss_gb": round(_peak_rss_gb(), 2),
            "hierarchies": meta["hierarchies"],
            "store_gb": round(_dir_size_gb(final), 2),
        }
        if not args.skip_fsck:
            t3 = time.perf_counter()
            proc = subprocess.run(
                [sys.executable, "-m", "point_cloud_tpu.validate",
                 str(final)],
                capture_output=True, text=True,
                cwd=Path(__file__).resolve().parent.parent,
            )
            result["fsck_ok"] = proc.returncode == 0
            result["fsck_s"] = round(time.perf_counter() - t3, 1)
            if proc.returncode != 0:
                print(proc.stdout + proc.stderr, file=sys.stderr)
        print(json.dumps(result))
        return 0 if result.get("fsck_ok", True) else 1
    finally:
        if cleanup:
            shutil.rmtree(root, ignore_errors=True)


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
    ap.add_argument("--workers", type=int, default=0, metavar="N",
                    help="virtual-pod mode: N sharded workers "
                         "(convert_sharded) + a binary merge_stores tree "
                         "instead of one streaming conversion")
    ap.add_argument("--export", default=None, choices=("las", "laz", "ply"),
                    help="after the fsck, stream-export the store to this "
                         "format and record wall/throughput/RSS growth "
                         "(proves the exporter's constant-RAM claim at "
                         "scale)")
    args = ap.parse_args()

    if args.workers:
        return run_sharded(args)

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
