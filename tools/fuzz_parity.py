"""Deadline-bounded fuzz: byte-parity (Converter vs NativeConverter),
fsck, and LAZ round-trips over adversarial random clouds."""
import os, sys, time, shutil, tempfile, subprocess, filecmp
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
import numpy as np
from point_cloud_tpu.convert.converter import Converter
from point_cloud_tpu.convert.native import NativeConverter
from point_cloud_tpu.core.metadata import Metadata
from point_cloud_tpu.core.point import PointBatch
from point_cloud_tpu.validate import validate_store

DEADLINE = time.monotonic() + float(os.environ.get("FUZZ_S", "1100"))

def synth(rng, n):
    kind = rng.integers(0, 6)
    if kind == 0:   # uniform huge range
        pos = rng.uniform(-1e6, 1e6, (n, 3))
    elif kind == 1: # dense micro-cluster (deep cascade)
        pos = rng.normal(0, 0.01, (n, 3))
    elif kind == 2: # exact duplicates + jitter
        base = rng.uniform(-100, 100, (max(n // 10, 1), 3))
        pos = base[rng.integers(0, len(base), n)]
        jit = rng.random(n) < 0.5
        pos = pos + np.where(jit[:, None], rng.normal(0, 1e-6, (n, 3)), 0.0)
    elif kind == 3: # axis-aligned plane at a cell boundary
        pos = rng.uniform(-500, 500, (n, 3))
        pos[:, 2] = rng.choice([0.0, 1000.0, -1000.0], n) + rng.normal(0, 1e-5, n)
    elif kind == 4: # extreme magnitudes incl. tiny/huge
        mag = 10.0 ** rng.uniform(-30, 30, (n, 3))
        pos = mag * rng.choice([-1.0, 1.0], (n, 3))
        pos = np.clip(pos, -3e37, 3e37)
    else:           # colinear line
        t = rng.uniform(-1000, 1000, n)
        d = rng.normal(0, 1, 3)
        pos = t[:, None] * d[None, :]
    return pos.astype(np.float32)

def convert(cls, pos, col, out, batch):
    with cls(Metadata(), out) as conv:
        for i in range(0, len(pos), batch):
            conv.add_points_batch(PointBatch(pos[i:i+batch], col[i:i+batch]))

def dirs_equal(a, b):
    pa = sorted(p.relative_to(a) for p in a.rglob("*") if p.is_file())
    pb = sorted(p.relative_to(b) for p in b.rglob("*") if p.is_file())
    if pa != pb:
        return False, f"file sets differ: {set(pa) ^ set(pb)}"
    for rel in pa:
        if (a / rel).read_bytes() != (b / rel).read_bytes():
            return False, f"bytes differ: {rel}"
    return True, ""

from pathlib import Path
from point_cloud_tpu.io import laz as lazmod
from point_cloud_tpu.io.laz import write_laz
from point_cloud_tpu.io import get_batched_point_reader

it = 0
fails = 0
rng0 = np.random.default_rng(20260820)
while time.monotonic() < DEADLINE:
    it += 1
    seed = int(rng0.integers(0, 2**31))
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 30000))
    batch = int(rng.choice([256, 1024, 4096, 16384]))
    pos = synth(rng, n)
    col = rng.integers(0, 256, (n, 4), dtype=np.uint8)
    root = Path(tempfile.mkdtemp(prefix="fz_"))
    try:
        convert(Converter, pos, col, root / "host", batch)
        convert(NativeConverter, pos, col, root / "native", batch)
        ok, why = dirs_equal(root / "host", root / "native")
        if not ok:
            fails += 1
            print(f"[FAIL parity] seed={seed} n={n} batch={batch}: {why}", flush=True)
        rep = validate_store(root / "host")
        if rep.issues:
            fails += 1
            print(f"[FAIL fsck] seed={seed} n={n}: {rep.issues[:3]}", flush=True)
        # LAZ round-trip on a small slice, random point format
        m = min(n, 2048)
        fmt = int(rng.choice([0, 1, 2, 3, 6, 7, 8]))
        # oracle = the .las twin: LAS and LAZ share the i32 scale
        # quantization, so their decoded batches must match EXACTLY
        f = root / "t.laz"
        g = root / "t.las"
        try:
            from point_cloud_tpu.io.las import write_las

            write_laz(f, PointBatch(pos[:m], col[:m]), point_format=fmt)
            write_las(g, PointBatch(pos[:m], col[:m]), point_format=fmt)
            a = get_batched_point_reader(f).get_batch(m)
            b = get_batched_point_reader(g).get_batch(m)
            if not np.array_equal(a.positions, b.positions):
                fails += 1
                print(f"[FAIL laz pos] seed={seed} fmt={fmt} m={m}", flush=True)
            if not np.array_equal(a.colors, b.colors):
                fails += 1
                print(f"[FAIL laz rgb] seed={seed} fmt={fmt} m={m}", flush=True)
        except Exception as e:
            fails += 1
            print(f"[FAIL laz exc] seed={seed} fmt={fmt}: {e!r}", flush=True)
    except Exception as e:
        fails += 1
        print(f"[FAIL exc] seed={seed} n={n} batch={batch}: {e!r}", flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    if it % 10 == 0:
        print(f"[fuzz] {it} iterations, {fails} failures", flush=True)
print(f"[fuzz done] {it} iterations, {fails} failures", flush=True)
sys.exit(1 if fails else 0)
