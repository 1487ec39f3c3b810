"""Deadline-bounded fuzz: MeshConverter (virtual 8-device CPU mesh) vs
host oracle — byte-compared stores over adversarial clouds (stresses
the owner-sharded cascade's sideband + the round-5 winner audit)."""
import os, sys, time, shutil, tempfile
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 "
    + os.environ.get("XLA_FLAGS", "")
)
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
import numpy as np
from point_cloud_tpu.convert.converter import Converter
from point_cloud_tpu.parallel.mesh_converter import make_mesh_converter_factory
from point_cloud_tpu.core.metadata import Metadata
from point_cloud_tpu.core.point import PointBatch
from pathlib import Path

DEADLINE = time.monotonic() + float(os.environ.get("FUZZ_S", "900"))
factory = make_mesh_converter_factory(8, local=True)

def synth(rng, n):
    kind = rng.integers(0, 5)
    if kind == 0: pos = rng.uniform(-2000, 2000, (n, 3))
    elif kind == 1: pos = rng.normal(0, 0.05, (n, 3))
    elif kind == 2:
        base = rng.uniform(-50, 50, (max(n // 20, 1), 3))
        pos = base[rng.integers(0, len(base), n)] + rng.normal(0, 1e-5, (n, 3))
    elif kind == 3:
        pos = rng.uniform(-500, 500, (n, 3)); pos[:, rng.integers(0, 3)] = 0.0
    else:
        t = rng.uniform(-300, 300, n); pos = t[:, None] * rng.normal(0, 1, 3)[None, :]
    return pos.astype(np.float32)

def convert(factory_fn, pos, col, out, batch):
    with factory_fn(Metadata(), out) as conv:
        for i in range(0, len(pos), batch):
            conv.add_points_batch(PointBatch(pos[i:i+batch], col[i:i+batch]))

it = fails = 0
rng0 = np.random.default_rng(999)
batch = 16384
while time.monotonic() < DEADLINE:
    it += 1
    seed = int(rng0.integers(0, 2**31))
    rng = np.random.default_rng(seed)
    n = int(rng.integers(2000, 40000))
    pos = synth(rng, n)
    col = rng.integers(0, 256, (n, 4), dtype=np.uint8)
    root = Path(tempfile.mkdtemp(prefix="fm_"))
    try:
        convert(Converter, pos, col, root / "host", batch)
        convert(factory, pos, col, root / "mesh", batch)
        rels = sorted(p.relative_to(root/"host")
                      for p in (root/"host").rglob("*") if p.is_file())
        rels_m = sorted(p.relative_to(root/"mesh")
                        for p in (root/"mesh").rglob("*") if p.is_file())
        bad = rels != rels_m or any(
            (root/"host"/r).read_bytes() != (root/"mesh"/r).read_bytes()
            for r in rels)
        if bad:
            fails += 1
            print(f"[FAIL mesh parity] seed={seed} n={n}", flush=True)
    except Exception as e:
        fails += 1
        print(f"[FAIL exc] seed={seed} n={n}: {e!r}", flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    if it % 5 == 0:
        print(f"[fuzz] {it} iterations, {fails} failures", flush=True)
print(f"[fuzz done] {it} iterations, {fails} failures", flush=True)
sys.exit(1 if fails else 0)
