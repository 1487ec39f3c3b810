"""Deadline-bounded fuzz: device converters (CPU backend) vs host oracle
byte parity over adversarial clouds — stresses the hash-collision
suspect fallback, the resident cascade, and overflow staging orders."""
import os, sys, time, shutil, tempfile
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
import numpy as np
from point_cloud_tpu.ops.runtime import setup_jax_cache
setup_jax_cache()
from point_cloud_tpu.convert.converter import Converter
from point_cloud_tpu.convert.device import DeviceConverter
from point_cloud_tpu.convert.native_device import NativeDeviceConverter
from point_cloud_tpu.core.metadata import Metadata
from point_cloud_tpu.core.point import PointBatch
from pathlib import Path

DEADLINE = time.monotonic() + float(os.environ.get("FUZZ_S", "900"))

def synth(rng, n):
    kind = rng.integers(0, 5)
    if kind == 0:
        pos = rng.uniform(-2000, 2000, (n, 3))
    elif kind == 1:
        pos = rng.normal(0, 0.05, (n, 3))  # deep cascade
    elif kind == 2:
        base = rng.uniform(-50, 50, (max(n // 20, 1), 3))
        pos = base[rng.integers(0, len(base), n)] + rng.normal(0, 1e-5, (n, 3))
    elif kind == 3:
        pos = rng.uniform(-500, 500, (n, 3))
        pos[:, rng.integers(0, 3)] = 0.0  # plane through cell boundaries
    else:
        t = rng.uniform(-300, 300, n)
        pos = t[:, None] * rng.normal(0, 1, 3)[None, :]
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

it = fails = 0
rng0 = np.random.default_rng(555)
batch = 16384  # one pad bucket -> one compiled shape
while time.monotonic() < DEADLINE:
    it += 1
    seed = int(rng0.integers(0, 2**31))
    rng = np.random.default_rng(seed)
    n = int(rng.integers(500, 40000))
    pos = synth(rng, n)
    col = rng.integers(0, 256, (n, 4), dtype=np.uint8)
    root = Path(tempfile.mkdtemp(prefix="fzd_"))
    try:
        convert(Converter, pos, col, root / "host", batch)
        convert(DeviceConverter, pos, col, root / "dev", batch)
        convert(NativeDeviceConverter, pos, col, root / "ndev", batch)
        for other in ("dev", "ndev"):
            ok, why = dirs_equal(root / "host", root / other)
            if not ok:
                fails += 1
                print(f"[FAIL {other} parity] seed={seed} n={n}: {why}", flush=True)
    except Exception as e:
        fails += 1
        print(f"[FAIL exc] seed={seed} n={n}: {e!r}", flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    if it % 5 == 0:
        print(f"[fuzz] {it} iterations, {fails} failures", flush=True)
print(f"[fuzz done] {it} iterations, {fails} failures", flush=True)
sys.exit(1 if fails else 0)
