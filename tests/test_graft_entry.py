"""Driver entry-point checks (__graft_entry__.py).

The multi-chip dry run must pass in a *fresh* process the way the driver
invokes it — with however many devices that process happens to see — so
these tests run it through a subprocess, not in the pytest process (whose
JAX is already configured by conftest.py).
"""

import os
import subprocess
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]


def _run_dryrun(extra_code: str = "") -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    # force the CPU platform so this test never depends on TPU hardware;
    # it still starts at 1 device, so the virtual-mesh bootstrap
    # (clear_backends + jax_num_cpu_devices) is fully exercised
    env["JAX_PLATFORMS"] = "cpu"
    code = (
        extra_code
        + "import __graft_entry__\n"
        + "__graft_entry__.dryrun_multichip(8)\n"
        + "print('DRYRUN_OK')\n"
    )
    return subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO_ROOT, env=env, capture_output=True, text=True, timeout=600,
    )


def test_dryrun_multichip_fresh_process():
    proc = _run_dryrun()
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "DRYRUN_OK" in proc.stdout


def test_dryrun_multichip_after_jax_initialized():
    # the driver (or a plugin's sitecustomize) may initialize a 1-device
    # backend before calling; the bootstrap must rebuild the client.
    # Pin the CPU platform before probing: the axon register() overrides
    # JAX_PLATFORMS in-process with "axon,cpu", so a bare jax.devices()
    # here would initialize the TPU tunnel client — an unbounded hang
    # whenever the tunnel is unhealthy, and irrelevant to what this
    # test exercises (the clear_backends + 8-device rebuild)
    proc = _run_dryrun(
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1\n"
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "DRYRUN_OK" in proc.stdout


def test_entry_compiles_and_runs():
    import jax

    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
