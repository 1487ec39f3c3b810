"""JAX runtime knobs shared by the CLI, bench and entry points.

TPU sort compilation is expensive (tens of seconds per distinct shape);
the pipelines here are designed to compile a small, fixed set of programs
(scalar grid parameters are traced, batch shapes come from pow2 buckets)
and the persistent compilation cache makes those one-time costs per
machine instead of per process.
"""

from __future__ import annotations

import os
from pathlib import Path

_configured = False


def setup_jax_cache(cache_dir: str | None = None) -> None:
    """Enable the persistent XLA compilation cache (idempotent).

    Also re-asserts an explicit ``JAX_PLATFORMS`` env request: the TPU
    tunnel plugin's sitecustomize ``register()`` overwrites the
    ``jax_platforms`` config in-process, so the env var's documented
    JAX semantics are silently lost — ``JAX_PLATFORMS=cpu python -m
    point_cloud_tpu.serve ...`` would still initialize the tunnel
    client, which HANGS indefinitely when the tunnel endpoint is
    wedged (CLAUDE.md environment constraints). Every entry point
    calls this before its first backend touch, restoring the env var.
    """
    global _configured
    if _configured:
        return
    import jax

    requested = os.environ.get("JAX_PLATFORMS")
    current = jax.config.jax_platforms
    # Restore the env request ONLY over the plugin's own override (or an
    # unset config) — never over a programmatic in-process pin. This
    # environment exports JAX_PLATFORMS=axon globally, so blindly
    # re-asserting the env var here UNDID jax.config.update("cpu") pins
    # (tests, pin_cpu_if_unreachable, CPU-only subprocesses) and sent
    # the first dispatch into the wedged-tunnel hang this function
    # exists to prevent (found by the CLI backend-matrix test: a fresh
    # process pinning cpu then calling the CLI wedged forever).
    if requested and requested != current and current in (
        None, "", "axon", "axon,cpu",
    ):
        try:
            jax.config.update("jax_platforms", requested)
        except Exception:
            pass  # backend already initialized; too late to repin

    path = cache_dir or os.environ.get(
        "PCT_JAX_CACHE", str(Path.home() / ".cache" / "point_cloud_tpu_jax")
    )
    Path(path).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _configured = True


def device_reachable(timeout_s: float | None = None) -> bool:
    """Probe accelerator reachability in a BOUNDED subprocess.

    Through this environment's tunnel a wedged TPU endpoint hangs PJRT
    client creation *inside a C extension* — uninterruptible from
    Python, so an in-process try/except can never bound it; only a
    subprocess + timeout can (the same rule bench.py applies). Callers
    that are about to commit a long job to a device backend use this to
    fail over instead of hanging forever.

    Timeout: ``PCT_DEVICE_PROBE_S`` env (default 180 s — the first
    contact pays ~30 s tunnel setup on a healthy link); <= 0 skips the
    probe and reports reachable.
    """
    import subprocess
    import sys

    if timeout_s is None:
        timeout_s = float(os.environ.get("PCT_DEVICE_PROBE_S", "180"))
    if timeout_s <= 0:
        return True
    # propagate an in-process platform pin (e.g. tests pin cpu via
    # jax.config, not env) so the probe checks the platform this
    # process would actually use; the probe script re-asserts the env
    # var itself because the tunnel plugin's sitecustomize overwrites it
    env = dict(os.environ)
    try:
        import jax

        configured = jax.config.jax_platforms
        if configured:
            env["JAX_PLATFORMS"] = configured
    except Exception:
        pass
    script = (
        "import os, jax\n"
        "p = os.environ.get('JAX_PLATFORMS')\n"
        "if p: jax.config.update('jax_platforms', p)\n"
        "jax.devices(); print('ok')\n"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", script],
            capture_output=True, text=True, timeout=timeout_s, env=env,
        )
    except subprocess.TimeoutExpired:
        return False
    return proc.returncode == 0 and "ok" in proc.stdout


def pin_cpu_if_unreachable(log=None) -> bool:
    """For LONG-RUNNING entry points (serve, the viewer window): if the
    accelerator is unreachable within the probe budget, pin this
    process to the CPU platform so the first frame degrades to host
    rendering instead of hanging forever in PJRT client creation.
    Returns True when the fallback was applied. Must run before the
    process's first backend touch (entry points call it right after
    :func:`setup_jax_cache`)."""
    if device_reachable():
        return False
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        return False  # backend already initialized; nothing safe to do
    if log is not None:
        log.warning(
            "accelerator unreachable within the probe budget "
            "(PCT_DEVICE_PROBE_S); rendering on the CPU platform"
        )
    return True
