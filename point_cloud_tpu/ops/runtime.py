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
    """Enable the persistent XLA compilation cache (idempotent)."""
    global _configured
    if _configured:
        return
    import jax

    path = cache_dir or os.environ.get(
        "PCT_JAX_CACHE", str(Path.home() / ".cache" / "point_cloud_tpu_jax")
    )
    Path(path).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _configured = True
