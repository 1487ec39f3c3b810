"""Multi-host conversion: shard files across workers, merge the stores.

The reference is strictly single-process (SURVEY.md section 5); this is
new TPU-era architecture for pod-scale builds (BASELINE config 5):

1. each host converts its file shard into a private staging store with its
   local chips (``worker_file_shard`` gives the deterministic partition),
2. stores merge pairwise/tree-wise with :func:`merge_stores` — merging is
   just re-conversion with the own-format reader (io/own.py) into the
   destination, which the incremental-merge contract already defines
   (reference: point-converter/src/lib.rs:86-101 — the same mechanism that
   makes conversion resumable),
3. the destination store obeys exactly the single-host pipeline's rules
   (hex-dedup winners, overflow accounting, codec) and holds exactly the
   union point multiset of its inputs — tested in
   tests/test_multihost.py::test_merged_points_equal_single_host.
   It is NOT generally byte-identical to a from-scratch single-host
   conversion of the original files: overflow groups flush when a
   *batch* pushes them over the limit, so different shard boundaries
   buffer different tails (the reference's own incremental merge has the
   same property, lib.rs:86-101 — merging is arrival-order-dependent by
   design).

On a real multi-host pod the per-host converter is MeshConverter over the
host's local mesh (jax.distributed handles process groups); the merge step
is pure host I/O and runs anywhere.
"""

from __future__ import annotations

from pathlib import Path

from ..convert.converter import convert_from_paths, load_metadata


def worker_file_shard(paths, worker_index: int, n_workers: int) -> list:
    """Deterministic round-robin file partition (size-agnostic)."""
    if not 0 <= worker_index < n_workers:
        raise ValueError("worker_index out of range")
    ordered = sorted(Path(p) for p in paths)
    return [p for i, p in enumerate(ordered) if i % n_workers == worker_index]


def convert_sharded(paths, staging_root, worker_index: int, n_workers: int,
                    converter_factory=None, batch_size=None,
                    cache_size=None) -> Path:
    """Convert this worker's shard into ``staging_root/worker_<i>``."""
    from ..convert.converter import (
        Converter, DEFAULT_BATCH_SIZE, DEFAULT_CACHE_SIZE,
    )

    shard = worker_file_shard(paths, worker_index, n_workers)
    out = Path(staging_root) / f"worker_{worker_index}"
    convert_from_paths(
        shard,
        out,
        batch_size=batch_size or DEFAULT_BATCH_SIZE,
        cache_size=cache_size or DEFAULT_CACHE_SIZE,
        converter_factory=converter_factory or Converter,
    )
    return out


def merge_stores(sources, dest, converter_factory=None,
                 batch_size=None, cache_size=None) -> None:
    """Merge converted stores into ``dest`` (re-conversion via the
    own-format reader; idempotent per source, crash-resumable)."""
    from ..convert.converter import (
        Converter, DEFAULT_BATCH_SIZE, DEFAULT_CACHE_SIZE,
    )

    metadata_files = [Path(s) / "metadata.json" for s in sources]
    for m in metadata_files:
        if not m.exists():
            raise FileNotFoundError(m)
    convert_from_paths(
        metadata_files,
        dest,
        batch_size=batch_size or DEFAULT_BATCH_SIZE,
        cache_size=cache_size or DEFAULT_CACHE_SIZE,
        converter_factory=converter_factory or Converter,
    )
