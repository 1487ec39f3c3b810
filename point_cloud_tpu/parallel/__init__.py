"""Multi-chip scale-out: jax.sharding Mesh + shard_map conversion.

The reference is a single-process app whose only parallelism is a 2-thread
pool (reference: thread-pool/src/lib.rs, SURVEY.md section 5 "distributed
communication backend: absent"); this package is new TPU-first
architecture: point batches shard across a device mesh, each shard runs
the fused dedup locally, global reductions (bounding box, point counters)
ride ICI collectives (psum), and shard-local winners merge in a final
owner pass.
"""

from .mesh import make_mesh  # noqa: F401
