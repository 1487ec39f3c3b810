"""Mesh-sharded dedup: the multi-chip conversion step.

The single-chip pipeline sorts the whole batch (ops/dedup.py). Multi-chip,
the batch shards across the mesh's data axis and each shard runs the same
fused sort + winner-flag pass locally (shard_map; zero inter-chip traffic
for the dominant per-point work). Global metadata — the batch bounding box
and the valid-point count — reduces over ICI with ``psum``/``pmin``-style
collectives in the same program.

Correctness of two-stage dedup (shard-local stage A, then a merge pass
over the shard winners): argmin over a (cell, slot) group is associative,
so reducing shard-local winners in a second pass yields exactly the global
winner set; every non-winner (shard-local loser or merge loser) is a
cascade point, identical to the single-pass outcome. Arrival-order ties
stay exact because rows keep their global arrival index through both
stages.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import dedup as dedup_mod
from ..ops.dedup import pad_to_bucket


def _stage_a_local(positions, valid, cell_size, sub_cell_radius, next_cell_size):
    """Per-shard body: fused dedup over the local rows + local reductions.

    ``dedup_pass`` resolves through the module attribute at trace time so
    the pallas->bitonic degrade rebinding (ops.dedup.mark_pallas_broken)
    reaches programs compiled after a failure — a by-value import would
    pin the broken backend (advisor r2, medium).
    """
    (perm, winner, valid_s, cell_idx_s, sub_idx_s, dist_s, next_idx_s,
     suspect) = dedup_mod.dedup_pass(
        positions, valid, cell_size, sub_cell_radius, next_cell_size
    )
    big = jnp.float32(3.4e38)
    masked = jnp.where(valid[:, None], positions, big)
    local_min = jnp.min(masked, axis=0)
    masked = jnp.where(valid[:, None], positions, -big)
    local_max = jnp.max(masked, axis=0)
    bbox_min = jax.lax.pmin(local_min, "data")
    bbox_max = jax.lax.pmax(local_max, "data")
    count = jax.lax.psum(jnp.sum(valid.astype(jnp.int32)), "data")
    return (perm, winner, valid_s, cell_idx_s, sub_idx_s, dist_s,
            next_idx_s, suspect, bbox_min, bbox_max, count)


def make_sharded_dedup(mesh: Mesh):
    """Compile the mesh-sharded stage-A dedup + psum'd batch reductions.

    Returns a function of (positions (N, 3), valid (N,)) — N divisible by
    the mesh size — and the three f32 scalars (cell_size, sub_cell_radius,
    next_cell_size). Outputs keep the data sharding (each shard's rows are
    sorted/flagged locally); bbox/count are replicated.
    """
    spec = P("data")
    from jax import shard_map

    fn = shard_map(
        _stage_a_local,
        mesh=mesh,
        in_specs=(P("data", None), spec, P(), P(), P()),
        out_specs=(
            spec, spec, spec, P("data", None), P("data", None), spec,
            P("data", None), spec, P(), P(), P(),
        ),
    )
    return jax.jit(fn)


class ShardedDedup:
    """Host wrapper around the compiled sharded stage-A pass."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh
        self.n = mesh.devices.size
        self._fn = make_sharded_dedup(mesh)

    def __call__(self, positions: np.ndarray, cell_size, sub_cell_size):
        """Shard-local dedup; returns per-row NumPy arrays + batch reductions.

        Outputs (all length N_pad, with ``valid_s`` masking real rows and
        ``global_arrival`` giving each sorted row's index into the input):
        winners/cells/subs/next-cells per shard-sorted order.
        """
        n = len(positions)
        n_pad = pad_to_bucket(max(n, 1), minimum=1024 * self.n)
        if n_pad % self.n:
            n_pad += self.n - (n_pad % self.n)
        pos_pad = np.zeros((n_pad, 3), np.float32)
        pos_pad[:n] = positions
        valid = np.zeros(n_pad, bool)
        valid[:n] = True

        cell_size = np.float32(cell_size)
        sub_cell_size = np.float32(sub_cell_size)
        sharding = NamedSharding(self.mesh, P("data"))
        pos_dev = jax.device_put(
            pos_pad, NamedSharding(self.mesh, P("data", None))
        )
        valid_dev = jax.device_put(valid, sharding)

        fn_args = (
            pos_dev,
            valid_dev,
            jnp.float32(cell_size),
            jnp.float32(sub_cell_size / np.float32(2.0)),
            jnp.float32(cell_size / np.float32(2.0)),
        )
        try:
            (perm, winner, valid_s, cell_idx_s, sub_idx_s, dist_s,
             next_idx_s, suspect, bbox_min, bbox_max, count) = (
                self._fn(*fn_args)
            )
            # per-shard perm indexes local rows; lift to global arrival
            # indices. The first np.asarray also synchronizes, so an
            # asynchronously-surfacing pallas launch failure lands inside
            # this try block and hits the degrade below
            perm = np.asarray(perm)
        except Exception:
            # Pallas-under-shard_map failure on an unvetted mesh/libtpu:
            # degrade the process to the bitonic backend and recompile
            # the sharded program over the rebound bodies (same recovery
            # as ops.dedup._guarded_call; advisor r2, medium)
            if dedup_mod._resolve_backend() != "pallas":
                raise
            import logging

            logging.getLogger(__name__).warning(
                "pallas sort failed under shard_map; degrading the mesh "
                "pass to the bitonic backend",
                exc_info=True,
            )
            dedup_mod.mark_pallas_broken()
            self._fn = make_sharded_dedup(self.mesh)
            (perm, winner, valid_s, cell_idx_s, sub_idx_s, dist_s,
             next_idx_s, suspect, bbox_min, bbox_max, count) = (
                self._fn(*fn_args)
            )
            perm = np.asarray(perm)
        # np.array, not asarray: device arrays view as READ-ONLY and the
        # suspect fallback below writes winner[sl] in place (latent until
        # the near-tie audit made suspects routine)
        winner = np.array(winner)
        suspect = np.asarray(suspect)
        cell_idx_np = np.asarray(cell_idx_s)
        sub_idx_np = np.asarray(sub_idx_s)
        dist_np = np.asarray(dist_s)
        shard_size = n_pad // self.n
        if suspect.any():
            from ..ops.dedup import resolve_suspects_host

            for s in range(self.n):
                sl = slice(s * shard_size, (s + 1) * shard_size)
                winner[sl] = resolve_suspects_host(
                    perm[sl], winner[sl], cell_idx_np[sl], sub_idx_np[sl],
                    dist_np[sl], suspect[sl],
                )
        shard_of = np.repeat(np.arange(self.n), shard_size)
        global_arrival = perm + shard_of * shard_size
        return {
            "global_arrival": global_arrival,
            "winner": winner,
            "valid": np.asarray(valid_s),
            "cell_idx": cell_idx_np,
            "sub_idx": sub_idx_np,
            "next_idx": np.asarray(next_idx_s),
            "bbox_min": np.asarray(bbox_min),
            "bbox_max": np.asarray(bbox_max),
            "count": int(count),
        }
