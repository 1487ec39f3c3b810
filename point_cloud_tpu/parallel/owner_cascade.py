"""Owner-sharded dedup: the multi-chip merge stage (SURVEY §7 item 3).

Round 2's mesh path sharded only stage A (the per-point sort); the shard
winners then funnelled through a *single-device* merge sort, so on a real
pod N-1 chips idled while one chip serialized every merge. This module
keeps the merge on the mesh: after the shard-local dedup, every surviving
candidate is routed to the device that *owns* its hex slot by a
``jax.lax.all_to_all`` over the ICI, and each owner runs the global
winner-of-winners sort over only its slots. No single-device stage
remains; device work per chip is a few local-shard-sized sorts instead of
one full-batch sort.

Ownership is keyed by the slot hash, not the cell hash: dedup's merge
invariant is per *(cell, slot)* — a slot's winner must be decided by
exactly one device — and slot-keyed routing achieves that while staying
load-balanced even at coarse hierarchies where the whole cloud fits in a
handful of cells (cell-keyed routing would send level 0's entire batch to
one chip). Host store writes stay per-cell and are process-exclusive;
multi-host file ownership is by input sharding + rank-0 merge
(parallel/multihost.py, parallel/launch.py).

Exactness: routing uses fixed-capacity per-(src, dst) buckets (static
shapes for XLA). Rows that don't fit (``spilled``) and rows inside
hash-collision runs (``suspect``) are excluded from the device decision
and resolved exactly on the host against the device winners
(mesh_converter.resolve_sideband); both are rare and counted. The final
winner per (cell, slot) is min-(distance, global arrival) over ALL
candidates — byte-identical to the host oracle (tests/test_parallel.py
compares stores file-by-file).

Reference semantics contract: the sequential converter cascade at
point-converter/src/converter.rs:114-139 and the per-point dedup insert
at cell.rs:70-106 (what must stay byte-correct while being distributed).
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import dedup as dedup_mod

log = logging.getLogger(__name__)

_I32_MAX = np.int32(2**31 - 1)

# outA bit layout: perm (28 bits) | spilled<<28 | suspect<<29 | winner<<30
PERM_MASK = (1 << 28) - 1
SPILL_BIT = 1 << 28
SUSPECT_BIT = 1 << 29
WINNER_BIT = 1 << 30
# outB bit layout: (arrival + 1) (29 bits, 0 = padding) | suspect<<29 |
# winner<<30
ARR_MASK = (1 << 29) - 1


def _iota_like(ref, n):
    """Varying-safe iota: shard_map's fori-free ops still require carry
    columns to share the varying axis set, so tie the iota to a varying
    operand with no-op arithmetic (see ops/dedup._hash_sort)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape(n)
    return iota + (ref & jnp.int32(0))


def _winner_and_suspect(ch_s, sh_s, db_s, pos_s, cell_size,
                        sub_cell_radius):
    """Winner flags + gather-free collision audit over hash-sorted rows.

    Same formulation as ops.dedup.dedup_pass_light: recompute the true
    keys from the (already gathered) sorted positions and propagate
    run-local mismatches with cumsum/cummax fills — per-row scatters cost
    more than the sort itself on TPU (PERF.md primitive table).
    ``db_s`` is the sorted distance-bits column: ambiguous-distance
    runs route to the exact host sideband (the near-tie audit,
    ops/dedup.py _near_tie_mask — immunizes winner choice against
    backend fma contraction of the distance formula).
    """
    n = ch_s.shape[0]
    valid_s = ch_s != _I32_MAX
    same_hash = (ch_s == jnp.roll(ch_s, 1)) & (sh_s == jnp.roll(sh_s, 1))
    first = jnp.logical_not(same_hash).at[0].set(True)
    winner = first & valid_s

    from ..core.hex import (
        jax_axial_from_world,
        jax_axial_to_offset,
        jax_cell_index,
    )

    cell_idx_s = jax_cell_index(pos_s, cell_size)
    axial_s = jax_axial_from_world(pos_s, sub_cell_radius)
    sub_idx_s = jax_axial_to_offset(axial_s)
    key_s = jnp.concatenate([cell_idx_s, sub_idx_s], axis=1)
    diff_prev = jnp.any(key_s != jnp.roll(key_s, 1, axis=0), axis=1)
    mismatch = same_hash & diff_prev & valid_s
    near_tie = dedup_mod._near_tie_mask(same_hash, db_s, pos_s, valid_s)
    mismatch = (mismatch | near_tie).at[0].set(False)

    s = jnp.cumsum(mismatch.astype(jnp.int32))
    start_s = jax.lax.cummax(jnp.where(first, s, np.int32(-1)))
    last = jnp.roll(first, -1).at[n - 1].set(True)
    end_vals = jnp.where(last, s, _I32_MAX)
    end_s = jnp.flip(jax.lax.cummin(jnp.flip(end_vals)))
    suspect = (end_s > start_s) & valid_s
    return winner, suspect, valid_s


def _check_pack_limits(shard_size: int, n_pad: int) -> None:
    """Refuse batches the packed-output bit layouts cannot carry.

    out_a packs the per-shard perm in 28 bits and out_b packs
    global_arrival + 1 (< n_pad + 1) in 29 bits; beyond these the values
    would silently bleed into the SPILL/SUSPECT/WINNER flag bits and
    corrupt dedup winners (a byte-parity break, CLAUDE.md invariant #1),
    so fail loudly instead. The limits sit far above any real batch
    (2^28 rows/shard = 3 GB of positions per device).
    """
    if shard_size > PERM_MASK + 1 or n_pad > ARR_MASK - 1:
        raise ValueError(
            f"owner-sharded pass limit: shard_size={shard_size} "
            f"(max 2^28) / padded batch {n_pad} (max 2^29-2) — "
            "split the batch (lower --batch-size)"
        )


def _sort4(k1, k2, k3, k4):
    """Backend-dispatched 4-column lex sort (resolved per trace through
    the ops.dedup module attribute, so a runtime pallas degrade —
    dedup._PALLAS_BROKEN — reaches this module too)."""
    return dedup_mod.dispatch_sort4(k1, k2, k3, k4)


def _hashes_for(positions, valid, cell_size, sub_cell_radius):
    """(cell_hash, slot_hash, dist_bits) with padding sentinels applied."""
    cell_idx, sub_idx, dist = dedup_mod.hex_keys(
        positions, cell_size, sub_cell_radius
    )
    cols_cell = tuple(cell_idx[:, i] for i in range(3))
    cols_all = cols_cell + tuple(sub_idx[:, i] for i in range(3))
    ch = dedup_mod._hash_cols(cols_cell, dedup_mod._PRIMES_A) & np.int32(
        0x7FFFFFFE
    )
    sh = dedup_mod._hash_cols(cols_all, dedup_mod._PRIMES_B)
    ch = jnp.where(valid, ch, _I32_MAX)
    sh = jnp.where(valid, sh, np.int32(0))
    dist_bits = jax.lax.bitcast_convert_type(dist, jnp.int32)
    dist_bits = jnp.where(valid, dist_bits, _I32_MAX)
    return ch, sh, dist_bits


def _owner_pass_local(positions, valid, cell_size, sub_cell_radius,
                      *, n_dest: int, capacity: int, stage_b_pad: int):
    """Per-shard body: stage-A dedup, owner routing, all-to-all, stage-B.

    Runs under shard_map over the mesh's data axis. Static config
    (n_dest, capacity, stage_b_pad) is bound via functools.partial before
    tracing.

    Returns:
      out_a: (ss,) i32 per stage-A-sorted local row:
             perm | spilled<<28 | suspect<<29 | winner<<30.
      out_b: (stage_b_pad,) i32 per stage-B-sorted received row:
             (global_arrival + 1) | suspect<<29 | winner<<30; 0 = padding.
    """
    ss = positions.shape[0]
    shard = jax.lax.axis_index("data").astype(jnp.int32)

    # ---- stage A: local hash sort + winner/suspect flags ----------------
    ch_s, sh_s, db_s, perm, _, _, _ = dedup_mod._hash_sort(
        positions, valid, cell_size, sub_cell_radius
    )
    pos_s = positions[perm]
    winner, suspect, _ = _winner_and_suspect(
        ch_s, sh_s, db_s, pos_s, cell_size, sub_cell_radius
    )

    # ---- owner routing --------------------------------------------------
    # dest = uniform hash of the slot identity. sh_s is already an
    # avalanche-mixed function of the true (cell, slot) key columns, and
    # identical across shards for the same slot; fold in ch_s so slot-hash
    # collisions across cells still spread.
    mixed = dedup_mod._mix(sh_s ^ (ch_s * np.int32(-1640531527)))
    dest = (mixed.astype(jnp.uint32) % jnp.uint32(n_dest)).astype(jnp.int32)
    route_ok = winner & jnp.logical_not(suspect)
    dest = jnp.where(route_ok, dest, jnp.int32(n_dest))  # sentinel: keep home

    # bucket rows per dest: sort (dest, row), then position-in-run via a
    # cummax fill (contiguous runs after the sort — no scatters)
    row_ids = _iota_like(dest, ss)
    dest_s, src_row, _, _ = _sort4(dest, row_ids, row_ids, row_ids)
    iota = _iota_like(dest_s, ss)
    first_d = (dest_s != jnp.roll(dest_s, 1)).at[0].set(True)
    run_start = jax.lax.cummax(jnp.where(first_d, iota, jnp.int32(-1)))
    pos_in_dest = iota - run_start
    shipped = (dest_s < jnp.int32(n_dest)) & (pos_in_dest < capacity)

    # spilled, per stage-A-sorted row (scatter back through src_row)
    spilled_d = (dest_s < jnp.int32(n_dest)) & jnp.logical_not(shipped)
    spilled = (
        jnp.zeros(ss, jnp.int32)
        .at[src_row]
        .set(spilled_d.astype(jnp.int32), mode="drop")
        .astype(bool)
    )

    # send buffers: (n_dest * capacity) rows of position + global arrival
    arrival_g = perm + shard * jnp.int32(ss)  # perm indexes local input rows
    flat = jnp.where(
        shipped, dest_s * capacity + pos_in_dest, jnp.int32(n_dest * capacity)
    )
    send_pos = (
        jnp.zeros((n_dest * capacity, 3), jnp.float32)
        .at[flat]
        .set(pos_s[src_row], mode="drop")
    )
    send_arr = (
        jnp.full((n_dest * capacity,), -1, jnp.int32)
        .at[flat]
        .set(arrival_g[src_row], mode="drop")
    )

    # ---- exchange over ICI ---------------------------------------------
    recv_pos = jax.lax.all_to_all(
        send_pos.reshape(n_dest, capacity, 3), "data", 0, 0, tiled=True
    )
    recv_arr = jax.lax.all_to_all(
        send_arr.reshape(n_dest, capacity), "data", 0, 0, tiled=True
    )

    # ---- stage B: owner-local merge sort -------------------------------
    n_b = n_dest * capacity
    pos_b = recv_pos.reshape(n_b, 3)
    arr_b = recv_arr.reshape(n_b)
    if stage_b_pad > n_b:  # pow2 padding for the sort backends
        pos_b = jnp.pad(pos_b, ((0, stage_b_pad - n_b), (0, 0)))
        arr_b = jnp.pad(arr_b, (0, stage_b_pad - n_b), constant_values=-1)
    n_b = stage_b_pad

    # pre-sort by global arrival so buffer rank == arrival order: the
    # main sort can then use rank as BOTH the exact-arrival tie-break key
    # and the row pointer (the backends sort 4 key columns and carry no
    # payload; _hash_sort plays the same trick with its input iota)
    arr_key = jnp.where(arr_b >= 0, arr_b, _I32_MAX)
    row_b = _iota_like(arr_key, n_b)
    arr_s1, row_s1, _, _ = _sort4(arr_key, row_b, row_b, row_b)
    pos_b2 = pos_b[row_s1]
    valid_b2 = arr_s1 != _I32_MAX
    arr_b2 = jnp.where(valid_b2, arr_s1, jnp.int32(-1))

    ch_b, sh_b, dist_bits = _hashes_for(
        pos_b2, valid_b2, cell_size, sub_cell_radius
    )
    rank = _iota_like(ch_b, n_b)
    ch_bs, sh_bs, db_bs, rank_s = _sort4(ch_b, sh_b, dist_bits, rank)
    arr_bs = arr_b2[rank_s]
    pos_bs = pos_b2[rank_s]
    winner_b, suspect_b, valid_bs = _winner_and_suspect(
        ch_bs, sh_bs, db_bs, pos_bs, cell_size, sub_cell_radius
    )

    out_a = (
        perm
        | (spilled.astype(jnp.int32) << 28)
        | (suspect.astype(jnp.int32) << 29)
        | (winner.astype(jnp.int32) << 30)
    )
    out_b = (
        jnp.where(valid_bs, arr_bs + 1, jnp.int32(0))
        | (suspect_b.astype(jnp.int32) << 29)
        | (winner_b.astype(jnp.int32) << 30)
    )
    return out_a, out_b


class OwnerShardedPass:
    """Host wrapper: compile-per-(bucket, capacity) owner-sharded passes.

    ``capacity`` is rows per (source, destination) bucket. The default
    gives every destination twice its balanced share of a shard
    (2 * ss / n), so only adversarial slot-hash skew spills — and spills
    stay exact via the host sideband. Compiled executables are cached per
    (n_pad, capacity, backend); a pallas Mosaic failure degrades the
    process to the bitonic backend and recompiles (ops.dedup sets
    _PALLAS_BROKEN through the shared module attribute).
    """

    def __init__(self, mesh: Mesh, capacity: int | None = None):
        self.mesh = mesh
        self.n = int(mesh.devices.size)
        self.capacity_override = capacity
        self._compiled: dict = {}
        self.spilled_total = 0
        self.suspect_total = 0

    def _capacity_for(self, shard_size: int) -> int:
        if self.capacity_override is not None:
            cap = self.capacity_override
        else:
            cap = max(64, (2 * shard_size) // self.n)
        # pow2 so stage B's sort length (n * cap) stays pow2 for pow2
        # meshes; non-pow2 meshes are padded by stage_b_pad
        p = 1
        while p < cap:
            p *= 2
        return p

    def _get_fn(self, n_pad: int, capacity: int):
        backend = dedup_mod._resolve_backend()
        key = (n_pad, capacity, backend)
        fn = self._compiled.get(key)
        if fn is None:
            ss = n_pad // self.n
            n_b = self.n * capacity
            stage_b_pad = dedup_mod.pad_to_bucket(n_b, minimum=1024)
            body = functools.partial(
                _owner_pass_local,
                n_dest=self.n,
                capacity=capacity,
                stage_b_pad=stage_b_pad,
            )
            from jax import shard_map

            # check_vma=False: the varying-mesh-axes checker rejects
            # pallas_call's ShapeDtypeStruct outputs (no vma annotation on
            # this jax), which would force the bitonic fallback on every
            # mesh; the body is manually vetted — every output varies on
            # "data", no unvarying carries leak out
            mapped = shard_map(
                body,
                mesh=self.mesh,
                in_specs=(P("data", None), P("data"), P(), P()),
                out_specs=(P("data"), P("data")),
                check_vma=False,
            )
            fn = self._compiled[key] = jax.jit(mapped)
        return fn

    def __call__(self, positions: np.ndarray, cell_size, sub_cell_size):
        """Run the pass; returns a dict of host arrays (see keys below).

        Output keys:
          n, n_pad, shard_size, capacity, stage_b_pad: static sizes.
          a_packed: (n_pad,) i32 stage-A output (perm/spill/suspect/winner
            bits), concatenated shard slabs in shard order.
          b_packed: (n * stage_b_pad,) i32 stage-B output (arrival+1 /
            suspect / winner bits), concatenated owner slabs.
        """
        n = len(positions)
        # pad so every shard's slice is a power of two (the sort network
        # and the pallas kernel need pow2): minimum 1024 rows per shard,
        # then doubling preserves per-shard pow2 for any device count
        n_pad = dedup_mod.pad_to_bucket(max(n, 1), minimum=1024 * self.n)
        if n_pad % self.n:
            n_pad += self.n - (n_pad % self.n)
        shard_size = n_pad // self.n
        _check_pack_limits(shard_size, n_pad)
        capacity = self._capacity_for(shard_size)

        pos_pad = np.zeros((n_pad, 3), np.float32)
        pos_pad[:n] = positions
        valid = np.zeros(n_pad, bool)
        valid[:n] = True

        pos_dev = jax.device_put(
            pos_pad, NamedSharding(self.mesh, P("data", None))
        )
        valid_dev = jax.device_put(
            valid, NamedSharding(self.mesh, P("data"))
        )
        args = (
            pos_dev,
            valid_dev,
            jnp.float32(np.float32(cell_size)),
            jnp.float32(np.float32(sub_cell_size) / np.float32(2.0)),
        )
        try:
            a_packed, b_packed = self._get_fn(n_pad, capacity)(*args)
            a_packed = np.asarray(a_packed)
        except Exception:
            # mirror ops.dedup.dispatch_dedup's degrade: a pallas Mosaic
            # failure on an unvetted libtpu must not kill the conversion
            if dedup_mod._resolve_backend() != "pallas":
                raise
            log.warning(
                "pallas sort backend failed in the mesh pass; degrading "
                "to bitonic",
                exc_info=True,
            )
            # mark_pallas_broken also rebinds ops.dedup's jit wrappers so
            # every other consumer of the sort degrades consistently
            dedup_mod.mark_pallas_broken()
            a_packed, b_packed = self._get_fn(n_pad, capacity)(*args)
            a_packed = np.asarray(a_packed)
        b_packed = np.asarray(b_packed)
        stage_b_pad = len(b_packed) // self.n
        return {
            "n": n,
            "n_pad": n_pad,
            "shard_size": shard_size,
            "capacity": capacity,
            "stage_b_pad": stage_b_pad,
            "a_packed": a_packed,
            "b_packed": b_packed,
        }
