"""Shared open-addressing hash-table primitives for the mapping backends.

TPU-native replacement for the CAS insertion loop the reference uses in both
``mapping/voxel_hash_map.hpp:574-612`` and
``mapping/occupancy_grid_map.hpp:785-820``: a *scatter-claim* probe loop —
each unresolved key writes a ticket into a claim array at its probe slot and
re-reads to find the winner.  Requires keys to be unique within a batch
(guaranteed by the sort/segment-reduce pre-aggregation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hash_coords(coords: jax.Array, capacity: int):
    """Double-hashing (h1, h2) from 3 int32 voxel coords; capacity must be a
    power of two (odd h2 guarantees a full probe cycle)."""
    c = coords.astype(jnp.uint32)
    h1 = (c[..., 0] * jnp.uint32(73856093)) ^ (c[..., 1] * jnp.uint32(19349669)) ^ (
        c[..., 2] * jnp.uint32(83492791)
    )
    h2 = (h1 * jnp.uint32(2654435761)) | jnp.uint32(1)
    return h1 & jnp.uint32(capacity - 1), h2


def probe_slots(h1, h2, probe: int, capacity: int):
    return ((h1 + jnp.uint32(probe) * h2) & jnp.uint32(capacity - 1)).astype(jnp.int32)


def resolve_slots(coords_tbl, used, keys, valid, capacity: int, max_probes: int):
    """Find-or-claim a slot for each unique key.

    Returns ``(coords_tbl', used', slot [M] int32 (-1 unresolved),
    resolved [M] bool)``.
    """
    M = keys.shape[0]
    h1, h2 = hash_coords(keys, capacity)
    slot_out = jnp.full((M,), -1, jnp.int32)
    unresolved = valid
    seg_ids = jnp.arange(M, dtype=jnp.int32)

    for probe in range(max_probes):
        cand = probe_slots(h1, h2, probe, capacity)
        occ = used[cand]
        match = occ & jnp.all(coords_tbl[cand] == keys, axis=-1)
        hit = unresolved & match
        try_claim = unresolved & ~occ
        claim = jnp.full((capacity,), -1, jnp.int32)
        claim = claim.at[jnp.where(try_claim, cand, capacity)].set(seg_ids, mode="drop")
        winner = try_claim & (claim[cand] == seg_ids)

        resolved_now = hit | winner
        slot_out = jnp.where(resolved_now, cand, slot_out)
        w_idx = jnp.where(winner, cand, capacity)
        coords_tbl = coords_tbl.at[w_idx].set(keys, mode="drop")
        used = used.at[w_idx].set(True, mode="drop")
        unresolved = unresolved & ~resolved_now

    return coords_tbl, used, slot_out, valid & ~unresolved


def compact_indices(keep: jax.Array, out_capacity: int):
    """Slot indices of the first ``out_capacity`` True entries of ``keep``,
    in slot order, via cumsum + scatter — O(C) in table capacity, replacing
    the O(C log C) full-table argsort for map extraction.

    Returns ``(idx [out_capacity] int32, mask [out_capacity] bool)``;
    entries beyond the number of kept slots point at slot 0 and are masked.
    """
    C = keep.shape[0]
    dest = jnp.cumsum(keep.astype(jnp.int32)) - 1
    dest = jnp.where(keep & (dest < out_capacity), dest, out_capacity)
    idx = jnp.zeros((out_capacity,), jnp.int32).at[dest].set(
        jnp.arange(C, dtype=jnp.int32), mode="drop"
    )
    n = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), out_capacity)
    mask = jnp.arange(out_capacity, dtype=jnp.int32) < n
    return idx, mask


def lookup_slots(coords_tbl, used, keys, valid, capacity: int, max_probes: int):
    """Read-only lookup.  Returns (slot [M] int32 (-1 missing), found [M])."""
    M = keys.shape[0]
    h1, h2 = hash_coords(keys, capacity)
    found = jnp.zeros((M,), bool)
    slot_out = jnp.full((M,), -1, jnp.int32)
    dead = jnp.zeros((M,), bool)  # hit an empty slot => key absent
    for probe in range(max_probes):
        cand = probe_slots(h1, h2, probe, capacity)
        occ = used[cand]
        match = occ & jnp.all(coords_tbl[cand] == keys, axis=-1)
        new_found = valid & ~found & ~dead & match
        slot_out = jnp.where(new_found, cand, slot_out)
        found = found | new_found
        dead = dead | ~occ
    return slot_out, found
