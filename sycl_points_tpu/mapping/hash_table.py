"""Shared open-addressing hash-table primitives for the mapping backends.

TPU-native replacement for the CAS insertion loop the reference uses in both
``mapping/voxel_hash_map.hpp:574-612`` and
``mapping/occupancy_grid_map.hpp:785-820``: a *scatter-claim* probe loop —
each unresolved key writes a ticket into a claim array at its probe slot and
re-reads to find the winner.  Requires keys to be unique within a batch
(guaranteed by the sort/segment-reduce pre-aggregation).

Probe-round layout (measured on v5e at 131k keys / 524k slots): a [M,3] row
scatter costs 5.0 ms vs 0.41 ms per planar [M] scatter, and bool gathers
cost 2.5x int gathers — so inside the probe loops the 3x21-bit coords are
packed into TWO uint32 planes and ``used`` is carried as int32; the [C,3]
public layout is restored on exit.  This cuts a probe round from ~10 ms to
~4 ms at that width.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SENTINEL = 2**31 - 1
_MASK21 = (1 << 21) - 1


def hash_coords(coords: jax.Array, capacity: int):
    """Double-hashing (h1, h2) from 3 int32 voxel coords; capacity must be a
    power of two (odd h2 guarantees a full probe cycle)."""
    c = coords.astype(jnp.uint32)
    h1 = (c[..., 0] * jnp.uint32(73856093)) ^ (c[..., 1] * jnp.uint32(19349669)) ^ (
        c[..., 2] * jnp.uint32(83492791)
    )
    h2 = (h1 * jnp.uint32(2654435761)) | jnp.uint32(1)
    return h1 & jnp.uint32(capacity - 1), h2


def probe_slots(h1, h2, probe, capacity: int):
    probe = probe.astype(jnp.uint32) if hasattr(probe, "astype") else jnp.uint32(probe)
    return ((h1 + probe * h2) & jnp.uint32(capacity - 1)).astype(jnp.int32)


def _pack2(coords: jax.Array):
    """3 x 21-bit coords -> two uint32 planes (x:21|y_hi:11, y_lo:10|z:21)."""
    c = coords.astype(jnp.uint32)
    hi = (c[..., 0] << 11) | (c[..., 1] >> 10)
    lo = ((c[..., 1] & jnp.uint32(0x3FF)) << 21) | (c[..., 2] & jnp.uint32(_MASK21))
    return hi, lo


def _unpack2(hi: jax.Array, lo: jax.Array):
    x = (hi >> 11) & jnp.uint32(_MASK21)
    y = ((hi & jnp.uint32(0x7FF)) << 10) | (lo >> 21)
    z = lo & jnp.uint32(_MASK21)
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)


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


def compact_indices_ranked(keep: jax.Array, rank: jax.Array, out_capacity: int):
    """:func:`compact_indices` with overflow accounting and rank-ordered
    retention.

    When the kept slots fit in ``out_capacity`` this is the same O(C)
    cumsum compaction (slot order).  When they OVERFLOW, a ``lax.cond``
    switches to a rank-sorted selection keeping the ``out_capacity``
    smallest-``rank`` entries (e.g. nearest-to-sensor) instead of an
    arbitrary hash-slot-order subset — the O(C log C) sort is paid only on
    overflow frames.

    Returns ``(idx, mask, n_overflow)`` where ``n_overflow`` counts kept
    slots that did not fit (no silent caps).
    """
    C = keep.shape[0]
    n_keep = jnp.sum(keep.astype(jnp.int32))
    if out_capacity >= C:  # overflow impossible: every slot fits
        idx, mask = compact_indices(keep, out_capacity)
        return idx, mask, jnp.int32(0)
    n_overflow = jnp.maximum(n_keep - out_capacity, 0)

    def slot_order(_):
        idx, mask = compact_indices(keep, out_capacity)
        return idx, mask

    def rank_order(_):
        key = jnp.where(keep, rank.astype(jnp.float32), jnp.inf)
        _, idx_sorted = jax.lax.sort(
            (key, jnp.arange(C, dtype=jnp.int32)), num_keys=1
        )
        idx = idx_sorted[:out_capacity]
        mask = jnp.arange(out_capacity, dtype=jnp.int32) < jnp.minimum(
            n_keep, out_capacity
        )
        return idx, mask

    idx, mask = jax.lax.cond(n_overflow > 0, rank_order, slot_order, None)
    return idx, mask, n_overflow


def resolve_slots(coords_tbl, used, keys, valid, capacity: int, max_probes: int):
    """Find-or-claim a slot for each unique key.

    Returns ``(coords_tbl', used', slot [M] int32 (-1 unresolved),
    resolved [M] bool)``.

    Two phases, each a ``lax.while_loop`` with an all-settled early exit:

    1. read-only LOOKUP rounds (two uint32 gathers, no scatters — ~2x
       cheaper than a claim round) settle every key that already exists or
       provably does not (empty slot on its chain).  In the steady state of
       map insertion almost every voxel already exists, so this phase does
       nearly all the work;
    2. CLAIM rounds (scatter-claim with ticket arbitration) run only for
       the keys the lookup proved absent — on a warm map usually none.

    Keys are unique within a batch, so lookups against the pre-claim table
    are race-free.
    """
    M = keys.shape[0]
    h1, h2 = hash_coords(keys, capacity)
    seg_ids = jnp.arange(M, dtype=jnp.int32)
    khi, klo = _pack2(keys)
    thi, tlo = _pack2(coords_tbl)
    used_i = used.astype(jnp.int32)

    # ---- phase 1: lookup ---------------------------------------------------
    def l_cond(st):
        probe, _, found, dead = st
        return (probe < max_probes) & jnp.any(valid & ~found & ~dead)

    def l_body(st):
        probe, slot_out, found, dead = st
        cand = probe_slots(h1, h2, probe, capacity)
        occ = used_i[cand] != 0
        match = occ & (thi[cand] == khi) & (tlo[cand] == klo)
        new_found = valid & ~found & ~dead & match
        slot_out = jnp.where(new_found, cand, slot_out)
        return probe + 1, slot_out, found | new_found, dead | ~occ

    l_init = (
        jnp.int32(0),
        jnp.full((M,), -1, jnp.int32),
        jnp.zeros((M,), bool),
        jnp.zeros((M,), bool),
    )
    _, slot_out, found, _ = jax.lax.while_loop(l_cond, l_body, l_init)

    # ---- phase 2: claim (absent keys only) ---------------------------------
    def c_cond(st):
        probe, _, _, _, _, unresolved = st
        return (probe < max_probes) & jnp.any(unresolved)

    def c_body(st):
        probe, thi, tlo, used_i, slot_out, unresolved = st
        cand = probe_slots(h1, h2, probe, capacity)
        occ = used_i[cand] != 0
        try_claim = unresolved & ~occ
        claim = jnp.full((capacity,), -1, jnp.int32)
        claim = claim.at[jnp.where(try_claim, cand, capacity)].set(seg_ids, mode="drop")
        winner = try_claim & (claim[cand] == seg_ids)

        slot_out = jnp.where(winner, cand, slot_out)
        w_idx = jnp.where(winner, cand, capacity)
        thi = thi.at[w_idx].set(khi, mode="drop")
        tlo = tlo.at[w_idx].set(klo, mode="drop")
        used_i = used_i.at[w_idx].set(1, mode="drop")
        return probe + 1, thi, tlo, used_i, slot_out, unresolved & ~winner

    c_init = (jnp.int32(0), thi, tlo, used_i, slot_out, valid & ~found)
    _, thi, tlo, used_i, slot_out, unresolved = jax.lax.while_loop(c_cond, c_body, c_init)

    used_out = used_i != 0
    coords_out = jnp.where(used_out[:, None], _unpack2(thi, tlo), _SENTINEL)
    return coords_out, used_out, slot_out, valid & ~unresolved


def resolve_slots_tiered(
    coords_tbl, used, keys, valid, capacity: int, max_probes: int,
    tier: int = 16384,
):
    """:func:`resolve_slots` whose per-probe-round cost tracks the VALID key
    count instead of the static budget width.

    Pre-aggregated miss keys are rank-ordered, so valid rows form a front
    prefix; the front ``tier`` rows are resolved unconditionally and the
    tail is resolved under a ``lax.cond`` that no-ops when the tail holds
    no valid key — the common case (e.g. ~15k real unique carve voxels
    against a 131k miss budget at the config-7 bench shape, where the
    full-width resolve measured 58 ms of the 91 ms insert).
    """
    M = keys.shape[0]
    if M <= tier:
        return resolve_slots(coords_tbl, used, keys, valid, capacity, max_probes)
    c1, u1, s1, r1 = resolve_slots(
        coords_tbl, used, keys[:tier], valid[:tier], capacity, max_probes
    )
    kt, vt = keys[tier:], valid[tier:]
    Mt = M - tier

    def run_tail(args):
        c, u = args
        return resolve_slots(c, u, kt, vt, capacity, max_probes)

    def skip_tail(args):
        c, u = args
        return c, u, jnp.full((Mt,), -1, jnp.int32), jnp.zeros((Mt,), bool)

    c2, u2, s2, r2 = jax.lax.cond(jnp.any(vt), run_tail, skip_tail, (c1, u1))
    return c2, u2, jnp.concatenate([s1, s2]), jnp.concatenate([r1, r2])


def lookup_slots(coords_tbl, used, keys, valid, capacity: int, max_probes: int):
    """Read-only lookup.  Returns (slot [M] int32 (-1 missing), found [M]).

    Early-exits once every key is either found or proven absent (hit an
    empty slot on its probe chain)."""
    M = keys.shape[0]
    h1, h2 = hash_coords(keys, capacity)
    khi, klo = _pack2(keys)
    thi, tlo = _pack2(coords_tbl)
    used_i = used.astype(jnp.int32)

    def cond(st):
        probe, _, found, dead = st
        return (probe < max_probes) & jnp.any(valid & ~found & ~dead)

    def body(st):
        probe, slot_out, found, dead = st
        cand = probe_slots(h1, h2, probe, capacity)
        occ = used_i[cand] != 0
        match = occ & (thi[cand] == khi) & (tlo[cand] == klo)
        new_found = valid & ~found & ~dead & match
        slot_out = jnp.where(new_found, cand, slot_out)
        return probe + 1, slot_out, found | new_found, dead | ~occ

    init = (
        jnp.int32(0),
        jnp.full((M,), -1, jnp.int32),
        jnp.zeros((M,), bool),
        jnp.zeros((M,), bool),
    )
    _, slot_out, found, _ = jax.lax.while_loop(cond, body, init)
    return slot_out, found
