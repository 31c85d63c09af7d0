"""Occupancy grid map: log-odds voxel hash with free-space ray carving.

Replaces ``algorithms/mapping/occupancy_grid_map.hpp`` of
fateshelled/sycl_points.  Same hash/table design as
:mod:`sycl_points_tpu.mapping.voxel_hash_map` plus per-voxel log-odds
occupancy (defaults occupancy_grid_map.hpp:1660-1679: hit +0.85, miss -0.4,
clamp [-4, 4], threshold p=0.5, stale threshold 100):

  * hits: per-frame sort/segment-reduce of point payloads (position sums,
    log-Euclidean covariance sums, rgba, intensity, hit counts);
  * free space: the 3-D DDA ray walk (traverse_ray_exclusive_impl,
    occupancy_grid_map.hpp:821-900) vectorized as a ``lax.scan`` over a
    static step bound — all rays advance in lockstep, finished rays are
    masked;
  * pending log-odds applied once per frame with clamping
    (apply_pending_log_odds, occupancy_grid_map.hpp:1457-1483);
  * stale-voxel pruning (occupancy_grid_map.hpp:1485), occupied-point
    extraction (:1530), experimental visible-point extraction with
    per-point occlusion ray-march (:189-411), overlap ratio (:417-472).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from sycl_points_tpu.mapping.hash_table import compact_indices, lookup_slots, resolve_slots
from sycl_points_tpu.mapping.voxel_hash_map import _tri_pack, _tri_unpack
from sycl_points_tpu.ops.voxel import _SENTINEL, COORD_MASK, COORD_OFFSET, sort_by_cell, voxel_coords
from sycl_points_tpu.points.point_cloud import PointCloud
from sycl_points_tpu.utils import eigh3


def probability_to_log_odds(p: float) -> float:
    return math.log(p / (1.0 - p))


@dataclasses.dataclass(frozen=True)
class OccupancyGridConfig:
    voxel_size: float = 1.0
    capacity: int = 1 << 18
    max_probes: int = 32
    log_odds_hit: float = 0.85
    log_odds_miss: float = -0.4
    min_log_odds: float = -4.0
    max_log_odds: float = 4.0
    occupancy_threshold_log_odds: float = 0.0  # p = 0.5
    stale_frame_threshold: int = 100
    free_space_updates_enabled: bool = True
    voxel_pruning_enabled: bool = True
    # Static DDA bound (voxels crossed per ray).  0 = derive from geometry:
    # a ray of length L crosses at most ceil(sqrt(3) * L / voxel_size) + 3
    # voxel boundaries, with L = max_ray_distance.  Rays still unfinished at
    # the bound are counted in ``state.truncated_rays``.
    max_ray_steps: int = 0
    max_ray_distance: float = 50.0

    @property
    def ray_step_budget(self) -> int:
        if self.max_ray_steps > 0:
            return self.max_ray_steps
        return int(math.ceil(math.sqrt(3.0) * self.max_ray_distance / self.voxel_size)) + 3


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class OccupancyGridState:
    coords: jax.Array  # [C, 3]
    used: jax.Array  # [C]
    log_odds: jax.Array  # [C]
    sum_pos: jax.Array  # [C, 3] (hit positions)
    hit_count: jax.Array  # [C] float32
    sum_logcov: jax.Array  # [C, 6]
    sum_rgba: jax.Array  # [C, 4]
    sum_intensity: jax.Array  # [C]
    last_update: jax.Array  # [C] int32
    frame: jax.Array  # scalar int32
    dropped: jax.Array  # scalar int32: contributions lost to probe exhaustion
    truncated_rays: jax.Array  # scalar int32: rays cut short by the DDA bound


def create(config: OccupancyGridConfig) -> OccupancyGridState:
    C = config.capacity
    return OccupancyGridState(
        coords=jnp.full((C, 3), _SENTINEL, jnp.int32),
        used=jnp.zeros((C,), bool),
        log_odds=jnp.zeros((C,), jnp.float32),
        sum_pos=jnp.zeros((C, 3), jnp.float32),
        hit_count=jnp.zeros((C,), jnp.float32),
        sum_logcov=jnp.zeros((C, 6), jnp.float32),
        sum_rgba=jnp.zeros((C, 4), jnp.float32),
        sum_intensity=jnp.zeros((C,), jnp.float32),
        last_update=jnp.zeros((C,), jnp.int32),
        frame=jnp.int32(0),
        dropped=jnp.int32(0),
        truncated_rays=jnp.int32(0),
    )


def _dda_ray_coords(origin: jax.Array, targets: jax.Array, valid: jax.Array,
                    voxel_size: float, max_steps: int):
    """Vectorized exclusive 3-D DDA: voxel coords strictly between origin and
    each target (both endpoints excluded), as ``[N, S, 3]`` plus a validity
    mask.  Mirrors traverse_ray_exclusive_impl (occupancy_grid_map.hpp:821-900)
    with all rays advanced in lockstep under a static step bound."""
    inv = 1.0 / voxel_size
    so = origin * inv  # [3]
    st = targets * inv  # [N, 3]
    i0 = jnp.floor(so).astype(jnp.int32)
    it = jnp.floor(st).astype(jnp.int32)

    d = st - so[None, :]
    abs_d = jnp.abs(d)
    step = jnp.sign(d).astype(jnp.int32)
    eps = jnp.finfo(jnp.float32).eps
    inv_mag = jnp.where(abs_d > eps, 1.0 / jnp.maximum(abs_d, eps), jnp.inf)
    frac = so - jnp.floor(so)
    t_max0 = jnp.where(
        step != 0,
        jnp.where(step > 0, 1.0 - frac[None, :], frac[None, :]) * inv_mag,
        jnp.inf,
    )
    t_delta = jnp.where(step != 0, inv_mag, jnp.inf)

    same = jnp.all(i0[None, :] == it, axis=-1)
    active0 = valid & ~same

    def body(carry, _):
        pos, t_max, active = carry
        axis = jnp.argmin(t_max, axis=-1)  # [N]
        onehot = jax.nn.one_hot(axis, 3, dtype=jnp.int32)
        pos_new = pos + onehot * step
        # where-update, NOT `t_max + onehot * t_delta`: unused axes carry
        # t_delta = inf and 0 * inf = NaN would poison argmin on the next
        # step for any axis-aligned ray (zero direction component).
        t_max_new = jnp.where(onehot > 0, t_max + t_delta, t_max)
        reached = jnp.all(pos_new == it, axis=-1)
        emit = active & ~reached
        carry = (pos_new, t_max_new, active & ~reached)
        return carry, (pos_new, emit)

    init = (jnp.broadcast_to(i0, it.shape), t_max0, active0)
    (_, _, still_active), (coords_seq, emit_seq) = jax.lax.scan(
        body, init, None, length=max_steps
    )
    coords_seq = jnp.swapaxes(coords_seq, 0, 1)  # [N, S, 3]
    emit_seq = jnp.swapaxes(emit_seq, 0, 1)  # [N, S]
    c = coords_seq + COORD_OFFSET
    in_range = jnp.all((c >= 0) & (c <= COORD_MASK), axis=-1)
    emit_seq = emit_seq & in_range
    c = jnp.where(emit_seq[..., None], c, _SENTINEL)
    # ``still_active`` marks rays that never reached their target voxel
    # within max_steps — carving stopped mid-ray (counted by the caller).
    return c, emit_seq, i0 + COORD_OFFSET, it + COORD_OFFSET, still_active


def _segment_merge(coords, w, payloads, capacity):
    """Sort + segment-reduce (coords, payload) rows to unique keys.
    Returns (seg_keys [N,3], seg_valid [N], aggregated payloads)."""
    N = coords.shape[0]
    order, coords_s, ok_s, seg_id, new_seg = sort_by_cell(coords, w > 0)
    w_s = w[order] * ok_s.astype(w.dtype)

    def seg(x):
        xs = x[order]
        if xs.ndim == 1:
            return jax.ops.segment_sum(xs * w_s, seg_id, num_segments=N)
        return jax.ops.segment_sum(xs * w_s[:, None], seg_id, num_segments=N)

    aggs = [seg(p) for p in payloads]
    cnt = jax.ops.segment_sum(w_s, seg_id, num_segments=N)
    first = jnp.full((N,), N - 1, jnp.int32).at[seg_id].min(jnp.arange(N, dtype=jnp.int32))
    seg_keys = coords_s[first]
    return seg_keys, cnt, aggs


def add_point_cloud(
    state: OccupancyGridState,
    config: OccupancyGridConfig,
    cloud: PointCloud,
    sensor_pose: jax.Array,
) -> OccupancyGridState:
    """Hits + free-space carving + pending log-odds application + pruning
    (OccupancyGridMap::add_point_cloud, occupancy_grid_map.hpp:130-164)."""
    N = cloud.capacity
    R = sensor_pose[:3, :3]
    origin = sensor_pose[:3, 3]
    pts_map = cloud.points @ R.T + origin
    coords, ok = voxel_coords(pts_map, cloud.mask, config.voxel_size)
    # reference guards dist^2 > eps
    dist_sq = jnp.sum((pts_map - origin) ** 2, axis=-1)
    ok = ok & (dist_sq > jnp.finfo(jnp.float32).eps)

    if cloud.covs is not None:
        cov_map = jnp.einsum("ij,njk,lk->nil", R, cloud.covs, R, precision="highest")
        logcov = _tri_pack(eigh3.spd_log(cov_map))
    else:
        logcov = jnp.zeros((N, 6), jnp.float32)
    rgba = cloud.rgb if cloud.rgb is not None else jnp.zeros((N, 4), jnp.float32)
    inten = cloud.intensities if cloud.intensities is not None else jnp.zeros((N,), jnp.float32)

    # ---- hits -------------------------------------------------------------
    seg_keys, hit_cnt, (agg_pos, agg_logcov, agg_rgba, agg_int) = _segment_merge(
        coords, ok.astype(jnp.float32), [pts_map, logcov, rgba, inten], config.capacity
    )
    seg_valid = hit_cnt > 0.0
    coords_tbl, used, slot, resolved = resolve_slots(
        state.coords, state.used, seg_keys, seg_valid, config.capacity, config.max_probes
    )
    tgt = jnp.where(resolved, slot, config.capacity)
    pending = jnp.zeros((config.capacity,), jnp.float32)
    pending = pending.at[tgt].add(hit_cnt * config.log_odds_hit, mode="drop")

    sum_pos = state.sum_pos.at[tgt].add(agg_pos, mode="drop")
    hit_count = state.hit_count.at[tgt].add(hit_cnt, mode="drop")
    sum_logcov = state.sum_logcov.at[tgt].add(agg_logcov, mode="drop")
    sum_rgba = state.sum_rgba.at[tgt].add(agg_rgba, mode="drop")
    sum_intensity = state.sum_intensity.at[tgt].add(agg_int, mode="drop")
    last_update = state.last_update.at[tgt].set(state.frame, mode="drop")

    n_dropped = jnp.sum((seg_valid & ~resolved).astype(jnp.int32))
    n_truncated = jnp.int32(0)

    # ---- free space (misses) ---------------------------------------------
    if config.free_space_updates_enabled and config.log_odds_miss != 0.0:
        ray_coords, ray_emit, origin_coord, target_coords, still_active = _dda_ray_coords(
            origin, pts_map, ok, config.voxel_size, config.ray_step_budget
        )
        n_truncated = jnp.sum(still_active.astype(jnp.int32))
        # Per-ray origin miss unless the origin voxel received a hit this
        # frame (occupancy_grid_map.hpp:1427-1434).
        origin_hit = jnp.any(ok & jnp.all(coords == origin_coord[None, :], axis=-1))
        origin_differs = jnp.any(origin_coord[None, :] != target_coords, axis=-1)
        origin_in_range = jnp.all((origin_coord >= 0) & (origin_coord <= COORD_MASK))
        origin_emit = ok & origin_differs & ~origin_hit & origin_in_range

        miss_coords = jnp.concatenate(
            [ray_coords.reshape(-1, 3), jnp.broadcast_to(origin_coord, (N, 3))], axis=0
        )
        miss_w = jnp.concatenate([ray_emit.reshape(-1), origin_emit], axis=0).astype(jnp.float32)
        miss_coords = jnp.where(miss_w[:, None] > 0, miss_coords, _SENTINEL)
        m_keys, m_cnt, _ = _segment_merge(miss_coords, miss_w, [], config.capacity)
        m_valid = m_cnt > 0.0
        coords_tbl, used, m_slot, m_resolved = resolve_slots(
            coords_tbl, used, m_keys, m_valid, config.capacity, config.max_probes
        )
        m_tgt = jnp.where(m_resolved, m_slot, config.capacity)
        pending = pending.at[m_tgt].add(m_cnt * config.log_odds_miss, mode="drop")
        last_update = last_update.at[m_tgt].set(state.frame, mode="drop")
        n_dropped = n_dropped + jnp.sum((m_valid & ~m_resolved).astype(jnp.int32))

    # ---- apply pending with clamp ----------------------------------------
    log_odds = jnp.where(
        used & (pending != 0.0),
        jnp.clip(state.log_odds + pending, config.min_log_odds, config.max_log_odds),
        state.log_odds,
    )

    new_state = OccupancyGridState(
        coords=coords_tbl, used=used, log_odds=log_odds, sum_pos=sum_pos,
        hit_count=hit_count, sum_logcov=sum_logcov, sum_rgba=sum_rgba,
        sum_intensity=sum_intensity, last_update=last_update, frame=state.frame + 1,
        dropped=state.dropped + n_dropped,
        truncated_rays=state.truncated_rays + n_truncated,
    )
    if config.voxel_pruning_enabled:
        new_state = prune_stale_voxels(new_state, config)
    return new_state


def prune_stale_voxels(state: OccupancyGridState, config: OccupancyGridConfig) -> OccupancyGridState:
    """Clear voxels not updated within stale_frame_threshold frames
    (occupancy_grid_map.hpp:1485)."""
    age = state.frame - state.last_update
    stale = state.used & (age > config.stale_frame_threshold)
    keep = ~stale
    kf = keep.astype(jnp.float32)
    return dataclasses.replace(
        state,
        coords=jnp.where(keep[:, None], state.coords, _SENTINEL),
        used=state.used & keep,
        log_odds=state.log_odds * kf,
        sum_pos=state.sum_pos * kf[:, None],
        hit_count=state.hit_count * kf,
        sum_logcov=state.sum_logcov * kf[:, None],
        sum_rgba=state.sum_rgba * kf[:, None],
        sum_intensity=state.sum_intensity * kf,
        last_update=jnp.where(keep, state.last_update, 0),
    )


def voxel_count(state: OccupancyGridState) -> jax.Array:
    return jnp.sum(state.used.astype(jnp.int32))


def load_factor(state: OccupancyGridState, config: OccupancyGridConfig) -> jax.Array:
    return jnp.sum(state.used.astype(jnp.float32)) / config.capacity


def grow(
    state: OccupancyGridState, config: OccupancyGridConfig, factor: int = 2
) -> tuple[OccupancyGridState, OccupancyGridConfig]:
    """Re-insert every used slot into a ``factor``-times-larger table (the
    static-shape analog of the reference rehash, voxel_hash_map.hpp:847-934;
    the occupancy grid shares that hash infrastructure)."""
    new_config = dataclasses.replace(config, capacity=config.capacity * factor)
    new = create(new_config)
    coords_tbl, used, slot, resolved = resolve_slots(
        new.coords, new.used, state.coords, state.used,
        new_config.capacity, new_config.max_probes,
    )
    tgt = jnp.where(resolved, slot, new_config.capacity)
    moved = OccupancyGridState(
        coords=coords_tbl,
        used=used,
        log_odds=new.log_odds.at[tgt].set(state.log_odds, mode="drop"),
        sum_pos=new.sum_pos.at[tgt].set(state.sum_pos, mode="drop"),
        hit_count=new.hit_count.at[tgt].set(state.hit_count, mode="drop"),
        sum_logcov=new.sum_logcov.at[tgt].set(state.sum_logcov, mode="drop"),
        sum_rgba=new.sum_rgba.at[tgt].set(state.sum_rgba, mode="drop"),
        sum_intensity=new.sum_intensity.at[tgt].set(state.sum_intensity, mode="drop"),
        last_update=new.last_update.at[tgt].set(state.last_update, mode="drop"),
        frame=state.frame,
        dropped=state.dropped + jnp.sum((state.used & ~resolved).astype(jnp.int32)),
        truncated_rays=state.truncated_rays,
    )
    return moved, new_config


def add_point_cloud_auto(
    state: OccupancyGridState,
    config: OccupancyGridConfig,
    cloud: PointCloud,
    sensor_pose,
    max_load: float = 0.7,
    max_grow_steps: int = 8,
) -> tuple[OccupancyGridState, OccupancyGridConfig]:
    """Host-side insertion with growth: grow while load exceeds ``max_load``,
    insert, and retry the same insert on a grown table if any contribution
    was dropped (pre-insert state is kept — retried inserts lose nothing)."""
    for _ in range(max_grow_steps):
        if float(load_factor(state, config)) <= max_load:
            break
        state, config = grow(state, config)
    for _ in range(max_grow_steps):
        new_state = add_point_cloud(state, config, cloud, sensor_pose)
        if int(new_state.dropped) == int(state.dropped):
            return new_state, config
        state, config = grow(state, config)
    return add_point_cloud(state, config, cloud, sensor_pose), config


def voxel_probability(state: OccupancyGridState, config: OccupancyGridConfig,
                      position: jax.Array) -> jax.Array:
    """Occupancy probability at a world position (occupancy_grid_map.hpp:85-92);
    0.5 for unknown voxels."""
    coords, ok = voxel_coords(position[None, :], jnp.ones((1,), bool), config.voxel_size)
    slot, found = lookup_slots(
        state.coords, state.used, coords, ok, config.capacity, config.max_probes
    )
    lo = jnp.where(found[0], state.log_odds[jnp.maximum(slot[0], 0)], 0.0)
    return jax.nn.sigmoid(lo)


def _occupied_mask(state: OccupancyGridState, config: OccupancyGridConfig):
    return (
        state.used
        & (state.hit_count > 0.0)
        & (state.log_odds >= config.occupancy_threshold_log_odds)
    )


def extract_occupied_points(
    state: OccupancyGridState,
    config: OccupancyGridConfig,
    sensor_position: jax.Array,
    max_distance: float = 100.0,
    out_capacity: int = 1 << 15,
    with_covs: bool = False,
    with_rgb: bool = False,
    with_intensity: bool = False,
) -> PointCloud:
    """Occupied-voxel centroids within L-inf range of the sensor
    (occupancy_grid_map.hpp:1530, 169-181)."""
    cnt_safe = jnp.maximum(state.hit_count, 1.0)
    centroid = state.sum_pos / cnt_safe[:, None]
    inside = jnp.all(jnp.abs(centroid - sensor_position) <= max_distance, axis=-1)
    keep = _occupied_mask(state, config) & inside

    # O(C) cumsum compaction over used slots (not O(C log C) argsort), so
    # extraction cost scales with contents, not grown table capacity.
    order, mask = compact_indices(keep, out_capacity)
    covs = None
    if with_covs:
        covs = eigh3.spd_exp(_tri_unpack(state.sum_logcov[order] / cnt_safe[order, None]))
    return PointCloud(
        points=centroid[order],
        mask=mask,
        covs=covs,
        rgb=state.sum_rgba[order] / cnt_safe[order, None] if with_rgb else None,
        intensities=state.sum_intensity[order] / cnt_safe[order] if with_intensity else None,
    )


def extract_visible_points(
    state: OccupancyGridState,
    config: OccupancyGridConfig,
    sensor_pose: jax.Array,
    max_distance: float,
    horizontal_fov: float,
    vertical_fov: float,
    out_capacity: int = 1 << 14,
) -> PointCloud:
    """[Experimental] FOV cone test + per-point occlusion ray-march
    (occupancy_grid_map.hpp:189-411).  A voxel is visible when its centroid
    lies inside the field of view within range AND no occupied voxel blocks
    the ray from the sensor."""
    horizontal_fov = min(max(horizontal_fov, 1e-3), math.pi - 1e-3)
    vertical_fov = min(max(vertical_fov, 1e-3), 2.0 * math.pi - 1e-3)

    sensor_pos = sensor_pose[:3, 3]
    Rt = sensor_pose[:3, :3].T
    cnt_safe = jnp.maximum(state.hit_count, 1.0)
    centroid = state.sum_pos / cnt_safe[:, None]
    occupied = _occupied_mask(state, config)

    diff = centroid - sensor_pos
    dist_sq = jnp.sum(diff * diff, axis=-1)
    in_range = dist_sq <= max_distance * max_distance

    local = diff @ Rt.T
    fwd = local[:, 0]
    cos_h_lim = math.cos(horizontal_fov * 0.5)
    cos_v_lim = math.cos(vertical_fov * 0.5)
    h_norm = jnp.sqrt(jnp.maximum(fwd**2 + local[:, 1] ** 2, 1e-30))
    v_norm = jnp.sqrt(jnp.maximum(fwd**2 + local[:, 2] ** 2, 1e-30))
    cos_h = jnp.clip(fwd / h_norm, -1.0, 1.0)
    cos_v = jnp.clip(fwd / v_norm, -1.0, 1.0)
    in_fov = (cos_h >= cos_h_lim) & (cos_v >= cos_v_lim) & (fwd > 0.0)

    candidate = occupied & in_range & in_fov

    # Select up to out_capacity candidates, then occlusion-test each.
    order, sel_mask = compact_indices(candidate, out_capacity)
    sel_centroid = centroid[order]

    ray_coords, ray_emit, _, _, _ = _dda_ray_coords(
        sensor_pos, sel_centroid, sel_mask, config.voxel_size, config.ray_step_budget
    )
    S = config.ray_step_budget
    flat_coords = ray_coords.reshape(-1, 3)
    flat_valid = ray_emit.reshape(-1)
    slot, found = lookup_slots(
        state.coords, state.used, flat_coords, flat_valid, config.capacity, config.max_probes
    )
    blocked_vox = found & _occupied_mask(state, config)[jnp.maximum(slot, 0)]
    occluded = jnp.any((blocked_vox & flat_valid).reshape(out_capacity, S), axis=-1)
    visible = sel_mask & ~occluded
    return PointCloud(points=sel_centroid, mask=visible)


def compute_overlap_ratio(
    state: OccupancyGridState,
    config: OccupancyGridConfig,
    cloud: PointCloud,
    sensor_pose: jax.Array,
) -> jax.Array:
    """Fraction of cloud points landing in occupied voxels
    (occupancy_grid_map.hpp:417-472)."""
    R = sensor_pose[:3, :3]
    pts_map = cloud.points @ R.T + sensor_pose[:3, 3]
    coords, ok = voxel_coords(pts_map, cloud.mask, config.voxel_size)
    slot, found = lookup_slots(
        state.coords, state.used, coords, ok, config.capacity, config.max_probes
    )
    occ = _occupied_mask(state, config)[jnp.maximum(slot, 0)] & found
    n = jnp.maximum(jnp.sum(cloud.mask.astype(jnp.float32)), 1.0)
    return jnp.sum(occ.astype(jnp.float32)) / n
