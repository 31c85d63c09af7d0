"""Occupancy grid map tests (mirrors tests/test_occupancy_grid_map.cpp:
log-odds integration, free-space carving, extraction, pruning, overlap)."""

import numpy as np

import jax.numpy as jnp

from sycl_points_tpu.mapping import occupancy_grid as og
from sycl_points_tpu.points.point_cloud import PointCloud

CFG = og.OccupancyGridConfig(voxel_size=1.0, capacity=1 << 12, max_ray_steps=64)


def cloud_of(pts):
    return PointCloud.from_numpy(np.asarray(pts, np.float32))


def test_hit_raises_probability():
    st = og.create(CFG)
    st = og.add_point_cloud(st, CFG, cloud_of([[5.5, 0.5, 0.5]]), jnp.eye(4))
    p = float(og.voxel_probability(st, CFG, jnp.asarray([5.5, 0.5, 0.5])))
    assert p > 0.6
    unknown = float(og.voxel_probability(st, CFG, jnp.asarray([50.0, 50.0, 50.0])))
    assert abs(unknown - 0.5) < 1e-6


def test_free_space_carving_lowers_probability():
    st = og.create(CFG)
    # repeated hits at x=5.5 carve free space along the ray from the origin
    for _ in range(5):
        st = og.add_point_cloud(st, CFG, cloud_of([[5.5, 0.5, 0.5]]), jnp.eye(4))
    p_hit = float(og.voxel_probability(st, CFG, jnp.asarray([5.5, 0.5, 0.5])))
    p_mid = float(og.voxel_probability(st, CFG, jnp.asarray([2.5, 0.5, 0.5])))
    assert p_hit > 0.9
    assert p_mid < 0.2  # carved free


def test_log_odds_clamped():
    st = og.create(CFG)
    for _ in range(30):
        st = og.add_point_cloud(st, CFG, cloud_of([[5.5, 0.5, 0.5]]), jnp.eye(4))
    lo = np.asarray(st.log_odds)
    assert lo.max() <= CFG.max_log_odds + 1e-5
    assert lo.min() >= CFG.min_log_odds - 1e-5


def test_extract_occupied_points():
    st = og.create(CFG)
    pts = [[5.5, 0.5, 0.5], [0.5, 7.5, 0.5]]
    for _ in range(3):
        st = og.add_point_cloud(st, CFG, cloud_of(pts), jnp.eye(4))
    out = og.extract_occupied_points(st, CFG, jnp.zeros(3), 100.0, out_capacity=64)
    got = out.to_numpy()["points"]
    assert got.shape[0] == 2
    got = got[np.argsort(got[:, 0])]
    np.testing.assert_allclose(got[0], [0.5, 7.5, 0.5], atol=1e-5)
    np.testing.assert_allclose(got[1], [5.5, 0.5, 0.5], atol=1e-5)


def test_extract_range_filter():
    st = og.create(CFG)
    st = og.add_point_cloud(st, CFG, cloud_of([[5.5, 0.5, 0.5], [60.5, 0.5, 0.5]]), jnp.eye(4))
    out = og.extract_occupied_points(st, CFG, jnp.zeros(3), 20.0, out_capacity=64)
    assert int(out.count()) == 1


def test_miss_only_voxels_not_extracted():
    st = og.create(CFG)
    st = og.add_point_cloud(st, CFG, cloud_of([[9.5, 0.5, 0.5]]), jnp.eye(4))
    out = og.extract_occupied_points(st, CFG, jnp.zeros(3), 100.0, out_capacity=64)
    assert int(out.count()) == 1  # only the hit voxel, none of the carved ones


def test_overlap_ratio():
    # carving disabled: dense random clouds would otherwise carve through
    # voxels hit by other rays (faithful to the reference semantics)
    cfg = og.OccupancyGridConfig(
        voxel_size=1.0, capacity=1 << 12, free_space_updates_enabled=False
    )
    st = og.create(cfg)
    pts = np.random.default_rng(1).uniform(2, 8, size=(100, 3)).astype(np.float32)
    for _ in range(2):
        st = og.add_point_cloud(st, cfg, cloud_of(pts), jnp.eye(4))
    assert float(og.compute_overlap_ratio(st, cfg, cloud_of(pts), jnp.eye(4))) > 0.9
    assert float(og.compute_overlap_ratio(st, cfg, cloud_of(pts + 100), jnp.eye(4))) < 0.05


def test_stale_pruning():
    cfg = og.OccupancyGridConfig(
        voxel_size=1.0, capacity=1 << 12, stale_frame_threshold=2,
        free_space_updates_enabled=False,
    )
    st = og.create(cfg)
    st = og.add_point_cloud(st, cfg, cloud_of([[5.5, 0.5, 0.5]]), jnp.eye(4))
    for _ in range(5):
        st = og.add_point_cloud(st, cfg, cloud_of([[0.5, 5.5, 0.5]]), jnp.eye(4))
    assert int(og.voxel_count(st)) == 1  # the old voxel was pruned


def test_visible_points_occlusion():
    st = og.create(CFG)
    # wall at x=5 and a point behind it at x=9 on the same ray
    wall = [[5.5, 0.5, 0.5]]
    behind = [[9.5, 0.5, 0.5]]
    cfg = og.OccupancyGridConfig(
        voxel_size=1.0, capacity=1 << 12, free_space_updates_enabled=False, max_ray_steps=64
    )
    for _ in range(3):
        st = og.add_point_cloud(st, cfg, cloud_of(wall + behind), jnp.eye(4))
    out = og.extract_visible_points(
        st, cfg, jnp.eye(4), max_distance=50.0,
        horizontal_fov=np.pi * 0.9, vertical_fov=np.pi * 0.9, out_capacity=32,
    )
    pts = out.to_numpy()["points"]
    assert pts.shape[0] == 1
    np.testing.assert_allclose(pts[0], [5.5, 0.5, 0.5], atol=1e-5)
