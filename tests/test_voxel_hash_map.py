"""Voxel hash map property tests (mirrors tests/test_voxel_hash_map.cpp of
the reference: aggregation, covariance rotation into the map frame,
min-count thresholds, AABB filtering, overlap ratio, staleness pruning)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sycl_points_tpu.mapping import voxel_hash_map as vhm
from sycl_points_tpu.points.point_cloud import PointCloud
from sycl_points_tpu.utils import lie

RNG = np.random.default_rng(77)
CFG = vhm.VoxelHashMapConfig(voxel_size=1.0, capacity=1 << 12, max_probes=16)


def cloud_of(pts, **kw):
    kw = {k: np.asarray(v, np.float32) for k, v in kw.items()}
    return PointCloud.from_numpy(np.asarray(pts, np.float32), **kw)


def test_insert_and_extract_centroids():
    pts = np.array(
        [[0.2, 0.2, 0.2], [0.4, 0.4, 0.4], [5.5, 5.5, 5.5]], dtype=np.float32
    )
    st = vhm.add_point_cloud(vhm.create(CFG), CFG, cloud_of(pts), jnp.eye(4))
    assert int(vhm.voxel_count(st)) == 2
    out = vhm.extract(st, CFG, jnp.zeros(3), 100.0, out_capacity=16, with_covs=False)
    got = out.to_numpy()["points"]
    got = got[np.argsort(got[:, 0])]
    np.testing.assert_allclose(got[0], [0.3, 0.3, 0.3], atol=1e-5)
    np.testing.assert_allclose(got[1], [5.5, 5.5, 5.5], atol=1e-5)


def test_accumulation_across_frames():
    p1 = np.array([[0.25, 0.25, 0.25]], np.float32)
    p2 = np.array([[0.75, 0.75, 0.75]], np.float32)
    st = vhm.create(CFG)
    st = vhm.add_point_cloud(st, CFG, cloud_of(p1), jnp.eye(4))
    st = vhm.add_point_cloud(st, CFG, cloud_of(p2), jnp.eye(4))
    assert int(vhm.voxel_count(st)) == 1
    out = vhm.extract(st, CFG, jnp.zeros(3), 10.0, out_capacity=8, with_covs=False)
    np.testing.assert_allclose(out.to_numpy()["points"][0], [0.5, 0.5, 0.5], atol=1e-5)


def test_pose_transform_applied():
    pts = np.array([[1.0, 0.0, 0.0]], np.float32)
    T = np.asarray(lie.se3_exp(jnp.asarray([0, 0, np.pi / 2, 0, 0, 0], dtype=np.float32)))
    st = vhm.add_point_cloud(vhm.create(CFG), CFG, cloud_of(pts), jnp.asarray(T))
    out = vhm.extract(st, CFG, jnp.zeros(3), 10.0, out_capacity=8, with_covs=False)
    np.testing.assert_allclose(out.to_numpy()["points"][0], [0.0, 1.0, 0.0], atol=1e-5)


def test_covariance_log_euclidean_roundtrip():
    # one point with a known covariance: extraction must return ~the same cov
    pts = np.array([[0.5, 0.5, 0.5]], np.float32)
    cov = np.diag([0.04, 0.01, 0.0025]).astype(np.float32)[None]
    st = vhm.add_point_cloud(vhm.create(CFG), CFG, cloud_of(pts, covs=cov), jnp.eye(4))
    out = vhm.extract(st, CFG, jnp.zeros(3), 10.0, out_capacity=8, with_covs=True)
    got = out.to_numpy()["covs"][0]
    np.testing.assert_allclose(got, cov[0], rtol=0.05, atol=1e-4)


def test_covariance_rotated_into_map_frame():
    pts = np.array([[1.0, 0.0, 0.0]], np.float32)
    cov = np.diag([0.09, 0.01, 0.01]).astype(np.float32)[None]  # elongated in x
    T = np.asarray(lie.se3_exp(jnp.asarray([0, 0, np.pi / 2, 0, 0, 0], dtype=np.float32)))
    st = vhm.add_point_cloud(vhm.create(CFG), CFG, cloud_of(pts, covs=cov), jnp.asarray(T))
    out = vhm.extract(st, CFG, jnp.zeros(3), 10.0, out_capacity=8, with_covs=True)
    got = out.to_numpy()["covs"][0]
    # after 90deg z-rotation the elongation is along y
    np.testing.assert_allclose(got[1, 1], 0.09, rtol=0.1)
    np.testing.assert_allclose(got[0, 0], 0.01, rtol=0.1)


def test_min_num_point_filter():
    cfg = vhm.VoxelHashMapConfig(voxel_size=1.0, capacity=1 << 12, min_num_point=2)
    pts = np.array([[0.2, 0.2, 0.2], [0.4, 0.4, 0.4], [5.5, 5.5, 5.5]], np.float32)
    st = vhm.add_point_cloud(vhm.create(cfg), cfg, cloud_of(pts), jnp.eye(4))
    out = vhm.extract(st, cfg, jnp.zeros(3), 100.0, out_capacity=16, with_covs=False)
    assert int(out.count()) == 1  # only the 2-point voxel survives


def test_aabb_filter():
    pts = np.array([[0.5, 0.5, 0.5], [50.5, 0.5, 0.5]], np.float32)
    st = vhm.add_point_cloud(vhm.create(CFG), CFG, cloud_of(pts), jnp.eye(4))
    out = vhm.extract(st, CFG, jnp.zeros(3), 10.0, out_capacity=16, with_covs=False)
    assert int(out.count()) == 1


def test_overlap_ratio():
    pts = RNG.uniform(-5, 5, size=(200, 3)).astype(np.float32)
    st = vhm.add_point_cloud(vhm.create(CFG), CFG, cloud_of(pts), jnp.eye(4))
    full = float(vhm.compute_overlap_ratio(st, CFG, cloud_of(pts), jnp.eye(4)))
    assert full > 0.99
    far = cloud_of(pts + 100.0)
    none = float(vhm.compute_overlap_ratio(st, CFG, far, jnp.eye(4)))
    assert none < 0.01


def test_staleness_pruning():
    cfg = vhm.VoxelHashMapConfig(voxel_size=1.0, capacity=1 << 12, max_staleness=2)
    st = vhm.create(cfg)
    st = vhm.add_point_cloud(st, cfg, cloud_of([[0.5, 0.5, 0.5]]), jnp.eye(4))
    for _ in range(5):
        st = vhm.add_point_cloud(st, cfg, cloud_of([[10.5, 10.5, 10.5]]), jnp.eye(4))
    assert int(vhm.voxel_count(st)) == 2
    st = vhm.remove_old_data(st, cfg)
    assert int(vhm.voxel_count(st)) == 1
    out = vhm.extract(st, cfg, jnp.zeros(3), 100.0, out_capacity=8, with_covs=False)
    np.testing.assert_allclose(out.to_numpy()["points"][0], [10.5, 10.5, 10.5], atol=1e-5)


def test_many_random_voxels_no_collision_loss():
    # 3000 distinct voxels into an 8192-slot table (37% load, below the
    # reference's 0.7 rehash threshold): every key must resolve
    cfg = vhm.VoxelHashMapConfig(voxel_size=1.0, capacity=1 << 13, max_probes=32)
    grid = np.stack(np.meshgrid(np.arange(15), np.arange(15), np.arange(14)), -1)
    pts = (grid.reshape(-1, 3) * 1.0 + 0.5).astype(np.float32)[:3000]
    st = vhm.add_point_cloud(vhm.create(cfg), cfg, cloud_of(pts), jnp.eye(4))
    assert int(vhm.voxel_count(st)) == 3000
    assert float(vhm.compute_overlap_ratio(st, cfg, cloud_of(pts), jnp.eye(4))) == 1.0


def test_jit_insert():
    f = jax.jit(lambda st, c: vhm.add_point_cloud(st, CFG, c, jnp.eye(4)))
    st = f(vhm.create(CFG), cloud_of(RNG.uniform(-5, 5, size=(500, 3))))
    assert int(vhm.voxel_count(st)) > 100
