"""Grid-bucket KNN vs brute-force oracle (the reference validates its
KD-tree/octree against brute force the same way, tests/test_kdtree.cpp)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sycl_points_tpu.ops.grid_knn import GridKNN
from sycl_points_tpu.ops.knn import brute_force_knn
from sycl_points_tpu.points.point_cloud import PointCloud
from sycl_points_tpu.registration.registration import RegistrationParams, align
from sycl_points_tpu.utils import lie

RNG = np.random.default_rng(17)


def dense_cloud(n, extent=10.0):
    return (RNG.uniform(-extent, extent, size=(n, 3))).astype(np.float32)


def test_nn_matches_bruteforce_within_cell_size():
    tgt = dense_cloud(3000)
    qry = dense_cloud(500)
    cloud = PointCloud.from_numpy(tgt)
    grid = GridKNN.build(cloud, cell_size=2.0)
    res = grid.search(jnp.asarray(qry), 1)
    ref = brute_force_knn(cloud.points, cloud.mask, jnp.asarray(qry), 1)
    d_g = np.asarray(res.distances[:, 0])
    d_b = np.asarray(ref.distances[:, 0])
    # exact wherever the true NN is within cell_size
    near = d_b < 2.0**2
    assert near.mean() > 0.95
    # brute force computes |q|^2+|t|^2-2qt (cancellation-prone); the grid uses
    # the direct difference, so allow small absolute slack
    np.testing.assert_allclose(d_g[near], d_b[near], rtol=1e-3, atol=1e-3)


def test_knn_k10_matches_bruteforce():
    tgt = dense_cloud(4000, extent=5.0)  # dense: knn radius << cell size
    qry = tgt[:300]
    cloud = PointCloud.from_numpy(tgt)
    grid = GridKNN.build(cloud, cell_size=2.0, max_per_cell=128)
    res = grid.search(jnp.asarray(qry), 10)
    ref = brute_force_knn(cloud.points, cloud.mask, jnp.asarray(qry), 10)
    d_g = np.sort(np.asarray(res.distances), axis=1)
    d_b = np.sort(np.asarray(ref.distances), axis=1)
    exact = np.isclose(d_g, d_b, rtol=1e-3, atol=1e-3).all(axis=1)
    assert exact.mean() > 0.97  # cells with >max_per_cell points may clip


def test_pose_folding():
    tgt = dense_cloud(2000)
    src = dense_cloud(200)
    T = np.asarray(lie.se3_exp(jnp.asarray([0.1, -0.1, 0.2, 1.0, 0.5, -0.3], dtype=np.float32)))
    cloud = PointCloud.from_numpy(tgt)
    grid = GridKNN.build(cloud, cell_size=3.0)
    res = grid.search(jnp.asarray(src), 1, pose=jnp.asarray(T))
    moved = src @ T[:3, :3].T + T[:3, 3]
    ref = brute_force_knn(cloud.points, cloud.mask, jnp.asarray(moved), 1)
    near = np.asarray(ref.distances[:, 0]) < 3.0**2
    np.testing.assert_array_equal(
        np.asarray(res.indices[:, 0])[near], np.asarray(ref.indices[:, 0])[near]
    )


def test_masked_points_excluded():
    tgt = dense_cloud(500)
    cloud = PointCloud.from_numpy(tgt)
    mask = np.asarray(cloud.mask).copy()
    mask[::2] = False
    cloud = cloud.replace(mask=jnp.asarray(mask))
    grid = GridKNN.build(cloud, cell_size=5.0)
    res = grid.search(cloud.points[:100], 1)
    hit = np.asarray(res.indices[:, 0])
    finite = np.isfinite(np.asarray(res.distances[:, 0]))
    assert np.all(mask[hit[finite]])


def test_align_with_grid_knn():
    """The GridKNN plugs into the registration loop as a drop-in KNN."""
    per = 300
    u = RNG.uniform(0.2, 5, size=(per, 2)).astype(np.float32)
    pts = np.concatenate([
        np.stack([u[:, 0], u[:, 1], np.zeros(per, np.float32)], 1),
        np.stack([np.zeros(per, np.float32), u[:, 0], u[:, 1]], 1),
        np.stack([u[:, 0], np.zeros(per, np.float32), u[:, 1]], 1),
    ]) + RNG.normal(scale=0.004, size=(900, 3)).astype(np.float32)
    from sycl_points_tpu.ops.covariance import estimate_covariances, extract_normals

    target = PointCloud.from_numpy(pts)
    knn10 = brute_force_knn(target.points, target.mask, target.points, 10)
    covs = estimate_covariances(target.points, knn10)
    target = target.replace(covs=covs, normals=extract_normals(target.points, covs))

    T_true = np.asarray(lie.se3_exp(jnp.asarray([0.03, -0.02, 0.04, 0.2, -0.1, 0.1], dtype=np.float32)))
    src_pts = (pts - T_true[:3, 3]) @ T_true[:3, :3]
    source = PointCloud.from_numpy(src_pts.astype(np.float32))
    knn_s = brute_force_knn(source.points, source.mask, source.points, 10)
    source = source.replace(covs=estimate_covariances(source.points, knn_s))

    grid = GridKNN.build(target, cell_size=2.0, max_per_cell=64)
    res = align(source, target, grid, RegistrationParams(max_iterations=25))
    err = np.asarray(lie.se3_log(jnp.asarray(np.linalg.inv(T_true) @ np.asarray(res.T))))
    assert np.linalg.norm(err) < 0.02


def test_overflow_telemetry_and_build_auto():
    """Per-cell budget overflow is COUNTED (never silent) and build_auto
    rebuilds with a doubled budget until nothing is invisible."""
    # 600 points crammed into one cell of size 5
    pts = RNG.uniform(0, 4.9, size=(600, 3)).astype(np.float32)
    cloud = PointCloud.from_numpy(pts)
    g = GridKNN.build(cloud, cell_size=5.0, max_per_cell=32)
    assert int(g.overflow) == 600 - 32
    # a query can MISS its true NN with the clipped budget
    auto = GridKNN.build_auto(cloud, cell_size=5.0, max_per_cell=32,
                              max_per_cell_cap=1024)
    assert int(auto.overflow) == 0
    assert int(auto.cells_dropped) == 0
    qry = jnp.asarray(RNG.uniform(0, 4.9, size=(64, 3)).astype(np.float32))
    res = auto.search(qry, 1)
    ref = brute_force_knn(cloud.points, cloud.mask, qry, 1)
    np.testing.assert_array_equal(
        np.asarray(res.indices[:, 0]), np.asarray(ref.indices[:, 0])
    )


def test_build_target_knn_auto_selection():
    """build_target_knn picks brute force below the crossover, grid above,
    and both produce the same registration result."""
    from sycl_points_tpu.ops.knn import BruteForceKNN, build_target_knn

    tgt = dense_cloud(4000, extent=8.0)
    cloud = PointCloud.from_numpy(tgt)
    small = build_target_knn(cloud, max_correspondence_distance=2.0)
    assert isinstance(small, BruteForceKNN)
    forced = build_target_knn(
        cloud, max_correspondence_distance=2.0, threshold=1000
    )
    assert isinstance(forced, GridKNN)

    src = dense_cloud(400, extent=8.0) * 0.98
    source = PointCloud.from_numpy(src.astype(np.float32))
    params = RegistrationParams(
        reg_type=__import__("sycl_points_tpu.registration.factors",
                            fromlist=["RegType"]).RegType.POINT_TO_POINT,
        max_iterations=10,
    )
    res_b = align(source, cloud, small, params)
    res_g = align(source, cloud, forced, params)
    np.testing.assert_allclose(np.asarray(res_g.T), np.asarray(res_b.T), atol=1e-5)
    assert int(res_g.inlier) == int(res_b.inlier)
