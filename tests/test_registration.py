"""Registration solver: known-transform recovery for every RegType and
optimizer (mirrors the reference tests/test_registration_pipeline.cpp solver
coverage, using the exact brute-force KNN as the reference uses
CountingNearestKNN)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sycl_points_tpu.ops.covariance import estimate_covariances, extract_normals
from sycl_points_tpu.ops.knn import BruteForceKNN, brute_force_knn
from sycl_points_tpu.ops.robust import RobustLossType
from sycl_points_tpu.points.point_cloud import PointCloud
from sycl_points_tpu.registration.factors import RegType
from sycl_points_tpu.registration.registration import (
    RegistrationParams,
    RobustParams,
    align,
    compute_icp_robust_weights,
)
from sycl_points_tpu.utils import lie

RNG = np.random.default_rng(99)


def corner_scene(n=900):
    """Three orthogonal planes (fully constrains 6 DOF)."""
    per = n // 3
    u = RNG.uniform(0.2, 5, size=(per, 2)).astype(np.float32)
    ground = np.stack([u[:, 0], u[:, 1], np.zeros(per, np.float32)], axis=1)
    wall_x = np.stack([np.zeros(per, np.float32), u[:, 0], u[:, 1]], axis=1)
    wall_y = np.stack([u[:, 0], np.zeros(per, np.float32), u[:, 1]], axis=1)
    pts = np.concatenate([ground, wall_x, wall_y]).astype(np.float32)
    pts += RNG.normal(scale=0.005, size=pts.shape).astype(np.float32)
    return pts


def build_target(pts, k=10):
    cloud = PointCloud.from_numpy(pts)
    knn = brute_force_knn(cloud.points, cloud.mask, cloud.points, k)
    covs = estimate_covariances(cloud.points, knn)
    normals = extract_normals(cloud.points, covs)
    return cloud.replace(covs=covs, normals=normals)


T_TRUE = np.asarray(
    lie.se3_exp(jnp.asarray([0.04, -0.03, 0.06, 0.3, -0.2, 0.15], dtype=np.float32))
)


def _check(result, atol_t=0.01, atol_r=0.01):
    T = np.asarray(result.T)
    err = np.asarray(lie.se3_log(jnp.asarray(np.linalg.inv(T_TRUE) @ T)))
    assert np.linalg.norm(err[3:]) < atol_t, f"translation error {err}"
    assert np.linalg.norm(err[:3]) < atol_r, f"rotation error {err}"
    assert int(result.inlier) > 100


@pytest.fixture(scope="module")
def scene():
    tgt_pts = corner_scene()
    target = build_target(tgt_pts)
    # source = T_true^-1 * target points (so align recovers T_true)
    src_pts = (tgt_pts - T_TRUE[:3, 3]) @ T_TRUE[:3, :3]
    source = build_target(src_pts.astype(np.float32))
    knn = BruteForceKNN.build(target)
    return source, target, knn


@pytest.mark.parametrize("reg_type", list(RegType))
def test_recover_transform_gn(scene, reg_type):
    source, target, knn = scene
    params = RegistrationParams(reg_type=reg_type, max_iterations=30)
    res = align(source, target, knn, params)
    _check(res)


@pytest.mark.parametrize("opt", ["levenberg_marquardt", "powell_dogleg"])
def test_recover_transform_optimizers(scene, opt):
    source, target, knn = scene
    params = RegistrationParams(
        reg_type=RegType.GICP, optimization_method=opt, max_iterations=30
    )
    res = align(source, target, knn, params)
    _check(res)


def test_robust_loss_with_outliers(scene):
    source, target, knn = scene
    # corrupt 10% of source points
    pts = np.asarray(source.points).copy()
    n_out = len(pts) // 10
    pts[:n_out] += RNG.uniform(2.0, 4.0, size=(n_out, 3)).astype(np.float32)
    source_c = source.replace(points=jnp.asarray(pts))
    params = RegistrationParams(
        reg_type=RegType.GICP,
        robust=RobustParams(type=RobustLossType.GEMAN_MCCLURE, default_scale=1.0),
        max_iterations=40,
    )
    res = align(source_c, target, knn, params)
    _check(res, atol_t=0.03, atol_r=0.03)


def test_initial_guess(scene):
    source, target, knn = scene
    params = RegistrationParams(reg_type=RegType.POINT_TO_PLANE, max_iterations=15)
    res = align(source, target, knn, params, initial_guess=jnp.asarray(T_TRUE))
    _check(res)
    assert bool(res.converged)
    assert int(res.iterations) <= 3


def test_icp_robust_weights(scene):
    source, target, knn = scene
    params = RegistrationParams(
        reg_type=RegType.GICP,
        robust=RobustParams(type=RobustLossType.CAUCHY, default_scale=1.0),
    )
    w = np.asarray(
        compute_icp_robust_weights(source, target, knn, jnp.asarray(T_TRUE), params)
    )
    assert w.shape[0] == source.capacity
    assert np.all((w >= 0) & (w <= 1))
    assert w[np.asarray(source.mask)].mean() > 0.5  # good alignment => high weights


def test_jit_align_compiles_once(scene):
    import jax

    source, target, knn = scene
    params = RegistrationParams(reg_type=RegType.GICP, max_iterations=10)
    fn = jax.jit(lambda s, t, k, T0: align(s, t, k, params, initial_guess=T0))
    res = fn(source, target, knn, jnp.eye(4))
    _check(res, atol_t=0.02, atol_r=0.02)


def test_p2d_planar_degenerate_covariances_stay_finite():
    # P2D against razor-thin (roundoff-indefinite) target covariances must
    # produce finite whitened rows (factor.hpp:312-317 analog with the
    # SPD-by-construction information matrix).
    from sycl_points_tpu.registration.factors import whitened_rows

    rng = np.random.default_rng(3)
    n = 64
    src = rng.normal(size=(n, 3)).astype(np.float32) * 20.0
    tgt = src + rng.normal(scale=0.01, size=(n, 3)).astype(np.float32)
    # planar covariances with a slightly negative smallest eigenvalue
    v = rng.normal(size=(n, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    covs = (
        np.eye(3, dtype=np.float32)[None] * 1e-1
        - (1e-1 + 5e-5) * v[:, :, None] * v[:, None, :]
    )
    rows = whitened_rows(
        RegType.POINT_TO_DISTRIBUTION,
        jnp.eye(4),
        jnp.asarray(src),
        jnp.asarray(tgt),
        tgt_covs_raw=jnp.asarray(covs),
    )
    assert np.all(np.isfinite(np.asarray(rows.A)))
    assert np.all(np.isfinite(np.asarray(rows.c)))
    assert np.all(np.isfinite(np.asarray(rows.residual_norm)))
