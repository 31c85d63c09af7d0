"""15-DOF LIO solver tests (mirrors tests/test_lio_registration.cpp)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sycl_points_tpu.imu.factor import (
    IDX_POS,
    IDX_ROT,
    State,
    compute_imu_hessian_gradient,
    compute_manifold_residual,
    retract,
)
from sycl_points_tpu.lio import lio_registration as lio
from sycl_points_tpu.ops.covariance import estimate_covariances, extract_normals
from sycl_points_tpu.ops.knn import BruteForceKNN, brute_force_knn
from sycl_points_tpu.points.point_cloud import PointCloud
from sycl_points_tpu.registration.factors import RegType
from sycl_points_tpu.registration.registration import RegistrationParams
from sycl_points_tpu.utils import lie

RNG = np.random.default_rng(31)


def corner_scene(n=600):
    per = n // 3
    u = RNG.uniform(0.2, 5, size=(per, 2)).astype(np.float32)
    pts = np.concatenate([
        np.stack([u[:, 0], u[:, 1], np.zeros(per, np.float32)], 1),
        np.stack([np.zeros(per, np.float32), u[:, 0], u[:, 1]], 1),
        np.stack([u[:, 0], np.zeros(per, np.float32), u[:, 1]], 1),
    ])
    pts += RNG.normal(scale=0.004, size=pts.shape).astype(np.float32)
    return pts


def build_cloud(pts):
    c = PointCloud.from_numpy(pts)
    knn = brute_force_knn(c.points, c.mask, c.points, 10)
    covs = estimate_covariances(c.points, knn)
    return c.replace(covs=covs, normals=extract_normals(c.points, covs))


T_TRUE = np.asarray(lie.se3_exp(jnp.asarray([0.03, -0.02, 0.05, 0.2, -0.15, 0.1], dtype=np.float32)))


@pytest.fixture(scope="module")
def scene():
    tgt_pts = corner_scene()
    target = build_cloud(tgt_pts)
    src_pts = (tgt_pts - T_TRUE[:3, 3]) @ T_TRUE[:3, :3]
    source = build_cloud(src_pts.astype(np.float32))
    return source, target, BruteForceKNN.build(target)


def _state_at(T, velocity=None):
    return State(
        position=jnp.asarray(T[:3, 3]),
        rotation=jnp.asarray(T[:3, :3]),
        velocity=jnp.zeros(3) if velocity is None else jnp.asarray(velocity),
        accel_bias=jnp.zeros(3),
        gyro_bias=jnp.zeros(3),
    )


@pytest.mark.parametrize("method", ["gauss_newton", "levenberg_marquardt", "powell_dogleg"])
def test_lio_align_recovers_pose(scene, method):
    source, target, knn = scene
    # prediction slightly off the true pose, loose prior
    T_pred = T_TRUE @ np.asarray(
        lie.se3_exp(jnp.asarray([0.01, 0.0, -0.01, 0.05, -0.03, 0.02], dtype=np.float32))
    )
    P_pred = jnp.eye(15) * 1.0
    res = lio.align(
        source, target, knn,
        _state_at(T_pred), P_pred, jnp.eye(15),
        factor_params=RegistrationParams(reg_type=RegType.GICP),
        params=lio.LIORegistrationParams(total_iterations=15, optimization_method=method),
    )
    T = np.asarray(res.T)
    err = np.asarray(lie.se3_log(jnp.asarray(np.linalg.inv(T_TRUE) @ T)))
    assert np.linalg.norm(err[3:]) < 0.02, f"{method}: terr {err}"
    assert np.linalg.norm(err[:3]) < 0.02, f"{method}: rerr {err}"
    assert int(res.inlier) > 200
    P = np.asarray(res.posterior_covariance)
    assert np.all(np.isfinite(P))
    assert np.trace(P) > 0


def test_tight_prior_dominates(scene):
    source, target, knn = scene
    T_pred = T_TRUE @ np.asarray(
        lie.se3_exp(jnp.asarray([0, 0, 0, 0.3, 0, 0], dtype=np.float32))
    )
    P_pred = jnp.eye(15) * 1e-10  # extremely confident (wrong) prior
    res = lio.align(
        source, target, knn, _state_at(T_pred), P_pred, jnp.eye(15),
        params=lio.LIORegistrationParams(total_iterations=5),
    )
    # solution stays near the prediction, not the ICP optimum
    d = np.linalg.norm(np.asarray(res.T)[:3, 3] - T_pred[:3, 3])
    assert d < 0.05


def test_manifold_residual_roundtrip():
    x = State.identity()
    delta = jnp.asarray(np.r_[0.1, -0.2, 0.3, 0.02, 0.03, -0.01, 0.5, 0, 0, 0.01, 0, 0, 0, 0.02, 0].astype(np.float32))
    y = retract(x, delta)
    r = np.asarray(compute_manifold_residual(x, y))
    np.testing.assert_allclose(r, np.asarray(delta), atol=1e-5)


def test_imu_hessian_gradient():
    x = State.identity()
    P = jnp.eye(15) * 0.5
    H, b, ok = compute_imu_hessian_gradient(x, x, P)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(H), np.eye(15) * 2.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(b), 0.0, atol=1e-6)


def test_covariance_frame_transform_roundtrip():
    T_il = np.asarray(
        lie.se3_exp(jnp.asarray([0.1, 0.2, -0.1, 0.05, -0.02, 0.3], dtype=np.float32))
    )
    R_wl = np.asarray(lie.quat_to_matrix(lie.so3_exp(jnp.asarray([0.3, -0.1, 0.2]))))
    A = RNG.normal(size=(15, 15)).astype(np.float32)
    P = jnp.asarray(A @ A.T * 0.01 + np.eye(15, dtype=np.float32) * 0.1)
    P_l = lio.transform_covariance_imu_to_lidar(P, jnp.asarray(T_il), jnp.asarray(R_wl))
    P_back = lio.transform_covariance_lidar_to_imu(P_l, jnp.asarray(T_il), jnp.asarray(R_wl))
    np.testing.assert_allclose(np.asarray(P_back), np.asarray(P), rtol=1e-3, atol=1e-4)


def test_directional_weighting_attenuates_weak_axis():
    H15 = jnp.zeros((15, 15))
    # strong x translation info, weak y/z
    H15 = H15.at[IDX_POS, IDX_POS].set(1e4)
    H15 = H15.at[IDX_POS + 1, IDX_POS + 1].set(1.0)
    H15 = H15.at[IDX_POS + 2, IDX_POS + 2].set(1.0)
    H15 = H15.at[IDX_ROT : IDX_ROT + 3, IDX_ROT : IDX_ROT + 3].set(jnp.eye(3) * 1e4)
    b15 = jnp.ones((15,))
    H_out, b_out = lio.apply_directional_icp_weighting(
        H15, b15, jnp.int32(100), lio.DirectionalIcpWeightingParams()
    )
    H_out = np.asarray(H_out)
    # weak axes scaled down by weak_direction_scale (0.2): 1.0 * 0.2
    np.testing.assert_allclose(H_out[IDX_POS + 1, IDX_POS + 1], 0.2, rtol=1e-3)
    # strong axis above min_info stays
    np.testing.assert_allclose(H_out[IDX_POS, IDX_POS], 1e4, rtol=1e-3)


def test_jit_lio_align(scene):
    source, target, knn = scene
    params = lio.LIORegistrationParams(total_iterations=8)
    fn = jax.jit(
        lambda s, t, k, st, P: lio.align(s, t, k, st, P, jnp.eye(15), params=params)
    )
    res = fn(source, target, knn, _state_at(T_TRUE), jnp.eye(15) * 0.1)
    err = np.asarray(lie.se3_log(jnp.asarray(np.linalg.inv(T_TRUE) @ np.asarray(res.T))))
    assert np.linalg.norm(err) < 0.05
