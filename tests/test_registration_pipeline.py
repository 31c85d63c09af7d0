"""Registration pipeline wrapper behaviors: sampling caps, robust annealing,
VICP deskew exposure (mirrors tests/test_registration_pipeline.cpp)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sycl_points_tpu.ops.covariance import estimate_covariances, extract_normals
from sycl_points_tpu.ops.knn import BruteForceKNN, brute_force_knn
from sycl_points_tpu.ops.robust import RobustLossType
from sycl_points_tpu.points.point_cloud import PointCloud
from sycl_points_tpu.registration.factors import RegType
from sycl_points_tpu.registration.pipeline import (
    PipelineOutput,
    RandomSamplingParams,
    RegistrationPipelineParams,
    RobustScheduleParams,
    VelocityUpdateParams,
    align_pipeline,
    inlier_ratio,
)
from sycl_points_tpu.registration.registration import (
    RegistrationParams,
    RobustParams,
)
from sycl_points_tpu.utils import lie

RNG = np.random.default_rng(44)

T_TRUE = np.asarray(
    lie.se3_exp(jnp.asarray([0.02, -0.02, 0.03, 0.2, -0.1, 0.1], dtype=np.float32))
)


def corner_scene(n=900):
    per = n // 3
    u = RNG.uniform(0.2, 5, size=(per, 2)).astype(np.float32)
    pts = np.concatenate([
        np.stack([u[:, 0], u[:, 1], np.zeros(per, np.float32)], 1),
        np.stack([np.zeros(per, np.float32), u[:, 0], u[:, 1]], 1),
        np.stack([u[:, 0], np.zeros(per, np.float32), u[:, 1]], 1),
    ]) + RNG.normal(scale=0.004, size=(3 * per, 3)).astype(np.float32)
    return pts


def build_cloud(pts, ts=None):
    c = PointCloud.from_numpy(pts, timestamp_offsets=ts)
    knn = brute_force_knn(c.points, c.mask, c.points, 10)
    covs = estimate_covariances(c.points, knn)
    return c.replace(covs=covs, normals=extract_normals(c.points, covs))


@pytest.fixture(scope="module")
def scene():
    pts = corner_scene()
    target = build_cloud(pts)
    src = ((pts - T_TRUE[:3, 3]) @ T_TRUE[:3, :3]).astype(np.float32)
    return src, target, BruteForceKNN.build(target)


def test_sampling_cap(scene):
    src, target, knn = scene
    source = build_cloud(src)
    params = RegistrationPipelineParams(
        registration=RegistrationParams(max_iterations=20),
        random_sampling=RandomSamplingParams(enable=True, num=300),
    )
    out = align_pipeline(source, target, knn, params)
    assert out.registration_input.capacity == 300
    assert int(out.result.inlier) <= 300
    err = np.asarray(lie.se3_log(jnp.asarray(np.linalg.inv(T_TRUE) @ np.asarray(out.result.T))))
    assert np.linalg.norm(err) < 0.05


def test_sampling_disabled(scene):
    src, target, knn = scene
    source = build_cloud(src)
    params = RegistrationPipelineParams(
        registration=RegistrationParams(max_iterations=10),
        random_sampling=RandomSamplingParams(enable=False),
    )
    out = align_pipeline(source, target, knn, params)
    assert out.registration_input.capacity == source.capacity


def test_robust_annealing_runs_levels(scene):
    src, target, knn = scene
    pts = src.copy()
    n_out = len(pts) // 10
    pts[:n_out] += RNG.uniform(1.5, 3.0, size=(n_out, 3)).astype(np.float32)
    source = build_cloud(pts)
    base = RegistrationParams(
        reg_type=RegType.GICP,
        robust=RobustParams(type=RobustLossType.GEMAN_MCCLURE, default_scale=1.0),
        max_iterations=10,
    )
    annealed = RegistrationPipelineParams(
        registration=base,
        random_sampling=RandomSamplingParams(enable=False),
        robust=RobustScheduleParams(auto_scale=True, init_scale=10.0, min_scale=1.0,
                                    rotation_init_scale=10.0, rotation_min_scale=1.0,
                                    auto_scaling_iter=3),
    )
    out = align_pipeline(source, target, knn, annealed)
    err = np.asarray(lie.se3_log(jnp.asarray(np.linalg.inv(T_TRUE) @ np.asarray(out.result.T))))
    assert np.linalg.norm(err) < 0.05
    assert 0.0 < float(inlier_ratio(out)) <= 1.0


def test_vicp_deskews_source(scene):
    _, target, knn = scene
    # Simulate true motion distortion consistent with the CV model:
    # sensor pose at scan fraction tau is T_TRUE @ exp(tau * log(T_TRUE))
    # (prev pose = identity), so the measured point is
    # exp(-tau xi) @ T_TRUE^-1 @ p_world.
    pts_w = corner_scene()
    n = len(pts_w)
    tau = np.linspace(0.0, 1.0, n).astype(np.float32)
    xi = np.asarray(lie.se3_log(jnp.asarray(T_TRUE)))
    motions = np.asarray(lie.se3_exp(jnp.asarray(-tau[:, None] * xi[None, :])))
    Tinv = np.linalg.inv(T_TRUE)
    p_start = pts_w @ Tinv[:3, :3].T + Tinv[:3, 3]
    src_distorted = np.einsum("nij,nj->ni", motions[:, :3, :3], p_start) + motions[:, :3, 3]
    ts = (tau * 100.0).astype(np.float32)  # ms over a 0.1 s scan
    source = build_cloud(src_distorted.astype(np.float32), ts=ts)

    params_vicp = RegistrationPipelineParams(
        registration=RegistrationParams(max_iterations=15),
        random_sampling=RandomSamplingParams(enable=False),
        velocity_update=VelocityUpdateParams(enable=True, iter=3),
    )
    out = align_pipeline(
        source, target, knn, params_vicp, prev_pose=jnp.eye(4), dt=jnp.float32(0.1)
    )
    assert isinstance(out, PipelineOutput)
    diff = np.abs(np.asarray(out.deskewed.points) - np.asarray(source.points)).max()
    assert diff > 1e-4  # motion was compensated
    err_vicp = np.linalg.norm(
        np.asarray(lie.se3_log(jnp.asarray(Tinv @ np.asarray(out.result.T))))
    )

    params_plain = RegistrationPipelineParams(
        registration=RegistrationParams(max_iterations=15),
        random_sampling=RandomSamplingParams(enable=False),
    )
    out_plain = align_pipeline(source, target, knn, params_plain)
    err_plain = np.linalg.norm(
        np.asarray(lie.se3_log(jnp.asarray(Tinv @ np.asarray(out_plain.result.T))))
    )
    assert err_vicp < err_plain  # VICP improves distorted-scan accuracy
    assert err_vicp < 0.08


def test_vicp_skipped_without_timestamps(scene):
    src, target, knn = scene
    source = build_cloud(src)
    params = RegistrationPipelineParams(
        registration=RegistrationParams(max_iterations=5),
        random_sampling=RandomSamplingParams(enable=False),
        velocity_update=VelocityUpdateParams(enable=True, iter=2),
    )
    out = align_pipeline(source, target, knn, params, prev_pose=jnp.eye(4), dt=jnp.float32(0.1))
    np.testing.assert_allclose(
        np.asarray(out.deskewed.points), np.asarray(source.points)
    )
