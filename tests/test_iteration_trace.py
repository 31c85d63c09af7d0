"""On-device per-iteration solver traces (verbose-mode equivalent of
registration.hpp:821-827/856-864/938-946): the trace must agree with the
returned result and with the untraced run."""

import numpy as np
import pytest

import jax.numpy as jnp

from sycl_points_tpu.lio import lio_registration as lio
from sycl_points_tpu.imu.factor import State
from sycl_points_tpu.ops.covariance import estimate_covariances, extract_normals
from sycl_points_tpu.ops.knn import BruteForceKNN, brute_force_knn
from sycl_points_tpu.points.point_cloud import PointCloud
from sycl_points_tpu.registration import registration as reg
from sycl_points_tpu.registration.factors import RegType
from sycl_points_tpu.registration.registration import RegistrationParams
from sycl_points_tpu.utils import lie

RNG = np.random.default_rng(77)


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


T_TRUE = np.asarray(
    lie.se3_exp(jnp.asarray([0.03, -0.02, 0.05, 0.2, -0.15, 0.1], dtype=np.float32))
)


@pytest.fixture(scope="module")
def scene():
    tgt_pts = corner_scene()
    target = build_cloud(tgt_pts)
    src_pts = (tgt_pts - T_TRUE[:3, 3]) @ T_TRUE[:3, :3]
    source = build_cloud(src_pts.astype(np.float32))
    return source, target, BruteForceKNN.build(target)


COL = {name: i for i, name in enumerate(reg.TRACE_COLS)}
LCOL = {name: i for i, name in enumerate(lio.TRACE_COLS)}


@pytest.mark.parametrize("method", ["gauss_newton", "levenberg_marquardt", "powell_dogleg"])
def test_registration_trace_matches_result(scene, method):
    source, target, knn = scene
    params = RegistrationParams(
        reg_type=RegType.GICP, optimization_method=method, max_iterations=12
    )
    schedule = ((10.0, 10.0), (2.0, 2.0))
    res_plain = reg.align(source, target, knn, params, robust_schedule=schedule)
    res, trace = reg.align(
        source, target, knn, params, robust_schedule=schedule, trace=True
    )
    trace = np.asarray(trace)

    # identical outcome with tracing on
    np.testing.assert_allclose(np.asarray(res.T), np.asarray(res_plain.T), atol=1e-6)
    assert int(res.iterations) == int(res_plain.iterations)

    # buffer is sized for the whole schedule; executed rows == iterations
    assert trace.shape == (params.max_iterations * len(schedule), len(reg.TRACE_COLS))
    executed = np.isfinite(trace[:, COL["error"]])
    n_exec = int(executed.sum())
    assert n_exec == int(res.iterations)
    assert not executed[n_exec:].any()  # contiguous prefix

    last = trace[n_exec - 1]
    assert last[COL["error"]] == pytest.approx(float(res.error), rel=1e-5)
    assert int(last[COL["inlier"]]) == int(res.inlier)
    assert last[COL["converged"]] == pytest.approx(float(res.converged))
    # level column is the annealing level index, non-decreasing
    levels = trace[executed, COL["level"]]
    assert (np.diff(levels) >= 0).all()
    assert levels[-1] == len(schedule) - 1 or bool(res.converged)


def test_lio_trace_matches_result(scene):
    source, target, knn = scene
    T_pred = T_TRUE @ np.asarray(
        lie.se3_exp(jnp.asarray([0.01, 0.0, -0.01, 0.05, -0.03, 0.02], dtype=np.float32))
    )
    state = State(
        position=jnp.asarray(T_pred[:3, 3]),
        rotation=jnp.asarray(T_pred[:3, :3]),
        velocity=jnp.zeros(3),
        accel_bias=jnp.zeros(3),
        gyro_bias=jnp.zeros(3),
    )
    P = jnp.eye(15)
    params = lio.LIORegistrationParams(total_iterations=8)
    res_plain = lio.align(source, target, knn, state, P, P, params=params)
    res, trace = lio.align(source, target, knn, state, P, P, params=params, trace=True)
    trace = np.asarray(trace)

    np.testing.assert_allclose(np.asarray(res.T), np.asarray(res_plain.T), atol=1e-6)
    assert trace.shape == (params.total_iterations, len(lio.TRACE_COLS))
    executed = np.isfinite(trace[:, LCOL["error"]])
    n_exec = int(executed.sum())
    assert n_exec == int(res.iterations) or n_exec <= int(res.iterations)
    assert n_exec >= 1

    last = trace[n_exec - 1]
    assert last[LCOL["error"]] == pytest.approx(float(res.error), rel=1e-5)
    assert int(last[LCOL["inlier"]]) == int(res.inlier)
    # accepted iterations have finite step norms, rejected have zeros
    steps = trace[executed, LCOL["step_rot"]:LCOL["step_ba"] + 1]
    assert np.isfinite(steps).all()


def test_lio_pipeline_collect_trace():
    """collect_trace=True surfaces per-frame iteration traces + innovations
    through the fused frame program."""
    from sycl_points_tpu.pipeline.lidar_inertial_odometry import (
        LidarInertialOdometry, ResultType,
    )
    from sycl_points_tpu.pipeline.params import (
        AngleIncidenceFilterParams,
        LidarInertialOdometryParams,
        PreprocessParams,
        ScanParams,
    )
    from sycl_points_tpu.imu.preintegration import IMUMeasurement

    # the synthetic corner planes pass through the sensor origin, so the
    # default angle-incidence filter would reject nearly every point
    params = LidarInertialOdometryParams(
        scan=ScanParams(
            preprocess=PreprocessParams(
                angle_incidence_filter=AngleIncidenceFilterParams(enable=False)
            )
        )
    )
    odo = LidarInertialOdometry(params, collect_trace=True)
    pts = corner_scene(6000) * 8.0
    for t in np.arange(-0.05, 0.25, 0.0025):
        odo.add_imu_measurement(IMUMeasurement(
            timestamp=float(t), gyro=np.zeros(3, np.float32),
            accel=np.asarray([0, 0, 9.80665], np.float32)))
    r0 = odo.process(PointCloud.from_numpy(pts), timestamp=0.0)
    assert r0 is ResultType.first_frame
    shift = np.asarray([0.05, -0.02, 0.01], np.float32)
    r1 = odo.process(PointCloud.from_numpy(pts + shift), timestamp=0.1)
    assert r1 is ResultType.success
    tr = odo.last_trace
    assert tr is not None
    assert tr["iter_trace"].shape == (
        params.lio.total_iterations, len(lio.TRACE_COLS)
    )
    assert np.isfinite(tr["iter_trace"][:, LCOL["error"]]).any()
    assert np.isfinite(tr["innovation_trans"])
    assert np.isfinite(tr["dv_update"])
