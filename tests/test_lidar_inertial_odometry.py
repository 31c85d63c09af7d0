"""LIO pipeline integration test with synthetic IMU (mirrors the reference
multi-frame LIO tests)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sycl_points_tpu.imu.preintegration import IMUMeasurement
from sycl_points_tpu.pipeline.lidar_inertial_odometry import (
    LidarInertialOdometry,
    ResultType,
)
from sycl_points_tpu.pipeline.params import (
    AngleIncidenceFilterParams,
    BoxFilterParams,
    CovarianceEstimationParams,
    DownsamplingParams,
    IMUParams,
    KeyframeParams,
    LidarInertialOdometryParams,
    MEstimationParams,
    PolarDownsamplingParams,
    PreprocessParams,
    RandomDownsamplingParams,
    RandomSamplingParams,
    RegistrationBlockParams,
    ScanParams,
    SubmapParams,
    VoxelDownsamplingParams,
)
from sycl_points_tpu.imu.preintegration import IMUPreintegrationParams
from sycl_points_tpu.points.point_cloud import PointCloud
from sycl_points_tpu.registration.factors import RegType
from sycl_points_tpu.registration.registration import RegistrationParams
from sycl_points_tpu.lio.lio_registration import LIORegistrationParams
from sycl_points_tpu.utils import lie

RNG = np.random.default_rng(66)
G = 9.80665


def make_world(n=3000):
    # per-call seeded generator — see test_lidar_odometry.make_world
    rng = np.random.default_rng(66 + n)
    per = n // 4
    u = rng.uniform(-8, 8, size=(per, 2)).astype(np.float32)
    floor = np.stack([u[:, 0], u[:, 1], np.full(per, -1.0, np.float32)], 1)
    wall1 = np.stack([np.full(per, 8.0, np.float32), u[:, 0], u[:, 1] * 0.25], 1)
    wall2 = np.stack([u[:, 0], np.full(per, 8.0, np.float32), u[:, 1] * 0.25], 1)
    pillars = rng.uniform(-6, 6, size=(per, 3)).astype(np.float32) * np.array([1, 1, 0.3], np.float32)
    world = np.concatenate([floor, wall1, wall2, pillars])
    world += rng.normal(scale=0.004, size=world.shape).astype(np.float32)
    return world


def scan_at(world, T):
    Tinv = np.linalg.inv(T)
    local = world @ Tinv[:3, :3].T + Tinv[:3, 3]
    return local[np.linalg.norm(local, axis=1) < 20.0].astype(np.float32)


def lio_params():
    return LidarInertialOdometryParams(
        scan=ScanParams(
            downsampling=DownsamplingParams(
                voxel=VoxelDownsamplingParams(enable=True, size=0.4),
                polar=PolarDownsamplingParams(enable=False),
                random=RandomDownsamplingParams(enable=True, num=1200),
            ),
            preprocess=PreprocessParams(
                box_filter=BoxFilterParams(enable=True, min=0.5, max=30.0),
                angle_incidence_filter=AngleIncidenceFilterParams(enable=False),
            ),
        ),
        submap=SubmapParams(
            map_type="VOXEL_HASH_MAP",
            voxel_size=0.5,
            point_random_sampling_num=1024,
            keyframe=KeyframeParams(
                inlier_ratio_threshold=0.2, distance_threshold=0.15,
                angle_threshold_degrees=5.0, time_threshold_seconds=0.5,
            ),
            map_capacity=1 << 14,
            extract_capacity=1 << 12,
        ),
        covariance_estimation=CovarianceEstimationParams(
            m_estimation=MEstimationParams(enable=False)
        ),
        imu=IMUParams(
            enable=True,
            preintegration=IMUPreintegrationParams(
                gyro_noise_density=1e-3, accel_noise_density=1e-2,
                gyro_bias_rw_density=1e-5, accel_bias_rw_density=1e-4,
            ),
        ),
        registration=RegistrationBlockParams(
            min_num_points=50,
            factor=RegistrationParams(reg_type=RegType.GICP),
        ),
        registration_sampling=RandomSamplingParams(enable=True, num=800),
        scan_capacity=1 << 11,
        lio=LIORegistrationParams(total_iterations=12),
    )


@pytest.mark.slow
def test_lio_tracks_with_imu():
    world = make_world()
    odo = LidarInertialOdometry(lio_params())

    # constant forward velocity 2 m/s, level, 10 Hz scans, 200 Hz IMU
    v = np.array([2.0, 0.0, 0.0], np.float32)
    frame_dt = 0.1
    n_frames = 6

    def T_at(t):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = v * t
        return T

    # feed IMU (stationary-rotation free, accel measures -g): a = R^T(0 - g) = +9.81 z
    for t in np.arange(-0.2, n_frames * frame_dt + 0.01, 1.0 / 200):
        odo.add_imu_measurement(
            IMUMeasurement(timestamp=10.0 + t, gyro=np.zeros(3, np.float32),
                           accel=np.array([0, 0, G], np.float32))
        )

    results = []
    for i in range(n_frames):
        t = 10.0 + i * frame_dt
        cloud = PointCloud.from_numpy(scan_at(world, T_at(i * frame_dt)))
        results.append(odo.process(cloud, t))

    assert results[0] is ResultType.first_frame
    assert all(r is ResultType.success for r in results[1:])

    T_est = odo.get_odometry()
    T_true = T_at((n_frames - 1) * frame_dt)
    err = np.asarray(lie.se3_log(jnp.asarray(np.linalg.inv(T_true) @ T_est, dtype=jnp.float32)))
    assert np.linalg.norm(err[3:]) < 0.15, f"translation drift {err}"
    assert np.linalg.norm(err[:3]) < 0.05, f"rotation drift {err}"
    # velocity estimate approaches the true velocity
    v_est = np.asarray(odo.get_state().velocity)
    assert np.linalg.norm(v_est - v) < 0.6, f"velocity {v_est}"


def test_imu_only_fallback():
    odo = LidarInertialOdometry(lio_params())
    world = make_world(1000)
    for t in np.arange(-0.2, 0.5, 1.0 / 200):
        odo.add_imu_measurement(
            IMUMeasurement(timestamp=10.0 + t, gyro=np.zeros(3, np.float32),
                           accel=np.array([0, 0, G], np.float32))
        )
    c0 = PointCloud.from_numpy(scan_at(world, np.eye(4)))
    assert odo.process(c0, 10.0) is ResultType.first_frame
    tiny = PointCloud.from_numpy(RNG.normal(size=(8, 3)).astype(np.float32) * 3)
    r = odo.process(tiny, 10.1)
    assert r is ResultType.imu_only
    assert np.all(np.isfinite(odo.get_odometry()))
