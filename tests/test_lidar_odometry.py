"""LiDAR odometry pipeline integration test (mirrors
tests/test_lidar_odometry_imu.cpp's synthetic multi-frame strategy)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sycl_points_tpu.pipeline.lidar_odometry import LidarOdometry, ResultType
from sycl_points_tpu.pipeline.params import (
    BoxFilterParams,
    DownsamplingParams,
    KeyframeParams,
    LidarOdometryParams,
    MEstimationParams,
    PolarDownsamplingParams,
    PreprocessParams,
    AngleIncidenceFilterParams,
    RandomDownsamplingParams,
    RandomSamplingParams,
    RegistrationBlockParams,
    ScanParams,
    SubmapParams,
    CovarianceEstimationParams,
    VoxelDownsamplingParams,
)
from sycl_points_tpu.points.point_cloud import PointCloud
from sycl_points_tpu.registration.factors import RegType
from sycl_points_tpu.registration.registration import RegistrationParams
from sycl_points_tpu.utils import lie

RNG = np.random.default_rng(55)


def make_world(n=4000):
    """A room: floor + two walls + scattered structure.

    Per-call seeded generator: drawing from the shared module RNG made the
    world depend on how many tests (in any file importing this helper) ran
    before — order-dependent inputs that flaked marginal drift assertions
    under the full suite."""
    rng = np.random.default_rng(55 + n)
    per = n // 4
    u = rng.uniform(-8, 8, size=(per, 2)).astype(np.float32)
    floor = np.stack([u[:, 0], u[:, 1], np.full(per, -1.0, np.float32)], 1)
    wall1 = np.stack([np.full(per, 8.0, np.float32), u[:, 0], u[:, 1] * 0.25], 1)
    wall2 = np.stack([u[:, 0], np.full(per, 8.0, np.float32), u[:, 1] * 0.25], 1)
    pillars = rng.uniform(-6, 6, size=(per, 3)).astype(np.float32) * np.array([1, 1, 0.3], np.float32)
    world = np.concatenate([floor, wall1, wall2, pillars])
    world += rng.normal(scale=0.005, size=world.shape).astype(np.float32)
    return world


def scan_at(world, T):
    """Observe world points from pose T (world->sensor: T^-1)."""
    Tinv = np.linalg.inv(T)
    local = world @ Tinv[:3, :3].T + Tinv[:3, 3]
    keep = np.linalg.norm(local, axis=1) < 20.0
    return local[keep].astype(np.float32)


def small_params():
    return LidarOdometryParams(
        scan=ScanParams(
            downsampling=DownsamplingParams(
                voxel=VoxelDownsamplingParams(enable=True, size=0.4),
                polar=PolarDownsamplingParams(enable=False),
                random=RandomDownsamplingParams(enable=True, num=1500),
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
                inlier_ratio_threshold=0.2,
                distance_threshold=0.2,
                angle_threshold_degrees=5.0,
                time_threshold_seconds=0.5,
            ),
            map_capacity=1 << 14,
            extract_capacity=1 << 12,
        ),
        covariance_estimation=CovarianceEstimationParams(
            m_estimation=MEstimationParams(enable=False)
        ),
        registration=RegistrationBlockParams(
            min_num_points=50,
            factor=RegistrationParams(reg_type=RegType.GICP, max_iterations=15),
        ),
        registration_sampling=RandomSamplingParams(enable=True, num=800),
        scan_capacity=1 << 11,
    )


@pytest.mark.slow
def test_odometry_tracks_trajectory():
    world = make_world()
    lo = LidarOdometry(small_params())

    # sensor moves forward with a gentle turn
    poses = []
    T = np.eye(4, dtype=np.float32)
    for i in range(8):
        poses.append(T.copy())
        step = np.asarray(
            lie.se3_exp(jnp.asarray([0.0, 0.0, 0.03, 0.25, 0.05, 0.0], dtype=np.float32))
        )
        T = (T @ step).astype(np.float32)

    results = []
    est = []
    for i, T_true in enumerate(poses):
        pts = scan_at(world, T_true)
        cloud = PointCloud.from_numpy(pts)
        r = lo.process(cloud, timestamp=0.1 * i)
        results.append(r)
        est.append(lo.get_odometry())

    assert results[0] is ResultType.first_frame
    assert all(r is ResultType.success for r in results[1:])

    # final pose error small
    err = np.asarray(
        lie.se3_log(jnp.asarray(np.linalg.inv(poses[-1]) @ est[-1], dtype=jnp.float32))
    )
    t_err = np.linalg.norm(err[3:])
    r_err = np.linalg.norm(err[:3])
    assert t_err < 0.1, f"translation drift {t_err:.3f} m over 8 frames"
    assert r_err < 0.05, f"rotation drift {r_err:.4f} rad"
    assert len(lo.get_keyframe_poses()) >= 2
    assert "3. registration" in lo.get_processing_times()


def test_old_timestamp_rejected():
    lo = LidarOdometry(small_params())
    world = make_world(1000)
    c = PointCloud.from_numpy(scan_at(world, np.eye(4)))
    assert lo.process(c, 1.0) is ResultType.first_frame
    assert lo.process(c, 1.1) is ResultType.success
    assert lo.process(c, 1.05) is ResultType.old_timestamp


def test_small_cloud_rejected():
    lo = LidarOdometry(small_params())
    tiny = PointCloud.from_numpy(RNG.normal(size=(10, 3)).astype(np.float32) * 5)
    assert lo.process(tiny, 0.0) is ResultType.small_number_of_points


def test_single_sync_per_frame():
    """The fused frame path must pay exactly ONE device->host readback per
    successful frame (the stats fetch) — the round-2 pipeline paid >=5."""
    lo = LidarOdometry(small_params())
    world = make_world(1500)
    T = np.eye(4, dtype=np.float32)
    c0 = PointCloud.from_numpy(scan_at(world, T))
    assert lo.process(c0, 0.0) is ResultType.first_frame
    for i in range(1, 4):
        T2 = T.copy()
        T2[0, 3] = 0.05 * i
        c = PointCloud.from_numpy(scan_at(world, T2))
        assert lo.process(c, 0.1 * i) is ResultType.success
        assert lo.sync_count_last_frame == 1
