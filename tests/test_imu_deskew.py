"""IMU deskew vs synthetic rigid-motion ground truth (mirrors
tests/test_imu_deskew.cpp)."""

import numpy as np
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from sycl_points_tpu.deskew.imu_deskew import IMUDeskewStatus, deskew_point_cloud_imu
from sycl_points_tpu.imu.preintegration import IMUMeasurement
from sycl_points_tpu.points.point_cloud import PointCloud

RNG = np.random.default_rng(8)
G = 9.80665


def make_rotating_scan(omega_z, duration=0.1, n=200, t0=50.0):
    """Static scene observed by a sensor rotating about z at omega_z rad/s."""
    world_pts = RNG.uniform(-10, 10, size=(n, 3)).astype(np.float32)
    t_offsets = np.linspace(0.0, duration, n).astype(np.float32)  # seconds
    sensed = np.empty_like(world_pts)
    for i, t in enumerate(t_offsets):
        R = Rotation.from_rotvec([0, 0, omega_z * t]).as_matrix()
        sensed[i] = R.T @ world_pts[i]
    cloud = PointCloud.from_numpy(sensed, timestamp_offsets=t_offsets * 1e3)  # ms
    # IMU at 400 Hz covering the window generously
    ts = np.arange(-0.05, duration + 0.05, 1.0 / 400)
    imu = [
        IMUMeasurement(
            timestamp=t0 + t,
            gyro=np.array([0, 0, omega_z], np.float32),
            accel=np.array([0, 0, G], np.float32),
        )
        for t in ts
    ]
    return cloud, imu, world_pts, t0, duration


def test_rotation_deskew_recovers_static_scene():
    cloud, imu, world_pts, t0, dur = make_rotating_scan(2.0)  # ~11 deg over scan
    out, status = deskew_point_cloud_imu(
        cloud, imu, t0, dur, np.eye(4, dtype=np.float32),
        np.zeros(3), np.zeros(3),
    )
    assert status is IMUDeskewStatus.success
    got = out.to_numpy()["points"]
    np.testing.assert_allclose(got, world_pts, atol=2e-3)


def test_gyro_only_mode():
    cloud, imu, world_pts, t0, dur = make_rotating_scan(3.0)
    out, status = deskew_point_cloud_imu(
        cloud, imu, t0, dur, np.eye(4, dtype=np.float32),
        np.zeros(3), np.zeros(3), gyro_only=True,
    )
    assert status is IMUDeskewStatus.success
    np.testing.assert_allclose(out.to_numpy()["points"], world_pts, atol=5e-3)


def test_insufficient_coverage():
    cloud, imu, _, t0, dur = make_rotating_scan(1.0)
    short = [m for m in imu if m.timestamp < t0 + dur * 0.3]
    out, status = deskew_point_cloud_imu(
        cloud, short, t0, dur, np.eye(4, dtype=np.float32), np.zeros(3), np.zeros(3)
    )
    assert status is IMUDeskewStatus.insufficient_imu_coverage
    np.testing.assert_allclose(np.asarray(out.points), np.asarray(cloud.points))


def test_no_timestamps():
    cloud = PointCloud.from_numpy(RNG.normal(size=(10, 3)).astype(np.float32))
    _, status = deskew_point_cloud_imu(
        cloud, [], 0.0, 0.1, np.eye(4, dtype=np.float32), np.zeros(3), np.zeros(3)
    )
    assert status is IMUDeskewStatus.no_timestamps


def test_normals_rotated():
    cloud, imu, world_pts, t0, dur = make_rotating_scan(2.0, n=50)
    normals = np.tile([1.0, 0.0, 0.0], (50, 1)).astype(np.float32)
    t_off = np.asarray(cloud.timestamp_offsets)[:50]
    cloud = PointCloud.from_numpy(
        np.asarray(cloud.points)[:50], normals=normals, timestamp_offsets=t_off
    )
    out, status = deskew_point_cloud_imu(
        cloud, imu, t0, dur, np.eye(4, dtype=np.float32), np.zeros(3), np.zeros(3)
    )
    assert status is IMUDeskewStatus.success
    got = out.to_numpy()["normals"]
    # normal measured at time t must be rotated by R(t)
    for i in [10, 30, 49]:
        t = t_off[i] * 1e-3
        R = Rotation.from_rotvec([0, 0, 2.0 * t]).as_matrix()
        np.testing.assert_allclose(got[i], R @ normals[i], atol=2e-3)


def test_extrinsic_rotation():
    # IMU rotated 90 deg about z relative to LiDAR: gyro about IMU-z is still
    # rotation about LiDAR-z, deskew must still recover the scene.
    cloud, imu, world_pts, t0, dur = make_rotating_scan(2.0)
    T_il = np.eye(4, dtype=np.float32)
    T_il[:3, :3] = Rotation.from_rotvec([0, 0, np.pi / 2]).as_matrix()
    out, status = deskew_point_cloud_imu(
        cloud, imu, t0, dur, T_il, np.zeros(3), np.zeros(3), gyro_only=True
    )
    assert status is IMUDeskewStatus.success
    np.testing.assert_allclose(out.to_numpy()["points"], world_pts, atol=5e-3)
