"""Geometry sanity for the synthetic Velodyne benchmark generator."""

import sys
import os

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "benchmarks")
)

from synthetic_velodyne import World, figure8_trajectory, hdl64_dirs, scan_at


def test_rays_unit_and_pattern():
    d = hdl64_dirs(n_az=64, n_rings=8)
    assert d.shape == (64 * 8, 3)
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)


def test_scan_hits_world_surfaces():
    w = World()
    T = np.eye(4)
    T[:3, 3] = [0, 0, 1.8]
    pts = scan_at(w, T, n_az=256, n_rings=16, seed=0)
    assert len(pts) > 1000
    r = np.linalg.norm(pts, axis=1)
    assert r.min() > 1.0 and r.max() < 80.0
    # sensor-frame ground points sit near z = -1.8 (sensor height)
    ground = pts[pts[:, 2] < -1.0]
    assert len(ground) > 100
    assert abs(np.median(ground[:, 2]) + 1.8) < 0.3
    # wall hits: horizontal rays reach ~wall radius
    far = r > 45.0
    assert far.sum() > 10


def test_scans_consistent_across_poses():
    """Two scans of the same world from nearby poses must overlap: points
    from scan B, mapped through the relative pose, land near scan A points."""
    w = World()
    poses = figure8_trajectory(2, speed=0.5)
    a = scan_at(w, poses[0], n_az=256, n_rings=16, seed=0)
    b = scan_at(w, poses[1], n_az=256, n_rings=16, seed=1)
    b_world = b @ poses[1][:3, :3].T + poses[1][:3, 3]
    a_world = a @ poses[0][:3, :3].T + poses[0][:3, 3]
    # subsample for the weak host CPU
    sel = np.random.default_rng(0).permutation(len(b_world))[:300]
    d = np.linalg.norm(b_world[sel][:, None, :] - a_world[None, :: 7, :], axis=2)
    nn = d.min(axis=1)
    assert np.median(nn) < 0.5


def test_figure8_imu_consistent_with_trajectory():
    """Preintegrating the analytic IMU between frames must reproduce the
    frame-to-frame relative pose of figure8_trajectory (validates the
    gyro/specific-force conventions used by the LIO replay)."""
    import numpy as np
    from synthetic_velodyne import figure8_imu, figure8_trajectory
    from sycl_points_tpu.imu.preintegration import (
        IMUMeasurement, IMUPreintegration, IMUPreintegrationParams,
    )

    poses = figure8_trajectory(12)
    frame_dt, hz = 0.1, 400
    pre = IMUPreintegration(IMUPreintegrationParams())
    zeros = np.zeros(3, np.float32)
    for i in (0, 5, 10):
        t0 = frame_dt * i
        # true world velocity at t0 (analytic)
        s_dot = 0.35 / (frame_dt * 18.0)
        s = t0 * s_dot
        v0 = np.array([18.0 * np.cos(s) * s_dot, 18.0 * np.cos(2 * s) * s_dot, 0.0])
        pre.reset(zeros, zeros, R_world_body=poses[i][:3, :3].astype(np.float32))
        meas = []
        for k in range(hz + 1):
            t = t0 + frame_dt * k / hz
            g, a = figure8_imu(t)
            meas.append(IMUMeasurement(timestamp=t, gyro=g.astype(np.float32),
                                       accel=a.astype(np.float32)))
        pre.integrate_batch(meas)
        T_rel = np.asarray(pre.predict_relative_transform(
            poses[i][:3, :3].astype(np.float32), v0.astype(np.float32),
            zeros, zeros,
        ))
        T_true = np.linalg.inv(poses[i]) @ poses[i + 1]
        assert np.linalg.norm(T_rel[:3, 3] - T_true[:3, 3]) < 2e-3, (i, T_rel, T_true)
        assert np.linalg.norm(T_rel[:3, :3] - T_true[:3, :3]) < 2e-3


def test_figure8_3d_imu_consistency():
    """figure8_imu_3d must integrate back to figure8_pose_3d (midpoint,
    400 Hz, 2 s) — the pose/IMU consistency the bias-observability replay
    depends on."""
    from synthetic_velodyne import figure8_imu_3d, figure8_pose_3d, figure8_velocity

    g = np.array([0.0, 0.0, -9.80665])
    dt = 1.0 / 400
    T = figure8_pose_3d(0.0, speed=0.7)
    R, p = T[:3, :3].copy(), T[:3, 3].copy()
    v = figure8_velocity(0.0, speed=0.7, excite3d=True)
    for k in range(800):
        t0, t1 = k * dt, (k + 1) * dt
        w0, a0 = figure8_imu_3d(t0, speed=0.7)
        w1, a1 = figure8_imu_3d(t1, speed=0.7)
        w = 0.5 * (w0 + w1)
        a = 0.5 * (a0 + a1)
        th = np.linalg.norm(w * dt)
        K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]]) * dt
        Rstep = np.eye(3) + np.sin(th) / max(th, 1e-12) * K + (1 - np.cos(th)) / max(th, 1e-12) ** 2 * (K @ K)
        Rhalf = np.eye(3) + np.sin(th / 2) / max(th, 1e-12) * K + (1 - np.cos(th / 2)) / max(th / 2, 1e-12) ** 2 * 0.25 * (K @ K)
        a_w = (R @ Rhalf) @ a + g
        p = p + v * dt + 0.5 * a_w * dt * dt
        v = v + a_w * dt
        R = R @ Rstep
    T_end = figure8_pose_3d(800 * dt, speed=0.7)
    assert np.linalg.norm(p - T_end[:3, 3]) < 0.05, p - T_end[:3, 3]
    assert np.linalg.norm(R - T_end[:3, :3]) < 0.02


def test_figure8_3d_trajectory_excites_attitude():
    from synthetic_velodyne import figure8_trajectory

    poses = figure8_trajectory(60, excite3d=True)
    rolls = [np.arctan2(T[2, 1], T[2, 2]) for T in poses]
    zs = [T[2, 3] for T in poses]
    assert max(rolls) - min(rolls) > 0.15  # real roll excitation
    assert max(zs) - min(zs) > 0.5  # z-bobbing
