"""PipelinedLidarInertialOdometry: the deep-pipelined 15-DOF pipeline must
match the synchronous LIO trajectory and report deferred outcomes."""

import numpy as np
import pytest

import jax.numpy as jnp

from sycl_points_tpu.imu.preintegration import IMUMeasurement
from sycl_points_tpu.pipeline.lidar_inertial_odometry import (
    LidarInertialOdometry,
    ResultType,
)
from sycl_points_tpu.pipeline.pipelined_lio import PipelinedLidarInertialOdometry
from sycl_points_tpu.points.point_cloud import PointCloud
from sycl_points_tpu.utils import lie

from tests.test_lidar_inertial_odometry import G, RNG, lio_params, make_world, scan_at


def _feed_imu(odo, n_frames, frame_dt):
    for t in np.arange(-0.2, n_frames * frame_dt + 0.01, 1.0 / 200):
        odo.add_imu_measurement(
            IMUMeasurement(timestamp=10.0 + t, gyro=np.zeros(3, np.float32),
                           accel=np.array([0, 0, G], np.float32))
        )


@pytest.mark.slow
def test_pipelined_lio_matches_sync():
    world = make_world()
    v = np.array([2.0, 0.0, 0.0], np.float32)
    frame_dt = 0.1
    n_frames = 6

    def T_at(t):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = v * t
        return T

    def run(odo):
        _feed_imu(odo, n_frames, frame_dt)
        results, est = [], []
        for i in range(n_frames):
            cloud = PointCloud.from_numpy(scan_at(world, T_at(i * frame_dt)))
            results.append(odo.process(cloud, 10.0 + i * frame_dt))
            est.append(odo.get_odometry())
        if hasattr(odo, "flush"):
            odo.flush()
        return results, est

    sync = LidarInertialOdometry(lio_params())
    rs, es = run(sync)
    assert all(r in (ResultType.first_frame, ResultType.success) for r in rs)

    pl = PipelinedLidarInertialOdometry(lio_params())
    rp, _ = run(pl)
    assert rp[0] is ResultType.first_frame
    assert all(r is ResultType.success for r in rp[1:])
    assert [rt for _, rt in pl.deferred_results] == [ResultType.success] * (n_frames - 1)

    # identical inputs, identical device math -> same trajectory to fp noise
    for j, (idx, _, T_pl, _) in enumerate(pl.pose_log):
        assert idx == j
        np.testing.assert_allclose(T_pl[:3, 3], es[j + 1][:3, 3], atol=0.02)
    T_true = T_at((n_frames - 1) * frame_dt)
    err = np.asarray(lie.se3_log(
        jnp.asarray(np.linalg.inv(T_true) @ pl.get_odometry(), jnp.float32)
    ))
    assert np.linalg.norm(err[3:]) < 0.15, f"translation drift {err}"
    assert len(pl.submap.keyframe_poses) == len(sync.submap.keyframe_poses)
    assert int(pl.submap.map_state.dropped) == 0


def test_pipelined_lio_imu_only_deferred():
    odo = PipelinedLidarInertialOdometry(lio_params())
    world = make_world(1000)
    for t in np.arange(-0.2, 0.5, 1.0 / 200):
        odo.add_imu_measurement(
            IMUMeasurement(timestamp=10.0 + t, gyro=np.zeros(3, np.float32),
                           accel=np.array([0, 0, G], np.float32))
        )
    c0 = PointCloud.from_numpy(scan_at(world, np.eye(4)))
    assert odo.process(c0, 10.0) is ResultType.first_frame
    tiny = PointCloud.from_numpy(RNG.normal(size=(8, 3)).astype(np.float32) * 3)
    assert odo.process(tiny, 10.1) is ResultType.success  # optimistic
    odo.flush()
    assert odo.deferred_results[-1][1] is ResultType.imu_only
    assert np.all(np.isfinite(odo.get_odometry()))


def test_pipelined_lio_rejects_host_deskew():
    import dataclasses

    p = lio_params()
    p = dataclasses.replace(
        p, imu=dataclasses.replace(
            p.imu, deskew=dataclasses.replace(p.imu.deskew, enable=True)
        )
    )
    with pytest.raises(ValueError):
        PipelinedLidarInertialOdometry(p)
