"""FleetOdometry: B vmapped streams must track like independent pipelines,
preserve the zero-loss growth semantics fleet-wide, and produce identical
results when the stream axis is sharded over a device mesh."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sycl_points_tpu.parallel.fleet import FleetOdometry
from sycl_points_tpu.pipeline.lidar_odometry import ResultType
from sycl_points_tpu.points.point_cloud import PointCloud

from tests.test_lidar_odometry import make_world, scan_at, small_params


def _stream_trajectories(b, n):
    """Per-stream figure-step trajectories: each stream starts at a
    different yaw/offset so the fleet exercises independent states."""
    from sycl_points_tpu.utils import lie

    all_poses = []
    for s in range(b):
        yaw = 2.0 * np.pi * s / max(b, 1)
        c, si = np.cos(yaw), np.sin(yaw)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.array([[c, -si, 0], [si, c, 0], [0, 0, 1]], np.float32)
        T[0, 3] = 2.0 * s
        poses = []
        step = np.asarray(
            lie.se3_exp(jnp.asarray([0.0, 0.0, 0.03, 0.25, 0.05, 0.0], np.float32))
        )
        for _ in range(n):
            poses.append(T.copy())
            T = (T @ step).astype(np.float32)
        all_poses.append(poses)
    return all_poses  # [B][n] of [4,4]


def _stack_scans(world, poses_at_frame):
    pts = [scan_at(world, T) for T in poses_at_frame]
    cap = max(p.shape[0] for p in pts)
    clouds = [PointCloud.from_numpy(p, capacity=cap) for p in pts]
    return PointCloud(
        points=jnp.stack([c.points for c in clouds]),
        mask=jnp.stack([c.mask for c in clouds]),
    )


def _run_fleet(fleet, world, trajs, n_frames):
    b = len(trajs)
    for i in range(n_frames):
        clouds = _stack_scans(world, [trajs[s][i] for s in range(b)])
        fleet.process_batch(clouds, timestamps=0.1 * i)
    fleet.flush()


@pytest.mark.slow
def test_fleet_tracks_per_stream_trajectories():
    B, N = 3, 6
    world = make_world()
    trajs = _stream_trajectories(B, N)
    fleet = FleetOdometry(
        small_params(), n_streams=B,
        initial_poses=np.stack([t[0] for t in trajs]),
    )
    _run_fleet(fleet, world, trajs, N)

    for s in range(B):
        assert len(fleet.pose_log[s]) == N - 1
        assert all(rt is ResultType.success for _, rt in fleet.deferred_results[s])
        for j, (idx, _, T_est, _) in enumerate(fleet.pose_log[s]):
            assert idx == j + 1
            err = np.linalg.norm(T_est[:3, 3] - trajs[s][j + 1][:3, 3])
            assert err < 0.1, f"stream {s} frame {idx}: drift {err:.3f} m"
    assert (np.asarray(fleet.map_state.dropped) == 0).all()
    assert (fleet.budget_lost == 0).all()


@pytest.mark.slow
def test_fleet_growth_zero_loss():
    """A fleet started at a tiny shared capacity must grow (whole-fleet
    rollback+regrow) and end with the SAME per-stream voxel sets as a fleet
    that never needed to grow."""
    B, N = 2, 5
    world = make_world()
    trajs = _stream_trajectories(B, N)
    p_small = small_params()
    p_small = dataclasses.replace(
        p_small, submap=dataclasses.replace(p_small.submap, map_capacity=256)
    )
    p_big = small_params()  # 1<<14

    init = np.stack([t[0] for t in trajs])
    fleet_s = FleetOdometry(p_small, n_streams=B, initial_poses=init, seed=11)
    fleet_b = FleetOdometry(p_big, n_streams=B, initial_poses=init, seed=11)
    _run_fleet(fleet_s, world, trajs, N)
    _run_fleet(fleet_b, world, trajs, N)

    assert fleet_s.growth_events, "tiny fleet capacity never grew"
    assert fleet_s.map_capacity > 256
    used_s = np.asarray(fleet_s.map_state.used)
    used_b = np.asarray(fleet_b.map_state.used)
    for s in range(B):
        # same tolerance as the single-stream pipelined-vs-sync test: the
        # reconciled in-flight frames sampled against the pre-retry target
        # (documented one-frame staleness), so voxel SETS may differ
        # slightly — but the grown map must not LOSE coverage
        ns, nb = used_s[s].sum(), used_b[s].sum()
        assert abs(int(ns) - int(nb)) <= max(3, 0.02 * nb), (
            f"stream {s}: grown map diverged ({ns} vs {nb})"
        )
    # zero-loss retry: the committed chains never kept a dropping insert
    assert (np.asarray(fleet_s.map_state.dropped) == 0).all()
    assert (np.asarray(fleet_b.map_state.dropped) == 0).all()


@pytest.mark.slow
def test_fleet_sharded_matches_unsharded():
    """Stream-axis sharding over the 8-device CPU mesh must not change the
    result (GSPMD partitions an embarrassingly parallel batch)."""
    from sycl_points_tpu.parallel.sharded import make_mesh

    B, N = 8, 3
    world = make_world(n=1500)
    trajs = _stream_trajectories(B, N)
    init = np.stack([t[0] for t in trajs])

    mesh = make_mesh(8, axis="streams")
    f_plain = FleetOdometry(small_params(), n_streams=B, initial_poses=init, seed=3)
    f_shard = FleetOdometry(small_params(), n_streams=B, initial_poses=init,
                            seed=3, mesh=mesh)
    _run_fleet(f_plain, world, trajs, N)
    _run_fleet(f_shard, world, trajs, N)

    for s in range(B):
        for (i1, _, T1, r1), (i2, _, T2, r2) in zip(
            f_plain.pose_log[s], f_shard.pose_log[s]
        ):
            assert i1 == i2 and r1 is r2
            np.testing.assert_allclose(T1[:3, 3], T2[:3, 3], atol=5e-3)
            np.testing.assert_allclose(T1[:3, :3], T2[:3, :3], atol=2e-3)


@pytest.mark.slow
def test_fleet_precompile_growth_ladder():
    """Fleet growth-ladder warm start publishes the vmapped grow /
    insert-retry / submap-step programs per capacity; growth then consumes
    the published jits (identity check) with state/config in lockstep."""
    B, N = 2, 3
    world = make_world(n=1500)
    trajs = _stream_trajectories(B, N)
    params = small_params()
    params = dataclasses.replace(
        params, submap=dataclasses.replace(params.submap, map_capacity=1024)
    )
    fleet = FleetOdometry(
        params, n_streams=B, initial_poses=np.stack([t[0] for t in trajs])
    )
    for i in range(2):
        clouds = _stack_scans(world, [trajs[s][i] for s in range(B)])
        fleet.process_batch(clouds, timestamps=0.1 * i)

    cap0 = fleet.map_capacity
    steps = fleet.precompile_growth(max_capacity=cap0 * 4)
    assert steps == 2
    assert set(fleet._grow_jits) >= {cap0, cap0 * 2}
    assert set(fleet._ie_jits) >= {cap0 * 2, cap0 * 4}
    assert set(fleet._submap_jits) >= {cap0 * 2, cap0 * 4}

    grow_fn = fleet._grow_jits[cap0]
    fleet._grow_fleet()
    assert fleet.map_capacity == cap0 * 2
    assert fleet.map_state.used.shape == (B, cap0 * 2)
    assert fleet._grow_jits[cap0] is grow_fn

    clouds = _stack_scans(world, [trajs[s][2] for s in range(B)])
    fleet.process_batch(clouds, timestamps=0.2)
    fleet.flush()
    assert (np.asarray(fleet.map_state.dropped) == 0).all()


@pytest.mark.slow
def test_fleet_lio_tracks_streams():
    """FleetLIO: B 15-DOF streams with independent IMU windows and start
    poses must each track their constant-velocity ground truth."""
    from sycl_points_tpu.imu.preintegration import IMUMeasurement
    from sycl_points_tpu.parallel.fleet import FleetLIO
    from sycl_points_tpu.pipeline.lidar_inertial_odometry import (
        ResultType as LIOResult,
    )
    from tests.test_lidar_inertial_odometry import G, lio_params, make_world, scan_at

    world = make_world()
    B, n_frames, frame_dt = 2, 5, 0.1
    vels = [np.array([2.0, 0.0, 0.0], np.float32),
            np.array([0.0, 1.5, 0.0], np.float32)]
    starts = [np.zeros(3, np.float32), np.array([0.0, 3.0, 0.0], np.float32)]

    def T_at(s, t):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = starts[s] + vels[s] * t
        return T

    init = np.stack([T_at(s, 0.0) for s in range(B)])
    fleet = FleetLIO(lio_params(), n_streams=B, initial_poses=init)
    for s in range(B):
        for t in np.arange(-0.2, n_frames * frame_dt + 0.01, 1.0 / 200):
            fleet.add_imu_measurement(s, IMUMeasurement(
                timestamp=10.0 + t, gyro=np.zeros(3, np.float32),
                accel=np.array([0, 0, G], np.float32),
            ))
    for i in range(n_frames):
        clouds = _stack_scans(
            world, [T_at(s, i * frame_dt) for s in range(B)]
        )
        fleet.process_batch(clouds, timestamps=10.0 + i * frame_dt)
    fleet.flush()

    for s in range(B):
        assert len(fleet.pose_log[s]) == n_frames - 1
        assert all(
            rt is LIOResult.success for _, rt in fleet.deferred_results[s]
        )
        T_est = fleet.get_odometry(s)
        T_true = T_at(s, (n_frames - 1) * frame_dt)
        err = np.linalg.norm(T_est[:3, 3] - T_true[:3, 3])
        assert err < 0.15, f"stream {s}: drift {err:.3f} m"
    assert (np.asarray(fleet.map_state.dropped) == 0).all()
    assert np.all(np.isfinite(fleet.gyro_bias_np))
    assert np.all(np.isfinite(fleet.velocity_np))


@pytest.mark.slow
def test_fleet_lio_per_stream_imu_only():
    """One stream's too-small frame must resolve as imu_only (propagated)
    while the other stream keeps registering — per-stream result types."""
    from sycl_points_tpu.imu.preintegration import IMUMeasurement
    from sycl_points_tpu.parallel.fleet import FleetLIO
    from sycl_points_tpu.pipeline.lidar_inertial_odometry import (
        ResultType as LIOResult,
    )
    from tests.test_lidar_inertial_odometry import G, lio_params, make_world, scan_at

    world = make_world(1000)
    B = 2
    fleet = FleetLIO(lio_params(), n_streams=B)
    rng = np.random.default_rng(0)
    for s in range(B):
        for t in np.arange(-0.2, 0.5, 1.0 / 200):
            fleet.add_imu_measurement(s, IMUMeasurement(
                timestamp=10.0 + t, gyro=np.zeros(3, np.float32),
                accel=np.array([0, 0, G], np.float32),
            ))
    T0 = np.eye(4, dtype=np.float32)
    fleet.process_batch(_stack_scans(world, [T0, T0]), timestamps=10.0)

    # stream 1 gets a degenerate 8-point frame, stream 0 a real scan
    good = scan_at(world, T0)
    tiny = np.full((good.shape[0], 3), 1e6, np.float32)
    tiny[:8] = rng.normal(size=(8, 3)).astype(np.float32) * 3
    clouds = PointCloud(
        points=jnp.stack([
            jnp.asarray(good),
            jnp.asarray(tiny),
        ]),
        mask=jnp.stack([
            jnp.ones(good.shape[0], bool),
            jnp.concatenate([jnp.ones(8, bool), jnp.zeros(good.shape[0] - 8, bool)]),
        ]),
    )
    fleet.process_batch(clouds, timestamps=10.1)
    fleet.flush()
    assert fleet.deferred_results[0][-1][1] is LIOResult.success
    assert fleet.deferred_results[1][-1][1] is LIOResult.imu_only
    assert np.all(np.isfinite(fleet.get_odometry(1)))
