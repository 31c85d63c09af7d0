"""PipelinedLidarOdometry: deferred-fetch pipeline must match the
synchronous pipeline's trajectory and map, and handle the small-frame and
growth slow paths one frame late without losing anything."""

import numpy as np
import pytest

from sycl_points_tpu.pipeline.lidar_odometry import LidarOdometry, ResultType
from sycl_points_tpu.pipeline.pipelined_odometry import PipelinedLidarOdometry
from sycl_points_tpu.points.point_cloud import PointCloud

from tests.test_lidar_odometry import make_world, scan_at, small_params


def _trajectory(n=8):
    import jax.numpy as jnp
    from sycl_points_tpu.utils import lie

    poses = []
    T = np.eye(4, dtype=np.float32)
    for _ in range(n):
        poses.append(T.copy())
        step = np.asarray(
            lie.se3_exp(jnp.asarray([0.0, 0.0, 0.03, 0.25, 0.05, 0.0], np.float32))
        )
        T = (T @ step).astype(np.float32)
    return poses


def _run(odo, world, poses, skip_small=None):
    results = []
    for i, T_true in enumerate(poses):
        if skip_small is not None and i == skip_small:
            pts = np.zeros((4, 3), np.float32)  # below min_num_points
        else:
            pts = scan_at(world, T_true)
        r = odo.process(PointCloud.from_numpy(pts), timestamp=0.1 * i)
        results.append(r)
    if hasattr(odo, "flush"):
        odo.flush()
    return results


@pytest.mark.slow
def test_pipelined_matches_sync():
    world = make_world()
    poses = _trajectory(8)

    sync = LidarOdometry(small_params())
    sync_est = []
    for i, T_true in enumerate(poses):
        r = sync.process(PointCloud.from_numpy(scan_at(world, T_true)), timestamp=0.1 * i)
        assert r in (ResultType.success, ResultType.first_frame)
        sync_est.append(sync.get_odometry())

    pl = PipelinedLidarOdometry(small_params())
    res = _run(pl, world, poses)
    assert res[0] is ResultType.first_frame
    assert all(r is ResultType.success for r in res[1:])
    # authoritative per-frame outcomes arrive deferred
    assert [rt for _, rt in pl.deferred_results] == [ResultType.success] * 7
    assert len(pl.pose_log) == 7

    # same trajectory within motion-predictor f32-vs-f64 noise (the device
    # predictor only perturbs the ICP *initial guess*).  pose_log entry j
    # is the (j+1)-th process call (the bootstrap frame is not logged).
    for j, (idx, _, T_pl, _) in enumerate(pl.pose_log):
        assert idx == j
        T_sync, T_true = sync_est[j + 1], poses[j + 1]
        np.testing.assert_allclose(T_pl[:3, 3], T_sync[:3, 3], atol=0.02)
        np.testing.assert_allclose(T_pl[:3, :3], T_sync[:3, :3], atol=0.01)
        err = np.linalg.norm(T_pl[:3, 3] - T_true[:3, 3])
        assert err < 0.1, f"frame {idx}: drift {err:.3f} m"

    # same keyframe policy and map occupancy
    assert len(pl.get_keyframe_poses()) == len(sync.get_keyframe_poses())
    vox_pl = int(np.asarray(pl.submap.map_state.used).sum())
    vox_sync = int(np.asarray(sync.submap.map_state.used).sum())
    assert abs(vox_pl - vox_sync) <= max(3, 0.02 * vox_sync)
    assert int(pl.submap.map_state.dropped) == 0


@pytest.mark.slow
def test_pipelined_small_frame_holds_pose():
    world = make_world()
    poses = _trajectory(6)
    pl = PipelinedLidarOdometry(small_params())
    _run(pl, world, poses, skip_small=3)
    # process call i logs as frame_index i-1 (bootstrap is not logged)
    kinds = {i: rt for i, _, _, rt in pl.pose_log}
    assert kinds[2] is ResultType.small_number_of_points
    assert kinds[1] is ResultType.success and kinds[3] is ResultType.success
    # the small frame must not move the pose
    T_before = next(T for i, _, T, _ in pl.pose_log if i == 1)
    T_small = next(T for i, _, T, _ in pl.pose_log if i == 2)
    np.testing.assert_array_equal(T_before, T_small)
    # and the stream recovers afterwards
    T_last = next(T for i, _, T, _ in pl.pose_log if i == 4)
    assert np.linalg.norm(T_last[:3, 3] - poses[5][:3, 3]) < 0.1


@pytest.mark.slow
def test_pipelined_growth_zero_loss():
    import dataclasses

    world = make_world()
    poses = _trajectory(8)
    p = small_params()
    p = dataclasses.replace(
        p, submap=dataclasses.replace(p.submap, map_capacity=256)
    )
    # max_in_flight=2 forces the drop to be detected while later frames
    # are in flight, exercising the multi-frame reconcile (rollback +
    # grow-retry + re-apply of the stashed later inserts)
    pl = PipelinedLidarOdometry(p, max_in_flight=2)
    res = _run(pl, world, poses)
    assert all(r in (ResultType.success, ResultType.first_frame) for r in res)
    assert pl.submap.map_capacity > 256  # growth fired (frames late)
    assert int(pl.submap.map_state.dropped) == 0
    # trajectory survives the growth slow path
    T_last = pl.pose_log[-1][2]
    assert np.linalg.norm(T_last[:3, 3] - poses[-1][:3, 3]) < 0.15


def test_pipelined_rejects_imu():
    import dataclasses

    p = small_params()
    p = dataclasses.replace(p, imu=dataclasses.replace(p.imu, enable=True))
    with pytest.raises(ValueError):
        PipelinedLidarOdometry(p)


@pytest.mark.slow
def test_growth_precompile_swaps_in_prebuilt(monkeypatch):
    import time as _time

    from sycl_points_tpu.pipeline import fused_submap

    # the background precompile is load-gated (idle maps must not pay
    # speculative compiles); force it on for this test (both gates — this
    # map's capacity is below the default, so the SMALL gate applies)
    monkeypatch.setattr(fused_submap, "GROWTH_PRECOMPILE_LOAD_GATE", 0.0)
    monkeypatch.setattr(fused_submap, "GROWTH_PRECOMPILE_LOAD_GATE_SMALL", 0.0)

    world = make_world()
    poses = _trajectory(5)
    pl = PipelinedLidarOdometry(small_params())
    _run(pl, world, poses[:4])
    # the dispatch-time load mirror is only set once a frame has RESOLVED:
    # one more frame after the flush carries it and schedules the precompile
    pts = scan_at(world, poses[4])
    r = pl.process(PointCloud.from_numpy(pts), timestamp=0.4)
    assert r is ResultType.success

    # the background thread publishes the next capacity's compiled program
    # (keyed by (map capacity, extract tier))
    next_cap = pl.submap.map_capacity * 2
    next_key = (next_cap, pl.submap.extract_tier_for(next_cap))
    deadline = _time.time() + 120
    while _time.time() < deadline:
        if next_key in getattr(pl, "_prebuilt_submap", {}):
            break
        _time.sleep(0.5)
    assert next_key in pl._prebuilt_submap, "precompile never landed"

    # growth must swap in the prebuilt jit, and the pipeline keeps working
    pl.submap._grow_map()
    pl._build_submap_step()
    assert pl._submap_step_jit is pl._prebuilt_submap[next_key]
    more = _trajectory(7)[5:]
    for j, T_true in enumerate(more):
        pts = scan_at(world, T_true)
        r = pl.process(PointCloud.from_numpy(pts), timestamp=0.1 * (5 + j))
        assert r is ResultType.success
    pl.flush()
    assert int(pl.submap.map_state.dropped) == 0


def test_reconcile_chain_matches_sequential_retry():
    """The fused reapply-chain program (one jit per grow attempt) must land
    the same map contents, zero loss, and the same telemetry as the
    sequential per-frame retry loop it replaces."""
    import dataclasses

    import jax.numpy as jnp

    from sycl_points_tpu.mapping import voxel_hash_map as vhm
    from sycl_points_tpu.pipeline.submap import Submap

    p = small_params()
    p = dataclasses.replace(
        p, submap=dataclasses.replace(p.submap, map_capacity=128)
    )
    sm_seq, sm_chain = Submap(p), Submap(p)

    rng = np.random.default_rng(99)
    clouds, poses = [], []
    for i in range(3):
        # ~600 distinct voxels per insert: guarantees probe-exhaustion drops
        # at capacity 128 so the grow-retry machinery actually fires
        pts = rng.uniform(-40, 40, size=(600, 3)).astype(np.float32)
        clouds.append(PointCloud.from_numpy(pts, capacity=1024))
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 0.5 * i
        poses.append(T)

    # sequential reference path (same call pattern the old reconcile used)
    sm_seq.retry_insert_after_drop(clouds[0], poses[0])
    for cl, T in zip(clouds[1:], poses[1:]):
        sm_seq.retry_insert_after_drop(cl, T, grow_first=False)

    # fused chain path (padded window larger than the real frame count)
    sm_chain.reconcile_chain(
        clouds, [jnp.asarray(T) for T in poses], window=6
    )

    # zero loss on both paths
    assert int(sm_seq.map_state.dropped) == 0
    assert int(sm_chain.map_state.dropped) == 0
    assert int(sm_chain.map_state.budget_lost) == int(
        sm_seq.map_state.budget_lost
    )
    assert float(jnp.sum(sm_seq.map_state.count)) == 3 * 600
    assert float(jnp.sum(sm_chain.map_state.count)) == 3 * 600
    assert sm_chain.map_capacity >= 512  # growth fired

    # identical map contents (hash layouts may differ with capacity history)
    def contents(sm):
        cloud, _ = vhm.extract(
            sm.map_state, sm.map_config, jnp.zeros(3), 1e6,
            out_capacity=1 << 12, with_covs=False, with_overflow=True,
        )
        pts = np.asarray(cloud.points)[np.asarray(cloud.mask)]
        return pts[np.lexsort(pts.T)]

    c_seq, c_chain = contents(sm_seq), contents(sm_chain)
    assert c_seq.shape == c_chain.shape
    np.testing.assert_allclose(c_seq, c_chain, atol=1e-5)

    # the chain refreshed the submap target cloud like the sequential path
    assert sm_chain.submap_cloud is not None
    assert int(sm_chain.submap_cloud.count()) > 0
