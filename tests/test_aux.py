"""Auxiliary subsystems: checkpoint/resume, covariance markers, device
helper, grid-KNN point removal."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sycl_points_tpu.ops.grid_knn import GridKNN
from sycl_points_tpu.points.point_cloud import PointCloud
from sycl_points_tpu.utils.device import device_info, select_device

RNG = np.random.default_rng(42)


def test_select_device():
    d = select_device()
    assert d.platform == "cpu"
    info = device_info(d)
    assert info["platform"] == "cpu"


def test_grid_knn_remove_points():
    pts = RNG.uniform(-5, 5, size=(500, 3)).astype(np.float32)
    cloud = PointCloud.from_numpy(pts)
    grid = GridKNN.build(cloud, cell_size=3.0)
    res0 = grid.search(cloud.points[:50], 1)
    keep = jnp.asarray(np.arange(cloud.capacity) % 2 == 0)
    grid2 = grid.remove_points(keep)
    res1 = grid2.search(cloud.points[:50], 1)
    hit = np.asarray(res1.indices[:, 0])
    finite = np.isfinite(np.asarray(res1.distances[:, 0]))
    assert np.all(hit[finite] % 2 == 0)


def test_covariance_markers(tmp_path):
    from sycl_points_tpu.apps.covariance_markers import write_ellipsoid_ply
    from sycl_points_tpu.ops.covariance import estimate_covariances
    from sycl_points_tpu.ops.knn import brute_force_knn

    pts = RNG.normal(size=(100, 3)).astype(np.float32)
    cloud = PointCloud.from_numpy(pts)
    knn = brute_force_knn(cloud.points, cloud.mask, cloud.points, 10)
    cloud = cloud.replace(covs=estimate_covariances(cloud.points, knn))
    out = str(tmp_path / "markers.ply")
    write_ellipsoid_ply(out, cloud, max_markers=10)
    head = open(out, "rb").read(200).decode("ascii", errors="replace")
    assert "element face" in head


@pytest.mark.slow
def test_checkpoint_resume(tmp_path):
    from sycl_points_tpu.pipeline.checkpoint import load_checkpoint, save_checkpoint
    from sycl_points_tpu.pipeline.lidar_odometry import LidarOdometry, ResultType
    from tests.test_lidar_odometry import make_world, scan_at, small_params

    world = make_world(2000)
    params = small_params()
    lo = LidarOdometry(params)
    for i in range(3):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 0.2 * i
        r = lo.process(PointCloud.from_numpy(scan_at(world, T)), 0.1 * i)
    ckpt = str(tmp_path / "state.npz")
    save_checkpoint(ckpt, lo)

    lo2 = LidarOdometry(params)
    load_checkpoint(ckpt, lo2)
    np.testing.assert_allclose(lo2.get_odometry(), lo.get_odometry())
    assert len(lo2.get_keyframe_poses()) == len(lo.get_keyframe_poses())

    # both continue identically-shaped processing
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = 0.6
    scan = PointCloud.from_numpy(scan_at(world, T))
    r1 = lo.process(scan, 0.3)
    r2 = lo2.process(scan, 0.3)
    assert r1 is ResultType.success and r2 is ResultType.success
    np.testing.assert_allclose(lo2.get_odometry(), lo.get_odometry(), atol=0.02)


@pytest.mark.slow
def test_checkpoint_resume_pipelined(tmp_path):
    """Pipelined pipelines checkpoint via their host mirrors: save drains
    the in-flight window, resume into EITHER the sync or the pipelined
    class rebuilds the device carry on the next frame."""
    from sycl_points_tpu.pipeline.checkpoint import load_checkpoint, save_checkpoint
    from sycl_points_tpu.pipeline.lidar_odometry import LidarOdometry, ResultType
    from sycl_points_tpu.pipeline.pipelined_odometry import PipelinedLidarOdometry
    from tests.test_lidar_odometry import make_world, scan_at, small_params

    world = make_world(2000)
    params = small_params()
    pl = PipelinedLidarOdometry(params)
    for i in range(3):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 0.2 * i
        pl.process(PointCloud.from_numpy(scan_at(world, T)), 0.1 * i)
    ckpt = str(tmp_path / "state_pl.npz")
    save_checkpoint(ckpt, pl)  # flushes the in-flight window itself
    assert not pl._pending

    # resume into a fresh pipelined instance AND into the sync class
    pl2 = PipelinedLidarOdometry(params)
    load_checkpoint(ckpt, pl2)
    lo2 = LidarOdometry(params)
    load_checkpoint(ckpt, lo2)
    np.testing.assert_allclose(pl2.odom, pl.odom)
    np.testing.assert_allclose(lo2.odom, pl.odom)

    T = np.eye(4, dtype=np.float32)
    T[0, 3] = 0.6
    scan = PointCloud.from_numpy(scan_at(world, T))
    r_sync = lo2.process(scan, 0.3)
    pl2.process(scan, 0.3)
    pl2.flush()
    assert r_sync is ResultType.success
    assert pl2.deferred_results[-1][1] is ResultType.success
    # both resumed pipelines agree on the continued pose
    np.testing.assert_allclose(pl2.odom, lo2.odom, atol=0.02)
