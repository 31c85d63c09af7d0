"""Conversion utilities, enhanced reflectivity, timing, preprocess facade."""

import numpy as np
import pytest

import jax.numpy as jnp

from sycl_points_tpu.ops.preprocess_filter import PreprocessFilter
from sycl_points_tpu.points.conversion import (
    EnhancedReflectivityCorrector,
    from_pointcloud2_bytes,
    read_kitti_bin,
    to_structured_array,
)
from sycl_points_tpu.points.point_cloud import PointCloud
from sycl_points_tpu.utils.timing import StageTimer, measure_execution

RNG = np.random.default_rng(19)


def test_pointcloud2_roundtrip():
    n = 50
    pts = RNG.normal(size=(n, 3)).astype(np.float32) * 5
    inten = RNG.uniform(size=n).astype(np.float32)
    rec = to_structured_array({"points": pts, "intensities": inten})
    fields = [("x", 0, 7), ("y", 4, 7), ("z", 8, 7), ("intensity", 12, 7)]
    out = from_pointcloud2_bytes(rec.tobytes(), fields, rec.dtype.itemsize)
    np.testing.assert_allclose(out["points"], pts)
    np.testing.assert_allclose(out["intensities"], inten)


def test_pointcloud2_unaligned_ring_ambient():
    n = 16
    rec = np.zeros(n, dtype=np.dtype(
        {"names": ["x", "y", "z", "intensity", "ring", "ambient"],
         "formats": [np.float32, np.float32, np.float32, np.float32, np.uint16, np.uint16],
         "offsets": [0, 4, 8, 12, 17, 19],  # unaligned on purpose
         "itemsize": 24}))
    rec["x"] = np.arange(n)
    rec["ring"] = np.arange(n) % 4
    rec["ambient"] = 100
    fields = [("x", 0, 7), ("y", 4, 7), ("z", 8, 7), ("intensity", 12, 7),
              ("ring", 17, 4), ("ambient", 19, 4)]
    out = from_pointcloud2_bytes(rec.tobytes(), fields, 24)
    np.testing.assert_array_equal(out["ring"], np.arange(n) % 4)
    np.testing.assert_array_equal(out["ambient"], 100.0)


def test_kitti_bin(tmp_path):
    raw = RNG.normal(size=(100, 4)).astype(np.float32)
    p = tmp_path / "000000.bin"
    raw.tofile(p)
    out = read_kitti_bin(str(p))
    np.testing.assert_allclose(out["points"], raw[:, :3])
    np.testing.assert_allclose(out["intensities"], raw[:, 3])


def test_enhanced_reflectivity():
    n = 200
    pts = RNG.uniform(1, 10, size=(n, 3)).astype(np.float32)
    inten = RNG.uniform(0.1, 1.0, size=n).astype(np.float32)
    ring = (np.arange(n) % 8).astype(np.uint16)
    ambient = RNG.uniform(10, 100, size=n).astype(np.float32)
    corr = EnhancedReflectivityCorrector(ema_alpha=0.5)
    out1 = corr.apply(pts, inten, ring, ambient, clip_max=5.0)
    assert out1.shape == (n,)
    assert np.all((out1 >= 0) & (out1 <= 5.0))
    # normalized: per-ring mean of (ref_n + amb_n) ~ 2 on first application
    assert 1.0 < out1.mean() < 3.0
    # EMA state persists across frames
    out2 = corr.apply(pts, inten, ring, ambient)
    np.testing.assert_allclose(out2, out1, rtol=0.3)


def test_stage_timer():
    t = StageTimer()
    r, us = measure_execution(lambda: jnp.sum(jnp.ones(10)))
    assert float(r) == 10.0 and us > 0
    t.measure("a", lambda: 1 + 1)
    t.measure("a", lambda: 2 + 2)
    assert t.count["a"] == 2
    assert "TOTAL" in t.report()


def test_preprocess_filter_facade():
    pf = PreprocessFilter(seed=7)
    pts = RNG.normal(size=(300, 3)).astype(np.float32) * 10
    c = PointCloud.from_numpy(pts)
    boxed = pf.box_filter(c, 0.5, 15.0)
    assert int(boxed.count()) < 300
    samp = pf.random_sampling(c, 50)
    assert samp.capacity == 50 and int(samp.count()) == 50
    w = jnp.ones(c.capacity)
    ws = pf.weighted_random_sampling(c, w, 40)
    assert int(ws.count()) == 40
    ms = pf.mixed_random_sampling(c, w, 40)
    assert int(ms.count()) == 40
    fps = pf.farthest_point_sampling(c, 10)
    assert int(fps.count()) == 10


def test_kitti_runner_smoke(tmp_path):
    """End-to-end: 3 tiny synthetic KITTI frames through the CLI main()."""
    from sycl_points_tpu.apps.kitti_odometry import main

    world = RNG.uniform(-10, 10, size=(3000, 3)).astype(np.float32)
    world[:, 2] *= 0.2
    vel = tmp_path / "velodyne"
    vel.mkdir()
    for i in range(3):
        shift = np.array([0.2 * i, 0, 0], np.float32)
        pts = (world - shift).astype(np.float32)
        raw = np.concatenate([pts, RNG.uniform(size=(len(pts), 1)).astype(np.float32)], 1)
        raw.tofile(vel / f"{i:06d}.bin")
    out = tmp_path / "traj.tum"
    rc = main([str(vel), "--out", str(out), "--max-frames", "3"])
    assert rc == 0
    traj = np.loadtxt(out)
    assert traj.shape == (3, 8)
    # moved forward ~0.4 m over 3 frames
    assert 0.1 < traj[-1, 1] < 0.7


def test_pointcloud2_round_trip():
    from sycl_points_tpu.points.conversion import (
        from_pointcloud2_bytes, to_pointcloud2_bytes,
    )

    rng = np.random.default_rng(9)
    cloud = {
        "points": rng.normal(size=(50, 3)).astype(np.float32),
        "intensities": rng.uniform(0, 255, size=50).astype(np.float32),
        "timestamp_offsets": np.linspace(0, 90, 50).astype(np.float32),
        "rgb": np.concatenate(
            [rng.uniform(size=(50, 3)).astype(np.float32), np.ones((50, 1), np.float32)], 1
        ),
    }
    data, fields, step = to_pointcloud2_bytes(cloud)
    back = from_pointcloud2_bytes(data, fields, step)
    np.testing.assert_allclose(back["points"], cloud["points"])
    np.testing.assert_allclose(back["intensities"], cloud["intensities"])
    np.testing.assert_allclose(
        back["timestamp_offsets"], cloud["timestamp_offsets"], atol=1e-4
    )
    np.testing.assert_allclose(back["rgb"][:, :3], cloud["rgb"][:, :3], atol=1 / 255.0)


def test_kitti_runner_pipelined_smoke(tmp_path):
    """The --pipelined runner flushes deferred poses into the TUM output."""
    from sycl_points_tpu.apps.kitti_odometry import main

    world = RNG.uniform(-10, 10, size=(3000, 3)).astype(np.float32)
    world[:, 2] *= 0.2
    vel = tmp_path / "velodyne"
    vel.mkdir()
    for i in range(3):
        shift = np.array([0.2 * i, 0, 0], np.float32)
        pts = (world - shift).astype(np.float32)
        raw = np.concatenate([pts, RNG.uniform(size=(len(pts), 1)).astype(np.float32)], 1)
        raw.tofile(vel / f"{i:06d}.bin")
    out = tmp_path / "traj.tum"
    rc = main([str(vel), "--out", str(out), "--max-frames", "3", "--pipelined"])
    assert rc == 0
    traj = np.loadtxt(out)
    assert traj.shape == (3, 8)
    assert 0.1 < traj[-1, 1] < 0.7


def test_fleet_runner_multi_sequence(tmp_path):
    """Two sequences of different lengths through the fleet runner: one
    program pair serves both; the shorter stream pads with held-pose empty
    frames that are dropped from its TUM export."""
    from sycl_points_tpu.apps.fleet_odometry import main

    rng = np.random.default_rng(12)
    world = rng.uniform(-10, 10, size=(3000, 3)).astype(np.float32)
    world[:, 2] *= 0.2
    dirs = []
    lengths = (4, 2)  # stream 1 finishes early
    for s, n in enumerate(lengths):
        d = tmp_path / f"seq{s}"
        d.mkdir()
        for i in range(n):
            shift = np.array([0.2 * i, 0.1 * s, 0], np.float32)
            pts = (world - shift).astype(np.float32)
            raw = np.concatenate(
                [pts, rng.uniform(size=(len(pts), 1)).astype(np.float32)], 1
            )
            raw.tofile(d / f"{i:06d}.bin")
        dirs.append(str(d))

    prefix = str(tmp_path / "fleet")
    rc = main(dirs + ["--out-prefix", prefix])
    assert rc == 0
    t0 = np.loadtxt(f"{prefix}_0.tum")
    t1 = np.loadtxt(f"{prefix}_1.tum")
    assert t0.shape == (4, 8)
    assert t1.shape == (2, 8)  # padding frames dropped
    assert 0.3 < t0[-1, 1] < 0.9  # ~0.6 m forward over 4 frames
