"""Filters, samplers, polar downsampling, intensity ops, CV deskew."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sycl_points_tpu.deskew.constant_velocity import deskew_constant_velocity
from sycl_points_tpu.ops import intensity as intens
from sycl_points_tpu.ops.filters import (
    angle_incidence_filter,
    box_filter,
    radius_outlier_removal,
    statistical_outlier_removal,
)
from sycl_points_tpu.ops.knn import brute_force_knn
from sycl_points_tpu.ops.polar import CoordinateSystem, polar_downsample
from sycl_points_tpu.ops.sampling import (
    farthest_point_sampling,
    mixed_sampling,
    random_sampling,
    weighted_sampling,
)
from sycl_points_tpu.points.point_cloud import PointCloud
from sycl_points_tpu.utils import lie

RNG = np.random.default_rng(3)


def cloud_of(pts, **kw):
    kw = {k: np.asarray(v, np.float32) for k, v in kw.items()}
    return PointCloud.from_numpy(np.asarray(pts, np.float32), **kw)


def test_box_filter():
    pts = np.array([[0.1, 0, 0], [1, 1, 1], [60, 0, 0], [np.nan, 0, 0], [5, -3, 2]])
    c = box_filter(cloud_of(pts), 0.5, 50.0)
    got = np.asarray(c.mask)[:5]
    np.testing.assert_array_equal(got, [False, True, False, False, True])


def test_statistical_outlier_removal():
    base = RNG.normal(size=(200, 3)).astype(np.float32)
    outliers = base[:5] + 50.0
    pts = np.concatenate([base, outliers])
    c = cloud_of(pts)
    knn = brute_force_knn(c.points, c.mask, c.points, 10)
    out = statistical_outlier_removal(c, knn, stddev_mul_thresh=1.0)
    mask = np.asarray(out.mask)
    assert not mask[200:205].any()  # outliers removed
    assert mask[:200].mean() > 0.9  # most inliers kept


def test_radius_outlier_removal():
    pts = np.concatenate([RNG.normal(size=(100, 3)) * 0.5, [[30, 30, 30]]]).astype(np.float32)
    c = cloud_of(pts)
    knn = brute_force_knn(c.points, c.mask, c.points, 6)
    out = radius_outlier_removal(c, knn, radius=1.0, min_neighbors=3)
    mask = np.asarray(out.mask)
    assert not mask[100]
    assert mask[:100].mean() > 0.8


def test_angle_incidence_filter():
    # wall at x=5 (normal -x): grazing points have ray nearly parallel to wall
    y = np.linspace(-0.5, 30, 50)
    pts = np.stack([np.full(50, 5.0), y, np.zeros(50)], axis=1).astype(np.float32)
    normals = np.tile([-1.0, 0, 0], (50, 1)).astype(np.float32)
    c = cloud_of(pts, normals=normals)
    out = angle_incidence_filter(c, min_angle=0.0175, max_angle=np.radians(75))
    mask = np.asarray(out.mask)[:50]
    cos = 5.0 / np.linalg.norm(pts, axis=1)
    expect = np.abs(cos) >= np.cos(np.radians(75))
    np.testing.assert_array_equal(mask, expect)


def test_random_sampling():
    c = cloud_of(RNG.normal(size=(500, 3)))
    out = random_sampling(c, 100, jax.random.key(0))
    assert out.capacity == 100
    assert int(out.count()) == 100
    idx_pts = out.to_numpy()["points"]
    assert len(np.unique(idx_pts, axis=0)) == 100  # without replacement


def test_weighted_sampling_distribution():
    n = 1000
    c = cloud_of(RNG.normal(size=(n, 3)))
    w = np.ones(n, np.float32)
    w[:100] = 50.0  # heavily favored
    w_pad = np.zeros(c.capacity, np.float32); w_pad[:n] = w
    picks = weighted_sampling(c, 200, jnp.asarray(w_pad), jax.random.key(1))
    pts = picks.to_numpy()["points"]
    favored = np.asarray(c.points)[:100]
    hits = sum(1 for p in pts if (np.abs(favored - p).sum(axis=1) < 1e-6).any())
    assert hits > 80  # ~E[hits]=100 with tight concentration


def test_mixed_sampling_counts():
    c = cloud_of(RNG.normal(size=(400, 3)))
    w = np.abs(RNG.normal(size=400)).astype(np.float32)
    w_pad = np.zeros(c.capacity, np.float32); w_pad[:400] = w
    out = mixed_sampling(c, 100, jnp.asarray(w_pad), jax.random.key(2), weighted_ratio=0.8)
    assert out.capacity == 100
    assert int(out.count()) == 100
    assert len(np.unique(out.to_numpy()["points"], axis=0)) == 100


def test_fps_spreads():
    grid = np.stack(np.meshgrid(np.arange(10), np.arange(10), [0.0]), -1).reshape(-1, 3)
    c = cloud_of(grid)
    out = farthest_point_sampling(c, 4, jax.random.key(4))
    pts = out.to_numpy()["points"]
    # FPS on a grid picks well-separated points: min pairwise distance large
    d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
    d[np.arange(4), np.arange(4)] = np.inf
    assert d.min() > 5.0


def test_polar_downsample():
    # dense ring of points at same range/elevation: collapses to azimuth bins
    theta = np.linspace(-np.pi * 0.9, np.pi * 0.9, 1000)
    pts = np.stack([10 * np.cos(theta), 10 * np.sin(theta), np.zeros(1000)], 1)
    out = polar_downsample(cloud_of(pts), 1.0, 0.1, np.radians(10.0))
    n = int(out.count())
    assert 30 <= n <= 70  # ~32 azimuth bins, x2 from range-bin boundary jitter


def test_polar_camera_system():
    pts = np.array([[0.0, 0.0, 10.0], [1.0, 0.0, 10.0]], np.float32)
    out = polar_downsample(
        cloud_of(pts), 1.0, 0.1, 0.1, coord_system=CoordinateSystem.CAMERA
    )
    assert int(out.count()) >= 1


def test_intensity_correction():
    pts = np.array([[1, 0, 0], [2, 0, 0], [4, 0, 0]], np.float32)
    inten = np.array([10.0, 10.0, 10.0], np.float32)
    c = cloud_of(pts, intensities=inten)
    out = intens.correct_intensity(c, exponent=2.0, ref_distance=1.0)
    np.testing.assert_allclose(
        np.asarray(out.intensities)[:3], [10.0, 40.0, 160.0], rtol=1e-5
    )


def test_intensity_zscore():
    pts = RNG.normal(size=(100, 3)).astype(np.float32)
    inten = np.ones(100, np.float32)
    inten[0] = 5.0
    c = cloud_of(pts, intensities=inten)
    knn = brute_force_knn(c.points, c.mask, c.points, 8)
    out = intens.intensity_zscore(c, knn)
    z = np.asarray(out.intensities)
    assert z[0] > 1.0  # the hot point stands out


def test_intensity_smoothing_reduces_noise():
    pts = np.stack([np.linspace(5, 6, 200), np.zeros(200), np.zeros(200)], 1).astype(np.float32)
    inten = (1.0 + RNG.normal(scale=0.3, size=200)).astype(np.float32)
    c = cloud_of(pts, intensities=inten)
    knn = brute_force_knn(c.points, c.mask, c.points, 10)
    out = intens.smooth_intensity(c, knn, sigma_azimuth=0.5, sigma_elevation=0.5, sigma_range=0.5)
    sm = np.asarray(out.intensities)[:200]
    assert sm.std() < inten.std() * 0.7


def test_cv_deskew_linear_motion():
    # constant velocity 1 m/s in +x for 1 s; points sampled uniformly in time
    n = 100
    ts = np.linspace(0, 1000, n).astype(np.float32)  # ms
    pts = RNG.normal(size=(n, 3)).astype(np.float32)
    c = cloud_of(pts, timestamp_offsets=ts)
    prev = np.eye(4, dtype=np.float32)
    cur = np.eye(4, dtype=np.float32)
    cur[0, 3] = 1.0
    out = deskew_constant_velocity(c, jnp.asarray(prev), jnp.asarray(cur), 1.0)
    got = np.asarray(out.points)[:n]
    expect = pts + np.stack([ts / 1000, np.zeros(n), np.zeros(n)], 1)
    np.testing.assert_allclose(got, expect, atol=1e-4)


def test_cv_deskew_rotation_rotates_normals():
    n = 10
    ts = np.full(n, 1000.0, np.float32)  # all at scan end
    pts = RNG.normal(size=(n, 3)).astype(np.float32)
    normals = np.tile([1.0, 0, 0], (n, 1)).astype(np.float32)
    c = cloud_of(pts, timestamp_offsets=ts, normals=normals)
    tw = np.array([0, 0, np.pi / 2, 0, 0, 0], np.float32)
    cur = np.asarray(lie.se3_exp(jnp.asarray(tw)))
    out = deskew_constant_velocity(c, jnp.eye(4), jnp.asarray(cur), 1.0)
    got_n = np.asarray(out.normals)[:n]
    np.testing.assert_allclose(got_n, np.tile([0, 1.0, 0], (n, 1)), atol=1e-5)
