"""Voxel-grid downsampling vs a numpy dict-grouping oracle."""

import numpy as np

import jax.numpy as jnp

from sycl_points_tpu.ops.voxel import voxel_downsample
from sycl_points_tpu.points.point_cloud import PointCloud

RNG = np.random.default_rng(21)


def oracle_voxel(pts, voxel, min_count=1, intensities=None):
    keys = np.floor(pts / voxel).astype(np.int64)
    groups = {}
    for i, k in enumerate(map(tuple, keys)):
        groups.setdefault(k, []).append(i)
    cents, meds = [], []
    for k, idxs in groups.items():
        if len(idxs) < min_count:
            continue
        cents.append(pts[idxs].mean(axis=0))
        if intensities is not None:
            v = np.sort(intensities[idxs])
            n = len(v)
            meds.append(v[n // 2] if n % 2 else 0.5 * (v[n // 2 - 1] + v[n // 2]))
    return np.array(cents), (np.array(meds) if intensities is not None else None)


def _sorted(a):
    return a[np.lexsort(a.T)]


def test_matches_oracle():
    pts = (RNG.uniform(-8, 8, size=(2000, 3))).astype(np.float32)
    cloud = PointCloud.from_numpy(pts)
    out = voxel_downsample(cloud, 1.0)
    got = out.to_numpy()["points"]
    ref, _ = oracle_voxel(pts, 1.0)
    assert got.shape == ref.shape
    np.testing.assert_allclose(_sorted(got), _sorted(ref), atol=1e-4)


def test_min_voxel_count():
    pts = np.array(
        [[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [5.1, 5.1, 5.1]], dtype=np.float32
    )
    cloud = PointCloud.from_numpy(pts)
    out = voxel_downsample(cloud, 1.0, min_voxel_count=2)
    got = out.to_numpy()["points"]
    assert got.shape == (1, 3)
    np.testing.assert_allclose(got[0], [0.15, 0.15, 0.15], atol=1e-5)


def test_intensity_median_and_timestamp_mean():
    pts = np.zeros((6, 3), np.float32)
    pts[3:] += 10.0  # two voxels of 3 points each
    inten = np.array([3.0, 1.0, 2.0, 7.0, 5.0, 100.0], np.float32)
    ts = np.array([0.0, 1.0, 2.0, 3.0, 4.0, 5.0], np.float32)
    cloud = PointCloud.from_numpy(pts, intensities=inten, timestamp_offsets=ts)
    out = voxel_downsample(cloud, 1.0).to_numpy()
    order = np.argsort(out["points"][:, 0])
    np.testing.assert_allclose(out["intensities"][order], [2.0, 7.0])
    np.testing.assert_allclose(out["timestamp_offsets"][order], [1.0, 4.0])


def test_nonfinite_and_masked_dropped():
    pts = RNG.uniform(-4, 4, size=(100, 3)).astype(np.float32)
    pts[7] = np.nan
    cloud = PointCloud.from_numpy(pts)
    mask = np.asarray(cloud.mask).copy()
    mask[50:] = False  # mask away the rest
    cloud = cloud.replace(mask=jnp.asarray(mask))
    out = voxel_downsample(cloud, 0.5)
    got = out.to_numpy()["points"]
    ref, _ = oracle_voxel(np.delete(pts[:50], 7, axis=0), 0.5)
    np.testing.assert_allclose(_sorted(got), _sorted(ref), atol=1e-4)
