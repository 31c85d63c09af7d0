"""Range-image KNN vs the exact brute-force oracle (reference test pattern:
tests/test_kdtree.cpp CompareWithBruteForce)."""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "benchmarks")
)

from sycl_points_tpu.ops.knn import brute_force_knn
from sycl_points_tpu.ops.range_image_knn import range_image_knn


@pytest.fixture(scope="module")
def velodyne_scan():
    from synthetic_velodyne import World, scan_at

    w = World()
    T = np.eye(4)
    T[:3, 3] = [0, 0, 1.8]
    return scan_at(w, T, n_az=1024, n_rings=32, seed=3)


def test_recall_vs_bruteforce(velodyne_scan):
    pts = velodyne_scan
    N = len(pts)
    p = jnp.asarray(pts)
    m = jnp.ones(N, bool)
    ref = brute_force_knn(p, m, p, 10)
    ref_i = np.sort(np.asarray(ref.indices), axis=1)

    res = range_image_knn(p, m, 10, n_az=1024, n_rings=32)
    assert int(res.collisions) == 0  # clean synthetic scan -> unique cells
    got = np.asarray(res.knn.indices)
    hits = np.mean(
        [len(np.intersect1d(ref_i[i], got[i])) / 10.0 for i in range(0, N, 13)]
    )
    assert hits > 0.99, f"recall {hits}"

    # reported distances are EXACT for the reported neighbors
    d = np.asarray(res.knn.distances)
    sample = np.arange(0, N, 997)
    for i in sample:
        for j, idx in enumerate(got[i]):
            if np.isfinite(d[i, j]):
                true_d = float(np.sum((pts[i] - pts[idx]) ** 2))
                assert abs(d[i, j] - true_d) < 1e-4


def test_self_is_nearest(velodyne_scan):
    pts = velodyne_scan[:5000]
    p = jnp.asarray(pts)
    m = jnp.ones(len(pts), bool)
    res = range_image_knn(p, m, 5, n_az=1024, n_rings=32)
    got_i = np.asarray(res.knn.indices)
    got_d = np.asarray(res.knn.distances)
    best = np.argmin(got_d, axis=1)
    self_found = got_i[np.arange(len(pts)), best] == np.arange(len(pts))
    assert self_found.mean() > 0.999


def test_mask_and_missing():
    rng = np.random.default_rng(5)
    pts = rng.normal(size=(256, 3)).astype(np.float32) * 10
    mask = np.ones(256, bool)
    mask[100:] = False
    res = range_image_knn(jnp.asarray(pts), jnp.asarray(mask), 4,
                          n_az=64, n_rings=8)
    got = np.asarray(res.knn.indices)
    d = np.asarray(res.knn.distances)
    # masked points fall back to self with inf distance
    assert (got[100:] == np.arange(100, 256)[:, None]).all()
    assert np.isinf(d[100:]).all()
    # no result row ever references a masked point with finite distance
    finite = np.isfinite(d[:100])
    assert (got[:100][finite] < 100).all()


def test_collision_telemetry():
    # two identical points share a cell -> collisions counted, not silent
    pts = np.asarray([[10.0, 0, 0], [10.0, 0, 0], [0, 10.0, 1.0]], np.float32)
    res = range_image_knn(jnp.asarray(pts), jnp.ones(3, dtype=bool), 2,
                          n_az=32, n_rings=4)
    assert int(res.collisions) == 1


def test_morton_window_knn_envelope(velodyne_scan):
    """window_knn (Morton-order fallback for unstructured clouds): honest
    envelope check — recall is measurably LOWER than the range-image path
    (~0.8 vs 0.998 on spinning-lidar data); it exists for clouds with no
    grid structure.  Distances must still be exact for reported pairs."""
    from sycl_points_tpu.ops.window_knn import window_self_knn

    pts = velodyne_scan[:8192]
    p = jnp.asarray(pts)
    m = jnp.ones(len(pts), bool)
    ref = brute_force_knn(p, m, p, 10)
    ref_i = np.sort(np.asarray(ref.indices), axis=1)
    r = window_self_knn(p, m, 10, window=64, passes=2)
    got = np.asarray(r.indices)
    hits = np.mean(
        [len(np.intersect1d(ref_i[i], got[i])) / 10.0 for i in range(0, len(pts), 13)]
    )
    assert hits > 0.70, hits  # measured ~0.8; this is the documented floor
    d = np.asarray(r.distances)
    for i in range(0, len(pts), 991):
        for j, idx in enumerate(got[i]):
            if np.isfinite(d[i, j]):
                assert abs(d[i, j] - np.sum((pts[i] - pts[idx]) ** 2)) < 1e-4
