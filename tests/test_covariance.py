"""Covariance/normal estimation vs numpy oracles."""

import numpy as np

import jax.numpy as jnp

from sycl_points_tpu.ops.covariance import (
    estimate_covariances,
    estimate_covariances_robust,
    extract_normals,
)
from sycl_points_tpu.ops.knn import brute_force_knn
from sycl_points_tpu.ops.robust import RobustLossType

RNG = np.random.default_rng(13)


def _self_knn(pts, k):
    return brute_force_knn(jnp.asarray(pts), jnp.ones(len(pts), bool), jnp.asarray(pts), k)


def test_plain_covariance_matches_numpy():
    pts = (RNG.normal(size=(300, 3)) * 2.0).astype(np.float32)
    k = 10
    knn = _self_knn(pts, k)
    covs = np.asarray(estimate_covariances(jnp.asarray(pts), knn))
    idx = np.asarray(knn.indices)
    for i in [0, 17, 99, 299]:
        nbr = pts[idx[i]]
        mean = nbr.mean(axis=0)
        ref = (nbr - mean).T @ (nbr - mean) / k
        np.testing.assert_allclose(covs[i], ref, atol=1e-4)


def test_insufficient_neighbors_identity_fallback():
    pts = RNG.normal(size=(5, 3)).astype(np.float32)
    knn = _self_knn(pts, 3)  # only 3 neighbors < 4 required
    covs = np.asarray(estimate_covariances(jnp.asarray(pts), knn))
    np.testing.assert_allclose(covs, np.broadcast_to(np.eye(3), covs.shape))


def test_normals_on_plane():
    # points on z=0 plane; normals must be +-z and flipped toward sensor (origin)
    xy = RNG.uniform(-5, 5, size=(500, 2)).astype(np.float32)
    pts = np.concatenate([xy, np.full((500, 1), 3.0, np.float32)], axis=1)
    knn = _self_knn(pts, 10)
    covs = estimate_covariances(jnp.asarray(pts), knn)
    normals = np.asarray(extract_normals(jnp.asarray(pts), covs))
    np.testing.assert_allclose(np.abs(normals[:, 2]), 1.0, atol=1e-3)
    # plane at z=3 in front of sensor: dot(n, p) <= 1 enforced by the flip
    dots = np.sum(normals * pts, axis=1)
    assert np.all(dots <= 1.0 + 1e-4)


def test_robust_covariance_downweights_outlier():
    # tight plane patch + one far outlier in the neighborhood
    base = RNG.normal(size=(127, 3)).astype(np.float32) * np.array([1, 1, 0.01], np.float32)
    outlier = np.array([[0.0, 0.0, 0.5]], dtype=np.float32)
    pts = np.concatenate([base, outlier]).astype(np.float32)
    knn = _self_knn(pts, 16)
    plain = np.asarray(estimate_covariances(jnp.asarray(pts), knn))
    robust = np.asarray(
        estimate_covariances_robust(
            jnp.asarray(pts), knn, RobustLossType.CAUCHY, max_iterations=4
        )
    )
    # neighborhoods containing the outlier: robust z-variance must be smaller
    idx = np.asarray(knn.indices)
    has_outlier = (idx == 127).any(axis=1)
    has_outlier[127] = False
    assert has_outlier.any()
    assert np.all(robust[has_outlier][:, 2, 2] < plain[has_outlier][:, 2, 2])
