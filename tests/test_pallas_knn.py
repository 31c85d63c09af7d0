"""Pallas NN kernel vs brute-force oracle (interpret mode on CPU)."""

import numpy as np

import jax.numpy as jnp

from sycl_points_tpu.ops.knn import brute_force_knn
from sycl_points_tpu.ops.pallas_knn import nn1_pallas
from sycl_points_tpu.points.point_cloud import PointCloud

RNG = np.random.default_rng(29)


def test_matches_bruteforce():
    tgt = RNG.uniform(-10, 10, size=(1000, 3)).astype(np.float32)
    qry = RNG.uniform(-10, 10, size=(300, 3)).astype(np.float32)
    mask = np.ones(1000, bool)
    i, d = nn1_pallas(jnp.asarray(tgt), jnp.asarray(mask), jnp.asarray(qry), interpret=True)
    ref = brute_force_knn(jnp.asarray(tgt), jnp.asarray(mask), jnp.asarray(qry), 1)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref.indices[:, 0]))
    np.testing.assert_allclose(np.asarray(d), np.asarray(ref.distances[:, 0]), rtol=1e-4, atol=1e-3)


def test_masked_targets():
    tgt = RNG.uniform(-5, 5, size=(600, 3)).astype(np.float32)
    mask = np.ones(600, bool)
    mask[::3] = False
    qry = tgt[::3][:100]
    i, d = nn1_pallas(jnp.asarray(tgt), jnp.asarray(mask), jnp.asarray(qry), interpret=True)
    assert np.all(mask[np.asarray(i)])


def test_prepped_matches_unprepped():
    """BruteForceKNN.prepped() (target prep hoisted out of the ICP loop)
    returns identical results to the per-search prep path."""
    from sycl_points_tpu.ops.pallas_knn import nn1_pallas_prepped, prep_target

    tgt = RNG.uniform(-10, 10, size=(900, 3)).astype(np.float32)
    mask = np.ones(900, bool)
    mask[::7] = False
    qry = RNG.uniform(-10, 10, size=(200, 3)).astype(np.float32)
    t4, mrow = prep_target(jnp.asarray(tgt), jnp.asarray(mask))
    i1, d1 = nn1_pallas_prepped(t4, mrow, jnp.asarray(qry), interpret=True)
    i0, d0 = nn1_pallas(jnp.asarray(tgt), jnp.asarray(mask), jnp.asarray(qry), interpret=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d0))

    # struct plumbing: prepped() fills t4/mask_row and search() uses them
    from sycl_points_tpu.ops.knn import BruteForceKNN

    knn = BruteForceKNN(points=jnp.asarray(tgt), mask=jnp.asarray(mask))
    assert knn.prepped() is knn  # no-op off-pallas
    knn_p = BruteForceKNN(
        points=jnp.asarray(tgt), mask=jnp.asarray(mask), use_pallas=True
    ).prepped()
    assert knn_p.t4 is not None and knn_p.mask_row is not None
    assert knn_p.prepped() is knn_p  # idempotent


def test_all_masked_inf():
    tgt = RNG.uniform(-5, 5, size=(64, 3)).astype(np.float32)
    mask = np.zeros(64, bool)
    qry = tgt[:8]
    i, d = nn1_pallas(jnp.asarray(tgt), jnp.asarray(mask), jnp.asarray(qry), interpret=True)
    assert np.all(np.isinf(np.asarray(d)))
