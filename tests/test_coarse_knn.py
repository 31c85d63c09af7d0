"""CoarseKNN: certified queries must be provably exact vs brute force; the
certificate fraction must be high on realistic densities; budget counters
fire instead of silent truncation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sycl_points_tpu.ops.coarse_knn import CoarseKNN
from sycl_points_tpu.ops.knn import brute_force_knn
from sycl_points_tpu.points.point_cloud import PointCloud


def _cloud(m, seed=0, span=40.0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-span, span, size=(m, 3)).astype(np.float32)
    pts[:, 2] *= 0.1  # LiDAR-like: mostly planar
    return PointCloud.from_numpy(pts)


@pytest.mark.parametrize("k", [1, 10])
def test_certified_results_match_exact(k):
    tgt = _cloud(20000, seed=1)
    q = _cloud(512, seed=2)
    ck = CoarseKNN.build(tgt, coarse_cell=8.0, max_per_cell=256)
    assert int(ck.cells_lost) == 0 and int(ck.overflow) == 0

    res, cert = ck.search(q.points, k=k, top_cells=8)
    exact = brute_force_knn(ck.points, ck.mask, q.points, k)

    cert_np = np.asarray(cert)
    frac = cert_np.mean()
    assert frac > 0.9, f"certified fraction too low: {frac:.3f}"
    # every certified query's distances must match the exact ones, up to
    # the brute-force oracle's own matmul-path f32 noise (~1e-3 at this
    # coordinate scale; the coarse path computes diff^2 directly and is
    # often the MORE accurate of the two)
    d_c = np.sqrt(np.asarray(res.distances)[cert_np])
    d_e = np.sqrt(np.asarray(exact.distances)[cert_np])
    np.testing.assert_allclose(d_c, d_e, atol=5e-3)
    # and uncertified ones must never be meaningfully better than exact
    d_all = np.sqrt(np.asarray(res.distances))
    assert (d_all >= np.sqrt(np.asarray(exact.distances)) - 5e-3).all()


def test_budget_counters_fire_and_void_certificates():
    tgt = _cloud(5000, seed=3, span=10.0)  # dense: cells overflow tiny L
    q = _cloud(64, seed=6, span=10.0)
    ck = CoarseKNN.build(tgt, coarse_cell=10.0, max_per_cell=8)
    assert int(ck.overflow) > 0
    _, cert = ck.search(q.points, k=1)
    assert not np.asarray(cert).any(), "overflowed cells must void certificates"
    ck2 = CoarseKNN.build(tgt, coarse_cell=0.2, cells_capacity=256)
    assert int(ck2.cells_lost) > 0
    _, cert2 = ck2.search(q.points, k=1)
    assert not np.asarray(cert2).any(), "lost cells must void certificates"


def test_search_with_pose():
    tgt = _cloud(8000, seed=4)
    q = _cloud(128, seed=5)
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [1.0, -2.0, 0.3]
    ck = CoarseKNN.build(tgt, coarse_cell=8.0, max_per_cell=256)
    res_posed, _ = ck.search(q.points, k=1, pose=jnp.asarray(T))
    from sycl_points_tpu.ops.transform import transform_points

    res_manual, _ = ck.search(np.asarray(transform_points(q.points, jnp.asarray(T))), k=1)
    np.testing.assert_array_equal(
        np.asarray(res_posed.indices), np.asarray(res_manual.indices)
    )
