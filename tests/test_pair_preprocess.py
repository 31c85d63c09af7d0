"""Fused pair preprocess must match two single-cloud preprocesses."""

import jax.numpy as jnp
import numpy as np

from sycl_points_tpu.ops.covariance import estimate_covariances, extract_normals
from sycl_points_tpu.ops.knn import approx_knn
from sycl_points_tpu.ops.pair_preprocess import preprocess_pair, voxel_downsample_pair
from sycl_points_tpu.ops.voxel import voxel_downsample
from sycl_points_tpu.points.point_cloud import PointCloud


def _cloud(seed, n=900, cap=1024, lo=-8.0, hi=8.0):
    rng = np.random.default_rng(seed)
    return PointCloud.from_numpy(
        rng.uniform(lo, hi, size=(n, 3)).astype(np.float32), capacity=cap
    )


def _sorted_valid(c):
    pts = np.asarray(c.points)[np.asarray(c.mask)]
    return pts[np.lexsort(pts.T)]


def test_voxel_downsample_pair_matches_single():
    a, b = _cloud(0), _cloud(1, lo=-30.0, hi=5.0)
    out_cap = 1024
    ad, bd = voxel_downsample_pair(a, b, 0.5, out_cap)
    ar = voxel_downsample(a, 0.5, out_capacity=out_cap)
    br = voxel_downsample(b, 0.5, out_capacity=out_cap)
    np.testing.assert_allclose(_sorted_valid(ad), _sorted_valid(ar), atol=1e-5)
    np.testing.assert_allclose(_sorted_valid(bd), _sorted_valid(br), atol=1e-5)


def test_preprocess_pair_features_match_single():
    a, b = _cloud(2), _cloud(3)
    out_cap = 1024
    af, bf = preprocess_pair(a, b, 0.5, out_cap, k=8)

    for fused, raw in ((af, a), (bf, b)):
        ref = voxel_downsample(raw, 0.5, out_capacity=out_cap)
        knn = approx_knn(ref.points, ref.mask, ref.points, 8)
        covs = estimate_covariances(ref.points, knn)
        normals = extract_normals(ref.points, covs)
        m = np.asarray(fused.mask)
        # same voxel set (cell sort order may differ per cloud, so compare
        # as sorted rows)
        np.testing.assert_allclose(
            _sorted_valid(fused), _sorted_valid(ref), atol=1e-5
        )
        # features: compare via lookup by point
        fp = np.asarray(fused.points)[m]
        rp = np.asarray(ref.points)[np.asarray(ref.mask)]
        order_f = np.lexsort(fp.T)
        order_r = np.lexsort(rp.T)
        fc = np.asarray(fused.covs)[m][order_f]
        rc = np.asarray(covs)[np.asarray(ref.mask)][order_r]
        np.testing.assert_allclose(fc, rc, atol=1e-4)
        fn = np.abs(np.asarray(fused.normals)[m][order_f])
        rn = np.abs(np.asarray(normals)[np.asarray(ref.mask)][order_r])
        np.testing.assert_allclose(fn, rn, atol=1e-3)
