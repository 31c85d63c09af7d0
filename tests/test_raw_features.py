"""Raw-features preprocess path: covariances from the raw scan's range-image
neighborhoods, carried through the voxel downsample — must match the
standard post-voxel estimation in registration quality."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "benchmarks")
)

from sycl_points_tpu.ops.voxel import voxel_downsample
from sycl_points_tpu.points.point_cloud import PointCloud, pad_capacity_for


def test_voxel_downsample_aggregates_covs_and_normals():
    rng = np.random.default_rng(4)
    # two voxels (0,0,0) and far away; member covs differ
    pts = np.array(
        [[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [5.0, 5.0, 5.0]], np.float32
    )
    covs = np.stack([np.eye(3) * 1.0, np.eye(3) * 3.0, np.eye(3) * 7.0]).astype(
        np.float32
    )
    normals = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    c = PointCloud.from_numpy(pts)
    cap = c.capacity
    covs_p = np.zeros((cap, 3, 3), np.float32)
    covs_p[:3] = covs
    normals_p = np.zeros((cap, 3), np.float32)
    normals_p[:3] = normals
    c = c.replace(covs=jnp.asarray(covs_p), normals=jnp.asarray(normals_p))
    out = voxel_downsample(c, 1.0, out_capacity=8)
    m = np.asarray(out.mask)
    got_c = np.asarray(out.covs)[m]
    got_n = np.asarray(out.normals)[m]
    got_p = np.asarray(out.points)[m]
    near = got_p[:, 0] < 1.0
    np.testing.assert_allclose(got_c[near][0], np.eye(3) * 2.0, atol=1e-5)
    np.testing.assert_allclose(got_c[~near][0], np.eye(3) * 7.0, atol=1e-5)
    # normals mean-renormalized
    exp = np.array([1, 1, 0]) / np.sqrt(2)
    np.testing.assert_allclose(np.abs(got_n[near][0]), exp, atol=1e-5)


@pytest.mark.slow
def test_raw_features_registration_parity():
    """Raw-features preprocess must register the synthetic Velodyne pair as
    accurately as the standard path (BASELINE config-8 semantics)."""
    import dataclasses as dc

    from synthetic_velodyne import World, scan_at
    from sycl_points_tpu.pipeline.params import (
        CovarianceEstimationParams,
        LidarOdometryParams,
        MEstimationParams,
    )
    from sycl_points_tpu.pipeline.pc_processor import PCProcessor
    from sycl_points_tpu.ops.knn import BruteForceKNN
    from sycl_points_tpu.registration.registration import (
        RegistrationParams,
        align,
    )
    from sycl_points_tpu.registration.factors import RegType

    w = World()
    T0 = np.eye(4)
    T0[:3, 3] = [0, 0, 1.8]
    T1 = T0.copy()
    yaw = np.deg2rad(2.0)
    T1[:3, :3] = np.array(
        [[np.cos(yaw), -np.sin(yaw), 0], [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]]
    )
    T1[:3, 3] = [1.0, 0.1, 1.8]
    tgt_np = scan_at(w, T0, n_az=1024, n_rings=32, seed=0)
    src_np = scan_at(w, T1, n_az=1024, n_rings=32, seed=1)
    T_rel = np.linalg.inv(T0) @ T1

    cap = pad_capacity_for(max(len(src_np), len(tgt_np)))
    errs = {}
    for tag, raw in (("std", False), ("rimg", True)):
        params = LidarOdometryParams(
            covariance_estimation=CovarianceEstimationParams(
                m_estimation=MEstimationParams(enable=False),
                raw_range_image=raw,
                range_image_n_az=1024,
                range_image_n_rings=32,
            ),
        )
        proc = PCProcessor(params)
        clouds = []
        for pts in (src_np, tgt_np):
            c = proc.prefilter(PointCloud.from_numpy(pts, capacity=cap))
            ctx = proc.prepare_context(c)
            c = proc.compute_covariances(c, ctx)
            assert c.covs is not None
            clouds.append(c)
        s, t = clouds
        res = align(
            s, t, BruteForceKNN.build(t),
            RegistrationParams(reg_type=RegType.GICP, max_iterations=20),
        )
        errs[tag] = float(
            np.linalg.norm(np.asarray(res.T)[:3, 3] - T_rel[:3, 3].astype(np.float32))
        )
    # both must land within a few cm; raw-features within 2 cm of standard
    assert errs["std"] < 0.10, errs
    assert errs["rimg"] < 0.10, errs
    assert abs(errs["rimg"] - errs["std"]) < 0.02, errs
