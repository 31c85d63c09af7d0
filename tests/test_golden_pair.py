"""End-to-end golden test: GICP on the bundled reference scan pair must
recover T_target_source (the reference accuracy golden,
cpp/data/T_target_source.txt; example harness at
cpp/examples/example_registration.cpp:13-162)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sycl_points_tpu.ops.covariance import estimate_covariances, extract_normals
from sycl_points_tpu.ops.knn import BruteForceKNN, brute_force_knn
from sycl_points_tpu.ops.robust import RobustLossType
from sycl_points_tpu.ops.voxel import voxel_downsample
from sycl_points_tpu.points import io
from sycl_points_tpu.points.point_cloud import PointCloud, compact_device
from sycl_points_tpu.registration.factors import RegType
from sycl_points_tpu.registration.registration import (
    RegistrationParams,
    RobustParams,
    align,
)
from sycl_points_tpu.utils import lie

REF_DATA = "/root/reference/cpp/data"


def load_preprocessed(path, voxel, k=10, cap=8192):
    raw = io.read_file(path)
    cloud = PointCloud.from_numpy(raw["points"])
    down = voxel_downsample(cloud, voxel)
    down = compact_device(down, out_capacity=cap)
    knn = brute_force_knn(down.points, down.mask, down.points, k)
    covs = estimate_covariances(down.points, knn)
    normals = extract_normals(down.points, covs)
    return down.replace(covs=covs, normals=normals)


@pytest.mark.slow
def test_gicp_bundled_pair():
    T_gt = np.loadtxt(f"{REF_DATA}/T_target_source.txt").astype(np.float32)
    # Coarser voxel than the reference example (0.5 vs 0.25) to keep the
    # 1-core CPU test fast; bench.py runs the full 0.25 config on TPU.
    source = load_preprocessed(f"{REF_DATA}/source.ply", 0.5)
    target = load_preprocessed(f"{REF_DATA}/target.ply", 0.5)
    knn = BruteForceKNN.build(target)
    params = RegistrationParams(
        reg_type=RegType.GICP,
        robust=RobustParams(type=RobustLossType.GEMAN_MCCLURE, default_scale=2.5),
        optimization_method="levenberg_marquardt",
        max_iterations=20,
    )
    res = align(source, target, knn, params)
    T = np.asarray(res.T)
    err = np.asarray(lie.se3_log(jnp.asarray(np.linalg.inv(T_gt) @ T)))
    t_err = np.linalg.norm(err[3:])
    r_err = np.linalg.norm(err[:3])
    assert t_err < 0.08, f"translation error {t_err:.3f} m (T={T})"
    assert r_err < 0.01, f"rotation error {r_err:.4f} rad"
    assert int(res.inlier) > 2000
