"""TPU correctness matrix: golden bundled pair across all registration types
and optimizers, on the attached TPU.

Asserts each configuration recovers the committed ground-truth translation
within tolerance.  Writes scripts/TPU_MATRIX.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sycl_points_tpu.ops.covariance import estimate_covariances, extract_normals
from sycl_points_tpu.ops.filters import box_filter
from sycl_points_tpu.ops.knn import BruteForceKNN, approx_knn
from sycl_points_tpu.ops.robust import RobustLossType
from sycl_points_tpu.ops.voxel import voxel_downsample
from sycl_points_tpu.points import io
from sycl_points_tpu.points.point_cloud import PointCloud, pad_capacity_for
from sycl_points_tpu.registration.factors import RegType
from sycl_points_tpu.registration.registration import (
    RegistrationParams,
    RobustParams,
    align,
)

REF = "/root/reference/cpp/data"


def main():
    src_np = io.read_file(f"{REF}/source.ply")
    tgt_np = io.read_file(f"{REF}/target.ply")
    T_gt = np.loadtxt(f"{REF}/T_target_source.txt")
    raw_cap = pad_capacity_for(max(len(src_np["points"]), len(tgt_np["points"])))

    def hv(pts):
        linf = np.max(np.abs(pts), axis=1)
        pts = pts[(linf >= 0.5) & (linf <= 50.0)]
        return len(np.unique(np.floor(pts / 0.25).astype(np.int64), axis=0))

    cap = pad_capacity_for(max(hv(src_np["points"]), hv(tgt_np["points"])))

    @jax.jit
    def prep(c):
        c = box_filter(c, 0.5, 50.0)
        c = voxel_downsample(c, 0.25, out_capacity=cap)
        knn = approx_knn(c.points, c.mask, c.points, 10)
        covs = estimate_covariances(c.points, knn)
        return c.replace(covs=covs, normals=extract_normals(c.points, covs))

    src = jax.block_until_ready(prep(PointCloud.from_numpy(src_np["points"], capacity=raw_cap)))
    tgt = jax.block_until_ready(prep(PointCloud.from_numpy(tgt_np["points"], capacity=raw_cap)))
    knn = BruteForceKNN.build(tgt)

    results = {}
    configs = []
    for reg in (RegType.POINT_TO_POINT, RegType.POINT_TO_PLANE,
                RegType.POINT_TO_DISTRIBUTION, RegType.GICP, RegType.GENZ):
        configs.append((f"{reg.value}/gauss_newton", reg, "gauss_newton",
                        RobustLossType.GEMAN_MCCLURE))
    for opt in ("levenberg_marquardt", "powell_dogleg"):
        configs.append((f"gicp/{opt}", RegType.GICP, opt,
                        RobustLossType.GEMAN_MCCLURE))
    # robust-loss axis on chip (reference compile-time dispatch,
    # registration.hpp:372-405 x robust/robust.hpp:56-114)
    for loss in (RobustLossType.NONE, RobustLossType.HUBER,
                 RobustLossType.TUKEY, RobustLossType.CAUCHY):
        configs.append((f"gicp/gauss_newton/{loss.value}", RegType.GICP,
                        "gauss_newton", loss))

    tol_cm = {"point_to_point/gauss_newton": 12.0}  # p2p on sparse voxels is coarser
    failures = []
    for name, reg, opt, loss in configs:
        params = RegistrationParams(
            reg_type=reg,
            robust=RobustParams(type=loss, default_scale=2.5),
            optimization_method=opt,
            max_iterations=30,
        )
        res = jax.jit(
            lambda s, t, p=params: align(s, t, knn, p)
        )(src, tgt)
        T = np.asarray(jax.block_until_ready(res.T))
        t_err_cm = float(np.linalg.norm(T[:3, 3] - T_gt[:3, 3])) * 100
        ok = t_err_cm < tol_cm.get(name, 5.0)
        results[name] = {
            "t_err_cm": round(t_err_cm, 2),
            "iterations": int(res.iterations),
            "inlier": int(res.inlier),
            "ok": ok,
        }
        print(f"{name:38s} t_err={t_err_cm:6.2f} cm  it={int(res.iterations):3d}  "
              f"inlier={int(res.inlier)}  {'OK' if ok else 'FAIL'}", file=sys.stderr)
        if not ok:
            failures.append(name)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "TPU_MATRIX.json")
    with open(out, "w") as f:
        json.dump({"device": str(jax.devices()[0]), "results": results}, f, indent=1)
    print(json.dumps(results))
    if failures:
        raise SystemExit(f"FAILED configs: {failures}")


if __name__ == "__main__":
    main()
