"""Benchmark: full preprocess + robust-GICP alignment of the bundled scan
pair, mirroring the reference timing harness
(cpp/examples/example_registration.cpp:54-161: box filter 0.5-50 m, voxel
0.25 m, k=10 covariances+normals for BOTH clouds, then GICP with
GEMAN_MCCLURE annealing 10->2.5 over 3 levels, LM, <=10 iterations).

Prints ONE JSON line:
  {"metric": ..., "value": pairs/s, "unit": "pairs/s", "vs_baseline": x}
vs_baseline is measured against the BASELINE.json north-star target of a
<10 ms scan pair on one TPU v5e chip (i.e. 100 pairs/s == 1.0).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from sycl_points_tpu.ops.covariance import estimate_covariances, extract_normals
from sycl_points_tpu.ops.filters import box_filter
from sycl_points_tpu.ops.knn import BruteForceKNN, brute_force_knn
from sycl_points_tpu.ops.robust import RobustLossType
from sycl_points_tpu.ops.voxel import voxel_downsample
from sycl_points_tpu.points import io
from sycl_points_tpu.points.point_cloud import PointCloud, compact_device, pad_capacity_for
from sycl_points_tpu.registration.factors import RegType
from sycl_points_tpu.registration.pipeline import (
    RandomSamplingParams,
    RegistrationPipelineParams,
    RobustScheduleParams,
    align_pipeline,
)
from sycl_points_tpu.registration.registration import RegistrationParams, RobustParams

REF_DATA = "/root/reference/cpp/data"
VOXEL = 0.25
K = 10
TARGET_PAIRS_PER_SEC = 100.0  # north star: < 10 ms / pair on one v5e chip


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def preprocess(cloud: PointCloud, cap: int) -> PointCloud:
    c = box_filter(cloud, 0.5, 50.0)
    c = voxel_downsample(c, VOXEL)
    c = compact_device(c, out_capacity=cap)
    knn = brute_force_knn(c.points, c.mask, c.points, K)
    covs = estimate_covariances(c.points, knn)
    normals = extract_normals(c.points, covs)
    return c.replace(covs=covs, normals=normals)


def make_step(cap: int):
    params = RegistrationPipelineParams(
        registration=RegistrationParams(
            reg_type=RegType.GICP,
            robust=RobustParams(type=RobustLossType.GEMAN_MCCLURE),
            optimization_method="levenberg_marquardt",
            max_iterations=10,
        ),
        random_sampling=RandomSamplingParams(enable=True, num=1000),
        robust=RobustScheduleParams(
            auto_scale=True, init_scale=10.0, min_scale=2.5,
            rotation_init_scale=5.0, rotation_min_scale=2.5, auto_scaling_iter=3,
        ),
    )

    @jax.jit
    def step(src_raw: PointCloud, tgt_raw: PointCloud):
        src = preprocess(src_raw, cap)
        tgt = preprocess(tgt_raw, cap)
        knn = BruteForceKNN.build(tgt)
        out = align_pipeline(src, tgt, knn, params)
        return out.result.T, out.result.inlier, out.result.error

    return step


def main():
    dev = jax.devices()[0]
    log(f"device: {dev}")
    src_np = io.read_file(f"{REF_DATA}/source.ply")
    tgt_np = io.read_file(f"{REF_DATA}/target.ply")
    src = PointCloud.from_numpy(src_np["points"])
    tgt = PointCloud.from_numpy(tgt_np["points"])

    # Pick the static post-voxel capacity from the actual voxel count.
    # NOTE: jitted — eager execution of composite ops on the axon runtime is
    # pathologically slow and can destabilize the device link.
    count_fn = jax.jit(
        lambda a, b: jnp.maximum(
            voxel_downsample(box_filter(a, 0.5, 50.0), VOXEL).count(),
            voxel_downsample(box_filter(b, 0.5, 50.0), VOXEL).count(),
        )
    )
    n_vox = int(count_fn(src, tgt))
    cap = pad_capacity_for(n_vox)
    log(f"voxels: {n_vox} -> capacity {cap}")

    step = make_step(cap)
    t0 = time.perf_counter()
    T, inlier, error = jax.block_until_ready(step(src, tgt))
    log(f"compile+first run: {time.perf_counter()-t0:.1f}s")

    # accuracy sanity vs the committed ground truth
    T_gt = np.loadtxt(f"{REF_DATA}/T_target_source.txt")
    t_err = float(np.linalg.norm(np.asarray(T)[:3, 3] - T_gt[:3, 3]))
    log(f"inlier={int(inlier)} error={float(error):.2f} t_err={t_err*100:.1f} cm")

    def timeit(fn, *a, iters=30, warmup=3):
        for _ in range(warmup):
            jax.block_until_ready(fn(*a))
        t0 = time.perf_counter()
        for _ in range(iters):
            jax.block_until_ready(fn(*a))
        return (time.perf_counter() - t0) / iters

    dt = timeit(step, src, tgt)
    log(f"scan pair (preprocess x2 + robust GICP): {dt*1e3:.2f} ms")

    # --- secondary metrics (BASELINE.json: KNN Mqueries/s, preprocess ms) ---
    pre_fn = jax.jit(lambda c: preprocess(c, cap).points)
    dt_pre = timeit(pre_fn, src)
    log(f"preprocess one scan: {dt_pre*1e3:.2f} ms")

    pre = jax.block_until_ready(jax.jit(lambda c: preprocess(c, cap))(src))
    knn_fn = jax.jit(lambda c: brute_force_knn(c.points, c.mask, c.points, K).distances)
    dt_knn = timeit(knn_fn, pre)
    knn_mqps = cap * K / dt_knn / 1e6 if dt_knn > 0 else 0.0
    log(f"self-KNN k={K} on {cap}: {dt_knn*1e3:.2f} ms ({cap/dt_knn/1e6:.1f} Mq/s)")

    pairs_per_sec = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": "bundled-pair preprocess+robust-GICP throughput (voxel 0.25, k=10, GEMAN_MCCLURE LM x3 levels)",
                "value": round(pairs_per_sec, 2),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_sec / TARGET_PAIRS_PER_SEC, 3),
                "extra": {
                    "latency_ms": round(dt * 1e3, 3),
                    "preprocess_ms_per_scan": round(dt_pre * 1e3, 3),
                    "knn_k10_mqueries_per_s": round(cap / dt_knn / 1e6, 2),
                    "translation_err_cm": round(t_err * 100, 2),
                    "points_after_voxel": n_vox,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
