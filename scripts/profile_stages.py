"""Stage-level decomposition of the headline pair time and the config-8
exact full-cloud tier, using the marginal in-program protocol (the only
honest timing protocol on this runtime — see bench.py MEASUREMENT NOTE).

Usage: python scripts/profile_stages.py [--json out.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))

import jax
import jax.numpy as jnp
import numpy as np

from sycl_points_tpu.ops.covariance import estimate_covariances, extract_normals
from sycl_points_tpu.ops.filters import box_filter
from sycl_points_tpu.ops.knn import BruteForceKNN, approx_knn
from sycl_points_tpu.ops.pallas_knn import nn1_pallas
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

REF_DATA = "/root/reference/cpp/data"


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def marginal_ms(make_body, reps=(1, 9), iters=4):
    def make(n):
        @jax.jit
        def run(salt):
            return jax.lax.fori_loop(0, n, make_body, salt)

        return run

    ts = {}
    for n in reps:
        run = make(n)
        float(run(jnp.float32(0.0)))
        best = np.inf
        for i in range(iters):
            t0 = time.perf_counter()
            float(run(jnp.float32(1e-6 * (i + 1))))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[reps[1]] - ts[reps[0]]) / (reps[1] - reps[0]) * 1e3


def headline_stages(out):
    src_np = io.read_file(f"{REF_DATA}/source.ply")
    tgt_np = io.read_file(f"{REF_DATA}/target.ply")
    raw_cap = pad_capacity_for(max(len(src_np["points"]), len(tgt_np["points"])))
    src = PointCloud.from_numpy(src_np["points"], capacity=raw_cap)

    def hv(pts):
        linf = np.max(np.abs(pts), axis=1)
        pts = pts[(linf >= 0.5) & (linf <= 50.0)]
        return len(np.unique(np.floor(pts / 0.25).astype(np.int64), axis=0))

    cap = pad_capacity_for(max(hv(src_np["points"]), hv(tgt_np["points"])))
    out["headline_raw_cap"] = raw_cap
    out["headline_post_cap"] = cap

    def b_box(i, acc):
        c = box_filter(src.replace(points=src.points + 1e-12 * acc), 0.5, 50.0)
        return acc + c.points[0, 0] + c.mask[0]

    out["box_ms"] = round(marginal_ms(b_box, reps=(1, 33)), 3)

    boxed = jax.block_until_ready(jax.jit(lambda c: box_filter(c, 0.5, 50.0))(src))

    def b_vox(i, acc):
        c = voxel_downsample(
            boxed.replace(points=boxed.points + 1e-12 * acc), 0.25, out_capacity=cap
        )
        return acc + c.points[0, 0]

    out["voxel_ms"] = round(marginal_ms(b_vox, reps=(1, 17)), 3)

    vox = jax.block_until_ready(
        jax.jit(lambda c: voxel_downsample(c, 0.25, out_capacity=cap))(boxed)
    )

    def b_knn10(i, acc):
        p = vox.points + 1e-12 * acc
        r = approx_knn(p, vox.mask, p, 10)
        return acc + r.distances[0, 0]

    out["knn10_ms"] = round(marginal_ms(b_knn10, reps=(1, 33)), 3)

    knn = jax.block_until_ready(
        jax.jit(lambda c: approx_knn(c.points, c.mask, c.points, 10))(vox)
    )

    def b_cov(i, acc):
        covs = estimate_covariances(vox.points + 1e-12 * acc, knn)
        n = extract_normals(vox.points, covs)
        return acc + covs[0, 0, 0] + n[0, 0]

    out["cov_normals_ms"] = round(marginal_ms(b_cov, reps=(1, 33)), 3)

    # full preprocess for the align stage
    def preprocess(c):
        c = box_filter(c, 0.5, 50.0)
        c = voxel_downsample(c, 0.25, out_capacity=cap)
        r = approx_knn(c.points, c.mask, c.points, 10)
        covs = estimate_covariances(c.points, r)
        return c.replace(covs=covs, normals=extract_normals(c.points, covs))

    pre_s = jax.block_until_ready(jax.jit(preprocess)(src))
    tgt_full = PointCloud.from_numpy(tgt_np["points"], capacity=raw_cap)
    pre_t = jax.block_until_ready(jax.jit(preprocess)(tgt_full))

    # align_pipeline (sampled 1000 pts, annealed) alone on preprocessed clouds
    from sycl_points_tpu.registration.pipeline import (
        RandomSamplingParams,
        RegistrationPipelineParams,
        RobustScheduleParams,
        align_pipeline,
    )

    pparams = RegistrationPipelineParams(
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
    key = jax.random.key(7)

    def b_align(i, acc):
        s = pre_s.replace(points=pre_s.points + 1e-12 * acc)
        o = align_pipeline(s, pre_t, BruteForceKNN.build(pre_t), pparams,
                           key=jax.random.fold_in(key, i))
        return acc + o.result.error

    out["align_pipeline_ms"] = round(marginal_ms(b_align, reps=(1, 9)), 3)

    o = jax.jit(
        lambda s, t: align_pipeline(s, t, BruteForceKNN.build(t), pparams, key=key)
    )(pre_s, pre_t)
    out["align_iterations"] = int(o.result.iterations)

    # KNN build (target sort/structure) — included in the align body above
    def b_build(i, acc):
        k = BruteForceKNN.build(pre_t.replace(points=pre_t.points + 1e-12 * acc))
        return acc + k.points[0, 0]

    out["knn_build_ms"] = round(marginal_ms(b_build, reps=(1, 65)), 3)

    # nn1 at sampled-align scale (1024 queries x post_cap targets)
    q1k = pre_s.points[:1024]

    def b_nn1_small(i, acc):
        idx, d = nn1_pallas(pre_t.points, pre_t.mask, q1k + 1e-12 * acc)
        return acc + d[0]

    out["nn1_1k_x_cap_ms"] = round(marginal_ms(b_nn1_small, reps=(1, 65)), 3)
    return pre_s, pre_t


def fullcloud_stages(out):
    from synthetic_velodyne import World, scan_at

    w = World()
    T0 = np.eye(4)
    T0[:3, 3] = [0.0, 0.0, 1.8]
    T1 = T0.copy()
    yaw = np.deg2rad(2.0)
    T1[:3, :3] = np.array(
        [[np.cos(yaw), -np.sin(yaw), 0], [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]]
    )
    T1[:3, 3] = [1.0, 0.1, 1.8]
    tgt_np = scan_at(w, T0, seed=0, cache_tag="pair131k_tgt")
    src_np = scan_at(w, T1, seed=1, cache_tag="pair131k_src")
    raw_cap = pad_capacity_for(max(len(src_np), len(tgt_np)))
    src = PointCloud.from_numpy(src_np, capacity=raw_cap)
    tgt = PointCloud.from_numpy(tgt_np, capacity=raw_cap)

    def post_voxel_count(pts):
        linf = np.max(np.abs(pts), axis=1)
        p = pts[(linf >= 0.5) & (linf <= 50.0)]
        return len(np.unique(np.floor(p / 0.25).astype(np.int64), axis=0))

    n_post = max(post_voxel_count(src_np), post_voxel_count(tgt_np))
    post_cap = pad_capacity_for(n_post)
    out["fullcloud_post_cap"] = post_cap

    def preprocess(c):
        c = box_filter(c, 0.5, 50.0)
        c = voxel_downsample(c, 0.25, out_capacity=post_cap)
        r = approx_knn(c.points, c.mask, c.points, 10)
        covs = estimate_covariances(c.points, r)
        return c.replace(covs=covs, normals=extract_normals(c.points, covs))

    pre_s = jax.block_until_ready(jax.jit(preprocess)(src))
    pre_t = jax.block_until_ready(jax.jit(preprocess)(tgt))

    # nn1 kernel alone at full scale (the per-ICP-iteration correspondence)
    def b_nn1(i, acc):
        idx, d = nn1_pallas(pre_t.points, pre_t.mask, pre_s.points + 1e-12 * acc)
        return acc + d[0]

    out["nn1_full_ms"] = round(marginal_ms(b_nn1, reps=(1, 9)), 3)

    params = RegistrationParams(
        reg_type=RegType.GICP,
        robust=RobustParams(type=RobustLossType.GEMAN_MCCLURE, default_scale=2.5),
        optimization_method="levenberg_marquardt",
        max_iterations=10,
    )
    schedule = ((10.0, 5.0), (5.0, 2.5), (2.5, 2.5))

    res = jax.jit(
        lambda s, t: align(s, t, BruteForceKNN.build(t), params,
                           robust_schedule=schedule)
    )(pre_s, pre_t)
    out["fullcloud_iterations"] = int(res.iterations)

    def b_gicp(i, acc):
        s = pre_s.replace(points=pre_s.points + 1e-12 * acc)
        r = align(s, pre_t, BruteForceKNN.build(pre_t), params,
                  robust_schedule=schedule)
        return acc + r.error

    out["fullcloud_align_ms"] = round(marginal_ms(b_gicp, reps=(1, 5)), 3)
    out["fullcloud_ms_per_iter"] = round(
        out["fullcloud_align_ms"] / max(out["fullcloud_iterations"], 1), 3
    )

    # single-iteration variant (1 level, max_iterations=1): per-iteration cost
    import dataclasses

    p1 = dataclasses.replace(params, max_iterations=1)

    def b_one(i, acc):
        s = pre_s.replace(points=pre_s.points + 1e-12 * acc)
        r = align(s, pre_t, BruteForceKNN.build(pre_t), p1)
        return acc + r.error

    out["fullcloud_single_iter_align_ms"] = round(marginal_ms(b_one, reps=(1, 9)), 3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    log(f"device: {jax.devices()[0]}")
    out = {}
    headline_stages(out)
    log(f"headline: {json.dumps(out)}")
    fullcloud_stages(out)
    print(json.dumps(out, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
