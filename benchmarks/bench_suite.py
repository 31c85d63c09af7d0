"""Secondary benchmark suite: BASELINE.json configs 1, 2, 4, 5.

(Config 3 — robust GICP on the bundled pair — is the headline `bench.py`.)

All timings use the marginal in-program repetition protocol (run the body n
times inside one fori_loop, dt = (t(n1) - t(n0)) / (n1 - n0)), the only
honest protocol on the axon TPU runtime (block_until_ready does not wait;
host readbacks flip the session into a ~30 ms/call sync mode).

Usage: python benchmarks/bench_suite.py [--json out.json]
"""

import argparse
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from sycl_points_tpu.ops.covariance import estimate_covariances, extract_normals
from sycl_points_tpu.ops.filters import box_filter
from sycl_points_tpu.ops.knn import BruteForceKNN, approx_knn
from sycl_points_tpu.ops.polar import polar_downsample
from sycl_points_tpu.ops.robust import RobustLossType
from sycl_points_tpu.ops.sampling import farthest_point_sampling, random_sampling
from sycl_points_tpu.ops.voxel import voxel_downsample
from sycl_points_tpu.points import io
from sycl_points_tpu.points.point_cloud import PointCloud, pad_capacity_for
from sycl_points_tpu.registration.factors import RegType
from sycl_points_tpu.registration.pipeline import (
    RandomSamplingParams,
    RegistrationPipelineParams,
    RobustScheduleParams,
    VelocityUpdateParams,
    align_pipeline,
)
from sycl_points_tpu.registration.registration import (
    RegistrationParams,
    RobustParams,
    RotationConstraintParams,
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


def load_pair():
    src_np = io.read_file(f"{REF_DATA}/source.ply")
    tgt_np = io.read_file(f"{REF_DATA}/target.ply")
    raw_cap = pad_capacity_for(max(len(src_np["points"]), len(tgt_np["points"])))
    src = PointCloud.from_numpy(src_np["points"], capacity=raw_cap)
    tgt = PointCloud.from_numpy(tgt_np["points"], capacity=raw_cap)

    def hv(pts):
        linf = np.max(np.abs(pts), axis=1)
        pts = pts[(linf >= 0.5) & (linf <= 50.0)]
        return len(np.unique(np.floor(pts / 0.25).astype(np.int64), axis=0))

    cap = pad_capacity_for(max(hv(src_np["points"]), hv(tgt_np["points"])))
    return src, tgt, cap


def preprocess(cloud, cap, with_features=True):
    c = box_filter(cloud, 0.5, 50.0)
    c = voxel_downsample(c, 0.25, out_capacity=cap)
    if not with_features:
        return c
    knn = approx_knn(c.points, c.mask, c.points, 10)
    covs = estimate_covariances(c.points, knn)
    return c.replace(covs=covs, normals=extract_normals(c.points, covs))


def config1_point_to_point(src, tgt, cap):
    """Config 1: point-to-point ICP on the bundled pair (voxel + brute-force
    KNN), reference cpp/examples semantics with ICP instead of GICP."""
    params = RegistrationParams(
        reg_type=RegType.POINT_TO_POINT,
        optimization_method="gauss_newton",
        max_iterations=20,
    )

    def body(i, acc):
        s = preprocess(src.replace(points=src.points + 1e-12 * acc), cap, False)
        g = preprocess(tgt, cap, False)
        res = align(s, g, BruteForceKNN.build(g), params)
        return acc + res.error

    ms = marginal_ms(body)
    return {"config": "1-point-to-point-icp", "ms_per_pair": round(ms, 3)}


def config2_preprocess_suite(src, cap):
    """Config 2: preprocessing ops (voxel + polar downsample, random/FPS
    sampling, box filter, normals+covariances)."""
    out = {}

    def b_box(i, acc):
        c = box_filter(src.replace(points=src.points + 1e-12 * acc), 0.5, 50.0)
        return acc + c.points[0, 0]

    def b_voxel(i, acc):
        c = voxel_downsample(
            box_filter(src.replace(points=src.points + 1e-12 * acc), 0.5, 50.0),
            0.25, out_capacity=cap,
        )
        return acc + c.points[0, 0]

    def b_polar(i, acc):
        c = polar_downsample(
            src.replace(points=src.points + 1e-12 * acc), 0.5, 0.5, 0.5,
        )
        return acc + c.points[0, 0]

    key = jax.random.key(0)
    pre = jax.block_until_ready(jax.jit(lambda c: preprocess(c, cap, False))(src))

    def b_random(i, acc):
        c = random_sampling(
            pre.replace(points=pre.points + 1e-12 * acc), 1000,
            jax.random.fold_in(key, i),
        )
        return acc + c.points[0, 0]

    def b_fps(i, acc):
        c = farthest_point_sampling(
            pre.replace(points=pre.points + 1e-12 * acc), 256,
            jax.random.fold_in(key, i),
        )
        return acc + c.points[0, 0]

    def b_features(i, acc):
        p = pre.replace(points=pre.points + 1e-12 * acc)
        knn = approx_knn(p.points, p.mask, p.points, 10)
        covs = estimate_covariances(p.points, knn)
        n = extract_normals(p.points, covs)
        return acc + covs[0, 0, 0] + n[0, 0]

    out["box_filter_ms"] = round(marginal_ms(b_box), 3)
    out["voxel_downsample_ms"] = round(marginal_ms(b_voxel), 3)
    out["polar_downsample_ms"] = round(marginal_ms(b_polar), 3)
    out["random_sampling_ms"] = round(marginal_ms(b_random), 3)
    out["fps_256_ms"] = round(marginal_ms(b_fps), 3)
    out["covariances_normals_k10_ms"] = round(marginal_ms(b_features), 3)
    out["config"] = "2-preprocessing-suite"
    return out


def config4_genz_vicp(src, tgt, cap):
    """Config 4: GenZ-ICP + VICP (constant-velocity deskew interleaved with
    alignment) + LogDet rotation constraint, on a timestamped source."""
    n = src.capacity
    ts = jnp.linspace(0.0, 100.0, n, dtype=jnp.float32)  # ms offsets
    src_t = src.replace(timestamp_offsets=ts)

    params = RegistrationPipelineParams(
        registration=RegistrationParams(
            reg_type=RegType.GENZ,
            robust=RobustParams(type=RobustLossType.GEMAN_MCCLURE),
            rotation_constraint=RotationConstraintParams(enable=False),
            optimization_method="levenberg_marquardt",
            max_iterations=10,
        ),
        random_sampling=RandomSamplingParams(enable=True, num=1000),
        robust=RobustScheduleParams(
            auto_scale=True, init_scale=10.0, min_scale=2.5,
            rotation_init_scale=5.0, rotation_min_scale=2.5, auto_scaling_iter=2,
        ),
        velocity_update=VelocityUpdateParams(enable=True, iter=1),
    )
    key = jax.random.key(7)
    prev_pose = jnp.eye(4, dtype=jnp.float32)

    def body(i, acc):
        s = preprocess(src_t.replace(points=src_t.points + 1e-12 * acc), cap)
        # timestamps survive the voxel mean; GenZ needs normals (computed)
        g = preprocess(tgt, cap)
        out = align_pipeline(
            s, g, BruteForceKNN.build(g), params,
            key=key, prev_pose=prev_pose, dt=jnp.float32(0.1),
        )
        return acc + out.result.error

    ms = marginal_ms(body)
    return {"config": "4-genz-vicp", "ms_per_pair": round(ms, 3)}


def config5_odometry_step(src, tgt, cap):
    """Config 5: submap-odometry step — preprocess + align against a 3x
    larger map cloud + map insert reduction (the per-scan work of the
    voxel-hashmap odometry loop; full-sequence KITTI data is not bundled)."""
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
            rotation_init_scale=5.0, rotation_min_scale=2.5, auto_scaling_iter=2,
        ),
    )
    key = jax.random.key(3)

    # Build a map from the target (3 jittered inserts).
    g0 = jax.block_until_ready(jax.jit(lambda c: preprocess(c, cap))(tgt))

    def body(i, acc):
        s = preprocess(src.replace(points=src.points + 1e-12 * acc), cap)
        out = align_pipeline(s, g0, BruteForceKNN.build(g0), params, key=key)
        return acc + out.result.error

    ms = marginal_ms(body)
    return {"config": "5-odometry-step", "ms_per_scan": round(ms, 3)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    log(f"device: {jax.devices()[0]}")
    src, tgt, cap = load_pair()
    results = []
    for fn, a in (
        (config1_point_to_point, (src, tgt, cap)),
        (config2_preprocess_suite, (src, cap)),
        (config4_genz_vicp, (src, tgt, cap)),
        (config5_odometry_step, (src, tgt, cap)),
        (config6_lio_step, (src, tgt, cap)),
    ):
        t0 = time.perf_counter()
        r = fn(*a)
        r["compile_plus_measure_s"] = round(time.perf_counter() - t0, 1)
        log(json.dumps(r))
        results.append(r)
    print(json.dumps(results))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)




def config6_lio_step(src, tgt, cap):
    """Extra: 15-DOF LIO alignment step (GICP factor + IMU prior) —
    the per-scan solver of the LiDAR-inertial pipeline."""
    from sycl_points_tpu.imu.factor import State
    from sycl_points_tpu.lio import lio_registration as lio

    g0 = jax.block_until_ready(jax.jit(lambda c: preprocess(c, cap))(tgt))
    s0 = jax.block_until_ready(jax.jit(lambda c: preprocess(c, cap))(src))
    x_pred = State(
        position=jnp.zeros(3), rotation=jnp.eye(3), velocity=jnp.zeros(3),
        accel_bias=jnp.zeros(3), gyro_bias=jnp.zeros(3),
    )
    P = jnp.eye(15, dtype=jnp.float32) * 0.1

    def body(i, acc):
        s = s0.replace(points=s0.points + 1e-12 * acc)
        res = lio.align(
            s, g0, BruteForceKNN.build(g0), x_pred, P, P,
            factor_params=RegistrationParams(
                reg_type=RegType.GICP,
                robust=RobustParams(type=RobustLossType.GEMAN_MCCLURE, default_scale=2.5),
                optimization_method="levenberg_marquardt",
            ),
        )
        return acc + res.error

    ms = marginal_ms(body)
    return {"config": "6-lio-15dof-step", "ms_per_scan": round(ms, 3)}


if __name__ == "__main__":
    main()
