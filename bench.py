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

from sycl_points_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()
import numpy as np

from sycl_points_tpu.ops.covariance import estimate_covariances, extract_normals
from sycl_points_tpu.ops.filters import box_filter
from sycl_points_tpu.ops.knn import BruteForceKNN, approx_knn
from sycl_points_tpu.ops.robust import RobustLossType
from sycl_points_tpu.ops.voxel import voxel_downsample
from sycl_points_tpu.points import io
from sycl_points_tpu.points.point_cloud import PointCloud, pad_capacity_for
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
    # Downsample straight into the post-voxel capacity: the segment reduce
    # already emits voxels densely from slot 0, so no separate compaction
    # pass over the raw-capacity arrays is needed.
    c = voxel_downsample(c, VOXEL, out_capacity=cap)
    # Neighborhoods for covariance estimation: approx_max_k (98% recall,
    # 7.7x faster; exact on CPU).  The ICP correspondence search stays exact.
    knn = approx_knn(c.points, c.mask, c.points, K)
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
    def step(src_raw: PointCloud, tgt_raw: PointCloud, key):
        src = preprocess(src_raw, cap)
        tgt = preprocess(tgt_raw, cap)
        knn = BruteForceKNN.build(tgt)
        out = align_pipeline(src, tgt, knn, params, key=key)
        return out.result.T, out.result.inlier, out.result.error

    return step


def main():
    dev = jax.devices()[0]
    log(f"device: {dev}")
    src_np = io.read_file(f"{REF_DATA}/source.ply")
    tgt_np = io.read_file(f"{REF_DATA}/target.ply")
    raw_cap = pad_capacity_for(max(len(src_np["points"]), len(tgt_np["points"])))
    src = PointCloud.from_numpy(src_np["points"], capacity=raw_cap)
    tgt = PointCloud.from_numpy(tgt_np["points"], capacity=raw_cap)

    # Pick the static post-voxel capacity from the actual voxel count
    # (pure host numpy: keeps the device path limited to the timed step).
    def host_voxel_count(pts):
        linf = np.max(np.abs(pts), axis=1)
        pts = pts[(linf >= 0.5) & (linf <= 50.0)]
        return len(np.unique(np.floor(pts / VOXEL).astype(np.int64), axis=0))

    n_vox = max(host_voxel_count(src_np["points"]), host_voxel_count(tgt_np["points"]))
    cap = pad_capacity_for(n_vox)
    log(f"voxels: {n_vox} -> capacity {cap}")

    step = make_step(cap)
    params_holder = [RegistrationPipelineParams(
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
    )]
    key = jax.random.key(1234)
    t0 = time.perf_counter()
    T, inlier, error = jax.block_until_ready(step(src, tgt, key))
    log(f"compile+first run: {time.perf_counter()-t0:.1f}s")

    # MEASUREMENT NOTE (axon runtime): block_until_ready does not reliably
    # wait for device completion — timed loops without host readbacks report
    # fantasy sub-ms numbers, and a device->host readback flips the session
    # into a synchronous mode whose per-call time includes a ~30 ms tunnel
    # round trip.  The only trustworthy protocol is: force a tiny scalar
    # readback EVERY call (so each call provably completed) and subtract the
    # identically-measured trivial-program floor (pure link overhead).

    trivial = jax.jit(lambda x: (x * 2.0).sum())
    ones8 = jnp.ones(8)

    def timeit_sync(fn, *a, iters=16, warmup=2):
        """Interleaved differential timing: the link floor drifts by several
        ms, so each round times (trivial, target) back to back and the
        reported value is the median of per-round differences."""
        for _ in range(warmup):
            jax.device_get(trivial(ones8))
            jax.device_get(fn(*a))
        deltas, raws = [], []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.device_get(trivial(ones8))
            t1 = time.perf_counter()
            jax.device_get(fn(*a))
            t2 = time.perf_counter()
            deltas.append((t2 - t1) - (t1 - t0))
            raws.append(t2 - t1)
        return max(float(np.median(deltas)), 1e-6), float(np.median(raws))

    _, floor = timeit_sync(trivial, ones8)
    log(f"link floor (trivial program, per-call readback): {floor*1e3:.2f} ms")

    keys = jax.random.split(key, 256)
    kiter = iter(range(256))

    def step_scalar(a, b):
        return step(a, b, keys[next(kiter)])[2]  # scalar error -> readback

    dt_corr, dt_raw = timeit_sync(step_scalar, src, tgt)
    log(f"scan pair raw {dt_raw*1e3:.2f} ms; floor-corrected {dt_corr*1e3:.2f} ms")

    # --- sustained device throughput: marginal cost of one full scan pair,
    # measured by running the complete step body N times inside ONE program
    # (fori_loop, data-dependent) so per-call runtime overhead cancels.
    # This is how an on-device odometry loop executes in production.
    def make_rep(n):
        @jax.jit
        def f(a, b, k2):
            def body(i, carry):
                jitter, acc = carry
                a2 = a.replace(points=a.points + jitter)
                sc = preprocess(a2, cap)
                gc = preprocess(b, cap)
                out = align_pipeline(
                    sc, gc, BruteForceKNN.build(gc), params_holder[0],
                    key=jax.random.fold_in(k2, i),
                )
                return (out.result.error * 0e-9, acc + out.result.error)
            return jax.lax.fori_loop(0, n, body, (jnp.float32(0), jnp.float32(0)))[1]
        return f

    rep1, rep9 = make_rep(1), make_rep(9)
    k2 = keys[200]

    def med_sync(fn, iters=5):
        # Salt the key argument EVERY call: the runtime memoizes results per
        # (executable, inputs), so repeat calls with identical args return
        # without executing and the loop times pure link overhead.
        ks = jax.random.split(k2, iters + 1)
        jax.device_get(fn(src, tgt, ks[0]))
        ts = []
        for i in range(iters):
            t0 = time.perf_counter()
            jax.device_get(fn(src, tgt, ks[i + 1]))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t1, t9 = med_sync(rep1), med_sync(rep9)
    dt = max((t9 - t1) / 8.0, 1e-6)
    log(f"sustained scan pair (marginal, in-program): {dt*1e3:.2f} ms")

    # --- secondary metrics (BASELINE.json: KNN Mqueries/s, preprocess ms).
    # Same marginal in-program protocol as the headline: salted loop bodies
    # defeat the runtime's per-(executable, inputs) result memoization that
    # makes call-level timing report zeros.
    def marginal_ms(make_body, reps=(1, 17), iters=5):
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
        return max((ts[reps[1]] - ts[reps[0]]) / (reps[1] - reps[0]) * 1e3, 1e-3)

    def pre_body(i, acc):
        c = preprocess(src.replace(points=src.points + 1e-12 * acc), cap)
        return acc + c.points[0, 0]

    dt_pre = marginal_ms(pre_body) / 1e3
    log(f"preprocess one scan: {dt_pre*1e3:.2f} ms (marginal)")

    pre = jax.block_until_ready(jax.jit(lambda c: preprocess(c, cap))(src))

    def knn_body(i, acc):
        p = pre.points + 1e-12 * acc
        r = approx_knn(p, pre.mask, p, K)
        return acc + r.distances[0, 0]

    # The op is sub-ms: needs a wide rep spread to resolve above floor noise.
    dt_knn = marginal_ms(knn_body, reps=(1, 129)) / 1e3
    log(f"self-KNN k={K} on {cap}: {dt_knn*1e3:.2f} ms ({cap/dt_knn/1e6:.1f} Mq/s, marginal)")

    # accuracy sanity vs the committed ground truth
    T_gt = np.loadtxt(f"{REF_DATA}/T_target_source.txt")
    t_err = float(np.linalg.norm(np.asarray(T)[:3, 3] - T_gt[:3, 3]))
    log(f"inlier={int(inlier)} error={float(error):.2f} t_err={t_err*100:.1f} cm")

    pairs_per_sec = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": "bundled-pair preprocess+robust-GICP throughput (voxel 0.25, k=10, GEMAN_MCCLURE LM x3 levels)",
                "value": round(pairs_per_sec, 2),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_sec / TARGET_PAIRS_PER_SEC, 3),
                "extra": {
                    "sustained_ms_per_pair": round(dt * 1e3, 3),
                    "latency_ms_floor_corrected": round(dt_corr * 1e3, 3),
                    "latency_ms_raw_with_link_rtt": round(dt_raw * 1e3, 3),
                    "link_floor_ms": round(floor * 1e3, 3),
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
