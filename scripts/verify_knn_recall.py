"""Pin approx_knn (lax.approx_max_k) recall on REAL TPU semantics.

The covariance-estimation path uses ``approx_knn`` (ops/knn.py), whose
recall claim (~98% at k=10) only manifests on TPU — CPU lowers
``approx_max_k`` to an exact top-k, so the pytest suite cannot catch a TPU
recall regression.  This script measures neighbor recall against the exact
brute-force oracle on realistic clouds (the bundled scan pair post-voxel +
a synthetic Velodyne scan), records scripts/KNN_RECALL.json (like
TPU_MATRIX.json), and exits nonzero below the 97% floor.

Run on the chip: python scripts/verify_knn_recall.py
"""

import json
from functools import partial
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

from sycl_points_tpu.ops.filters import box_filter
from sycl_points_tpu.ops.knn import approx_knn, brute_force_knn
from sycl_points_tpu.ops.voxel import voxel_downsample
from sycl_points_tpu.points import io
from sycl_points_tpu.points.point_cloud import PointCloud, pad_capacity_for

REF_DATA = "/root/reference/cpp/data"
# Floors: 0.97 at the operating k of the covariance path (k=10, single-pass
# recall 0.983 measured).  k>=16 call sites (robust-covariance MAX_K tiers)
# auto-select the TWO-PASS union (ops/knn.py approx_knn: a second
# stride-permuted PartialReduce pass gives an independent window partition;
# exact top-k of the union measured 0.999 recall at k=20 vs 0.955
# single-pass), so the k=20 floor sits at 0.98 with ~1.9 pt margin.
RECALL_FLOORS = {10: 0.97, 20: 0.98}


def recall_on(cloud: PointCloud, k: int) -> float:
    """Fraction of exact k-NN indices found by approx_knn (per query set)."""
    # jit both searches: eager op-by-op dispatch over the dev tunnel is one
    # round trip per op and looks like a stall to the runner's watchdog
    approx = jax.jit(partial(approx_knn, k=k))(cloud.points, cloud.mask, cloud.points)
    exact = jax.jit(partial(brute_force_knn, k=k))(cloud.points, cloud.mask, cloud.points)
    ai = np.asarray(approx.indices)
    ei = np.asarray(exact.indices)
    mask = np.asarray(cloud.mask)
    hits = 0
    total = 0
    for q in range(ai.shape[0]):
        if not mask[q]:
            continue
        hits += len(np.intersect1d(ai[q], ei[q]))
        total += k
    return hits / max(total, 1)


def bundled_cloud():
    tgt_np = io.read_file(f"{REF_DATA}/target.ply")
    raw = PointCloud.from_numpy(
        tgt_np["points"], capacity=pad_capacity_for(len(tgt_np["points"]))
    )
    c = box_filter(raw, 0.5, 50.0)
    return voxel_downsample(c, 0.25, out_capacity=8192)


def velodyne_cloud():
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "benchmarks")
    )
    from synthetic_velodyne import World, scan_at

    T = np.eye(4)
    T[:3, 3] = [0, 0, 1.8]
    pts = scan_at(World(), T, seed=0, cache_tag="recall_scan")
    raw = PointCloud.from_numpy(pts, capacity=pad_capacity_for(len(pts)))
    c = box_filter(raw, 0.5, 50.0)
    return voxel_downsample(c, 0.25, out_capacity=32768)


def main():
    rows = []
    ok = True
    for name, cloud_fn in (("bundled-pair-voxel0.25", bundled_cloud),
                           ("synthetic-velodyne-voxel0.25", velodyne_cloud)):
        cloud = cloud_fn()
        for k in (10, 20):
            r = recall_on(cloud, k)
            rows.append(
                dict(cloud=name, n=int(np.asarray(cloud.mask).sum()), k=k,
                     recall=round(float(r), 4))
            )
            print(rows[-1], flush=True)
            ok &= r >= RECALL_FLOORS[k]

    # cost of the k=20 two-pass union vs single-pass, marginal in-program
    # protocol
    import time
    import jax.numpy as jnp
    cloud = velodyne_cloud()

    def marginal_ms(make_body, reps=(1, 9), iters=3):
        def make(n):
            @jax.jit
            def run(salt):
                return jax.lax.fori_loop(0, n, make_body, salt)
            return run
        ts = {}
        for n in reps:
            run = make(n)
            float(run(jnp.float32(0.0)))
            best = float("inf")
            for i in range(iters):
                t0 = time.perf_counter()
                float(run(jnp.float32(1e-6 * (i + 1))))
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
        return (ts[reps[1]] - ts[reps[0]]) / (reps[1] - reps[0]) * 1e3

    def body_at(two_pass):
        def body(i, acc):
            p = cloud.points + 1e-12 * acc
            r = approx_knn(p, cloud.mask, p, 20, two_pass=two_pass)
            return acc + r.distances[0, 0]
        return body

    cost = {
        "k20_ms_single_pass": round(marginal_ms(body_at(False)), 3),
        "k20_ms_two_pass": round(marginal_ms(body_at(True)), 3),
    }
    print(cost, flush=True)

    out = dict(
        backend=jax.default_backend(),
        device=str(jax.devices()[0]),
        recall_floors=RECALL_FLOORS,
        recall_target_cost=cost,
        passed=bool(ok),
        rows=rows,
    )
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "KNN_RECALL.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, "passed:", ok)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
