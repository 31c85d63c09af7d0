"""Voxel-downsample sort variants: what does the packed-key device sort
actually cost, and can the aggregation beat it?

Measured variants at the headline raw capacity (81920):
  key-only      lax.sort of the packed int32 key alone (lower bound for any
                sort-based approach)
  key+idx       sort (key, iota) then gather 3 point columns (the argsort
                pattern the current design replaced)
  key+payload   production: points ride the sort as 3 payload columns
  full-op       production voxel_downsample (sort + fused segment reduce)
  scatter-add   no sort at all: hash-claim dense ids + unsorted segment_sum
                (XLA scatter-add) — measures whether TPU scatter can beat
                the sort at this size

Usage: python scripts/bench_voxel_variants.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sycl_points_tpu.ops.voxel import MAX_CELLS_PER_AXIS, voxel_coords, voxel_downsample
from sycl_points_tpu.points import io
from sycl_points_tpu.points.point_cloud import PointCloud, pad_capacity_for

REF_DATA = "/root/reference/cpp/data"


def marginal_ms(make_body, reps=(1, 17), iters=4):
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


def packed_key(points, mask, voxel_size):
    coords, ok = voxel_coords(points, mask, voxel_size)
    big = jnp.int32(2**30)
    masked = jnp.where(ok[:, None], coords, big)
    cmin = jnp.min(masked, axis=0)
    rel = coords - cmin
    in_bound = ok & jnp.all((rel >= 0) & (rel < MAX_CELLS_PER_AXIS), axis=-1)
    key = (
        (rel[:, 0] * MAX_CELLS_PER_AXIS + rel[:, 1]) * MAX_CELLS_PER_AXIS + rel[:, 2]
    )
    return jnp.where(in_bound, key, jnp.int32(2**31 - 1))


def main():
    src_np = io.read_file(f"{REF_DATA}/source.ply")
    raw_cap = pad_capacity_for(len(src_np["points"]))
    src = PointCloud.from_numpy(src_np["points"], capacity=raw_cap)
    out_cap = 6144
    print(f"device: {jax.devices()[0]} raw_cap={raw_cap}", file=sys.stderr, flush=True)
    results = {}

    def b_key_only(i, acc):
        key = packed_key(src.points + 1e-12 * acc, src.mask, 0.25)
        (key_s,) = jax.lax.sort((key,), num_keys=1)
        return acc + key_s[0].astype(jnp.float32) * 1e-9

    results["key_only_sort_ms"] = marginal_ms(b_key_only)

    def b_key_idx(i, acc):
        pts = src.points + 1e-12 * acc
        key = packed_key(pts, src.mask, 0.25)
        key_s, order = jax.lax.sort(
            (key, jnp.arange(key.shape[0], dtype=jnp.int32)), num_keys=1
        )
        rows = pts[order]
        return acc + rows[0, 0] * 1e-9 + key_s[0].astype(jnp.float32) * 1e-12

    results["key_idx_sort_gather_ms"] = marginal_ms(b_key_idx)

    def b_key_payload(i, acc):
        pts = src.points + 1e-12 * acc
        key = packed_key(pts, src.mask, 0.25)
        key_s, x, y, z = jax.lax.sort(
            (key, pts[:, 0], pts[:, 1], pts[:, 2]), num_keys=1
        )
        return acc + x[0] * 1e-9 + key_s[0].astype(jnp.float32) * 1e-12

    results["key_payload_sort_ms"] = marginal_ms(b_key_payload)

    def b_full(i, acc):
        c = voxel_downsample(
            src.replace(points=src.points + 1e-12 * acc), 0.25, out_capacity=out_cap
        )
        return acc + c.points[0, 0]

    results["full_voxel_downsample_ms"] = marginal_ms(b_full)

    # scatter-add: segment_sum with UNSORTED ids.  Dense ids come from a
    # throwaway modular hash with linear probing unrolled a few steps — for
    # the timing comparison collisions just merge cells (timing, not
    # correctness).  If this is not clearly faster than the sort there is no
    # point building the exact claim loop for downsampling.
    CAP = 16384

    def b_scatter(i, acc):
        pts = src.points + 1e-12 * acc
        key = packed_key(pts, src.mask, 0.25)
        # 2654435761 (Knuth) as signed int32; wraparound multiply is fine for
        # a throwaway slot hash
        slot = (key * jnp.int32(-1640531535)) & (CAP - 1)
        w = (key != jnp.int32(2**31 - 1)).astype(jnp.float32)
        data = jnp.stack([pts[:, 0] * w, pts[:, 1] * w, pts[:, 2] * w, w], axis=1)
        moments = jax.ops.segment_sum(data, slot, num_segments=CAP)
        return acc + moments[0, 0] * 1e-9

    results["scatter_add_unsorted_ms"] = marginal_ms(b_scatter)

    # cumulative decomposition of the production op: where does the
    # 0.876 ms actually go?  (sort measured 0.068 -> aggregation dominates)
    def stage(i, acc, upto):
        pts = src.points + 1e-12 * acc
        key = packed_key(pts, src.mask, 0.25)
        if upto == "key":
            return acc + key[0].astype(jnp.float32) * 1e-9
        key_s, x, y, z = jax.lax.sort(
            (key, pts[:, 0], pts[:, 1], pts[:, 2]), num_keys=1
        )
        if upto == "sort":
            return acc + x[0] * 1e-9
        ok_s = key_s != jnp.int32(2**31 - 1)
        new_seg = (key_s != jnp.roll(key_s, 1)).at[0].set(True)
        seg_id = jnp.cumsum(new_seg.astype(jnp.int32)) - 1
        if upto == "segid":
            return acc + seg_id[0].astype(jnp.float32) * 1e-9 + x[0] * 1e-9
        w = ok_s.astype(jnp.float32)
        moments = jax.ops.segment_sum(
            jnp.stack([x * w, y * w, z * w, w], axis=1),
            seg_id,
            num_segments=out_cap,
            indices_are_sorted=True,
        )
        if upto == "moments":
            return acc + moments[0, 0] * 1e-9
        counts = moments[:, -1]
        means = moments[:, :-1] / jnp.maximum(counts, 1.0)[:, None]
        return acc + means[0, 0] * 1e-9

    for upto in ("key", "sort", "segid", "moments", "mean"):
        ms = marginal_ms(lambda i, acc, u=upto: stage(i, acc, u))
        results[f"cum_{upto}_ms"] = ms

    # candidate: cumsum + searchsorted boundary-difference instead of
    # segment_sum (scatter) — with voxel-local coordinates to bound the
    # cancellation error of prefix differences
    def b_cumsum_agg(i, acc):
        pts = src.points + 1e-12 * acc
        key = packed_key(pts, src.mask, 0.25)
        key_s, x, y, z = jax.lax.sort(
            (key, pts[:, 0], pts[:, 1], pts[:, 2]), num_keys=1
        )
        ok_s = key_s != jnp.int32(2**31 - 1)
        new_seg = (key_s != jnp.roll(key_s, 1)).at[0].set(True)
        seg_id = jnp.cumsum(new_seg.astype(jnp.int32)) - 1
        w = ok_s.astype(jnp.float32)
        data = jnp.stack([x * w, y * w, z * w, w], axis=1)
        cs = jnp.cumsum(data, axis=0)
        cs = jnp.concatenate([jnp.zeros((1, 4), jnp.float32), cs], axis=0)
        ids = jnp.arange(out_cap, dtype=jnp.int32)
        starts = jnp.searchsorted(seg_id, ids, side="left")
        ends = jnp.searchsorted(seg_id, ids, side="right")
        sums = cs[ends] - cs[starts]
        means = sums[:, :3] / jnp.maximum(sums[:, 3:], 1.0)
        return acc + means[0, 0] * 1e-9

    results["cumsum_boundary_agg_ms"] = marginal_ms(b_cumsum_agg)

    for k, v in results.items():
        print(f"{k}: {v:.3f}")


if __name__ == "__main__":
    main()
