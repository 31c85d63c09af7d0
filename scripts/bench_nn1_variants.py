"""nn1 kernel variants: can the ICP correspondence search beat the current
per-chunk min+argmin formulation?

Variants (all exact distances, f32 VPU):
  v0  current production kernel (per-chunk min+argmin, mask via where)
  v1  additive mask bias (precomputed [1, M] f32 0/BIG added into d2)
  v2  elementwise accumulator: per-chunk work is pure elementwise
      (distance + compare + 2 selects into [TQ, C] best/bidx accumulators,
      NO per-chunk cross-lane reduction); one min+argmin at the end.
  v3  v1 with two target chunks per loop body (unroll x2).

Correctness: indices compared against v0 on random clouds (ties are
measure-zero on random data); distances must match exactly.

Usage: python scripts/bench_nn1_variants.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sycl_points_tpu.points.point_cloud import round_up

_BIG = 3.0e38
_IBIG = 2**31 - 1


def wrap(kernel, query_tile, target_chunk, with_bias):
    @jax.jit
    def nn1(target_points, target_mask, query_points):
        Q, M = query_points.shape[0], target_points.shape[0]
        Qp = round_up(Q, query_tile)
        Mp = round_up(M, target_chunk)
        q = jnp.zeros((Qp, 4), jnp.float32).at[:Q, :3].set(query_points)
        t = jnp.zeros((4, Mp), jnp.float32).at[:3, :M].set(target_points.T)
        if with_bias:
            m = jnp.full((1, Mp), _BIG, jnp.float32).at[0, :M].set(
                jnp.where(target_mask, 0.0, _BIG)
            )
            m_spec = pl.BlockSpec((1, Mp), lambda g: (0, 0), memory_space=pltpu.VMEM)
        else:
            m = jnp.zeros((1, Mp), jnp.int32).at[0, :M].set(
                target_mask.astype(jnp.int32)
            )
            m_spec = pl.BlockSpec((1, Mp), lambda g: (0, 0), memory_space=pltpu.VMEM)
        d, i = pl.pallas_call(
            kernel,
            grid=(Qp // query_tile,),
            in_specs=[
                pl.BlockSpec((query_tile, 4), lambda g: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((4, Mp), lambda g: (0, 0), memory_space=pltpu.VMEM),
                m_spec,
            ],
            out_specs=[
                pl.BlockSpec((query_tile,), lambda g: (g,), memory_space=pltpu.VMEM),
                pl.BlockSpec((query_tile,), lambda g: (g,), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Qp,), jnp.float32),
                jax.ShapeDtypeStruct((Qp,), jnp.int32),
            ],
        )(q, t, m)
        return i[:Q], d[:Q]

    return nn1


def make_v0(query_tile, target_chunk):
    def kernel(q_ref, t_ref, mask_ref, d_ref, i_ref):
        q = q_ref[:]
        q0, q1, q2 = q[:, 0:1], q[:, 1:2], q[:, 2:3]
        n_chunks = t_ref.shape[1] // target_chunk

        def body(c, carry):
            best_d, best_i = carry
            sl = pl.ds(c * target_chunk, target_chunk)
            tc = t_ref[:, sl]
            e0 = q0 - tc[0:1, :]
            e1 = q1 - tc[1:2, :]
            e2 = q2 - tc[2:3, :]
            d2 = e0 * e0 + e1 * e1 + e2 * e2
            d2 = jnp.where(mask_ref[:, sl] != 0, d2, _BIG)
            cd = jnp.min(d2, axis=1)
            ci = jnp.argmin(d2, axis=1).astype(jnp.int32) + c * target_chunk
            take = cd < best_d
            return jnp.where(take, cd, best_d), jnp.where(take, ci, best_i)

        init = (jnp.full((q.shape[0],), _BIG, jnp.float32),
                jnp.zeros((q.shape[0],), jnp.int32))
        best_d, best_i = jax.lax.fori_loop(0, n_chunks, body, init)
        d_ref[:] = best_d
        i_ref[:] = best_i

    return wrap(kernel, query_tile, target_chunk, with_bias=False)


def make_v1(query_tile, target_chunk):
    def kernel(q_ref, t_ref, bias_ref, d_ref, i_ref):
        q = q_ref[:]
        q0, q1, q2 = q[:, 0:1], q[:, 1:2], q[:, 2:3]
        n_chunks = t_ref.shape[1] // target_chunk

        def body(c, carry):
            best_d, best_i = carry
            sl = pl.ds(c * target_chunk, target_chunk)
            tc = t_ref[:, sl]
            e0 = q0 - tc[0:1, :]
            e1 = q1 - tc[1:2, :]
            e2 = q2 - tc[2:3, :]
            d2 = e0 * e0 + e1 * e1 + e2 * e2 + bias_ref[:, sl]
            cd = jnp.min(d2, axis=1)
            ci = jnp.argmin(d2, axis=1).astype(jnp.int32) + c * target_chunk
            take = cd < best_d
            return jnp.where(take, cd, best_d), jnp.where(take, ci, best_i)

        init = (jnp.full((q.shape[0],), _BIG, jnp.float32),
                jnp.zeros((q.shape[0],), jnp.int32))
        best_d, best_i = jax.lax.fori_loop(0, n_chunks, body, init)
        d_ref[:] = best_d
        i_ref[:] = best_i

    return wrap(kernel, query_tile, target_chunk, with_bias=True)


def make_v2(query_tile, target_chunk):
    def kernel(q_ref, t_ref, bias_ref, d_ref, i_ref):
        q = q_ref[:]
        q0, q1, q2 = q[:, 0:1], q[:, 1:2], q[:, 2:3]
        n_chunks = t_ref.shape[1] // target_chunk
        col = jax.lax.broadcasted_iota(jnp.int32, (1, target_chunk), 1)

        def body(c, carry):
            best, bidx = carry
            sl = pl.ds(c * target_chunk, target_chunk)
            tc = t_ref[:, sl]
            e0 = q0 - tc[0:1, :]
            e1 = q1 - tc[1:2, :]
            e2 = q2 - tc[2:3, :]
            d2 = e0 * e0 + e1 * e1 + e2 * e2 + bias_ref[:, sl]
            take = d2 < best
            best = jnp.where(take, d2, best)
            bidx = jnp.where(take, col + c * target_chunk, bidx)
            return best, bidx

        init = (
            jnp.full((q.shape[0], target_chunk), _BIG, jnp.float32),
            jnp.full((q.shape[0], target_chunk), _IBIG, jnp.int32),
        )
        best, bidx = jax.lax.fori_loop(0, n_chunks, body, init)
        cd = jnp.min(best, axis=1)
        # index among tied columns: smallest absolute winning index
        ci = jnp.min(jnp.where(best <= cd[:, None], bidx, _IBIG), axis=1)
        d_ref[:] = cd
        i_ref[:] = ci

    return wrap(kernel, query_tile, target_chunk, with_bias=True)


def make_v3(query_tile, target_chunk):
    def kernel(q_ref, t_ref, bias_ref, d_ref, i_ref):
        q = q_ref[:]
        q0, q1, q2 = q[:, 0:1], q[:, 1:2], q[:, 2:3]
        n_pairs = t_ref.shape[1] // (2 * target_chunk)

        def one(c):
            sl = pl.ds(c * target_chunk, target_chunk)
            tc = t_ref[:, sl]
            e0 = q0 - tc[0:1, :]
            e1 = q1 - tc[1:2, :]
            e2 = q2 - tc[2:3, :]
            d2 = e0 * e0 + e1 * e1 + e2 * e2 + bias_ref[:, sl]
            cd = jnp.min(d2, axis=1)
            ci = jnp.argmin(d2, axis=1).astype(jnp.int32) + c * target_chunk
            return cd, ci

        def body(p, carry):
            best_d, best_i = carry
            cd0, ci0 = one(2 * p)
            cd1, ci1 = one(2 * p + 1)
            cd = jnp.where(cd0 <= cd1, cd0, cd1)
            ci = jnp.where(cd0 <= cd1, ci0, ci1)
            take = cd < best_d
            return jnp.where(take, cd, best_d), jnp.where(take, ci, best_i)

        init = (jnp.full((q.shape[0],), _BIG, jnp.float32),
                jnp.zeros((q.shape[0],), jnp.int32))
        best_d, best_i = jax.lax.fori_loop(0, n_pairs, body, init)
        d_ref[:] = best_d
        i_ref[:] = best_i

    return wrap(kernel, query_tile, 2 * target_chunk, with_bias=True)


def marginal_ms(fn, t, m, q, reps=(1, 17), iters=3):
    def make(n):
        @jax.jit
        def run(t, m, q, salt):
            def body(_, carry):
                qc, acc = carry
                i, d = fn(t, m, qc + 1e-12 * acc)
                return qc, acc + d[0] + i[0].astype(jnp.float32)

            _, acc = jax.lax.fori_loop(0, n, body, (q + salt, jnp.float32(0.0)))
            return acc

        return run

    ts = {}
    for n in reps:
        f = make(n)
        float(f(t, m, q, jnp.float32(0.0)))
        best = np.inf
        for i in range(iters):
            t0 = time.perf_counter()
            float(f(t, m, q, jnp.float32(1e-6 * (i + 1))))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[reps[1]] - ts[reps[0]]) / (reps[1] - reps[0]) * 1e3


VARIANTS = {
    "v0-prod(1024,2048)": lambda: make_v0(1024, 2048),
    "v1-bias(1024,2048)": lambda: make_v1(1024, 2048),
    "v2-elt(1024,1024)": lambda: make_v2(1024, 1024),
    "v2-elt(512,2048)": lambda: make_v2(512, 2048),
    "v2-elt(512,1024)": lambda: make_v2(512, 1024),
    "v3-unroll2(1024,1024)": lambda: make_v3(1024, 1024),
}


def main():
    rng = np.random.default_rng(0)
    for Q, M in ((22528, 22528), (8192, 131072), (1024, 6144)):
        t = jnp.asarray(rng.uniform(-50, 50, (M, 3)).astype(np.float32))
        mask_np = np.ones((M,), bool)
        mask_np[:: 37] = False  # some invalid rows to exercise masking
        m = jnp.asarray(mask_np)
        q = jnp.asarray(rng.uniform(-50, 50, (Q, 3)).astype(np.float32))
        ref_i = ref_d = None
        for name, mk in VARIANTS.items():
            fn = mk()
            try:
                i, d = jax.block_until_ready(fn(t, m, q))
            except Exception as e:
                print(f"Q={Q} M={M} {name}: FAILED {type(e).__name__}: {e}",
                      flush=True)
                continue
            i, d = np.asarray(i), np.asarray(d)
            if ref_i is None:
                ref_i, ref_d = i, d
            agree = float(np.mean(i == ref_i))
            dmax = float(np.max(np.abs(d - ref_d)))
            ms = marginal_ms(fn, t, m, q)
            print(
                f"Q={Q} M={M} {name}: {ms:7.3f} ms ({Q/ms/1e3:6.1f} Mq/s) "
                f"idx_agree={agree:.4f} dmax={dmax:.2e}",
                flush=True,
            )


if __name__ == "__main__":
    main()
