"""Tile-size sweep for the Pallas nn1 kernel (ICP correspondence hot loop).

Measures query-tile x target-chunk combinations at registration-relevant
sizes; the winner sets the constants in ops/pallas_knn.py.

Usage: python scripts/bench_pallas_tiles.py
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


def make_nn1(query_tile: int, target_chunk: int):
    def kernel(q_ref, t_ref, mask_ref, d_ref, i_ref):
        q = q_ref[:]
        q0, q1, q2 = q[:, 0:1], q[:, 1:2], q[:, 2:3]
        M = t_ref.shape[1]
        n_chunks = M // target_chunk

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

    @functools.partial(jax.jit, static_argnames=())
    def nn1(target_points, target_mask, query_points):
        Q, M = query_points.shape[0], target_points.shape[0]
        Qp = round_up(Q, query_tile)
        Mp = round_up(M, target_chunk)
        q = jnp.zeros((Qp, 4), jnp.float32).at[:Q, :3].set(query_points)
        t = jnp.zeros((4, Mp), jnp.float32).at[:3, :M].set(target_points.T)
        mask = jnp.zeros((1, Mp), jnp.int32).at[0, :M].set(target_mask.astype(jnp.int32))
        d, i = pl.pallas_call(
            kernel,
            grid=(Qp // query_tile,),
            in_specs=[
                pl.BlockSpec((query_tile, 4), lambda g: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((4, Mp), lambda g: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Mp), lambda g: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((query_tile,), lambda g: (g,), memory_space=pltpu.VMEM),
                pl.BlockSpec((query_tile,), lambda g: (g,), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Qp,), jnp.float32),
                jax.ShapeDtypeStruct((Qp,), jnp.int32),
            ],
        )(q, t, mask)
        return i[:Q], d[:Q]

    return nn1


def marginal_ms(fn, t, m, q, reps=(1, 9), iters=3):
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
        f(t, m, q, jnp.float32(0.0)).block_until_ready()
        best = np.inf
        for i in range(iters):
            t0 = time.perf_counter()
            float(f(t, m, q, jnp.float32(1e-6 * (i + 1))))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[reps[1]] - ts[reps[0]]) / (reps[1] - reps[0]) * 1e3


def main():
    rng = np.random.default_rng(0)
    for Q, M in ((8192, 22528), (22528, 22528), (8192, 131072)):
        t = jnp.asarray(rng.uniform(-50, 50, (M, 3)).astype(np.float32))
        m = jnp.ones((M,), bool)
        q = jnp.asarray(rng.uniform(-50, 50, (Q, 3)).astype(np.float32))
        ref = None
        for qt in (1024, 2048):
            for tc in (512, 1024, 2048):
                if qt * tc * 4 > 9 * 2**20:
                    continue  # [qt, tc] f32 distance block exceeds scoped VMEM
                fn = make_nn1(qt, tc)
                i, d = fn(t, m, q)
                i = np.asarray(i)
                if ref is None:
                    ref = i
                agree = float(np.mean(i == ref))
                ms = marginal_ms(fn, t, m, q)
                print(
                    f"Q={Q} M={M} qtile={qt} tchunk={tc}: {ms:7.3f} ms "
                    f"({Q/ms/1e3:.1f} Mq/s) agree={agree:.4f}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
