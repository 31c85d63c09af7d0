"""Micro-benchmark: pairwise-distance formulations for the KNN hot loop.

Variants over [Q,3] x [M,3] -> nn1 (argmin) result:
  matmul  — |q|^2+|t|^2-2 q.t^T with precision='highest' (6-pass bf16 MXU)
  bcast   — sum_k (q-t)^2 via broadcast (exact f32, VPU)
  default — matmul at default precision (bf16 products; accuracy check only)

Honest timing on the axon runtime: marginal in-program repetition —
run the body n times inside fori_loop, dt = (t(9) - t(1)) / 8.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def make_inputs(Q=6144, M=6144, seed=0):
    rng = np.random.default_rng(seed)
    t = (rng.uniform(-40, 40, size=(M, 3))).astype(np.float32)
    q = (rng.uniform(-40, 40, size=(Q, 3))).astype(np.float32)
    mask = np.ones((M,), bool)
    return jnp.asarray(q), jnp.asarray(t), jnp.asarray(mask)


def nn1_matmul(q, t, mask):
    qq = jnp.sum(q * q, axis=-1, keepdims=True)
    tt = jnp.sum(t * t, axis=-1)
    cross = jnp.dot(q, t.T, precision="highest", preferred_element_type=jnp.float32)
    d2 = jnp.maximum(qq + tt[None, :] - 2.0 * cross, 0.0)
    d2 = jnp.where(mask[None, :], d2, jnp.inf)
    i = jnp.argmin(d2, axis=1).astype(jnp.int32)
    return i, jnp.take_along_axis(d2, i[:, None], axis=1)[:, 0]


def nn1_bcast(q, t, mask):
    diff = q[:, None, :] - t[None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(mask[None, :], d2, jnp.inf)
    i = jnp.argmin(d2, axis=1).astype(jnp.int32)
    return i, jnp.take_along_axis(d2, i[:, None], axis=1)[:, 0]


def nn1_default(q, t, mask):
    qq = jnp.sum(q * q, axis=-1, keepdims=True)
    tt = jnp.sum(t * t, axis=-1)
    cross = jnp.dot(q, t.T, preferred_element_type=jnp.float32)
    d2 = jnp.maximum(qq + tt[None, :] - 2.0 * cross, 0.0)
    d2 = jnp.where(mask[None, :], d2, jnp.inf)
    i = jnp.argmin(d2, axis=1).astype(jnp.int32)
    return i, jnp.take_along_axis(d2, i[:, None], axis=1)[:, 0]


def marginal_ms(fn, q, t, mask, reps=(1, 9), iters=3):
    """dt = (t(reps[1]) - t(reps[0])) / (reps[1]-reps[0]) via fori_loop."""

    def make(n):
        @jax.jit
        def run(q, t, mask, salt):
            def body(_, carry):
                qc, acc = carry
                # 1e-12*acc: real data dependence (0.0*acc would be folded
                # and the body hoisted out of the loop).
                i, d = nn1(qc + 1e-12 * acc, t, mask)
                return qc, acc + d[0] + i.astype(jnp.float32)[0]

            _, acc = jax.lax.fori_loop(0, n, body, (q + salt, jnp.float32(0.0)))
            return acc

        return run

    times = {}
    for n in reps:
        run = make(n)
        run(q, t, mask, jnp.float32(0.0)).block_until_ready()
        best = np.inf
        for it in range(iters):
            salt = jnp.float32(1e-6 * (it + 1))
            t0 = time.perf_counter()
            float(run(q, t, mask, salt))  # scalar readback forces completion
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return (times[reps[1]] - times[reps[0]]) / (reps[1] - reps[0]) * 1e3


if __name__ == "__main__":
    q, t, mask = make_inputs()
    global nn1

    i_ref, d_ref = None, None
    for name, fn in [("matmul", nn1_matmul), ("bcast", nn1_bcast), ("default", nn1_default)]:
        nn1 = fn
        i, d = jax.jit(fn)(q, t, mask)
        i, d = np.asarray(i), np.asarray(d)
        if i_ref is None:
            i_ref, d_ref = i, d
        agree = float(np.mean(i == i_ref))
        ms = marginal_ms(fn, q, t, mask)
        print(f"{name:8s} marginal={ms:7.3f} ms  idx-agreement={agree:.4f}  "
              f"max|d2-ref|={float(np.max(np.abs(d - d_ref))):.3e}")
