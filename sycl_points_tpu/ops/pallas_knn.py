"""Pallas TPU kernel for 1-nearest-neighbor search (the ICP hot loop).

The correspondence search (k=1) runs every ICP iteration
(knn/bruteforce.hpp:24-96 / kdtree search in fateshelled/sycl_points).  The
XLA path materializes the [Q, M] distance matrix in HBM between the matmul
and the argmin; this kernel keeps everything in VMEM: each grid program owns
a query tile, holds the whole target in VMEM (point-cloud scale fits
easily: 32k points = 400 KB), loops over target chunks computing the
distance block on the MXU, and folds a running (min, argmin) without ever
writing distances back to HBM.

Falls back to the XLA path on non-TPU platforms unless ``interpret=True``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sycl_points_tpu.points.point_cloud import round_up

# 1024 matches the XLA layout tiling for 1-D f32 outputs (Mosaic verifies
# the operand layout against the block shape).  Target chunk 2048 is the
# measured optimum (scripts/bench_pallas_tiles.py sweep on v5e): 2.5-3x
# faster than 512 at 22k-131k targets; [1024, 2048] f32 distance blocks
# (8 MB) stay inside scoped VMEM, [2048, 2048] does not.
_QUERY_TILE = 1024
_TARGET_CHUNK = 2048
_BIG = 3.0e38


def _nn1_kernel(q_ref, t_ref, mask_ref, d_ref, i_ref):
    """One query tile vs the full target (chunked).

    Distances are the unrolled per-coordinate broadcast sum_k (q_k - t_k)^2:
    exact f32 on the VPU.  (An MXU dot would round coordinate products to
    bf16 — ~32% wrong neighbors on real scans — and 'highest' emulation
    measures 4x slower for a contraction dim of 3.)
    """
    q = q_ref[:]  # [TQ, 4] (xyz + zero pad)
    q0, q1, q2 = q[:, 0:1], q[:, 1:2], q[:, 2:3]  # [TQ, 1] each
    M = t_ref.shape[1]
    n_chunks = M // _TARGET_CHUNK

    def body(c, carry):
        best_d, best_i = carry
        sl = pl.ds(c * _TARGET_CHUNK, _TARGET_CHUNK)
        tc = t_ref[:, sl]  # [4, C]
        e0 = q0 - tc[0:1, :]
        e1 = q1 - tc[1:2, :]
        e2 = q2 - tc[2:3, :]
        d2 = e0 * e0 + e1 * e1 + e2 * e2  # [TQ, C]
        d2 = jnp.where(mask_ref[:, sl] != 0, d2, _BIG)
        cd = jnp.min(d2, axis=1)
        ci = jnp.argmin(d2, axis=1).astype(jnp.int32) + c * _TARGET_CHUNK
        take = cd < best_d
        return jnp.where(take, cd, best_d), jnp.where(take, ci, best_i)

    init = (jnp.full((q.shape[0],), _BIG, jnp.float32), jnp.zeros((q.shape[0],), jnp.int32))
    best_d, best_i = jax.lax.fori_loop(0, n_chunks, body, init)
    d_ref[:] = best_d
    i_ref[:] = best_i


def prep_target(target_points: jax.Array, target_mask: jax.Array):
    """Kernel-ready target operands: padded transposed coords ``[4, Mp]`` and
    an int32 mask row ``[1, Mp]``.

    The ICP loop re-searches the SAME target every iteration with a new pose
    folded into the queries; preparing the target once per align (hoisted out
    of the ``lax.while_loop``) instead of per search saves the transpose +
    pad + mask-convert passes every iteration (~0.5 ms/iter at 24k targets,
    measured — XLA does not loop-invariant-hoist through the pallas_call)."""
    M = target_points.shape[0]
    Mp = round_up(M, _TARGET_CHUNK)
    t = jnp.zeros((4, Mp), jnp.float32).at[:3, :M].set(target_points.T)
    mask = jnp.zeros((1, Mp), jnp.int32).at[0, :M].set(target_mask.astype(jnp.int32))
    return t, mask


@functools.partial(jax.jit, static_argnames=("interpret",))
def nn1_pallas(
    target_points: jax.Array,  # [M, 3]
    target_mask: jax.Array,  # [M] bool
    query_points: jax.Array,  # [Q, 3]
    interpret: bool = False,
):
    """Exact nearest neighbor: returns (indices [Q], sq_distances [Q])."""
    t, mask = prep_target(target_points, target_mask)
    return nn1_pallas_prepped(t, mask, query_points, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def nn1_pallas_prepped(
    t: jax.Array,  # [4, Mp] from prep_target
    mask: jax.Array,  # [1, Mp] int32 from prep_target
    query_points: jax.Array,  # [Q, 3]
    interpret: bool = False,
):
    """Exact nearest neighbor on a prepared target: (indices, sq_dists) [Q]."""
    Q, Mp = query_points.shape[0], t.shape[1]
    Qp = round_up(Q, _QUERY_TILE)

    q = jnp.zeros((Qp, 4), jnp.float32).at[:Q, :3].set(query_points)

    grid = (Qp // _QUERY_TILE,)
    d, i = pl.pallas_call(
        _nn1_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_QUERY_TILE, 4), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, Mp), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_QUERY_TILE,), lambda g: (g,), memory_space=pltpu.VMEM),
            pl.BlockSpec((_QUERY_TILE,), lambda g: (g,), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Qp,), jnp.float32),
            jax.ShapeDtypeStruct((Qp,), jnp.int32),
        ],
        interpret=interpret,
    )(q, t, mask)
    d = jnp.where(d >= _BIG, jnp.inf, d)
    return i[:Q], d[:Q]
