"""Parallel-candidate LM vs a sequential transcription of the reference.

``align()`` evaluates all LM inner-loop lambda candidates in one batched
pass and selects the first accept-or-plateau candidate (registration.py).
This test proves the batched selection is semantically identical to a
literal sequential transcription of the reference inner loop
(registration.hpp:830-895: accept on ``new_error <= current_error``,
plateau-take on ``|new_error - last_error| <= 1e-6`` (pose moves, loop
stops), otherwise climb lambda; on an exhausted sweep ``converged`` keeps
the last trial's value) over many random problems.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sycl_points_tpu.ops.knn import BruteForceKNN
from sycl_points_tpu.ops.robust import RobustLossType
import sycl_points_tpu.registration.registration as R
from sycl_points_tpu.registration.factors import RegType
from sycl_points_tpu.registration.registration import (
    LevenbergMarquardtParams,
    RegistrationParams,
    RobustParams,
    align,
)
from sycl_points_tpu.utils import lie
from sycl_points_tpu.utils.smallmat import solve_psd


def _sequential_lm_align(source, target, knn, params, T0):
    """Literal reference semantics: python loops, same jitted kernels."""
    p = params.lm
    T = jnp.asarray(T0, jnp.float32)
    lam = float(p.init_lambda)
    clamp = lambda v: float(np.clip(v, p.min_lambda, p.max_lambda))
    rs = jnp.float32(params.robust.default_scale)
    one = jnp.float32(1.0)
    src_covs_reg, tgt = R._precompute_targets(params, source, target)
    converged = False
    total_it = 0
    err_out, inl_out = 0.0, 0
    for _ in range(params.max_iterations):
        corr = R._correspondences(params, knn, source.points, source.mask, T, tgt)
        lin = R._linearize(params, T, source.points, src_covs_reg, corr, rs, one)
        H, g = lin.H, lin.b
        cur_err, inlier = float(lin.error), int(lin.inlier)
        err_out, inl_out = cur_err, inlier
        last_error = float(np.finfo(np.float32).max)
        total_it += 1
        for _i in range(p.max_inner_iterations):
            delta, _ok = solve_psd(H + lam * jnp.eye(6, dtype=jnp.float32), -g)
            converged = bool(R._is_converged(params, delta))
            T_c = T @ lie.se3_exp(delta)
            err, inl = R._error_at(
                params, T_c, source.points, src_covs_reg, corr, rs, one
            )
            err, inl = float(err), int(inl)
            if err <= cur_err:
                T = T_c
                lam = clamp(lam / p.lambda_factor)
                err_out, inl_out = err, inl
                break
            elif abs(err - last_error) <= 1e-6:
                T = T_c
                err_out, inl_out = err, inl
                break
            else:
                lam = clamp(lam * p.lambda_factor)
            last_error = err
        if converged:
            break
    return np.asarray(T), converged, total_it, err_out, inl_out


def _random_problem(seed):
    from sycl_points_tpu.points.point_cloud import PointCloud

    rng = np.random.default_rng(seed)
    tgt_pts = rng.uniform(-3, 3, size=(384, 3)).astype(np.float32)
    # structured surfaces make the problem non-trivially curved
    tgt_pts[:128, 2] = 0.1 * np.sin(tgt_pts[:128, 0] * 2.0)
    tgt_pts[128:256, 0] = 0.1 * np.cos(tgt_pts[128:256, 1])
    rot = np.asarray(
        lie.quat_to_matrix(lie.so3_exp(jnp.asarray(rng.uniform(-0.15, 0.15, 3), jnp.float32)))
    )
    t = rng.uniform(-0.3, 0.3, 3).astype(np.float32)
    src_pts = (tgt_pts[rng.permutation(384)[:256]] @ rot.T) + t
    src_pts += rng.normal(scale=0.01, size=src_pts.shape).astype(np.float32)
    source = PointCloud.from_numpy(src_pts, capacity=256)
    target = PointCloud.from_numpy(tgt_pts, capacity=384)
    return source, target


@pytest.mark.parametrize("seed", range(12))
@pytest.mark.parametrize("init_lambda", [1e-6, 1.0, 50.0])
def test_lm_parallel_matches_sequential(seed, init_lambda):
    source, target = _random_problem(seed)
    knn = BruteForceKNN.build(target)
    loss = [RobustLossType.NONE, RobustLossType.GEMAN_MCCLURE, RobustLossType.TUKEY][
        seed % 3
    ]
    params = RegistrationParams(
        reg_type=RegType.POINT_TO_POINT,
        robust=RobustParams(type=loss, default_scale=0.5),
        optimization_method="levenberg_marquardt",
        lm=LevenbergMarquardtParams(init_lambda=init_lambda, max_inner_iterations=6),
        max_iterations=8,
    )
    T0 = jnp.eye(4, dtype=jnp.float32)

    T_seq, conv_seq, it_seq, err_seq, inl_seq = _sequential_lm_align(
        source, target, knn, params, T0
    )
    res = align(source, target, knn, params, initial_guess=T0)

    assert int(res.iterations) == it_seq
    assert bool(res.converged) == conv_seq
    np.testing.assert_allclose(np.asarray(res.T), T_seq, atol=2e-4)
    assert int(res.inlier) == inl_seq
    np.testing.assert_allclose(float(res.error), err_seq, rtol=2e-3, atol=1e-4)
