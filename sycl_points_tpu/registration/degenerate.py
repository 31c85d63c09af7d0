"""Degeneracy-aware Tikhonov regularization of the ICP normal equations.

Replaces ``algorithms/registration/degenerate_regularization.hpp`` of
fateshelled/sycl_points ("nl_reg" after Tuna et al. 2024,
arXiv:2408.11809): eigendecompose the rotation/translation 3x3 blocks of H;
for eigenvalue/inlier below a threshold, add ``lambda * v v^T``
(lambda = base_factor * inlier) and pull ``b`` toward the initial guess via
``b += H_penalty * log(T_init^-1 T)``.  Branch-free: thresholds become
eigenvalue masks so the whole thing stays inside the jitted align loop
instead of a host sync.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from sycl_points_tpu.utils import lie
from sycl_points_tpu.utils.eigh3 import eigh3


@dataclasses.dataclass(frozen=True)
class DegenerateRegularizationParams:
    type: str = "none"  # "none" | "nl_reg"
    rot_eigenvalue_threshold: float = 10.0
    trans_eigenvalue_threshold: float = 1.0
    base_factor: float = 1.0

    @staticmethod
    def from_string(s: str) -> str:
        u = s.strip().upper().replace("-", "_")
        if u not in ("NONE", "NL_REG"):
            raise ValueError(f"invalid DegenerateRegularizationType '{s}'")
        return u.lower()


def _block_penalty(H_block, threshold, inlier_f, lam, offset):
    """Sum of lam * v v^T (embedded in 6x6 at ``offset``) over eigenpairs with
    eigenvalue/inlier < threshold."""
    lam_vals, V = eigh3(H_block)
    weak = (lam_vals / jnp.maximum(inlier_f, 1.0)) < threshold  # [3]
    # sum_i weak_i * v_i v_i^T  ==  V diag(weak) V^T
    P3 = jnp.einsum("ik,k,jk->ij", V, weak.astype(H_block.dtype), V, precision="highest")
    P6 = jnp.zeros((6, 6), H_block.dtype)
    P6 = P6.at[offset : offset + 3, offset : offset + 3].set(P3)
    return lam * P6


def regularize(params: DegenerateRegularizationParams, lin, current_pose, initial_guess):
    """Apply nl_reg to a LinearizedResult (degenerate_regularization.hpp:43-...).

    No-ops (statically) for type "none" and (dynamically) for inlier == 0.
    """
    if params is None or params.type == "none":
        return lin
    H, b, inlier = lin.H, lin.b, lin.inlier
    inlier_f = inlier.astype(H.dtype)
    lam = params.base_factor * inlier_f

    P = jnp.zeros((6, 6), H.dtype)
    if params.rot_eigenvalue_threshold > 0.0:
        P = P + _block_penalty(H[:3, :3], params.rot_eigenvalue_threshold, inlier_f, lam, 0)
    if params.trans_eigenvalue_threshold > 0.0:
        P = P + _block_penalty(H[3:, 3:], params.trans_eigenvalue_threshold, inlier_f, lam, 3)

    delta_twist = lie.se3_log(lie.transform_inverse(initial_guess) @ current_pose)
    active = inlier > 0
    H_out = jnp.where(active, H + P, H)
    b_out = jnp.where(active, b + P @ delta_twist, b)
    return lin._replace(H=H_out, b=b_out)
