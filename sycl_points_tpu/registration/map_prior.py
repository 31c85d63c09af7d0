"""MAP prior: previous-frame Hessian as a Gaussian pose prior.

Replaces ``algorithms/registration/map_prior.hpp`` of fateshelled/sycl_points.
Once per frame, :func:`update` turns the previous registration's raw Hessian
into a calibrated information matrix Omega_prior:

  * reduced chi-squared calibration s^2 = max(1, 2 error_raw / (3 inlier - 6))
  * rotation-only adjoint into the predicted frame
  * adaptive process noise Q (per-axis |delta| * vel_sigma^2 + base_sigma^2)
  * inversion-lemma Omega = R - R (H + R)^{-1} R  (robust to singular H)

Per iteration, :meth:`MapPriorState.apply` adds Omega and Omega log(T_pred^-1 T)
to the normal equations.  Everything is branch-free traced math (the
enabled/has-prior gate is an ``active`` scalar), so the prior lives inside the
jitted align loop.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sycl_points_tpu.utils import lie
from sycl_points_tpu.utils.smallmat import solve_psd


@dataclasses.dataclass(frozen=True)
class MapPriorParams:
    enabled: bool = False
    rot_vel_sigma: float = 1.0  # sigma contribution at 1 rad inter-frame rotation
    trans_vel_sigma: float = 1.0  # sigma contribution at 1 m inter-frame translation
    rot_base_sigma: float = 3.16e-2  # isotropic baseline [rad]
    trans_base_sigma: float = 1e-2  # isotropic baseline [m]


class MapPriorState(NamedTuple):
    """Per-frame precomputed prior; a pytree usable inside jit."""

    active: jax.Array  # bool scalar
    omega: jax.Array  # [6, 6]
    T_pred_inv: jax.Array  # [4, 4]

    def apply(self, lin, T_est: jax.Array):
        """Add the prior to the normal equations (map_prior.hpp:186-203)."""
        e = lie.se3_log(self.T_pred_inv @ T_est)
        omega_e = self.omega @ e
        act = self.active
        return lin._replace(
            H=jnp.where(act, lin.H + self.omega, lin.H),
            b=jnp.where(act, lin.b + omega_e, lin.b),
            error=jnp.where(act, lin.error + 0.5 * jnp.dot(e, omega_e), lin.error),
        )

    def prior_error(self, T_est: jax.Array) -> jax.Array:
        e = lie.se3_log(self.T_pred_inv @ T_est)
        return jnp.where(self.active, 0.5 * jnp.dot(e, self.omega @ e), 0.0)


def inactive_prior() -> MapPriorState:
    return MapPriorState(
        active=jnp.bool_(False),
        omega=jnp.zeros((6, 6), jnp.float32),
        T_pred_inv=jnp.eye(4, dtype=jnp.float32),
    )


def update(
    params: MapPriorParams,
    prev_T: jax.Array,
    prev_H_raw: jax.Array,
    prev_error_raw: jax.Array,
    prev_inlier: jax.Array,
    T_pred: jax.Array,
) -> MapPriorState:
    """Build the per-frame prior (MapPrior::update, map_prior.hpp:116-184).

    Jittable; returns an inactive state when disabled, DOF <= 0, or the
    previous error is invalid.
    """
    if not params.enabled:
        return inactive_prior()

    dof = 3.0 * prev_inlier.astype(jnp.float32) - 6.0
    ok = (dof > 0.0) & jnp.isfinite(prev_error_raw) & (prev_error_raw >= 0.0)
    s_sq = jnp.maximum(1.0, 2.0 * prev_error_raw / jnp.maximum(dof, 1.0))
    H_cal = prev_H_raw / s_sq

    R_prev = prev_T[:3, :3]
    R_pred = T_pred[:3, :3]
    R_rel = R_prev.T @ R_pred

    delta_rot_body = lie.so3_log(lie.matrix_to_quat(R_rel))
    delta_trans_body = R_pred.T @ (T_pred[:3, 3] - prev_T[:3, 3])

    q_rot = jnp.abs(delta_rot_body) * params.rot_vel_sigma**2 + params.rot_base_sigma**2
    q_trans = (
        jnp.abs(delta_trans_body) * params.trans_vel_sigma**2 + params.trans_base_sigma**2
    )

    Ad = jnp.zeros((6, 6), jnp.float32)
    Ad = Ad.at[:3, :3].set(R_rel).at[3:, 3:].set(R_rel)
    H_curr = Ad.T @ H_cal @ Ad

    R_diag = jnp.concatenate([1.0 / q_rot, 1.0 / q_trans])
    Rm = jnp.diag(R_diag)
    # Omega = R - R (H + R)^{-1} R  (matrix inversion lemma; H + R is PD)
    X, solve_ok = solve_psd(H_curr + Rm, Rm)
    omega = Rm - Rm @ X
    ok = ok & solve_ok & jnp.all(jnp.isfinite(omega))

    return MapPriorState(
        active=ok,
        omega=jnp.where(ok, omega, jnp.zeros((6, 6), jnp.float32)),
        T_pred_inv=lie.transform_inverse(T_pred),
    )
