"""15-DOF navigation state and IMU prior factor.

Replaces ``algorithms/imu/imu_factor.hpp`` of fateshelled/sycl_points.
Error-state ordering (imu_factor.hpp:17-23):
  [0:3] position (world) | [3:6] rotation (so(3), right-perturbation) |
  [6:9] velocity (world) | [9:12] accel bias | [12:15] gyro bias.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sycl_points_tpu.utils import lie
from sycl_points_tpu.utils.smallmat import solve_psd

IDX_POS = 0
IDX_ROT = 3
IDX_VEL = 6
IDX_ACC_BIAS = 9
IDX_GYR_BIAS = 12
DOF = 15


class State(NamedTuple):
    """Full navigation state (imu_factor.hpp:43-61); a jit-friendly pytree."""

    position: jax.Array  # [3] world
    rotation: jax.Array  # [3, 3] body-to-world
    velocity: jax.Array  # [3] world
    accel_bias: jax.Array  # [3] body
    gyro_bias: jax.Array  # [3] body

    @staticmethod
    def identity() -> "State":
        return State(
            position=jnp.zeros(3, jnp.float32),
            rotation=jnp.eye(3, dtype=jnp.float32),
            velocity=jnp.zeros(3, jnp.float32),
            accel_bias=jnp.zeros(3, jnp.float32),
            gyro_bias=jnp.zeros(3, jnp.float32),
        )

    def pose(self) -> jax.Array:
        return lie.make_transform(self.rotation, self.position)


def compute_manifold_residual(x_pred: State, x_op: State) -> jax.Array:
    """r = x_op (-) x_pred on the manifold (imu_factor.hpp:71-89)."""
    r_rot = lie.so3_log(lie.matrix_to_quat(x_pred.rotation.T @ x_op.rotation))
    return jnp.concatenate(
        [
            x_op.position - x_pred.position,
            r_rot,
            x_op.velocity - x_pred.velocity,
            x_op.accel_bias - x_pred.accel_bias,
            x_op.gyro_bias - x_pred.gyro_bias,
        ]
    )


def compute_imu_hessian_gradient(x_pred: State, x_op: State, P_pred: jax.Array):
    """(H_imu, b_imu, ok): H = P^-1, b = H r (imu_factor.hpp:116-141).
    Zero H/b when P_pred is not positive definite."""
    H, ok = solve_psd(P_pred, jnp.eye(DOF, dtype=jnp.float32))
    r = compute_manifold_residual(x_pred, x_op)
    b = H @ r
    H = jnp.where(ok, H, 0.0)
    b = jnp.where(ok, b, 0.0)
    return H, b, ok


def compute_imu_gradient(x_pred: State, x_op: State, H_imu: jax.Array) -> jax.Array:
    """Gradient-only update reusing H (imu_factor.hpp:154-160)."""
    return H_imu @ compute_manifold_residual(x_pred, x_op)


def retract(x: State, delta: jax.Array) -> State:
    """Right-perturbation state update (lio_registration.hpp:262):
    p += dp, R = R Exp(dphi), v += dv, biases += db."""
    return State(
        position=x.position + delta[IDX_POS : IDX_POS + 3],
        rotation=x.rotation @ lie.quat_to_matrix(lie.so3_exp(delta[IDX_ROT : IDX_ROT + 3])),
        velocity=x.velocity + delta[IDX_VEL : IDX_VEL + 3],
        accel_bias=x.accel_bias + delta[IDX_ACC_BIAS : IDX_ACC_BIAS + 3],
        gyro_bias=x.gyro_bias + delta[IDX_GYR_BIAS : IDX_GYR_BIAS + 3],
    )
