"""Robust M-estimator losses (vectorized).

Replaces ``algorithms/robust/robust.hpp`` of fateshelled/sycl_points: the
loss family {NONE, HUBER, TUKEY, CAUCHY, GEMAN_MCCLURE} with IRLS weights
``compute_weight`` (robust.hpp:56-90) and robust errors ``compute_error``
(robust.hpp:96-114).  Loss selection is a static enum so each jit
specialization fuses the chosen branch (the analog of the reference's
compile-time LossType dispatch).
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp


class RobustLossType(enum.Enum):
    NONE = "none"
    HUBER = "huber"
    TUKEY = "tukey"
    CAUCHY = "cauchy"
    GEMAN_MCCLURE = "geman_mcclure"

    @staticmethod
    def from_string(s: str) -> "RobustLossType":
        return RobustLossType[s.strip().upper()]


def compute_weight(loss: RobustLossType, residual_norm: jax.Array, scale) -> jax.Array:
    """IRLS weight w(r) in [0, 1]; w=1 below the 1e-8 residual floor."""
    if loss is RobustLossType.NONE:
        return jnp.ones_like(residual_norm)
    r = residual_norm / scale
    r = jnp.maximum(r, 1e-30)
    if loss is RobustLossType.HUBER:
        w = jnp.minimum(1.0, 1.0 / r)
    elif loss is RobustLossType.TUKEY:
        f = jnp.maximum(1.0 - r * r, 0.0)
        w = f * f
    elif loss is RobustLossType.CAUCHY:
        w = 1.0 / (1.0 + r * r)
    elif loss is RobustLossType.GEMAN_MCCLURE:
        d = 1.0 + r * r
        w = 1.0 / (d * d)
    else:
        raise ValueError(loss)
    return jnp.where(residual_norm <= 1e-8, 1.0, w)


def compute_error(loss: RobustLossType, residual_norm: jax.Array, scale) -> jax.Array:
    """Robust cost rho(r)."""
    r = residual_norm
    s2 = scale * scale
    if loss is RobustLossType.NONE:
        return 0.5 * r * r
    if loss is RobustLossType.HUBER:
        return jnp.where(r <= scale, 0.5 * r * r, scale * (r - 0.5 * scale))
    if loss is RobustLossType.TUKEY:
        f = jnp.maximum(1.0 - (r * r) / s2, 0.0)
        return (s2 / 6.0) * (1.0 - f * f * f)
    if loss is RobustLossType.CAUCHY:
        return 0.5 * s2 * jnp.log1p((r * r) / s2)
    if loss is RobustLossType.GEMAN_MCCLURE:
        return 0.5 * (s2 * r * r) / (s2 + r * r)
    raise ValueError(loss)
