"""Small-matrix batched linear algebra (3x3 Cholesky, triangular solves, NxN
PSD solves) — the TPU analog of the device-safe fixed-size solvers in the
reference (``utils/eigen_utils.hpp``: cholesky 3x3 at :515, 6x6 solve at
:571).  Everything is elementwise/fused VPU math; no LAPACK calls in the hot
path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cholesky3(A: jax.Array, jitter: float = 0.0) -> jax.Array:
    """Lower Cholesky factor of SPD ``[..., 3, 3]`` (analytic, batched)."""
    a00 = A[..., 0, 0] + jitter
    a10, a11 = A[..., 1, 0], A[..., 1, 1] + jitter
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2] + jitter
    eps = 1e-30
    g00 = jnp.sqrt(jnp.maximum(a00, eps))
    g10 = a10 / g00
    g20 = a20 / g00
    g11 = jnp.sqrt(jnp.maximum(a11 - g10 * g10, eps))
    g21 = (a21 - g20 * g10) / g11
    g22 = jnp.sqrt(jnp.maximum(a22 - g20 * g20 - g21 * g21, eps))
    zero = jnp.zeros_like(g00)
    return jnp.stack(
        [
            jnp.stack([g00, zero, zero], axis=-1),
            jnp.stack([g10, g11, zero], axis=-1),
            jnp.stack([g20, g21, g22], axis=-1),
        ],
        axis=-2,
    )


def solve_lower3(L: jax.Array, B: jax.Array) -> jax.Array:
    """Forward-substitute ``L y = B`` for lower-triangular ``L [..., 3, 3]``.

    ``B`` may be ``[..., 3]`` or ``[..., 3, m]``.
    """
    vec = B.ndim == L.ndim - 1
    if vec:
        B = B[..., None]
    y0 = B[..., 0, :] / L[..., 0, 0, None]
    y1 = (B[..., 1, :] - L[..., 1, 0, None] * y0) / L[..., 1, 1, None]
    y2 = (B[..., 2, :] - L[..., 2, 0, None] * y0 - L[..., 2, 1, None] * y1) / L[..., 2, 2, None]
    Y = jnp.stack([y0, y1, y2], axis=-2)
    return Y[..., 0] if vec else Y


def solve_psd(H: jax.Array, b: jax.Array):
    """Solve ``H x = b`` for symmetric positive (semi-)definite ``H [N, N]``
    via Cholesky; returns ``(x, ok)`` with ``ok`` False when the factorization
    encounters a non-positive pivot or non-finite input (the analog of the
    reference LDLT-failure -> zero-step fallback,
    registration/registration.hpp:791-801)."""
    L = jnp.linalg.cholesky(H)
    finite = jnp.all(jnp.isfinite(L))
    x = jax.scipy.linalg.cho_solve((L, True), b)
    ok = finite & jnp.all(jnp.isfinite(x))
    return jnp.where(ok, x, jnp.zeros_like(b)), ok
