"""NumPy Lie mirror vs the JAX implementation."""

import numpy as np

import jax.numpy as jnp

from sycl_points_tpu.utils import lie, lie_np

RNG = np.random.default_rng(13)


def test_matches_jax_lie():
    for _ in range(20):
        tw = RNG.normal(size=6).astype(np.float32) * 0.5
        T_np = lie_np.se3_exp(tw)
        T_jx = np.asarray(lie.se3_exp(jnp.asarray(tw)))
        np.testing.assert_allclose(T_np, T_jx, atol=1e-5)
        back = lie_np.se3_log(T_jx)
        np.testing.assert_allclose(back, tw, atol=1e-4)
        q_np = lie_np.matrix_to_quat(T_jx[:3, :3])
        q_jx = np.asarray(lie.matrix_to_quat(jnp.asarray(T_jx[:3, :3])))
        np.testing.assert_allclose(np.abs(q_np), np.abs(q_jx), atol=1e-5)
