"""MAP prior: information matrix construction + pull toward prediction."""

import numpy as np

import jax.numpy as jnp

from sycl_points_tpu.registration.map_prior import MapPriorParams, inactive_prior, update
from sycl_points_tpu.registration.registration import LinearizedResult
from sycl_points_tpu.utils import lie


def _lin(H=None, b=None):
    return LinearizedResult(
        H=jnp.zeros((6, 6)) if H is None else H,
        b=jnp.zeros((6,)) if b is None else b,
        error=jnp.float32(0.0),
        inlier=jnp.int32(100),
    )


def test_disabled_is_inactive():
    st = update(
        MapPriorParams(enabled=False),
        jnp.eye(4), jnp.eye(6) * 100, jnp.float32(10.0), jnp.int32(100), jnp.eye(4),
    )
    assert not bool(st.active)
    out = st.apply(_lin(), jnp.eye(4))
    np.testing.assert_allclose(np.asarray(out.H), 0.0)


def test_prior_pulls_toward_prediction():
    params = MapPriorParams(enabled=True)
    prev_T = jnp.eye(4)
    H_prev = jnp.eye(6) * 1e4  # confident previous frame
    T_pred = jnp.asarray(lie.se3_exp(jnp.asarray([0, 0, 0, 1.0, 0, 0])))
    st = update(params, prev_T, H_prev, jnp.float32(10.0), jnp.int32(1000), T_pred)
    assert bool(st.active)
    # at T = T_pred the prior cost is zero; away from it positive
    assert float(st.prior_error(T_pred)) < 1e-6
    T_off = T_pred @ jnp.asarray(lie.se3_exp(jnp.asarray([0, 0, 0, 0.5, 0, 0])))
    assert float(st.prior_error(T_off)) > 0.1
    # apply adds omega to H
    out = st.apply(_lin(), T_off)
    assert float(jnp.trace(out.H)) > 1.0
    # with zero geometric info, GN step from the prior moves toward T_pred
    delta = np.linalg.solve(np.asarray(out.H) + 1e-6 * np.eye(6), -np.asarray(out.b))
    e_before = np.linalg.norm(np.asarray(lie.se3_log(lie.transform_inverse(T_pred) @ T_off)))
    T_new = T_off @ jnp.asarray(lie.se3_exp(jnp.asarray(delta, dtype=jnp.float32)))
    e_after = np.linalg.norm(np.asarray(lie.se3_log(lie.transform_inverse(T_pred) @ T_new)))
    assert e_after < e_before * 0.5


def test_reduced_chi2_loosens_prior():
    params = MapPriorParams(enabled=True)
    prev_T = jnp.eye(4)
    H_prev = jnp.eye(6) * 1e4
    T_pred = jnp.eye(4)
    tight = update(params, prev_T, H_prev, jnp.float32(1.0), jnp.int32(1000), T_pred)
    loose = update(params, prev_T, H_prev, jnp.float32(1e6), jnp.int32(1000), T_pred)
    assert float(jnp.trace(tight.omega)) > float(jnp.trace(loose.omega))


def test_dof_guard():
    st = update(
        MapPriorParams(enabled=True),
        jnp.eye(4), jnp.eye(6), jnp.float32(1.0), jnp.int32(2), jnp.eye(4),
    )
    assert not bool(st.active)


def test_inactive_prior_noop():
    st = inactive_prior()
    lin = _lin(H=jnp.eye(6))
    out = st.apply(lin, jnp.eye(4))
    np.testing.assert_allclose(np.asarray(out.H), np.eye(6))
