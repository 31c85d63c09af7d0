"""Lie-group layer vs. SciPy oracles (mirrors tests/test_eigen_utils.cpp of the
reference, which validates device math against host Eigen)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from sycl_points_tpu.utils import lie

RNG = np.random.default_rng(42)


def random_rotvecs(n, scale=np.pi * 0.9):
    v = RNG.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    mags = RNG.uniform(1e-8, scale, size=(n, 1))
    return (v * mags).astype(np.float32)


def test_skew():
    v = RNG.normal(size=(5, 3)).astype(np.float32)
    S = np.asarray(lie.skew(jnp.asarray(v)))
    for i in range(5):
        a = RNG.normal(size=3).astype(np.float32)
        np.testing.assert_allclose(S[i] @ a, np.cross(v[i], a), atol=1e-5)


def test_so3_exp_log_roundtrip():
    omega = random_rotvecs(100)
    q = np.asarray(lie.so3_exp(jnp.asarray(omega)))
    # scipy quat layout is xyzw too
    q_ref = Rotation.from_rotvec(omega).as_quat()
    sign = np.sign(np.sum(q * q_ref, axis=1, keepdims=True))
    np.testing.assert_allclose(q, q_ref * sign, atol=1e-5)

    back = np.asarray(lie.so3_log(jnp.asarray(q)))
    np.testing.assert_allclose(back, omega, atol=1e-4)


def test_quat_to_matrix_matches_scipy():
    omega = random_rotvecs(50)
    q = Rotation.from_rotvec(omega).as_quat().astype(np.float32)
    R = np.asarray(lie.quat_to_matrix(jnp.asarray(q)))
    R_ref = Rotation.from_rotvec(omega).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_matrix_to_quat_roundtrip():
    omega = random_rotvecs(200)  # includes near-pi rotations
    R_ref = Rotation.from_rotvec(omega).as_matrix().astype(np.float32)
    q = np.asarray(lie.matrix_to_quat(jnp.asarray(R_ref)))
    R_back = np.asarray(lie.quat_to_matrix(jnp.asarray(q)))
    np.testing.assert_allclose(R_back, R_ref, atol=1e-4)


def test_se3_exp_log_roundtrip():
    twists = np.concatenate(
        [random_rotvecs(100, scale=2.5), RNG.normal(size=(100, 3)).astype(np.float32)],
        axis=1,
    )
    T = np.asarray(lie.se3_exp(jnp.asarray(twists)))
    # Rotation block must match scipy expmap
    R_ref = Rotation.from_rotvec(twists[:, :3]).as_matrix()
    np.testing.assert_allclose(T[:, :3, :3], R_ref, atol=1e-4)
    back = np.asarray(lie.se3_log(jnp.asarray(T)))
    np.testing.assert_allclose(back, twists, atol=2e-3)


def test_se3_exp_small_angle():
    twist = np.array([[1e-9, -1e-9, 1e-9, 0.5, -0.25, 1.0]], dtype=np.float32)
    T = np.asarray(lie.se3_exp(jnp.asarray(twist)))[0]
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(T[:3, 3], twist[0, 3:], atol=1e-6)


def test_transform_inverse():
    twists = np.concatenate(
        [random_rotvecs(20), RNG.normal(size=(20, 3)).astype(np.float32)], axis=1
    )
    T = lie.se3_exp(jnp.asarray(twists))
    I = np.asarray(T @ lie.transform_inverse(T))
    np.testing.assert_allclose(I, np.broadcast_to(np.eye(4), I.shape), atol=1e-5)


def test_quat_rotate_matches_matrix():
    omega = random_rotvecs(30)
    q = lie.so3_exp(jnp.asarray(omega))
    v = RNG.normal(size=(30, 3)).astype(np.float32)
    rotated = np.asarray(lie.quat_rotate(q, jnp.asarray(v)))
    R = np.asarray(lie.quat_to_matrix(q))
    np.testing.assert_allclose(rotated, np.einsum("nij,nj->ni", R, v), atol=1e-5)
