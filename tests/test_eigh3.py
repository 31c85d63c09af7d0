"""Analytic 3x3 symmetric eigensolver vs. numpy.linalg.eigh oracle."""

import numpy as np
import jax.numpy as jnp

from sycl_points_tpu.utils import eigh3

RNG = np.random.default_rng(7)


def random_spd(n, cond_scale=1.0):
    A = RNG.normal(size=(n, 3, 3)).astype(np.float32)
    return (A @ A.transpose(0, 2, 1) * cond_scale + 1e-6 * np.eye(3)).astype(np.float32)


def test_eigvals_match_numpy():
    A = random_spd(500)
    lam = np.asarray(eigh3.eigvalsh3(jnp.asarray(A)))
    lam_ref = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(lam, lam_ref, rtol=1e-3, atol=1e-4)


def test_eigvecs_are_eigvecs():
    A = random_spd(500)
    lam, V = eigh3.eigh3(jnp.asarray(A))
    lam, V = np.asarray(lam), np.asarray(V)
    # A v = lam v  for each column
    Av = np.einsum("nij,njk->nik", A, V)
    lamV = lam[:, None, :] * V
    scale = np.abs(lam).max(axis=1)[:, None, None] + 1.0
    np.testing.assert_allclose(Av / scale, lamV / scale, atol=5e-4)
    # columns orthonormal
    VtV = np.einsum("nji,njk->nik", V, V)
    np.testing.assert_allclose(VtV, np.broadcast_to(np.eye(3), VtV.shape), atol=2e-4)


def test_planar_covariance_smallest_vector():
    # Points spread in the XY plane: smallest eigenvector must be +-Z.
    n = 64
    pts = RNG.normal(size=(n, 100, 3)).astype(np.float32)
    pts[..., 2] *= 0.001
    centered = pts - pts.mean(axis=1, keepdims=True)
    covs = np.einsum("nki,nkj->nij", centered, centered) / 100.0
    v0 = np.asarray(eigh3.smallest_eigenvector3(jnp.asarray(covs)))
    np.testing.assert_allclose(np.abs(v0[:, 2]), 1.0, atol=1e-3)


def test_degenerate_isotropic():
    A = np.broadcast_to(np.eye(3, dtype=np.float32) * 2.5, (10, 3, 3))
    lam, V = eigh3.eigh3(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(lam), 2.5, atol=1e-5)
    VtV = np.einsum("nji,njk->nik", np.asarray(V), np.asarray(V))
    np.testing.assert_allclose(VtV, np.broadcast_to(np.eye(3), VtV.shape), atol=1e-5)


def test_two_equal_eigenvalues():
    # diag(1, 1, 5) rotated: eigenspace of 1 is 2-dimensional
    from scipy.spatial.transform import Rotation

    R = Rotation.random(50, random_state=3).as_matrix().astype(np.float32)
    D = np.diag([1.0, 1.0, 5.0]).astype(np.float32)
    A = np.einsum("nij,jk,nlk->nil", R, D, R)
    lam, V = eigh3.eigh3(jnp.asarray(A))
    lam, V = np.asarray(lam), np.asarray(V)
    np.testing.assert_allclose(lam, np.broadcast_to([1.0, 1.0, 5.0], lam.shape), atol=1e-3)
    Av = np.einsum("nij,njk->nik", A, V)
    np.testing.assert_allclose(Av, lam[:, None, :] * V, atol=2e-3)


def test_plane_regularize():
    A = random_spd(100)
    reg = np.asarray(eigh3.plane_regularize(jnp.asarray(A)))
    lam = np.linalg.eigvalsh(reg)
    np.testing.assert_allclose(lam[:, 0], 1e-3, atol=1e-4)
    np.testing.assert_allclose(lam[:, 1:], 1.0, atol=1e-4)


def test_normalize_covariance():
    A = random_spd(100, cond_scale=0.01)
    out = np.asarray(eigh3.normalize_covariance(jnp.asarray(A)))
    lam = np.linalg.eigvalsh(out)
    assert np.all(lam[:, 2] < 1.0 + 5e-3)
    assert np.all(lam[:, 0] > 1e-3 - 1e-3)


def test_spd_log_exp_roundtrip():
    A = random_spd(100)
    back = np.asarray(eigh3.spd_exp(eigh3.spd_log(jnp.asarray(A))))
    np.testing.assert_allclose(back, A, rtol=2e-2, atol=2e-3)


def test_inv3():
    A = random_spd(100)
    Ainv = np.asarray(eigh3.inv3(jnp.asarray(A)))
    I = np.einsum("nij,njk->nik", A, Ainv)
    np.testing.assert_allclose(I, np.broadcast_to(np.eye(3), I.shape), atol=2e-2)


def test_spd_inverse_ill_conditioned_stays_spd():
    # Real matrix from the bundled target cloud that broke the adjugate
    # inverse: condition number ~5e4, f32 det round-off makes inv3's result
    # indefinite, while spd_inverse must stay SPD.
    from sycl_points_tpu.utils.eigh3 import eigvalsh3, spd_inverse
    from sycl_points_tpu.utils.smallmat import cholesky3

    C = jnp.asarray(
        [
            [2.25846246e-01, -1.67487249e-01, 4.38200030e-03],
            [-1.67487249e-01, 1.24333516e-01, -3.24862148e-03],
            [4.38200030e-03, -3.24862148e-03, 8.50359575e-05],
        ],
        jnp.float32,
    )[None]
    W = spd_inverse(C, 1e-6)
    lam = np.asarray(eigvalsh3(W))[0]
    assert lam[0] > 0, lam
    G = np.asarray(cholesky3(W))
    assert np.all(np.isfinite(G))
    # inverse property on the well-conditioned subspace
    I_apx = np.asarray(W)[0] @ np.asarray(C)[0]
    assert np.all(np.isfinite(I_apx))


def test_floor_eigenvalues():
    from sycl_points_tpu.utils.eigh3 import eigvalsh3, floor_eigenvalues

    C = jnp.asarray(np.diag([1e-8, -1e-4, 1.0]).astype(np.float32))[None]
    F = floor_eigenvalues(C, 1e-6)
    lam = np.asarray(eigvalsh3(F))[0]
    assert lam.min() >= 0.9e-6
    np.testing.assert_allclose(lam[2], 1.0, rtol=1e-5)
