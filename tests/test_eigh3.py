import numpy as np
import pytest

import jax.numpy as jnp

from pointcloud_segmentation_tpu.ops.eigh3 import eigvalsh3, eigh3, principal_eigenvector3


def random_sym(rng, scale=1.0):
    A = rng.normal(size=(3, 3)) * scale
    return (A + A.T) / 2


@pytest.mark.parametrize("seed", range(8))
def test_eigvalsh3_matches_numpy(seed):
    rng = np.random.default_rng(seed)
    A = random_sym(rng)
    w = np.asarray(eigvalsh3(jnp.asarray(A, jnp.float32)))
    w_np = np.linalg.eigvalsh(A)[::-1]
    np.testing.assert_allclose(w, w_np, atol=2e-6 * max(1, np.abs(w_np).max()))
    assert w[0] >= w[1] >= w[2]


def test_eigvalsh3_batched(rng):
    A = rng.normal(size=(16, 3, 3))
    A = (A + np.swapaxes(A, -1, -2)) / 2
    w = np.asarray(eigvalsh3(jnp.asarray(A, jnp.float32)))
    w_np = np.linalg.eigvalsh(A)[..., ::-1]
    np.testing.assert_allclose(w, w_np, atol=1e-5)


@pytest.mark.parametrize("seed", range(6))
def test_principal_eigenvector(seed):
    rng = np.random.default_rng(100 + seed)
    A = random_sym(rng)
    lam, v = principal_eigenvector3(jnp.asarray(A, jnp.float32))
    lam, v = float(lam), np.asarray(v)
    # A v ~= lam v
    np.testing.assert_allclose(A @ v, lam * v, atol=5e-5 * max(1, abs(lam)))
    assert abs(np.linalg.norm(v) - 1) < 1e-5


def test_principal_eigenvector_scatter_of_line():
    # scatter matrix of points on a line: rank-1, eigvec = line direction
    rng = np.random.default_rng(0)
    b = np.array([1.0, -2.0, 0.5])
    b /= np.linalg.norm(b)
    t = rng.uniform(-1, 1, 500)
    pts = t[:, None] * b[None, :] + rng.normal(0, 1e-3, (500, 3))
    c = pts - pts.mean(0)
    S = c.T @ c
    lam, v = principal_eigenvector3(jnp.asarray(S, jnp.float32))
    assert abs(abs(np.asarray(v) @ b) - 1) < 1e-4


def test_degenerate_isotropic():
    # A = q*I: all eigenvalues q, no NaN eigenvector
    A = 2.5 * np.eye(3)
    w = np.asarray(eigvalsh3(jnp.asarray(A, jnp.float32)))
    np.testing.assert_allclose(w, 2.5, atol=1e-6)
    lam, v = principal_eigenvector3(jnp.asarray(A, jnp.float32))
    assert np.isfinite(np.asarray(v)).all()


def test_zero_matrix():
    w = np.asarray(eigvalsh3(jnp.zeros((3, 3), jnp.float32)))
    np.testing.assert_allclose(w, 0.0)
    lam, v = principal_eigenvector3(jnp.zeros((3, 3), jnp.float32))
    assert float(lam) == 0.0
    assert np.isfinite(np.asarray(v)).all()


def test_full_eigh3(rng):
    A = random_sym(np.random.default_rng(7))
    w, V = eigh3(jnp.asarray(A, jnp.float32))
    w, V = np.asarray(w), np.asarray(V)
    for k in range(3):
        np.testing.assert_allclose(A @ V[k], w[k] * V[k], atol=1e-4)
    # orthonormal rows
    np.testing.assert_allclose(V @ V.T, np.eye(3), atol=1e-5)
