import numpy as np

import jax.numpy as jnp

from delora_tpu.ops.eigh3 import (
    check_planarity,
    eigenvalues_sym3x3,
    smallest_eigenvector_sym3x3,
)


def random_spd(n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, 3, 3))
    return (A @ A.transpose(0, 2, 1)).astype(np.float32)


def test_eigenvalues_match_lapack():
    A = random_spd(256)
    ours = np.asarray(eigenvalues_sym3x3(jnp.asarray(A)))
    ref = np.linalg.eigvalsh(A)
    # jax computes in f32 by default; tolerances sized accordingly.
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_smallest_eigenvector_matches_lapack():
    A = random_spd(256, seed=1)
    v, evals = smallest_eigenvector_sym3x3(jnp.asarray(A))
    v = np.asarray(v)
    w, V = np.linalg.eigh(A.astype(np.float64))
    ref_v = V[:, :, 0]
    # Compare up to sign via |cos| of the angle between them (f32 compute).
    cos = np.abs(np.sum(v * ref_v, axis=-1))
    assert np.all(cos > 1.0 - 1e-3)
    # And check the eigen equation directly.
    Av = np.einsum("nij,nj->ni", A.astype(np.float64), v.astype(np.float64))
    lv = np.asarray(evals).astype(np.float64)[:, 0:1] * v
    scale = np.abs(w[:, 0:1]) + 1.0
    np.testing.assert_allclose(Av / scale, lv / scale, atol=1e-3)


def test_isotropic_matrix_returns_zero_vector():
    A = jnp.broadcast_to(jnp.eye(3), (4, 3, 3))
    v, _ = smallest_eigenvector_sym3x3(A)
    np.testing.assert_allclose(np.asarray(v), 0.0, atol=1e-7)


def test_planarity_classifier():
    # A plane-like spectrum: one tiny eigenvalue, two large.
    evals = jnp.asarray([[0.001, 1.0, 1.0], [0.5, 0.6, 0.7], [0.0005, 0.001, 1.0]])
    planar = np.asarray(check_planarity(evals, epsilon_plane=0.01, epsilon_line=0.01))
    assert planar.tolist() == [True, False, False]  # last one is a line
