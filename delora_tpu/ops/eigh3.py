"""Closed-form symmetric 3x3 eigendecomposition (batched, jittable).

TPU-native replacement for the reference's ``torch.symeig`` call which runs on
the CPU via LAPACK (reference src/preprocessing/normal_computation.py:70-71) —
the only eigensolver use in the pipeline is extracting the smallest-eigenvalue
eigenvector of tiny 3x3 point-neighborhood covariances, which has an exact
trigonometric solution (Smith 1961) that vectorizes over millions of pixels on
the VPU with no host round trip.
"""

from __future__ import annotations

import jax.numpy as jnp


def eigenvalues_sym3x3(A: jnp.ndarray, eps: float = 1e-20):
    """Eigenvalues of symmetric ``[..., 3, 3]`` in ascending order ``[..., 3]``.

    Trigonometric method: exact for symmetric matrices, fully branchless.
    """
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12, a22 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]

    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * (
        a01 * a01 + a02 * a02 + a12 * a12
    )
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, eps))

    # det(B) / 2 where B = (A - qI) / p
    detB = (
        b00 * (b11 * b22 - a12 * a12)
        - a01 * (a01 * b22 - a12 * a02)
        + a02 * (a01 * a12 - b11 * a02)
    )
    r = jnp.clip(detB / (2.0 * p * p * p), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    big = q + 2.0 * p * jnp.cos(phi)
    small = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    mid = 3.0 * q - big - small
    return jnp.stack([small, mid, big], axis=-1)


def smallest_eigenvector_sym3x3(
    A: jnp.ndarray, eps: float = 1e-20
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Unit eigenvector of the smallest eigenvalue and all eigenvalues.

    Returns ``(v [..., 3], eigenvalues [..., 3] ascending)``. For the
    eigenvector of eigenvalue l, rows of (A - l I) span the orthogonal
    complement, so cross products of row pairs all point along v — the
    largest-norm cross product is the numerically stable choice. If every
    cross product is ~0 (isotropic neighborhood, eigenvalue nearly triple),
    the direction is undefined and a zero vector is returned — zero normals
    are the "no normal" sentinel downstream (normal_computation.py:83-85).
    """
    evals = eigenvalues_sym3x3(A, eps)
    lam = evals[..., 0]

    M = A - lam[..., None, None] * jnp.eye(3, dtype=A.dtype)
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)

    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    norms = jnp.stack([n01, n02, n12], axis=-1)
    crosses = jnp.stack([c01, c02, c12], axis=-2)
    best = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(crosses, best[..., None, None], axis=-2)[..., 0, :]
    best_norm = jnp.max(norms, axis=-1)

    v = v / jnp.sqrt(jnp.maximum(best_norm, eps))[..., None]
    v = jnp.where((best_norm > eps)[..., None], v, 0.0)
    return v, evals


def check_planarity(
    eigenvalues: jnp.ndarray, epsilon_plane: float, epsilon_line: float
) -> jnp.ndarray:
    """Plane test on ascending eigenvalues ``[..., 3]``.

    Parity with the reference's (defined but unused) planarity classifier
    (normal_computation.py:43-51): smallest/sum < eps_plane while
    (smallest+mid)/sum > eps_line (i.e. NOT a line).
    """
    total = jnp.sum(eigenvalues, axis=-1)
    total = jnp.where(total == 0, 1.0, total)
    return (eigenvalues[..., 0] / total < epsilon_plane) & (
        (eigenvalues[..., 0] + eigenvalues[..., 1]) / total > epsilon_line
    )
