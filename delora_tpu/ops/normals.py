"""Neighborhood-PCA normal estimation on range images (one XLA program).

TPU-native replacement for the reference's offline normal pipeline
(reference src/preprocessing/normal_computation.py + src/utility/linalg.py):
the reference gathers a 7x11 patch per valid pixel with Python loops over
offsets, computes a zero-exclusion covariance, and ships every 3x3 matrix to
the CPU for LAPACK ``torch.symeig``. Here the patch gather is a stack of
statically-shifted, edge-clamped image slices (pure XLA slices — no gather at
all), the masked covariance is one einsum, and the eigenvector comes from the
closed-form solver in :mod:`delora_tpu.ops.eigh3`. Differentiation is not
needed: normals are data, as in the reference (precomputed offline).

Semantics preserved (SURVEY.md §2 "Normal estimation" row):
  * patch offsets clamped at image borders — NOT azimuth-wrapped
    (normal_computation.py:103-111),
  * a center pixel is valid only if ALL three coordinates are nonzero
    (normal_computation.py:35 uses logical AND),
  * a neighbor contributes only if ANY coordinate is nonzero (linalg.py:34-38)
    and its range deviates from the center range by <= epsilon_range
    (normal_computation.py:56-59),
  * covariance mean/scale correct for the excluded zeros (linalg.py:39-44),
  * >= min_num_points neighbors required, else no normal
    (normal_computation.py:67-69),
  * normal flipped toward the sensor: dot(n, p) > 0 => n := -n
    (normal_computation.py:79-81),
  * pixels without a normal hold the (0, 0, 0) sentinel
    (normal_computation.py:83-85).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from delora_tpu.ops.eigh3 import smallest_eigenvector_sym3x3


class NormalsSpec(NamedTuple):
    patch_v: int           # neighborhood_side_length[0] (vertical extent, odd)
    patch_u: int           # neighborhood_side_length[1] (horizontal extent, odd)
    epsilon_range: float
    min_neighbors: int

    @classmethod
    def from_config(cls, config, dataset: str):
        side = config[dataset]["neighborhood_side_length"]
        return cls(
            patch_v=int(side[0]),
            patch_u=int(side[1]),
            epsilon_range=float(config["epsilon_range"]),
            min_neighbors=int(
                config["min_num_points_in_neighborhood_to_determine_point_class"]
            ),
        )


def compute_normal_image(image_xyz: jnp.ndarray, spec: NormalsSpec) -> jnp.ndarray:
    """Range image ``[H, W, 3]`` (zeros at empty pixels) -> normals ``[H, W, 3]``.

    Zero vector where no normal could be estimated.

    Implementation: a single ``fori_loop`` over the K = patch_v * patch_u
    offsets accumulates masked first and second moments (count, sum p,
    sum p p^T) per pixel; the covariance follows algebraically as
    (sum pp^T - n mean mean^T) / (n - 1), which equals the reference's
    zero-excluded difference form (linalg.py:39-44) exactly. The rolled loop
    keeps the XLA program small — an unrolled 77-slice einsum formulation
    took minutes to compile on the TPU toolchain.

    Edge-clamp padding reproduces the reference's border index clamping
    (normal_computation.py:103-111: out-of-range coordinates snap to the
    border, biasing edge neighborhoods exactly the same way).
    """
    a = spec.patch_v // 2
    b = spec.patch_u // 2
    H, W, _ = image_xyz.shape
    K = spec.patch_v * spec.patch_u

    center_valid = jnp.all(image_xyz != 0.0, axis=-1)            # AND, :35
    center_range = jnp.linalg.norm(image_xyz, axis=-1)           # [H, W]
    padded = jnp.pad(image_xyz, ((a, a), (b, b), (0, 0)), mode="edge")

    def body(k, carry):
        count, s1, s2 = carry
        dv = k // spec.patch_u
        du = k % spec.patch_u
        nb = jax.lax.dynamic_slice(padded, (dv, du, 0), (H, W, 3))
        nonzero = jnp.any(nb != 0.0, axis=-1)                    # OR, linalg:34-38
        nb_range = jnp.linalg.norm(nb, axis=-1)
        ok = nonzero & (jnp.abs(nb_range - center_range) <= spec.epsilon_range)
        w = ok.astype(image_xyz.dtype)[..., None]
        nbw = nb * w
        # Second moments: 6 unique entries of the symmetric 3x3.
        outer = nbw[..., :, None] * nb[..., None, :]             # [H, W, 3, 3]
        return count + w[..., 0], s1 + nbw, s2 + outer

    count0 = jnp.zeros((H, W), image_xyz.dtype)
    s1_0 = jnp.zeros((H, W, 3), image_xyz.dtype)
    s2_0 = jnp.zeros((H, W, 3, 3), image_xyz.dtype)
    n, s1, s2 = jax.lax.fori_loop(0, K, body, (count0, s1_0, s2_0))

    n_safe = jnp.maximum(n, 2.0)                                 # avoid /0, /(n-1)=0
    mean = s1 / n_safe[..., None]                                # linalg:41-42
    cov = (s2 - n_safe[..., None, None] * mean[..., :, None] * mean[..., None, :])
    cov = cov / (n_safe - 1.0)[..., None, None]

    normal, _ = smallest_eigenvector_sym3x3(cov)

    # Flip toward sensor (:79-81).
    dots = jnp.sum(normal * image_xyz, axis=-1)
    normal = jnp.where((dots > 0.0)[..., None], -normal, normal)

    enough = center_valid & (n >= spec.min_neighbors)            # :67-69
    return jnp.where(enough[..., None], normal, 0.0)


def normals_for_points(
    image_xyz: jnp.ndarray,
    proj,
    spec: NormalsSpec,
) -> jnp.ndarray:
    """Compute a normal per *point* for a projected scan.

    ``proj`` is the :class:`~delora_tpu.ops.projection.Projection` of the same
    scan. Each surviving point reads the normal at its own pixel — a pure
    gather (a scatter formulation serializes on TPU). Non-survivors get the
    (0, 0, 0) sentinel, preserving the on-disk contract of the reference's
    preprocessing (preprocesser.py:64-68: per-scan normals array row-aligned
    with the deduplicated point list).
    """
    H, W = image_xyz.shape[0], image_xyz.shape[1]
    normal_image = compute_normal_image(image_xyz, spec)          # [H, W, 3]
    flat_normals = normal_image.reshape(-1, 3)
    ui = jnp.clip(jnp.round(proj.u).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(proj.v).astype(jnp.int32), 0, H - 1)
    per_point = flat_normals[vi * W + ui]
    return per_point * proj.survivor[:, None]
