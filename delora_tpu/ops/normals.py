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


def _shifted_stack(image: jnp.ndarray, a: int, b: int) -> jnp.ndarray:
    """All (2a+1)x(2b+1) edge-clamped shifts of ``[H, W, C]`` -> ``[K, H, W, C]``.

    Edge-clamp padding reproduces the reference's border index clamping
    (normal_computation.py:103-111: out-of-range coordinates snap to the
    border, biasing edge neighborhoods exactly the same way).
    """
    H, W = image.shape[0], image.shape[1]
    padded = jnp.pad(image, ((a, a), (b, b), (0, 0)), mode="edge")
    shifts = []
    for dv in range(-a, a + 1):
        for du in range(-b, b + 1):
            shifts.append(
                jax.lax.dynamic_slice(
                    padded, (dv + a, du + b, 0), (H, W, image.shape[2])
                )
            )
    return jnp.stack(shifts, axis=0)


def compute_normal_image(image_xyz: jnp.ndarray, spec: NormalsSpec) -> jnp.ndarray:
    """Range image ``[H, W, 3]`` (zeros at empty pixels) -> normals ``[H, W, 3]``.

    Zero vector where no normal could be estimated.
    """
    a = spec.patch_v // 2
    b = spec.patch_u // 2

    center_valid = jnp.all(image_xyz != 0.0, axis=-1)           # AND, :35
    neighbors = _shifted_stack(image_xyz, a, b)                  # [K, H, W, 3]
    neighbor_nonzero = jnp.any(neighbors != 0.0, axis=-1)        # OR, linalg:34-38

    center_range = jnp.linalg.norm(image_xyz, axis=-1)           # [H, W]
    neighbor_range = jnp.linalg.norm(neighbors, axis=-1)         # [K, H, W]
    range_ok = jnp.abs(neighbor_range - center_range[None]) <= spec.epsilon_range

    contrib = neighbor_nonzero & range_ok                        # [K, H, W]
    w = contrib.astype(image_xyz.dtype)
    n = jnp.sum(w, axis=0)                                       # [H, W]
    n_safe = jnp.maximum(n, 2.0)                                 # avoid /0, /(n-1)=0

    masked = neighbors * w[..., None]
    mean = jnp.sum(masked, axis=0) / n_safe[..., None]           # linalg:41-42
    diff = (neighbors - mean[None]) * w[..., None]               # linalg:43-44
    cov = jnp.einsum("khwi,khwj->hwij", diff, diff) / (n_safe - 1.0)[..., None, None]

    normal, _ = smallest_eigenvector_sym3x3(cov)

    # Flip toward sensor (:79-81).
    dots = jnp.sum(normal * image_xyz, axis=-1)
    normal = jnp.where((dots > 0.0)[..., None], -normal, normal)

    enough = center_valid & (n >= spec.min_neighbors)            # :67-69
    return jnp.where(enough[..., None], normal, 0.0)


def normals_for_points(
    image_xyz: jnp.ndarray,
    point_index: jnp.ndarray,
    survivor: jnp.ndarray,
    num_points: int,
    spec: NormalsSpec,
) -> jnp.ndarray:
    """Compute a normal per *point* for a projected scan.

    Scatters pixel normals back to the surviving points' slots in a padded
    ``[N, 3]`` array (zeros elsewhere) — the on-disk contract of the
    reference's preprocessing (preprocesser.py:64-68: per-scan normals array
    aligned with the deduplicated point list).
    """
    normal_image = compute_normal_image(image_xyz, spec)          # [H, W, 3]
    flat_normals = normal_image.reshape(-1, 3)
    flat_index = point_index.reshape(-1)
    out = jnp.zeros((num_points, 3), dtype=image_xyz.dtype)
    scatter_idx = jnp.where(flat_index >= 0, flat_index, num_points)
    out = jnp.concatenate([out, jnp.zeros((1, 3), out.dtype)], axis=0)
    out = out.at[scatter_idx].set(flat_normals, mode="drop")[:num_points]
    return out * survivor[:, None]
