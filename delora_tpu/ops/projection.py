"""Spherical range-image projection with closest-point-per-pixel dedup.

TPU-native replacement for the reference's host-bound projection
(reference src/utility/projection.py): the reference range-sorts the cloud
(projection.py:63-67), round-trips to the CPU for a numba first-writer-wins
occupancy loop (projection.py:36-43), and scatters back on device. Here the
whole thing is one fused XLA program over fixed shapes:

  1. (u, v) per point via atan2 (parity: projection.py:21-31),
  2. FoV cull -> flat pixel id (parity: projection.py:74-78),
  3. per-pixel closest point via ``segment_min`` over range — deterministic
     ties broken by smallest point index (the reference's sort-then-first-
     writer keeps the closest point; tie order differs only for exactly equal
     ranges),
  4. one scatter builds the image; a pixel->point index map replaces the
     reference's ragged ``image_to_pointcloud_indices``.

Ragged point lists become fixed-shape ``[N, 3]`` arrays + boolean masks
(SURVEY.md §7 "Ragged->padded semantics").
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ProjectionSpec(NamedTuple):
    """Static projection geometry for one sensor/dataset."""

    height: int                 # vertical_cells
    width: int                  # horizontal_cells
    fov_up: float               # vertical FoV upper bound, radians
    fov_down: float             # vertical FoV lower bound, radians
    fov_left: float             # horizontal FoV lower bound, radians (~ -pi)
    fov_right: float            # horizontal FoV upper bound, radians (~ +pi)

    @classmethod
    def from_config(cls, config, dataset: str, preprocessing: bool = False):
        spec = config[dataset]
        width_key = "horizontal_cells_preprocessing" if preprocessing else "horizontal_cells"
        return cls(
            height=int(spec["vertical_cells"]),
            width=int(spec[width_key]),
            fov_down=float(spec["vertical_field_of_view"][0]),
            fov_up=float(spec["vertical_field_of_view"][1]),
            fov_left=float(config["horizontal_field_of_view"][0]),
            fov_right=float(config["horizontal_field_of_view"][1]),
        )


class Projection(NamedTuple):
    """Result of projecting one scan.

    image:        [H, W, C+1] — input channels + appended range, zeros at
                  empty pixels (parity: projection.py:55-60, 98-103).
    survivor:     [N] bool — point won its pixel (closest-point dedup); the
                  loss only uses surviving points (deployer.py:257-261).
    point_index:  [H, W] int32 — index of the winning point per pixel, -1 if
                  empty. Replaces image_to_pointcloud_indices.
    u, v:         [N] float — unrounded pixel coordinates of every input point
                  (the reference returns these for the visible-pixel stat,
                  deployer.py:365-367).
    in_fov:       [N] bool — point valid and inside the FoV.
    """

    image: jnp.ndarray
    survivor: jnp.ndarray
    point_index: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray
    in_fov: jnp.ndarray


def compute_uv(points: jnp.ndarray, spec: ProjectionSpec):
    """Azimuth/elevation pixel coordinates (parity: projection.py:21-31)."""
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    u = (jnp.arctan2(y, x) - spec.fov_left) / (spec.fov_right - spec.fov_left) * (
        spec.width - 1
    )
    v = (jnp.arctan2(z, jnp.sqrt(x * x + y * y)) - spec.fov_down) / (
        spec.fov_up - spec.fov_down
    ) * (spec.height - 1)
    return u, v


def project_scan(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    spec: ProjectionSpec,
) -> Projection:
    """Project one padded scan ``[N, C>=3]`` with validity mask ``[N]``.

    All channels of ``points`` are scattered into the image; range is appended
    as the final channel (range and (u, v) always derive from channels 0:3).
    """
    N = points.shape[0]
    H, W = spec.height, spec.width
    num_pix = H * W

    r = jnp.linalg.norm(points[:, :3], axis=-1)
    u, v = compute_uv(points[:, :3], spec)
    ui = jnp.round(u)
    vi = jnp.round(v)
    in_fov = (
        valid
        & (r > 0)
        & (ui >= 0)
        & (ui <= W - 1)
        & (vi >= 0)
        & (vi <= H - 1)
    )
    ui = jnp.clip(ui.astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(vi.astype(jnp.int32), 0, H - 1)
    # Out-of-FoV points write to a sentinel segment that is dropped.
    pix = jnp.where(in_fov, vi * W + ui, num_pix)

    # Closest point per pixel (replaces argsort + numba first-writer-wins).
    big = jnp.asarray(jnp.inf, dtype=r.dtype)
    min_range = jax.ops.segment_min(
        jnp.where(in_fov, r, big), pix, num_segments=num_pix + 1
    )
    is_closest = in_fov & (r <= min_range[pix])
    point_ids = jnp.arange(N, dtype=jnp.int32)
    min_id = jax.ops.segment_min(
        jnp.where(is_closest, point_ids, N), pix, num_segments=num_pix + 1
    )
    survivor = is_closest & (min_id[pix] == point_ids)

    # Build image: each surviving point writes its unique pixel; everyone else
    # writes the sentinel row which is dropped.
    feat = jnp.concatenate([points, r[:, None]], axis=-1)
    scatter_pix = jnp.where(survivor, pix, num_pix)
    img_flat = jnp.zeros((num_pix + 1, feat.shape[-1]), dtype=feat.dtype)
    img_flat = img_flat.at[scatter_pix].set(feat, mode="drop")
    image = img_flat[:num_pix].reshape(H, W, feat.shape[-1])

    idx_flat = jnp.full((num_pix + 1,), -1, dtype=jnp.int32)
    idx_flat = idx_flat.at[scatter_pix].set(point_ids, mode="drop")
    point_index = idx_flat[:num_pix].reshape(H, W)

    return Projection(
        image=image, survivor=survivor, point_index=point_index, u=u, v=v, in_fov=in_fov
    )


def project_batch(points: jnp.ndarray, valid: jnp.ndarray, spec: ProjectionSpec) -> Projection:
    """vmap of :func:`project_scan` over a leading batch axis."""
    return jax.vmap(lambda p, m: project_scan(p, m, spec))(points, valid)


def gather_image_attribute(attr: jnp.ndarray, point_index: jnp.ndarray) -> jnp.ndarray:
    """Per-point attribute ``[N, C]`` -> per-pixel image ``[H, W, C]``.

    Empty pixels (point_index == -1) get zeros — zero normals are the
    load-bearing "no normal" sentinel throughout (SURVEY.md §7 hard part 2).
    """
    gathered = attr[jnp.clip(point_index, 0, None)]
    return jnp.where((point_index >= 0)[..., None], gathered, 0.0)
