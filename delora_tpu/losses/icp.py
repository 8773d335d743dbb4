"""Geometric scan-matching (ICP-style) self-supervised losses, mask-based.

TPU-native re-design of the reference loss head (reference
src/losses/icp_losses.py). The reference partitions ragged point lists into
has-normal / no-normal subsets with boolean indexing and runs a host KD-tree
per subset; here every partition is a boolean mask over fixed-shape arrays and
the correspondences come from :mod:`delora_tpu.ops.correspondence` — the whole
loss is differentiable XLA with gradients flowing through the transformed
source points and rotated source normals only (the reference detaches
correspondence indices, icp_losses.py:64-67; targets carry no gradient).

Pair selection parity (icp_losses.py:48-121):
  * a point "has a normal" iff ANY normal component is nonzero (:48-52),
  * po2pl + pl2pl use pairs where BOTH the source point and its matched
    target point have normals (:101-121),
  * po2po (off by default) uses pairs where NEITHER has a normal (:83-99).

Residual parity:
  * po2pl: mean over pairs of ((s - t) . n_t)^2            (:196-203)
  * pl2pl "squared": mean over pairs of ||n_s - n_t||^2    (:232-238)
  * pl2pl "linear":  mean over pairs of (1 - n_s . n_t)^2  (:224-231)
  * po2po: mean over 3P coordinates of (s_i - t_i)^2       (:168-179)
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax.numpy as jnp

from delora_tpu.ops.correspondence import Correspondence


class IcpLossConfig(NamedTuple):
    point_to_point: bool = False
    point_to_plane: bool = True
    plane_to_plane: bool = True
    po2po_alone: bool = False         # ALL pairs, po2po only (icp_losses.py:36-46)
    normal_loss: str = "squared"      # "squared" | "linear"
    lambda_po2pl: float = 1.0
    lambda_pl2pl: float = 1.0         # r19: pl2pl rides quantization-noisy
                                      # normals; its floor (~0.21) drowns
                                      # po2pl's precise signal (~0.005) —
                                      # down-weighting it raises the pose
                                      # gradient SNR. 1.0 = reference parity
    trim_sq_distance: float = 0.0     # >0: reject pairs with NN dist^2 above

    @classmethod
    def from_config(cls, config):
        trim = float(config.get("po2pl_trim_distance", 0.0))
        return cls(
            point_to_point=bool(config["point_to_point_loss"]),
            point_to_plane=bool(config["point_to_plane_loss"]),
            plane_to_plane=bool(config["plane_to_plane_loss"]),
            po2po_alone=bool(config.get("po2po_alone", False)),
            normal_loss=str(config["normal_loss"]),
            lambda_po2pl=float(config["lambda_po2pl"]),
            lambda_pl2pl=float(config.get("lambda_pl2pl", 1.0)),
            trim_sq_distance=trim * trim,
        )


def masked_mse(residual_sq: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of ``residual_sq`` over True entries; 0 if the mask is empty."""
    mask_f = mask.astype(residual_sq.dtype)
    count = jnp.sum(mask_f)
    return jnp.sum(residual_sq * mask_f) / jnp.maximum(count, 1.0)


def icp_losses(
    source_points: jnp.ndarray,       # [S, 3] transformed source points
    source_normals: jnp.ndarray,      # [S, 3] rotated source normals (0 = none)
    source_valid: jnp.ndarray,        # [S] bool (survived projection)
    corr: Correspondence,             # match per source point
    cfg: IcpLossConfig,
) -> Dict[str, jnp.ndarray]:
    """Scalar loss dict for one scan pair. vmap over a batch axis for batches."""
    source_has_normal = jnp.any(source_normals != 0.0, axis=-1)
    target_has_normal = jnp.any(corr.target_normals != 0.0, axis=-1)
    pair_ok = source_valid & corr.valid
    if cfg.trim_sq_distance > 0.0:
        pair_ok = pair_ok & (corr.sq_dist <= cfg.trim_sq_distance)

    diff = source_points - corr.target_points                       # [S, 3]
    zero = jnp.zeros((), dtype=source_points.dtype)

    if cfg.po2po_alone:
        # Normals ignored entirely: every matched pair contributes po2po
        # (icp_losses.py:36-46 "po2po_alone" branch).
        coord_mask = jnp.broadcast_to(pair_ok[:, None], diff.shape)
        loss_po2po = masked_mse(diff * diff, coord_mask)
        return {
            "loss_po2po": loss_po2po,
            "loss_po2pl": zero,
            "loss_pl2pl": zero,
            "num_po2pl_pairs": jnp.sum(pair_ok),
            "loss_pc": loss_po2po,
        }

    both_normals = pair_ok & source_has_normal & target_has_normal
    neither_normals = pair_ok & ~source_has_normal & ~target_has_normal

    losses = {
        "loss_po2po": zero,
        "loss_po2pl": zero,
        "loss_pl2pl": zero,
        "num_po2pl_pairs": jnp.sum(both_normals),
    }

    if cfg.point_to_point:
        # Elementwise MSE over the 3 coordinates of each pair (:168-179).
        coord_mask = jnp.broadcast_to(neither_normals[:, None], diff.shape)
        losses["loss_po2po"] = masked_mse(diff * diff, coord_mask)

    if cfg.point_to_plane:
        plane_dist = jnp.sum(diff * corr.target_normals, axis=-1)   # (s-t).n_t
        losses["loss_po2pl"] = masked_mse(plane_dist * plane_dist, both_normals)

    if cfg.plane_to_plane:
        if cfg.normal_loss == "linear":
            dots = jnp.sum(source_normals * corr.target_normals, axis=-1)
            residual = 1.0 - dots
            losses["loss_pl2pl"] = masked_mse(residual * residual, both_normals)
        else:  # "squared"
            ndiff = source_normals - corr.target_normals
            losses["loss_pl2pl"] = masked_mse(
                jnp.sum(ndiff * ndiff, axis=-1), both_normals
            )

    # At the default weight the multiply is skipped so the traced graph (and
    # the persistent-compile-cache key) is bit-identical to the pre-knob one.
    pl2pl_term = (
        losses["loss_pl2pl"] if cfg.lambda_pl2pl == 1.0
        else cfg.lambda_pl2pl * losses["loss_pl2pl"]
    )
    losses["loss_pc"] = (
        losses["loss_po2po"]
        + cfg.lambda_po2pl * losses["loss_po2pl"]
        + pl2pl_term
    )
    return losses
