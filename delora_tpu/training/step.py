"""The fully-jitted training / inference step.

This is the architectural inversion of the reference's hot loop (SURVEY.md §3.1):
the reference's ``Deployer.step`` (reference src/deploy/deployer.py:237-375)
makes >=4 device<->host round trips *per sample* (numba dedup, KD-tree build,
KD query, stat readback) inside Python loops. Here everything between the
padded point arrays and the scalar loss — augmentation, pair normalization,
projection with closest-point dedup, model forward, quaternion->SE(3), source
warp, correspondence search, masked ICP losses, gradients and the Adam
update — is ONE compiled XLA program over the whole batch.

Faithful-vs-fixed divergences (SURVEY.md §7 "hard parts" 5, decided here):
  * the reference accumulates ``loss_pc`` over the per-sample loop re-adding
    earlier samples (deployer.py:309-312); we compute a plain batch mean,
  * the reference's supervised warmup loss keeps only the last sample
    (deployer.py:324-327 inside the loop); we average over the batch,
  * augmentation is batch-safe (the reference raises for batch > 1,
    deployer.py:204).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from delora_tpu import se3
from delora_tpu.losses.icp import IcpLossConfig, icp_losses
from delora_tpu.ops.correspondence import (
    brute_force_correspondence,
    image_space_correspondence_batch,
    projective_correspondence,
)
from delora_tpu.ops.projection import (
    ProjectionSpec,
    compute_uv,
    gather_image_attribute,
    project_image,
    project_image_packed_batch,
    project_compact_exact_batch,
    project_scan,
    project_scan_compact,
)


class ScanPairBatch(NamedTuple):
    """One training batch of consecutive scan pairs, fixed shapes.

    points_*: [B, N, 3] float32 (padded), normals_*: [B, N, 3] (zeros = no
    normal), valid_*: [B, N] bool. Scan 1 is the target frame at time t,
    scan 2 the source at t+1 (reference dataset.py:124-154 pairing).
    """

    points_1: jnp.ndarray
    normals_1: jnp.ndarray
    valid_1: jnp.ndarray
    points_2: jnp.ndarray
    normals_2: jnp.ndarray
    valid_2: jnp.ndarray


class StepConfig(NamedTuple):
    """Static (hashable) step configuration — one compiled program per value."""

    proj: ProjectionSpec
    icp: IcpLossConfig
    correspondence: str = "image"            # "image" | "projective" | "brute"
    window: Tuple[int, int] = (5, 9)
    supervised: bool = False                  # identity-fit warmup phase
    augment: bool = False
    augment_only_yaw: bool = False
    augment_magnitude_rad: float = 0.0698     # 4 degrees
    normalization_scaling: bool = False
    use_pallas_nn: bool = False
    matcher_backend: str = "auto"             # "auto" | "xla" | "pallas"
    placement_backend: str = "auto"           # "auto" | "xla" | "pallas"
    # Eval mode: dropout OFF in the loss forward pass. The reference disables
    # dropout at test time (reference bin/run_testing.py:69-71); the Tester
    # sets this so test-time losses are deterministic even with
    # ``use_dropout: true``.
    deterministic: bool = False
    # > 0 (meters): softmax-blended window matching instead of hard argmin —
    # removes the azimuth-column quantization ripple in the loss (r19 yaw
    # aliasing; ops/correspondence.py image_space_correspondence_core).
    soft_match_sigma: float = 0.0
    # > 0: weight of the REVERSE point-to-plane term (image matcher only):
    # every occupied TARGET pixel is matched against the warped-source
    # image, and (t - s_match).n_s_match^2 is penalized with gradient
    # flowing through the matched warped-source point/normal. Forward-only
    # projective ICP can slide along self-similar structure (the r17-r19
    # failure mode) because unexplained TARGET points cost nothing; the
    # reverse term charges for them. No reference counterpart (the
    # reference matches one direction only, icp_losses.py:34).
    lambda_rev_po2pl: float = 0.0

    @classmethod
    def from_config(cls, config, dataset: str, *, supervised: bool):
        import math

        return cls(
            proj=ProjectionSpec.from_config(config, dataset),
            icp=IcpLossConfig.from_config(config),
            correspondence=str(config["correspondence"]),
            window=tuple(config["projective_window"]),
            supervised=supervised,
            augment=bool(config["random_point_cloud_rotations"]),
            augment_only_yaw=bool(config["random_rotations_only_yaw"]),
            augment_magnitude_rad=float(config["magnitude_random_rot"]) / 180.0 * math.pi,
            normalization_scaling=bool(config["normalization_scaling"]),
            use_pallas_nn=bool(config.get("use_pallas_nn", False)),
            matcher_backend=str(config.get("matcher_backend", "auto")),
            placement_backend=str(config.get("placement_backend", "auto")),
            soft_match_sigma=float(config.get("soft_match_sigma", 0.0)),
            lambda_rev_po2pl=float(config.get("lambda_reverse_po2pl", 0.0)),
        )


def _augment(points, normals, rng, cfg: StepConfig):
    """Random small rotation of the source scan (deployer.py:201-218), batched."""
    B = points.shape[0]
    dir_rng, mag_rng = jax.random.split(rng)
    if cfg.augment_only_yaw:
        direction = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (B, 1))
    else:
        direction = jax.random.uniform(dir_rng, (B, 3))
        direction = direction / jnp.maximum(
            jnp.linalg.norm(direction, axis=-1, keepdims=True), 1e-9
        )
    magnitude = (jax.random.uniform(mag_rng, (B, 1)) - 0.5) * cfg.augment_magnitude_rad
    R = se3.axis_angle_to_rotmat(direction * magnitude)
    return points @ jnp.swapaxes(R, -1, -2), normals @ jnp.swapaxes(R, -1, -2)


def _pair_normalization(batch: ScanPairBatch):
    """Range-mean pair normalization (deployer.py:222-235) over valid points."""
    def mean_range(p, m):
        r = jnp.linalg.norm(p, axis=-1)
        m = m.astype(p.dtype)
        return jnp.sum(r * m, axis=-1) / jnp.maximum(jnp.sum(m, axis=-1), 1.0)

    m1 = mean_range(batch.points_1, batch.valid_1)
    m2 = mean_range(batch.points_2, batch.valid_2)
    scale = 0.5 * (m1 + m2)                                   # [B]
    s = scale[:, None, None]
    return batch._replace(points_1=batch.points_1 / s, points_2=batch.points_2 / s), scale


def _image_pair(batch: ScanPairBatch, cfg: StepConfig):
    """Project both scans to range images (image-only fast path)."""
    proj = functools.partial(project_image, spec=cfg.proj)
    i1 = jax.vmap(proj)(batch.points_1, batch.valid_1)
    i2 = jax.vmap(proj)(batch.points_2, batch.valid_2)
    return i1, i2


def forward_pose(apply_fn, params, image_1, image_2, quat_also=False,
                 deterministic=True, rngs=None):
    """Model forward -> [B, 4, 4] transforms (and optionally raw outputs)."""
    kwargs = {"deterministic": deterministic}
    if rngs:
        kwargs["rngs"] = rngs
    translation, quat = apply_fn(params, image_1, image_2, **kwargs)
    T = se3.transform_from_quat(translation, quat)
    if quat_also:
        return T, translation, quat
    return T


def _loss_core(
    apply_fn, params, image_1, target_normal_image,
    points_2, normals_2, valid_2, cfg: StepConfig, drop_rng,
    brute_target=None, scale=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Shared loss tail: everything downstream of the target-side artifacts.

    ``image_1`` [B,H,W,4] and ``target_normal_image`` [B,H,W,3] arrive either
    freshly projected (``loss_and_metrics``) or from the host-side per-scan
    cache (``loss_and_metrics_cached`` — same values, computed once per scan
    instead of once per step). ``brute_target`` = (points_1, survivor_1,
    normals_1) is required only for brute-force correspondence.
    """
    # Source scan: projection fused with survivor compaction. Only surviving
    # points enter the loss (deployer.py:257-261); projection guarantees
    # <= H*W survivors (one winner per pixel), so correspondence/loss work
    # shrinks from N (padded, e.g. 131k) to H*W (e.g. 46k) losslessly.
    HW = cfg.proj.height * cfg.proj.width
    if HW < (1 << 16):
        # Gather-free projection + compaction: normals ride two fat sorts
        # (dedup, then winner compaction) as payload; the image is placed
        # from the compacted winners (overflow-free). Exact project_scan
        # winner semantics. Channels: xyz(3), normal(3), range(1).
        vals = jnp.concatenate([points_2, normals_2], axis=-1)
        proj_2 = project_compact_exact_batch(
            points_2, valid_2, cfg.proj, values=vals,
            backend=cfg.placement_backend,
        )
        image_2 = jnp.concatenate(
            [proj_2.image[..., 0:3], proj_2.image[..., 6:7]], axis=-1
        )
        m = proj_2.comp_mask[..., None]
        pts_c = proj_2.comp_vals[..., 0:3] * m
        nrm_c = proj_2.comp_vals[..., 3:6] * m
        src_valid = proj_2.comp_mask
    else:
        proj_2 = jax.vmap(lambda p, m: project_scan_compact(p, m, cfg.proj))(
            points_2, valid_2
        )
        image_2 = proj_2.image

        def compact(pts, nrm, ids, mask):
            both = jnp.concatenate([pts, nrm], axis=-1)[ids]  # one fused gather
            return both[:, :3] * mask[:, None], both[:, 3:] * mask[:, None]

        pts_c, nrm_c = jax.vmap(compact)(
            points_2, normals_2, proj_2.ids, proj_2.mask
        )
        src_valid = proj_2.mask
    return _loss_tail(
        apply_fn, params, image_1, target_normal_image,
        image_2, pts_c, nrm_c, src_valid, cfg, drop_rng,
        brute_target=brute_target, scale=scale,
    )


def _loss_tail(
    apply_fn, params, image_1, target_normal_image,
    image_2, pts_c, nrm_c, src_valid, cfg: StepConfig, drop_rng,
    brute_target=None, scale=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Forward -> warp -> correspondence -> losses, given both images and the
    compacted source point set (however they were produced)."""
    T = forward_pose(
        apply_fn, params, image_1, image_2,
        deterministic=cfg.deterministic,
        rngs=None if cfg.deterministic else {"dropout": drop_rng},
    )
    rev_po2pl = None                  # set by the image branch when enabled

    # Warp source points / rotate source normals by the predicted transform
    # (deployer.py:294-299).
    src_pts = se3.transform_points(T, pts_c)
    src_nrm = se3.rotate_points(T, nrm_c)

    loss_src = (src_pts, src_nrm, src_valid)
    placement_overflow = jnp.zeros((), jnp.float32)
    if cfg.correspondence == "projective":
        corr = jax.vmap(
            lambda s, m, img, nimg: projective_correspondence(
                s, m, img, nimg, cfg.proj, cfg.window
            )
        )(src_pts, src_valid, image_1, target_normal_image)
    elif cfg.correspondence == "image":
        # Gather-free image-space matching: re-project the warped source and
        # match per pixel against shifted target images; the loss runs over
        # pixels instead of points. The projection stores each winner's
        # ORIGINAL coordinates/normal (keys from the detached warped
        # positions) and the differentiable warp is re-applied per PIXEL
        # afterwards — so the only gradient path to T is elementwise
        # (gather commutes with the pointwise warp: identical values and
        # gradients, but no gather/scatter in the backward graph —
        # docs/BENCH_NOTES.md r9; the reference likewise detaches the
        # correspondence search, icp_losses.py:64-67).
        pos_sel = se3.transform_points(jax.lax.stop_gradient(T), pts_c)
        # Payload: original xyz + normal + a constant-1 occupancy channel
        # (exact in the bf16-split placement). The occupancy channel doubles
        # as the HOMOGENEOUS coordinate of the per-pixel warp below, so the
        # translation applies only at occupied pixels and empty pixels stay
        # exactly zero — replacing the old slice/reshape/where/two-dot chain
        # (0.47 ms of channel-slice copies at KITTI B=8, BENCH_NOTES r17).
        vals = jnp.concatenate(
            [pts_c, nrm_c, jnp.ones_like(pts_c[..., :1])], axis=-1
        )                                                       # [B, cap, 7]
        # Image-only packed-key projection (one sort) at train resolutions;
        # project_scan if H*W exceeds the 16-bit pixel-key budget.
        if cfg.proj.height * cfg.proj.width < (1 << 16):
            # The reprojection is the one NON-compacted placement in the hot
            # path — the only place window overflow (dropped winners, and
            # therefore possible xla/pallas divergence) can occur. Count it
            # on-device and surface it in the step metrics.
            wimage, n_overflow = project_image_packed_batch(
                pos_sel, src_valid, cfg.proj, values=vals,
                backend=cfg.placement_backend, return_overflow=True,
                append_range=False,
            )
            placement_overflow = jnp.sum(n_overflow).astype(jnp.float32)
        else:
            wimage = jax.vmap(
                lambda pv, m: project_scan(pv, m, cfg.proj).image[..., 3:10]
            )(jnp.concatenate([pos_sel, vals], axis=-1), src_valid)
        # wimage [B, H, W, 7]: original xyz, original normal, occupancy 1/0.
        # One per-pixel affine consumes the WHOLE image (no channel-slice
        # copies feeding separate dots): rows [x, n, o] map to
        # [x@R^T + o*t, n@R^T, o].
        B = wimage.shape[0]
        R = T[:, :3, :3]
        A = jnp.zeros((B, 7, 7), T.dtype)
        A = A.at[:, 0:3, 0:3].set(R)
        A = A.at[:, 3:6, 3:6].set(R)
        A = A.at[:, 0:3, 6].set(T[:, :3, 3])
        A = A.at[:, 6, 6].set(1.0)
        # (Emitting channel-major planes straight out of this dot and
        # feeding them to the matcher kernel whole was tried — r17 — and
        # makes XLA stage the pallas operands/outputs in scoped VMEM,
        # 17.7 MB > the 16 MB budget; with the budget raised via
        # xla_tpu_scoped_vmem_limit_kib it compiles but measures identical.
        # The channels-last form needs no compiler options.)
        s_all = jnp.einsum("bhwc,bdc->bhwd", wimage, A)         # [B, H, W, 7]
        HW = cfg.proj.height * cfg.proj.width
        s_xyz = s_all[..., 0:3].reshape(B, HW, 3)
        s_nrm = s_all[..., 3:6].reshape(B, HW, 3)
        s_occ = wimage[..., 6].reshape(B, HW) > 0.5
        corr = image_space_correspondence_batch(
            s_xyz, s_occ, image_1, target_normal_image,
            cfg.proj, cfg.window, backend=cfg.matcher_backend,
            soft_sigma=cfg.soft_match_sigma,
        )
        loss_src = (s_xyz, s_nrm, corr.valid)

        if cfg.lambda_rev_po2pl > 0.0:
            # REVERSE direction: match occupied TARGET pixels against the
            # warped-source image. Selection is detached (index-only
            # matcher); the winner's payload is re-gathered DIFFERENTIABLY
            # from s_all so gradient reaches the pose through the matched
            # warped point and rotated normal. This is the anti-sliding
            # anchor: unexplained target structure now costs loss.
            from delora_tpu.ops.correspondence import window_match_indices

            Hd, Wd = cfg.proj.height, cfg.proj.width
            wv, wu = cfg.window
            t_xyz = image_1[..., 0:3].reshape(B, HW, 3)
            t_occ = image_1[..., 3].reshape(B, HW) > 0.0
            cand_xyz = jax.lax.stop_gradient(s_all[..., 0:3])
            cand_occ = wimage[..., 6] > 0.5
            k_r, sq_r, val_r = jax.vmap(
                lambda q, qo, ci, co: window_match_indices(
                    q, qo, ci, co, cfg.proj, cfg.window
                )
            )(t_xyz, t_occ, cand_xyz, cand_occ)
            p = jnp.arange(HW)
            row = jnp.clip(
                p[None, :] // Wd + k_r // wu - wv // 2, 0, Hd - 1
            )
            col = jnp.mod(p[None, :] % Wd + k_r % wu - wu // 2, Wd)
            win = row * Wd + col                           # [B, HW]
            s_flat = s_all.reshape(B, HW, 7)
            matched = jnp.take_along_axis(s_flat, win[..., None], axis=1)
            s_m_xyz = matched[..., 0:3]
            s_m_nrm = matched[..., 3:6]
            ok = val_r & t_occ & jnp.any(s_m_nrm != 0.0, axis=-1)
            if cfg.icp.trim_sq_distance > 0.0:
                ok = ok & (sq_r <= cfg.icp.trim_sq_distance)
            resid = jnp.sum((t_xyz - s_m_xyz) * s_m_nrm, axis=-1)
            okf = ok.astype(resid.dtype)
            per_sample_rev = jnp.sum(resid * resid * okf, axis=1) / (
                jnp.maximum(jnp.sum(okf, axis=1), 1.0)
            )
            rev_po2pl = jnp.mean(per_sample_rev)
    else:
        if brute_target is None:
            raise ValueError(
                "brute-force correspondence needs raw target points — "
                "unavailable in cached-target mode (set correspondence: "
                "projective or cache_target_projections: false)"
            )
        points_1, survivor_1, normals_1 = brute_target
        corr = jax.vmap(
            lambda s, m, t, tv, tn: brute_force_correspondence(
                s, m, t, tv, tn, use_pallas=cfg.use_pallas_nn
            )
        )(src_pts, src_valid, points_1, survivor_1, normals_1)

    per_pair = jax.vmap(lambda s, n, m, c: icp_losses(s, n, m, c, cfg.icp))(
        *loss_src, corr
    )
    losses = {k: jnp.mean(v) for k, v in per_pair.items()}
    if rev_po2pl is None:
        rev_po2pl = jnp.zeros((), losses["loss_pc"].dtype)
    else:
        losses["loss_pc"] = (
            losses["loss_pc"] + cfg.lambda_rev_po2pl * rev_po2pl
        )

    # Supervised identity-fit warmup (deployer.py:324-336), batch-averaged.
    eye = jnp.eye(4, dtype=T.dtype)
    loss_identity = jnp.mean((T - eye) ** 2)

    # cfg.supervised is static: the unused branch is never traced in.
    loss = loss_identity if cfg.supervised else losses["loss_pc"]

    # Visible-pixel statistic (deployer.py:365-367): how many warped source
    # points land inside the vertical FoV.
    _, v_pix = compute_uv(src_pts, cfg.proj)
    visible = jnp.sum(
        (jnp.round(v_pix) < cfg.proj.height) & (v_pix > 0.0) & src_valid,
        axis=-1,
    )

    metrics = {
        "loss": loss,
        "loss_pc": losses["loss_pc"],
        "loss_po2po": losses["loss_po2po"],
        "loss_po2pl": losses["loss_po2pl"],
        "loss_pl2pl": losses["loss_pl2pl"],
        "loss_po2pl_rev": rev_po2pl,
        "loss_identity": loss_identity,
        "num_po2pl_pairs": jnp.mean(
            per_pair["num_po2pl_pairs"].astype(jnp.float32)
        ),
        "visible_pixels": jnp.mean(visible.astype(jnp.float32)),
        # Total reprojection-placement tiles whose window overflowed this
        # step (dropped winners -> possible xla/pallas divergence); 0 in
        # normal operation. Only the image matcher's packed reprojection can
        # overflow — the compacted target/source placements cannot.
        "placement_overflow_tiles": placement_overflow,
    }
    aux = {"transforms": T, "scale": scale}
    return loss, (metrics, aux)


def loss_and_metrics(
    apply_fn, params, batch: ScanPairBatch, cfg: StepConfig, rng
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total loss + metrics dict for one batch (differentiable w.r.t. params)."""
    aug_rng, drop_rng = jax.random.split(rng)
    if cfg.augment:
        p2, n2 = _augment(batch.points_2, batch.normals_2, aug_rng, cfg)
        batch = batch._replace(points_2=p2, normals_2=n2)
    scale = None
    if cfg.normalization_scaling:
        batch, scale = _pair_normalization(batch)

    HW = cfg.proj.height * cfg.proj.width
    if cfg.correspondence != "brute" and HW < (1 << 16):
        # Target image + normal image from ONE packed fat sort (normals ride
        # as payload) — replaces project_scan (3 sorts) + the per-pixel
        # normal gather.
        vals = jnp.concatenate([batch.points_1, batch.normals_1], axis=-1)
        timg = project_compact_exact_batch(
            batch.points_1, batch.valid_1, cfg.proj, values=vals,
            backend=cfg.placement_backend,
        ).image
        image_1 = jnp.concatenate([timg[..., 0:3], timg[..., 6:7]], axis=-1)
        target_normal_image = timg[..., 3:6]
        brute_target = None
    else:
        proj_1 = jax.vmap(lambda p, m: project_scan(p, m, cfg.proj))(
            batch.points_1, batch.valid_1
        )
        image_1 = proj_1.image
        target_normal_image = jax.vmap(gather_image_attribute)(
            batch.normals_1, proj_1.point_index
        )
        brute_target = (batch.points_1, proj_1.survivor, batch.normals_1)
    return _loss_core(
        apply_fn, params, image_1, target_normal_image,
        batch.points_2, batch.normals_2, batch.valid_2, cfg, drop_rng,
        brute_target=brute_target,
        scale=scale,
    )


class CachedTargetBatch(NamedTuple):
    """Batch whose target-side projection artifacts are precomputed.

    The target image/normal-image of a scan are epoch-invariant (see
    delora_tpu/ops/projection_host.py), so the trainer feeds them from a
    per-scan host cache instead of re-projecting on device every step —
    halving projection work and shrinking the host->device transfer.

    image_1:        [B, H, W, 4] float32 — xyz + range, zeros at empty pixels.
    normal_image_1: [B, H, W, 3] float32 — zero = no-normal sentinel.
    mean_range_1:   [B] float32 — target mean range (pair normalization).
    points_2 / normals_2 / valid_2: as in :class:`ScanPairBatch`.
    """

    image_1: jnp.ndarray
    normal_image_1: jnp.ndarray
    mean_range_1: jnp.ndarray
    points_2: jnp.ndarray
    normals_2: jnp.ndarray
    valid_2: jnp.ndarray


def loss_and_metrics_cached(
    apply_fn, params, batch: CachedTargetBatch, cfg: StepConfig, rng
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """``loss_and_metrics`` over a :class:`CachedTargetBatch`.

    Mathematically identical to the uncached step (projective correspondence
    path): augmentation touches only the source; under pair normalization the
    cached target image scales by 1/s because (u, v) are angles and the
    per-pixel winner is decided by range *ordering* (deployer.py:222-235
    semantics preserved).
    """
    aug_rng, drop_rng = jax.random.split(rng)
    points_2, normals_2 = batch.points_2, batch.normals_2
    if cfg.augment:
        points_2, normals_2 = _augment(points_2, normals_2, aug_rng, cfg)
    image_1 = batch.image_1
    scale = None
    if cfg.normalization_scaling:
        r = jnp.linalg.norm(points_2, axis=-1)
        m = batch.valid_2.astype(points_2.dtype)
        m2 = jnp.sum(r * m, axis=-1) / jnp.maximum(jnp.sum(m, axis=-1), 1.0)
        scale = 0.5 * (batch.mean_range_1 + m2)              # [B]
        points_2 = points_2 / scale[:, None, None]
        image_1 = image_1 / scale[:, None, None, None]       # all 4 chans linear
    return _loss_core(
        apply_fn, params, image_1, batch.normal_image_1,
        points_2, normals_2, batch.valid_2, cfg, drop_rng, scale=scale,
    )


class FullyCachedBatch(NamedTuple):
    """Batch whose BOTH scans' projection artifacts are precomputed.

    With augmentation off (the default — reference
    config/hyperparameters.yaml ``random_point_cloud_rotations: False``) the
    source scan's projection/compaction is epoch-invariant too, so the host
    cache (delora_tpu/ops/projection_host.py ``scan_artifacts_np``) feeds the
    step everything downstream of projection: no raw padded point cloud — and
    therefore no padded-N sort — enters the compiled program at all.

    image_1 / normal_image_1 / mean_range_1: target artifacts, as in
        :class:`CachedTargetBatch`.
    image_2:       [B, H, W, 4] source range image (model input).
    src_points:    [B, cap, 3] compacted surviving source points.
    src_normals:   [B, cap, 3] their normals (zeros = no normal).
    src_valid:     [B, cap] bool.
    mean_range_2:  [B] source mean range (pair normalization).
    """

    image_1: jnp.ndarray
    normal_image_1: jnp.ndarray
    mean_range_1: jnp.ndarray
    image_2: jnp.ndarray
    src_points: jnp.ndarray
    src_normals: jnp.ndarray
    src_valid: jnp.ndarray
    mean_range_2: jnp.ndarray


def loss_and_metrics_fullcached(
    apply_fn, params, batch: FullyCachedBatch, cfg: StepConfig, rng
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """``loss_and_metrics`` over a :class:`FullyCachedBatch`.

    Equal to the cached-target step (tests/test_fullcached.py): the host
    compaction reproduces ``project_scan_compact`` exactly, and under pair
    normalization all cached artifacts are linear in 1/s (points, images) so
    scaling them matches re-projecting scaled points (range ordering, hence
    the per-pixel winner, is scale-invariant).

    With ``cfg.augment`` on, the random rotation is applied to the CACHED
    COMPACTED SURVIVORS (<= H*W points) which are then re-projected on
    device via the exact-compaction path — the cached ``image_2`` cannot
    express a rotated scan, but the survivors can be rotated and re-placed
    at ~1/3 the sort cost of the raw 131k-point cloud. Deviation from the
    raw path (documented decision): points that LOST the per-pixel dedup in
    the unrotated frame cannot resurface as winners after rotation.

    MEASURED at KITTI-like candidate density (structured world, ~6 stored
    points per occupied train pixel, preprocessing-resolution normals, 4 deg
    magnitude — tests/test_fullcached.py::
    test_fullcached_augment_deviation_quantified_at_density): ~6% of
    occupied source pixels lose coverage (their winner moved and the loser
    that would have backfilled is absent), ~40% select a DIFFERENT
    same-surface candidate (median |delta range| ~0.5 m), po2pl pair count
    ~0.8x, relative loss delta ~18% at a random init. This is a materially
    different — though still unbiased-over-the-surface — sample of the scan,
    NOT a boundary effect. On scans where projection keeps every valid point
    the two paths are exactly equal
    (tests/test_fullcached.py::test_fullcached_augment_equals_cached).
    Training-quality impact is measured by the on-chip augment A/B
    (docs/BENCH_NOTES.md); set ``cache_source_projections: false`` to train
    augment-on through the deviation-free cached-target feed instead.
    Rotation preserves ranges, so the cached ``mean_range_2`` stays valid
    under pair normalization.
    """
    aug_rng, drop_rng = jax.random.split(rng)
    image_1 = batch.image_1
    src_pts, src_nrm = batch.src_points, batch.src_normals
    if cfg.augment:
        src_pts, src_nrm = _augment(src_pts, src_nrm, aug_rng, cfg)
        scale = None
        if cfg.normalization_scaling:
            scale = 0.5 * (batch.mean_range_1 + batch.mean_range_2)  # [B]
            s = scale[:, None, None]
            src_pts = src_pts / s
            image_1 = image_1 / s[..., None]
        # Re-project the rotated survivors (cap <= H*W entries) — image_2 and
        # the re-compacted source set come out of _loss_core's projection.
        return _loss_core(
            apply_fn, params, image_1, batch.normal_image_1,
            src_pts, src_nrm, batch.src_valid, cfg, drop_rng, scale=scale,
        )
    image_2 = batch.image_2
    scale = None
    if cfg.normalization_scaling:
        scale = 0.5 * (batch.mean_range_1 + batch.mean_range_2)   # [B]
        s = scale[:, None, None]
        src_pts = src_pts / s
        image_1 = image_1 / s[..., None]      # all 4 channels linear in 1/s
        image_2 = image_2 / s[..., None]
    return _loss_tail(
        apply_fn, params, image_1, batch.normal_image_1,
        image_2, src_pts, src_nrm, batch.src_valid, cfg, drop_rng,
        scale=scale,
    )


def _check_fullcached(cfg: StepConfig):
    if cfg.correspondence not in ("projective", "image"):
        raise ValueError(
            "fully-cached training requires projective or image-space "
            "correspondence"
        )


def make_train_step(model, cfg: StepConfig, donate: bool = True):
    """Build the jitted train step: (state, batch, rng) -> (state, metrics)."""

    def step(state, batch: ScanPairBatch, rng):
        grad_fn = jax.value_and_grad(
            lambda p: loss_and_metrics(state.apply_fn, p, batch, cfg, rng),
            has_aux=True,
        )
        (loss, (metrics, _)), grads = grad_fn(state.params)
        new_state = state.apply_gradients(grads=grads)
        metrics["grad_norm"] = optax_global_norm(grads)
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_train_step_cached(model, cfg: StepConfig, donate: bool = True):
    """Jitted train step over :class:`CachedTargetBatch` inputs."""
    if cfg.correspondence not in ("projective", "image"):
        raise ValueError(
            "cached-target training requires projective or image-space "
            "correspondence"
        )

    def step(state, batch: CachedTargetBatch, rng):
        grad_fn = jax.value_and_grad(
            lambda p: loss_and_metrics_cached(
                state.apply_fn, p, batch, cfg, rng
            ),
            has_aux=True,
        )
        (loss, (metrics, _)), grads = grad_fn(state.params)
        new_state = state.apply_gradients(grads=grads)
        metrics["grad_norm"] = optax_global_norm(grads)
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_train_step_fullcached(model, cfg: StepConfig, donate: bool = True):
    """Jitted train step over :class:`FullyCachedBatch` inputs."""
    _check_fullcached(cfg)

    def step(state, batch: FullyCachedBatch, rng):
        grad_fn = jax.value_and_grad(
            lambda p: loss_and_metrics_fullcached(
                state.apply_fn, p, batch, cfg, rng
            ),
            has_aux=True,
        )
        (loss, (metrics, _)), grads = grad_fn(state.params)
        new_state = state.apply_gradients(grads=grads)
        metrics["grad_norm"] = optax_global_norm(grads)
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_infer_step(model, cfg: StepConfig):
    """Jitted inference: batch -> [B, 4, 4] relative transforms.

    Mirrors the reference's inference-only path (deployer.py:370-375),
    including un-scaling predicted translations under pair normalization
    (deployer.py:344-346).
    """

    def step(params, batch: ScanPairBatch):
        b, scale = (batch, None)
        if cfg.normalization_scaling:
            b, scale = _pair_normalization(batch)
        image_1, image_2 = _image_pair(b, cfg)
        T = forward_pose(model.apply, params, image_1, image_2)
        if scale is not None:
            T = T.at[:, :3, 3].multiply(scale[:, None])
        return T

    return jax.jit(step)


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.vdot(x, x).real for x in leaves))
