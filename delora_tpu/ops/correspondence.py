"""On-device nearest-neighbor correspondence search.

TPU-native replacement for the reference's per-sample host-side scipy
``cKDTree`` build + query (reference src/losses/icp_losses.py:34, :24-26) —
the dominant GPU<->CPU round trip in the reference's training step. Two
interchangeable searchers, both batched and jittable; correspondence indices
are non-differentiated, matching the reference's ``detach()`` of KD indices
(icp_losses.py:64-67):

* ``projective_correspondence`` (default): project each transformed source
  point into the target's range image and take the best target point within a
  small pixel window — O(N * window), pure gathers, the standard projective
  data-association ICP variant. Window search compensates discretization.

* ``brute_force_correspondence``: exact nearest neighbor by tiled distance
  computation (XLA path here; a Pallas MXU-tiled kernel backs the hot path in
  :mod:`delora_tpu.ops.pallas.nn_search`). Used for parity validation and
  available via config ``correspondence: brute``.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from delora_tpu.ops.projection import ProjectionSpec, compute_uv


class Correspondence(NamedTuple):
    """Per-source-point match against the target scan.

    target_points:  [S, 3] matched target point (zeros if invalid)
    target_normals: [S, 3] matched target normal (zeros = no normal)
    valid:          [S] bool — a target point was found
    sq_dist:        [S] squared distance to the match (inf if invalid)
    """

    target_points: jnp.ndarray
    target_normals: jnp.ndarray
    valid: jnp.ndarray
    sq_dist: jnp.ndarray


def projective_correspondence(
    source_points: jnp.ndarray,          # [S, 3] transformed source points
    source_valid: jnp.ndarray,           # [S] bool
    target_image: jnp.ndarray,           # [H, W, >=3] projected target (xyz...)
    target_normal_image: jnp.ndarray,    # [H, W, 3] per-pixel target normals
    spec: ProjectionSpec,
    window: Tuple[int, int] = (5, 9),
) -> Correspondence:
    """Projective data association with a (wv x wu) window search.

    Azimuth (u) wraps around — the sensor is 360 degrees — while elevation (v)
    clamps, mirroring the projection FoV semantics.
    """
    H, W = spec.height, spec.width
    wv, wu = window
    a, b = wv // 2, wu // 2
    K = wv * wu

    # TPU gather economics drive this structure: per-point random gathers are
    # slow (a fori_loop doing K separate [S]-index gathers measured ~1 s/step
    # at KITTI scale), but ROW gathers of contiguous blocks are fast. So the
    # whole (K-candidate x 7-value) neighborhood of every pixel is
    # precomputed once as a [H*W, K, 7] table by K cheap image shifts
    # (azimuth wraps, elevation clamps — matching projection FoV semantics),
    # and each source point does ONE row gather of its base pixel.
    #
    # The search is non-differentiable (the reference detaches KD indices,
    # icp_losses.py:64-67); the winning residual is recomputed differentiably
    # w.r.t. the source points afterwards.
    src = jax.lax.stop_gradient(source_points)
    u, v = compute_uv(src, spec)
    ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)
    base_pix = vi * W + ui

    # Candidate table holds only what the argmin needs — xyz in bfloat16 plus
    # occupancy in the sign-free low bits: the gather is byte-bound, so the
    # selection pass reads a half-width [H*W, K, 4] table; the winner's exact
    # f32 point + normal come from one narrow follow-up gather of the winning
    # flat pixel. bf16 xyz only drives the *selection* (~3 decimal digits —
    # enough to rank candidates); residuals below are exact f32.
    occ = jnp.any(target_image[..., :3] != 0.0, axis=-1, keepdims=True)
    tgt = jnp.concatenate(
        [target_image[..., :3], occ.astype(target_image.dtype)], axis=-1
    ).astype(jnp.bfloat16)                                   # [H, W, 4]

    shifted = []
    for dv in range(-a, a + 1):
        if dv < 0:
            v_sh = jnp.concatenate(
                [jnp.repeat(tgt[:1], -dv, axis=0), tgt[:dv]], axis=0
            )
        elif dv > 0:
            v_sh = jnp.concatenate(
                [tgt[dv:], jnp.repeat(tgt[-1:], dv, axis=0)], axis=0
            )
        else:
            v_sh = tgt
        for du in range(-b, b + 1):
            shifted.append(jnp.roll(v_sh, -du, axis=1))
    table = jnp.stack(shifted, axis=2).reshape(H * W, K, 4)

    cand = table[base_pix].astype(jnp.float32)               # [S, K, 4]
    d = cand[..., :3] - src[:, None, :]
    sq = jnp.sum(d * d, axis=-1)
    sq = jnp.where(cand[..., 3] > 0.5, sq, jnp.inf)          # [S, K]
    best_k = jnp.argmin(sq, axis=-1)                         # [S]

    # Winner's exact data: recompute its flat pixel, one narrow gather.
    dv_w = best_k // wu - a
    du_w = best_k % wu - b
    win_pix = (
        jnp.clip(base_pix // W + dv_w, 0, H - 1) * W
        + jnp.mod(base_pix % W + du_w, W)
    )
    flat = jnp.concatenate(
        [target_image[..., :3], target_normal_image,
         occ.astype(target_image.dtype)],
        axis=-1,
    ).reshape(H * W, 7)
    best = flat[win_pix]                                     # [S, 7] f32
    best_occ = best[..., 6] > 0.5

    valid = best_occ & source_valid
    tgt_pts = jnp.where(valid[:, None], best[..., :3], 0.0)
    tgt_nrm = jnp.where(valid[:, None], best[..., 3:6], 0.0)
    # Differentiable w.r.t. the (non-detached) source points.
    dd = source_points - tgt_pts
    sq_out = jnp.where(valid, jnp.sum(dd * dd, axis=-1), jnp.inf)
    return Correspondence(tgt_pts, tgt_nrm, valid, sq_out)


def image_space_correspondence(
    warped_src_image: jnp.ndarray,       # [H, W, 7] warped-source projection:
                                         #   xyz, normal xyz, range
    target_image: jnp.ndarray,           # [H, W, >=3] projected target
    target_normal_image: jnp.ndarray,    # [H, W, 3]
    spec: ProjectionSpec,
    window: Tuple[int, int] = (5, 9),
):
    """Gather-free window correspondence between two range images.

    The transformed source scan is *re-projected* into its own range image
    (with its rotated normals riding as extra channels), so matching becomes
    per-pixel elementwise arithmetic against vertically-sliced /
    horizontally-rolled copies of the target image — the TPU-shaped
    formulation: zero gathers, pure VPU work. A rolled ``fori_loop`` over the
    K = wv*wu window offsets carries the running best (sq dist, target xyz,
    target normal) per pixel; loop-carried *values* replace the winner
    re-gather entirely.

    vs ``projective_correspondence`` (same estimator family, two deliberate
    differences, both validated in tests/test_step.py):
      * warped source points that collide into one pixel keep only the
        closest (the projection's dedup) — a handful per scan at consecutive-
        scan motion;
      * warped points that leave the FoV are culled instead of matching a
        clamped border pixel.

    Azimuth wraps (360° sensor), elevation clamps — as everywhere else.

    Returns ``(source [HW,3], source_normals [HW,3], source_valid [HW],
    Correspondence over HW pixels)``: everything the ICP losses need, in
    pixel space.
    """
    H, W = spec.height, spec.width
    src_xyz = warped_src_image[..., 0:3].reshape(H * W, 3)
    src_nrm = warped_src_image[..., 3:6].reshape(H * W, 3)
    src_occ = warped_src_image[..., 6].reshape(H * W) > 0.0   # range > 0
    corr = image_space_correspondence_core(
        src_xyz, src_occ, target_image, target_normal_image, spec, window
    )
    return src_xyz, src_nrm, corr.valid, corr


def image_space_correspondence_core(
    src_xyz: jnp.ndarray,                # [H*W, 3] per-pixel source points
    src_occ: jnp.ndarray,                # [H*W] bool — pixel holds a point
    target_image: jnp.ndarray,           # [H, W, >=3] projected target
    target_normal_image: jnp.ndarray,    # [H, W, 3]
    spec: ProjectionSpec,
    window: Tuple[int, int] = (5, 9),
    soft_sigma: float = 0.0,
) -> Correspondence:
    """Window matching core over per-pixel source arrays.

    ``src_xyz`` may carry gradients — the selection loop runs on a detached
    copy (matching the reference's KD-index ``detach()``) and only the final
    residual recompute is differentiable.

    ``soft_sigma`` (meters) > 0 switches the winner from a hard argmin to a
    SOFTMAX-WEIGHTED blend of the window's candidates, w_k ∝
    exp(-sq_k / sigma^2). Rationale (docs/BENCH_NOTES.md r19): hard
    nearest-candidate selection makes the loss ripple with period one
    azimuth column of yaw (candidates switch discretely as warped points
    cross pixel boundaries), creating spurious local minima that training
    locks onto — a measured ~2x yaw bias on the 880 m world. Blending makes
    the matched point/normal a continuous function of the pose, removing the
    ripple at its source; candidates within ~sigma of the best participate,
    so sigma ~ the surface noise scale keeps the estimator sharp. The blend
    is detached like the hard winner; blended normals are NOT renormalized
    (their magnitude decays off-plane, which down-weights pl2pl exactly
    where the blend spans disagreeing surfaces). The reference has no
    counterpart (its KD-tree NN is hard); hard selection remains the
    default and the two coincide as sigma -> 0.
    """
    H, W = spec.height, spec.width
    wv, wu = window
    a, b = wv // 2, wu // 2
    K = wv * wu

    occ = jnp.any(target_image[..., :3] != 0.0, axis=-1, keepdims=True)
    tgt = jnp.concatenate(
        [target_image[..., :3], target_normal_image,
         occ.astype(target_image.dtype)], axis=-1
    )                                                          # [H, W, 7]
    # Vertical padding with EMPTY rows: candidates beyond the elevation FoV
    # are misses, not clamped duplicates.
    tgt_pad = jnp.pad(tgt, ((a, a), (0, 0), (0, 0)))           # [H+2a, W, 7]

    src_sel = jax.lax.stop_gradient(src_xyz)

    if soft_sigma > 0.0:
        inv_tau = 1.0 / float(soft_sigma) ** 2

        # Unnormalized softmax accumulation — no max-shift: at practical
        # sigma f32 covers exp(-sq/sigma^2) directly (underflow only past
        # ~8 m^2, far outside any useful match), and the simpler form keeps
        # the Pallas twin within its per-grid-step stack budget
        # (window_match.py _match_body).
        def body_soft(k, carry):
            M, acc_w, acc_xyz, acc_nrm = carry
            dv = k // wu
            du = k % wu - b
            cand = jax.lax.dynamic_slice(tgt_pad, (dv, 0, 0), (H, W, 7))
            cand = jnp.roll(cand, -du, axis=1).reshape(H * W, 7)
            d = cand[:, :3] - src_sel
            sq = jnp.sum(d * d, axis=-1)
            sq = jnp.where(cand[:, 6] > 0.5, sq, jnp.inf)
            w = jnp.where(
                jnp.isfinite(sq), jnp.exp(-sq * inv_tau), 0.0
            )
            return (
                jnp.minimum(M, sq),
                acc_w + w,
                acc_xyz + w[:, None] * cand[:, :3],
                acc_nrm + w[:, None] * cand[:, 3:6],
            )

        init = (
            jnp.full((H * W,), jnp.inf, src_xyz.dtype),
            jnp.zeros((H * W,), src_xyz.dtype),
            jnp.zeros((H * W, 3), src_xyz.dtype),
            jnp.zeros((H * W, 3), src_xyz.dtype),
        )
        best_sq, acc_w, acc_xyz, acc_nrm = jax.lax.fori_loop(
            0, K, body_soft, init
        )
        # All-underflowed windows must not match a zero blend.
        best_sq = jnp.where(acc_w < 1e-30, jnp.inf, best_sq)
        denom = jnp.maximum(acc_w, 1e-30)[:, None]
        best_xyz = acc_xyz / denom
        best_nrm = acc_nrm / denom
    else:
        def body(k, carry):
            best_sq, best_xyz, best_nrm = carry
            dv = k // wu
            du = k % wu - b
            cand = jax.lax.dynamic_slice(tgt_pad, (dv, 0, 0), (H, W, 7))
            cand = jnp.roll(cand, -du, axis=1).reshape(H * W, 7)
            d = cand[:, :3] - src_sel
            sq = jnp.sum(d * d, axis=-1)
            sq = jnp.where(cand[:, 6] > 0.5, sq, jnp.inf)
            better = sq < best_sq
            bm = better[:, None]
            return (
                jnp.where(better, sq, best_sq),
                jnp.where(bm, cand[:, :3], best_xyz),
                jnp.where(bm, cand[:, 3:6], best_nrm),
            )

        init = (
            jnp.full((H * W,), jnp.inf, src_xyz.dtype),
            jnp.zeros((H * W, 3), src_xyz.dtype),
            jnp.zeros((H * W, 3), src_xyz.dtype),
        )
        best_sq, best_xyz, best_nrm = jax.lax.fori_loop(0, K, body, init)
    best_xyz = jax.lax.stop_gradient(best_xyz)
    best_nrm = jax.lax.stop_gradient(best_nrm)

    valid = src_occ & jnp.isfinite(best_sq)
    tgt_pts = jnp.where(valid[:, None], best_xyz, 0.0)
    tgt_nrm = jnp.where(valid[:, None], best_nrm, 0.0)
    dd = src_xyz - tgt_pts
    sq_out = jnp.where(valid, jnp.sum(dd * dd, axis=-1), jnp.inf)
    return Correspondence(tgt_pts, tgt_nrm, valid, sq_out)


def image_space_correspondence_batch(
    src_xyz: jnp.ndarray,                # [B, H*W, 3] per-pixel source points
    src_occ: jnp.ndarray,                # [B, H*W] bool
    target_image: jnp.ndarray,           # [B, H, W, >=3]
    target_normal_image: jnp.ndarray,    # [B, H, W, 3]
    spec: ProjectionSpec,
    window: Tuple[int, int] = (5, 9),
    backend: str = "auto",
    src_planes_all: jnp.ndarray = None,   # optional [B, >=3, H, W], xyz at 0:3
    soft_sigma: float = 0.0,
) -> Correspondence:
    """Batched :func:`image_space_correspondence_core`.

    ``soft_sigma`` > 0 selects the softmax-blended matcher (see the core's
    docstring) — both backends implement it with the same streaming-softmax
    semantics (window_match.py _match_body).

    backend: "xla" (vmapped fori_loop core), "pallas" (fused VMEM-resident
    kernel, delora_tpu/ops/pallas/window_match.py), or "auto" (pallas when
    the program is LOWERED FOR a TPU and the shape fits the kernel's VMEM
    budget — the 2250-wide preprocessing resolution does not and silently
    takes the XLA path — xla elsewhere). "auto" dispatches through
    ``jax.lax.platform_dependent``, i.e. it resolves against the platform the
    surrounding jit actually compiles for (the mesh's, not the process
    default), so a CPU-mesh computation in a TPU-client process is safe.
    Both backends produce identical winners (same dv-major iteration order
    and strict-< tie-breaking).
    """

    def _xla():
        return jax.vmap(
            lambda sx, so, img, nimg: image_space_correspondence_core(
                sx, so, img, nimg, spec, window, soft_sigma=soft_sigma
            )
        )(src_xyz, src_occ, target_image, target_normal_image)


    def _pallas(interpret: bool):
        from delora_tpu.ops.pallas.window_match import window_match_pallas

        H, W = spec.height, spec.width
        wv, wu = window
        a = wv // 2
        B = src_xyz.shape[0]

        occ = jnp.any(target_image[..., :3] != 0.0, axis=-1, keepdims=True)
        tgt = jnp.concatenate(
            [target_image[..., :3], target_normal_image,
             occ.astype(target_image.dtype)], axis=-1
        )                                                     # [B, H, W, 7]
        tgt_pad = jnp.pad(tgt, ((0, 0), (a, a), (0, 0), (0, 0)))
        tgt_planes = jnp.transpose(tgt_pad, (0, 3, 1, 2))     # [B, 7, H+2a, W]
        if src_planes_all is not None:
            # Caller already holds channel-major planes with xyz in 0:3
            # (the train step's fused affine). Pass them WHOLE: the kernel's
            # BlockSpec reads planes 0:3 only, so there is no slice operand
            # for XLA to stage in VMEM (a sliced operand at KITTI B=8 was
            # 17.7 MB of scoped VMEM — over the 16 MB budget) and no
            # minor-dim strided copy either.
            src_planes = jax.lax.stop_gradient(src_planes_all)
        else:
            src_planes = jnp.transpose(
                jax.lax.stop_gradient(src_xyz).reshape(B, H, W, 3),
                (0, 3, 1, 2),
            )

        best_sq, best_xyz, best_nrm = window_match_pallas(
            src_planes, tgt_planes, wv=wv, wu=wu, interpret=interpret,
            soft_sigma=soft_sigma,
        )
        best_xyz = jnp.transpose(best_xyz, (0, 2, 3, 1)).reshape(B, H * W, 3)
        best_nrm = jnp.transpose(best_nrm, (0, 2, 3, 1)).reshape(B, H * W, 3)
        best_sq = best_sq.reshape(B, H * W)

        valid = src_occ & jnp.isfinite(best_sq)
        tgt_pts = jnp.where(valid[..., None], best_xyz, 0.0)
        tgt_nrm = jnp.where(valid[..., None], best_nrm, 0.0)
        dd = src_xyz - tgt_pts
        sq_out = jnp.where(valid, jnp.sum(dd * dd, axis=-1), jnp.inf)
        return Correspondence(tgt_pts, tgt_nrm, valid, sq_out)

    if backend == "auto" and soft_sigma > 0.0:
        # The soft Pallas kernel works standalone (tests, explicit
        # backend="pallas") but in-step its chunked lax.map gets its stacked
        # operands staged in scoped VMEM by XLA (71.7M vs the 16M budget at
        # 32x720 wv=9, jvp context) — route auto through the XLA loop.
        # Quality-run cost: K*HW elementwise per scan (~ms-scale); the
        # throughput bench's default remains the hard Pallas matcher.
        return _xla()
    if backend == "auto":
        from delora_tpu.ops.pallas.window_match import (
            _VALIDATED_DIRECT_SHAPES, fits_vmem, tile_width_for,
        )

        if not fits_vmem(spec.height, spec.width, window[0]) and (
            tile_width_for(spec.height, spec.width, window[0], window[1]) == 0
        ):
            return _xla()
        if (spec.height, spec.width) not in _VALIDATED_DIRECT_SHAPES:
            # Outside the chip-validated shape family XLA's scoped-VMEM
            # staging of the pallas call is unpredictable: at 64x512 it
            # stack-allocated the call outputs (39.3M direct, 37.7M even
            # with 1-row lax.map chunks whose stacked output it ALSO placed
            # in VMEM) against the 16M limit — r5 multires crash, twice.
            # auto routes these shapes through the XLA matcher (the r1-r3
            # default, ~2x the matcher ms — a few % of the step); explicit
            # backend="pallas" remains available for validated new sensors.
            return _xla()
        # Resolved at LOWERING time per target platform: only the branch for
        # the platform being compiled is lowered (the pallas kernel never
        # reaches a CPU lowering, the fori-loop core never reaches a TPU one).
        tpu_branch = lambda: _pallas(interpret=False)  # noqa: E731
        return jax.lax.platform_dependent(
            tpu=tpu_branch, axon=tpu_branch, default=_xla
        )
    if backend == "xla":
        return _xla()
    # Forced-pallas on a non-TPU process default runs the interpreter (tests).
    return _pallas(
        interpret=jax.devices()[0].platform not in ("tpu", "axon")
    )


def brute_force_correspondence(
    source_points: jnp.ndarray,      # [S, 3]
    source_valid: jnp.ndarray,       # [S]
    target_points: jnp.ndarray,      # [T, 3]
    target_valid: jnp.ndarray,       # [T]
    target_normals: jnp.ndarray,     # [T, 3]
    *,
    tile: int = 1024,
    use_pallas: bool = False,
) -> Correspondence:
    """Exact 1-NN of every source point among valid target points.

    XLA implementation: the source is processed in tiles of ``tile`` points;
    each tile computes a [tile, T] squared-distance block via an MXU matmul
    (|s|^2 + |t|^2 - 2 s.t) and reduces with argmin. Invalid target slots are
    pushed to +inf so padding never matches.
    """
    if use_pallas:
        from delora_tpu.ops.pallas.nn_search import nn_search_pallas

        # Detach the kernel INPUTS: the search is index-selection only (the
        # reference detaches its KD indices the same way, icp_losses.py:64-67)
        # and the Pallas kernel has no VJP rule — with live tangents on the
        # warped source points, linearizing a training step through
        # pallas_call raised "Linearization failed" (use_pallas_nn: true was
        # untrainable until r5). The differentiable distance is recomputed
        # from the gathered winners below (sq_out).
        idx, sq = nn_search_pallas(
            jax.lax.stop_gradient(source_points),
            jax.lax.stop_gradient(target_points),
            target_valid,
        )
    else:
        S = source_points.shape[0]
        pad = (-S) % tile
        src = jnp.pad(source_points, ((0, pad), (0, 0)))
        src_tiles = src.reshape(-1, tile, 3)

        t_sq = jnp.sum(target_points * target_points, axis=-1)
        t_bad = jnp.where(target_valid, 0.0, jnp.inf).astype(source_points.dtype)

        def one_tile(s):
            # [tile, T] distance block; the cross term rides the MXU.
            cross = s @ target_points.T
            d = jnp.sum(s * s, axis=-1)[:, None] + t_sq[None, :] - 2.0 * cross
            d = d + t_bad[None, :]
            return jnp.argmin(d, axis=-1).astype(jnp.int32), jnp.min(d, axis=-1)

        idx_t, sq_t = jax.lax.map(one_tile, src_tiles)
        idx = idx_t.reshape(-1)[:S]
        sq = sq_t.reshape(-1)[:S]

    # The search is detached (reference detaches its KD indices the same
    # way, icp_losses.py:64-67); sq only gates validity below and the
    # differentiable distance is recomputed as sq_out.
    idx = jax.lax.stop_gradient(idx)
    sq = jax.lax.stop_gradient(sq)
    any_target = jnp.any(target_valid)
    valid = source_valid & any_target & jnp.isfinite(sq)
    tgt_pts = jnp.where(valid[:, None], target_points[idx], 0.0)
    tgt_nrm = jnp.where(valid[:, None], target_normals[idx], 0.0)
    # Recompute the squared distance differentiably w.r.t. the source points
    # (the search itself is detached, as in the reference).
    d = source_points - tgt_pts
    sq_out = jnp.where(valid, jnp.sum(d * d, axis=-1), jnp.inf)
    return Correspondence(tgt_pts, tgt_nrm, valid, sq_out)


def window_match_indices(
    src_xyz: jnp.ndarray,                # [H*W, 3] query points (per pixel)
    src_occ: jnp.ndarray,                # [H*W] bool
    cand_xyz_image: jnp.ndarray,         # [H, W, 3] candidate points
    cand_occ_image: jnp.ndarray,         # [H, W] candidate occupancy
    spec: ProjectionSpec,
    window: Tuple[int, int] = (5, 9),
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Hard window match returning the winning OFFSET INDEX, not values.

    Selection-only twin of :func:`image_space_correspondence_core` (same
    dv-major/du-minor order, strict-< tie-break, vertical empty-pad, azimuth
    wrap), for callers that need a DIFFERENTIABLE gather of the winner's
    payload afterwards — e.g. the reverse (target -> warped-source) matching
    direction, where the matched values depend on the predicted pose and
    must carry gradient (the forward matcher detaches its carried values,
    mirroring the reference's KD-index ``detach()``, icp_losses.py:64-67;
    reverse matching has no reference counterpart).

    Returns ``(best_k [HW] int32, best_sq [HW], valid [HW])`` where
    ``best_k = dv * wu + du_idx`` indexes the window offsets; reconstruct
    the winner's pixel as ``row = p // W + dv - wv//2`` (guaranteed in range
    for valid winners — out-of-FoV rows are empty padding and never win),
    ``col = (p % W + du_idx - wu//2) mod W``.
    """
    H, W = spec.height, spec.width
    wv, wu = window
    a, b = wv // 2, wu // 2
    K = wv * wu

    cand = jnp.concatenate(
        [cand_xyz_image, cand_occ_image[..., None].astype(cand_xyz_image.dtype)],
        axis=-1,
    )                                                          # [H, W, 4]
    cand_pad = jnp.pad(cand, ((a, a), (0, 0), (0, 0)))

    src_sel = jax.lax.stop_gradient(src_xyz)
    cand_pad = jax.lax.stop_gradient(cand_pad)

    def body(k, carry):
        best_sq, best_k = carry
        dv = k // wu
        du = k % wu - b
        c = jax.lax.dynamic_slice(cand_pad, (dv, 0, 0), (H, W, 4))
        c = jnp.roll(c, -du, axis=1).reshape(H * W, 4)
        d = c[:, :3] - src_sel
        sq = jnp.sum(d * d, axis=-1)
        sq = jnp.where(c[:, 3] > 0.5, sq, jnp.inf)
        better = sq < best_sq
        return (
            jnp.where(better, sq, best_sq),
            jnp.where(better, k, best_k),
        )

    init = (
        jnp.full((H * W,), jnp.inf, src_xyz.dtype),
        jnp.zeros((H * W,), jnp.int32),
    )
    best_sq, best_k = jax.lax.fori_loop(0, K, body, init)
    valid = src_occ & jnp.isfinite(best_sq)
    return best_k, best_sq, valid
