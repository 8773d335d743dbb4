"""Host-side (numpy) spherical projection — for the target-image cache.

A scan's *target-side* artifacts in the projective training path — the
``[H, W, 4]`` xyz+range image and the ``[H, W, 3]`` normal image — are
deterministic functions of the preprocessed scan alone: augmentation touches
only the source scan (reference src/deploy/deployer.py:201-218 rotates
``scan_2``), and pair range-normalization (deployer.py:222-235) divides every
point by a scalar, which leaves (u, v) (angles) and the per-pixel
closest-point winner (range *ordering*) unchanged — the cached image simply
scales by 1/s. They can therefore be computed ONCE per scan on the host and
reused across every epoch and every pair, instead of re-projected on device
every step (each device projection is a 131k-key sort — the single most
expensive component of the step, docs/BENCH_NOTES.md).

This module reproduces :func:`delora_tpu.ops.projection.project_scan`
semantics exactly (same winner selection, same tie-breaking: ``np.lexsort``
and ``jax.lax.sort`` are both stable, so equal (pixel, range) ties resolve to
the smallest point index in both).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from delora_tpu.ops.projection import ProjectionSpec


class HostProjection(NamedTuple):
    image: np.ndarray          # [H, W, C+1] float32 — channels + range
    point_index: np.ndarray    # [H, W] int32 — winning point id, -1 if empty
    mean_range: float          # mean range over valid points (normalization)


def project_scan_np(
    points: np.ndarray, valid: np.ndarray, spec: ProjectionSpec
) -> HostProjection:
    """Numpy twin of ``project_scan`` (delora_tpu/ops/projection.py:112)."""
    points = np.asarray(points, np.float32)
    valid = np.asarray(valid, bool)
    H, W = spec.height, spec.width
    num_pix = H * W

    xyz = points[:, :3]
    r = np.linalg.norm(xyz, axis=-1)
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    u = (np.arctan2(y, x) - spec.fov_left) / (spec.fov_right - spec.fov_left) * (
        W - 1
    )
    v = (np.arctan2(z, np.sqrt(x * x + y * y)) - spec.fov_down) / (
        spec.fov_up - spec.fov_down
    ) * (H - 1)
    ui = np.round(u)
    vi = np.round(v)
    in_fov = (
        valid & (r > 0)
        & (ui >= 0) & (ui <= W - 1)
        & (vi >= 0) & (vi <= H - 1)
    )
    pix = np.where(
        in_fov,
        np.clip(vi, 0, H - 1).astype(np.int64) * W
        + np.clip(ui, 0, W - 1).astype(np.int64),
        num_pix,
    )

    # Stable sort by (pixel, range): first of each pixel run is the closest
    # point; ties on equal range go to the smallest id (same as lax.sort).
    order = np.lexsort((r, pix))
    sorted_pix = pix[order]
    first = np.empty(len(order), bool)
    first[0] = True
    first[1:] = sorted_pix[1:] != sorted_pix[:-1]
    winner_slots = first & (sorted_pix < num_pix)
    win_ids = order[winner_slots]
    win_pix = sorted_pix[winner_slots]

    feat = np.concatenate([points, r[:, None]], axis=-1)
    image = np.zeros((num_pix, feat.shape[-1]), np.float32)
    image[win_pix] = feat[win_ids]
    point_index = np.full(num_pix, -1, np.int32)
    point_index[win_pix] = win_ids.astype(np.int32)

    nvalid = max(int(valid.sum()), 1)
    mean_range = float((r * valid).sum() / nvalid)

    return HostProjection(
        image=image.reshape(H, W, feat.shape[-1]),
        point_index=point_index.reshape(H, W),
        mean_range=mean_range,
    )


class ScanArtifacts(NamedTuple):
    """Everything the fully-cached train step needs from one scan.

    A scan plays two roles across consecutive pairs — target of pair ``k``
    and source of pair ``k-1`` — and with augmentation off (the default,
    matching reference config/hyperparameters.yaml) BOTH roles' projection
    artifacts are epoch-invariant. Computing them once per scan removes every
    raw-point-cloud sort from the train step (the padded-N sort is the
    single most expensive step component, docs/BENCH_NOTES.md).

    image:        [H, W, 4] float32 — xyz + range (zeros at empty pixels).
    normal_image: [H, W, 3] float32 — zero = no-normal sentinel.
    mean_range:   float — over valid raw points (pair normalization).
    src_points:   [cap, 3] float32 — surviving points, pixel-ascending order
                  (exactly ``project_scan_compact``'s compaction order).
    src_normals:  [cap, 3] float32 — their normals, zero-padded.
    src_valid:    [cap] bool — slot holds a real survivor.
    """

    image: np.ndarray
    normal_image: np.ndarray
    mean_range: float
    src_points: np.ndarray
    src_normals: np.ndarray
    src_valid: np.ndarray


def scan_artifacts_np(
    points: np.ndarray,
    normals: np.ndarray,
    valid: np.ndarray,
    spec: ProjectionSpec,
    use_native: bool = True,
) -> ScanArtifacts:
    """Per-scan projection artifacts for BOTH pair roles (see ScanArtifacts).

    The survivor compaction mirrors
    :func:`delora_tpu.ops.projection.project_scan_compact` bit-for-bit:
    ``point_index`` raveled in pixel order yields winner ids pixel-ascending —
    the same order the device op's stable winners-first sort produces.
    """
    image, normal_image, mean_range, point_index = _artifacts(
        points, normals, valid, spec, use_native
    )
    points = np.asarray(points, np.float32)
    normals = np.asarray(normals, np.float32)
    N = points.shape[0]
    cap = min(N, spec.height * spec.width)

    pi = point_index.ravel()
    sel = pi[pi >= 0]
    k = len(sel)
    src_points = np.zeros((cap, 3), np.float32)
    src_normals = np.zeros((cap, 3), np.float32)
    src_valid = np.zeros(cap, bool)
    src_points[:k] = points[sel, :3]
    src_normals[:k] = normals[sel, :3]
    src_valid[:k] = True
    return ScanArtifacts(
        image=image, normal_image=normal_image, mean_range=mean_range,
        src_points=src_points, src_normals=src_normals, src_valid=src_valid,
    )


def _artifacts(points, normals, valid, spec, use_native):
    """Shared projection + normal-image core -> (+ point_index)."""
    proj = None
    if use_native:
        from delora_tpu.data.native_io import project_scan_native

        native = project_scan_native(points, valid, spec)
        if native is not None:
            image, point_index, mean_range = native
            proj = HostProjection(image, point_index, mean_range)
    if proj is None:
        proj = project_scan_np(points, valid, spec)
    pi = proj.point_index
    normal_image = np.where(
        (pi >= 0)[..., None],
        np.asarray(normals, np.float32)[np.clip(pi, 0, None)],
        0.0,
    ).astype(np.float32)
    return proj.image, normal_image, proj.mean_range, pi


def target_artifacts_np(
    points: np.ndarray,
    normals: np.ndarray,
    valid: np.ndarray,
    spec: ProjectionSpec,
    use_native: bool = True,
):
    """-> (image [H,W,4] f32, normal_image [H,W,3] f32, mean_range float).

    Uses the C++ scatter-min projection (native/delora_io.cpp,
    ``dio_project_scan``) when the library is built — ~1 ms/scan vs ~15 ms
    for the numpy lexsort path — falling back to numpy transparently.

    The normal image mirrors ``gather_image_attribute``
    (delora_tpu/ops/projection.py:248): zero normals at empty pixels — the
    load-bearing "no normal" sentinel.
    """
    image, normal_image, mean_range, _ = _artifacts(
        points, normals, valid, spec, use_native
    )
    return image, normal_image, mean_range
