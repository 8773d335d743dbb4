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


def _pixel_coords(points, valid, spec: ProjectionSpec):
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
    # Out-of-FoV points get a sentinel pixel id that is dropped.
    pix = jnp.where(in_fov, vi * W + ui, num_pix)
    return r, u, v, in_fov, pix


def project_scan(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    spec: ProjectionSpec,
) -> Projection:
    """Project one padded scan ``[N, C>=3]`` with validity mask ``[N]``.

    Sort-based implementation — scatter-free. XLA scatters serialize on TPU
    (measured ~50-80 ms per 131k-point scan), while sorts are fast bitonic
    networks, so the "scatter with min semantics" is restructured as:

      1. sort point ids by (pixel, range) — the closest point of every pixel
         becomes the first element of its run,
      2. winner flags travel back to point order via a second sort over the
         permutation (cheaper than the scatter it replaces),
      3. the image and pixel->point map come from a batched binary search
         (searchsorted) of each pixel id in the sorted pixel array — pure
         gathers.

    All channels of ``points`` land in the image; range is appended as the
    final channel (range and (u, v) always derive from channels 0:3).
    """
    N = points.shape[0]
    H, W = spec.height, spec.width
    num_pix = H * W

    r, u, v, in_fov, pix = _pixel_coords(points, valid, spec)
    point_ids = jnp.arange(N, dtype=jnp.int32)

    # (1) Sort by (pixel, range); ids ride along.
    sorted_pix, _, sorted_ids = jax.lax.sort(
        (pix, r, point_ids), num_keys=2
    )
    first_of_run = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_pix[1:] != sorted_pix[:-1]]
    )
    winner_sorted = first_of_run & (sorted_pix < num_pix)

    # (2) Winner flags back to original point order: sort (ids, flags) by id.
    _, survivor = jax.lax.sort(
        (sorted_ids, winner_sorted.astype(jnp.int32)), num_keys=1
    )
    survivor = survivor.astype(bool)

    # (3) Per-pixel winner via binary search of pixel ids in sorted_pix.
    # method="sort" turns the search into one extra (N + H*W) sort — on TPU
    # that beats the default scan method's 17 rounds of random gathers.
    pixel_ids = jnp.arange(num_pix, dtype=pix.dtype)
    pos = jnp.searchsorted(sorted_pix, pixel_ids, side="left", method="sort")
    pos = jnp.minimum(pos, N - 1)
    found = sorted_pix[pos] == pixel_ids
    win_ids = jnp.where(found, sorted_ids[pos], 0)

    feat = jnp.concatenate([points, r[:, None]], axis=-1)
    image = jnp.where(found[:, None], feat[win_ids], 0.0)
    image = image.reshape(H, W, feat.shape[-1])
    point_index = jnp.where(found, win_ids, -1).reshape(H, W)

    return Projection(
        image=image, survivor=survivor, point_index=point_index, u=u, v=v, in_fov=in_fov
    )


def project_batch(points: jnp.ndarray, valid: jnp.ndarray, spec: ProjectionSpec) -> Projection:
    """vmap of :func:`project_scan` over a leading batch axis."""
    return jax.vmap(lambda p, m: project_scan(p, m, spec))(points, valid)


class CompactProjection(NamedTuple):
    """Projection + survivor compaction fused (training source-scan path).

    image / point_index / u / v: as in :class:`Projection`.
    ids:   [cap] int32 — original indices of the surviving points, compacted
           to the front (cap = min(N, H*W); there is at most one survivor per
           pixel). Padding slots repeat arbitrary ids; mask with ``mask``.
    mask:  [cap] bool — slot holds a real survivor.
    """

    image: jnp.ndarray
    point_index: jnp.ndarray
    ids: jnp.ndarray
    mask: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray


def project_scan_compact(
    points: jnp.ndarray, valid: jnp.ndarray, spec: ProjectionSpec
) -> CompactProjection:
    """:func:`project_scan` variant that returns survivors front-compacted.

    Saves one full sort vs. ``project_scan`` + a separate argsort compaction:
    winner flags never travel back to original point order — they are sorted
    (winners first, stable) together with the original ids directly.
    """
    N = points.shape[0]
    H, W = spec.height, spec.width
    num_pix = H * W
    cap = min(N, num_pix)

    r, u, v, in_fov, pix = _pixel_coords(points, valid, spec)
    point_ids = jnp.arange(N, dtype=jnp.int32)

    sorted_pix, _, sorted_ids = jax.lax.sort((pix, r, point_ids), num_keys=2)
    first_of_run = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_pix[1:] != sorted_pix[:-1]]
    )
    winner_sorted = first_of_run & (sorted_pix < num_pix)

    # Winners to the front (stable), ids riding along; the mask is just a
    # prefix of length sum(winners) — no third sort operand needed.
    _, comp_ids = jax.lax.sort(
        (jnp.logical_not(winner_sorted).astype(jnp.int32), sorted_ids),
        num_keys=1,
    )
    comp_ids = comp_ids[:cap]
    num_winners = jnp.sum(winner_sorted.astype(jnp.int32))
    comp_mask = jnp.arange(cap, dtype=jnp.int32) < num_winners

    pixel_ids = jnp.arange(num_pix, dtype=pix.dtype)
    pos = jnp.searchsorted(sorted_pix, pixel_ids, side="left", method="sort")
    pos = jnp.minimum(pos, N - 1)
    found = sorted_pix[pos] == pixel_ids
    win_ids = jnp.where(found, sorted_ids[pos], 0)

    feat = jnp.concatenate([points, r[:, None]], axis=-1)
    image = jnp.where(found[:, None], feat[win_ids], 0.0)
    image = image.reshape(H, W, feat.shape[-1])
    point_index = jnp.where(found, win_ids, -1).reshape(H, W)

    return CompactProjection(
        image=image, point_index=point_index, ids=comp_ids, mask=comp_mask,
        u=u, v=v,
    )


def project_image_packed(
    points: jnp.ndarray, valid: jnp.ndarray, spec: ProjectionSpec,
    values: jnp.ndarray = None,
    tile: int = 1024, smax: int = 3072,
    return_overflow: bool = False,
    append_range: bool = True,
) -> jnp.ndarray:
    """Image-only projection: ONE packed-key fat sort + windowed one-hot
    matmul placement — the warped-source fast path of the image-space matcher
    (delora_tpu/training/step.py ``_loss_tail``).

    The (pixel, range) compound key packs into a single uint32 —
    ``pix << 16 | f32_bits(range) >> 16`` — because IEEE float bits are
    monotonic for positive finite values. The 16-bit range truncation only
    affects WINNER TIE-BREAKING between points whose ranges agree to ~0.4%
    within one pixel — the kept point is still (near-)closest; ties go to
    the earlier point (stable sort), like everywhere else.

    TPU-shaped dense placement (measured on v5e, docs/BENCH_NOTES.md r10):
    ``searchsorted(method="sort")`` + winner row-gather cost ~14.4 ms per
    8 KITTI scans — both row-rate-bound. Instead:

      1. the VALUE CHANNELS RIDE THE SORT as extra operands (sorts are
         key-compare-bound; 8 payload columns cost ~0.7 ms extra),
      2. winners are placed densely by a windowed one-hot matmul: for each
         run of ``tile`` pixels, the (at most ``smax``) sorted entries whose
         pixels fall in that run are dynamic-sliced out, and
         ``image_tile = (pix == q & first_of_run) @ window_values`` selects
         each pixel's winner on the MXU. Placement is EXACT without paying
         for a 6-pass float32 matmul: the one-hot side is exactly 0/1 in
         bfloat16, and the value side is split into three bfloat16 channels
         (hi/mid/lo, together carrying all 24 f32 mantissa bits — the same
         decomposition XLA's BF16_6X mode uses) concatenated along the
         channel axis, so ONE default-precision bf16 matmul with f32
         accumulation selects each winner bit-exactly (products are x*1.0,
         and each output element sums exactly one nonzero per split).

    Window overflow: if more than ``smax`` sorted entries land in one
    pixel-tile (pathological pitch compression), the overflowing tail's
    pixels come out empty — they are simply excluded from the loss, like any
    unmatched pixel. At KITTI scale a tile holds ~1.1k entries (at most one
    source point per source pixel), so smax=3072 is ~3x headroom. ONLY safe
    for already-deduplicated inputs: a raw scan has unbounded candidates per
    pixel — use :func:`project_compact_exact` there. With
    ``return_overflow=True`` the function also returns the number of tiles
    whose entry run exceeded the window (i32 scalar, one cheap [T]-reduction)
    so overflow — and therefore possible xla/pallas winner divergence — is
    observable on-device in production (the train step surfaces it as the
    ``placement_overflow_tiles`` metric).

    Requires H*W < 2**16 (holds at train resolutions; the preprocessing
    resolution path keeps using :func:`project_scan`).

    ``values`` (optional, [N, C]): per-point channels to store in the image
    INSTEAD of the coordinates — pixel/range keys still come from ``points``.
    Lets the train step project warped positions while storing the points'
    ORIGINAL coordinates, so the differentiable warp can be re-applied
    per-pixel afterwards and no gather sits on the gradient path. With
    ``append_range`` (default) a channel holding the range of ``points`` is
    appended; pass False when the caller carries its own occupancy channel.
    """
    N = points.shape[0]
    H, W = spec.height, spec.width
    num_pix = H * W
    if num_pix >= (1 << 16):
        raise ValueError(
            f"project_image_packed needs H*W < 65536, got {num_pix}; "
            "use project_scan"
        )

    r, _, _, in_fov, pix = _pixel_coords(points, valid, spec)
    # Monotonic 16-bit key for positive ranges: top half of the f32 bits.
    r_bits = jax.lax.bitcast_convert_type(r.astype(jnp.float32), jnp.uint32)
    key = (pix.astype(jnp.uint32) << 16) | (r_bits >> 16)
    key = jnp.where(in_fov, key, jnp.uint32(num_pix) << 16)

    feat = points if values is None else values
    if append_range:
        feat = jnp.concatenate([feat, r[:, None]], axis=-1)
    C = feat.shape[-1]
    smax = min(smax, N)

    # (1) Fat sort: values ride as payload operands.
    ops = (key,) + tuple(feat[:, c] for c in range(C))
    sorted_ops = jax.lax.sort(ops, num_keys=1)
    sorted_key = sorted_ops[0]
    sorted_vals = jnp.stack(sorted_ops[1:], axis=-1)           # [N, C]

    pix_sorted = (sorted_key >> 16).astype(jnp.int32)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), pix_sorted[1:] != pix_sorted[:-1]]
    ) & (pix_sorted < num_pix)

    # (2) Windowed one-hot matmul placement.
    num_tiles = -(-num_pix // tile)
    # Boundaries include the end (num_tiles*tile) for the overflow count;
    # clamp to num_pix BEFORE shifting — the end boundary can hit 65536,
    # whose u32 shift wraps to 0 (same guard as _placement_windows).
    bound_pix = jnp.minimum(
        jnp.arange(num_tiles + 1, dtype=jnp.uint32) * tile, num_pix
    )
    bounds = jnp.searchsorted(sorted_key, bound_pix << 16, side="left")
    pos = jnp.minimum(bounds[:num_tiles], jnp.uint32(N - 1)).astype(jnp.int32)

    image = _windowed_placement(
        pix_sorted, first, sorted_vals, pos, spec, tile, smax
    )
    if not return_overflow:
        return image
    n_overflow = jnp.sum(
        (bounds[1:] - bounds[:-1]).astype(jnp.int32) > smax
    ).astype(jnp.int32)
    return image, n_overflow


def _windowed_placement(
    pix_sorted, first, sorted_vals, pos, spec: ProjectionSpec,
    tile: int, smax: int,
) -> jnp.ndarray:
    """Dense winner placement: windowed one-hot matmul on the MXU.

    ``pix_sorted`` [N] i32 ascending, ``first`` [N] bool (winner slots),
    ``sorted_vals`` [N, C] f32 riding the sort, ``pos`` [num_tiles] i32 —
    index of the first sorted entry of each pixel tile. -> [H, W, C].
    """
    N, C = sorted_vals.shape
    H, W = spec.height, spec.width
    num_pix = H * W
    num_tiles = -(-num_pix // tile)
    hw_pad = num_tiles * tile

    pix_pad = jnp.pad(pix_sorted, (0, smax), constant_values=num_pix + 1)
    first_pad = jnp.pad(first, (0, smax))
    # Exact 3-way bf16 split of the f32 values (hi + mid + lo == value):
    # each residual holds <= 8 further mantissa bits, so all three are exact.
    hi = sorted_vals.astype(jnp.bfloat16)
    r1 = sorted_vals - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    split_vals = jnp.concatenate([hi, mid, lo], axis=-1)       # [N, 3C] bf16
    vals_pad = jnp.pad(split_vals, ((0, smax), (0, 0)))

    def tile_fn(t):
        p0 = pos[t]
        w_pix = jax.lax.dynamic_slice(pix_pad, (p0,), (smax,))
        w_first = jax.lax.dynamic_slice(first_pad, (p0,), (smax,))
        w_vals = jax.lax.dynamic_slice(vals_pad, (p0, 0), (smax, 3 * C))
        q = (t * tile + jnp.arange(tile, dtype=jnp.int32))[:, None]
        eq = ((w_pix[None, :] == q) & w_first[None, :]).astype(jnp.bfloat16)
        out = jnp.dot(eq, w_vals, preferred_element_type=jnp.float32)
        return out[:, :C] + out[:, C:2 * C] + out[:, 2 * C:]

    tiles = jax.lax.map(
        tile_fn, jnp.arange(num_tiles, dtype=jnp.int32), batch_size=5
    )
    image = tiles.reshape(hw_pad, C)[:num_pix]
    return image.reshape(H, W, C)


def _split_bf16_3(vals: jnp.ndarray) -> jnp.ndarray:
    """Exact 3-way bf16 split, channel-padded to a multiple of 8.

    ``[..., C] f32 -> [..., 3*cp] bf16`` with cp = ceil8(C); hi + mid + lo
    reconstruct the f32 value exactly (each residual holds <= 8 further
    mantissa bits). The 8-padding puts each split at a sublane-aligned offset
    so the placement kernel can slice-add them without relayouts.

    (Splitting in-kernel instead was tried and regressed — see
    delora_tpu/ops/pallas/placement.py kernel note.)
    """
    C = vals.shape[-1]
    cp = -(-C // 8) * 8
    hi = vals.astype(jnp.bfloat16)
    r1 = vals - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    pad = [(0, 0)] * (vals.ndim - 1) + [(0, cp - C)]
    return jnp.concatenate([jnp.pad(x, pad) for x in (hi, mid, lo)], axis=-1)


def _dispatch_backend(backend: str, xla_fn, pallas_fn):
    """Run ``xla_fn()`` or ``pallas_fn(interpret)`` per ``backend``.

    "auto" dispatches through ``jax.lax.platform_dependent``: the choice is
    made at LOWERING time against the platform the surrounding jit actually
    compiles for (the mesh's, not the process default), so computation placed
    on a CPU mesh inside a TPU-client process correctly gets the XLA path.
    Forcing "pallas" on a non-TPU process default runs the interpreter
    (tests).
    """
    if backend == "xla":
        return xla_fn()
    if backend == "pallas":
        return pallas_fn(jax.devices()[0].platform not in ("tpu", "axon"))
    tpu_branch = lambda: pallas_fn(False)  # noqa: E731
    return jax.lax.platform_dependent(
        tpu=tpu_branch, axon=tpu_branch, default=xla_fn
    )


_PLACE_CHUNK = 512


def _placement_windows(
    sorted_pix_keys, tile: int, num_tiles: int, is_u16_key: bool, num_pix: int
):
    """Per-tile chunk-aligned window start + count for the Pallas placement.

    sorted_pix_keys: ascending per-entry sort keys — either the packed u32
    ``pix << 16 | range16`` (is_u16_key) or plain i32 pixel ids. Returns
    (posb [T] i32 in chunk units, cnt [T] i32 — entries from posb*chunk
    through the end of tile t's run).
    """
    if is_u16_key:
        # Clamp boundary pixel ids to num_pix BEFORE shifting: the last
        # boundary num_tiles*tile can hit 65536, whose u32 shift wraps to 0
        # and would zero the final tile's count. num_pix << 16 always fits
        # (num_pix < 2**16 is a precondition of the packed path), and every
        # real pixel id is < num_pix, so the searchsorted result is the same
        # for any boundary >= num_pix.
        bounds = jnp.minimum(
            jnp.arange(num_tiles + 1, dtype=jnp.uint32) * tile, num_pix
        )
        starts = bounds << 16
    else:
        starts = jnp.minimum(
            jnp.arange(num_tiles + 1, dtype=jnp.int32) * tile, num_pix
        )
    pos = jnp.searchsorted(sorted_pix_keys, starts, side="left").astype(jnp.int32)
    posb = pos[:num_tiles] // _PLACE_CHUNK
    cnt = pos[1:] - posb * _PLACE_CHUNK
    return posb, cnt


def _placement_pallas_batch(
    pix_enc, sorted_vals, posb, cnt, spec: ProjectionSpec,
    tile: int, nchunks: int, interpret: bool,
) -> jnp.ndarray:
    """Pad + split + run the Pallas placement kernel. Batched inputs:
    pix_enc [B, N] i32 (winner pixel or >= num_pix sentinel), sorted_vals
    [B, N, C] f32, posb/cnt [B, T] i32. -> [B, H, W, C] f32."""
    from delora_tpu.ops.pallas.placement import placement_pallas

    B, N, C = sorted_vals.shape
    H, W = spec.height, spec.width
    num_pix = H * W
    num_tiles = -(-num_pix // tile)
    chunk = _PLACE_CHUNK
    n_pad = (-N) % chunk + nchunks * chunk
    pix_pad = jnp.pad(
        pix_enc, ((0, 0), (0, n_pad)), constant_values=1 << 30
    )[:, None, :]
    vals_pad = jnp.pad(_split_bf16_3(sorted_vals), ((0, 0), (0, n_pad), (0, 0)))
    out = placement_pallas(
        pix_pad, vals_pad, posb, cnt,
        tile=tile, chunk=chunk, nchunks=nchunks, interpret=interpret,
    )
    return out[:, :num_pix, :C].reshape(B, H, W, C)


def project_image_packed_batch(
    points: jnp.ndarray, valid: jnp.ndarray, spec: ProjectionSpec,
    values: jnp.ndarray = None,
    tile: int = 1024, smax: int = 3072,
    backend: str = "auto",
    return_overflow: bool = False,
    append_range: bool = True,
) -> jnp.ndarray:
    """Batched :func:`project_image_packed` ``[B, N, .] -> [B, H, W, C]``.

    backend "pallas" (default on TPU) runs the placement as ONE Pallas kernel
    over (batch, pixel-tile, window-chunk) with scalar-prefetched window
    offsets and a count-based early exit per chunk
    (delora_tpu/ops/pallas/placement.py) — replacing the XLA ``lax.map``
    placement whose serialized window slices cost ~2.5 ms/step at KITTI B=8;
    "xla" falls back to the vmapped scalar path. Identical values either way
    (same winners, same exact bf16-split placement).

    ``return_overflow=True`` additionally returns per-batch overflowing-tile
    counts ([B] i32) against the ACTIVE backend's window capacity (xla:
    ``smax`` entries from the tile's first entry; pallas: ``nchunks*chunk``
    chunk-aligned entries — a superset, so strictly fewer drops). Nonzero
    means winner entries were dropped to empty pixels and the two backends
    may diverge on this input.
    """
    def _xla():
        return jax.vmap(
            lambda p, v, m: project_image_packed(
                p, m, spec, values=v, tile=tile, smax=smax,
                return_overflow=return_overflow, append_range=append_range,
            )
        )(points, points if values is None else values, valid)

    def _pallas(interpret):
        H, W = spec.height, spec.width
        num_pix = H * W
        if num_pix >= (1 << 16):
            raise ValueError("project_image_packed_batch needs H*W < 65536")
        num_tiles = -(-num_pix // tile)
        nchunks = smax // _PLACE_CHUNK + 1

        def prep(pts, vals_or_pts, mask):
            r, _, _, in_fov, pix = _pixel_coords(pts, mask, spec)
            r_bits = jax.lax.bitcast_convert_type(
                r.astype(jnp.float32), jnp.uint32
            )
            key = (pix.astype(jnp.uint32) << 16) | (r_bits >> 16)
            key = jnp.where(in_fov, key, jnp.uint32(num_pix) << 16)
            feat = vals_or_pts
            if append_range:
                feat = jnp.concatenate([feat, r[:, None]], axis=-1)
            ops = (key,) + tuple(feat[:, c] for c in range(feat.shape[-1]))
            sorted_ops = jax.lax.sort(ops, num_keys=1)
            sorted_key = sorted_ops[0]
            sorted_vals = jnp.stack(sorted_ops[1:], axis=-1)
            pix_sorted = (sorted_key >> 16).astype(jnp.int32)
            first = jnp.concatenate(
                [jnp.ones((1,), bool), pix_sorted[1:] != pix_sorted[:-1]]
            ) & (pix_sorted < num_pix)
            pix_enc = jnp.where(first, pix_sorted, 1 << 30)
            posb, cnt = _placement_windows(
                sorted_key, tile, num_tiles, True, num_pix
            )
            return pix_enc, sorted_vals, posb, cnt

        pix_enc, sorted_vals, posb, cnt = jax.vmap(prep)(
            points, points if values is None else values, valid
        )
        image = _placement_pallas_batch(
            pix_enc, sorted_vals, posb, cnt, spec, tile, nchunks, interpret
        )
        if not return_overflow:
            return image
        n_overflow = jnp.sum(
            cnt > nchunks * _PLACE_CHUNK, axis=-1
        ).astype(jnp.int32)
        return image, n_overflow

    return _dispatch_backend(backend, _xla, _pallas)


class CompactImageProjection(NamedTuple):
    """Result of :func:`project_compact_exact`.

    image:     [H, W, C+1] — payload channels + appended range per winner.
    comp_vals: [cap, C+1] — winners' (payload..., range), pixel-ascending,
               front-compacted; rows past the winner count hold junk — mask.
    comp_mask: [cap] bool — slot holds a real winner.
    """

    image: jnp.ndarray
    comp_vals: jnp.ndarray
    comp_mask: jnp.ndarray


def project_compact_exact(
    points: jnp.ndarray, valid: jnp.ndarray, spec: ProjectionSpec,
    values: jnp.ndarray = None,
    tile: int = 1024,
) -> CompactImageProjection:
    """Projection + survivor compaction with EXACT ``project_scan`` winner
    semantics, gather-free: two fat sorts + an overflow-FREE placement.

      1. two-key (pixel i32, range f32) fat sort with the payload channels
         riding — identical winner selection/tie-breaking to
         :func:`project_scan` (stable; equal (pixel, range) → smallest id);
         the range is the second key AND the appended channel, riding once,
      2. a second stable fat sort on the loser flag compacts winners to the
         front in pixel-ascending order — exactly
         :func:`project_scan_compact`'s compaction order,
      3. windowed one-hot matmul placement builds the image from the
         COMPACTED winners: <= 1 winner per pixel means a ``tile``-pixel run
         holds <= ``tile`` entries, so the ``smax = tile`` window can NEVER
         overflow — unlike placing from the raw sorted array, whose per-tile
         candidate count is unbounded (at KITTI density ~2.4 points/pixel a
         2048 window silently drops true winners; found the hard way).

    The fastest *unconditionally correct* dense projection here: one fat
    sort + placement (:func:`project_image_packed`) is cheaper but only safe
    when the input already has <= ~1 candidate per pixel (the warped
    reprojection of an already-deduplicated scan); three plain sorts +
    row-gathers (:func:`project_scan`) cost ~1.7x this on v5e.
    """
    N = points.shape[0]
    num_pix = spec.height * spec.width
    cap = min(N, num_pix)

    r, _, _, in_fov, pix = _pixel_coords(points, valid, spec)
    feat = points if values is None else values
    C = feat.shape[-1] + 1

    # (1) Dedup sort: payload rides; range is key #2 and the last channel.
    ops = (pix, r) + tuple(feat[:, c] for c in range(C - 1))
    sorted_ops = jax.lax.sort(ops, num_keys=2)
    pix_sorted = sorted_ops[0]

    first = jnp.concatenate(
        [jnp.ones((1,), bool), pix_sorted[1:] != pix_sorted[:-1]]
    ) & (pix_sorted < num_pix)

    # (2) Compaction sort: winners to the front, stable -> pixel-ascending.
    loser = jnp.logical_not(first).astype(jnp.int32)
    ops2 = (loser, pix_sorted) + sorted_ops[2:] + (sorted_ops[1],)
    comp_ops = jax.lax.sort(ops2, num_keys=1)
    num_winners = jnp.sum(first.astype(jnp.int32))
    comp_mask = jnp.arange(cap, dtype=jnp.int32) < num_winners
    comp_pix = jnp.where(comp_mask, comp_ops[1][:cap], num_pix)
    comp_vals = jnp.stack([o[:cap] for o in comp_ops[2:]], axis=-1)

    # (3) Overflow-free placement over the compacted winners.
    num_tiles = -(-num_pix // tile)
    tile_starts = jnp.arange(num_tiles, dtype=jnp.int32) * tile
    pos = jnp.searchsorted(comp_pix, tile_starts, side="left")
    pos = jnp.minimum(pos, cap - 1).astype(jnp.int32)
    image = _windowed_placement(
        comp_pix, comp_pix < num_pix, comp_vals, pos, spec, tile, smax=tile
    )
    return CompactImageProjection(
        image=image, comp_vals=comp_vals, comp_mask=comp_mask
    )


def project_compact_exact_batch(
    points: jnp.ndarray, valid: jnp.ndarray, spec: ProjectionSpec,
    values: jnp.ndarray = None,
    tile: int = 1024,
    backend: str = "auto",
) -> CompactImageProjection:
    """Batched :func:`project_compact_exact` (leading batch axis on every
    field). backend "pallas" (default on TPU) places the image with the
    chunked Pallas kernel; the compacted winners hold <= 1 entry per pixel,
    so ``tile//chunk + 1`` chunks can never overflow — the same exactness
    argument as the XLA path's ``smax = tile`` window."""
    def _xla():
        return jax.vmap(
            lambda p, v, m: project_compact_exact(
                p, m, spec, values=v, tile=tile
            )
        )(points, points if values is None else values, valid)

    def _pallas(interpret):
        N = points.shape[1]
        num_pix = spec.height * spec.width
        cap = min(N, num_pix)
        num_tiles = -(-num_pix // tile)
        nchunks = tile // _PLACE_CHUNK + 1

        def prep(pts, vals_or_pts, mask):
            r, _, _, in_fov, pix = _pixel_coords(pts, mask, spec)
            feat = vals_or_pts
            C = feat.shape[-1] + 1
            ops = (pix, r) + tuple(feat[:, c] for c in range(C - 1))
            sorted_ops = jax.lax.sort(ops, num_keys=2)
            pix_sorted = sorted_ops[0]
            first = jnp.concatenate(
                [jnp.ones((1,), bool), pix_sorted[1:] != pix_sorted[:-1]]
            ) & (pix_sorted < num_pix)
            loser = jnp.logical_not(first).astype(jnp.int32)
            ops2 = (loser, pix_sorted) + sorted_ops[2:] + (sorted_ops[1],)
            comp_ops = jax.lax.sort(ops2, num_keys=1)
            num_winners = jnp.sum(first.astype(jnp.int32))
            comp_mask = jnp.arange(cap, dtype=jnp.int32) < num_winners
            comp_pix = jnp.where(comp_mask, comp_ops[1][:cap], num_pix)
            comp_vals = jnp.stack([o[:cap] for o in comp_ops[2:]], axis=-1)
            posb, cnt = _placement_windows(
                comp_pix, tile, num_tiles, False, num_pix
            )
            return comp_pix, comp_vals, comp_mask, posb, cnt

        comp_pix, comp_vals, comp_mask, posb, cnt = jax.vmap(prep)(
            points, points if values is None else values, valid
        )
        image = _placement_pallas_batch(
            comp_pix, comp_vals, posb, cnt, spec, tile, nchunks, interpret
        )
        return CompactImageProjection(
            image=image, comp_vals=comp_vals, comp_mask=comp_mask
        )

    return _dispatch_backend(backend, _xla, _pallas)


def project_image(
    points: jnp.ndarray, valid: jnp.ndarray, spec: ProjectionSpec
) -> jnp.ndarray:
    """Image-only projection ``[N, C>=3] -> [H, W, C+1]``.

    The inference/serving path needs only the range image — none of the
    survivor/index artifacts — so it takes the two-fat-sort
    :func:`project_compact_exact` route (exact winners, no id-gathers, no
    searchsorted sort) whenever the pixel id fits the placement's 16-bit
    budget, falling back to :func:`project_scan` otherwise.
    """
    if spec.height * spec.width < (1 << 16):
        return project_compact_exact(points, valid, spec).image
    return project_scan(points, valid, spec).image


def gather_image_attribute(attr: jnp.ndarray, point_index: jnp.ndarray) -> jnp.ndarray:
    """Per-point attribute ``[N, C]`` -> per-pixel image ``[H, W, C]``.

    Empty pixels (point_index == -1) get zeros — zero normals are the
    load-bearing "no normal" sentinel throughout (SURVEY.md §7 hard part 2).
    """
    gathered = attr[jnp.clip(point_index, 0, None)]
    return jnp.where((point_index >= 0)[..., None], gathered, 0.0)
