"""Pallas TPU kernel: image-space window correspondence.

Fused replacement for the XLA ``fori_loop`` in
:func:`delora_tpu.ops.correspondence.image_space_correspondence_core`: the
padded target slab stays RESIDENT in VMEM across all K = wv*wu window offsets
(the XLA loop re-streams the slices from HBM each iteration), and the
per-pixel running best (squared distance, target point, target normal) never
leaves the vector registers between offsets.

Layout: channel-separated planes ``[C, H, W]`` so the wide azimuth axis
(W = 720 at KITTI train resolution) rides the 128-lane dimension and the
candidate shifts become cheap lane rolls; a channels-last layout would waste
121 of 128 lanes on C = 7.

Iteration order (dv-major, du-minor, strict ``<``) matches the XLA core
exactly, so winner tie-breaking is identical.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _match_body(src, tgt_full, *, H: int, wv: int, wu: int, halo: int,
                soft_sigma: float = 0.0):
    """Shared inner loop: src [3, H, WT]; tgt_full [7, Hp, WT + 2*halo]
    (halo = 0 on the untiled full-width path, where the horizontal shift
    wraps — global azimuth wrap; halo = wu//2 on the W-tiled path, where the
    wrap columns are materialized in the halo). Returns (sq, xyz, nrm).

    ``soft_sigma`` > 0: softmax-blended candidates (w ~ exp(-sq/sigma^2))
    via the same streaming stable softmax as the XLA core
    (correspondence.py image_space_correspondence_core) — identical
    semantics, VPU exp instead of select."""
    bu = wu // 2
    Hp = H + wv - 1
    WT = src.shape[-1]
    Wh = tgt_full.shape[-1]

    best_sq = jnp.full((H, WT), jnp.inf, jnp.float32)
    best_xyz = jnp.zeros((3, H, WT), jnp.float32)
    best_nrm = jnp.zeros((3, H, WT), jnp.float32)

    if soft_sigma > 0.0:
        # SOFT blend. The outer dv loop is a REAL ``fori_loop`` with a
        # dynamic sublane roll (pltpu.roll takes traced shifts), not an
        # unrolled Python loop: fully unrolling K = wv*wu soft bodies
        # multiplied Mosaic's per-grid-step stack by the iteration count
        # (measured 46.05 MB scoped OOM at (32, 720) wv=9 wu=17 — the extra
        # exp/accumulator temporaries of every unrolled body stay live),
        # which forced the chunked-lax.map path whose stacked operands then
        # blew scoped VMEM inside the train step's jvp (71.7 MB,
        # correspondence.py r4). Looping dv keeps only wu unrolled bodies —
        # the same order as the hard path's budget — so the kernel compiles
        # DIRECT at the hard cap and the in-step auto backend can use it.
        #
        # UNNORMALIZED accumulation (no max-shift): at practical sigma
        # (~0.3 m) f32 covers exp(-sq/sigma^2) directly for every candidate
        # that matters (underflow starts ~sq > 8 m^2, far past the trim
        # radius); pairs whose whole window underflows are masked via the
        # acc_w floor downstream.
        inv_tau = 1.0 / float(soft_sigma) ** 2

        def dv_body(dv, carry):
            best_sq, acc_w, acc_xyz, acc_nrm = carry
            slab = pltpu.roll(tgt_full, (Hp - dv) % Hp, axis=1)[:, :H, :]
            for du in range(-bu, bu + 1):
                # cand[j] = slab[j + du + halo]; shift must be >= 0.
                cand = pltpu.roll(
                    slab, (-(du + halo)) % Wh, axis=2
                )[:, :, :WT]
                d = cand[0:3] - src
                sq = jnp.sum(d * d, axis=0)               # [H, WT]
                sq = jnp.where(cand[6] > 0.5, sq, jnp.inf)
                w = jnp.where(
                    jnp.isfinite(sq), jnp.exp(-sq * inv_tau), 0.0
                )
                best_sq = jnp.minimum(best_sq, sq)
                acc_w = acc_w + w
                acc_xyz = acc_xyz + w[None] * cand[0:3]
                acc_nrm = acc_nrm + w[None] * cand[3:6]
            return best_sq, acc_w, acc_xyz, acc_nrm

        best_sq, acc_w, best_xyz, best_nrm = jax.lax.fori_loop(
            0, wv, dv_body,
            (best_sq, jnp.zeros((H, WT), jnp.float32), best_xyz, best_nrm),
        )
        # Pairs whose entire window underflowed (all w = 0) must not match a
        # zero blend: mark them missed (sq = inf -> valid False downstream).
        dead = acc_w < 1e-30
        best_sq = jnp.where(dead, jnp.inf, best_sq)
        denom = jnp.maximum(acc_w, 1e-30)[None]
        best_xyz = best_xyz / denom
        best_nrm = best_nrm / denom
        return best_sq, best_xyz, best_nrm

    # HARD argmin. Both window loops are STATIC (K = wv*wu vector-op
    # bodies): Mosaic requires 8-aligned sublane slice starts, so the
    # vertical offset is a sublane ROLL + aligned [0:H] slice instead of a
    # dynamic slice.
    for dv in range(wv):
        slab = pltpu.roll(tgt_full, (-dv) % Hp, axis=1)[:, :H, :]
        for du in range(-bu, bu + 1):
            # cand[j] = slab[j + du + halo]; shift must be >= 0.
            cand = pltpu.roll(slab, (-(du + halo)) % Wh, axis=2)[:, :, :WT]
            d = cand[0:3] - src
            sq = jnp.sum(d * d, axis=0)                   # [H, WT]
            sq = jnp.where(cand[6] > 0.5, sq, jnp.inf)
            better = sq < best_sq
            best_sq = jnp.where(better, sq, best_sq)
            best_xyz = jnp.where(better[None], cand[0:3], best_xyz)
            best_nrm = jnp.where(better[None], cand[3:6], best_nrm)
    return best_sq, best_xyz, best_nrm


def _match_kernel(src_ref, tgt_ref, sq_ref, xyz_ref, nrm_ref, *,
                  H: int, W: int, wv: int, wu: int,
                  soft_sigma: float = 0.0):
    """src_ref: [1, 3, H, W] detached warped source xyz planes.
    tgt_ref: [1, 7, H + wv - 1, W] vertically-padded target planes
    (x, y, z, nx, ny, nz, occupancy).
    Outputs: best sq [1, H, W], best xyz / normal [1, 3, H, W]."""
    sq, xyz, nrm = _match_body(
        src_ref[0], tgt_ref[0], H=H, wv=wv, wu=wu, halo=0,
        soft_sigma=soft_sigma,
    )
    sq_ref[0] = sq
    xyz_ref[0] = xyz
    nrm_ref[0] = nrm


def _match_kernel_tiled(src_ref, tgt_ref, sq_ref, xyz_ref, nrm_ref, *,
                        H: int, wv: int, wu: int,
                        soft_sigma: float = 0.0):
    """W-tiled variant: src_ref [1, 3, H, wt] (a W tile of the source),
    tgt_ref [1, 1, 7, Hp, wt + 2*(wu//2)] (the tile's haloed target slab,
    pre-materialized with the global azimuth wrap baked into the halo).
    Same winners as the full-width kernel."""
    sq, xyz, nrm = _match_body(
        src_ref[0], tgt_ref[0, 0], H=H, wv=wv, wu=wu, halo=wu // 2,
        soft_sigma=soft_sigma,
    )
    sq_ref[0] = sq
    xyz_ref[0] = xyz
    nrm_ref[0] = nrm


# XLA's scoped-VMEM stack budget the chunking must respect (the compile
# errors below report overruns against ~16 MB).
_VMEM_BUDGET = 16 * 1024 * 1024

# (H, W) families whose DIRECT B=8 call has compiled on the real chip
# (docs/BENCH_NOTES.md r5); elsewhere max_batch_for_shape applies the
# conservative staging bound.
_VALIDATED_DIRECT_SHAPES = {(64, 720), (32, 720)}


def _row_bytes(H: int, W: int, wv: int, wu: int = 9, wt: int = None) -> tuple:
    """Per-batch-row VMEM bytes: (operands, outputs) of one grid step.

    With ``wt`` (a W tile), the target block carries a 2*(wu//2)-column halo.
    """
    Hp = H + wv - 1
    if wt is None:
        wt = W
        halo = 0
    else:
        halo = 2 * (wu // 2)
    ops = (3 * H * wt + 7 * Hp * (wt + halo)) * 4  # src + padded tgt planes
    outs = 7 * H * wt * 4                          # best sq + xyz + normal
    return ops, outs


def fits_vmem(H: int, W: int, wv: int) -> bool:
    """Whether ONE batch row's UNTILED double-buffered blocks fit the budget.

    Measured on a v5e: (64, 720, 5) fits (6.4 MB); the 2250-wide
    preprocessing shape does not (20 MB — the kernel fails to compile even
    at B=1). Shapes that fail this get the W-TILED kernel when a suitable
    tile exists (:func:`tile_width_for`); ``window_match_pallas`` picks
    automatically.
    """
    ops, outs = _row_bytes(H, W, wv)
    return 2 * (ops + outs) <= _VMEM_BUDGET


def tile_width_for(H: int, W: int, wv: int, wu: int) -> int:
    """Largest 128-multiple tile width whose haloed blocks fit the budget.

    Mosaic requires the block's lane dimension be a multiple of 128 (or the
    full array dim), so tiles are 128-multiples and W is PADDED up to a
    whole number of tiles (padding columns carry occupancy 0 — never
    matched — and are sliced off the outputs). Returns 0 only if even a
    128-wide tile does not fit (no practical shape).
    """
    best = 0
    for wt in range(128, W + 127, 128):
        ops, outs = _row_bytes(H, W, wv, wu, wt)
        if 2 * (ops + outs) <= _VMEM_BUDGET:
            best = wt
        else:
            break
    return best


def max_batch_for_shape(H: int, W: int, wv: int, soft: bool = False) -> int:
    """Largest safe direct-call batch, scaled from a measured anchor.

    Anchor at (H, W, wv) = (64, 720, 5), ~3.2 MB/row: the direct call
    compiles at B=8 and OOMs scoped VMEM at B=32 ("scoped allocation
    18.81M"); inside a ``lax.map`` body an 8-row chunk OOMs (17.36M) and
    4 rows fit. Rather than model XLA's staging precisely, scale the proven
    8-row anchor inversely with the per-row footprint and never exceed it.

    The SOFT blend shares the hard cap since its dv loop became a real
    ``fori_loop`` (only wu unrolled bodies — see ``_match_body``): the
    fully-unrolled variant tripled the per-grid-step stack (46.05 MB scoped
    OOM at (32, 720, wv=9) B=8) and needed a quartered cap, whose chunked
    lax.map then blew scoped VMEM inside the train step's jvp. Validated
    on-chip: direct soft compiles at B=8 for (32, 720) and (64, 720) at
    wv=9 wu=17 (docs/BENCH_NOTES.md r5).
    """
    anchor = sum(_row_bytes(64, 720, 5)) * 8
    rows = anchor // max(1, sum(_row_bytes(H, W, wv)))
    # Outside the on-chip-VALIDATED width family the anchor scaling is NOT
    # trustworthy: XLA's scoped-VMEM staging is shape-dependent in ways the
    # row-byte model misses — at (64, 512, wv=9) B=8 the anchor formula
    # allowed a direct call whose staging measured 39.34 MB against the
    # 16 MB stack (r5 multires crash: one output tuple element was placed
    # in VMEM space at W=512 where the W=720 family spills to HBM). For
    # unvalidated shapes, bound rows by the OBSERVED worst-case staging
    # ratio (39.34M / 8 rows / row_bytes(64,512,9) ~ 2.2x row bytes).
    if (H, W) not in _VALIDATED_DIRECT_SHAPES:
        staged = 2.2 * sum(_row_bytes(H, W, wv))
        rows = min(rows, int(_VMEM_BUDGET // max(1.0, staged)))
    del soft
    return max(1, min(8, int(rows)))


@functools.partial(
    jax.jit,
    static_argnames=("wv", "wu", "interpret", "max_batch", "soft_sigma"),
)
def window_match_pallas(
    src_planes: jnp.ndarray,    # [B, >=3, H, W] detached warped source; xyz at planes 0:3 (extra planes are never read — the BlockSpec loads 0:3 only)
    tgt_planes: jnp.ndarray,    # [B, 7, H + wv - 1, W] padded target planes
    *,
    wv: int,
    wu: int,
    interpret: bool = False,
    max_batch: int = None,
    soft_sigma: float = 0.0,
):
    """-> (best_sq [B, H, W], best_xyz [B, 3, H, W], best_nrm [B, 3, H, W]).

    ``best_sq`` is +inf where no occupied target pixel exists in the window.

    Batches larger than ``max_batch`` (shape-derived by default, see
    :func:`max_batch_for_shape`) run as SEQUENTIAL ``lax.map`` chunks:
    one big pallas_call blows XLA's 16 MB scoped-VMEM stack at KITTI scale
    (B=32: "scoped allocation 18.81M"), and a Python list of chunked calls
    fails the same way because XLA overlaps the calls' scoped allocations
    (B=32 with 8-row chunks: 19.93M). A scan serializes them — exactly one
    call's VMEM footprint live at a time. The kernel itself is unchanged
    (its per-grid-step footprint was never the problem).
    """
    B, C, H, W = src_planes.shape
    assert C >= 3, src_planes.shape
    Hp = H + wv - 1
    assert tgt_planes.shape == (B, 7, Hp, W), tgt_planes.shape
    if not fits_vmem(H, W, wv):
        # Full-width blocks blow the scoped-VMEM budget (the 2250-wide
        # preprocessing resolution): W-tile the grid with a haloed target
        # slab per tile. Same winners (the halo materializes the azimuth
        # wrap the full-width kernel gets from its roll).
        wt = tile_width_for(H, W, wv, wu)
        if wt == 0 and not interpret:
            raise ValueError(
                f"window_match_pallas: no W tile of ({H}, {W}) fits the "
                f"{_VMEM_BUDGET / 2**20:.0f} MB VMEM budget at wv={wv} — "
                "use the XLA matcher (backend='xla')"
            )
        if wt and wt < W:  # noqa: E501
            return _window_match_tiled(
                src_planes, tgt_planes, wv=wv, wu=wu, wt=wt,
                interpret=interpret, soft_sigma=soft_sigma,
            )
    if max_batch is None:
        max_batch = max_batch_for_shape(H, W, wv, soft=soft_sigma > 0.0)
    if B > max_batch:
        # Chunks smaller than the direct-call limit: inside the scan body
        # XLA stages each call's WHOLE operands in VMEM (B=8 chunk: 15.3 MB
        # of src+tgt -> 17.36M scoped, over the limit), so the chunk rows
        # must leave headroom for the block double-buffers too.
        chunk = max(1, max_batch // 2)
        pad = (-B) % chunk
        srcp = jnp.pad(src_planes, ((0, pad), (0, 0), (0, 0), (0, 0)))
        tgtp = jnp.pad(tgt_planes, ((0, pad), (0, 0), (0, 0), (0, 0)))
        nb = (B + pad) // chunk
        outs = jax.lax.map(
            lambda args: window_match_pallas(
                args[0], args[1], wv=wv, wu=wu,
                interpret=interpret, max_batch=chunk,
                soft_sigma=soft_sigma,
            ),
            (
                srcp.reshape(nb, chunk, C, H, W),
                tgtp.reshape(nb, chunk, 7, Hp, W),
            ),
        )
        return tuple(
            o.reshape((nb * chunk,) + o.shape[2:])[:B] for o in outs
        )

    kernel = functools.partial(_match_kernel, H=H, W=W, wv=wv, wu=wu,
                               soft_sigma=soft_sigma)
    return pl.pallas_call(  # noqa: E501  (untiled path)
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3, H, W), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 7, H + wv - 1, W), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, H, W), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, H, W), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W), jnp.float32),
            jax.ShapeDtypeStruct((B, 3, H, W), jnp.float32),
            jax.ShapeDtypeStruct((B, 3, H, W), jnp.float32),
        ],
        interpret=interpret,
    )(src_planes, tgt_planes)


@functools.partial(
    jax.jit, static_argnames=("wv", "wu", "wt", "interpret", "soft_sigma")
)
def _window_match_tiled(
    src_planes: jnp.ndarray,    # [B, 3, H, W]
    tgt_planes: jnp.ndarray,    # [B, 7, H + wv - 1, W]
    *,
    wv: int,
    wu: int,
    wt: int,
    interpret: bool = False,
    soft_sigma: float = 0.0,
):
    """W-tiled window matcher: grid (B, W//wt); per-tile target slabs carry
    a wu//2-column halo with the global azimuth wrap baked in, so winners
    are identical to the full-width kernel. Source tiles and outputs come
    straight from BlockSpec W-indexing (no copies); only the haloed target
    tiles array is materialized (~(1 + 2*(wu//2)/wt)x the target bytes)."""
    B, C, H, W = src_planes.shape
    Hp = H + wv - 1
    bu = wu // 2
    T = -(-W // wt)
    Wp = T * wt          # W padded up to whole tiles (Mosaic needs 128-lane
    pad_w = Wp - W       # multiples); padding columns have occupancy 0.

    src_p = jnp.pad(src_planes, ((0, 0),) * 3 + ((0, pad_w),))
    halo = jnp.concatenate(
        [tgt_planes[..., W - bu:], tgt_planes, tgt_planes[..., :bu]], axis=-1
    )                                                     # [B, 7, Hp, W+2bu]
    halo = jnp.pad(halo, ((0, 0),) * 3 + ((0, Wp - W),))  # zeros: occ 0
    tiles = jnp.stack(
        [halo[..., t * wt: t * wt + wt + 2 * bu] for t in range(T)], axis=1
    )                                                     # [B, T, 7, Hp, wt+2bu]

    kernel = functools.partial(_match_kernel_tiled, H=H, wv=wv, wu=wu,
                               soft_sigma=soft_sigma)
    sq, xyz, nrm = pl.pallas_call(
        kernel,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, 3, H, wt), lambda b, t: (b, 0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 7, Hp, wt + 2 * bu),
                         lambda b, t: (b, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, H, wt), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, H, wt), lambda b, t: (b, 0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, H, wt), lambda b, t: (b, 0, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Wp), jnp.float32),
            jax.ShapeDtypeStruct((B, 3, H, Wp), jnp.float32),
            jax.ShapeDtypeStruct((B, 3, H, Wp), jnp.float32),
        ],
        interpret=interpret,
    )(src_p, tiles)
    return sq[..., :W], xyz[..., :W], nrm[..., :W]
