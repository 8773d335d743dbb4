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


def _match_kernel(src_ref, tgt_ref, sq_ref, xyz_ref, nrm_ref, *,
                  H: int, W: int, wv: int, wu: int):
    """src_ref: [1, 3, H, W] detached warped source xyz planes.
    tgt_ref: [1, 7, H + wv - 1, W] vertically-padded target planes
             (x, y, z, nx, ny, nz, occupancy).
    Outputs: best sq [1, H, W], best xyz / normal [1, 3, H, W]."""
    bu = wu // 2
    Hp = H + wv - 1
    src = src_ref[0]                                      # [3, H, W]
    tgt_full = tgt_ref[0]                                 # [7, Hp, W]

    best_sq = jnp.full((H, W), jnp.inf, jnp.float32)
    best_xyz = jnp.zeros((3, H, W), jnp.float32)
    best_nrm = jnp.zeros((3, H, W), jnp.float32)

    # Both window loops are STATIC (K = wv*wu vector-op bodies): Mosaic
    # requires 8-aligned sublane slice starts, so the vertical offset is a
    # sublane ROLL + aligned [0:H] slice instead of a dynamic slice.
    for dv in range(wv):
        slab = pltpu.roll(tgt_full, (-dv) % Hp, axis=1)[:, :H, :]  # [7, H, W]
        for du in range(-bu, bu + 1):
            cand = pltpu.roll(slab, (-du) % W, axis=2)    # shift must be >= 0
            d = cand[0:3] - src
            sq = jnp.sum(d * d, axis=0)                   # [H, W]
            sq = jnp.where(cand[6] > 0.5, sq, jnp.inf)
            better = sq < best_sq
            best_sq = jnp.where(better, sq, best_sq)
            best_xyz = jnp.where(better[None], cand[0:3], best_xyz)
            best_nrm = jnp.where(better[None], cand[3:6], best_nrm)

    sq_ref[0] = best_sq
    xyz_ref[0] = best_xyz
    nrm_ref[0] = best_nrm


# XLA's scoped-VMEM stack budget the chunking must respect (the compile
# errors below report overruns against ~16 MB).
_VMEM_BUDGET = 16 * 1024 * 1024


def _row_bytes(H: int, W: int, wv: int) -> tuple:
    """Per-batch-row VMEM bytes: (operands, outputs) of one grid step."""
    Hp = H + wv - 1
    ops = (3 * H * W + 7 * Hp * W) * 4            # src + padded tgt planes
    outs = 7 * H * W * 4                          # best sq + xyz + normal
    return ops, outs


def fits_vmem(H: int, W: int, wv: int) -> bool:
    """Whether ONE batch row's double-buffered blocks fit the scoped budget.

    Measured on a v5e: (64, 720, 5) fits (6.4 MB); the 2250-wide
    preprocessing shape does not (20 MB — the kernel fails to compile even
    at B=1). Callers should take the XLA matcher when this is False;
    ``image_space_correspondence_batch(backend="auto")`` does so.
    """
    ops, outs = _row_bytes(H, W, wv)
    return 2 * (ops + outs) <= _VMEM_BUDGET


def max_batch_for_shape(H: int, W: int, wv: int) -> int:
    """Largest safe direct-call batch, scaled from a measured anchor.

    Anchor at (H, W, wv) = (64, 720, 5), ~3.2 MB/row: the direct call
    compiles at B=8 and OOMs scoped VMEM at B=32 ("scoped allocation
    18.81M"); inside a ``lax.map`` body an 8-row chunk OOMs (17.36M) and
    4 rows fit. Rather than model XLA's staging precisely, scale the proven
    8-row anchor inversely with the per-row footprint and never exceed it.
    """
    anchor = sum(_row_bytes(64, 720, 5)) * 8
    rows = anchor // max(1, sum(_row_bytes(H, W, wv)))
    return max(1, min(8, int(rows)))


@functools.partial(
    jax.jit, static_argnames=("wv", "wu", "interpret", "max_batch")
)
def window_match_pallas(
    src_planes: jnp.ndarray,    # [B, 3, H, W] detached warped source xyz
    tgt_planes: jnp.ndarray,    # [B, 7, H + wv - 1, W] padded target planes
    *,
    wv: int,
    wu: int,
    interpret: bool = False,
    max_batch: int = None,
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
    B, _, H, W = src_planes.shape
    Hp = H + wv - 1
    assert tgt_planes.shape == (B, 7, Hp, W), tgt_planes.shape
    if not interpret and not fits_vmem(H, W, wv):
        raise ValueError(
            f"window_match_pallas: one ({H}, {W}) row at wv={wv} needs "
            f"{2 * sum(_row_bytes(H, W, wv)) / 2**20:.1f} MB of VMEM blocks "
            f"(budget {_VMEM_BUDGET / 2**20:.0f} MB) — use the XLA matcher "
            "for this shape (backend='xla', or 'auto' which checks this)"
        )
    if max_batch is None:
        max_batch = max_batch_for_shape(H, W, wv)
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
            ),
            (
                srcp.reshape(nb, chunk, 3, H, W),
                tgtp.reshape(nb, chunk, 7, Hp, W),
            ),
        )
        return tuple(
            o.reshape((nb * chunk,) + o.shape[2:])[:B] for o in outs
        )

    kernel = functools.partial(_match_kernel, H=H, W=W, wv=wv, wu=wu)
    return pl.pallas_call(
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
