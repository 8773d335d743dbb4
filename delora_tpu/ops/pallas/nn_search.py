"""Pallas TPU kernel: exact 1-nearest-neighbor search (tiled brute force).

The MXU-tiled replacement for the reference's host-side scipy cKDTree query
(reference src/losses/icp_losses.py:34, :24-26). At DeLORA's scales
(~20-46k valid target points per scan) exact brute force is cheap on TPU:
the cross term of ||s - t||^2 is a [TILE_S, 3] x [3, TILE_T] matmul and the
running argmin reduction lives in VMEM.

Layout: the full target set stays resident in VMEM as [4, T] (xyz + a
validity-bias row, T <= ~64k -> <= 1 MB), sources stream through the grid in
[TILE_S, 4] blocks. Each grid step loops over target chunks with
``jax.lax.fori_loop``, maintaining per-source-row (min distance, argmin).

The validity trick: row 3 of the target matrix holds 0 for valid points and
+BIG for padding, added to each distance column — padded targets can never
win. The same trick folds |t|^2: we store it in the bias row, so
dist = |s|^2 + (|t|^2 + bias) - 2 s.t needs no separate |t|^2 array.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30


def _nn_kernel(src_ref, tgt_ref, idx_ref, sq_ref, *, tile_t: int, num_t: int):
    """One source tile vs all target chunks.

    src_ref: [TILE_S, 4] (xyz + |s|^2 in column 3)
    tgt_ref: [4, T] (or [1, 4, T] in the batched layout) — xyz rows +
             (|t|^2 or BIG) bias row
    idx_ref: [TILE_S, 1] argmin output (int32; rank-2 — Mosaic lowers 2D
             vector stores reliably where rank-1 output refs hit edge cases)
    sq_ref:  [TILE_S, 1] min squared distance output (f32)
    """
    if tgt_ref.ndim == 3:            # batched layout: squeeze the batch block
        tgt_ref = tgt_ref.at[0]
    tile_s = src_ref.shape[0]
    s_xyz = src_ref[:, :3]                       # [TILE_S, 3]
    s_sq = src_ref[:, 3]                         # [TILE_S]

    num_chunks = num_t // tile_t

    def body(c, carry):
        best_sq, best_idx = carry
        tgt = tgt_ref[:, pl.ds(c * tile_t, tile_t)]          # [4, TILE_T]
        cross = jnp.dot(s_xyz, tgt[:3, :],
                        preferred_element_type=jnp.float32)   # MXU
        d = s_sq[:, None] + tgt[3, :][None, :] - 2.0 * cross  # [TILE_S, TILE_T]
        chunk_min = jnp.min(d, axis=1)
        chunk_arg = jnp.argmin(d, axis=1).astype(jnp.int32) + c * tile_t
        better = chunk_min < best_sq
        return (jnp.where(better, chunk_min, best_sq),
                jnp.where(better, chunk_arg, best_idx))

    init = (jnp.full((tile_s,), BIG, jnp.float32),
            jnp.zeros((tile_s,), jnp.int32))
    best_sq, best_idx = jax.lax.fori_loop(0, num_chunks, body, init)
    idx_ref[:, 0] = best_idx
    sq_ref[:, 0] = best_sq


@functools.lru_cache(maxsize=None)
def _nn_vmappable(tile_s: int, tile_t: int, interpret: bool):
    """custom_vmap wrapper: ``jax.vmap`` over the search maps to ONE batched
    pallas_call (grid over B*source-tiles, rank-1 outputs) instead of the
    default batching rule, whose (1, tile_s) output blocks violate the
    Mosaic last-two-dims rule ("block shape divisible by (8, 128)") — the
    in-step ``use_pallas_nn`` path failed to lower under ``jax.vmap`` until
    r5."""

    @jax.custom_batching.custom_vmap
    def nn(source_points, target_points, target_valid):
        return _nn_search_single(
            source_points, target_points, target_valid,
            tile_s=tile_s, tile_t=tile_t, interpret=interpret,
        )

    @nn.def_vmap
    def _nn_vmap_rule(axis_size, in_batched, src, tgt, valid):
        sb, tb, vb = in_batched
        if not sb:
            src = jnp.broadcast_to(src[None], (axis_size,) + src.shape)
        if not tb:
            tgt = jnp.broadcast_to(tgt[None], (axis_size,) + tgt.shape)
        if not vb:
            valid = jnp.broadcast_to(valid[None], (axis_size,) + valid.shape)
        idx, sq = _nn_search_batched(
            src, tgt, valid, tile_s=tile_s, tile_t=tile_t,
            interpret=interpret,
        )
        return (idx, sq), (True, True)

    return nn


def nn_search_pallas(
    source_points: jnp.ndarray,   # [S, 3]
    target_points: jnp.ndarray,   # [T, 3]
    target_valid: jnp.ndarray,    # [T] bool
    *,
    tile_s: int = 512,
    tile_t: int = 2048,
    interpret: bool = False,
):
    """-> (argmin indices [S] int32, squared distances [S] f32).

    Distances for sources against INVALID targets are +BIG-biased; if no
    valid target exists the returned sq is >= BIG (callers mask on that).
    ``jax.vmap`` over this function runs one natively-batched kernel.
    """
    return _nn_vmappable(tile_s, tile_t, interpret)(
        source_points, target_points, target_valid
    )


@functools.partial(jax.jit, static_argnames=("tile_s", "tile_t", "interpret"))
def _nn_search_single(
    source_points, target_points, target_valid,
    *, tile_s: int, tile_t: int, interpret: bool,
):
    S = source_points.shape[0]
    T = target_points.shape[0]
    pad_s = (-S) % tile_s
    pad_t = (-T) % tile_t

    src = jnp.pad(source_points.astype(jnp.float32), ((0, pad_s), (0, 0)))
    s_sq = jnp.sum(src * src, axis=-1, keepdims=True)
    src4 = jnp.concatenate([src, s_sq], axis=-1)              # [S', 4]

    tgt = jnp.pad(target_points.astype(jnp.float32), ((0, pad_t), (0, 0)))
    valid = jnp.pad(target_valid, (0, pad_t), constant_values=False)
    bias = jnp.where(valid, jnp.sum(tgt * tgt, axis=-1), BIG)  # |t|^2 or BIG
    tgt4 = jnp.concatenate([tgt, bias[:, None]], axis=-1).T    # [4, T']

    Sp, Tp = src4.shape[0], tgt4.shape[1]
    grid = (Sp // tile_s,)

    idx, sq = pl.pallas_call(
        functools.partial(_nn_kernel, tile_t=tile_t, num_t=Tp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_s, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, Tp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_s, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_s, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Sp, 1), jnp.int32),
            jax.ShapeDtypeStruct((Sp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(src4, tgt4)

    idx = jnp.clip(idx[:S, 0], 0, T - 1)
    return idx, sq[:S, 0]


@functools.partial(jax.jit, static_argnames=("tile_s", "tile_t", "interpret"))
def _nn_search_batched(
    source_points,   # [B, S, 3]
    target_points,   # [B, T, 3]
    target_valid,    # [B, T] bool
    *, tile_s: int, tile_t: int, interpret: bool,
):
    """Natively-batched search: sources of all batches flatten to [B*S', 4]
    so the outputs stay RANK-1 (rank-1 blocks escape Mosaic's last-two-dims
    divisibility rule that breaks the default vmap lift); the grid runs
    B * (S'/tile_s) source tiles and each tile's index map selects its
    batch's [1, 4, T'] target block via integer division."""
    B, S, _ = source_points.shape
    T = target_points.shape[1]
    pad_s = (-S) % tile_s
    pad_t = (-T) % tile_t

    src = jnp.pad(source_points.astype(jnp.float32),
                  ((0, 0), (0, pad_s), (0, 0)))
    s_sq = jnp.sum(src * src, axis=-1, keepdims=True)
    src4 = jnp.concatenate([src, s_sq], axis=-1)              # [B, S', 4]
    Sp = src4.shape[1]
    src4 = src4.reshape(B * Sp, 4)

    tgt = jnp.pad(target_points.astype(jnp.float32),
                  ((0, 0), (0, pad_t), (0, 0)))
    valid = jnp.pad(target_valid, ((0, 0), (0, pad_t)),
                    constant_values=False)
    bias = jnp.where(valid, jnp.sum(tgt * tgt, axis=-1), BIG)
    tgt4 = jnp.concatenate(
        [tgt, bias[..., None]], axis=-1
    ).transpose(0, 2, 1)                                      # [B, 4, T']
    Tp = tgt4.shape[2]

    nblocks = Sp // tile_s
    grid = (B * nblocks,)

    idx, sq = pl.pallas_call(
        functools.partial(_nn_kernel, tile_t=tile_t, num_t=Tp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_s, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, Tp), lambda i: (i // nblocks, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_s, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_s, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * Sp, 1), jnp.int32),
            jax.ShapeDtypeStruct((B * Sp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(src4, tgt4)

    idx = jnp.clip(idx.reshape(B, Sp)[:, :S], 0, T - 1)
    return idx, sq.reshape(B, Sp)[:, :S]
