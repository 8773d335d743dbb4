"""Pallas TPU kernel: dense winner placement (the "scatter" of projection).

Replaces the XLA ``lax.map`` windowed one-hot placement in
:func:`delora_tpu.ops.projection._windowed_placement`, which XLA compiles to
a serialized while loop whose per-tile window slices lower to further
serialized gather-whiles (~2.5 ms of a 13.5 ms train step at KITTI B=8 —
scripts/perf_trace.py). Here the windows are Pallas block DMAs whose offsets
come from SCALAR-PREFETCHED per-tile window starts, and each window is
processed in ``chunk``-row pieces with a count-based early exit, so the
typical tile touches ~2-3 chunks instead of always paying for the full
``smax`` window.

Math per (batch b, pixel-tile t, chunk j):

    eq[q, s] = (pix[s] == t*tile + q)          -- one-hot, <=1 match per q
    out[q, :] += eq @ vals[s, :]               -- MXU, f32 accumulation

``pix`` carries ONLY winner entries (losers/padding hold an out-of-range
sentinel), so each output pixel accumulates at most one nonzero product per
bf16 split across ALL chunks — placement is exact for f32 values split into
three bf16 channels (hi/mid/lo; see projection.py `_split_bf16_3`).

Layouts are chosen so the kernel needs NO in-kernel relayouts: ``pix`` chunk
loads as [1, chunk] (lanes), the one-hot's q axis is a sublane iota, and the
dot is a standard [tile, chunk] @ [chunk, VC] contraction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _placement_kernel(posb_ref, cnt_ref, pix_ref, vals_ref, out_ref, *,
                      tile: int, chunk: int, cp: int):
    """posb/cnt: [B, T] scalar-prefetch (chunk-aligned window start, count).
    pix_ref: [1, chunk] i32 block — winner pixel ids (sentinel elsewhere).
    vals_ref: [1, chunk, 3*cp] bf16 block — hi/mid/lo split value channels.
    out_ref: [1, tile, cp] f32 block — revisited across the chunk grid dim."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(j * chunk < cnt_ref[b, t])
    def _accumulate():
        pix = pix_ref[0, 0, :]                                 # [chunk] lanes
        q = t * tile + jax.lax.broadcasted_iota(
            jnp.int32, (tile, chunk), 0
        )
        eq = (pix[None, :] == q).astype(jnp.bfloat16)          # [tile, chunk]
        # NOTE: splitting the f32 values into hi/mid/lo bf16 IN-KERNEL was
        # tried (r16) and regressed the kernel 0.57 -> 1.49 ms: the
        # [chunk, cp] converts run at 8/128 lane utilization and the lane
        # concat forces relayouts. The XLA-side split stays.
        acc = jnp.dot(
            eq, vals_ref[0], preferred_element_type=jnp.float32
        )                                                      # [tile, 3*cp]
        out_ref[0] += acc[:, :cp] + acc[:, cp:2 * cp] + acc[:, 2 * cp:]


@functools.partial(
    jax.jit, static_argnames=("tile", "chunk", "nchunks", "interpret")
)
def placement_pallas(
    pix: jnp.ndarray,      # [B, 1, Npad] int32 — sorted winner pixels, sentinel >= num_pix elsewhere
    vals: jnp.ndarray,     # [B, Npad, 3*cp] bfloat16 — split value channels
    posb: jnp.ndarray,     # [B, T] int32 — window start of tile t, in chunk units
    cnt: jnp.ndarray,      # [B, T] int32 — entries from posb*chunk that may belong to tile t
    *,
    tile: int = 1024,
    chunk: int = 512,
    nchunks: int = 7,
    interpret: bool = False,
) -> jnp.ndarray:
    """-> [B, T*tile, cp] float32 dense image (flat pixel-major), zeros at
    empty pixels. Requires Npad >= max(posb)*chunk + nchunks*chunk (callers
    pad with sentinel pixels / zero values)."""
    B, T = posb.shape
    vc = vals.shape[-1]
    assert vc % 3 == 0, vc
    cp = vc // 3
    # Overflow observability: a tile whose window run exceeds nchunks*chunk
    # drops its tail, which differs from the XLA path's [pos, pos+smax) drop
    # (strictly FEWER drops — the chunk-aligned windows are a superset — but
    # not bit-identical in pathological pitch-compression cases). This is
    # surfaced on-device as the train step's ``placement_overflow_tiles``
    # metric (projection.py project_image_packed_batch(return_overflow=True)),
    # not by a host callback.
    kernel = functools.partial(
        _placement_kernel, tile=tile, chunk=chunk, cp=cp
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, T, nchunks),
        in_specs=[
            pl.BlockSpec(
                (1, 1, chunk),
                lambda b, t, j, posb_ref, cnt_ref: (b, 0, posb_ref[b, t] + j),
            ),
            pl.BlockSpec(
                (1, chunk, vc),
                lambda b, t, j, posb_ref, cnt_ref: (b, posb_ref[b, t] + j, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, cp), lambda b, t, j, posb_ref, cnt_ref: (b, t, 0)
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T * tile, cp), jnp.float32),
        interpret=interpret,
    )(posb, cnt, pix, vals)
