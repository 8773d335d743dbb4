#!/usr/bin/env python3
"""Per-conv MXU probe for the backbone's conv inventory (VERDICT r4 #5).

docs/ROOFLINE.md attributes ~6.3 ms/step to the conv bucket at ~63% MXU and
claims the recoverable ~1.1 ms lives in XLA's codegen for the
anisotropic-stride shapes. This probe measures, per unique conv in the
KITTI-shape backbone (B=8, 64x720 input):

  * fwd+bwd wall time and achieved TFLOP/s of the conv AS THE MODEL RUNS IT
    (bf16, circular-padded VALID),
  * the same contraction re-expressed with SPACE-TO-DEPTH W packing
    (stride-(1,2) kernel folded into a dense stride-1 kernel over paired
    columns — 4/3x the FLOPs but no strided access), to see whether XLA's
    dense-conv path beats its strided path by more than the FLOP overhead.

Numbers feed the decision whether to productize packed convs; either way
the result is recorded in docs/BENCH_NOTES.md.

Run: python scripts/perf_conv_probe.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax              # noqa: E402
import jax.numpy as jnp  # noqa: E402


def sync(x):
    return float(jnp.sum(x))


B = 8

# (name, H, W, cin, cout, kernel, strides) — the full conv inventory of the
# KITTI-shape backbone (models/resnet.py stem + 4 stages), one entry per
# unique shape with its multiplicity in fwd.
CONVS = [
    ("stem      x1", 64, 720, 8, 64, (3, 3), (1, 2)),
    ("stage1.c  x4", 64, 360, 64, 64, (3, 3), (1, 1)),
    ("stage2.s  x1", 64, 360, 64, 128, (3, 3), (1, 2)),
    ("stage2.p  x1", 64, 360, 64, 128, (1, 1), (1, 2)),
    ("stage2.c  x3", 64, 180, 128, 128, (3, 3), (1, 1)),
    ("stage3.s  x1", 64, 180, 128, 256, (3, 3), (1, 2)),
    ("stage3.p  x1", 64, 180, 128, 256, (1, 1), (1, 2)),
    ("stage3.c  x3", 64, 90, 256, 256, (3, 3), (1, 1)),
    ("stage4.s  x1", 64, 90, 256, 512, (3, 3), (2, 2)),
    ("stage4.p  x1", 64, 90, 256, 512, (1, 1), (2, 2)),
    ("stage4.c  x3", 32, 45, 512, 512, (3, 3), (1, 1)),
]


def conv_fn(kernel, strides):
    kh, kw = kernel

    def f(x, w):
        # Same composition as ConvCirc: explicit circular W pad + VALID
        # (H rides conv padding).
        if kw > 1:
            x = jnp.concatenate(
                [x[:, :, -(kw // 2):], x, x[:, :, :kw // 2]], axis=2)
        return jax.lax.conv_general_dilated(
            x, w, window_strides=strides,
            padding=((kh // 2, kh // 2), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )

    return f


def packed_conv_fn(kernel, strides):
    """Stride-(sh,2) conv as a dense stride-(sh,1) conv over W-paired input.

    x [B,H,W,C] -> [B,H,W/2,2C] (even/odd interleave); a kw-wide stride-2
    kernel centered on even columns becomes a ceil((kw+1)/2)-wide dense
    kernel over pairs with 2C input channels (some taps zero)."""
    kh, kw = kernel
    sh, swd = strides
    assert swd == 2

    def f(x, w):                         # w: original [kh, kw, C, O]
        Bx, H, W, C = x.shape
        if kw > 1:
            x = jnp.concatenate(
                [x[:, :, -(kw // 2):], x, x[:, :, :kw // 2]], axis=2)
            Wp = W + 2 * (kw // 2)
        else:
            Wp = W
        if Wp % 2:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0)))
            Wp += 1
        xp = x.reshape(Bx, H, Wp // 2, 2 * C)
        # Packed kernel [kh, kw2, 2C, O]: tap (kh_i, j) of the original at
        # source column offset j lands at pair j//2, slot j%2.
        kw2 = (kw + 1) // 2
        wp = jnp.zeros((kh, kw2, 2 * C, w.shape[-1]), w.dtype)
        for j in range(kw):
            pair, slot = divmod(j, 2)
            wp = wp.at[:, pair, slot * C:(slot + 1) * C, :].set(w[:, j])
        return jax.lax.conv_general_dilated(
            xp, wp, window_strides=(sh, 1),
            padding=((kh // 2, kh // 2), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )

    return f


def time_conv(f, x, w, reps=30):
    loss = jax.jit(jax.value_and_grad(
        lambda xx, ww: jnp.sum(f(xx, ww) ** 2), argnums=(0, 1)))
    t0 = time.time()
    out = loss(x, w)
    sync(out[0])
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = loss(x, w)
    sync(out[0])
    return (time.time() - t0) / reps * 1000, compile_s


def main():
    from delora_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    total_asis = 0.0
    for name, H, W, cin, cout, kernel, strides in CONVS:
        mult = int(name.split("x")[-1])
        x = jnp.asarray(
            rng.normal(size=(B, H, W, cin)).astype(np.float32)
        ).astype(jnp.bfloat16)
        w = jnp.asarray(rng.normal(
            size=kernel + (cin, cout)).astype(np.float32) * 0.05
        ).astype(jnp.bfloat16)
        ho = H // strides[0]
        wo = W // strides[1]
        flops = 3 * 2 * B * ho * wo * cout * kernel[0] * kernel[1] * cin
        ms, cs = time_conv(conv_fn(kernel, strides), x, w)
        tf = flops / ms / 1e9
        total_asis += mult * ms
        line = (f"{name}: {H}x{W} {cin}->{cout} k{kernel} s{strides} "
                f"as-is {ms:.3f} ms ({tf:.1f} TF/s fwd+bwd)")
        if strides[1] == 2:
            ms2, cs2 = time_conv(packed_conv_fn(kernel, strides), x, w)
            line += f" | packed {ms2:.3f} ms ({'WIN' if ms2 < ms else 'lose'})"
        print(line, flush=True)
    print(f"TOTAL as-is conv bucket (weighted): {total_asis:.2f} ms "
          f"(roofline attributed ~6.3 ms)", flush=True)


if __name__ == "__main__":
    main()
