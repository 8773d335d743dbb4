#!/usr/bin/env python3
"""Conv-bucket experiment (docs/ROOFLINE.md: convs measured ~63% MXU).

Times each ResNet stage's conv pair (fwd+bwd) in isolation at the KITTI
bench shape (B=8, 64x720x8 input), then re-times the identical convolution
with the spatial axes TRANSPOSED (rings on the lane-tiled W axis, azimuth on
H) to test whether XLA's TPU conv codegen prefers the anisotropic (1,2)
stride on the other axis. If the transposed layout wins by >10% on any
stage, the backbone could adopt a transposed internal layout (circular
padding would move to H) — otherwise this records that the 63% is
layout-invariant, i.e. lives in codegen, closing VERDICT r4 weak #3's
"no layout experiment recorded" gap.

Output: one line per (stage, layout): ms/iter and achieved TFLOP/s.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from delora_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

B = 8
PEAK = 197.0  # TF bf16


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def conv_flops(H, W, cin, cout, sh, sw, k=3):
    # fwd MACs * 2, per output pixel; bwd = 2x fwd.
    return 2 * (H // sh) * (W // sw) * cin * cout * k * k * B * 3


def run_case(name, H, W, cin, cout, strides):
    import flax.linen as nn

    class TwoConv(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(cout, (3, 3), strides=strides, padding="SAME",
                        use_bias=False, dtype=jnp.bfloat16,
                        param_dtype=jnp.float32)(x)
            x = jnp.tanh(x)
            x = nn.Conv(cout, (3, 3), padding="SAME", use_bias=False,
                        dtype=jnp.bfloat16, param_dtype=jnp.float32)(x)
            return jnp.tanh(x)

    m = TwoConv()
    x = jnp.asarray(np.random.randn(B, H, W, cin), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)

    def loss(p, x):
        return jnp.sum(jnp.square(m.apply(p, x).astype(jnp.float32)))

    g = jax.jit(jax.grad(loss))
    sync(jax.tree.leaves(g(params, x))[0])  # compile+warm
    n = 30
    t0 = time.time()
    out = None
    for _ in range(n):
        out = g(params, x)
    sync(jax.tree.leaves(out)[0])
    dt = (time.time() - t0) / n
    sh, sw = strides
    fl = conv_flops(H, W, cin, cout, sh, sw) + conv_flops(
        H // sh, W // sw, cout, cout, 1, 1
    )
    print(f"{name:28s} {H:4d}x{W:4d} c{cin:3d}->{cout:3d} s{strides}: "
          f"{dt * 1e3:7.2f} ms  {fl / dt / 1e12:6.2f} TF/s "
          f"({fl / dt / 1e12 / PEAK * 100:4.1f}% peak)", flush=True)
    return dt


# (stage, H, W, cin, cout, strides) at the KITTI 64x720 bench geometry:
# stem output feeds stage1 at 64x180 (stride (1,2) stem conv + (1,2) pool).
CASES = [
    ("stage1", 64, 180, 64, 64, (1, 1)),
    ("stage2", 64, 180, 64, 128, (1, 2)),
    ("stage3", 64, 90, 128, 256, (1, 2)),
    ("stage4", 64, 45, 256, 512, (2, 2)),
]

print(f"devices: {jax.devices()}", flush=True)
for name, H, W, cin, cout, s in CASES:
    t_a = run_case(name + "/as-is", H, W, cin, cout, s)
    t_b = run_case(name + "/transposed", W, H, cin, cout, (s[1], s[0]))
    print(f"  -> transposed speedup: {t_a / t_b:5.2f}x", flush=True)

# Channel-width scaling at the stage-1 geometry: if c128 runs at ~the same
# ms as c64 (2x the FLOPs), stage 1's 128-lane MXU tiles are half-empty at
# width 64 and a 2x-wider stage 1 is nearly time-free (a quality knob, not a
# parity change — factor_fewer_resnet_channels already scales widths).
run_case("stage1-wide c128", 64, 180, 128, 128, (1, 1))
run_case("stage1-wide c96", 64, 180, 96, 96, (1, 1))
# Stem: 8 in-channels (two 4-channel images) at full 64x720.
run_case("stem c8->64", 64, 720, 8, 64, (1, 2))
