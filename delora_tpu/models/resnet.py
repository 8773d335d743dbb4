"""Norm-free, circular-padded ResNet backbone for range images (Flax linen).

TPU-first re-design of the reference backbone (reference
src/models/resnet_modified.py): a torchvision-shaped ResNet-18 with all batch
norm removed (resnet_modified.py:43,99,152-169 comment them out), circular
padding along azimuth before every 3x3 conv (wrap-around width,
:97,101,162,167), anisotropic width-first downsampling strides
(1,2)/(1,2)/(1,2)/(2,2) (:40-60), selectable relu/tanh activation (tanh is the
trained default), optional dropout, and a channel-width divisor.

Design differences from the reference (intentional, TPU-motivated):
  * NHWC layout — the native TPU convolution layout; H = LiDAR rings,
    W = azimuth.
  * A ``compute_dtype`` knob runs conv/matmul compute in bfloat16 on the MXU
    with float32 params (use float32 for parity runs).
  * Circular width padding + zero (or -inf for pooling) height padding are
    fused into explicit pads before VALID convolutions.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


def kaiming_normal_out(activation: str):
    """torch.nn.init.kaiming_normal_(mode='fan_out', nonlinearity=...).

    gain = sqrt(2) for relu, 5/3 for tanh; std = gain / sqrt(fan_out). Matches
    the reference conv init loop (resnet_modified.py:64-69).
    """
    gain_sq = 2.0 if activation == "relu" else (5.0 / 3.0) ** 2
    return nn.initializers.variance_scaling(gain_sq, "fan_out", "truncated_normal")


def pad_circular_w(x: jnp.ndarray, pad_w: int = 1, pad_h: int = 1,
                   height_value: float = 0.0) -> jnp.ndarray:
    """Wrap-pad azimuth (W), constant-pad rings (H). x: [B, H, W, C]."""
    if pad_w:
        x = jnp.concatenate([x[:, :, -pad_w:], x, x[:, :, :pad_w]], axis=2)
    if pad_h:
        x = jnp.pad(
            x,
            ((0, 0), (pad_h, pad_h), (0, 0), (0, 0)),
            constant_values=height_value,
        )
    return x


class ConvCirc(nn.Module):
    """3x3 (or kxk) VALID conv preceded by circular-W / zero-H padding."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    activation: str = "tanh"
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        # Only the azimuth wrap needs an explicit concat; the zero height
        # padding rides the convolution's own padding parameter so XLA
        # materializes ONE padded operand per conv instead of two.
        x = pad_circular_w(x, pad_w=kw // 2, pad_h=0)
        return nn.Conv(
            self.features,
            kernel_size=self.kernel,
            strides=self.strides,
            padding=((kh // 2, kh // 2), (0, 0)),
            use_bias=False,
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
            kernel_init=kaiming_normal_out(self.activation),
        )(x)


def _act(name: str):
    return nn.relu if name == "relu" else jnp.tanh


class BasicBlock(nn.Module):
    """Two 3x3 convs + identity/1x1-projection skip, no norm layers.

    Parity: reference BasicBlock (resnet_modified.py:137-177).
    """

    features: int
    strides: Tuple[int, int] = (1, 1)
    activation: str = "tanh"
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = _act(self.activation)
        needs_proj = self.strides != (1, 1) or x.shape[-1] != self.features

        out = ConvCirc(self.features, strides=self.strides,
                       activation=self.activation,
                       compute_dtype=self.compute_dtype)(x)
        out = act(out)
        out = ConvCirc(self.features, activation=self.activation,
                       compute_dtype=self.compute_dtype)(out)

        identity = x
        if needs_proj:
            identity = nn.Conv(
                self.features, kernel_size=(1, 1), strides=self.strides,
                padding="VALID", use_bias=False,
                dtype=self.compute_dtype, param_dtype=jnp.float32,
                kernel_init=kaiming_normal_out(self.activation),
            )(x)
        return act(out + identity)


class CircularResNet(nn.Module):
    """The full backbone: stem, 4 stages, global average pool, fc head.

    Returns the feature list [x1, x2, x3, x4, fc_out] like the reference
    (resnet_modified.py:118) so feature-level consumers keep working.
    """

    num_outputs: int = 1000
    blocks_per_stage: Sequence[int] = (2, 2, 2, 2)
    channel_divisor: int = 1              # factor_fewer_resnet_channels
    # Per-stage width multipliers on the (64, 128, 256, 512) torchvision
    # widths. Beyond-reference capacity knob, measured nearly time-free for
    # stage 1 on TPU: 64-channel convs fill half a 128-lane MXU tile, so
    # (2, 1, 1, 1) buys 4x stage-1 FLOP capacity for ~+0.4 ms/step at the
    # KITTI bench shape (scripts/conv_experiment.py, docs/BENCH_NOTES.md r5).
    # Default (1, 1, 1, 1) keeps reference-checkpoint width compatibility.
    stage_width_multipliers: Sequence[float] = (1.0, 1.0, 1.0, 1.0)
    activation: str = "tanh"
    use_dropout: bool = False
    compute_dtype: Any = jnp.float32
    remat: bool = False                   # rematerialize each BasicBlock

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> List[jnp.ndarray]:
        act = _act(self.activation)
        widths = [
            int(c * m / self.channel_divisor)
            for c, m in zip((64, 128, 256, 512), self.stage_width_multipliers)
        ]
        stage_strides = [(1, 1), (1, 2), (1, 2), (2, 2)]

        if self.use_dropout:
            x = nn.Dropout(0.2, deterministic=deterministic)(x)

        # Stem: conv 3x3 stride (1,2) -> act -> maxpool 3x3 stride (1,2).
        x = ConvCirc(widths[0], strides=(1, 2), activation=self.activation,
                     compute_dtype=self.compute_dtype)(x)
        x = act(x)
        x = pad_circular_w(x, pad_w=1, pad_h=1, height_value=-jnp.inf)
        # Separable max pool (max is separable: max over a 3x3 window ==
        # max over rows of max over columns). Identical values to the fused
        # 3x3 reduce-window, but on TPU the 2D window lowered to ~0.4 ms of
        # reduce-window + 0.38 ms of select-and-scatter backward at KITTI
        # B=8 (docs/BENCH_NOTES.md r17 trace); the two 1D passes are
        # substantially cheaper in both directions.
        x = nn.max_pool(x, window_shape=(3, 1), strides=(1, 1), padding="VALID")
        x = nn.max_pool(x, window_shape=(1, 3), strides=(1, 2), padding="VALID")

        # Large-batch (pod) configs: rematerialize block interiors in the
        # backward pass so only block BOUNDARY activations are stored —
        # XLA-measured at KITTI 64x720 this cuts the step's per-device temp
        # memory several-fold for ~1 extra forward of FLOPs
        # (docs/POD_BUDGET.md). Identical outputs and gradients.
        # Explicit names keep the param tree identical with remat on or off
        # (nn.remat's auto-name would be "remat(CheckpointBasicBlock_k)",
        # breaking checkpoint compatibility between the two modes).
        Block = nn.remat(BasicBlock) if self.remat else BasicBlock

        features = []
        block_idx = 0
        for stage, (width, strides, blocks) in enumerate(
            zip(widths, stage_strides, self.blocks_per_stage)
        ):
            for block in range(blocks):
                x = Block(
                    width,
                    strides=strides if block == 0 else (1, 1),
                    activation=self.activation,
                    compute_dtype=self.compute_dtype,
                    name=f"BasicBlock_{block_idx}",
                )(x)
                block_idx += 1
            if stage == 2 and self.use_dropout:
                # dropout_channels after layer3 (resnet_modified.py:110).
                x = nn.Dropout(0.2, deterministic=deterministic,
                               broadcast_dims=(1, 2))(x)
            features.append(x)

        out = jnp.mean(x, axis=(1, 2))                     # adaptive avgpool 1x1
        out = nn.Dense(
            self.num_outputs, dtype=self.compute_dtype, param_dtype=jnp.float32,
            kernel_init=torch_linear_kernel_init(),
            bias_init=torch_linear_bias_init(int(widths[3])),
        )(out.astype(self.compute_dtype))
        if self.use_dropout:
            out = nn.Dropout(0.2, deterministic=deterministic)(out)
        features.append(out.astype(jnp.float32))
        return features


def torch_linear_kernel_init():
    """torch.nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))."""
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_linear_bias_init(fan_in: int):
    """torch.nn.Linear default bias: U(+-1/sqrt(fan_in))."""
    import jax

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / (fan_in ** 0.5)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init
