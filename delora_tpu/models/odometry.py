"""Odometry model: scan-pair images -> relative SE(3) (translation, quaternion).

Re-design of the reference OdometryModel (reference src/models/model.py):
concatenate the two 4-channel range images channel-wise (8 in-channels,
model.py:22,98) — optionally after a shared 5-layer per-image conv feature
extractor (model.py:30-45, off by default) — push through the circular ResNet,
then regress rotation and translation with two separate 2-layer MLP heads
(1000 -> 100 -> 4 / 3, model.py:74-87) or one shared 5-layer MLP
(use_single_mlp_at_output, model.py:59-72; its output packs rotation first,
model.py:108-109).

Quaternion output is (x, y, z, w) — the kornia 0.3.0 convention the reference
decodes with (model_parts.py:30-31). Normalization mode:
  * "per_row" (default): each quaternion normalized independently — the
    mathematically correct form;
  * "global": reproduces the reference's whole-tensor norm (model.py:114)
    bit-for-bit for checkpoint-parity runs. Note kornia re-normalizes per
    quaternion when decoding, so the two modes yield identical rotations;
    only the raw 4-vector scale differs.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import flax.linen as nn
import jax.numpy as jnp

from delora_tpu.models.resnet import (
    CircularResNet,
    ConvCirc,
    _act,
    torch_linear_bias_init,
    torch_linear_kernel_init,
)


class ModelConfig(NamedTuple):
    resnet_outputs: int = 1000
    blocks_per_stage: Tuple[int, ...] = (2, 2, 2, 2)
    channel_divisor: int = 1
    activation: str = "tanh"
    use_dropout: bool = False
    pre_feature_extraction: bool = False
    use_single_mlp: bool = False
    quaternion_normalization: str = "per_row"   # "per_row" | "global"
    compute_dtype: Any = jnp.float32
    in_channels_per_image: int = 4
    remat: bool = False     # rematerialize ResNet blocks (pod configs)
    stage_width_multipliers: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)

    @classmethod
    def from_config(cls, config):
        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
            config.get("compute_dtype", "float32")
        ]
        return cls(
            resnet_outputs=int(config["resnet_outputs"]),
            blocks_per_stage=tuple(config["layers"]),
            channel_divisor=int(config["factor_fewer_resnet_channels"]),
            activation=str(config["activation_fct"]),
            use_dropout=bool(config["use_dropout"]),
            pre_feature_extraction=bool(config["pre_feature_extraction"]),
            use_single_mlp=bool(config["use_single_mlp_at_output"]),
            quaternion_normalization=str(config["quaternion_normalization"]),
            compute_dtype=dtype,
            remat=bool(config.get("remat", False)),
            stage_width_multipliers=tuple(
                float(m) for m in config.get(
                    "resnet_stage_width_multipliers", (1.0, 1.0, 1.0, 1.0)
                )
            ),
        )


class _Mlp(nn.Module):
    """Activation-first MLP, torch-default-initialized (model.py:74-87)."""

    sizes: Tuple[int, ...]   # hidden+output widths
    in_features: int
    activation: str
    compute_dtype: Any

    @nn.compact
    def __call__(self, x):
        act = _act(self.activation)
        fan_in = self.in_features
        for i, width in enumerate(self.sizes):
            x = act(x)
            x = nn.Dense(
                width, dtype=self.compute_dtype, param_dtype=jnp.float32,
                kernel_init=torch_linear_kernel_init(),
                bias_init=torch_linear_bias_init(fan_in),
            )(x)
            fan_in = width
        return x


class FeatureExtractor(nn.Module):
    """Optional shared 5-layer per-image conv stack (model.py:30-45).

    Channel schedule parity: layer k maps (k * 8 or 4 at k=0) -> (k+1) * 8.
    """

    base_channels: int = 8
    num_layers: int = 5
    activation: str = "tanh"
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = _act(self.activation)
        for k in range(self.num_layers):
            x = ConvCirc(
                (k + 1) * self.base_channels, activation=self.activation,
                compute_dtype=self.compute_dtype,
            )(x)
            x = act(x)
        return x


class OdometryModel(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, image_1, image_2, deterministic: bool = True):
        """image_*: [B, H, W, C]; returns (translation [B,3], quat_xyzw [B,4])."""
        cfg = self.cfg
        if cfg.pre_feature_extraction:
            extractor = FeatureExtractor(
                base_channels=2 * cfg.in_channels_per_image,
                activation=cfg.activation,
                compute_dtype=cfg.compute_dtype,
            )
            x = jnp.concatenate([extractor(image_1), extractor(image_2)], axis=-1)
        else:
            x = jnp.concatenate([image_1, image_2], axis=-1)

        features = CircularResNet(
            num_outputs=cfg.resnet_outputs,
            blocks_per_stage=cfg.blocks_per_stage,
            channel_divisor=cfg.channel_divisor,
            stage_width_multipliers=cfg.stage_width_multipliers,
            activation=cfg.activation,
            use_dropout=cfg.use_dropout,
            compute_dtype=cfg.compute_dtype,
            remat=cfg.remat,
        )(x.astype(cfg.compute_dtype), deterministic=deterministic)
        feat = features[-1]

        if cfg.use_single_mlp:
            out = _Mlp(
                sizes=(512, 512, 256, 64, 7), in_features=cfg.resnet_outputs,
                activation=cfg.activation, compute_dtype=cfg.compute_dtype,
            )(feat)
            rotation = out[:, :4]
            translation = out[:, 4:]
        else:
            rotation = _Mlp(
                sizes=(100, 4), in_features=cfg.resnet_outputs,
                activation=cfg.activation, compute_dtype=cfg.compute_dtype,
            )(feat)
            translation = _Mlp(
                sizes=(100, 3), in_features=cfg.resnet_outputs,
                activation=cfg.activation, compute_dtype=cfg.compute_dtype,
            )(feat)

        rotation = rotation.astype(jnp.float32)
        translation = translation.astype(jnp.float32)
        if cfg.quaternion_normalization == "global":
            rotation = rotation / jnp.maximum(jnp.linalg.norm(rotation), 1e-12)
        else:
            rotation = rotation / jnp.maximum(
                jnp.linalg.norm(rotation, axis=-1, keepdims=True), 1e-12
            )
        return translation, rotation
