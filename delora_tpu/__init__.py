"""delora_tpu — TPU-native self-supervised LiDAR odometry framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
leggedrobotics/delora (ICRA 2021): spherical range-image projection,
neighborhood-PCA normal estimation, a norm-free circular-padded ResNet
regressing relative SE(3) poses from consecutive scan pairs, and geometric
scan-matching (ICP-style) self-supervised losses — all running as one jitted
on-device program, scaled data-parallel over TPU meshes via pjit/shard_map.

Subpackages
-----------
- ``delora_tpu.se3``       : quaternion / rotation / SE(3) math (pure jnp)
- ``delora_tpu.ops``       : projection, normals, correspondence kernels
- ``delora_tpu.models``    : Flax models (circular ResNet, odometry head)
- ``delora_tpu.losses``    : masked point-to-plane / plane-to-plane losses
- ``delora_tpu.data``      : KITTI ingestion, offline preprocessing, loaders
- ``delora_tpu.training``  : jitted train step, trainer, checkpointing
- ``delora_tpu.parallel``  : mesh construction, shardings, multi-host init
- ``delora_tpu.serving``   : streaming (10 Hz budget) inference engine
- ``delora_tpu.utils``     : metrics logging, plotting, evaluation
"""

__version__ = "0.1.0"

from delora_tpu.config import load_config  # noqa: F401
