from delora_tpu.models.resnet import CircularResNet  # noqa: F401
from delora_tpu.models.odometry import OdometryModel, ModelConfig  # noqa: F401
