from delora_tpu.losses.icp import IcpLossConfig, icp_losses, masked_mse  # noqa: F401
