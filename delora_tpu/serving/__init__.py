from delora_tpu.serving.stream import StreamingOdometry, OdometryIntegrator  # noqa: F401
