from delora_tpu.utils.metrics import MetricsLogger  # noqa: F401
