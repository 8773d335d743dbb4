"""Test harness: force CPU with 8 virtual devices so sharding tests run
anywhere (the standard JAX answer to testing distributed code without a pod —
SURVEY.md §4). Must run before jax is imported anywhere."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The hosting image's sitecustomize force-registers a TPU backend and
# programmatically overrides jax_platforms, so the env var alone is not
# enough — pin the config after import as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
