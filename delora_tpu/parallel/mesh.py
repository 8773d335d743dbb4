"""Device mesh construction and multi-host initialization.

The reference has NO distributed runtime at all (SURVEY.md §2: no
torch.distributed, no collectives; one CUDA device string). This module is the
new first-class scale-out component required by BASELINE.json: a 1-D ``data``
mesh over all chips (gradient all-reduce rides ICI automatically once the
batch is sharded), with ``jax.distributed.initialize`` for multi-host pods
over DCN.

The model is ~12M params — pure data parallelism is the right mapping: params
replicated (48 MB fp32), batch sharded. Sharded-batch gradients are
all-reduced by XLA as a single fused psum per step.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
from jax.sharding import Mesh

DATA_AXIS = "data"


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the multi-host process group (no-op for single-process runs).

    On Cloud TPU pods jax.distributed.initialize discovers everything from the
    metadata server; explicit args support bring-your-own clusters.
    """
    if num_processes is not None and num_processes <= 1:
        return
    if coordinator_address or num_processes or os.environ.get("JAX_COORDINATOR"):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_mesh(devices: Optional[Sequence] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D data mesh over all (or the given) devices."""
    import numpy as np

    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs.reshape(-1), (axis,))
