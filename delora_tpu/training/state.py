"""Train state: params + Adam optimizer, with linear LR scaling for pods.

The reference trains with Adam at lr 1e-5 (reference src/deploy/trainer.py:23-24,
config/hyperparameters.yaml:5). For large-batch pod runs the linear scaling
rule (lr * global_batch / base_batch) is exposed via config ``lr_scaling``.
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    """Standard flax TrainState; kept as a named subclass for checkpoints."""


def effective_learning_rate(config, global_batch_size: int) -> float:
    """Linear-scaling rule: lr * global_batch / base_batch (pod recipe)."""
    lr = float(config["learning_rate"])
    if config.get("lr_scaling", "none") == "linear":
        lr = lr * global_batch_size / float(config.get("lr_scaling_base_batch", 32))
    return lr


def make_optimizer(config, global_batch_size: int) -> optax.GradientTransformation:
    lr = effective_learning_rate(config, global_batch_size)
    # Optional decay schedule (framework feature; the reference trains at a
    # constant lr). Late-epoch lr decay settles the pose estimate into the
    # loss basin instead of wandering on optimizer noise — measured as
    # t_rel oscillation across staged evals on the 880 m world (BENCH_NOTES
    # r19). "cosine" decays to lr * lr_min_ratio over lr_decay_steps.
    if str(config.get("lr_schedule", "constant")) == "cosine":
        decay_steps = int(config["lr_decay_steps"])
        lr = optax.cosine_decay_schedule(
            lr, decay_steps, alpha=float(config.get("lr_min_ratio", 0.1))
        )
    tx = optax.adam(lr)
    # Measured on v5e (scripts/perf_probe2.py): flattening the update via
    # optax.flatten is a REGRESSION inside the jitted step (11.9 -> 18.4 ms
    # full step) — XLA already horizontally fuses the per-leaf elementwise
    # Adam kernels, while ravel_pytree's concatenate/split adds two full
    # passes over the 48 MB parameter vector. Kept as an opt-in knob
    # (numerically identical — tests/test_checkpoint.py::
    # test_fused_adam_matches_per_leaf) for topologies where per-leaf
    # dispatch dominates.
    if config.get("fused_adam", False):
        tx = optax.flatten(tx)
    return tx


def create_train_state(model, config, example_images, rng=None) -> TrainState:
    """Initialize parameters and optimizer.

    example_images: a [B, H, W, C] array (used twice as the scan pair).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    params = model.init(rng, example_images, example_images)
    tx = make_optimizer(config, example_images.shape[0])
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def param_count(state: TrainState) -> int:
    import numpy as np

    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state.params))
