"""Train state: params + Adam optimizer, with linear LR scaling for pods.

The reference trains with Adam at lr 1e-5 (reference src/deploy/trainer.py:23-24,
config/hyperparameters.yaml:5). For large-batch pod runs the linear scaling
rule (lr * global_batch / base_batch) is exposed via config ``lr_scaling``.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    """Standard flax TrainState; kept as a named subclass for checkpoints."""


class EmaState(NamedTuple):
    """Polyak-averaged parameters, tracked inside the optimizer state so the
    K-steps-per-dispatch scan, Orbax checkpoints and multi-host replication
    all carry it with zero extra plumbing."""

    ema: Any


def track_param_ema(decay: float) -> optax.GradientTransformation:
    """Append-to-chain transform maintaining an EMA of the PARAMETERS.

    Placed last in the chain it sees the final updates, so the post-step
    parameters are ``params + updates`` and
    ``ema <- decay * ema + (1 - decay) * (params + updates)``.

    Motivation (r5, 880 m synthetic world): the pose basin of the
    self-supervised ICP objective is FLAT along weakly-observed directions —
    the trained trajectory random-walks across epochs while the loss sits at
    its floor (t_rel staged evals oscillate 15->85%; docs/BENCH_NOTES.md).
    An EMA over ~the last thousand steps centers that walk instead of
    sampling a lottery endpoint. The reference has no counterpart (it
    evaluates the final iterate; src/deploy/trainer.py).
    """

    def init_fn(params):
        # REAL copies, not aliases: tx.init runs eagerly in create_train_state,
        # so `lambda p: p` would alias the ema leaves to the param buffers and
        # the first donated dispatch fails with "Attempt to donate the same
        # buffer twice" (tests/test_checkpoint.py covers the donated path).
        return EmaState(ema=jax.tree.map(lambda p: p + 0, params))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("track_param_ema requires params")
        new_ema = jax.tree.map(
            lambda e, p, u: decay * e + (1.0 - decay) * (p + u),
            state.ema, params, updates,
        )
        return updates, EmaState(ema=new_ema)

    return optax.GradientTransformation(init_fn, update_fn)


def ema_params(state: TrainState) -> Optional[Any]:
    """The EMA parameter tree carried in ``state.opt_state``, or None if EMA
    tracking is off. Works for chained/nested optimizer states."""
    found = []

    def walk(s):
        if isinstance(s, EmaState):
            found.append(s.ema)
        elif isinstance(s, tuple):
            for item in s:
                walk(item)

    walk(state.opt_state)
    return found[0] if found else None


def deploy_state(state: TrainState) -> TrainState:
    """The state to evaluate/serve: EMA parameters substituted when tracked
    (see track_param_ema), else the state unchanged."""
    ema = ema_params(state)
    return state if ema is None else state.replace(params=ema)


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
    # Parameter EMA (ema_decay > 0): tracked last in the chain so it sees
    # the final updates. The flat-basin stabilizer — see track_param_ema.
    decay = float(config.get("ema_decay", 0.0))
    if decay > 0.0:
        tx = optax.chain(tx, track_param_ema(decay))
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
