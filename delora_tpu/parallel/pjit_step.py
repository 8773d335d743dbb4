"""Sharded (pjit) train step: batch over the data axis, params replicated.

XLA inserts the gradient all-reduce (psum over ICI) automatically from the
sharding constraints — no hand-written collectives (the scaling-book recipe:
pick a mesh, annotate shardings, let XLA place collectives).

Multi-host input: each host builds its local slice of the global batch
(BatchLoader's strided shard) and ``jax.make_array_from_process_local_data``
assembles the logically-global sharded array.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from delora_tpu.parallel.mesh import DATA_AXIS
from delora_tpu.training.step import (
    CachedTargetBatch,
    FullyCachedBatch,
    ScanPairBatch,
    _check_fullcached,
    loss_and_metrics,
    loss_and_metrics_cached,
    loss_and_metrics_fullcached,
    optax_global_norm,
)


def batch_sharding(mesh):
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch: ScanPairBatch, mesh) -> ScanPairBatch:
    """Host-local batch parts -> globally-sharded device arrays."""
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        put = lambda x: jax.device_put(jnp.asarray(x), sharding)
    else:
        put = lambda x: jax.make_array_from_process_local_data(sharding, x)
    return jax.tree.map(put, batch)


def replicate_state(state, mesh):
    """Broadcast a (host-local) train state onto the mesh, replicated.

    Multi-process: device_put from a device-committed local array to a
    sharding spanning other hosts would be a cross-host device transfer
    (unsupported on CPU, needs DCN flags on TPU) — go through host numpy
    instead, which device_put broadcasts from each process's own copy (every
    process holds identical values by construction: deterministic init or a
    shared checkpoint)."""
    if jax.process_count() > 1:
        import numpy as np

        state = jax.tree.map(
            lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, state
        )
    return jax.device_put(state, replicated_sharding(mesh))


def make_sharded_train_step(model, cfg, mesh, donate: bool = True):
    """jit with explicit in/out shardings over the mesh.

    state: replicated; batch: sharded along ``data``; rng: replicated. The
    per-shard loss terms are mean-reduced — since every loss is already a
    masked mean over its shard's pairs, the cross-shard mean matches the
    reference's batch averaging (deployer.py:329-332) up to shard weighting.
    """
    repl = replicated_sharding(mesh)
    shard = batch_sharding(mesh)

    def step(state, batch: ScanPairBatch, rng):
        grad_fn = jax.value_and_grad(
            lambda p: loss_and_metrics(state.apply_fn, p, batch, cfg, rng),
            has_aux=True,
        )
        (loss, (metrics, _)), grads = grad_fn(state.params)
        new_state = state.apply_gradients(grads=grads)
        metrics["grad_norm"] = optax_global_norm(grads)
        return new_state, metrics

    # `shard` is a pytree prefix: every leaf of the batch NamedTuple shards
    # along its leading (batch) axis.
    return jax.jit(
        step,
        in_shardings=(repl, shard, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_sharded_train_step_cached(model, cfg, mesh, donate: bool = True):
    """Sharded twin of ``make_train_step_cached`` (CachedTargetBatch input)."""
    if cfg.correspondence not in ("projective", "image"):
        raise ValueError(
            "cached-target training requires projective or image-space "
            "correspondence"
        )
    repl = replicated_sharding(mesh)
    shard = batch_sharding(mesh)

    def step(state, batch: CachedTargetBatch, rng):
        grad_fn = jax.value_and_grad(
            lambda p: loss_and_metrics_cached(
                state.apply_fn, p, batch, cfg, rng
            ),
            has_aux=True,
        )
        (loss, (metrics, _)), grads = grad_fn(state.params)
        new_state = state.apply_gradients(grads=grads)
        metrics["grad_norm"] = optax_global_norm(grads)
        return new_state, metrics

    return jax.jit(
        step,
        in_shardings=(repl, shard, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_sharded_train_step_fullcached(model, cfg, mesh, donate: bool = True):
    """Sharded twin of ``make_train_step_fullcached`` (FullyCachedBatch)."""
    _check_fullcached(cfg)
    repl = replicated_sharding(mesh)
    shard = batch_sharding(mesh)

    def step(state, batch: FullyCachedBatch, rng):
        grad_fn = jax.value_and_grad(
            lambda p: loss_and_metrics_fullcached(
                state.apply_fn, p, batch, cfg, rng
            ),
            has_aux=True,
        )
        (loss, (metrics, _)), grads = grad_fn(state.params)
        new_state = state.apply_gradients(grads=grads)
        metrics["grad_norm"] = optax_global_norm(grads)
        return new_state, metrics

    return jax.jit(
        step,
        in_shardings=(repl, shard, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_sharded_infer_step(model, cfg, mesh):
    from delora_tpu.training.step import make_infer_step

    repl = replicated_sharding(mesh)
    shard = batch_sharding(mesh)
    inner = make_infer_step(model, cfg)
    batch_shardings = ScanPairBatch(*([shard] * len(ScanPairBatch._fields)))
    return jax.jit(
        lambda params, batch: inner(params, batch),
        in_shardings=(repl, batch_shardings),
        out_shardings=shard,
    )
