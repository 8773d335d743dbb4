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


def table_sharding(mesh):
    """Stacked artifact tables shard their leading (scan) axis over data."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_stacked_tables(np_leaves, mesh):
    """Host numpy tables ``[S, ...]`` -> device arrays sharded over the data
    axis (the device-resident dataset of the HBM-resident training path,
    trainer.py). Rows are zero-padded to a multiple of the axis size; pad
    rows are never referenced by any pair index. Works multi-process: every
    process holds the full host table (ScanPairDataset loads all scans) and
    ``make_array_from_callback`` materializes only each process's addressable
    shards, so per-device HBM is S/n_devices rows — the budget SCALES with
    the mesh instead of replicating.
    """
    import numpy as np

    n = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    sharding = table_sharding(mesh)
    out = []
    for leaf in np_leaves:
        leaf = np.asarray(leaf)
        pad = (-leaf.shape[0]) % n
        if pad:
            leaf = np.concatenate(
                [leaf, np.zeros((pad,) + leaf.shape[1:], leaf.dtype)], axis=0
            )
        out.append(
            jax.make_array_from_callback(
                leaf.shape, sharding, lambda idx, _l=leaf: _l[idx]
            )
        )
    return out


def make_sharded_scan_steps(model, cfg, mesh, k_steps: int, donate: bool = True):
    """K optimizer steps per dispatch over the mesh: ``lax.scan`` over the
    sharded fullcached step with ON-DEVICE batch gather from the stacked
    artifact tables (the mesh twin of ``trainer._scan_steps_fn``).

    The tables are sharded over the data axis; the per-step ``[B]`` index
    rows are replicated (every process computes the same global permutation
    from the shared seed), so the gather is an SPMD cross-shard gather whose
    output is constrained back to batch-sharded — XLA inserts the collective
    and everything downstream (forward, loss, grads) runs data-parallel with
    one fused gradient all-reduce, exactly like the host-fed sharded step.
    Zero per-step host->device traffic; one dispatch per K steps.
    """
    _check_fullcached(cfg)
    repl = replicated_sharding(mesh)
    tshard = table_sharding(mesh)
    bshard = batch_sharding(mesh)

    def steps(state, rng, tables, tgt_idx, src_idx):
        img, nimg, mr, pts, nrm, val = tables

        def body(carry, xs):
            state, rng = carry
            ti, si = xs
            rng, step_rng = jax.random.split(rng)
            batch = FullyCachedBatch(
                img[ti], nimg[ti], mr[ti],
                img[si], pts[si], nrm[si], val[si], mr[si],
            )
            batch = jax.lax.with_sharding_constraint(batch, bshard)
            grad_fn = jax.value_and_grad(
                lambda p: loss_and_metrics_fullcached(
                    state.apply_fn, p, batch, cfg, step_rng
                ),
                has_aux=True,
            )
            (loss, (metrics, _)), grads = grad_fn(state.params)
            new_state = state.apply_gradients(grads=grads)
            metrics["grad_norm"] = optax_global_norm(grads)
            return (new_state, rng), metrics

        (state, rng), metrics = jax.lax.scan(
            body, (state, rng), (tgt_idx, src_idx), length=k_steps
        )
        return state, rng, metrics

    return jax.jit(
        steps,
        in_shardings=(repl, repl, tshard, repl, repl),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1) if donate else (),
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
