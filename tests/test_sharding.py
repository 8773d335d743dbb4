"""Multi-device data-parallel tests on the 8-device virtual CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from delora_tpu.losses.icp import IcpLossConfig
from delora_tpu.models.odometry import ModelConfig, OdometryModel
from delora_tpu.ops.projection import ProjectionSpec
from delora_tpu.parallel.mesh import make_mesh
from delora_tpu.parallel.pjit_step import (
    make_sharded_train_step,
    replicate_state,
    shard_batch,
)
from delora_tpu.training.state import create_train_state
from delora_tpu.training.step import ScanPairBatch, StepConfig, make_train_step

H, W, N = 8, 32, 256
PSPEC = ProjectionSpec(
    height=H, width=W,
    fov_down=np.deg2rad(-24.5), fov_up=np.deg2rad(2.0),
    fov_left=np.deg2rad(-179.9), fov_right=np.deg2rad(179.9),
)


def batch_of(B, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(
        rng.normal(size=(B, N, 3)).astype(np.float32) * np.array([8, 8, 0.5], np.float32)
        - np.array([0, 0, 1.5], np.float32)
    )
    nrm = jnp.zeros((B, N, 3), jnp.float32)
    ones = jnp.ones((B, N), bool)
    return ScanPairBatch(mk(), nrm, ones, mk(), nrm, ones)


def tiny_model_state(B):
    cfg = ModelConfig(resnet_outputs=16, blocks_per_stage=(1, 1, 1, 1),
                      channel_divisor=32)
    model = OdometryModel(cfg)
    state = create_train_state(
        model, {"learning_rate": 1e-3}, jnp.zeros((B, H, W, 4))
    )
    return model, state


def test_eight_device_mesh_exists():
    assert len(jax.devices()) == 8  # conftest forces the virtual CPU mesh


def test_sharded_step_runs_and_matches_single_device():
    B = 8
    model, state = tiny_model_state(B)
    cfg = StepConfig(proj=PSPEC, icp=IcpLossConfig(point_to_point=True),
                     supervised=True)
    batch = batch_of(B)
    rng = jax.random.PRNGKey(0)

    mesh = make_mesh()
    sharded_step = make_sharded_train_step(model, cfg, mesh, donate=False)
    s_state = replicate_state(state, mesh)
    s_batch = shard_batch(jax.tree.map(np.asarray, batch), mesh)
    new_sharded, m_sharded = sharded_step(s_state, s_batch, rng)

    single_step = make_train_step(model, cfg, donate=False)
    new_single, m_single = single_step(state, batch, rng)

    # Same math, different partitioning: losses agree to fp tolerance.
    assert np.isclose(float(m_sharded["loss"]), float(m_single["loss"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(new_sharded.params),
                    jax.tree.leaves(new_single.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sharded_batch_placement():
    mesh = make_mesh()
    batch = jax.tree.map(np.asarray, batch_of(8))
    sharded = shard_batch(batch, mesh)
    # Batch axis split across all 8 devices.
    assert len(sharded.points_1.sharding.device_set) == 8
    shard_shapes = [s.data.shape for s in sharded.points_1.addressable_shards]
    assert all(s == (1, N, 3) for s in shard_shapes)


def test_unsupervised_sharded_step_finite():
    B = 8
    model, state = tiny_model_state(B)
    cfg = StepConfig(proj=PSPEC, icp=IcpLossConfig())
    mesh = make_mesh()
    step = make_sharded_train_step(model, cfg, mesh, donate=False)
    s_state = replicate_state(state, mesh)
    s_batch = shard_batch(jax.tree.map(np.asarray, batch_of(B, seed=1)), mesh)
    _, metrics = step(s_state, s_batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss_pc"]))


def test_sharded_cached_step_matches_unsharded():
    """make_sharded_train_step_cached over the 8-device mesh == the
    single-device cached step (same loss, same updated params)."""
    from delora_tpu.ops.projection_host import target_artifacts_np
    from delora_tpu.parallel.pjit_step import make_sharded_train_step_cached
    from delora_tpu.training.step import CachedTargetBatch, make_train_step_cached

    B = 8
    model, state = tiny_model_state(B)
    cfg = StepConfig(proj=PSPEC, icp=IcpLossConfig())
    batch = batch_of(B, seed=3)

    arts = [
        target_artifacts_np(
            np.asarray(batch.points_1[b]), np.asarray(batch.normals_1[b]),
            np.asarray(batch.valid_1[b]), PSPEC,
        )
        for b in range(B)
    ]
    cached = CachedTargetBatch(
        image_1=np.stack([a[0] for a in arts]),
        normal_image_1=np.stack([a[1] for a in arts]),
        mean_range_1=np.asarray([a[2] for a in arts], np.float32),
        points_2=np.asarray(batch.points_2),
        normals_2=np.asarray(batch.normals_2),
        valid_2=np.asarray(batch.valid_2),
    )
    rng = jax.random.PRNGKey(1)

    single = make_train_step_cached(model, cfg, donate=False)
    s1, m1 = single(state, jax.tree.map(jnp.asarray, cached), rng)

    mesh = make_mesh(jax.devices())
    sharded = make_sharded_train_step_cached(model, cfg, mesh, donate=False)
    s2, m2 = sharded(
        replicate_state(state, mesh), shard_batch(cached, mesh), rng
    )

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5, atol=1e-7)
    l1 = jax.tree.leaves(s1.params)[0]
    l2 = jax.tree.leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-4, atol=1e-6)
