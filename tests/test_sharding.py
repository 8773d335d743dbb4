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
