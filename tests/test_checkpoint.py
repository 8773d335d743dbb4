import os

import numpy as np

import jax
import jax.numpy as jnp

from delora_tpu.models.odometry import ModelConfig, OdometryModel
from delora_tpu.training.checkpoint import CheckpointManager
from delora_tpu.training.state import create_train_state


def tiny_state():
    cfg = ModelConfig(resnet_outputs=16, blocks_per_stage=(1, 1, 1, 1),
                      channel_divisor=32)
    model = OdometryModel(cfg)
    config = {"learning_rate": 1e-3}
    state = create_train_state(model, config, jnp.zeros((1, 16, 32, 4)))
    return model, state, config


def test_save_restore_roundtrip(tmp_path):
    model, state, config = tiny_state()
    mgr = CheckpointManager(str(tmp_path), keep_every=5)
    config_to_embed = {"learning_rate": 1e-3, "datasets": ["kitti"]}
    mgr.save(state, epoch=3, loss=0.123, config=config_to_embed)

    # Perturb, then restore: must come back bit-exact.
    perturbed = state.replace(
        params=jax.tree.map(lambda p: p + 1.0, state.params)
    )
    restored, meta = mgr.restore(perturbed, "latest")
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert meta["epoch"] == 3
    assert meta["loss"] == 0.123
    assert meta["parameters"]["datasets"] == ["kitti"]


def test_durable_copies_every_keep_every(tmp_path):
    model, state, config = tiny_state()
    mgr = CheckpointManager(str(tmp_path), keep_every=2)
    for epoch in range(5):
        mgr.save(state, epoch=epoch, loss=1.0, config={})
    names = sorted(os.listdir(str(tmp_path)))
    assert "latest" in names
    assert "epoch_00000" in names and "epoch_00002" in names and "epoch_00004" in names
    assert "epoch_00001" not in names


def test_embedded_config_reader(tmp_path):
    model, state, config = tiny_state()
    mgr = CheckpointManager(str(tmp_path), keep_every=1)
    mgr.save(state, epoch=0, loss=0.5, config={"activation_fct": "tanh"})
    cfg = CheckpointManager.embedded_config(str(tmp_path / "latest"))
    assert cfg["activation_fct"] == "tanh"


def test_fused_adam_matches_per_leaf():
    """optax.flatten(adam) must be numerically identical to per-leaf adam."""
    from delora_tpu.training.state import make_optimizer

    cfg_fused = {"learning_rate": 1e-3}                       # default: fused
    cfg_leaf = {"learning_rate": 1e-3, "fused_adam": False}
    rng = np.random.default_rng(0)
    params = {
        "a": rng.normal(size=(3, 5)).astype(np.float32),
        "b": {"w": rng.normal(size=(7,)).astype(np.float32)},
    }
    txs = [make_optimizer(c, 1) for c in (cfg_fused, cfg_leaf)]
    states = [tx.init(params) for tx in txs]
    ps = [jax.tree.map(jnp.asarray, params) for _ in txs]
    for step in range(3):
        grads = jax.tree.map(
            lambda p: jnp.asarray(
                rng.normal(size=p.shape).astype(np.float32)
            ),
            params,
        )
        for i, tx in enumerate(txs):
            updates, states[i] = tx.update(grads, states[i], ps[i])
            import optax

            ps[i] = optax.apply_updates(ps[i], updates)
    for a, b in zip(jax.tree.leaves(ps[0]), jax.tree.leaves(ps[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_linear_lr_scaling():
    from delora_tpu.training.state import make_optimizer

    base = {"learning_rate": 1e-5, "lr_scaling": "none"}
    linear = {"learning_rate": 1e-5, "lr_scaling": "linear",
              "lr_scaling_base_batch": 32}
    import optax

    # Compare the effective step size on an identity gradient.
    def effective_lr(config, batch):
        tx = make_optimizer(config, batch)
        params = {"w": np.ones(4, np.float32)}
        state = tx.init(params)
        grads = {"w": np.ones(4, np.float32)}
        updates, _ = tx.update(grads, state, params)
        return float(-updates["w"][0])

    lr_none = effective_lr(base, 4096)
    lr_lin = effective_lr(linear, 4096)
    assert np.isclose(lr_lin / lr_none, 4096 / 32, rtol=1e-4)


def test_cosine_schedule_decays_lr():
    """lr_schedule: cosine builds a decaying optimizer that still trains and
    whose effective step size shrinks (framework feature; reference is
    constant-lr)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from delora_tpu.training.state import make_optimizer

    cfg = {"learning_rate": 1e-2, "lr_schedule": "cosine",
           "lr_decay_steps": 10, "lr_min_ratio": 0.0}
    tx = make_optimizer(cfg, 8)
    params = {"w": jnp.ones(4)}
    opt_state = tx.init(params)
    grads = {"w": jnp.ones(4)}
    sizes = []
    for _ in range(10):
        updates, opt_state = tx.update(grads, opt_state, params)
        sizes.append(float(jnp.abs(updates["w"]).mean()))
        params = jax.tree.map(lambda p, u: p + u, params, updates)
    assert sizes[-1] < 0.2 * sizes[0]      # decayed near the end
    np.testing.assert_allclose(sizes[0], 1e-2, rtol=0.2)  # starts at base lr


def test_param_ema_tracking_and_deploy_state():
    """ema_decay > 0 chains track_param_ema: opt_state carries a Polyak
    average of the post-step parameters; deploy_state()/Trainer.eval_state
    substitute it; ema_decay=0 leaves the tree untouched (r5 flat-basin
    stabilizer, training/state.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from delora_tpu.models.odometry import ModelConfig, OdometryModel
    from delora_tpu.training.state import (
        create_train_state, deploy_state, ema_params,
    )

    model = OdometryModel(ModelConfig(
        resnet_outputs=16, blocks_per_stage=(1, 1, 1, 1), channel_divisor=16,
    ))
    imgs = jnp.zeros((2, 16, 64, 4))
    decay = 0.5
    state = create_train_state(
        model, {"learning_rate": 0.1, "ema_decay": decay}, imgs
    )
    assert ema_params(state) is not None

    # EMA starts equal to params.
    p0 = state.params
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(ema_params(state))[0]),
        np.asarray(jax.tree.leaves(p0)[0]),
    )

    grads = jax.tree.map(jnp.ones_like, state.params)
    s1 = state.apply_gradients(grads=grads)
    # Manual expectation: ema1 = decay*p0 + (1-decay)*p1 for every leaf.
    for e, a, b in zip(jax.tree.leaves(ema_params(s1)),
                       jax.tree.leaves(p0), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(
            np.asarray(e), decay * np.asarray(a) + (1 - decay) * np.asarray(b),
            rtol=1e-6, atol=1e-7,
        )

    # deploy_state substitutes the EMA tree; params themselves unchanged.
    d = deploy_state(s1)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(d.params)[0]),
        np.asarray(jax.tree.leaves(ema_params(s1))[0]),
    )

    # Off by default: no EMA in the tree, deploy_state is the identity.
    state_off = create_train_state(model, {"learning_rate": 0.1}, imgs)
    assert ema_params(state_off) is None
    assert deploy_state(state_off) is state_off


def test_param_ema_survives_donated_dispatch():
    """Regression: EmaState.init must COPY the params — aliased leaves made
    the first donated training dispatch fail with 'Attempt to donate the
    same buffer twice' (r5 emaaug arm crash)."""
    import jax
    import jax.numpy as jnp

    from delora_tpu.models.odometry import ModelConfig, OdometryModel
    from delora_tpu.training.state import create_train_state

    model = OdometryModel(ModelConfig(
        resnet_outputs=16, blocks_per_stage=(1, 1, 1, 1), channel_divisor=16,
    ))
    imgs = jnp.zeros((2, 16, 64, 4))
    state = create_train_state(
        model, {"learning_rate": 0.1, "ema_decay": 0.9}, imgs
    )

    @jax.jit
    def step(state):
        grads = jax.tree.map(jnp.ones_like, state.params)
        return state.apply_gradients(grads=grads)

    donated = jax.jit(step, donate_argnums=0)
    state = donated(state)          # would raise on aliased ema buffers
    state = donated(state)
    assert state.step == 2
