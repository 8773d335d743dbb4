"""Train-step tests on synthetic geometry (CPU, tiny shapes)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from delora_tpu import se3
from delora_tpu.losses.icp import IcpLossConfig
from delora_tpu.models.odometry import ModelConfig, OdometryModel
from delora_tpu.ops.normals import NormalsSpec, normals_for_points
from delora_tpu.ops.projection import ProjectionSpec, project_scan
from delora_tpu.training.state import create_train_state
from delora_tpu.training.step import (
    ScanPairBatch,
    StepConfig,
    loss_and_metrics,
    make_infer_step,
    make_train_step,
)

H, W, N, B = 16, 64, 1024, 2

PSPEC = ProjectionSpec(
    height=H, width=W,
    fov_down=np.deg2rad(-24.5), fov_up=np.deg2rad(2.0),
    fov_left=np.deg2rad(-179.9), fov_right=np.deg2rad(179.9),
)
NSPEC = NormalsSpec(patch_v=5, patch_u=7, epsilon_range=5.0, min_neighbors=8)


def synthetic_batch(seed=0, T_true=None):
    """scan_1 = world seen from origin; scan_2 = world seen from pose T_true
    (so the correct prediction maps scan_2 into scan_1's frame)."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(N, 3)).astype(np.float32) * np.array(
        [8.0, 8.0, 0.5], np.float32
    )
    pts[:, 2] -= 1.5
    valid = np.ones(N, dtype=bool)
    if T_true is None:
        T_true = np.asarray(
            se3.transform_from_quat(
                jnp.asarray([0.2, 0.05, 0.0]), jnp.asarray([0.0, 0.0, 0.015, 1.0])
            )
        )
    pts2 = ((pts - T_true[:3, 3]) @ T_true[:3, :3]).astype(np.float32)

    proj1 = project_scan(jnp.asarray(pts), jnp.asarray(valid), PSPEC)
    n1 = np.asarray(normals_for_points(proj1.image[..., :3], proj1, NSPEC))
    n2 = (n1 @ T_true[:3, :3]).astype(np.float32)

    tile = lambda a: jnp.asarray(np.stack([a] * B))
    batch = ScanPairBatch(
        points_1=tile(pts), normals_1=tile(n1), valid_1=tile(valid),
        points_2=tile(pts2), normals_2=tile(n2), valid_2=tile(valid),
    )
    return batch, T_true


def make_model_and_state(**cfg_kw):
    cfg = ModelConfig(resnet_outputs=32, blocks_per_stage=(1, 1, 1, 1),
                      channel_divisor=16, **cfg_kw)
    model = OdometryModel(cfg)
    config = {"learning_rate": 1e-3, "lr_scaling": "none"}
    state = create_train_state(model, config, jnp.zeros((B, H, W, 4)))
    return model, state


def fixed_pose_apply(T, batch_size=B):
    q = np.asarray(se3.rotmat_to_quat(jnp.asarray(T[:3, :3].copy())))
    t = np.asarray(T[:3, 3])
    def apply(params, img1, img2, **kw):
        return (jnp.tile(jnp.asarray(t)[None], (batch_size, 1)),
                jnp.tile(jnp.asarray(q)[None], (batch_size, 1)))
    return apply


@pytest.mark.parametrize("correspondence", ["projective", "image", "brute"])
def test_true_pose_scores_better_than_identity(correspondence):
    batch, T_true = synthetic_batch()
    _, state = make_model_and_state()
    cfg = StepConfig(proj=PSPEC, icp=IcpLossConfig(),
                     correspondence=correspondence)
    rng = jax.random.PRNGKey(0)
    loss_id, (m_id, _) = loss_and_metrics(
        fixed_pose_apply(np.eye(4)), state.params, batch, cfg, rng)
    loss_true, (m_true, _) = loss_and_metrics(
        fixed_pose_apply(T_true), state.params, batch, cfg, rng)
    assert float(loss_true) < float(loss_id)
    assert float(m_true["loss_po2pl"]) < float(m_id["loss_po2pl"])
    assert float(m_id["num_po2pl_pairs"]) > 50


def test_supervised_warmup_converges():
    batch, _ = synthetic_batch()
    model, state = make_model_and_state()
    cfg = StepConfig(proj=PSPEC, icp=IcpLossConfig(), supervised=True)
    step = make_train_step(model, cfg, donate=False)
    losses = []
    for i in range(30):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss_identity"]))
    assert losses[-1] < losses[0] * 0.5, losses[::5]
    assert np.isfinite(losses).all()


def test_unsupervised_step_updates_params_and_is_finite():
    batch, _ = synthetic_batch()
    model, state = make_model_and_state()
    cfg = StepConfig(proj=PSPEC, icp=IcpLossConfig())
    step = make_train_step(model, cfg, donate=False)
    p_before = jax.tree.leaves(state.params)[0].copy()
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss_pc"]))
    assert float(metrics["grad_norm"]) > 0.0
    assert not np.allclose(np.asarray(jax.tree.leaves(state.params)[0]), p_before)
    # Overflow observability (VERDICT r2 item 7): the metric exists and is
    # zero on well-behaved inputs.
    assert float(metrics["placement_overflow_tiles"]) == 0.0


def test_infer_step_shapes_and_so3():
    batch, _ = synthetic_batch()
    model, state = make_model_and_state()
    cfg = StepConfig(proj=PSPEC, icp=IcpLossConfig())
    infer = make_infer_step(model, cfg)
    T = np.asarray(infer(state.params, batch))
    assert T.shape == (B, 4, 4)
    for b in range(B):
        R = T[b, :3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(T[b, 3], [0, 0, 0, 1], atol=1e-6)


def test_augmentation_is_batch_safe_and_rotates():
    batch, _ = synthetic_batch()
    cfg = StepConfig(proj=PSPEC, icp=IcpLossConfig(), augment=True,
                     augment_magnitude_rad=0.5)
    from delora_tpu.training.step import _augment

    p2, n2 = _augment(batch.points_2, batch.normals_2, jax.random.PRNGKey(0), cfg)
    # Norms preserved (pure rotation), but values changed.
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(p2), axis=-1),
        np.linalg.norm(np.asarray(batch.points_2), axis=-1), rtol=1e-4)
    assert not np.allclose(np.asarray(p2), np.asarray(batch.points_2))


def test_normalization_scaling_roundtrip():
    batch, _ = synthetic_batch()
    from delora_tpu.training.step import _pair_normalization

    nb, scale = _pair_normalization(batch)
    # Mean range across both normalized scans ~ 1.
    r1 = np.linalg.norm(np.asarray(nb.points_1), axis=-1)
    m = np.asarray(batch.valid_1)
    assert abs(r1[m].mean() - 1.0) < 0.1
    assert scale.shape == (B,)


def test_image_correspondence_agrees_with_projective_at_true_pose():
    """Image-space (gather-free) matching is the same estimator as the
    per-point projective search up to its two documented differences
    (post-warp pixel collisions, FoV culling) — at the true pose the losses
    must agree closely and be near-zero."""
    batch, T_true = synthetic_batch()
    _, state = make_model_and_state()
    rng = jax.random.PRNGKey(0)
    losses = {}
    for mode in ("projective", "image"):
        cfg = StepConfig(proj=PSPEC, icp=IcpLossConfig(), correspondence=mode)
        loss, (m, _) = loss_and_metrics(
            fixed_pose_apply(T_true), state.params, batch, cfg, rng)
        losses[mode] = float(m["loss_po2pl"])
    assert losses["image"] < 1e-4, losses
    assert abs(losses["image"] - losses["projective"]) < 1e-4, losses


def test_image_correspondence_gradients_flow():
    batch, _ = synthetic_batch()
    model, state = make_model_and_state()
    cfg = StepConfig(proj=PSPEC, icp=IcpLossConfig(), correspondence="image")
    step = make_train_step(model, cfg, donate=False)
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss_pc"]))
    assert float(metrics["grad_norm"]) > 0.0


def test_eval_deterministic_disables_dropout():
    """cfg.deterministic=True turns dropout OFF in the loss forward pass
    (reference bin/run_testing.py:69-71 disables dropout at test time):
    losses become rng-independent, while the training path (deterministic
    False) stays rng-dependent with use_dropout on. Tester.evaluate_losses
    builds its StepConfig with deterministic=True (asserted below)."""
    batch, _ = synthetic_batch()
    model, state = make_model_and_state(use_dropout=True)
    base = StepConfig(proj=PSPEC, icp=IcpLossConfig(), correspondence="image")

    def loss_with(cfg, seed):
        val, _ = loss_and_metrics(
            model.apply, state.params, batch, cfg, jax.random.PRNGKey(seed)
        )
        return float(val)

    det = base._replace(deterministic=True)
    assert loss_with(det, 0) == loss_with(det, 1)
    # Training path: dropout active -> rng changes the loss.
    assert loss_with(base, 0) != loss_with(base, 1)

    # The Tester wires deterministic=True into its loss evaluation.
    import delora_tpu.training.tester as tester_mod

    assert "_replace(deterministic=True)" in open(tester_mod.__file__).read()
