import numpy as np

import jax
import jax.numpy as jnp

from delora_tpu.models.odometry import ModelConfig, OdometryModel


def small_cfg(**kw):
    base = dict(
        resnet_outputs=64,
        blocks_per_stage=(1, 1, 1, 1),
        channel_divisor=8,
        activation="tanh",
        compute_dtype=jnp.float32,
    )
    base.update(kw)
    return ModelConfig(**base)


def init_and_apply(cfg, H=16, W=64, B=2, seed=0):
    model = OdometryModel(cfg)
    rng = jax.random.PRNGKey(seed)
    img1 = jax.random.normal(rng, (B, H, W, 4))
    img2 = jax.random.normal(jax.random.PRNGKey(seed + 1), (B, H, W, 4))
    params = model.init(rng, img1, img2)
    t, q = model.apply(params, img1, img2)
    return model, params, (img1, img2), (t, q)


def test_output_shapes_and_unit_quaternion():
    _, _, _, (t, q) = init_and_apply(small_cfg())
    assert t.shape == (2, 3) and q.shape == (2, 4)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q), axis=-1), 1.0, atol=1e-5)


def test_global_quaternion_normalization_mode():
    _, _, _, (_, q) = init_and_apply(small_cfg(quaternion_normalization="global"))
    # Whole-tensor norm == 1 (reference model.py:114), rows individually < 1.
    assert np.isclose(np.linalg.norm(np.asarray(q)), 1.0, atol=1e-5)


def test_azimuth_shift_equivariance():
    """Circular width padding: rolling the input along azimuth must produce
    (nearly) the same pose output — the net is azimuth-translation covariant
    up to striding alignment. Roll by the total width stride (32x)."""
    cfg = small_cfg()
    model, params, (img1, img2), (t, q) = init_and_apply(cfg, W=128)
    shift = 32  # total width downsampling factor = 2^5
    t2, q2 = model.apply(
        params, jnp.roll(img1, shift, axis=2), jnp.roll(img2, shift, axis=2)
    )
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t), atol=1e-4)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-4)


def test_param_count_full_model():
    """Full-size config must land near the reference's ~11.9M trainable params
    (142.5 MB checkpoint = fp32 model + 2 Adam moments -> ~11.9M params;
    torchvision ResNet-18 trunk is 11.7M)."""
    cfg = ModelConfig()
    model = OdometryModel(cfg)
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, 64, 720, 4))
    params = jax.eval_shape(lambda: model.init(rng, img, img))
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    assert 11_000_000 < n < 12_500_000, n


def test_single_mlp_head():
    _, _, _, (t, q) = init_and_apply(small_cfg(use_single_mlp=True))
    assert t.shape == (2, 3) and q.shape == (2, 4)


def test_pre_feature_extraction():
    _, _, _, (t, q) = init_and_apply(small_cfg(pre_feature_extraction=True))
    assert t.shape == (2, 3) and q.shape == (2, 4)


def test_relu_variant_and_jit():
    cfg = small_cfg(activation="relu")
    model = OdometryModel(cfg)
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (1, 16, 64, 4))
    params = model.init(rng, img, img)
    fn = jax.jit(lambda p, a, b: model.apply(p, a, b))
    t, q = fn(params, img, img)
    assert np.isfinite(np.asarray(t)).all() and np.isfinite(np.asarray(q)).all()


def test_dropout_determinism_flag():
    cfg = small_cfg(use_dropout=True)
    model = OdometryModel(cfg)
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (1, 16, 64, 4))
    params = model.init(rng, img, img)
    t1, _ = model.apply(params, img, img, deterministic=True)
    t2, _ = model.apply(params, img, img, deterministic=True)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2))
    t3, _ = model.apply(params, img, img, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(7)})
    assert not np.allclose(np.asarray(t1), np.asarray(t3))


def test_remat_model_matches_non_remat():
    """remat=True (pod configs) is a pure memory/FLOPs tradeoff: outputs and
    gradients are identical to the non-remat model."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from delora_tpu.models.odometry import ModelConfig, OdometryModel

    kw = dict(resnet_outputs=32, blocks_per_stage=(1, 1, 1, 1),
              channel_divisor=16)
    m0 = OdometryModel(ModelConfig(**kw))
    m1 = OdometryModel(ModelConfig(remat=True, **kw))
    rng = np.random.default_rng(5)
    img1 = jnp.asarray(rng.normal(size=(2, 16, 64, 4)).astype(np.float32))
    img2 = jnp.asarray(rng.normal(size=(2, 16, 64, 4)).astype(np.float32))
    params = m0.init(jax.random.PRNGKey(0), img1, img2)

    def loss(model, p):
        t, q = model.apply(p, img1, img2)
        return jnp.sum(t ** 2) + jnp.sum(q ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss(m0, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(params)
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stage_width_multipliers():
    """resnet_stage_width_multipliers scales per-stage conv widths (TPU MXU
    lane-fill capacity knob — docs/BENCH_NOTES.md r5 conv experiment) while
    the default (1,1,1,1) keeps the reference-compatible param tree."""
    cfg = small_cfg(stage_width_multipliers=(2.0, 1.0, 1.0, 1.0))
    _, params, _, (t, q) = init_and_apply(cfg)
    assert t.shape == (2, 3) and q.shape == (2, 4)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    # channel_divisor=8 -> base stage-1 width 8; multiplier 2 -> 16.
    stem_kernels = [
        v.shape for p, v in flat
        if "BasicBlock_0" in str(p) and v.ndim == 4
    ]
    assert any(s[-1] == 16 for s in stem_kernels), stem_kernels

    # Default multipliers reproduce the original widths exactly.
    base = small_cfg()
    _, params_base, _, _ = init_and_apply(base)
    shapes = jax.tree.map(lambda v: v.shape, params_base)
    _, params_one, _, _ = init_and_apply(
        small_cfg(stage_width_multipliers=(1.0, 1.0, 1.0, 1.0))
    )
    assert shapes == jax.tree.map(lambda v: v.shape, params_one)
