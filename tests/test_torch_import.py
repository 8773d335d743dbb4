"""Torch checkpoint importer tests.

Numerical parity of the conversion conventions (layout transposes, padding
semantics) is validated against torch primitives directly; the full reference
model is NOT reimplemented here (no code copying) — structure compatibility is
checked against a synthetically-named state_dict matching the reference's
module names (reference src/models/model.py:74-87, resnet_modified.py:40-62).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from delora_tpu.models.odometry import ModelConfig, OdometryModel  # noqa: E402
from delora_tpu.models.resnet import ConvCirc  # noqa: E402
from delora_tpu.utils.torch_import import torch_state_dict_to_params  # noqa: E402


def reference_shaped_state_dict(seed=0):
    """Random tensors under the reference's exact parameter names/shapes."""
    g = torch.Generator().manual_seed(seed)
    sd = {}
    rnd = lambda *s: torch.randn(*s, generator=g)
    sd["resnet.conv1.weight"] = rnd(64, 8, 3, 3)
    widths = [64, 128, 256, 512]
    inpl = 64
    for stage in range(4):
        w = widths[stage]
        for block in range(2):
            p = f"resnet.layer{stage + 1}.{block}"
            cin = inpl if block == 0 else w
            sd[f"{p}.conv1.weight"] = rnd(w, cin, 3, 3)
            sd[f"{p}.conv2.weight"] = rnd(w, w, 3, 3)
            if block == 0 and (stage > 0):
                sd[f"{p}.downsample.0.weight"] = rnd(w, inpl, 1, 1)
        inpl = w
    sd["resnet.fc.weight"] = rnd(1000, 512)
    sd["resnet.fc.bias"] = rnd(1000)
    for name, out in (("rotation", 4), ("translation", 3)):
        sd[f"fully_connected_{name}.1.weight"] = rnd(100, 1000)
        sd[f"fully_connected_{name}.1.bias"] = rnd(100)
        sd[f"fully_connected_{name}.3.weight"] = rnd(out, 100)
        sd[f"fully_connected_{name}.3.bias"] = rnd(out)
    return sd


def test_imported_tree_matches_model_init_structure():
    sd = reference_shaped_state_dict()
    imported = torch_state_dict_to_params(sd)

    model = OdometryModel(ModelConfig())
    expected = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 720, 4)), jnp.zeros((1, 64, 720, 4))
        )
    )
    exp_paths = {
        jax.tree_util.keystr(p): l.shape
        for p, l in jax.tree_util.tree_leaves_with_path(expected)
    }
    got_paths = {
        jax.tree_util.keystr(p): np.asarray(l).shape
        for p, l in jax.tree_util.tree_leaves_with_path(imported)
    }
    assert exp_paths == got_paths


def test_conv_conversion_matches_torch_semantics():
    """Our circular-pad VALID conv with an imported OIHW kernel must equal
    torch's F.pad(mode='circular' on W, zero on H) + conv2d — the exact
    composition used by the reference (resnet_modified.py:97-98)."""
    g = torch.Generator().manual_seed(1)
    w_t = torch.randn(8, 5, 3, 3, generator=g)
    x_t = torch.randn(2, 5, 10, 16, generator=g)  # NCHW

    xp = torch.nn.functional.pad(x_t, (1, 1, 0, 0), mode="circular")
    ref = torch.nn.functional.conv2d(xp, w_t, stride=(1, 2), padding=(1, 0))

    from delora_tpu.models.resnet import pad_circular_w
    import flax.linen as nn

    x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))  # NHWC
    kernel = jnp.asarray(w_t.numpy().transpose(2, 3, 1, 0))  # HWIO

    conv = ConvCirc(features=8, strides=(1, 2))
    params = conv.init(jax.random.PRNGKey(0), x_j)
    params = jax.tree.map(lambda _: kernel, params)
    out = conv.apply(params, x_j)

    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref.numpy(), atol=1e-4
    )


def test_linear_conversion_matches_torch():
    g = torch.Generator().manual_seed(2)
    w = torch.randn(7, 13, generator=g)
    b = torch.randn(7, generator=g)
    x = torch.randn(4, 13, generator=g)
    ref = torch.nn.functional.linear(x, w, b).numpy()
    from delora_tpu.utils.torch_import import _linear

    ours = np.asarray(x.numpy() @ _linear(w.numpy()) + b.numpy())
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_import_loads_into_model_and_runs():
    sd = reference_shaped_state_dict(seed=3)
    params = torch_state_dict_to_params(sd)
    params = jax.tree.map(jnp.asarray, params)
    model = OdometryModel(ModelConfig())
    t, q = model.apply(params, jnp.ones((1, 32, 128, 4)) * 0.1,
                       jnp.ones((1, 32, 128, 4)) * 0.2)
    assert np.isfinite(np.asarray(t)).all() and np.isfinite(np.asarray(q)).all()


def test_export_roundtrip_state_dict():
    """params -> torch state_dict -> params is the identity (both MLP modes)."""
    from delora_tpu.utils.torch_import import params_to_torch_state_dict

    sd = reference_shaped_state_dict(seed=4)
    params = torch_state_dict_to_params(sd)
    back = params_to_torch_state_dict(params)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k].numpy())


def test_save_reference_checkpoint_loads_in_torch(tmp_path):
    """Exported .pth is a reference-layout dict readable by plain torch.load
    (the contract reference src/deploy/tester.py:21-27 consumes)."""
    from delora_tpu.utils.torch_import import save_reference_checkpoint

    sd = reference_shaped_state_dict(seed=5)
    params = torch_state_dict_to_params(sd)
    path = str(tmp_path / "export.pth")
    save_reference_checkpoint(path, params, config={"device": "cpu"},
                              epoch=7, loss=0.125)
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert ckpt["epoch"] == 7 and ckpt["loss"] == 0.125
    assert ckpt["parameters"] == {"device": "cpu"}
    for k in sd:
        np.testing.assert_array_equal(
            ckpt["model_state_dict"][k].numpy(), sd[k].numpy()
        )
