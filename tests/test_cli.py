"""CLI surface tests: arg parsing, override plumbing, checkpoint-config
rehydration, preprocess command end-to-end via a subprocess."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from delora_tpu.cli import _build_config, _parse_overrides


class _Args:
    def __init__(self, overrides=None, config=None, checkpoint=None):
        self.overrides = overrides or []
        self.config = config
        self.checkpoint = checkpoint


def test_parse_overrides_json_and_strings():
    out = _parse_overrides([
        "batch_size=64", 'datasets=["kitti"]', "learning_rate=0.001",
        "activation_fct=relu", "flag=true",
    ])
    assert out["batch_size"] == 64
    assert out["datasets"] == ["kitti"]
    assert out["learning_rate"] == 0.001
    assert out["activation_fct"] == "relu"
    assert out["flag"] is True


def test_build_config_applies_mode_and_overrides():
    cfg = _build_config(_Args(overrides=["batch_size=4"]), "testing")
    assert cfg["batch_size"] == 4
    assert cfg["mode"] == "testing"
    assert cfg["kitti"]["data_identifiers"] == [9, 10]


def test_build_config_rejects_bad_values():
    with pytest.raises(ValueError):
        _build_config(_Args(overrides=["activation_fct=selu"]), "training")


def test_checkpoint_config_rehydration(tmp_path):
    """Resume restores the config embedded in the checkpoint, then applies
    CLI overrides on top (reference run_training.py:47-55 contract)."""
    import jax.numpy as jnp

    from delora_tpu.models.odometry import ModelConfig, OdometryModel
    from delora_tpu.training.checkpoint import CheckpointManager
    from delora_tpu.training.state import create_train_state

    model = OdometryModel(ModelConfig(resnet_outputs=16,
                                      blocks_per_stage=(1, 1, 1, 1),
                                      channel_divisor=32))
    state = create_train_state(model, {"learning_rate": 1e-3},
                               jnp.zeros((1, 16, 32, 4)))
    mgr = CheckpointManager(str(tmp_path), keep_every=1)
    mgr.save(state, epoch=7, loss=0.5,
             config={"batch_size": 99, "activation_fct": "relu"})

    cfg = _build_config(
        _Args(overrides=["learning_rate=0.123"],
              checkpoint=str(tmp_path / "latest")),
        "training",
    )
    assert cfg["batch_size"] == 99            # from embedded config
    assert cfg["activation_fct"] == "relu"    # from embedded config
    assert cfg["learning_rate"] == 0.123      # CLI override wins
    assert cfg["checkpoint"] == str(tmp_path / "latest")


def test_preprocess_command_subprocess(tmp_path):
    """Drive `python -m delora_tpu.cli preprocess` end to end."""
    from tests.test_e2e import synthesize_kitti_sequence

    synthesize_kitti_sequence(str(tmp_path / "raw"), n_scans=3, n_points=800)
    overrides = {
        "datasets": ["kitti"],
        "kitti": {
            "training_identifiers": [0], "testing_identifiers": [0],
            "vertical_cells": 16, "horizontal_cells": 64,
            "horizontal_cells_preprocessing": 64, "max_points": 1024,
            "neighborhood_side_length": [5, 7],
            "data_path": str(tmp_path / "raw"),
            "preprocessed_path": str(tmp_path / "pre"),
            "pose_data_path": None,
        },
    }
    args = ["--set"] + [f"{k}={json.dumps(v)}" for k, v in overrides.items()]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c",
         "import sys, jax; jax.config.update('jax_platforms','cpu');"
         "sys.argv = ['delora', 'preprocess'] + sys.argv[1:];"
         "from delora_tpu.cli import main; main()",
         *args],
        capture_output=True, text=True, timeout=300, cwd=repo,
        env={**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": repo},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    scans = os.listdir(str(tmp_path / "pre" / "00" / "scans"))
    assert len(scans) == 3
    s = np.load(str(tmp_path / "pre" / "00" / "scans" / scans[0]))
    assert s.shape[1] == 3


def test_export_torch_command(tmp_path):
    """`delora export-torch` turns an Orbax checkpoint into a torch .pth that
    round-trips through the importer (both migration directions)."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from delora_tpu.cli import cmd_export_torch
    from delora_tpu.models.odometry import ModelConfig, OdometryModel
    from delora_tpu.training.checkpoint import CheckpointManager
    from delora_tpu.training.state import create_train_state
    from delora_tpu.utils.torch_import import torch_state_dict_to_params

    small = {
        "resnet_outputs": 16, "layers": [1, 1, 1, 1],
        "factor_fewer_resnet_channels": 32,
        "kitti": {"vertical_cells": 16, "horizontal_cells": 64},
        "datasets": ["kitti"],
    }
    model = OdometryModel(ModelConfig(resnet_outputs=16,
                                      blocks_per_stage=(1, 1, 1, 1),
                                      channel_divisor=32))
    state = create_train_state(model, {"learning_rate": 1e-3},
                               jnp.zeros((1, 16, 64, 4)))
    mgr = CheckpointManager(str(tmp_path), keep_every=1)
    mgr.save(state, epoch=3, loss=0.25, config=small)

    class A(_Args):
        out = str(tmp_path / "export.pth")

    cmd_export_torch(A(checkpoint=str(tmp_path / "latest")))

    ckpt = torch.load(A.out, map_location="cpu", weights_only=False)
    assert ckpt["epoch"] == 3
    back = torch_state_dict_to_params(
        ckpt["model_state_dict"], blocks_per_stage=(1, 1, 1, 1)
    )
    orig = jax.tree.leaves(state.params)
    rt = jax.tree.leaves(back)
    assert len(orig) == len(rt)
    for a, b in zip(orig, rt):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
