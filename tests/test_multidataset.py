"""Multi-dataset training: different sensors (image shapes, point caps) in one
run — batches group per dataset, one compiled step per dataset (the reference
only supports one shape per run, hyperparameters.yaml:3 comment)."""

import numpy as np

from delora_tpu.config import load_config
from tests.test_data import write_synthetic_preprocessed


def two_dataset_config(tmp_path):
    write_synthetic_preprocessed(str(tmp_path / "a"), sequences=(0,),
                                 scans_per_seq=5, points=300)
    write_synthetic_preprocessed(str(tmp_path / "b"), sequences=(0,),
                                 scans_per_seq=5, points=200, seed=9)
    return load_config(overrides={
        "datasets": ["kitti", "darpa"],
        "kitti": {
            "training_identifiers": [0], "testing_identifiers": [0],
            "vertical_cells": 16, "horizontal_cells": 64, "max_points": 512,
            "preprocessed_path": str(tmp_path / "a"),
        },
        "darpa": {
            "training_identifiers": [0], "testing_identifiers": [0],
            "vertical_cells": 8, "horizontal_cells": 32, "max_points": 256,
            "preprocessed_path": str(tmp_path / "b"),
        },
        "batch_size": 2,
        "learning_rate": 1e-4,
        "resnet_outputs": 16,
        "layers": [1, 1, 1, 1],
        "factor_fewer_resnet_channels": 32,
        "compute_dtype": "float32",
        "checkpoint_dir": str(tmp_path / "ckpt"),
        "log_dir": str(tmp_path / "runs"),
        "visualize_images": False,
    })


def test_trains_over_both_datasets(tmp_path):
    config = two_dataset_config(tmp_path)
    from delora_tpu.training.trainer import Trainer

    trainer = Trainer(config, run_name="multi")
    metrics = trainer.train_epoch(0)
    # 4 pairs per dataset / batch 2 -> 2 steps each -> 4 total.
    assert metrics["steps"] == 4
    assert np.isfinite(metrics["loss"])
    # Two separate compiled steps, one per dataset shape.
    assert len(trainer._steps) == 2


def test_model_is_shape_polymorphic(tmp_path):
    """The same params run on both datasets' image shapes (global pooling
    makes the trunk resolution-agnostic)."""
    config = two_dataset_config(tmp_path)
    import jax
    import jax.numpy as jnp

    from delora_tpu.models.odometry import ModelConfig, OdometryModel

    model = OdometryModel(ModelConfig.from_config(config))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 64, 4)),
                        jnp.zeros((1, 16, 64, 4)))
    t1, q1 = model.apply(params, jnp.ones((1, 16, 64, 4)),
                         jnp.ones((1, 16, 64, 4)))
    t2, q2 = model.apply(params, jnp.ones((1, 8, 32, 4)),
                         jnp.ones((1, 8, 32, 4)))
    assert t1.shape == t2.shape == (1, 3)
    assert np.isfinite(np.asarray(q2)).all()
