"""Evaluation against ground truth on a simulated world: t_rel metric,
per-axis error plots, and the tester's loss-evaluation path
(inference_only=False)."""

import os

import numpy as np
import pytest

from delora_tpu.config import load_config
from delora_tpu.data.synthetic import write_kitti_layout


@pytest.fixture(scope="module")
def gt_world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("gtworld")
    # Long enough to pass the 100 m minimum subsequence: 130 scans x 1.0 m.
    write_kitti_layout(str(tmp / "raw"), n_scans=130, rings=12,
                       azimuth_steps=180, step=1.0)
    config = load_config(overrides={
        "datasets": ["kitti"],
        "kitti": {
            "training_identifiers": [0], "testing_identifiers": [0],
            "vertical_cells": 12, "horizontal_cells": 90,
            "horizontal_cells_preprocessing": 180,
            "max_points": 2048, "neighborhood_side_length": [5, 7],
            "data_path": str(tmp / "raw" / "sequences"),
            "preprocessed_path": str(tmp / "pre"),
            "pose_data_path": str(tmp / "raw" / "poses"),
        },
        "batch_size": 4,
        "resnet_outputs": 16,
        "layers": [1, 1, 1, 1],
        "factor_fewer_resnet_channels": 32,
        "compute_dtype": "float32",
        "log_dir": str(tmp / "runs"),
        "epsilon_range": 1.0,
        "inference_only": False,
    }, mode="testing")
    from delora_tpu.data.preprocess import Preprocessor

    Preprocessor(config).run_dataset("kitti", progress=False)
    return tmp, config


def test_tester_reports_metric_losses_and_plots(gt_world):
    tmp, config = gt_world
    import jax.numpy as jnp

    from delora_tpu.models.odometry import ModelConfig, OdometryModel
    from delora_tpu.training.state import create_train_state
    from delora_tpu.training.tester import Tester

    model = OdometryModel(ModelConfig.from_config(config))
    state = create_train_state(model, config, jnp.zeros((4, 12, 90, 4)))
    tester = Tester(config, state=state, run_name="gt_eval")
    results = tester.test()

    # Ground truth exists and the trajectory is > 100 m -> a t_rel number.
    metrics = results["kitti"][0]
    assert metrics is not None
    t_rel, r_rel = metrics
    assert 0.0 < t_rel < 500.0          # untrained model: bad but finite
    assert r_rel >= 0.0

    art = str(tmp / "runs" / config["experiment"] / "gt_eval" / "artifacts")
    assert os.path.exists(os.path.join(art, "map_kitti_00_2d.png"))
    assert os.path.exists(os.path.join(art, "map_kitti_00_y.png"))
    assert os.path.exists(os.path.join(art, "trans_rot_kitti_00.png"))


def test_identity_odometry_baseline_metric(gt_world):
    """The identity-odometry t_rel on a 1 m/scan forward drive must be ~100%
    (predicting zero motion misses all of it) — metric sanity anchor."""
    tmp, config = gt_world
    from delora_tpu.data.pose_data import load_kitti_poses
    from delora_tpu.utils import poses as P

    gt = load_kitti_poses(config, "kitti", 0)
    ident = np.tile(np.eye(4), (len(gt), 1, 1))
    t_rel, r_rel = P.kitti_benchmark_summary(gt, ident)
    assert 80.0 < t_rel <= 110.0


def test_cached_eval_matches_uncached(gt_world):
    """predict_sequence via host-cached per-scan images == full in-step
    projection (the host projection is bit-parity-tested, so the model sees
    identical inputs either way).

    The rotation-head bias is pinned to (0,0,0,1): an untrained head emits
    near-ZERO raw quaternions, whose per-row normalization amplifies
    compile-order float noise (the two paths are different XLA programs)
    into degree-scale rotation differences — a property of normalizing a
    ~0 vector, not of the eval paths. A non-degenerate quaternion scale
    makes the comparison meaningful and tight."""
    import jax
    import jax.numpy as jnp

    from delora_tpu.models.odometry import ModelConfig, OdometryModel
    from delora_tpu.training.state import create_train_state
    from delora_tpu.training.tester import Tester

    tmp, config = gt_world
    model = OdometryModel(ModelConfig.from_config(config))
    spec = config["kitti"]
    state = create_train_state(
        model, config,
        jnp.zeros((4, spec["vertical_cells"], spec["horizontal_cells"], 4)),
    )
    params = jax.tree_util.tree_map(lambda x: x, state.params)  # shallow copy
    mlp = params["params"]["_Mlp_0"]
    last = sorted(k for k in mlp if k.startswith("Dense"))[-1]
    mlp[last]["bias"] = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    state = state.replace(params=params)

    cfg_a = dict(config)
    cfg_a["cache_target_projections"] = True
    cfg_b = dict(config)
    cfg_b["cache_target_projections"] = False
    tester_a = Tester(cfg_a, state=state, run_name="ca")
    rel_a = tester_a.predict_sequence("kitti", 0)
    rel_b = Tester(cfg_b, state=state, run_name="cb").predict_sequence("kitti", 0)

    # (a) The cached path IS the plain forward on the cached images — exact:
    # pins the tester's pair->scan indexing and batching.
    from delora_tpu.training.step import forward_pose

    ds = tester_a._dataset("kitti")
    for k in (0, 57, len(rel_a) - 1):
        img1 = jnp.asarray(ds._scan_artifacts(0, k).image)[None]
        img2 = jnp.asarray(ds._scan_artifacts(0, k + 1).image)[None]
        T = np.asarray(forward_pose(model.apply, state.params, img1, img2))[0]
        np.testing.assert_allclose(rel_a[k], T, rtol=1e-5, atol=1e-6)

    # (b) Cached vs uncached agree up to cross-XLA-program float noise: the
    # two paths are DIFFERENT compiled programs (with/without in-step
    # projection), whose conv reduction orders differ; on an untrained net
    # fed unnormalized ~70 m ranges that noise reaches ~1e-2 in T. The
    # images themselves are bit-parity-tested in tests/test_cached_target.py.
    np.testing.assert_allclose(rel_a, rel_b, atol=0.05)


def test_trainer_in_training_eval_retains_best(gt_world):
    """eval_every_epochs: the Trainer runs the Tester's trajectory metric on
    the TESTING identifiers during training and retains the best state as a
    'best/' checkpoint (in-training validation — the reference evaluates
    offline only, reference src/deploy/tester.py:109)."""
    import jax.numpy as jnp

    from delora_tpu.config import load_config
    from delora_tpu.training.trainer import Trainer

    tmp, base = gt_world
    config = load_config(overrides={
        "datasets": ["kitti"],
        "kitti": dict(base["kitti"]),
        "batch_size": 4,
        "learning_rate": 1e-4,
        "resnet_outputs": 16,
        "layers": [1, 1, 1, 1],
        "factor_fewer_resnet_channels": 32,
        "compute_dtype": "float32",
        "checkpoint_dir": str(tmp / "ckpt_eval"),
        "log_dir": str(tmp / "runs"),
        "epsilon_range": 1.0,
        "unsupervised_at_start": True,   # eval gates on unsupervised phase
        "eval_every_epochs": 1,
        "visualize_images": False,
        "inference_only": True,
    }, mode="training")

    trainer = Trainer(config, run_name="eval_train")
    trainer.train(max_epochs=2)

    # Both epochs evaluated; the best (lowest) score was retained.
    assert trainer.best_eval is not None
    score, epoch = trainer.best_eval
    assert np.isfinite(score) and epoch in (0, 1)
    assert os.path.exists(str(tmp / "ckpt_eval" / "best"))
    import json

    with open(str(tmp / "ckpt_eval" / "best_meta.json")) as f:
        meta = json.load(f)
    assert meta["epoch"] == epoch
    assert meta["eval_score"] == pytest.approx(score)

    # The best checkpoint restores into a usable state.
    restored, rmeta = trainer.ckpt.restore(trainer.state, "best")
    assert int(rmeta["epoch"]) == epoch
    leaves = [np.asarray(x) for x in
              __import__("jax").tree_util.tree_leaves(restored.params)]
    assert all(np.isfinite(leaf).all() for leaf in leaves)

    # eval_score was logged to the metrics stream.
    metrics_file = str(tmp / "runs" / config["experiment"] / "eval_train" /
                      "metrics.jsonl")
    logged = [json.loads(line) for line in open(metrics_file)]
    assert any("eval_score" in row for row in logged)
