"""A/B: augment-on training through the fullcached feed (rotates cached
survivors — the fast default, with the documented dedup-loser deviation)
vs the cached-target feed (rotates the raw cloud — deviation-free).

Measures what the per-step deviation numbers (tests/test_fullcached.py::
test_fullcached_augment_deviation_quantified_at_density: ~6% coverage loss,
~40% same-surface winner swaps) actually do to TRAINING: two runs from the
same init on the same structured world, augment ON, then trajectory RPE of
each against ground truth.

Usage: python scripts/augment_ab.py full|cached   (one arm per process —
TPU grant is single-process) then python scripts/augment_ab.py report
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")

WORKDIR = "/tmp/delora_augment_ab"
EPOCHS = 16
SCANS = 60


def overrides_for(arm: str) -> dict:
    return {
        "datasets": ["kitti"],
        "kitti": {
            "training_identifiers": [0],
            "testing_identifiers": [0],
            "vertical_cells": 32,
            "horizontal_cells": 720,
            "horizontal_cells_preprocessing": 900,
            "max_points": 32768,
            "data_path": os.path.join(WORKDIR, "raw", "sequences"),
            "preprocessed_path": os.path.join(WORKDIR, "preprocessed"),
            "pose_data_path": os.path.join(WORKDIR, "raw", "poses"),
        },
        "batch_size": 8,
        "learning_rate": 5e-5,
        "checkpoint_dir": os.path.join(WORKDIR, "ckpt_" + arm),
        "log_dir": os.path.join(WORKDIR, "runs_" + arm),
        "epsilon_range": 1.0,
        # Augment ON — the knob under test.
        "random_point_cloud_rotations": True,
        "cache_source_projections": arm == "full",
    }


def run(arm: str):
    import glob

    from delora_tpu.config import load_config
    from delora_tpu.data.preprocess import Preprocessor
    from delora_tpu.data.synthetic import write_kitti_layout
    from delora_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    raw = os.path.join(WORKDIR, "raw")
    if not os.path.exists(os.path.join(raw, "sequences", "00")):
        write_kitti_layout(raw, sequence=0, n_scans=SCANS,
                           rings=32, azimuth_steps=900)
    overrides = overrides_for(arm)
    config = load_config(overrides=overrides, mode="preprocessing")
    marker = os.path.join(WORKDIR, "preprocessed", "00", "scans")
    if len(glob.glob(os.path.join(marker, "*.npy"))) < SCANS:
        Preprocessor(config).run_dataset("kitti", progress=False)

    config = load_config(overrides=overrides, mode="training")
    from delora_tpu.training.trainer import Trainer

    trainer = Trainer(config, run_name="ab_" + arm)
    assert trainer.feed == ("full" if arm == "full" else "cached"), trainer.feed
    trainer.train(max_epochs=EPOCHS)

    config_t = load_config(overrides=overrides, mode="testing")
    from delora_tpu.training.tester import Tester

    tester = Tester(config_t, state=trainer.state, run_name="ab_eval_" + arm)
    results = tester.test()
    rpe = results["kitti"][0]
    out = {"arm": arm, "feed": trainer.feed,
           "rpe_trans_m": rpe[0], "rpe_rot_deg": rpe[1]}
    with open(f"/tmp/augment_ab_{arm}.json", "w") as f:
        json.dump(out, f)
    print(json.dumps(out))


def report():
    rows = [json.load(open(f"/tmp/augment_ab_{a}.json"))
            for a in ("full", "cached")]
    print(json.dumps({
        "full": rows[0], "cached": rows[1],
        "rpe_trans_ratio_full_over_cached": round(
            rows[0]["rpe_trans_m"] / rows[1]["rpe_trans_m"], 3),
        "rpe_rot_ratio_full_over_cached": round(
            rows[0]["rpe_rot_deg"] / rows[1]["rpe_rot_deg"], 3),
    }, indent=1))


if __name__ == "__main__":
    if sys.argv[1] == "report":
        report()
    else:
        run(sys.argv[1])
