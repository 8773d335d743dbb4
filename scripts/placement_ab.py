"""A/B: placement_backend xla vs pallas on the structured synthetic world.

On real (structured) scans the warped-reprojection windows never overflow,
so the two placements select identical winners and the training metrics
should match bit-for-bit. Runs two short trainings from the same init on the
same data and diffs the per-epoch losses.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")

WORKDIR = "/tmp/delora_place_ab"
EPOCHS = 4
SCANS = 40


def run(backend: str):
    from delora_tpu.config import load_config
    from delora_tpu.data.preprocess import Preprocessor
    from delora_tpu.data.synthetic import write_kitti_layout
    from delora_tpu.utils.cache import enable_persistent_cache
    import glob

    enable_persistent_cache()
    raw = os.path.join(WORKDIR, "raw")
    if not os.path.exists(os.path.join(raw, "sequences", "00")):
        write_kitti_layout(raw, sequence=0, n_scans=SCANS,
                           rings=32, azimuth_steps=900)
    overrides = {
        "datasets": ["kitti"],
        "kitti": {
            "training_identifiers": [0],
            "testing_identifiers": [0],
            "vertical_cells": 32,
            "horizontal_cells": 720,
            "horizontal_cells_preprocessing": 900,
            "max_points": 32768,
            "data_path": os.path.join(raw, "sequences"),
            "preprocessed_path": os.path.join(WORKDIR, "preprocessed"),
            "pose_data_path": os.path.join(raw, "poses"),
        },
        "batch_size": 8,
        "learning_rate": 5e-5,
        "checkpoint_dir": os.path.join(WORKDIR, "ckpt_" + backend),
        "log_dir": os.path.join(WORKDIR, "runs_" + backend),
        "epsilon_range": 1.0,
        "resnet_outputs": 128,
        "layers": [1, 1, 1, 1],
        "factor_fewer_resnet_channels": 4,
        "placement_backend": backend,
    }
    config = load_config(overrides=overrides, mode="preprocessing")
    marker = os.path.join(WORKDIR, "preprocessed", "00", "scans")
    if len(glob.glob(os.path.join(marker, "*.npy"))) < SCANS:
        Preprocessor(config).run_dataset("kitti", progress=False)

    config = load_config(overrides=overrides, mode="training")
    from delora_tpu.training.trainer import Trainer

    trainer = Trainer(config, run_name="ab_" + backend)
    trainer.train(max_epochs=EPOCHS)
    import glob as g
    path = g.glob(os.path.join(WORKDIR, "runs_" + backend,
                               "*", "ab_" + backend, "metrics.jsonl"))[0]
    rows = [json.loads(l) for l in open(path)]
    return [(r.get("loss"), r.get("loss_pc")) for r in rows
            if r.get("loss") is not None]


def main():
    backend = sys.argv[1]
    out = run(backend)
    np.save(f"/tmp/place_ab_{backend}.npy", np.array(out, dtype=np.float64))
    print(backend, out[-3:])


if __name__ == "__main__":
    main()
