#!/usr/bin/env python3
"""Mixed-resolution multi-dataset training: two synthetic sensors with
different image geometries (32x900-preprocessed evaluated at 32x720, and
64x720-preprocessed evaluated at 64x512) trained in ONE run through the
trainer's per-dataset program grouping (SURVEY.md §7 P5; reference
config/config_datasets.yaml sensor blocks), then each sensor's trajectory
evaluated separately.

The reference trains multi-dataset by listing several blocks in
config_datasets.yaml and interleaving their DataLoaders; our trainer groups
batches per dataset so every (dataset, shape) pair compiles exactly one XLA
program. This script is the executable proof that the grouping works
end-to-end: different vertical_cells AND horizontal_cells per dataset in the
same training run, one shared model (shape-polymorphic CNN over circular
padding), two trajectory metrics out.

Usage: python scripts/multires_experiment.py [workdir] [--epochs N]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, ".")

SENSORS = {
    "synth_a": dict(rings=32, azimuth=900, horizontal_cells=720, seed=0),
    "synth_b": dict(rings=64, azimuth=720, horizontal_cells=512, seed=7),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="/tmp/delora_multires")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--scans", type=int, default=400)
    ap.add_argument("--step", type=float, default=0.8)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--prep-only", action="store_true",
                    help="generate + preprocess both sensors, then exit")
    args = ap.parse_args()

    from delora_tpu.config import load_config
    from delora_tpu.data.preprocess import Preprocessor
    from delora_tpu.data.synthetic import write_kitti_layout
    from delora_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    os.makedirs(args.workdir, exist_ok=True)

    overrides = {
        "datasets": list(SENSORS),
        "batch_size": args.batch_size,
        "learning_rate": args.lr,
        "checkpoint_dir": os.path.join(args.workdir, "ckpt"),
        "log_dir": os.path.join(args.workdir, "runs"),
        "epsilon_range": 1.0,
        # The r19 estimator recipe (docs/results/README.md): wide window for
        # the 0.8 m/scan vertical pixel shift, trim, small-angle augment,
        # down-weighted pl2pl.
        "projective_window": [9, 17],
        "po2pl_trim_distance": 1.0,
        "random_point_cloud_rotations": True,
        "magnitude_random_rot": 2.0,
        "lambda_pl2pl": 0.1,
    }
    for name, s in SENSORS.items():
        raw = os.path.join(args.workdir, name, "raw")
        if not os.path.exists(os.path.join(raw, "sequences", "00")):
            print(f"[multires] generating {name} "
                  f"({s['rings']}x{s['azimuth']}) ...")
            write_kitti_layout(raw, sequence=0, n_scans=args.scans,
                               rings=s["rings"], azimuth_steps=s["azimuth"],
                               step=args.step, seed=s["seed"], yawed=True)
        overrides[name] = {
            "training_identifiers": [0],
            "testing_identifiers": [0],
            "vertical_field_of_view": [-24.5, 2.0],   # simulate_scan v_fov
            "vertical_cells": s["rings"],
            "horizontal_cells": s["horizontal_cells"],
            "horizontal_cells_preprocessing": s["azimuth"],
            "neighborhood_side_length": [7, 11],
            "max_points": 32768,
            "data_path": os.path.join(raw, "sequences"),
            "preprocessed_path": os.path.join(args.workdir, name,
                                              "preprocessed"),
            "pose_data_path": os.path.join(raw, "poses"),
            "dataset_type": "kitti",
        }

    import glob

    config = load_config(overrides=overrides, mode="preprocessing")
    for name in SENSORS:
        marker = os.path.join(args.workdir, name, "preprocessed", "00",
                              "scans")
        if len(glob.glob(os.path.join(marker, "*.npy"))) < args.scans:
            print(f"[multires] preprocessing {name} ...")
            Preprocessor(config).run_dataset(name, progress=True)

    if args.prep_only:
        print("[multires] prep-only: both sensors ready at", args.workdir)
        return

    from delora_tpu.training.tester import Tester
    from delora_tpu.training.trainer import Trainer

    config = load_config(overrides=overrides, mode="training")
    trainer = Trainer(config, run_name="multires")
    trainer.train(max_epochs=args.epochs)

    config_t = load_config(overrides=overrides, mode="testing")
    tester = Tester(config_t, state=trainer.state, run_name="multires_eval")
    results = tester.test()
    print("[multires] results (final epoch):", results)

    from delora_tpu.data.pose_data import load_kitti_poses
    from delora_tpu.utils import poses as P

    for name in SENSORS:
        gt = load_kitti_poses(config_t, name, 0)
        ident = np.tile(np.eye(4), (len(gt), 1, 1))
        base = P.kitti_benchmark_summary(gt, ident)
        if base is None:
            base = P.relative_pose_errors_summary(gt, ident)
        print(f"[multires] {name} identity baseline: {base}")


if __name__ == "__main__":
    main()
