#!/usr/bin/env python3
"""Mixed-resolution multi-dataset convergence experiment (SURVEY §7 P5).

Two synthetic sensors with different image shapes — a 32-ring scanner
preprocessed at 900 azimuth cells trained at 32x720, and a 64-ring scanner
preprocessed at 720 cells trained at 64x576 — drive THROUGH ONE TRAINING RUN
via the per-dataset program grouping (training/trainer.py: one compiled step
per dataset shape, shared shape-polymorphic model), then BOTH trajectories
are evaluated. The reference supports exactly one sensor shape per run
(reference config/hyperparameters.yaml:3 batch comment + per-run dataset
choice); this is the multi-sensor story a fleet operator actually needs.

Usage: python scripts/synth_multires.py [workdir] [--epochs N] [...]
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, ".")

SENSORS = {
    # name -> (rings, azimuth_preprocessing, horizontal_cells_training)
    "kitti": (32, 900, 720),
    "darpa": (64, 720, 576),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="/tmp/delora_multires")
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--scans", type=int, default=550)
    ap.add_argument("--step", type=float, default=0.8)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--eval-every", type=int, default=0)
    ap.add_argument("--cosine", action="store_true")
    ap.add_argument("--tag", default=None)
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
        "checkpoint_dir": os.path.join(
            args.workdir, f"ckpt_{args.tag}" if args.tag else "ckpt"
        ),
        "log_dir": os.path.join(
            args.workdir, f"runs_{args.tag}" if args.tag else "runs"
        ),
        "epsilon_range": 1.0,
        # The r19 winning single-sensor recipe (docs/results/README.md).
        "projective_window": [9, 17],
        "po2pl_trim_distance": 1.0,
        "random_point_cloud_rotations": True,
        "magnitude_random_rot": 2.0,
        "lambda_pl2pl": 0.1,
    }
    for name, (rings, az_pre, h_train) in SENSORS.items():
        raw = os.path.join(args.workdir, f"raw_{name}")
        if not os.path.exists(os.path.join(raw, "sequences", "00")):
            print(f"[multires] generating {name} world "
                  f"({rings} rings, {az_pre} az) ...", flush=True)
            write_kitti_layout(raw, sequence=0, n_scans=args.scans,
                               rings=rings, azimuth_steps=az_pre,
                               step=args.step, yawed=True, seed=hash(name) % 997)
        overrides[name] = {
            "training_identifiers": [0],
            "testing_identifiers": [0],
            "vertical_cells": rings,
            "horizontal_cells": h_train,
            "horizontal_cells_preprocessing": az_pre,
            "max_points": 32768,
            "data_path": os.path.join(raw, "sequences"),
            "preprocessed_path": os.path.join(
                args.workdir, f"preprocessed_{name}"),
            "pose_data_path": os.path.join(raw, "poses"),
        }
    if args.cosine:
        steps_per_epoch = 2 * max(1, (args.scans - 1) // args.batch_size)
        overrides["lr_schedule"] = "cosine"
        overrides["lr_decay_steps"] = args.epochs * steps_per_epoch
        overrides["lr_min_ratio"] = 0.05
    if args.eval_every:
        overrides["eval_every_epochs"] = args.eval_every

    config = load_config(overrides=overrides, mode="preprocessing")
    for name in SENSORS:
        marker = os.path.join(args.workdir, f"preprocessed_{name}", "00",
                              "scans")
        if len(glob.glob(os.path.join(marker, "*.npy"))) < args.scans:
            print(f"[multires] preprocessing {name} ...", flush=True)
            Preprocessor(config).run_dataset(name, progress=True)

    config = load_config(overrides=overrides, mode="training")
    from delora_tpu.training.tester import Tester
    from delora_tpu.training.trainer import Trainer

    trainer = Trainer(config, run_name="multires")
    trainer.train(max_epochs=args.epochs)

    config_t = load_config(overrides=overrides, mode="testing")
    results = Tester(config_t, state=trainer.state,
                     run_name="multires_eval").test()
    print("[multires] results (final epoch):", results)

    from delora_tpu.data.pose_data import load_kitti_poses
    from delora_tpu.utils import poses as P

    for name in SENSORS:
        gt = load_kitti_poses(config_t, name, 0)
        ident = np.tile(np.eye(4), (len(gt), 1, 1))
        base = P.kitti_benchmark_summary(gt, ident)
        print(f"[multires] {name} identity baseline: {base}")


if __name__ == "__main__":
    main()
