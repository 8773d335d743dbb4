#!/usr/bin/env python3
"""Inspect a trained checkpoint's per-pair predictions on a synth world:
translation components and euler angles vs the ground-truth relative pose.

Usage: python scripts/diag_predictions.py <workdir> [--ckpt DIR] [--cpu]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--tag", default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--rings", type=int, default=32)
    ap.add_argument("--pairs", type=int, default=64)
    args = ap.parse_args()

    from delora_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from delora_tpu import se3
    from delora_tpu.config import load_config
    from delora_tpu.data.pose_data import load_kitti_poses
    from delora_tpu.training.tester import Tester
    from delora_tpu.utils.poses import TRANSFORM_LIDAR_TO_WORLD as L

    ckpt_dir = args.ckpt or os.path.join(
        args.workdir, f"ckpt_{args.tag}" if args.tag else "ckpt"
    )
    overrides = {
        "datasets": ["kitti"],
        "kitti": {
            "training_identifiers": [0], "testing_identifiers": [0],
            "vertical_cells": args.rings, "horizontal_cells": 720,
            "horizontal_cells_preprocessing": 900, "max_points": 32768,
            "data_path": os.path.join(args.workdir, "raw", "sequences"),
            "preprocessed_path": os.path.join(args.workdir, "preprocessed"),
            "pose_data_path": os.path.join(args.workdir, "raw", "poses"),
        },
        "batch_size": 8,
        "checkpoint": os.path.join(ckpt_dir, "latest"),
        "log_dir": os.path.join(args.workdir, "runs_diag"),
    }
    config = load_config(overrides=overrides, mode="testing")
    tester = Tester(config, run_name="diag")

    rel = tester.predict_sequence("kitti", 0)     # [K, 4, 4]
    K = min(args.pairs, len(rel)) if args.pairs > 0 else len(rel)
    sel = np.linspace(0, len(rel) - 1, K).astype(int)

    gt = load_kitti_poses(config, "kitti", 0)
    W = np.einsum("ij,kjl,lm->kim", L.T, gt, L)   # lidar poses
    T_true = np.linalg.inv(W[0]) @ W[1]

    t = rel[:, :3, 3]
    eul = np.stack([
        np.asarray(se3.matrix_to_euler_zyx(jnp.asarray(rel[k, :3, :3].copy())))
        for k in sel
    ])
    print(f"GT relative pose: t={T_true[:3, 3]}, "
          f"yaw={np.arctan2(T_true[1, 0], T_true[0, 0]):.4f} rad")
    print(f"\npredicted translation over {len(rel)} pairs:")
    for i, name in enumerate("xyz"):
        print(f"  t_{name}: mean={t[:, i].mean():+.4f}  std={t[:, i].std():.4f}"
              f"  min={t[:, i].min():+.4f}  max={t[:, i].max():+.4f}")
    print(f"predicted euler (zyx, rad) over {K} sampled pairs:")
    for i, name in enumerate(["yaw", "pitch", "roll"]):
        print(f"  {name}: mean={eul[:, i].mean():+.5f}  std={eul[:, i].std():.5f}")
    # per-pair translation error vs truth
    err = t - T_true[:3, 3][None]
    print(f"\n|t err| mean={np.linalg.norm(err, axis=1).mean():.4f} m/step "
          f"(identity baseline would be {np.linalg.norm(T_true[:3, 3]):.4f})")


if __name__ == "__main__":
    main()
