#!/usr/bin/env python3
"""Loss-landscape probe for the sliding-degeneracy investigation (r4).

Bypasses the model: sweeps a FIXED pose T(alpha) = (alpha * t_true, R_true)
through the fullcached loss on real preprocessed pairs and prints loss curves
per estimator variant (window size, trim distance). Answers directly:
  * does the objective's minimum sit at alpha=1 (the true pose)?
  * how flat is the valley past alpha=1 (the overshoot direction)?
  * do wider search windows / match trimming sharpen the basin?

Usage:
  python scripts/diag_landscape.py <workdir> [--pairs 0 200 400] [--cpu]
where <workdir> is a synth_experiment workdir with preprocessed/ + raw/poses.
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--pairs", type=int, nargs="*", default=[0, 200, 500, 800])
    ap.add_argument("--alphas", type=float, nargs=3, default=[0.0, 3.0, 13.0],
                    metavar=("LO", "HI", "N"))
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--rings", type=int, default=32)
    ap.add_argument("--sweep", default="forward", choices=["forward", "yaw"],
                    help="forward: T(alpha)=(alpha*t_true, R_true); "
                         "yaw: T(beta)=(t_true, yaw=beta) — locates the "
                         "objective's yaw argmin vs the true yaw rate")
    args = ap.parse_args()

    import os

    from delora_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from delora_tpu import se3
    from delora_tpu.config import load_config
    from delora_tpu.data.dataset import ScanPairDataset
    from delora_tpu.data.pose_data import load_kitti_poses
    from delora_tpu.losses.icp import IcpLossConfig
    from delora_tpu.ops.projection import ProjectionSpec
    from delora_tpu.training.step import StepConfig, loss_and_metrics_fullcached
    from delora_tpu.utils.poses import TRANSFORM_LIDAR_TO_WORLD as L

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
        "batch_size": len(args.pairs),
    }
    config = load_config(overrides=overrides, mode="training")
    ds = ScanPairDataset(config, "kitti")

    # Ground-truth relative pose in the LIDAR frame (pose files store camera
    # frame: conjugate back by the fixed permutation).
    gt = load_kitti_poses(config, "kitti", 0)
    k0 = args.pairs[0]
    W0 = L.T @ gt[k0] @ L
    W1 = L.T @ gt[k0 + 1] @ L
    # The model predicts T mapping source (t+1) points into the target (t)
    # frame: T = W_t^{-1} W_{t+1} (forward drive => translation ~ +x 0.8 m).
    T_true = np.linalg.inv(W0) @ W1
    print(f"T_true translation (lidar frame): {T_true[:3, 3]}")
    t_true = T_true[:3, 3]
    R_true = T_true[:3, :3]

    batch = ds.make_fullcached_batch(args.pairs)
    batch = jax.tree.map(jnp.asarray, batch)
    B = len(args.pairs)
    q_true = np.asarray(se3.rotmat_to_quat(jnp.asarray(R_true.copy())))

    lo, hi, n = args.alphas
    alphas = np.linspace(lo, hi, int(n))

    variants = [
        ("w5x9", dict(window=(5, 9))),
        ("w9x17", dict(window=(9, 17))),
        ("w5x9_trim1", dict(window=(5, 9),
                            icp=IcpLossConfig(trim_sq_distance=1.0))),
        ("w9x17_trim1", dict(window=(9, 17),
                             icp=IcpLossConfig(trim_sq_distance=1.0))),
        ("w9x17_trim1_soft0.3", dict(window=(9, 17), soft=0.3,
                                     icp=IcpLossConfig(trim_sq_distance=1.0))),
    ]
    pspec = ProjectionSpec.from_config(config, "kitti")

    for name, kw in variants:
        cfg = StepConfig(
            proj=pspec, icp=kw.get("icp", IcpLossConfig()),
            correspondence="image", window=kw["window"], deterministic=True,
            soft_match_sigma=kw.get("soft", 0.0),
        )

        @jax.jit
        def probe(batch, t, q):
            apply = lambda p, i1, i2, **kws: (t, q)
            loss, (m, _) = loss_and_metrics_fullcached(
                apply, None, batch, cfg, jax.random.PRNGKey(0)
            )
            return m

        rows = []
        for a in alphas:
            if args.sweep == "yaw":
                Ty = np.eye(3)
                c_, s_ = np.cos(a), np.sin(a)
                Ty[:2, :2] = [[c_, -s_], [s_, c_]]
                t = jnp.tile(jnp.asarray(t_true, jnp.float32)[None], (B, 1))
                q = jnp.tile(np.asarray(se3.rotmat_to_quat(
                    jnp.asarray(Ty)))[None].astype(np.float32), (B, 1))
            else:
                t = jnp.tile(jnp.asarray(t_true * a, jnp.float32)[None],
                             (B, 1))
                q = jnp.tile(jnp.asarray(q_true, jnp.float32)[None], (B, 1))
            m = jax.device_get(probe(batch, t, q))
            rows.append((a, float(m["loss_pc"]), float(m["loss_po2pl"]),
                         float(m["loss_pl2pl"]), float(m["num_po2pl_pairs"])))
        print(f"\n=== {name} ===")
        print(f"{'alpha':>6} {'loss_pc':>10} {'po2pl':>10} {'pl2pl':>10} {'pairs':>8}")
        for a, pc, po, pl, np_ in rows:
            mark = " <-- true pose" if abs(a - 1.0) < 1e-6 else ""
            print(f"{a:6.2f} {pc:10.4f} {po:10.4f} {pl:10.4f} {np_:8.0f}{mark}")
        best = min(rows, key=lambda r: r[1])
        print(f"argmin alpha = {best[0]:.2f} (loss_pc {best[1]:.4f})")


if __name__ == "__main__":
    main()
