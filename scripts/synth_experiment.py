#!/usr/bin/env python3
"""Full-loop convergence experiment on the synthetic world:
generate scans -> preprocess -> train (warmup + unsupervised) -> evaluate
trajectory vs ground truth. The on-box substitute for a KITTI run (no dataset
download on an air-gapped host); demonstrates that the self-supervised
geometric objective actually learns odometry.

Usage: python scripts/synth_experiment.py [workdir] [--epochs N] [--scans K]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="/tmp/delora_synth")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--scans", type=int, default=60)
    ap.add_argument("--step", type=float, default=0.8,
                    help="drive meters per scan (scans*step = trajectory "
                         "length; >=800 m engages the KITTI segment metric)")
    ap.add_argument("--rings", type=int, default=32)
    ap.add_argument("--azimuth", type=int, default=900)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=5e-5)
    ap.add_argument("--small", action="store_true",
                    help="small model for quick runs")
    ap.add_argument("--correspondence", default=None,
                    choices=["projective", "image", "brute"],
                    help="override correspondence search mode")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (quality comparisons)")
    ap.add_argument("--augment", action="store_true",
                    help="random point-cloud rotation augmentation (the "
                         "paper's regularizer against projective-ICP "
                         "sliding; reference hyperparameters.yaml "
                         "random_point_cloud_rotations)")
    ap.add_argument("--aug-mag", type=float, default=None,
                    help="augment rotation magnitude in degrees "
                         "(reference magnitude_random_rot default 4.0; the "
                         "draw is uniform(-mag/2, mag/2))")
    ap.add_argument("--aug-yaw-only", action="store_true",
                    help="restrict augment rotations to yaw "
                         "(random_rotations_only_yaw)")
    ap.add_argument("--window", type=int, nargs=2, default=None,
                    metavar=("WV", "WU"),
                    help="correspondence search window (v, u). At 0.8 m/scan "
                         "forward motion close ground points shift ~4 rings "
                         "vertically, outside the default (5, 9) capture "
                         "range — wider windows let the matcher find the "
                         "true correspondent instead of a sliding one")
    ap.add_argument("--seed", type=int, default=None,
                    help="training seed (epoch shuffling / loader order)")
    ap.add_argument("--pl2pl", type=float, default=None,
                    help="lambda_pl2pl weight (default 1; lower raises the "
                         "po2pl pose-gradient SNR over the noisy normal "
                         "alignment floor)")
    ap.add_argument("--cosine", action="store_true",
                    help="cosine lr decay over the whole run (settles the "
                         "late-epoch pose wander)")
    ap.add_argument("--soft", type=float, default=None,
                    help="soft_match_sigma in meters (softmax-blended "
                         "matching; kills the yaw quantization ripple)")
    ap.add_argument("--reverse", type=float, default=None,
                    help="lambda_reverse_po2pl: weight of the reverse "
                         "(target -> warped-source) point-to-plane term — "
                         "charges for unexplained target structure "
                         "(anti-sliding anchor)")
    ap.add_argument("--trim", type=float, default=None,
                    help="po2pl_trim_distance (meters): reject matched pairs "
                         "with NN distance above this")
    ap.add_argument("--yawed", action="store_true",
                    help="rotate world boxes by random yaws (long worlds "
                         "only): spreads wall normals over all azimuths so "
                         "point-to-plane is conditioned in the whole plane "
                         "(axis-aligned worlds caused the r17 sliding "
                         "failure)")
    ap.add_argument("--eval-every", type=int, default=0,
                    help="evaluate the trajectory metric every N epochs "
                         "(Trainer eval_every_epochs: in-training validation "
                         "+ best-state retention as a 'best/' checkpoint)")
    ap.add_argument("--ckpt-every", type=int, default=None,
                    help="checkpoint cadence in epochs (default 1; sweeps "
                         "raise it — per-epoch Orbax writes dominate epoch "
                         "wall time on a contended host)")
    ap.add_argument("--feed", default=None, choices=["full", "cached"],
                    help="training feed: 'full' = fullcached (default; "
                         "augment re-projects cached survivors on device), "
                         "'cached' = cached-target (deviation-free augment, "
                         "source projected on device each step)")
    ap.add_argument("--tag", default=None,
                    help="suffix for checkpoint/log dirs so multiple arms "
                         "share one workdir's raw + preprocessed data")
    ap.add_argument("--ema", type=float, default=None,
                    help="ema_decay: Polyak-average the parameters and "
                         "evaluate the average (the flat-basin wander "
                         "stabilizer; try 0.999)")
    ap.add_argument("--widths", type=float, nargs=4, default=None,
                    metavar=("M1", "M2", "M3", "M4"),
                    help="resnet_stage_width_multipliers: per-stage width "
                         "multipliers ([2,1,1,1] quadruples stage-1 MXU "
                         "capacity for ~+0.4 ms/step — conv_experiment.py)")
    ap.add_argument("--prep-only", action="store_true",
                    help="generate the world + preprocess, then exit (run "
                         "this once under JAX_PLATFORMS=cpu so the TPU stays "
                         "free for a concurrent job; subsequent arms skip "
                         "straight to training)")
    args = ap.parse_args()

    from delora_tpu.config import load_config
    from delora_tpu.data.preprocess import Preprocessor
    from delora_tpu.data.synthetic import write_kitti_layout
    from delora_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    os.makedirs(args.workdir, exist_ok=True)
    raw = os.path.join(args.workdir, "raw")
    if not os.path.exists(os.path.join(raw, "sequences", "00")):
        print("[synth] generating world + scans ...")
        write_kitti_layout(raw, sequence=0, n_scans=args.scans,
                           rings=args.rings, azimuth_steps=args.azimuth,
                           step=args.step, yawed=args.yawed)

    overrides = {
        "datasets": ["kitti"],
        "kitti": {
            "training_identifiers": [0],
            "testing_identifiers": [0],
            "vertical_cells": args.rings,
            "horizontal_cells": 720,
            "horizontal_cells_preprocessing": args.azimuth,
            "max_points": 32768,
            "data_path": os.path.join(raw, "sequences"),
            "preprocessed_path": os.path.join(args.workdir, "preprocessed"),
            "pose_data_path": os.path.join(raw, "poses"),
        },
        "batch_size": args.batch_size,
        "learning_rate": args.lr,
        "checkpoint_dir": os.path.join(
            args.workdir, f"ckpt_{args.tag}" if args.tag else "ckpt"
        ),
        "log_dir": os.path.join(
            args.workdir, f"runs_{args.tag}" if args.tag else "runs"
        ),
        "epsilon_range": 1.0,
    }
    if args.correspondence:
        overrides["correspondence"] = args.correspondence
    if args.augment:
        overrides["random_point_cloud_rotations"] = True
    if args.aug_mag is not None:
        overrides["magnitude_random_rot"] = args.aug_mag
    if args.aug_yaw_only:
        overrides["random_rotations_only_yaw"] = True
    if args.window:
        overrides["projective_window"] = list(args.window)
    if args.trim is not None:
        overrides["po2pl_trim_distance"] = args.trim
    if args.reverse is not None:
        overrides["lambda_reverse_po2pl"] = args.reverse
    if args.soft is not None:
        overrides["soft_match_sigma"] = args.soft
    if args.seed is not None:
        overrides["seed"] = args.seed
    if args.pl2pl is not None:
        overrides["lambda_pl2pl"] = args.pl2pl
    if args.cosine:
        steps_per_epoch = max(1, (args.scans - 1) // args.batch_size)
        overrides["lr_schedule"] = "cosine"
        overrides["lr_decay_steps"] = args.epochs * steps_per_epoch
        overrides["lr_min_ratio"] = 0.05
    if args.eval_every:
        overrides["eval_every_epochs"] = args.eval_every
    if args.feed == "cached":
        overrides["cache_source_projections"] = False
    if args.ckpt_every is not None:
        overrides["checkpoint_every_epochs"] = args.ckpt_every
    if args.ema is not None:
        overrides["ema_decay"] = args.ema
    if args.widths:
        overrides["resnet_stage_width_multipliers"] = list(args.widths)
    if args.small:
        overrides.update({"resnet_outputs": 128, "layers": [1, 1, 1, 1],
                          "factor_fewer_resnet_channels": 4})

    import glob

    config = load_config(overrides=overrides, mode="preprocessing")
    pre_marker = os.path.join(args.workdir, "preprocessed", "00", "scans")
    if len(glob.glob(os.path.join(pre_marker, "*.npy"))) < args.scans:
        print("[synth] preprocessing ...")
        Preprocessor(config).run_dataset("kitti", progress=True)

    if args.prep_only:
        print("[synth] prep-only: world + preprocessed data ready at",
              args.workdir)
        return

    config = load_config(overrides=overrides, mode="training")
    from delora_tpu.training.tester import Tester
    from delora_tpu.training.trainer import Trainer

    trainer = Trainer(config, run_name="synth")
    config_t = load_config(overrides=overrides, mode="testing")

    # In-training validation + best-state retention now lives in the Trainer
    # itself (eval_every_epochs -> Trainer.evaluate: Tester metric on the
    # testing identifiers, best state kept as a 'best/' checkpoint).
    trainer.train(max_epochs=args.epochs)

    # FINAL-EPOCH evaluation — the headline number (no selection). With
    # --ema this evaluates the Polyak-averaged parameters (deploy_state):
    # still selection-free (the average is over the whole run, not picked
    # by validation score).
    from delora_tpu.training.state import deploy_state

    tester = Tester(config_t, state=trainer.eval_state, run_name="synth_eval")
    results = tester.test()
    print("[synth] results (final epoch):", results)

    # EMA runs: ALSO evaluate the RAW final iterate. The EMA transform does
    # not alter the parameter trajectory (its update_fn passes updates
    # through), so this raw number is exactly what the same recipe WITHOUT
    # --ema would have produced — every EMA arm doubles as its own non-EMA
    # control.
    if trainer.eval_state is not trainer.state:
        raw_results = Tester(
            config_t, state=trainer.state, run_name="synth_eval_raw"
        ).test()
        print("[synth] results (final epoch, raw non-EMA):", raw_results)

    # If in-training validation ran, ALSO evaluate the retained best state
    # (what a user deploying from this run would actually pick).
    if trainer.best_eval is not None:
        score, ep = trainer.best_eval
        print(f"[synth] best validated state: score={score:.3f} @ epoch {ep}")
        best_state, _ = trainer.ckpt.restore(trainer.state, "best")
        best_results = Tester(
            config_t, state=deploy_state(best_state),
            run_name="synth_eval_best"
        ).test()
        print("[synth] results (best checkpoint):", best_results)

    # Baseline comparison: identity odometry (no motion at all).
    from delora_tpu.data.pose_data import load_kitti_poses
    from delora_tpu.utils import poses as P

    gt = load_kitti_poses(config_t, "kitti", 0)
    ident = np.tile(np.eye(4), (len(gt), 1, 1))
    base = P.kitti_benchmark_summary(gt, ident)
    if base is None:  # short sequence: per-step relative pose error
        base = P.relative_pose_errors_summary(gt, ident)
        print(f"[synth] identity-odometry RPE baseline: {base}")
    else:
        print(f"[synth] identity-odometry baseline: {base}")


if __name__ == "__main__":
    main()
