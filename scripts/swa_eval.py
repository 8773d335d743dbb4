#!/usr/bin/env python3
"""Post-hoc stochastic weight averaging (SWA) over retained epoch
checkpoints, evaluated on the trajectory metric.

Companion to the in-training EMA (training/state.py track_param_ema): the
EMA's effective window (1/(1-decay) steps) is bounded by what was chosen at
launch, while the wander period of the flat pose basin can exceed it — this
script averages the 10-epoch-stride `epoch_*` checkpoints a finished run
already wrote (any stride that spans several wander periods), evaluating an
arbitrarily-long window WITHOUT retraining. Classic SWA (Izmailov et al.);
no reference counterpart (the reference keeps only the last checkpoint,
src/deploy/trainer.py:155-173).

Usage:
  python scripts/swa_eval.py CKPT_DIR [--names epoch_00020 epoch_00030 ...]

With no --names, averages every `epoch_*` checkpoint at or above
--min-epoch (default 20; skips the warmup-era snapshots) plus `latest`.
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt_dir")
    ap.add_argument("--names", nargs="*", default=None)
    ap.add_argument("--min-epoch", type=int, default=20)
    ap.add_argument("--also-singles", action="store_true",
                    help="also evaluate each snapshot individually")
    args = ap.parse_args()

    from delora_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import jax

    from delora_tpu.models.odometry import ModelConfig, OdometryModel
    from delora_tpu.training.checkpoint import CheckpointManager
    from delora_tpu.training.state import create_train_state, deploy_state
    from delora_tpu.training.tester import Tester

    meta_path = os.path.join(args.ckpt_dir, "latest_meta.json")
    with open(meta_path) as f:
        config = json.load(f)["parameters"]
    config["mode"] = "testing"
    for name in config["datasets"]:
        spec = config[name]
        spec["data_identifiers"] = list(spec["testing_identifiers"])

    names = args.names
    if not names:
        names = sorted(
            os.path.basename(p)
            for p in glob.glob(os.path.join(args.ckpt_dir, "epoch_*"))
            if not p.endswith("_meta.json")
            and int(os.path.basename(p).split("_")[1]) >= args.min_epoch
        ) + ["latest"]
    print(f"[swa] averaging {len(names)} snapshots: {names}")

    ds0 = config[config["datasets"][0]]
    import jax.numpy as jnp

    model = OdometryModel(ModelConfig.from_config(config))
    example = jnp.zeros(
        (int(config["batch_size"]), ds0["vertical_cells"],
         ds0["horizontal_cells"], 4)
    )
    template = create_train_state(model, config, example)
    mgr = CheckpointManager(args.ckpt_dir)

    acc = None
    for name in names:
        state, _ = mgr.restore(template, name)
        params = deploy_state(state).params
        leaves, treedef = jax.tree.flatten(params)
        leaves = [np.asarray(x, np.float64) for x in leaves]
        if acc is None:
            acc = leaves
        else:
            acc = [a + b for a, b in zip(acc, leaves)]
        if args.also_singles:
            r = Tester(config, state=state,
                       run_name=f"swa_single_{name}").test()
            print(f"[swa] {name}: {r}")

    mean = jax.tree.unflatten(
        treedef, [jnp.asarray(a / len(names), jnp.float32) for a in acc]
    )
    swa_state = template.replace(params=mean)
    results = Tester(config, state=swa_state, run_name="swa_eval").test()
    print(f"[swa] SWA({len(names)} snapshots) results:", results)


if __name__ == "__main__":
    main()
