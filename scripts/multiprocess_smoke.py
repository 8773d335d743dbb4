"""True multi-process training smoke: N processes x M virtual CPU devices.

Executes the paths the single-process 8-device dryrun can NOT reach
(VERDICT r1 "Next round" item 2 — BASELINE demands N >= 2 hosts):

  * ``jax.distributed.initialize`` over loopback
    (delora_tpu/parallel/mesh.py initialize_multihost),
  * the ``jax.process_count() > 1`` branch of ``shard_batch``
    (jax.make_array_from_process_local_data, parallel/pjit_step.py),
  * the per-host strided loader shard (data/dataset.py BatchLoader
    num_shards/shard_index),
  * process-0-only checkpointing with the cross-process barrier + resume
    (training/trainer.py), driven by the REAL Trainer end to end.

Modes (one script, three roles):
  parent (default)   spawn prepare + 1-proc reference + N-proc run, compare
  --prepare          synthesize raw scans + run offline preprocessing
  --worker I         one training process (rank I of --nproc)

The parent asserts: every process of the N-proc run reports identical
losses (they share the global state), the N-proc per-epoch losses match the
1-proc 8-device run (same global batches module a permutation; tolerance
covers reduction-order float drift), and resume-from-checkpoint continues
training with the restored parameters on all processes.

Run:  python scripts/multiprocess_smoke.py [--nproc 2] [--dir /tmp/...]
Prints one JSON line with the verdict; exit code 0 iff everything holds.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Two sizes of the same harness: the full smoke (slow tier + driver dryrun)
# and a trimmed FAST profile small enough for the default pytest gate, so a
# multiprocess regression surfaces in plain `pytest` (VERDICT r4 item 9).
# fast: 2 procs x 2 devices, 1 epoch, tiny shapes/model, no resume leg.
def profile(fast: bool) -> dict:
    if fast:
        return dict(n_scans=9, total_devices=4, epochs=1, resume=False,
                    v_cells=8, h_cells=32, h_pre=64, max_points=1024,
                    n_points=600, channels_factor=32, resnet_outputs=16)
    return dict(n_scans=17, total_devices=8, epochs=2, resume=True,
                v_cells=16, h_cells=64, h_pre=128, max_points=2048,
                n_points=1500, channels_factor=16, resnet_outputs=32)


def smoke_config(root: str, fast: bool = False):
    from delora_tpu.config import load_config

    prof = profile(fast)
    return load_config(overrides={
        "datasets": ["kitti"],
        "kitti": {
            "training_identifiers": [0],
            "testing_identifiers": [0],
            "vertical_cells": prof["v_cells"],
            "horizontal_cells": prof["h_cells"],
            "horizontal_cells_preprocessing": prof["h_pre"],
            "max_points": prof["max_points"],
            "neighborhood_side_length": [5, 7],
            "data_path": os.path.join(root, "raw"),
            "preprocessed_path": os.path.join(root, "preprocessed"),
            "pose_data_path": None,
        },
        "batch_size": prof["total_devices"],  # global batch, 1 pair/device
        "learning_rate": 1e-4,
        "epochs": prof["epochs"],
        "resnet_outputs": prof["resnet_outputs"],
        "layers": [1, 1, 1, 1],
        "factor_fewer_resnet_channels": prof["channels_factor"],
        "compute_dtype": "float32",
        "checkpoint_dir": os.path.join(root, "ckpt"),
        "log_dir": os.path.join(root, "runs"),
        "unsupervised_at_start": False,
        "epsilon_range": 5.0,
        "visualize_images": False,
        "prewarm_cache": False,
        "hbm_cache_scans": 0,                 # stream: exercise shard_batch
        "seed": 0,
    })


def _smoke_cache() -> None:
    """Workers share a persistent compile cache in /tmp: the three spawned
    processes otherwise each pay the full XLA compile of the (identical)
    tiny train step, which dominates the fast profile's wall time on the
    2-core host. No seed hydration — these are CPU programs."""
    from delora_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(
        os.path.join(tempfile.gettempdir(), "delora_mp_cache"), hydrate=False
    )


def prepare(root: str, fast: bool = False) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    _smoke_cache()
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_e2e import synthesize_kitti_sequence

    from delora_tpu.data.preprocess import Preprocessor

    prof = profile(fast)
    synthesize_kitti_sequence(
        os.path.join(root, "raw"), n_scans=prof["n_scans"],
        n_points=prof["n_points"],
    )
    n = Preprocessor(smoke_config(root, fast)).run_dataset(
        "kitti", progress=False)
    assert n == prof["n_scans"], n
    print(f"[prepare] {n} scans preprocessed")


def worker(root: str, rank: int, nproc: int, port: int, out_path: str,
           fast: bool = False) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    _smoke_cache()
    from delora_tpu.parallel.mesh import initialize_multihost, make_mesh

    prof = profile(fast)
    if nproc > 1:
        initialize_multihost(f"127.0.0.1:{port}", nproc, rank)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == prof["total_devices"], jax.devices()

    import numpy as np

    from delora_tpu.training.trainer import Trainer

    config = smoke_config(root, fast)
    mesh = make_mesh()
    trainer = Trainer(config, mesh=mesh, run_name=f"mp{nproc}")
    losses = []
    EPOCHS = prof["epochs"]
    for epoch in range(EPOCHS):
        metrics = trainer.train_epoch(epoch)
        losses.append(float(metrics["loss"]))
        trainer.logger.log_metrics(metrics, step=epoch)
    # Checkpoint: collective save (all processes call; CheckpointManager
    # gates filesystem mutations to process 0 behind barriers).
    trainer.ckpt.save(trainer.state, EPOCHS - 1, losses[-1], config)

    # Snapshot final params (replicated -> first addressable shard is full).
    def host(x):
        return np.asarray(
            x.addressable_data(0) if isinstance(x, jax.Array) else x
        )

    final_params = jax.tree.map(host, trainer.state.params)

    if prof["resume"]:
        # Resume: a FRESH Trainer restoring 'latest' must carry the exact
        # params and continue from the right epoch, on every process.
        resumed = Trainer(
            dict(config, checkpoint="latest", epochs=EPOCHS + 1),
            mesh=mesh, run_name=f"mp{nproc}-resume",
        )
        assert resumed.start_epoch == EPOCHS, resumed.start_epoch
        restored_params = jax.tree.map(host, resumed.state.params)
        leaves_a = jax.tree.leaves(final_params)
        leaves_b = jax.tree.leaves(restored_params)
        assert all(
            np.array_equal(a, b) for a, b in zip(leaves_a, leaves_b)
        ), "restored params differ from saved params"
        post = resumed.train_epoch(EPOCHS)
        losses.append(float(post["loss"]))

    with open(out_path, "w") as f:
        json.dump({"rank": rank, "nproc": nproc, "losses": losses}, f)
    print(f"[worker {rank}/{nproc}] losses={losses}")


def _spawn(args_list, extra_env):
    env = dict(os.environ)
    env.update(extra_env)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)] + args_list,
        env=env, cwd=REPO,
    )


def run_smoke(root: str, nproc: int = 2, port: int = 12361,
              timeout: int = 900, fast: bool = False) -> dict:
    """Parent: prepare once, run 1-proc reference + nproc run, compare."""
    prof = profile(fast)
    fast_flag = ["--fast"] if fast else []
    os.makedirs(root, exist_ok=True)
    if not os.path.isdir(os.path.join(root, "preprocessed")):
        p = _spawn(["--prepare", "--dir", root] + fast_flag,
                   {"JAX_PLATFORMS": "cpu"})
        assert p.wait(timeout=timeout) == 0, "prepare failed"

    results = {}
    for n in (1, nproc):
        ckpt = os.path.join(root, "ckpt")
        if os.path.isdir(ckpt):
            import shutil

            shutil.rmtree(ckpt)
        outs = [os.path.join(root, f"out_{n}_{r}.json") for r in range(n)]
        flags = {
            "XLA_FLAGS":
                "--xla_force_host_platform_device_count="
                f"{prof['total_devices'] // n}",
            "JAX_PLATFORMS": "cpu",
        }
        procs = [
            _spawn(["--worker", str(r), "--nproc", str(n), "--port",
                    str(port + n), "--dir", root, "--out", outs[r]]
                   + fast_flag, flags)
            for r in range(n)
        ]
        rcs = [p.wait(timeout=timeout) for p in procs]
        assert all(rc == 0 for rc in rcs), f"worker rcs={rcs} (nproc={n})"
        payloads = [json.load(open(o)) for o in outs]
        # All processes of one run see the same global state -> identical.
        for p in payloads[1:]:
            assert p["losses"] == payloads[0]["losses"], (
                f"processes disagree: {payloads}"
            )
        results[n] = payloads[0]["losses"]

    ref, multi = results[1], results[nproc]
    drift = max(
        abs(a - b) / max(abs(a), 1e-9) for a, b in zip(ref, multi)
    )
    verdict = {
        "nproc": nproc,
        "devices_per_proc": prof["total_devices"] // nproc,
        "epoch_losses_1proc": ref,
        f"epoch_losses_{nproc}proc": multi,
        "max_rel_drift": drift,
        "ok": bool(drift < 1e-3),
    }
    print(json.dumps(verdict))
    assert verdict["ok"], verdict
    return verdict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prepare", action="store_true")
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--port", type=int, default=12361)
    ap.add_argument("--dir", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--fast", action="store_true")
    args = ap.parse_args()

    if args.prepare:
        prepare(args.dir, fast=args.fast)
    elif args.worker is not None:
        worker(args.dir, args.worker, args.nproc, args.port, args.out,
               fast=args.fast)
    else:
        root = args.dir or tempfile.mkdtemp(prefix="delora_mp_smoke_")
        run_smoke(root, nproc=args.nproc, port=args.port, fast=args.fast)


if __name__ == "__main__":
    main()
