"""Measure the reference implementation's training throughput (CPU torch).

VERDICT r1 item 6: ``vs_baseline`` rested on an ESTIMATED ~10 pairs/s for the
reference; this harness produces a MEASURED number by executing the actual
reference trainer step (/root/reference/src/deploy/deployer.py step, the
same per-sample loop the reference GPU recipe runs) over synthetic
KITTI-scale scans, driven exactly as reference trainer.py train_epoch drives
it (DataLoader + list_collate -> zero_grad -> step with backward+Adam
inside).

Environment shims (documented; the same ones tests/test_reference_parity.py
uses, plus):
  * ``numba.njit`` -> identity: the dedup loop runs as plain Python, which
    is SLOWER than the reference's real numba JIT. To avoid overstating our
    speedup, the harness also times that loop alone and a vectorized
    numpy equivalent (identical first-writer-wins semantics), and reports an
    ADJUSTED throughput = step time with the python loop swapped for the
    vectorized one — an upper bound on reference-CPU speed (i.e. the
    conservative baseline for vs_baseline claims).
  * ``kornia.quaternion_to_rotation_matrix`` -> a torch transliteration of
    the kornia-0.3.0 (x, y, z, w) formula (the convention pinned in
    delora_tpu/se3.py and validated by tests/test_torch_import.py) — the
    step needs a working quat->R, and kornia is not installed here.
  * ``mlflow``/``qqdm`` -> inert stubs (never called with logging off).

Scans are synthesized at KITTI scale by OUR offline preprocessing (which
writes the reference's exact npy contract — see
tests/test_e2e.py::test_preprocessing_writes_reference_contract), so the
reference Deployer consumes them through its own PreprocessedPointCloudDataset.

Usage: python scripts/reference_baseline.py [--steps 20] [--out FILE]
Prints one JSON line; optionally writes it to --out (the committed copy at
docs/reference_baseline.json feeds bench.py's vs_baseline denominator).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
import types

REFERENCE_SRC = "/root/reference/src"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

N_SCANS = 6
WORLD_POINTS = 160_000


def install_shims():
    import torch

    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")

        def njit(*args, **kwargs):
            if len(args) == 1 and callable(args[0]) and not kwargs:
                return args[0]
            return lambda f: f

        numba.njit = njit
        sys.modules["numba"] = numba

    if "kornia" not in sys.modules:
        def quaternion_to_rotation_matrix(quaternion):
            # kornia 0.3.0 semantics: (x, y, z, w), normalized first.
            q = quaternion / quaternion.norm(dim=-1, keepdim=True)
            x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
            tx, ty, tz = 2.0 * x, 2.0 * y, 2.0 * z
            twx, twy, twz = tx * w, ty * w, tz * w
            txx, txy, txz = tx * x, ty * x, tz * x
            tyy, tyz, tzz = ty * y, tz * y, tz * z
            row0 = torch.stack([1.0 - (tyy + tzz), txy - twz, txz + twy], -1)
            row1 = torch.stack([txy + twz, 1.0 - (txx + tzz), tyz - twx], -1)
            row2 = torch.stack([txz - twy, tyz + twx, 1.0 - (txx + tyy)], -1)
            return torch.stack([row0, row1, row2], -2)

        kornia = types.ModuleType("kornia")
        kornia.quaternion_to_rotation_matrix = quaternion_to_rotation_matrix
        sys.modules["kornia"] = kornia

    for name in ("mlflow", "qqdm"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)

    if not getattr(torch, "_delora_symeig_shim", False):
        def symeig(input, eigenvectors=False, upper=True):
            w, v = torch.linalg.eigh(input, UPLO="U" if upper else "L")
            return (w, v if eigenvectors else torch.zeros_like(v))

        torch.symeig = symeig
        torch._delora_symeig_shim = True


def synthesize_preprocessed(root: str) -> dict:
    """KITTI-scale synthetic scans through OUR preprocessing -> reference
    npy layout. Returns the kitti dataset spec dict used."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_e2e import synthesize_kitti_sequence

    from delora_tpu.config import load_config
    from delora_tpu.data.preprocess import Preprocessor

    synthesize_kitti_sequence(
        os.path.join(root, "raw"), n_scans=N_SCANS, n_points=WORLD_POINTS
    )
    config = load_config(overrides={
        "datasets": ["kitti"],
        "kitti": {
            "training_identifiers": [0],
            "testing_identifiers": [0],
            "data_path": os.path.join(root, "raw"),
            "preprocessed_path": os.path.join(root, "preprocessed"),
            "pose_data_path": None,
        },
    })
    n = Preprocessor(config).run_dataset("kitti", progress=False)
    assert n == N_SCANS
    sizes = [
        np.load(os.path.join(root, "preprocessed", "00", "scans",
                             f"{k:06d}.npy")).shape[0]
        for k in range(N_SCANS)
    ]
    print(f"[prepare] {n} scans, points per scan: {sizes}", file=sys.stderr)
    return config["kitti"]


def vectorized_dedup_time(u, v, H, W, iters=5):
    """Time a numpy first-writer-wins equivalent of the reference's numba
    loop (same winners: points arrive range-sorted; np.unique keeps the
    first occurrence per pixel id)."""
    import numpy as np

    pix = v.astype(np.int64) * W + u.astype(np.int64)
    t0 = time.perf_counter()
    for _ in range(iters):
        _, first_idx = np.unique(pix, return_index=True)
        unique_bool = np.zeros(len(pix), bool)
        unique_bool[first_idx] = True
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--dir", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    root = args.dir or tempfile.mkdtemp(prefix="delora_ref_baseline_")
    kitti_spec = synthesize_preprocessed(root)

    import torch

    install_shims()
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)

    import numpy as np

    import deploy.deployer as ref_deployer

    config = {
        # deployment_options.yaml defaults (device -> cpu: torch is CPU here)
        "device": torch.device("cpu"),
        "mode": "training",
        "datasets": ["kitti"],
        "store_dataset_in_RAM": True,
        "num_dataloader_workers": 0,
        "unsupervised_at_start": True,   # the real (ICP-loss) training path
        "inference_only": False,
        "use_jit": False,
        # hyperparameters.yaml defaults
        "batch_size": 1,
        "learning_rate": 1e-5,
        "lambda_po2pl": 1.0,
        "use_dropout": False,
        "random_point_cloud_rotations": False,
        "random_rotations_only_yaw": False,
        "magnitude_random_rot": 4.0,
        "normal_loss": "squared",
        "point_to_point_loss": False,
        "point_to_plane_loss": True,
        "plane_to_plane_loss": True,
        "po2po_alone": False,
        "normalization_scaling": False,
        "activation_fct": "tanh",
        "resnet_outputs": 1000,
        "pre_feature_extraction": False,
        "layers": [2, 2, 2, 2],
        "factor_fewer_resnet_channels": 1,
        "use_single_mlp_at_output": False,
        # config_datasets.yaml kitti block (radians, as bin/run_training.py
        # converts) pointing at the synthesized preprocessed tree
        "horizontal_field_of_view": [np.deg2rad(-179.9), np.deg2rad(179.9)],
        "kitti": {
            "data_identifiers": [0],
            "vertical_field_of_view": [np.deg2rad(-24.5), np.deg2rad(2.0)],
            "vertical_cells": int(kitti_spec["vertical_cells"]),
            "horizontal_cells": int(kitti_spec["horizontal_cells"]),
            "preprocessed_path": os.path.join(root, "preprocessed"),
        },
    }

    deployer = ref_deployer.Deployer(config)
    deployer.training_bool = True
    deployer.optimizer = torch.optim.Adam(
        deployer.model.parameters(), lr=config["learning_rate"]
    )

    dataloader = torch.utils.data.DataLoader(
        dataset=deployer.dataset, batch_size=config["batch_size"],
        shuffle=True, collate_fn=ref_deployer.Deployer.list_collate,
    )

    def epoch_losses_zero():
        return {
            "loss_epoch": 0.0, "loss_point_cloud_epoch": 0.0,
            "loss_field_of_view_epoch": 0.0, "loss_po2po_epoch": 0.0,
            "loss_po2pl_epoch": 0.0, "loss_pl2pl_epoch": 0.0,
            "visible_pixels_epoch": 0.0,
            "loss_yaw_pitch_roll_epoch": np.zeros(3),
            "loss_true_trafo_epoch": 0.0,
        }

    # One measured "epoch": warmup 2 steps, then time the next args.steps.
    times = []
    epoch_losses = epoch_losses_zero()
    done = 0
    import copy

    while done < args.steps + 2:
        for dicts in dataloader:
            # The reference step MUTATES the dicts (masking scans in place);
            # with store_dataset_in_RAM the tensors are shared across epochs,
            # so feed deep copies, as fresh DataLoader workers would.
            dicts = [
                {k: (v.clone() if torch.is_tensor(v) else v)
                 for k, v in d.items()}
                for d in dicts
            ]
            deployer.optimizer.zero_grad()
            t0 = time.perf_counter()
            epoch_losses, _ = deployer.step(
                preprocessed_dicts=dicts, epoch_losses=epoch_losses,
                log_images_bool=False,
            )
            times.append(time.perf_counter() - t0)
            done += 1
            if done >= args.steps + 2:
                break

    steady = np.asarray(times[2:])
    step_s = float(np.median(steady))
    pairs_per_sec = config["batch_size"] / step_s

    # Numba-fairness adjustment: swap the python dedup loop's measured cost
    # for a vectorized-numpy equivalent (>= numba speed is NOT claimed;
    # numpy unique is a fair stand-in for compiled speed at this size).
    d0 = next(iter(dataloader))
    scan = d0[0]["scan_2"]
    proj = deployer.img_projection
    H = config["kitti"]["vertical_cells"]
    W = config["kitti"]["horizontal_cells"]
    with torch.no_grad():
        pc = torch.zeros((1, 4, scan.shape[2]))
        pc[:, :3] = scan
        r = torch.norm(pc[:, :3, :], dim=1)
        order = torch.argsort(r[0])
        pc = pc[:, :, order]
        u, vv = proj.compute_2D_coordinates(
            pc, W, H, config["kitti"]["vertical_field_of_view"]
        )
        ok = (torch.round(u) <= W - 1) & (torch.round(u) >= 0) & \
             (torch.round(vv) <= H - 1) & (torch.round(vv) >= 0)
        uu = torch.round(u[ok]).long().numpy()
        vn = torch.round(vv[ok]).long().numpy()

    # Python-loop time for ONE projection's dedup (the step runs 3-4 of
    # them: 2 in the batch loop + >=1 for visualization reprojection).
    occupancy = np.zeros((H, W), dtype=bool)
    idx_map = np.zeros((1, len(uu), 2), dtype=int)
    ub = np.zeros(len(uu), dtype=bool)
    t0 = time.perf_counter()
    proj.remove_duplicate_indices(
        u=uu, v=vn, occupancy_grid=occupancy, unique_bool=ub,
        image_to_pointcloud_indices=idx_map,
    )
    python_dedup_s = time.perf_counter() - t0
    vec_dedup_s = vectorized_dedup_time(uu, vn, H, W)
    n_dedups_per_step = 2 * config["batch_size"] + 1
    adj_step_s = max(
        step_s - n_dedups_per_step * (python_dedup_s - vec_dedup_s), 1e-6
    )
    adjusted_pairs_per_sec = config["batch_size"] / adj_step_s

    result = {
        "metric": "reference_cpu_pairs_per_sec",
        "value": round(adjusted_pairs_per_sec, 4),
        "unit": "pairs/s",
        "raw_pairs_per_sec_python_dedup": round(pairs_per_sec, 4),
        "median_step_ms": round(step_s * 1e3, 2),
        "adjusted_step_ms": round(adj_step_s * 1e3, 2),
        "python_dedup_ms": round(python_dedup_s * 1e3, 2),
        "vectorized_dedup_ms": round(vec_dedup_s * 1e3, 2),
        "dedups_per_step": n_dedups_per_step,
        "steps_timed": len(steady),
        "batch_size": config["batch_size"],
        "device": "cpu",
        "torch_threads": torch.get_num_threads(),
        "note": "reference src/deploy/deployer.py step executed from "
                "/root/reference on synthetic KITTI-scale scans; "
                "adjusted = python dedup swapped for vectorized-numpy cost",
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
