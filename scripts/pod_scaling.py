"""Pod-recipe dryrun + data-parallel scaling-efficiency harness.

VERDICT r1 item 3 — two entry points:

  --recipe      Dry-run the 4096-pair pod preset on the virtual 8-device CPU
                mesh (reduced model, real global batch): the preset loads
                through the 3-YAML stack, the linear-scaling LR resolves to
                1.28e-3, the per-host loader produces 4096/N-shard batches,
                and ONE sharded fullcached train step at global batch 4096
                compiles and runs to a finite loss.

  --sweep       Weak-scaling sweep: fixed per-device batch, pairs/s measured
                at 1/2/4/8 devices of the current backend. On the virtual CPU
                mesh this validates the MECHANISM (all devices share the same
                cores, so wall-clock efficiency is not meaningful there —
                the JSON labels the backend); on real hardware the same
                harness produces the BASELINE.md 1-chip/1-host/N-host curve.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \\
      python scripts/pod_scaling.py --recipe --sweep
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _tiny_problem(global_batch: int, H=16, W=64, N=256, seed=0):
    """Tiny-model FullyCachedBatch problem at a real global batch size."""
    import numpy as np

    from delora_tpu.losses.icp import IcpLossConfig
    from delora_tpu.models.odometry import ModelConfig, OdometryModel
    from delora_tpu.ops.projection import ProjectionSpec
    from delora_tpu.ops.projection_host import scan_artifacts_np
    from delora_tpu.training.step import FullyCachedBatch, StepConfig

    rng = np.random.default_rng(seed)
    model = OdometryModel(ModelConfig(
        resnet_outputs=32, blocks_per_stage=(1, 1, 1, 1), channel_divisor=8
    ))
    pspec = ProjectionSpec(
        height=H, width=W,
        fov_down=float(np.deg2rad(-24.5)), fov_up=float(np.deg2rad(2.0)),
        fov_left=float(np.deg2rad(-179.9)), fov_right=float(np.deg2rad(179.9)),
    )
    cfg = StepConfig(
        proj=pspec, icp=IcpLossConfig(),
        matcher_backend="xla", placement_backend="xla",
    )

    def scan():
        pts = rng.normal(size=(N, 3)).astype(np.float32) * np.array(
            [8, 8, 0.5], np.float32) - np.array([0, 0, 1.5], np.float32)
        nrm = rng.normal(size=(N, 3)).astype(np.float32)
        nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-9)
        return scan_artifacts_np(pts, nrm, np.ones(N, bool), pspec)

    # A handful of unique scans tiled to the global batch (batch content
    # does not matter for compile/throughput checks; tiling keeps host prep
    # fast at batch 4096).
    pool = [scan() for _ in range(8)]
    idx = [i % len(pool) for i in range(global_batch)]
    a1 = [pool[i] for i in idx]
    a2 = [pool[(i + 1) % len(pool)] for i in idx]
    import numpy as np  # noqa: F811

    batch = FullyCachedBatch(
        image_1=np.stack([a.image for a in a1]),
        normal_image_1=np.stack([a.normal_image for a in a1]),
        mean_range_1=np.asarray([a.mean_range for a in a1], np.float32),
        image_2=np.stack([a.image for a in a2]),
        src_points=np.stack([a.src_points for a in a2]),
        src_normals=np.stack([a.src_normals for a in a2]),
        src_valid=np.stack([a.src_valid for a in a2]),
        mean_range_2=np.asarray([a.mean_range for a in a2], np.float32),
    )
    return model, cfg, batch, (H, W)


def run_recipe(n_devices: int = 8) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from delora_tpu.config import load_config
    from delora_tpu.data.dataset import BatchLoader
    from delora_tpu.parallel.mesh import make_mesh
    from delora_tpu.parallel.pjit_step import (
        make_sharded_train_step_fullcached,
        replicate_state,
        shard_batch,
    )
    from delora_tpu.training.state import (
        create_train_state,
        effective_learning_rate,
    )

    preset = os.path.join(
        REPO, "delora_tpu", "configs", "presets", "pod_large_batch.yaml"
    )
    base = os.path.join(REPO, "delora_tpu", "configs")
    config = load_config(config_files=[
        os.path.join(base, "datasets.yaml"),
        os.path.join(base, "deployment.yaml"),
        os.path.join(base, "hyperparameters.yaml"),
        preset,
    ])
    gb = int(config["batch_size"])
    assert gb == 4096, gb
    lr = effective_learning_rate(config, gb)
    assert abs(lr - 1.28e-3) < 1e-9, lr

    # Per-host loader shard shapes at N=2 hosts: 4096 global -> 2048 local.
    class _FakeDataset:
        def __len__(self):
            return 3 * gb  # 3 steps per epoch

    shard_sizes = []
    for host in range(2):
        loader = BatchLoader(
            _FakeDataset(), gb, shuffle=True, seed=0,
            num_shards=2, shard_index=host,
        )
        assert loader.local_batch == gb // 2
        idx = loader.epoch_indices(0)
        shard_sizes.append(len(idx))
    assert shard_sizes == [3 * gb // 2] * 2
    # Disjointness of the two hosts' strided shards:
    l0 = BatchLoader(_FakeDataset(), gb, shuffle=True, seed=0,
                     num_shards=2, shard_index=0).epoch_indices(0)
    l1 = BatchLoader(_FakeDataset(), gb, shuffle=True, seed=0,
                     num_shards=2, shard_index=1).epoch_indices(0)
    assert not (set(l0.tolist()) & set(l1.tolist()))

    # ONE sharded step at the full 4096 global batch (reduced model).
    model, cfg, batch, (H, W) = _tiny_problem(gb)
    devices = jax.devices()[:n_devices]
    n_devices = len(devices)
    mesh = make_mesh(devices)
    state = create_train_state(model, config, jnp.zeros((8, H, W, 4)))
    step = make_sharded_train_step_fullcached(model, cfg, mesh, donate=False)
    s_state = replicate_state(state, mesh)
    t0 = time.time()
    _, metrics = step(s_state, shard_batch(batch, mesh), jax.random.PRNGKey(0))
    loss = float(metrics["loss"])
    compile_and_step_s = time.time() - t0
    assert np.isfinite(loss), loss

    out = {
        "preset": "pod_large_batch",
        "global_batch": gb,
        "effective_lr": lr,
        "host_shard_sizes": shard_sizes,
        "devices": n_devices,
        "backend": jax.devices()[0].platform,
        "loss": loss,
        "compile_and_first_step_s": round(compile_and_step_s, 1),
        "ok": True,
    }
    print(json.dumps(out))
    return out


def run_sweep(per_device_batch: int = 8, steps: int = 5) -> list:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from delora_tpu.parallel.mesh import make_mesh
    from delora_tpu.parallel.pjit_step import (
        make_sharded_train_step_fullcached,
        replicate_state,
        shard_batch,
    )
    from delora_tpu.training.state import create_train_state

    all_devices = jax.devices()
    counts = [c for c in (1, 2, 4, 8) if c <= len(all_devices)]
    results = []
    for c in counts:
        gb = per_device_batch * c
        model, cfg, batch, (H, W) = _tiny_problem(gb)
        mesh = make_mesh(all_devices[:c])
        state = create_train_state(
            model, {"learning_rate": 1e-4}, jnp.zeros((8, H, W, 4))
        )
        step = make_sharded_train_step_fullcached(
            model, cfg, mesh, donate=False
        )
        s_state = replicate_state(state, mesh)
        s_batch = shard_batch(batch, mesh)
        rng = jax.random.PRNGKey(0)
        s_state, m = step(s_state, s_batch, rng)      # compile + warmup
        float(m["loss"])                               # sync
        t0 = time.perf_counter()
        for _ in range(steps):
            s_state, m = step(s_state, s_batch, rng)
        float(m["loss"])                               # sync
        dt = time.perf_counter() - t0
        results.append({
            "devices": c,
            "global_batch": gb,
            "pairs_per_sec": round(gb * steps / dt, 1),
            "ms_per_step": round(dt / steps * 1e3, 2),
            "backend": all_devices[0].platform,
        })
        print(json.dumps(results[-1]))
    if len(results) > 1:
        eff = (results[-1]["pairs_per_sec"]
               / (results[0]["pairs_per_sec"] * results[-1]["devices"]))
        print(json.dumps({
            "weak_scaling_efficiency": round(eff, 3),
            "note": "virtual CPU devices share host cores; efficiency is "
                    "only meaningful on real multi-chip hardware"
                    if results[0]["backend"] == "cpu" else "hardware",
        }))
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--recipe", action="store_true")
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--per-device-batch", type=int, default=8)
    ap.add_argument(
        "--backend", choices=["cpu", "default"], default="cpu",
        help="cpu (default): force the virtual 8-device CPU mesh (the env "
             "var alone is overridden by this image's sitecustomize); "
             "'default' keeps the process backend (e.g. the real TPU chip).",
    )
    args = ap.parse_args()
    if not (args.recipe or args.sweep):
        args.recipe = args.sweep = True
    if args.backend == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.recipe:
        run_recipe()
    if args.sweep:
        run_sweep(args.per_device_batch)


if __name__ == "__main__":
    main()
