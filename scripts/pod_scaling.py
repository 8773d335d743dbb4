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

    # The same preset through the trainer's DEFAULT HBM-resident path
    # (VERDICT r3 #3): stacked per-scan artifact tables SHARDED over the
    # mesh's data axis, K=2 optimizer steps in one dispatch with on-device
    # global-batch gather from replicated index rows.
    from delora_tpu.parallel.pjit_step import (
        make_sharded_scan_steps, shard_stacked_tables,
    )

    n_scans = 16
    pool_img = np.stack([np.asarray(batch.image_1[i]) for i in range(8)] +
                        [np.asarray(batch.image_2[i]) for i in range(8)])
    pool_nimg = np.concatenate(
        [np.asarray(batch.normal_image_1[:8])] * 2)
    pool_mr = np.concatenate([np.asarray(batch.mean_range_1[:8])] * 2)
    pool_pts = np.concatenate([np.asarray(batch.src_points[:8])] * 2)
    pool_nrm = np.concatenate([np.asarray(batch.src_normals[:8])] * 2)
    pool_val = np.concatenate([np.asarray(batch.src_valid[:8])] * 2)
    tables = shard_stacked_tables(
        [pool_img, pool_nimg, pool_mr, pool_pts, pool_nrm, pool_val], mesh
    )
    K = 2
    ti = (np.arange(K * gb, dtype=np.int32) % (n_scans - 1)).reshape(K, gb)
    si = ti + 1
    scan_fn = make_sharded_scan_steps(model, cfg, mesh, K, donate=False)
    t0 = time.time()
    _, _, ms = scan_fn(s_state, jax.random.PRNGKey(1), tables, ti, si)
    scan_loss = float(np.asarray(ms["loss"])[-1])
    scan_steps_s = time.time() - t0
    assert np.isfinite(scan_loss), scan_loss

    out = {
        "preset": "pod_large_batch",
        "global_batch": gb,
        "effective_lr": lr,
        "host_shard_sizes": shard_sizes,
        "devices": n_devices,
        "backend": jax.devices()[0].platform,
        "loss": loss,
        "compile_and_first_step_s": round(compile_and_step_s, 1),
        "scan_steps_loss": scan_loss,
        "scan_steps_k2_compile_and_dispatch_s": round(scan_steps_s, 1),
        "ok": True,
    }
    print(json.dumps(out))
    return out


def run_full_recipe(n_devices: int = 8, exec_global_batch: int = 64) -> dict:
    """FULL-size pod-recipe evidence (VERDICT r2 item 4), three parts:

    (a) AOT-compile the sharded fullcached train step of the FULL-size model
        (ModelConfig() defaults, bf16 compute) at KITTI 64x720 / cap 46080
        and GLOBAL BATCH 4096 on the n-device mesh, via ShapeDtypeStruct
        lowering (no 13 GB batch materialization), and report XLA's own
        per-device memory analysis of the compiled partitioned program.
    (b) EXECUTE one step of the same full-size program at a reduced global
        batch (default 64 — the 2-core CPU host would take hours at 4096;
        per-device HBM at 512 pairs/device is measured on the real chip
        instead, docs/POD_BUDGET.md).
    (c) Print the analytic per-device v4-32 HBM budget at 512 pairs/device.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from delora_tpu.losses.icp import IcpLossConfig
    from delora_tpu.models.odometry import ModelConfig, OdometryModel
    from delora_tpu.ops.projection import ProjectionSpec
    from delora_tpu.ops.projection_host import scan_artifacts_np
    from delora_tpu.parallel.mesh import make_mesh
    from delora_tpu.parallel.pjit_step import (
        batch_sharding,
        make_sharded_train_step_fullcached,
        replicate_state,
        replicated_sharding,
        shard_batch,
    )
    from delora_tpu.training.state import create_train_state, param_count
    from delora_tpu.training.step import FullyCachedBatch, StepConfig

    H, W = 64, 720
    cap = H * W
    GB = 4096
    devices = jax.devices()[:n_devices]
    mesh = make_mesh(devices)
    repl = replicated_sharding(mesh)
    shard = batch_sharding(mesh)

    model = OdometryModel(ModelConfig(compute_dtype=jnp.bfloat16))
    model_remat = OdometryModel(
        ModelConfig(compute_dtype=jnp.bfloat16, remat=True)
    )
    pspec = ProjectionSpec(
        height=H, width=W,
        fov_down=float(np.deg2rad(-24.5)), fov_up=float(np.deg2rad(2.0)),
        fov_left=float(np.deg2rad(-179.9)), fov_right=float(np.deg2rad(179.9)),
    )
    cfg = StepConfig(proj=pspec, icp=IcpLossConfig())
    state = create_train_state(
        model, {"learning_rate": 1e-5, "lr_scaling": "linear",
                "lr_scaling_base_batch": 32},
        jnp.zeros((8, H, W, 4)),
    )
    n_params = param_count(state)
    step = make_sharded_train_step_fullcached(model, cfg, mesh, donate=False)

    # (a) AOT compile at global batch 4096 via shape-only lowering.
    s_state = replicate_state(state, mesh)
    state_shapes = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=repl),
        s_state,
    )
    f32 = jnp.float32
    bshape = lambda *s, dt=f32: jax.ShapeDtypeStruct(s, dt, sharding=shard)
    batch_shapes = FullyCachedBatch(
        image_1=bshape(GB, H, W, 4),
        normal_image_1=bshape(GB, H, W, 3),
        mean_range_1=bshape(GB),
        image_2=bshape(GB, H, W, 4),
        src_points=bshape(GB, cap, 3),
        src_normals=bshape(GB, cap, 3),
        src_valid=bshape(GB, cap, dt=jnp.bool_),
        mean_range_2=bshape(GB),
    )
    rng_shape = jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=repl)
    t0 = time.time()
    compiled = step.lower(state_shapes, batch_shapes, rng_shape).compile()
    compile_s = time.time() - t0
    ma = compiled.memory_analysis()
    per_device = {
        "argument_bytes": int(ma.argument_size_in_bytes),
        "output_bytes": int(ma.output_size_in_bytes),
        "temp_bytes": int(ma.temp_size_in_bytes),
        "alias_bytes": int(ma.alias_size_in_bytes),
    }

    # Same analysis with per-block rematerialization (the pod preset's
    # `remat: true`): only block-boundary activations are stored. The step
    # applies ``state.apply_fn``, so swap in the remat model's apply.
    step_r = make_sharded_train_step_fullcached(
        model_remat, cfg, mesh, donate=False
    )
    state_shapes_r = state_shapes.replace(apply_fn=model_remat.apply)
    ma_r = step_r.lower(
        state_shapes_r, batch_shapes, rng_shape
    ).compile().memory_analysis()
    per_device_remat = {
        "argument_bytes": int(ma_r.argument_size_in_bytes),
        "output_bytes": int(ma_r.output_size_in_bytes),
        "temp_bytes": int(ma_r.temp_size_in_bytes),
        "alias_bytes": int(ma_r.alias_size_in_bytes),
    }

    # (b) Execute ONE full-size step at a small global batch.
    rng = np.random.default_rng(0)
    pool = []
    for _ in range(4):
        pts = rng.normal(size=(cap, 3)).astype(np.float32) * np.array(
            [12, 12, 1.0], np.float32) - np.array([0, 0, 1.6], np.float32)
        nrm = rng.normal(size=(cap, 3)).astype(np.float32)
        nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-9)
        pool.append(scan_artifacts_np(pts, nrm, np.ones(cap, bool), pspec))
    eb = exec_global_batch
    idx = [i % len(pool) for i in range(eb)]
    a1 = [pool[i] for i in idx]
    a2 = [pool[(i + 1) % len(pool)] for i in idx]
    ebatch = FullyCachedBatch(
        image_1=np.stack([a.image for a in a1]),
        normal_image_1=np.stack([a.normal_image for a in a1]),
        mean_range_1=np.asarray([a.mean_range for a in a1], np.float32),
        image_2=np.stack([a.image for a in a2]),
        src_points=np.stack([a.src_points for a in a2]),
        src_normals=np.stack([a.src_normals for a in a2]),
        src_valid=np.stack([a.src_valid for a in a2]),
        mean_range_2=np.asarray([a.mean_range for a in a2], np.float32),
    )
    t0 = time.time()
    _, metrics = step(s_state, shard_batch(ebatch, mesh), jax.random.PRNGKey(0))
    loss = float(metrics["loss"])
    exec_s = time.time() - t0
    assert np.isfinite(loss), loss

    # (c) Analytic v4-32 per-device budget at 512 pairs/device (bf16
    # activations; full table with derivations in docs/POD_BUDGET.md).
    P = n_params
    pd = 512
    act_elems_per_pair = (
        64 * 360 * 64      # stem conv out
        + 64 * 180 * 64    # maxpool out
        + 4 * 64 * 180 * 64     # stage1: 2 blocks x 2 conv outs
        + 4 * 64 * 90 * 128     # stage2
        + 4 * 64 * 45 * 256     # stage3
        + 4 * 32 * 23 * 512     # stage4
    )
    budget = {
        "params_f32_mb": round(P * 4 / 2**20, 1),
        "adam_m_v_f32_mb": round(2 * P * 4 / 2**20, 1),
        "grads_f32_mb": round(P * 4 / 2**20, 1),
        "batch_slice_512_gb": round(
            pd * (2 * H * W * 4 + H * W * 3 + 2 * cap * 3 + 2) * 4 / 2**30, 2
        ),
        "activations_bf16_512_gb": round(
            pd * act_elems_per_pair * 2 / 2**30, 2
        ),
        "projection_sort_workspace_gb": round(
            pd * cap * 8 * 4 * 2 / 2**30, 2
        ),
    }

    out = {
        "mode": "full_recipe",
        "model_params": n_params,
        "global_batch_compiled": GB,
        "devices": len(devices),
        "backend": devices[0].platform,
        "compile_s": round(compile_s, 1),
        "xla_per_device_memory": per_device,
        "xla_per_device_total_gb": round(
            sum(per_device.values()) / 2**30, 2
        ),
        "xla_per_device_memory_remat": per_device_remat,
        "xla_per_device_total_gb_remat": round(
            sum(per_device_remat.values()) / 2**30, 2
        ),
        "exec_global_batch": eb,
        "exec_loss": loss,
        "exec_first_step_s": round(exec_s, 1),
        "v4_32_budget_at_512_per_device": budget,
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
    ap.add_argument("--full", action="store_true",
                    help="FULL-size model at 64x720: AOT compile at global "
                         "batch 4096 + XLA memory analysis + one executed "
                         "step (VERDICT r2 item 4)")
    ap.add_argument("--exec-global-batch", type=int, default=64)
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--per-device-batch", type=int, default=8)
    ap.add_argument(
        "--backend", choices=["cpu", "default"], default="cpu",
        help="cpu (default): force the virtual 8-device CPU mesh (the env "
             "var alone is overridden by this image's sitecustomize); "
             "'default' keeps the process backend (e.g. the real TPU chip).",
    )
    args = ap.parse_args()
    if not (args.recipe or args.sweep or args.full):
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
    if args.full:
        run_full_recipe(exec_global_batch=args.exec_global_batch)
    if args.sweep:
        run_sweep(args.per_device_batch)


if __name__ == "__main__":
    main()
