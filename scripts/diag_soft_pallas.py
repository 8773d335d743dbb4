#!/usr/bin/env python3
"""On-chip validation of the SOFT window-match Pallas path inside the step.

Round-4 state: ``backend="auto"`` + ``soft_sigma > 0`` routed through the
XLA fori-loop because the fully-unrolled soft kernel needed a quartered
batch cap whose chunked ``lax.map`` blew scoped VMEM in the train step's
jvp (71.7 MB vs 16 MB at 32x720 wv=9). The kernel's dv loop is now a real
``fori_loop`` (ops/pallas/window_match.py) and the cap is back to the hard
path's. This script proves, on the real chip, per shape/window:

  1. the train step (value_and_grad jvp context) COMPILES and runs with
     ``matcher_backend="pallas"`` + soft sigma at full batch,
  2. its loss matches the XLA-matcher step bitwise-close (same rng),
  3. soft-pallas vs soft-xla step time.

Risky compiles run in shape order (32x720 first); a scoped-VMEM failure
poisons the process backend (docs/BENCH_NOTES.md r20), so each failure
aborts cleanly with the evidence already printed.

Run: python scripts/diag_soft_pallas.py   (one TPU process, ~5 min warm)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax              # noqa: E402

if "--smoke" in sys.argv:
    # CPU logic check — must NOT touch the (single-tenant) TPU relay.
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def sync(x):
    return float(jnp.sum(x))


def main():
    from delora_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from delora_tpu.losses.icp import IcpLossConfig
    from delora_tpu.models.odometry import ModelConfig, OdometryModel
    from delora_tpu.ops.projection import ProjectionSpec
    from delora_tpu.ops.projection_host import scan_artifacts_np
    from delora_tpu.training.state import create_train_state
    from delora_tpu.training.step import (
        FullyCachedBatch,
        StepConfig,
        make_train_step_fullcached,
    )

    print(f"devices: {jax.devices()}", flush=True)
    B = 8
    SIGMA = 0.3

    shapes = ((32, 720, (9, 17)), (64, 720, (9, 17)), (64, 720, (5, 9)))
    if "--smoke" in sys.argv:      # CPU logic check (pallas interpret mode)
        B, shapes = 2, ((16, 64, (3, 5)),)

    for H, W, window in shapes:
        print(f"=== shape ({H}, {W}) window {window} sigma {SIGMA}",
              flush=True)
        model = OdometryModel(ModelConfig(compute_dtype=jnp.bfloat16))
        state0 = create_train_state(
            model, {"learning_rate": 1e-5}, jnp.zeros((B, H, W, 4))
        )
        pspec = ProjectionSpec(
            height=H, width=W,
            fov_down=float(np.deg2rad(-24.5)),
            fov_up=float(np.deg2rad(2.0)),
            fov_left=float(np.deg2rad(-179.9)),
            fov_right=float(np.deg2rad(179.9)),
        )
        rng = np.random.default_rng(0)
        N, VALID = 32768, 28000

        def scan():
            pts = rng.normal(size=(N, 3)).astype(np.float32)
            pts *= np.array([12.0, 12.0, 1.0], np.float32)
            pts[:, 2] -= 1.6
            valid = np.zeros((N,), bool)
            valid[:VALID] = True
            nrm = rng.normal(size=(N, 3)).astype(np.float32)
            nrm /= np.maximum(np.linalg.norm(nrm, -1, keepdims=True), 1e-9)
            nrm[~valid] = 0.0
            return scan_artifacts_np(pts, nrm, valid, pspec)

        arts1 = [scan() for _ in range(B)]
        arts2 = [scan() for _ in range(B)]
        fbatch = FullyCachedBatch(
            image_1=jnp.asarray(np.stack([a.image for a in arts1])),
            normal_image_1=jnp.asarray(
                np.stack([a.normal_image for a in arts1])),
            mean_range_1=jnp.asarray(
                np.asarray([a.mean_range for a in arts1], np.float32)),
            image_2=jnp.asarray(np.stack([a.image for a in arts2])),
            src_points=jnp.asarray(np.stack([a.src_points for a in arts2])),
            src_normals=jnp.asarray(
                np.stack([a.src_normals for a in arts2])),
            src_valid=jnp.asarray(np.stack([a.src_valid for a in arts2])),
            mean_range_2=jnp.asarray(
                np.asarray([a.mean_range for a in arts2], np.float32)),
        )

        results = {}
        for backend in ("xla", "pallas"):   # safe compile first
            cfg = StepConfig(
                proj=pspec, icp=IcpLossConfig(), window=window,
                matcher_backend=backend, soft_match_sigma=SIGMA,
            )
            step = make_train_step_fullcached(model, cfg)
            key = jax.random.PRNGKey(7)
            # The step donates its state: give each backend a fresh copy and
            # thread the returned state.
            st = jax.tree.map(jnp.copy, state0)
            t0 = time.time()
            try:
                st, m = step(st, fbatch, key)
                loss = sync(m["loss"])
            except Exception as e:
                print(f"[{backend}] FAILED: {type(e).__name__}: "
                      f"{str(e)[:400]}", flush=True)
                if backend == "pallas":
                    print("VERDICT: soft pallas in-step DOES NOT COMPILE",
                          flush=True)
                return 1
            print(f"[{backend}] compile+1step {time.time() - t0:.1f}s "
                  f"loss={loss:.6f}", flush=True)
            reps = 15
            t0 = time.time()
            for _ in range(reps):
                st, m = step(st, fbatch, key)
            sync(m["loss"])
            dt = (time.time() - t0) / reps * 1000
            print(f"[{backend}] step {dt:.2f} ms", flush=True)
            results[backend] = (loss, dt)

        lx, tx = results["xla"]
        lp, tp = results["pallas"]
        print(f"parity |loss_pallas - loss_xla| = {abs(lp - lx):.3e}  "
              f"speedup x{tx / tp:.2f}", flush=True)
    print("VERDICT: soft pallas in-step OK at all shapes", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
