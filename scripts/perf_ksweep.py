#!/usr/bin/env python3
"""steps_per_dispatch sweep for the headline K-scan program (VERDICT r4 #5).

The HBM-resident trainer runs K optimizer steps per jitted dispatch
(lax.scan — trainer._scan_steps_fn); each dispatch pays a relay round-trip
gap measured at ~1.0-1.6 ms/session (docs/ROOFLINE.md), amortized to gap/K.
r4 shipped K=8; this measures K = 8, 16, 32 on identical tables/batches so
the amortization curve is recorded and the headline default can be set from
data. One TPU process; stable-keyed programs (the K-scan family), so warm
sessions load from the compile cache.

Run: python scripts/perf_ksweep.py [B]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax              # noqa: E402
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
        StepConfig,
        FullyCachedBatch,
        loss_and_metrics_fullcached,
        optax_global_norm,
    )

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    H, W, N, VALID = 64, 720, 131072, 110000
    print(f"devices: {jax.devices()}  B={B} H={H} W={W}", flush=True)

    model = OdometryModel(ModelConfig(compute_dtype=jnp.bfloat16))
    state = create_train_state(
        model, {"learning_rate": 1e-5}, jnp.zeros((B, H, W, 4))
    )
    pspec = ProjectionSpec(
        height=H, width=W,
        fov_down=float(np.deg2rad(-24.5)), fov_up=float(np.deg2rad(2.0)),
        fov_left=float(np.deg2rad(-179.9)), fov_right=float(np.deg2rad(179.9)),
    )
    cfg = StepConfig(proj=pspec, icp=IcpLossConfig())

    rng = np.random.default_rng(0)

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

    allarts = [scan() for _ in range(2 * B)]
    tables = (
        jnp.asarray(np.stack([a.image for a in allarts])),
        jnp.asarray(np.stack([a.normal_image for a in allarts])),
        jnp.asarray(np.asarray([a.mean_range for a in allarts], np.float32)),
        jnp.asarray(np.stack([a.src_points for a in allarts])),
        jnp.asarray(np.stack([a.src_normals for a in allarts])),
        jnp.asarray(np.stack([a.src_valid for a in allarts])),
    )

    def make_multi():
        def multi(state, rng0, tables, ti, si):
            img, nimg, mr, pts, nrm, val = tables

            def body(carry, xs):
                state, rng = carry
                t, s = xs
                rng, srng = jax.random.split(rng)
                b = FullyCachedBatch(
                    img[t], nimg[t], mr[t],
                    img[s], pts[s], nrm[s], val[s], mr[s],
                )
                grad_fn = jax.value_and_grad(
                    lambda p: loss_and_metrics_fullcached(
                        state.apply_fn, p, b, cfg, srng
                    ),
                    has_aux=True,
                )
                (loss, (m, _)), grads = grad_fn(state.params)
                new_state = state.apply_gradients(grads=grads)
                m["grad_norm"] = optax_global_norm(grads)
                return (new_state, rng), m

            (state, rng), ms = jax.lax.scan(body, (state, rng0), (ti, si))
            return state, rng, ms

        return jax.jit(multi, donate_argnums=(0, 1))

    results = {}
    for KS in (8, 16, 32):
        ti = np.tile(np.arange(B, dtype=np.int32), (KS, 1))
        si = ti + B
        mfn = make_multi()
        st = jax.tree.map(jnp.copy, state)
        t0 = time.time()
        st, mrng, ms = mfn(st, jax.random.PRNGKey(4), tables, ti, si)
        st, mrng, ms = mfn(st, mrng, tables, ti, si)
        sync(ms["loss"])
        print(f"K={KS}: compile+warmup {time.time() - t0:.1f}s "
              f"loss={float(ms['loss'][-1]):.5f}", flush=True)
        # >= 120 total steps, >= 0.5 s window.
        ND = max(4, 120 // KS)
        t0 = time.time()
        for _ in range(ND):
            st, mrng, ms = mfn(st, mrng, tables, ti, si)
        sync(ms["loss"])
        dt = time.time() - t0
        pps = ND * KS * B / dt
        ms_step = dt / (ND * KS) * 1000
        print(f"K={KS}: {ND} dispatches x {KS} steps x {B} pairs in "
              f"{dt:.2f}s -> {pps:.2f} pairs/s ({ms_step:.3f} ms/step)",
              flush=True)
        results[KS] = (pps, ms_step)

    base = results[8][1]
    for KS, (pps, ms_step) in results.items():
        print(f"K={KS}: {pps:.1f} pairs/s, {ms_step:.3f} ms/step, "
              f"delta vs K=8: {base - ms_step:+.3f} ms", flush=True)


if __name__ == "__main__":
    main()
