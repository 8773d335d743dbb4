#!/usr/bin/env python3
"""Benchmark: full-train-step throughput on one chip, KITTI-shaped data.

Prints ONE JSON line:
  {"metric": "scan_pairs_per_sec_per_chip", "value": N, "unit": "pairs/s",
   "vs_baseline": R}

The measured program is the complete hot path — model forward (circular
ResNet), quaternion->SE(3), source warp, correspondence, masked ICP losses,
backward, Adam — as one jitted XLA program, i.e. exactly what `delora train`
executes per step in its default configuration: target-side projections fed
from the per-scan host cache (delora_tpu/ops/projection_host.py — they are
epoch-invariant, so steady-state training never recomputes them) and the
gather-free image-space correspondence (`correspondence: image`,
quality-validated against the projective matcher — docs/BENCH_NOTES.md).

The HEADLINE is measured first; everything else (uncached step, projective
matcher, inference latency) is a best-effort diagnostic on stderr guarded by
a deadline, so a slow diagnostic compile can never eat the JSON line.

vs_baseline: the reference (leggedrobotics/delora) publishes no training
throughput (BASELINE.md); its hot loop is batch-size-1 with >=4 host<->device
round trips per sample (reference src/deploy/deployer.py:237-375,
SURVEY.md §3.1). MEASURED on this box (scripts/reference_baseline.py, the
actual reference step executed from /root/reference on synthetic KITTI-scale
scans, numba-fairness-adjusted): 1.2 pairs/s on CPU
(docs/reference_baseline.json). The denominator stays at the GENEROUS
10 pairs/s single-GPU figure — crediting the reference GPU with ~8x its
measured CPU throughput — so vs_baseline = value / 10 remains conservative.

Timing notes: dispatch is async (block_until_ready through the axon relay
does not block), so the clock is bracketed by *readbacks*: sync, run K steps,
sync again.
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

DEADLINE_S = float(__import__("os").environ.get("BENCH_DEADLINE_S", 480))
_T_START = time.time()


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def sync(x):
    """Force real device completion (readback a scalar)."""
    return float(jnp.sum(x))


def remaining():
    return DEADLINE_S - (time.time() - _T_START)


def main():
    from delora_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from delora_tpu.losses.icp import IcpLossConfig
    from delora_tpu.models.odometry import ModelConfig, OdometryModel
    from delora_tpu.ops.projection import ProjectionSpec
    from delora_tpu.ops.projection_host import scan_artifacts_np
    from delora_tpu.training.state import create_train_state
    from delora_tpu.training.step import (
        CachedTargetBatch,
        FullyCachedBatch,
        ScanPairBatch,
        StepConfig,
        make_train_step,
        make_train_step_cached,
        make_train_step_fullcached,
    )

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    H, W = 64, 720
    N = 131072          # KITTI max_points (config datasets.yaml)
    VALID = 110000      # typical surviving points per preprocessed KITTI scan
    if os.environ.get("BENCH_SMOKE"):
        # Tiny shapes for a CPU correctness pass over every bench section
        # (numbers are meaningless; used by CI/verification only).
        H, W, N, VALID = 16, 64, 4096, 3000

    log(f"devices: {jax.devices()}")
    log(f"bench config: B={B} H={H} W={W} N={N} valid={VALID}")

    model = OdometryModel(ModelConfig(compute_dtype=jnp.bfloat16))
    state = create_train_state(
        model, {"learning_rate": 1e-5}, jnp.zeros((B, H, W, 4))
    )

    pspec = ProjectionSpec(
        height=H, width=W,
        fov_down=float(np.deg2rad(-24.5)), fov_up=float(np.deg2rad(2.0)),
        fov_left=float(np.deg2rad(-179.9)), fov_right=float(np.deg2rad(179.9)),
    )
    cfg = StepConfig(proj=pspec, icp=IcpLossConfig())   # correspondence: image

    rng = np.random.default_rng(0)

    def scan():
        pts = rng.normal(size=(B, N, 3)).astype(np.float32)
        pts *= np.array([12.0, 12.0, 1.0], np.float32)
        pts[..., 2] -= 1.6
        valid = np.zeros((B, N), bool)
        valid[:, :VALID] = True
        nrm = rng.normal(size=(B, N, 3)).astype(np.float32)
        nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-9)
        nrm[~valid] = 0.0
        return pts, nrm, valid

    p1, n1, v1 = scan()
    p2, n2, v2 = scan()
    batch = ScanPairBatch(
        points_1=jnp.asarray(p1), normals_1=jnp.asarray(n1), valid_1=jnp.asarray(v1),
        points_2=jnp.asarray(p2), normals_2=jnp.asarray(n2), valid_2=jnp.asarray(v2),
    )

    K = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    # ---- HEADLINE: the default training path (fully-cached projections +
    # image correspondence — what `delora train` runs with augmentation off),
    # measured first so nothing can preempt it.
    arts1 = [scan_artifacts_np(p1[b], n1[b], v1[b], pspec) for b in range(B)]
    arts2 = [scan_artifacts_np(p2[b], n2[b], v2[b], pspec) for b in range(B)]
    fbatch = FullyCachedBatch(
        image_1=jnp.asarray(np.stack([a.image for a in arts1])),
        normal_image_1=jnp.asarray(np.stack([a.normal_image for a in arts1])),
        mean_range_1=jnp.asarray(
            np.asarray([a.mean_range for a in arts1], np.float32)
        ),
        image_2=jnp.asarray(np.stack([a.image for a in arts2])),
        src_points=jnp.asarray(np.stack([a.src_points for a in arts2])),
        src_normals=jnp.asarray(np.stack([a.src_normals for a in arts2])),
        src_valid=jnp.asarray(np.stack([a.src_valid for a in arts2])),
        mean_range_2=jnp.asarray(
            np.asarray([a.mean_range for a in arts2], np.float32)
        ),
    )
    extra = {}

    # ---- HEADLINE (FIRST — its compile-cache key is stable across
    # processes, measured 3.3-3.4 s warm vs the single-dispatch jit_step
    # program whose key is NOT stable and recompiles 300-450 s every run;
    # r03's incomplete artifact was exactly that program starving the
    # deadline): K steps per dispatch — the trainer's HBM-resident
    # default (trainer._scan_steps_fn, steps_per_dispatch=8): lax.scan over
    # the fullcached step with ON-DEVICE batch gather from stacked scan
    # tables, amortizing the per-dispatch relay gap (measured ~1.0-1.6 ms
    # depending on session — docs/ROOFLINE.md) to gap/K ms per step.
    from delora_tpu.training.step import (
        loss_and_metrics_fullcached,
        optax_global_norm,
    )

    # steps-per-dispatch K: env-sweepable (BENCH_KS; the K sweep amortizes
    # the ~1.0-1.6 ms relay dispatch gap to gap/K — docs/ROOFLINE.md).
    # Default 32 matches the trainer default (deployment.yaml; r5 sweep:
    # 643 pairs/s vs 606 at K=8 in the same session).
    KS = int(os.environ.get("BENCH_KS", 32))
    allarts = arts1 + arts2
    tables = (
        jnp.asarray(np.stack([a.image for a in allarts])),
        jnp.asarray(np.stack([a.normal_image for a in allarts])),
        jnp.asarray(np.asarray([a.mean_range for a in allarts], np.float32)),
        jnp.asarray(np.stack([a.src_points for a in allarts])),
        jnp.asarray(np.stack([a.src_normals for a in allarts])),
        jnp.asarray(np.stack([a.src_valid for a in allarts])),
    )
    ti = np.tile(np.arange(B, dtype=np.int32), (KS, 1))
    si = ti + B

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

    mfn = jax.jit(multi, donate_argnums=(0, 1))
    t0 = time.time()
    state, mrng, ms = mfn(state, jax.random.PRNGKey(4), tables, ti, si)
    state, mrng, ms = mfn(state, mrng, tables, ti, si)
    sync(ms["loss"])
    log(f"headline compile+warmup (K={KS}/dispatch): {time.time() - t0:.1f}s;"
        f" loss={float(ms['loss'][-1]):.5f}")
    ND = max(5, K // KS)    # >=40 steps so the timing window is ~0.5s+
    t0 = time.time()
    for _ in range(ND):
        state, mrng, ms = mfn(state, mrng, tables, ti, si)
    sync(ms["loss"])
    elapsed = time.time() - t0
    pairs_per_sec = ND * KS * B / elapsed
    log(f"headline (fullcached+image, {KS} steps/dispatch): {ND} dispatches"
        f" x {KS} steps x {B} pairs in {elapsed:.2f}s -> "
        f"{pairs_per_sec:.2f} pairs/s "
        f"({elapsed / (ND * KS) * 1000:.2f} ms/step)")

    if os.environ.get("BENCH_HEADLINE_ONLY"):
        # K-sweep mode: emit a minimal JSON line and stop (no latency /
        # MFU / parity / augment probes — those don't depend on KS).
        print(json.dumps({
            "metric": "scan_pairs_per_sec_per_chip", "value":
            round(pairs_per_sec, 3), "unit": "pairs/s",
            "vs_baseline": round(pairs_per_sec / 10.0, 3),
            "steps_per_dispatch": KS,
        }), flush=True)
        return

    # ---- Inference + serving latency (cheap small-program compiles, so they
    # run BEFORE the expensive diagnostic compiles and land in the JSON —
    # the reference's measured latency surface, time_network.py:52-93).
    try:
        from delora_tpu.ops.projection import project_image
        from delora_tpu.training.step import forward_pose, make_infer_step

        infer = make_infer_step(model, cfg)
        b1 = jax.tree.map(lambda x: x[:1], batch)
        T = infer(state.params, b1)
        sync(T)
        lat = []
        for _ in range(20):
            t0 = time.time()
            T = infer(state.params, b1)
            sync(T)
            lat.append(time.time() - t0)
        p50 = float(np.percentile(lat, 50) * 1000)
        extra["inference_p50_ms"] = round(p50, 2)
        log(f"single-pair inference p50: {p50:.1f} ms (budget 100 ms)")

        # Serving steady state: each scan projected ONCE, previous image
        # cached on device (delora_tpu/serving/stream.py push_scan).
        project1 = jax.jit(lambda p, v: project_image(p, v, pspec)[None])
        forward1 = jax.jit(
            lambda params, i1, i2: forward_pose(model.apply, params, i1, i2)[0]
        )
        img_prev = project1(batch.points_1[0], batch.valid_1[0])
        sync(forward1(state.params, img_prev, img_prev))
        lat = []
        for k in range(20):
            t0 = time.time()
            img = project1(batch.points_2[0], batch.valid_2[0])
            T1 = forward1(state.params, img_prev, img)
            sync(T1)
            img_prev = img
            lat.append(time.time() - t0)
        p50s = float(np.percentile(lat, 50) * 1000)
        extra["serving_p50_ms"] = round(p50s, 2)
        log(f"serving steady-state p50: {p50s:.1f} ms/scan (budget 100 ms)")
    except Exception as e:
        log(f"latency probes failed: {type(e).__name__}: {e}")
        extra.setdefault("inference_p50_ms", None)
        extra.setdefault("serving_p50_ms", None)

    # ---- MFU accounting (VERDICT r2 item 1): FLOPs/step from XLA's cost
    # analysis of the compiled headline program, achieved TFLOP/s, and MFU
    # against the chip's bf16 peak (v5e: 197 TFLOP/s; override with
    # BENCH_PEAK_TFLOPS for other chips).
    try:
        from delora_tpu.training.step import make_train_step_fullcached as _mk

        _fstep_cost = _mk(model, cfg, donate=False)
        # Lowered (pre-compile) cost analysis: the flops count comes from the
        # HLO itself, so no 300 s+ backend compile is paid here. Some
        # platforms (the axon relay) return None pre-compile — fall back to
        # the compiled analysis of the K-dispatch program (its executable was
        # just built/cache-loaded above, so .compile() is cheap) and divide
        # by the steps per dispatch.
        ca = _fstep_cost.lower(
            state, fbatch, jax.random.PRNGKey(0)
        ).cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        if ca is None or not ca.get("flops", 0.0):
            ca2 = (
                mfn.lower(state, jax.random.PRNGKey(4), tables, ti, si)
                .compile()
                .cost_analysis()
            )
            if isinstance(ca2, (list, tuple)):
                ca2 = ca2[0]
            # XLA's cost analysis counts a while-loop body ONCE, so the
            # scan program's flops ARE the per-step cost (verified: it
            # reports 807.11 GFLOP — exactly the single-step program's
            # number).
            ca = {"flops": float(ca2.get("flops", 0.0))}
            log(f"MFU via K-dispatch compiled analysis: "
                f"{ca['flops'] / 1e9:.2f} GFLOP/step "
                f"(while body counted once)")
        flops = float(ca.get("flops", 0.0))
        peak = float(
            __import__("os").environ.get("BENCH_PEAK_TFLOPS", 197.0)
        ) * 1e12
        step_s = elapsed / (ND * KS)
        achieved = flops / step_s
        extra["flops_per_step"] = flops
        extra["achieved_tflops"] = round(achieved / 1e12, 3)
        extra["mfu"] = round(achieved / peak, 4)
        log(f"MFU: {flops / 1e9:.2f} GFLOP/step @ {step_s * 1000:.1f} ms -> "
            f"{achieved / 1e12:.2f} TFLOP/s achieved = "
            f"{achieved / peak * 100:.1f}% of {peak / 1e12:.0f} TF bf16 peak")
    except Exception as e:
        log(f"MFU accounting failed: {type(e).__name__}: {e}")
        extra["mfu"] = None

    # ---- On-chip Pallas-vs-XLA bit-equality (VERDICT r2 item 2b / r1 item
    # 7): placement (packed + compact) and the window matcher, executed on
    # the REAL device every bench run.
    try:
        from delora_tpu.ops.correspondence import (
            image_space_correspondence_batch,
        )
        from delora_tpu.ops.projection import (
            project_compact_exact_batch, project_image_packed_batch,
        )

        pb = jax.tree.map(lambda x: x[:2], fbatch)
        pvals = jnp.concatenate([pb.src_points, pb.src_normals], axis=-1)
        xla_img = project_image_packed_batch(
            pb.src_points, pb.src_valid, pspec, values=pvals, backend="xla"
        )
        pal_img = project_image_packed_batch(
            pb.src_points, pb.src_valid, pspec, values=pvals, backend="pallas"
        )
        d_packed = float(jnp.max(jnp.abs(xla_img - pal_img)))

        rp = jnp.asarray(p1[:2])
        rv = jnp.asarray(v1[:2])
        rvals = jnp.concatenate([rp, jnp.asarray(n1[:2])], axis=-1)
        xla_c = project_compact_exact_batch(
            rp, rv, pspec, values=rvals, backend="xla"
        )
        pal_c = project_compact_exact_batch(
            rp, rv, pspec, values=rvals, backend="pallas"
        )
        d_compact = float(jnp.max(jnp.abs(xla_c.image - pal_c.image)))

        # B=1 for the matcher: a STANDALONE pallas matcher call stages its
        # whole operands in VMEM on top of the kernel's double-buffered
        # blocks (in-step calls at B=8 are fine — operands stream from HBM
        # inside the larger program); B=2 standalone overruns the 16 MB
        # scoped budget by ~0.2 MB.
        HW = H * W
        s_xyz = pal_img[..., 0:3].reshape(2, HW, 3)[:1]
        s_occ = (pal_img[..., 6].reshape(2, HW) > 0.0)[:1]
        m_x = image_space_correspondence_batch(
            s_xyz, s_occ, pb.image_1[:1], pb.normal_image_1[:1], pspec, (5, 9),
            backend="xla",
        )
        m_p = image_space_correspondence_batch(
            s_xyz, s_occ, pb.image_1[:1], pb.normal_image_1[:1], pspec, (5, 9),
            backend="pallas",
        )
        d_match = max(
            float(jnp.max(jnp.abs(m_x.target_points - m_p.target_points))),
            float(jnp.max(jnp.abs(m_x.target_normals - m_p.target_normals))),
            float(jnp.max(jnp.abs(m_x.valid ^ m_p.valid))),
        )
        extra["pallas_parity_max_abs_diff"] = {
            "placement_packed": d_packed,
            "placement_compact": d_compact,
            "window_matcher": d_match,
        }
        log(f"pallas-vs-xla on-chip parity: placement_packed={d_packed} "
            f"placement_compact={d_compact} window_matcher={d_match}")

        # SOFT blend matcher (sigma 0.3 m): its OWN try so a Mosaic failure
        # cannot null the three stable rows above (r5: the forced-pallas
        # soft kernel at (64,720,w5x9) hits a remote Mosaic compile error;
        # the auto path routes soft through the XLA matcher on every
        # platform — see ops/correspondence.py — so this row is
        # informational, not a product-path gate).
        try:
            sm_x = image_space_correspondence_batch(
                s_xyz, s_occ, pb.image_1[:1], pb.normal_image_1[:1], pspec,
                (5, 9), backend="xla", soft_sigma=0.3,
            )
            sm_p = image_space_correspondence_batch(
                s_xyz, s_occ, pb.image_1[:1], pb.normal_image_1[:1], pspec,
                (5, 9), backend="pallas", soft_sigma=0.3,
            )
            d_soft = max(
                float(jnp.max(jnp.abs(
                    sm_x.target_points - sm_p.target_points))),
                float(jnp.max(jnp.abs(
                    sm_x.target_normals - sm_p.target_normals))),
                float(jnp.max(jnp.abs(sm_x.valid ^ sm_p.valid))),
            )
            extra["pallas_parity_max_abs_diff"]["window_matcher_soft"] = d_soft
            log(f"pallas-vs-xla soft-matcher parity: {d_soft}")
        except Exception as e:  # noqa: BLE001
            log(f"soft-matcher pallas parity unavailable: {e!r:.200}")
    except Exception as e:
        log(f"pallas parity check failed: {type(e).__name__}: {e}")
        extra["pallas_parity_max_abs_diff"] = None

    # ---- Fullcached + AUGMENT timing (VERDICT r2 item 2a): the path the
    # trainer actually runs when random_point_cloud_rotations is on
    # (training/step.py loss_and_metrics_fullcached, augment branch).
    try:
        if remaining() > 60:
            acfg = cfg._replace(augment=True)
            astep = make_train_step_fullcached(model, acfg, donate=False)
            t0 = time.time()
            _, m = astep(state, fbatch, jax.random.PRNGKey(8))
            _, m = astep(state, fbatch, jax.random.PRNGKey(9))
            sync(m["loss"])
            log(f"fullcached+augment compile+warmup: {time.time() - t0:.1f}s;"
                f" loss={float(m['loss']):.5f}")
            t0 = time.time()
            for k in range(K):
                _, m = astep(state, fbatch, jax.random.PRNGKey(500 + k))
            sync(m["loss"])
            el = time.time() - t0
            aug_pps = K * B / el
            extra["augment_pairs_per_sec"] = round(aug_pps, 3)
            extra["augment_overflow_tiles"] = float(
                m["placement_overflow_tiles"]
            )
            log(f"fullcached+augment: {K} steps x {B} pairs in {el:.2f}s -> "
                f"{aug_pps:.2f} pairs/s ({el / K * 1000:.1f} ms/step); "
                f"overflow_tiles={float(m['placement_overflow_tiles']):.0f}")
    except Exception as e:
        log(f"augment bench failed: {type(e).__name__}: {e}")
        extra["augment_pairs_per_sec"] = None

    # ---- Emit the artifact NOW: every required field (headline, latency
    # p50s, MFU, Pallas parity, augment) is gathered, and the remaining
    # diagnostics can cost minutes of unstable-keyed compiles. If the
    # harness kills the process on an external deadline during those, the
    # JSON line has already been printed (BENCH_r03 lost its diagnostics to
    # exactly this failure mode). Diagnostics below log to stderr only.
    print(json.dumps({
        "metric": "scan_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / 10.0, 3),
        **extra,
    }), flush=True)

    # ---- Diagnostics (best effort, deadline-guarded, stderr only). ----
    def diagnostics():
        nonlocal state

        if remaining() > 120:
            # Single-dispatch-per-step program (the trainer's non-HBM paths).
            # Its persistent-cache key is process-unstable (see headline
            # comment), so the compile can cost 300-450 s — run it only with
            # budget to spare.
            fstep = make_train_step_fullcached(model, cfg, donate=False)
            t0 = time.time()
            _, m = fstep(state, fbatch, jax.random.PRNGKey(2))
            _, m = fstep(state, fbatch, jax.random.PRNGKey(3))
            sync(m["loss"])
            log(f"single-dispatch compile+warmup: {time.time() - t0:.1f}s; "
                f"loss={float(m['loss']):.5f}")
            t0 = time.time()
            for k in range(K):
                _, m = fstep(state, fbatch, jax.random.PRNGKey(200 + k))
            sync(m["loss"])
            el = time.time() - t0
            log(f"single-dispatch (fullcached+image): {K} steps x {B} pairs "
                f"in {el:.2f}s -> {K * B / el:.2f} pairs/s "
                f"({el / K * 1000:.1f} ms/step)")

        if remaining() > 120:
            # SOFT-match fullcached step (quality-recipe knob, sigma 0.3):
            # after the r5 fori_loop restructure the auto backend compiles
            # the Pallas soft kernel in-step — this records its throughput
            # next to the hard headline (it used to silently fall back to
            # the XLA loop exactly when quality runs wanted it).
            scfg = cfg._replace(soft_match_sigma=0.3)
            sstep = make_train_step_fullcached(model, scfg, donate=False)
            t0 = time.time()
            _, m = sstep(state, fbatch, jax.random.PRNGKey(10))
            _, m = sstep(state, fbatch, jax.random.PRNGKey(11))
            sync(m["loss"])
            log(f"soft-match compile+warmup: {time.time() - t0:.1f}s; "
                f"loss={float(m['loss']):.5f}")
            t0 = time.time()
            for k in range(K):
                _, m = sstep(state, fbatch, jax.random.PRNGKey(600 + k))
            sync(m["loss"])
            el = time.time() - t0
            log(f"soft-match (fullcached, sigma=0.3): {K} steps x {B} pairs "
                f"in {el:.2f}s -> {K * B / el:.2f} pairs/s "
                f"({el / K * 1000:.1f} ms/step)")

        cbatch = CachedTargetBatch(
            image_1=fbatch.image_1, normal_image_1=fbatch.normal_image_1,
            mean_range_1=fbatch.mean_range_1,
            points_2=batch.points_2, normals_2=batch.normals_2,
            valid_2=batch.valid_2,
        )

        if remaining() > 120:
            # Cached-target step (source projected on device every step):
            # the trainer's fallback feed when cache_source_projections is
            # off (trainer.py). The default trainer path — augment on or
            # off — is the fullcached feed measured above.
            cstep = make_train_step_cached(model, cfg, donate=False)
            t0 = time.time()
            _, m = cstep(state, cbatch, jax.random.PRNGKey(6))
            _, m = cstep(state, cbatch, jax.random.PRNGKey(7))
            sync(m["loss"])
            log(f"cached-target compile+warmup: {time.time() - t0:.1f}s; "
                f"loss={float(m['loss']):.5f}")
            t0 = time.time()
            for k in range(K):
                _, m = cstep(state, cbatch, jax.random.PRNGKey(400 + k))
            sync(m["loss"])
            el = time.time() - t0
            log(f"cached-target: {K} steps x {B} pairs in {el:.2f}s -> "
                f"{K * B / el:.2f} pairs/s ({el / K * 1000:.1f} ms/step)")

        if remaining() > 120:
            # Projective window matcher on the cached path.
            pcfg = cfg._replace(correspondence="projective")
            pstep = make_train_step_cached(model, pcfg, donate=False)
            t0 = time.time()
            _, m = pstep(state, cbatch, jax.random.PRNGKey(4))
            _, m = pstep(state, cbatch, jax.random.PRNGKey(5))
            sync(m["loss"])
            log(f"projective compile+warmup: {time.time() - t0:.1f}s; "
                f"loss={float(m['loss']):.5f}")
            t0 = time.time()
            for k in range(K):
                _, m = pstep(state, cbatch, jax.random.PRNGKey(300 + k))
            sync(m["loss"])
            el = time.time() - t0
            log(f"projective: {K} steps x {B} pairs in {el:.2f}s -> "
                f"{K * B / el:.2f} pairs/s ({el / K * 1000:.1f} ms/step)")

        if remaining() > 120:
            # Fully uncached step (both scans projected on device, image
            # matcher) — what the first epoch pays before the cache warms.
            step = make_train_step(model, cfg, donate=False)
            t0 = time.time()
            _, m = step(state, batch, jax.random.PRNGKey(0))
            _, m = step(state, batch, jax.random.PRNGKey(1))
            sync(m["loss"])
            log(f"uncached compile+warmup: {time.time() - t0:.1f}s; "
                f"loss={float(m['loss']):.5f}")
            t0 = time.time()
            for k in range(K):
                _, m = step(state, batch, jax.random.PRNGKey(100 + k))
            sync(m["loss"])
            el = time.time() - t0
            log(f"uncached: {K} steps x {B} pairs in {el:.2f}s -> "
                f"{K * B / el:.2f} pairs/s ({el / K * 1000:.1f} ms/step)")

    try:
        diagnostics()
    except Exception as e:  # diagnostics must never eat the headline
        log(f"diagnostics aborted: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
