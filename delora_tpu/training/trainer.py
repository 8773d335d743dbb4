"""Training driver: epochs, warmup switch, checkpointing, metric logging.

Re-design of the reference Trainer (reference src/deploy/trainer.py). Key
behaviors carried over:
  * supervised identity-fit warmup that auto-switches to unsupervised when
    the epoch loss drops below 1e-2 (trainer.py:184-186),
  * resume from checkpoint restores model + optimizer and forces
    unsupervised mode (trainer.py:27-36),
  * per-epoch metric logging and latest/durable checkpoints
    (trainer.py:141-173),
  * epoch cap 10000 (trainer.py:120).

Redesigned for TPU: the inner loop feeds fixed-shape batches to one compiled
train step per (dataset, phase) pair; multi-dataset configs group batches per
dataset (per-dataset image shapes are static — SURVEY.md §7 P5). With a mesh
(see delora_tpu.parallel) the same trainer runs data-parallel: batches are
assembled per host and sharded over devices.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from delora_tpu.data.dataset import BatchLoader, ScanPairDataset
from delora_tpu.models.odometry import ModelConfig, OdometryModel
from delora_tpu.training.checkpoint import CheckpointManager
from delora_tpu.training.state import create_train_state, param_count
from delora_tpu.training.step import (
    StepConfig,
    make_train_step,
    make_train_step_cached,
    make_train_step_fullcached,
)
from delora_tpu.utils.metrics import MetricsLogger


class Trainer:
    def __init__(self, config, *, mesh=None, run_name: Optional[str] = None):
        self.config = dict(config)
        self.mesh = mesh
        self.run_name = run_name or config.get("training_run_name", "run")
        self.datasets = list(config["datasets"])
        self.batch_size = int(config["batch_size"])
        self.supervised = not bool(config["unsupervised_at_start"])

        # Model + state (initialized on the first dataset's image shape; the
        # model is shape-polymorphic across datasets).
        self.model_cfg = ModelConfig.from_config(config)
        self.model = OdometryModel(self.model_cfg)
        ds0 = config[self.datasets[0]]
        example = jnp.zeros(
            (self.batch_size, ds0["vertical_cells"], ds0["horizontal_cells"], 4),
            dtype=jnp.float32,
        )
        self.state = create_train_state(self.model, config, example)
        print(f"[trainer] model parameters: {param_count(self.state):,}")

        # Data. Target-side projections are epoch-invariant, so by default
        # they are computed once per scan on the host and fed precomputed —
        # halving per-step projection work (see
        # delora_tpu/ops/projection_host.py). Applies to the image (default)
        # and projective matchers; brute-force NN needs raw target points.
        self.cached_targets = (
            bool(config.get("cache_target_projections", True))
            and str(config.get("correspondence", "image"))
            in ("projective", "image")
        )
        # The SOURCE projection artifacts are epoch-invariant too: feed
        # fully-cached batches and no raw point cloud ever enters the
        # compiled step (projection_host.py). With augmentation on, the
        # step rotates the cached compacted survivors and re-projects them
        # on device (step.py loss_and_metrics_fullcached) — still ~3x less
        # sort work than feeding the raw padded cloud, at the documented
        # dedup-loser deviation (step.py loss_and_metrics_fullcached
        # docstring, quantified in tests/test_fullcached.py). Setting
        # cache_source_projections: false falls back to the cached-target
        # feed: raw source points enter the step, the source is projected
        # on device every step, and augmentation is deviation-free.
        self.fully_cached = self.cached_targets and bool(
            config.get("cache_source_projections", True)
        )
        self.feed = (
            "full" if self.fully_cached
            else "cached" if self.cached_targets
            else "raw"
        )
        self.pair_datasets = {
            name: ScanPairDataset(config, name) for name in self.datasets
        }
        num_shards = jax.process_count()
        self.loaders = {
            name: BatchLoader(
                ds, self.batch_size,
                shuffle=True, seed=int(config.get("seed", 0)),
                num_shards=num_shards, shard_index=jax.process_index(),
                feed=self.feed,
                native=config.get("native_io", "auto"),
            )
            for name, ds in self.pair_datasets.items()
        }

        # Warm the per-scan artifact cache up front (threaded; the native
        # projection releases the GIL) so epoch 0 runs at steady-state speed.
        if self.feed != "raw" and bool(config.get("prewarm_cache", True)):
            n_threads = int(config.get("prewarm_threads", 8))
            t0 = time.time()
            n = sum(
                ds.prewarm_artifacts(n_threads)
                for ds in self.pair_datasets.values()
            )
            if n:
                print(f"[trainer] prewarmed {n} scan projections in "
                      f"{time.time() - t0:.1f}s ({n_threads} threads)")

        # HBM-resident dataset: the per-scan artifacts are epoch-invariant,
        # so when they fit the budget they are pushed to device memory ONCE
        # as stacked [S_total, ...] tables and batches are assembled on
        # device — zero steady-state host->device traffic (the device-side
        # analog of the reference's store_dataset_in_RAM, reference
        # src/data/dataset.py:82-112; a KITTI-scale scan's artifacts are
        # ~3 MB, so the default 3072-scan budget is ~9 GB of a v5e's 16 GB
        # HBM). Under a MESH the tables shard their scan axis over the data
        # axis (parallel/pjit_step.shard_stacked_tables), so capacity scales
        # with device count: hbm_cache_scans is a PER-DEVICE budget, and the
        # v4-32 pod recipe holds all of KITTI at ~2.2 GB/chip. Multi-process
        # runs work too — every process computes the same global permutation
        # (shared seed) and runs the same SPMD program.
        self.device_cached = False
        self._device_tables: Dict[str, list] = {}
        self._pair_flat_idx: Dict[str, tuple] = {}
        budget = int(config.get("hbm_cache_scans", 3072))
        n_mesh_devices = (
            int(np.prod([self.mesh.shape[a] for a in self.mesh.axis_names]))
            if self.mesh is not None else 1
        )
        can_cache = jax.process_count() == 1 or self.mesh is not None
        if self.feed == "full" and budget > 0 and can_cache:
            total = sum(
                sum(len(s) for s in ds.scan_files)
                for ds in self.pair_datasets.values()
            )
            if total <= budget * n_mesh_devices:
                t0 = time.time()
                for name, ds in self.pair_datasets.items():
                    # Flatten (seq, scan) -> flat row; stack each of the
                    # 6 artifact leaves over all scans once.
                    flat_of = {}
                    leaves = None
                    for si, scans in enumerate(ds.scan_files):
                        for k in range(len(scans)):
                            row = jax.tree.leaves(
                                tuple(ds._scan_artifacts(si, k))
                            )
                            if leaves is None:
                                leaves = [[] for _ in row]
                            flat_of[(si, k)] = len(flat_of)
                            for slot, leaf in zip(leaves, row):
                                slot.append(np.asarray(leaf))
                    np_leaves = [np.stack(slot) for slot in leaves]
                    if self.mesh is None:
                        self._device_tables[name] = [
                            jax.device_put(leaf) for leaf in np_leaves
                        ]
                    else:
                        from delora_tpu.parallel.pjit_step import (
                            shard_stacked_tables,
                        )

                        self._device_tables[name] = shard_stacked_tables(
                            np_leaves, self.mesh
                        )
                    self._pair_flat_idx[name] = (
                        np.asarray([flat_of[p] for p in ds.pairs],
                                   dtype=np.int32),
                        np.asarray([flat_of[(si, k + 1)]
                                    for si, k in ds.pairs],
                                   dtype=np.int32),
                    )
                self.device_cached = True
                print(f"[trainer] {total} scans resident in device memory "
                      f"({time.time() - t0:.1f}s one-time transfer; "
                      f"{n_mesh_devices} device shard(s))")
            else:
                print(f"[trainer] dataset ({total} scans) exceeds "
                      f"hbm_cache_scans={budget} x {n_mesh_devices} devices; "
                      f"streaming from host")

        # Checkpointing + metrics
        self.ckpt = CheckpointManager(
            config.get("checkpoint_dir", "./checkpoints_tpu"),
            keep_every=int(config.get("checkpoint_keep_every", 5)),
        )
        # Multi-process runs: one metrics stream per process (process 0 holds
        # the canonical one) so JSONL writes never interleave across hosts.
        logger_run = self.run_name
        if jax.process_count() > 1 and jax.process_index() != 0:
            logger_run = f"{self.run_name}-proc{jax.process_index()}"
        self.logger = MetricsLogger(
            config.get("log_dir", "./runs"), config.get("experiment", "default"),
            logger_run, use_mlflow=bool(config.get("use_mlflow", False)),
        )
        self.logger.log_params(self.config)
        self.start_epoch = 0

        checkpoint = config.get("checkpoint")
        if not checkpoint and config.get("auto_resume", False):
            import os

            latest = os.path.join(self.ckpt.directory, "latest")
            if os.path.exists(latest):
                checkpoint = "latest"
                print("[trainer] auto_resume: found existing 'latest' checkpoint")
        if checkpoint:
            self.state, meta = self.ckpt.restore(self.state, checkpoint)
            self.start_epoch = int(meta.get("epoch", -1)) + 1
            self.supervised = False  # pretrained -> straight to unsupervised
            print(f"[trainer] resumed from {checkpoint} "
                  f"(epoch {self.start_epoch})")

        # Mesh runs: the sharded steps declare replicated in_shardings for
        # the state; on a multi-process mesh the state must be an explicit
        # GLOBAL replicated array (host-local arrays are rejected by pjit).
        # Replication happens AFTER restore: Orbax restores into addressable
        # host arrays, then one device_put broadcasts them onto the mesh.
        if self.mesh is not None:
            from delora_tpu.parallel.pjit_step import replicate_state

            self.state = replicate_state(self.state, self.mesh)

        self._steps: Dict[tuple, callable] = {}
        self._viz_fns: Dict[str, callable] = {}
        # In-training eval + best-state retention (eval_every_epochs).
        self.best_eval: Optional[tuple] = None   # (score, epoch)

    @property
    def eval_state(self):
        """The state to EVALUATE/DEPLOY: with ``ema_decay > 0`` the Polyak-
        averaged parameters replace the last iterate (the flat-basin wander
        stabilizer — state.track_param_ema); otherwise the live state."""
        from delora_tpu.training.state import deploy_state

        return deploy_state(self.state)

    def evaluate(self, epoch: int) -> Optional[float]:
        """Run the Tester's trajectory metric on the TESTING identifiers with
        the current parameters; keep the best state as a ``best/`` checkpoint.

        The reference evaluates offline only (reference src/deploy/tester.py:109
        — a separate run_testing invocation after training); in-training
        validation is the TPU framework's addition: the unsupervised pose
        objective has a shallow basin whose late-epoch wander makes the final
        epoch a lottery (docs/BENCH_NOTES.md r19), so periodic trajectory
        evaluation + best-checkpoint retention is how a user actually picks a
        deployable state. Enable with ``eval_every_epochs: N``; the score is
        the mean first metric (t_rel % for >=100 m sequences, else RPE m/step)
        over every evaluated sequence with ground truth.

        Single-process only (like image logging: the eval programs are jitted
        outside the mesh; multi-process runs evaluate offline via the CLI).
        """
        if jax.process_count() > 1:
            return None
        from delora_tpu.training.tester import Tester

        cfg_t = dict(self.config)
        for name in self.datasets:
            spec = dict(cfg_t[name])
            spec["data_identifiers"] = list(spec["testing_identifiers"])
            cfg_t[name] = spec
        tester = Tester(cfg_t, state=self.eval_state,
                        run_name=f"{self.run_name}_eval_ep{epoch:04d}")
        results = tester.test()
        vals = [m[0] for seqs in results.values() for m in seqs.values() if m]
        if not vals:
            return None
        score = float(np.mean(vals))
        self.logger.log_metrics({"eval_score": score}, step=epoch)
        sofar = (f"best so far {self.best_eval[0]:.3f} @ {self.best_eval[1]}"
                 if self.best_eval else "first eval")
        print(f"[trainer] eval @ epoch {epoch}: score={score:.3f} ({sofar})",
              flush=True)
        if self.best_eval is None or score < self.best_eval[0]:
            self.best_eval = (score, epoch)
            self.ckpt.save_named(
                self.state, "best", epoch, score, self.config,
                extra_meta={"eval_score": score},
            )
            print(f"[trainer] new best eval score {score:.3f} -> "
                  f"checkpoint 'best'", flush=True)
        return score

    def _scan_steps_fn(self, dataset: str, k_steps: int):
        """K optimizer steps per dispatch: ``lax.scan`` over the fullcached
        step with ON-DEVICE batch gather from the stacked HBM tables.

        On a relayed TPU each dispatch costs ~1.0-1.6 ms of round-trip gap
        (the gap itself varies by session — docs/ROOFLINE.md) on top of the
        ~10.4 ms device step; scanning K steps inside one program amortizes
        that gap to gap/K ms per step. RNG
        semantics are identical to the per-step path (the carried key is
        split once per step, exactly as the host loop does).
        """
        key = (dataset, self.supervised, "scan", k_steps)
        if key not in self._steps:
            from delora_tpu.training.step import (
                FullyCachedBatch, StepConfig, loss_and_metrics_fullcached,
                optax_global_norm,
            )

            cfg = StepConfig.from_config(
                self.config, dataset, supervised=self.supervised
            )

            if self.mesh is not None:
                from delora_tpu.parallel.pjit_step import (
                    make_sharded_scan_steps,
                )

                self._steps[key] = make_sharded_scan_steps(
                    self.model, cfg, self.mesh, k_steps
                )
                return self._steps[key]

            def steps(state, rng, tables, tgt_idx, src_idx):
                img, nimg, mr, pts, nrm, val = tables

                def body(carry, xs):
                    state, rng = carry
                    ti, si = xs
                    rng, step_rng = jax.random.split(rng)
                    batch = FullyCachedBatch(
                        img[ti], nimg[ti], mr[ti],
                        img[si], pts[si], nrm[si], val[si], mr[si],
                    )
                    grad_fn = jax.value_and_grad(
                        lambda p: loss_and_metrics_fullcached(
                            state.apply_fn, p, batch, cfg, step_rng
                        ),
                        has_aux=True,
                    )
                    (loss, (metrics, _)), grads = grad_fn(state.params)
                    new_state = state.apply_gradients(grads=grads)
                    metrics["grad_norm"] = optax_global_norm(grads)
                    return (new_state, rng), metrics

                (state, rng), metrics = jax.lax.scan(
                    body, (state, rng), (tgt_idx, src_idx), length=k_steps
                )
                return state, rng, metrics

            self._steps[key] = jax.jit(steps, donate_argnums=(0, 1))
        return self._steps[key]

    def log_images(self, epoch: int, dataset: str):
        """Six-panel training diagnostic at a probe pair, reference parity
        (deployer.py:73-100, plotting.py:12-58): target range, source range,
        NETWORK-TRANSFORMED source range, per-pixel po2pl loss map on the
        transformed source, and the target / transformed-source normal maps
        (RGB (n+1)/2) — all driven by the CURRENT model parameters."""
        try:
            import jax.numpy as jnp

            from delora_tpu import se3
            from delora_tpu.ops.correspondence import (
                image_space_correspondence_batch,
            )
            from delora_tpu.ops.projection import (
                ProjectionSpec, project_compact_exact, project_image_packed,
            )
            from delora_tpu.training.step import forward_pose
            from delora_tpu.utils.plotting import plot_training_panels

            if dataset not in self._viz_fns:
                pspec = ProjectionSpec.from_config(self.config, dataset)
                window = tuple(self.config["projective_window"])

                @jax.jit
                def viz(params, p1, v1, n1, p2, v2, n2):
                    tproj = project_compact_exact(
                        p1, v1, pspec, values=jnp.concatenate([p1, n1], -1)
                    )
                    sproj = project_compact_exact(
                        p2, v2, pspec, values=jnp.concatenate([p2, n2], -1)
                    )
                    timg = tproj.image
                    image_1 = jnp.concatenate(
                        [timg[..., 0:3], timg[..., 6:7]], axis=-1
                    )
                    nimg_t = timg[..., 3:6]
                    simg = sproj.image
                    image_2 = jnp.concatenate(
                        [simg[..., 0:3], simg[..., 6:7]], axis=-1
                    )
                    T = forward_pose(
                        self.model.apply, params, image_1[None], image_2[None]
                    )[0]
                    m = sproj.comp_mask[:, None]
                    w_pts = se3.transform_points(T, sproj.comp_vals[:, 0:3] * m)
                    w_nrm = se3.rotate_points(T, sproj.comp_vals[:, 3:6] * m)
                    wimg = project_image_packed(
                        w_pts, sproj.comp_mask, pspec,
                        values=jnp.concatenate([w_pts, w_nrm], -1),
                    )
                    HW = pspec.height * pspec.width
                    w_xyz = wimg[..., 0:3].reshape(HW, 3)
                    occ = wimg[..., 6].reshape(HW) > 0.0
                    corr = image_space_correspondence_batch(
                        w_xyz[None], occ[None], image_1[None], nimg_t[None],
                        pspec, window,
                    )
                    # po2pl residual on matched pairs where the target has a
                    # normal (icp_losses.py:196-203 semantics, per pixel).
                    nt = corr.target_normals[0]
                    has_nt = jnp.any(nt != 0.0, axis=-1)
                    resid = jnp.sum(
                        (w_xyz - corr.target_points[0]) * nt, axis=-1
                    )
                    po2pl = jnp.where(
                        corr.valid[0] & has_nt, resid ** 2, 0.0
                    ).reshape(pspec.height, pspec.width)
                    return (
                        image_1[..., 3], image_2[..., 3], wimg[..., 6],
                        po2pl, nimg_t, wimg[..., 3:6],
                    )

                self._viz_fns[dataset] = viz

            pair = self.pair_datasets[dataset].get_pair(0)
            r1, r2, rw, po2pl, nimg_t, nimg_w = self._viz_fns[dataset](
                self.state.params,
                jnp.asarray(pair["points_1"]), jnp.asarray(pair["valid_1"]),
                jnp.asarray(pair["normals_1"]),
                jnp.asarray(pair["points_2"]), jnp.asarray(pair["valid_2"]),
                jnp.asarray(pair["normals_2"]),
            )
            path = self.logger.artifact_path(
                f"images_{dataset}_{epoch:05d}.png"
            )
            plot_training_panels(
                [
                    ("Target image at time t", "range", np.asarray(r1)),
                    ("Source at time t+1", "range", np.asarray(r2)),
                    ("Network transformed source at time t+1", "range",
                     np.asarray(rw)),
                    ("Po2Pl loss (on transformed source points)", "loss",
                     np.asarray(po2pl)),
                    ("Normal map of target", "normals", np.asarray(nimg_t)),
                    ("Normal map of transformed source", "normals",
                     np.asarray(nimg_w)),
                ],
                path, iteration=epoch,
            )
        except Exception as e:  # diagnostics must never kill training
            print(f"[trainer] image logging skipped: {e}")

    def _step_fn(self, dataset: str):
        key = (dataset, self.supervised)
        if key not in self._steps:
            cfg = StepConfig.from_config(
                self.config, dataset, supervised=self.supervised
            )
            if self.mesh is not None:
                from delora_tpu.parallel.pjit_step import (
                    make_sharded_train_step,
                    make_sharded_train_step_cached,
                    make_sharded_train_step_fullcached,
                )

                make = {
                    "raw": make_sharded_train_step,
                    "cached": make_sharded_train_step_cached,
                    "full": make_sharded_train_step_fullcached,
                }[self.feed]
                self._steps[key] = make(self.model, cfg, self.mesh)
            else:
                make = {
                    "raw": make_train_step,
                    "cached": make_train_step_cached,
                    "full": make_train_step_fullcached,
                }[self.feed]
                self._steps[key] = make(self.model, cfg)
        return self._steps[key]

    def _shard_batch(self, batch):
        if self.mesh is None:
            # Async host->device copy (device_put returns immediately);
            # overlaps with in-flight compute under the prefetch queue.
            return jax.device_put(batch)
        from delora_tpu.parallel.pjit_step import shard_batch

        return shard_batch(batch, self.mesh)

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        # Metrics stay on device until the epoch ends: a single readback per
        # metric instead of one per step (each synchronous readback costs a
        # full host<->device round trip, which dominates on relayed TPUs).
        # Batches are pushed to the device `prefetch_depth` ahead so the
        # host->device copy of batch k+1 overlaps the compute of batch k.
        from collections import deque

        per_step = []
        rng = jax.random.PRNGKey(hash((epoch, 0x5EED)) & 0x7FFFFFFF)
        t0 = time.time()
        depth = max(1, int(self.config.get("prefetch_depth", 2)))
        for dataset in self.datasets:
            pending = deque()

            def run_one(device_batch):
                nonlocal rng
                rng, step_rng = jax.random.split(rng)
                self.state, metrics = step(self.state, device_batch, step_rng)
                per_step.append(metrics)

            loader = self.loaders[dataset]
            if self.device_cached:
                # HBM-resident path (mesh or not): batches gathered on device
                # from the stacked tables; K optimizer steps per dispatch
                # (lax.scan) so the per-dispatch round-trip gap is amortized.
                # The remainder chunk compiles one extra (smaller-K) program.
                # Indices are the GLOBAL permutation — identical on every
                # process (shared seed), so multi-process mesh runs execute
                # one SPMD program with no host-side batch slicing at all.
                K = max(1, int(self.config.get("steps_per_dispatch", 8)))
                indices = loader.global_epoch_indices(epoch)
                gb = loader.global_batch
                nsteps = len(indices) // gb
                tgt_all, src_all = self._pair_flat_idx[dataset]
                sel = np.asarray(indices[: nsteps * gb]).reshape(nsteps, gb)
                ti, si = tgt_all[sel], src_all[sel]
                tables = self._device_tables[dataset]
                for c in range(0, nsteps, K):
                    k = min(K, nsteps - c)
                    fn = self._scan_steps_fn(dataset, k)
                    self.state, rng, metrics = fn(
                        self.state, rng, tables, ti[c:c + k], si[c:c + k]
                    )
                    per_step.append(metrics)  # dict of [k]-vectors
                continue
            batches = loader.epoch(epoch)
            step = self._step_fn(dataset)
            for batch in batches:
                pending.append(self._shard_batch(batch))  # async device copy
                if len(pending) >= depth:
                    run_one(pending.popleft())
            while pending:
                run_one(pending.popleft())
        if not per_step:
            raise RuntimeError("No batches produced — dataset smaller than batch?")
        # ONE device->host readback for all metrics (each synchronous
        # readback costs a full round trip, which dominates short epochs).
        # Entries are scalar dicts (per-step paths) or [k]-vector dicts
        # (K-steps-per-dispatch path); both flatten to rows here.
        keys = list(per_step[0])
        mat = np.asarray(jnp.concatenate([
            jnp.stack([jnp.atleast_1d(m[k]) for k in keys], axis=-1)
            for m in per_step
        ], axis=0))
        count = mat.shape[0]
        out = {k: float(mat[:, i].mean()) for i, k in enumerate(keys)}
        out["steps"] = count
        out["epoch_seconds"] = time.time() - t0
        out["scan_pairs_per_sec"] = count * self.batch_size / out["epoch_seconds"]
        return out

    def train(self, max_epochs: Optional[int] = None):
        epochs = int(max_epochs or self.config.get("epochs", 10000))
        profile_epochs = set(self.config.get("profile_epochs", []) or [])
        for epoch in range(self.start_epoch, epochs):
            if epoch in profile_epochs:
                from delora_tpu.utils.profiling import trace

                with trace(self.logger.artifact_path("profile")):
                    metrics = self.train_epoch(epoch)
            else:
                metrics = self.train_epoch(epoch)
            metrics["supervised"] = float(self.supervised)
            self.logger.log_metrics(metrics, step=epoch)
            print(
                f"[epoch {epoch:05d}] loss={metrics['loss']:.6f} "
                f"pc={metrics['loss_pc']:.6f} po2pl={metrics['loss_po2pl']:.6f} "
                f"pl2pl={metrics['loss_pl2pl']:.6f} "
                f"pairs/s={metrics['scan_pairs_per_sec']:.1f} "
                f"supervised={self.supervised}",
                flush=True,
            )
            ckpt_every = int(self.config.get("checkpoint_every_epochs", 1))
            if epoch % max(ckpt_every, 1) == 0 or epoch == epochs - 1:
                # ALL processes participate (Orbax multihost contract);
                # CheckpointManager gates the filesystem mutations to
                # process 0 and fences them with barriers internally.
                self.ckpt.save(self.state, epoch, metrics["loss"], self.config)
            viz_every = int(self.config.get("visualize_every_epochs", 5))
            if (
                jax.process_count() == 1
                # The viz fns are jitted over the global mesh; running them
                # on process 0 only would deadlock the collective. Multi-
                # process image logging is intentionally off.
                and self.config.get("visualize_images", True)
                and epoch % viz_every == 0
            ):
                # Per configured dataset, reference parity (the reference logs
                # one image grid per dataset, deployer.py:91-100).
                for ds_name in self.datasets:
                    self.log_images(epoch, ds_name)

            eval_every = int(self.config.get("eval_every_epochs", 0))
            if eval_every and not self.supervised and (
                (epoch + 1) % eval_every == 0 or epoch == epochs - 1
            ):
                self.evaluate(epoch)

            # Warmup auto-switch (trainer.py:184-186).
            if self.supervised and metrics["loss"] < 1e-2:
                self.supervised = False
                print("[trainer] warmup converged — switching to unsupervised")
        return self.state
