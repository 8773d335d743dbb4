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
        # With augmentation off (the default) the SOURCE projection is
        # epoch-invariant too: feed fully-cached batches and no raw point
        # cloud ever enters the compiled step (projection_host.py).
        self.fully_cached = self.cached_targets and not bool(
            config["random_point_cloud_rotations"]
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

        # Checkpointing + metrics
        self.ckpt = CheckpointManager(
            config.get("checkpoint_dir", "./checkpoints_tpu"),
            keep_every=int(config.get("checkpoint_keep_every", 5)),
        )
        self.logger = MetricsLogger(
            config.get("log_dir", "./runs"), config.get("experiment", "default"),
            self.run_name, use_mlflow=bool(config.get("use_mlflow", False)),
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

        self._steps: Dict[tuple, callable] = {}
        self._viz_fns: Dict[str, callable] = {}

    def log_images(self, epoch: int, dataset: str):
        """Range/normal image panels for visual diagnostics.

        Parity with the reference's per-epoch training-image artifacts
        (deployer.py:73-100, plotting.py:12-58): target range image, source
        range image, and the target normal components at a probe pair.
        """
        try:
            import jax.numpy as jnp

            from delora_tpu.ops.projection import (
                ProjectionSpec, gather_image_attribute, project_scan,
            )
            from delora_tpu.utils.plotting import plot_range_image_grid

            if dataset not in self._viz_fns:
                pspec = ProjectionSpec.from_config(self.config, dataset)

                @jax.jit
                def viz(p1, v1, n1, p2, v2):
                    pr1 = project_scan(p1, v1, pspec)
                    pr2 = project_scan(p2, v2, pspec)
                    nimg = gather_image_attribute(n1, pr1.point_index)
                    return pr1.image[..., 3], pr2.image[..., 3], nimg

                self._viz_fns[dataset] = viz

            pair = self.pair_datasets[dataset].get_pair(0)
            r1, r2, nimg = self._viz_fns[dataset](
                jnp.asarray(pair["points_1"]), jnp.asarray(pair["valid_1"]),
                jnp.asarray(pair["normals_1"]), jnp.asarray(pair["points_2"]),
                jnp.asarray(pair["valid_2"]),
            )
            nimg = np.asarray(nimg)
            path = self.logger.artifact_path(
                f"images_{dataset}_{epoch:05d}.png"
            )
            plot_range_image_grid(
                [np.asarray(r1), np.asarray(r2),
                 nimg[..., 0], nimg[..., 1], nimg[..., 2]],
                ["range t", "range t+1", "normal x", "normal y", "normal z"],
                path,
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
            step = self._step_fn(dataset)
            pending = deque()

            def run_one(device_batch):
                nonlocal rng
                rng, step_rng = jax.random.split(rng)
                self.state, metrics = step(self.state, device_batch, step_rng)
                per_step.append(metrics)

            for batch in self.loaders[dataset].epoch(epoch):
                pending.append(self._shard_batch(batch))  # async device copy
                if len(pending) >= depth:
                    run_one(pending.popleft())
            while pending:
                run_one(pending.popleft())
        count = len(per_step)
        if count == 0:
            raise RuntimeError("No batches produced — dataset smaller than batch?")
        out = {
            k: float(jnp.mean(jnp.stack([m[k] for m in per_step])))
            for k in per_step[0]
        }
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
                f"supervised={self.supervised}"
            )
            if jax.process_index() == 0:
                ckpt_every = int(self.config.get("checkpoint_every_epochs", 1))
                if epoch % max(ckpt_every, 1) == 0 or epoch == epochs - 1:
                    self.ckpt.save(self.state, epoch, metrics["loss"], self.config)
                viz_every = int(self.config.get("visualize_every_epochs", 5))
                if self.config.get("visualize_images", True) and (
                    epoch % viz_every == 0
                ):
                    self.log_images(epoch, self.datasets[0])

            # Warmup auto-switch (trainer.py:184-186).
            if self.supervised and metrics["loss"] < 1e-2:
                self.supervised = False
                print("[trainer] warmup converged — switching to unsupervised")
        return self.state
