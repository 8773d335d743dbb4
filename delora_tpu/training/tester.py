"""Evaluation engine: sequential inference, pose chaining, trajectory output.

Re-design of the reference Tester (reference src/deploy/tester.py): iterate
each test sequence in order, predict the relative transform per consecutive
scan pair, bucket transforms per (dataset, sequence) (tester.py:84-86), and on
sequence end emit KITTI pose files, trajectory plots and metrics
(tester.py:72-82, deployer.py:102-158).

TPU improvements over the reference:
  * inference is batched — consecutive pairs are independent, so eval runs at
    training batch sizes instead of the reference's forced batch_size=1
    (tester.py:29-30),
  * a quantitative t_rel / r_rel evaluator (utils/poses.py) replaces
    plot-only evaluation.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import numpy as np

from delora_tpu.data.dataset import ScanPairDataset
from delora_tpu.data.pose_data import load_kitti_poses
from delora_tpu.models.odometry import ModelConfig, OdometryModel
from delora_tpu.training.checkpoint import CheckpointManager
from delora_tpu.training.state import create_train_state
from delora_tpu.training.step import StepConfig, make_infer_step
from delora_tpu.utils import poses as pose_utils
from delora_tpu.utils.metrics import MetricsLogger


class Tester:
    def __init__(self, config, *, state=None, run_name: Optional[str] = None):
        self.config = dict(config)
        self.datasets = list(config["datasets"])
        self.batch_size = int(config.get("eval_batch_size", config["batch_size"]))
        self.run_name = run_name or config.get("run_name", "test")

        self.model_cfg = ModelConfig.from_config(config)
        self.model = OdometryModel(self.model_cfg)

        if state is None:
            if not config.get("checkpoint"):
                raise ValueError("Testing requires a checkpoint (tester.py:21-27)")
            import jax.numpy as jnp

            ds0 = config[self.datasets[0]]
            example = jnp.zeros(
                (self.batch_size, ds0["vertical_cells"], ds0["horizontal_cells"], 4)
            )
            state = create_train_state(self.model, config, example)
            ckpt_dir = config["checkpoint"]
            mgr = CheckpointManager(os.path.dirname(ckpt_dir.rstrip("/")) or ".")
            state, _ = mgr.restore(state, os.path.basename(ckpt_dir.rstrip("/")))
            # EMA-trained checkpoints evaluate the Polyak average (state.py).
            from delora_tpu.training.state import deploy_state

            state = deploy_state(state)
        self.state = state

        self.logger = MetricsLogger(
            config.get("log_dir", "./runs"), config.get("experiment", "default"),
            self.run_name, use_mlflow=bool(config.get("use_mlflow", False)),
        )
        self._datasets_cache: Dict[str, ScanPairDataset] = {}
        self._infer_images = None
        self.cached_projections = bool(
            self.config.get("cache_target_projections", True)
        )

    def _dataset(self, dataset: str) -> ScanPairDataset:
        if dataset not in self._datasets_cache:
            self._datasets_cache[dataset] = ScanPairDataset(self.config, dataset)
        return self._datasets_cache[dataset]

    def predict_sequence(self, dataset: str, sequence_index: int) -> np.ndarray:
        """All relative transforms of one sequence, batched -> [K, 4, 4].

        Default path: each scan is projected ONCE on the host (per-scan
        artifact cache — consecutive pairs share scans, so the reference's
        per-pair re-projection does ~2x the work) and inference is a pure
        batched model forward on the cached images. Falls back to full
        in-step projection when the cache is disabled.
        """
        ds = self._dataset(dataset)
        cfg = StepConfig.from_config(self.config, dataset, supervised=False)
        B = self.batch_size
        pair_ids = [i for i, (si, _) in enumerate(ds.pairs) if si == sequence_index]

        if not self.cached_projections:
            infer = make_infer_step(self.model, cfg)
            out: List[np.ndarray] = []
            for start in range(0, len(pair_ids), B):
                chunk = pair_ids[start:start + B]
                padded = chunk + [chunk[-1]] * (B - len(chunk))
                batch = ds.make_batch(padded)
                T = np.asarray(infer(self.state.params, batch))
                out.extend(T[: len(chunk)])
            return np.stack(out)

        import jax.numpy as jnp

        from delora_tpu.training.step import forward_pose

        if self._infer_images is None:
            def infer_images(params, img1, img2, scale):
                if cfg.normalization_scaling:
                    s = scale[:, None, None, None]
                    img1, img2 = img1 / s, img2 / s
                T = forward_pose(self.model.apply, params, img1, img2)
                if cfg.normalization_scaling:
                    T = T.at[:, :3, 3].multiply(scale[:, None])
                return T

            self._infer_images = jax.jit(infer_images)

        n_scans = len(ds.scan_files[sequence_index])
        arts = [ds._scan_artifacts(sequence_index, k) for k in range(n_scans)]
        images = np.stack([a.image for a in arts])
        mean_r = np.asarray([a.mean_range for a in arts], np.float32)
        out = []
        for start in range(0, len(pair_ids), B):
            n = min(B, len(pair_ids) - start)
            sel = np.arange(start, start + n)
            sel = np.concatenate([sel, np.full(B - n, sel[-1])])
            scale = jnp.asarray(0.5 * (mean_r[sel] + mean_r[sel + 1]))
            T = np.asarray(self._infer_images(
                self.state.params,
                jnp.asarray(images[sel]), jnp.asarray(images[sel + 1]),
                scale,
            ))
            out.extend(T[:n])
        return np.stack(out)

    def test(self) -> Dict[str, Dict[int, Optional[tuple]]]:
        """Evaluate every configured test sequence; returns metrics per seq.

        The per-sequence value is ``(t_rel %, r_rel deg/100m)`` (KITTI
        segment metric) when the trajectory has >= 100 m subsequences,
        otherwise ``(RPE m/step, RPE deg/step)``, or None without GT."""
        results: Dict[str, Dict[int, Optional[tuple]]] = {}
        for dataset in self.datasets:
            spec = self.config[dataset]
            results[dataset] = {}
            for seq_pos, seq_id in enumerate(spec["data_identifiers"]):
                rel = self.predict_sequence(dataset, seq_pos)
                poses = pose_utils.compute_poses(list(rel))

                tag = f"{dataset}_{seq_id:02d}"
                pose_file = self.logger.artifact_path(f"poses_{tag}.txt")
                pose_utils.write_poses_to_text_file(pose_file, poses)
                np.save(self.logger.artifact_path(f"transformations_{tag}.npy"), rel)
                np.save(self.logger.artifact_path(f"poses_{tag}.npy"), poses)

                metrics = None
                gt = load_kitti_poses(self.config, dataset, seq_id)
                if gt is not None:
                    metrics = pose_utils.kitti_benchmark_summary(gt, poses)
                    if metrics is not None:
                        t_rel, r_rel = metrics
                        print(f"[test] {tag}: t_rel={t_rel:.3f}%  "
                              f"r_rel={r_rel:.4f} deg/100m", flush=True)
                        self.logger.log_metrics(
                            {f"t_rel_{tag}": t_rel, f"r_rel_{tag}": r_rel}, step=0
                        )
                    else:
                        # Sequence too short for 100 m KITTI segments
                        # (kitti_odometry_errors): fall back to per-step RPE.
                        metrics = pose_utils.relative_pose_errors_summary(
                            gt, poses
                        )
                        if metrics is not None:
                            rpe_t, rpe_r = metrics
                            print(f"[test] {tag}: RPE t={rpe_t:.4f} m/step  "
                                  f"r={rpe_r:.4f} deg/step (seq < 100 m)")
                            self.logger.log_metrics(
                                {f"rpe_t_{tag}": rpe_t, f"rpe_r_{tag}": rpe_r},
                                step=0,
                            )
                try:
                    from delora_tpu.utils.plotting import (
                        plot_elevation,
                        plot_trajectory,
                        plot_translation_rotation_errors,
                    )

                    plot_trajectory(
                        poses, gt,
                        self.logger.artifact_path(f"map_{tag}_2d.png"),
                        title=tag,
                    )
                    plot_elevation(
                        poses, gt, self.logger.artifact_path(f"map_{tag}_y.png")
                    )
                    from delora_tpu.utils.plotting import plot_trajectory_3d

                    plot_trajectory_3d(
                        poses, gt,
                        self.logger.artifact_path(f"map_{tag}_3d.png"),
                        title=tag,
                    )
                    if gt is not None:
                        plot_translation_rotation_errors(
                            rel, gt,
                            self.logger.artifact_path(f"trans_rot_{tag}.png"),
                        )
                except Exception as e:
                    print(f"[test] plotting skipped: {e}")

                if not self.config.get("inference_only", True):
                    losses = self.evaluate_losses(dataset, seq_pos)
                    print(f"[test] {tag} losses: " + ", ".join(
                        f"{k}={v:.5f}" for k, v in losses.items()))
                    self.logger.log_metrics(
                        {f"{k}_{tag}": v for k, v in losses.items()}, step=0
                    )
                results[dataset][seq_id] = metrics
        return results

    def evaluate_losses(self, dataset: str, sequence_index: int):
        """Mean geometric losses over a sequence (reference tester.py:61-70
        non-inference path: losses computed during testing, no grads)."""
        import jax.numpy as jnp

        from delora_tpu.training.step import loss_and_metrics

        ds = self._dataset(dataset)
        # deterministic=True: dropout off at test time (reference
        # bin/run_testing.py:69-71) so evaluated losses are not stochastic.
        cfg = StepConfig.from_config(
            self.config, dataset, supervised=False
        )._replace(deterministic=True)
        fn = jax.jit(
            lambda params, batch, rng: loss_and_metrics(
                self.model.apply, params, batch, cfg, rng
            )[1][0]
        )
        pair_ids = [i for i, (si, _) in enumerate(ds.pairs) if si == sequence_index]
        B = self.batch_size
        sums, count = {}, 0
        rng = jax.random.PRNGKey(0)
        for start in range(0, len(pair_ids), B):
            chunk = pair_ids[start:start + B]
            padded = chunk + [chunk[-1]] * (B - len(chunk))
            m = fn(self.state.params, ds.make_batch(padded), rng)
            count += 1
            for k, v in m.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        return {k: v / max(count, 1) for k, v in sums.items()}
