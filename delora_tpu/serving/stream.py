"""Streaming odometry engine — the 10 Hz real-time inference path.

Replaces the reference's ROS node (reference src/ros_utils/
odometry_publisher.py): the node keeps the previous cloud, projects both
scans, runs the model under no_grad, publishes the relative transform, and a
TF integrator accumulates T_0_t (odometry_integrator.py:81-105). ROS itself is
out of scope on TPU hosts (SURVEY.md §7 P5); this engine preserves the
contract — scan in, (relative transform, accumulated pose, latency) out at
<= 100 ms/scan — behind a stdin/stdout JSONL protocol and a Python API that a
transport shim (ROS bridge, gRPC, socket) can wrap.

Input filtering parity (odometry_publisher.py:91-100, :180-188 and
rosbag_pcl_extractor.py:52-57): drop NaN / all-zero points and points with
range < 0.3 m.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from delora_tpu.data.kitti import read_velodyne_bin
from delora_tpu.models.odometry import ModelConfig, OdometryModel
from delora_tpu.training.checkpoint import CheckpointManager
from delora_tpu.training.state import create_train_state
from delora_tpu.training.step import forward_pose
from delora_tpu.ops.projection import ProjectionSpec, project_image

MIN_RANGE = 0.3


class OdometryIntegrator:
    """Accumulates T_0_t = T_0_{t-1} @ T_{t-1,t} (odometry_integrator.py:97-105)."""

    def __init__(self):
        self.pose = np.eye(4)

    def integrate(self, relative: np.ndarray) -> np.ndarray:
        from delora_tpu.utils.poses import reorthonormalize_np

        self.pose = reorthonormalize_np(self.pose @ relative)
        return self.pose


def filter_scan(points: np.ndarray) -> np.ndarray:
    """Drop NaN/zero points and range < 0.3 m."""
    points = points[:, :3]
    finite = np.isfinite(points).all(axis=-1)
    r = np.linalg.norm(points, axis=-1)
    keep = finite & (r >= MIN_RANGE)
    return points[keep]


class StreamingOdometry:
    def __init__(self, config, checkpoint: Optional[str] = None,
                 dataset: str = "kitti", state=None):
        self.config = config
        self.dataset = dataset
        spec = config[dataset]
        self.max_points = int(spec["max_points"])
        self.pspec = ProjectionSpec.from_config(config, dataset)

        self.model = OdometryModel(ModelConfig.from_config(config))
        if state is None:
            example = jnp.zeros(
                (1, self.pspec.height, self.pspec.width, 4), jnp.float32
            )
            state = create_train_state(self.model, config, example)
            if checkpoint:
                import os

                mgr = CheckpointManager(
                    os.path.dirname(checkpoint.rstrip("/")) or "."
                )
                state, _ = mgr.restore(
                    state, os.path.basename(checkpoint.rstrip("/"))
                )
        # EMA-trained checkpoints deploy the Polyak average (state.py).
        from delora_tpu.training.state import deploy_state

        self.params = deploy_state(state).params

        # Each scan is projected exactly ONCE: the projected image stays on
        # device and is reused as img_prev at the next push (the reference
        # node re-projects the kept previous cloud every callback,
        # odometry_publisher.py:137-140). Two jitted programs = two cheap
        # async dispatches; no extra host<->device traffic.
        @jax.jit
        def _project(pts, valid):
            # Image-only single-sort projection: the serving path needs no
            # survivor/index artifacts (SURVEY.md §3.4 — no normals, no
            # KD-tree at inference).
            return project_image(pts, valid, self.pspec)[None]

        @jax.jit
        def _forward(params, img_prev, img_cur):
            return forward_pose(self.model.apply, params, img_prev, img_cur)[0]

        self._project = _project
        self._forward = _forward
        self._prev_img = None
        self.integrator = OdometryIntegrator()

    def _pad(self, points: np.ndarray):
        n = min(len(points), self.max_points)
        out = np.zeros((self.max_points, 3), np.float32)
        out[:n] = points[:n]
        valid = np.zeros(self.max_points, bool)
        valid[:n] = True
        return jnp.asarray(out), jnp.asarray(valid)

    def push_scan(self, points: np.ndarray):
        """Feed one raw scan; returns (T_rel, T_abs, latency_s) or None for
        the first scan (no pair yet)."""
        t0 = time.time()
        pts, valid = self._pad(filter_scan(points))
        img = self._project(pts, valid)
        if self._prev_img is None:
            self._prev_img = img
            return None
        T = np.asarray(self._forward(self.params, self._prev_img, img))
        self._prev_img = img
        pose = self.integrator.integrate(T)
        return T, pose, time.time() - t0

    def serve_stdin(self):
        """JSONL protocol: {"scan": "<path .npy|.bin>"} per line ->
        {"relative": [...], "pose": [...], "latency_ms": x} per line."""
        print(json.dumps({"ready": True, "dataset": self.dataset}), flush=True)
        for line in sys.stdin:
            line = line.strip()
            if not line:
                continue
            try:
                msg = json.loads(line)
                path = msg["scan"]
                scan = (
                    read_velodyne_bin(path)
                    if path.endswith(".bin")
                    else np.load(path)
                )
                out = self.push_scan(np.asarray(scan, np.float32))
                if out is None:
                    print(json.dumps({"first_scan": True}), flush=True)
                    continue
                T, pose, latency = out
                print(json.dumps({
                    "relative": np.round(T, 6).tolist(),
                    "pose": np.round(pose, 6).tolist(),
                    "latency_ms": round(latency * 1000, 2),
                }), flush=True)
            except Exception as e:  # serve loop must not die on one bad scan
                print(json.dumps({"error": str(e)}), flush=True)
