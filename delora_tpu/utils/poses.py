"""Pose chaining, KITTI trajectory I/O, and odometry error metrics.

Host-side (numpy) utilities mirroring the reference's pose handling
(reference src/utility/poses.py): chain per-pair relative transforms into
global poses with the fixed lidar->world axis permutation (poses.py:20-29),
re-orthonormalize after every composition (poses.py:43-49), validate SO(3)
(poses.py:61-66), and write KITTI 12-value rows (poses.py:69-74).

Additionally implements the standard KITTI odometry benchmark metric
(t_rel / r_rel over 100..800 m subsequences) which the reference lacks —
required by BASELINE.md's "KITTI 09/10 t_rel within 10%" target.
"""

from __future__ import annotations

import csv
from typing import List, Optional, Sequence, Tuple

import numpy as np
from scipy.spatial.transform import Rotation

# Fixed lidar -> world (camera) frame permutation (poses.py:20-27).
TRANSFORM_LIDAR_TO_WORLD = np.array(
    [
        [0.0, -1.0, 0.0, 0.0],
        [0.0, 0.0, -1.0, 0.0],
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 1.0],
    ]
)


def rotmat_to_quat_xyzw_np(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> quaternion (x, y, z, w), numpy/scipy.

    Same convention as tf.transformations.quaternion_from_matrix used by the
    reference node (odometry_publisher.py:152-153)."""
    return Rotation.from_matrix(np.asarray(R)).as_quat()


def reorthonormalize_np(T: np.ndarray) -> np.ndarray:
    """scipy quaternion round trip, as the reference does (poses.py:43-49)."""
    r = Rotation.from_matrix(T[:3, :3])
    quat = r.as_quat()
    quat = quat / np.linalg.norm(quat)
    T = T.copy()
    T[:3, :3] = Rotation.from_quat(quat).as_matrix()
    return T


def check_validity_so3(R: np.ndarray, atol: float = 1e-6) -> bool:
    """Parity: poses.py:61-66."""
    det_valid = np.isclose(np.linalg.det(R), 1.0, atol=atol)
    inv_valid = np.allclose(R.T @ R, np.eye(3), atol=atol)
    return bool(det_valid and inv_valid)


def compute_poses(relative_transforms: Sequence[np.ndarray]) -> np.ndarray:
    """Chain T_k,k+1 (lidar frame) -> absolute world-frame poses [K+1, 4, 4].

    Parity: poses.py:11-58 — identity start, per-step re-orthonormalization,
    lidar->world conjugation, SO(3) validity check.
    """
    world = TRANSFORM_LIDAR_TO_WORLD
    world_inv = world.T
    T_lidar = np.eye(4)
    poses = [np.eye(4)]
    for T_rel in relative_transforms:
        T_rel = np.asarray(T_rel).reshape(4, 4)
        T_lidar = reorthonormalize_np(T_lidar @ T_rel)
        T_world = world @ T_lidar @ world_inv
        if not check_validity_so3(T_world[:3, :3]):
            raise ValueError("Pose is not a valid SO(3) rotation")
        poses.append(T_world)
    return np.stack(poses)


def write_poses_to_text_file(file_name: str, poses: np.ndarray) -> None:
    """KITTI 12-value rows (poses.py:69-74)."""
    with open(file_name, "w", newline="") as f:
        writer = csv.writer(f, delimiter=" ")
        for pose in poses:
            writer.writerow(np.asarray(pose).reshape(16)[:12].tolist())


def read_poses_from_text_file(file_name: str) -> np.ndarray:
    """KITTI pose file -> [K, 4, 4]."""
    rows = np.loadtxt(file_name).reshape(-1, 12)
    poses = np.tile(np.eye(4), (len(rows), 1, 1))
    poses[:, :3, :4] = rows.reshape(-1, 3, 4)
    return poses


# ---------------------------------------------------------------------------
# KITTI odometry benchmark metric (Geiger et al. CVPR'12): average relative
# translational error (%) and rotational error (deg/m) over subsequences of
# length 100..800 m.
# ---------------------------------------------------------------------------

KITTI_LENGTHS = (100.0, 200.0, 300.0, 400.0, 500.0, 600.0, 700.0, 800.0)


def trajectory_distances(poses: np.ndarray) -> np.ndarray:
    d = np.linalg.norm(np.diff(poses[:, :3, 3], axis=0), axis=-1)
    return np.concatenate([[0.0], np.cumsum(d)])


def _first_frame_past(dist: np.ndarray, start: int, length: float) -> int:
    target = dist[start] + length
    idx = np.searchsorted(dist, target, side="left")
    return int(idx) if idx < len(dist) else -1


def kitti_odometry_errors(
    poses_gt: np.ndarray,
    poses_est: np.ndarray,
    lengths: Sequence[float] = KITTI_LENGTHS,
    step: int = 10,
) -> List[Tuple[int, float, float, float]]:
    """Per-subsequence errors: (first_frame, r_err [rad/m], t_err [ratio], length)."""
    n = min(len(poses_gt), len(poses_est))
    poses_gt, poses_est = poses_gt[:n], poses_est[:n]
    dist = trajectory_distances(poses_gt)
    errors = []
    for first in range(0, n, step):
        for length in lengths:
            last = _first_frame_past(dist, first, length)
            if last < 0:
                continue
            delta_gt = np.linalg.inv(poses_gt[first]) @ poses_gt[last]
            delta_est = np.linalg.inv(poses_est[first]) @ poses_est[last]
            err = np.linalg.inv(delta_est) @ delta_gt
            t_err = np.linalg.norm(err[:3, 3]) / length
            cos = np.clip((np.trace(err[:3, :3]) - 1.0) * 0.5, -1.0, 1.0)
            r_err = np.arccos(cos) / length
            errors.append((first, float(r_err), float(t_err), float(length)))
    return errors


def relative_pose_errors_summary(
    poses_gt: np.ndarray, poses_est: np.ndarray
) -> Optional[Tuple[float, float]]:
    """Per-step relative pose error -> (mean trans err m, mean rot err deg).

    The scale-free companion to the KITTI segment metric: the KITTI benchmark
    needs >= 100 m subsequences (kitti_odometry_errors), so short sequences
    (unit tests, synthetic worlds, quick sanity runs) get RPE instead —
    error of each consecutive-step relative transform against ground truth,
    computed in the common world frame.
    """
    n = min(len(poses_gt), len(poses_est))
    if n < 2:
        return None
    errs_t, errs_r = [], []
    for i in range(n - 1):
        g = np.linalg.inv(poses_gt[i]) @ poses_gt[i + 1]
        e = np.linalg.inv(poses_est[i]) @ poses_est[i + 1]
        d = np.linalg.inv(e) @ g
        errs_t.append(np.linalg.norm(d[:3, 3]))
        ang = np.arccos(np.clip((np.trace(d[:3, :3]) - 1.0) / 2.0, -1.0, 1.0))
        errs_r.append(ang)
    return float(np.mean(errs_t)), float(np.degrees(np.mean(errs_r)))


def kitti_benchmark_summary(
    poses_gt: np.ndarray, poses_est: np.ndarray
) -> Optional[Tuple[float, float]]:
    """-> (t_rel %, r_rel deg/100m) averaged over all subsequences, or None."""
    errors = kitti_odometry_errors(poses_gt, poses_est)
    if not errors:
        return None
    t_rel = float(np.mean([e[2] for e in errors])) * 100.0
    r_rel = float(np.mean([e[1] for e in errors])) * 180.0 / np.pi * 100.0
    return t_rel, r_rel
