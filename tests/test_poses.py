import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from delora_tpu.utils import poses as P


def random_rel_transforms(k=50, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(k):
        T = np.eye(4)
        T[:3, :3] = Rotation.from_rotvec(rng.normal(size=3) * 0.01).as_matrix()
        T[:3, 3] = rng.normal(size=3) * 0.5 + np.array([1.0, 0, 0])
        out.append(T)
    return out


def test_compute_poses_identity_chain():
    poses = P.compute_poses([np.eye(4)] * 10)
    assert poses.shape == (11, 4, 4)
    np.testing.assert_allclose(poses, np.broadcast_to(np.eye(4), (11, 4, 4)), atol=1e-9)


def test_compute_poses_lidar_world_conjugation():
    # Pure forward (x in lidar) motion must appear as +z in world (KITTI cam).
    T = np.eye(4)
    T[0, 3] = 2.0
    poses = P.compute_poses([T])
    np.testing.assert_allclose(poses[1][:3, 3], [0.0, 0.0, 2.0], atol=1e-9)


def test_compute_poses_stays_valid_under_drift():
    rels = random_rel_transforms(200)
    # Inject numeric drift into the rotations.
    for T in rels:
        T[:3, :3] += np.random.default_rng(1).normal(size=(3, 3)) * 1e-7
    poses = P.compute_poses(rels)  # must not raise the SO(3) validity error
    for p in poses:
        assert P.check_validity_so3(p[:3, :3])


def test_pose_file_roundtrip(tmp_path):
    rels = random_rel_transforms(20)
    poses = P.compute_poses(rels)
    path = str(tmp_path / "poses.txt")
    P.write_poses_to_text_file(path, poses)
    back = P.read_poses_from_text_file(path)
    np.testing.assert_allclose(back, poses, atol=1e-9)


def test_kitti_metric_zero_for_perfect_trajectory():
    rels = random_rel_transforms(300)
    poses = P.compute_poses(rels)
    out = P.kitti_benchmark_summary(poses, poses)
    assert out is not None
    t_rel, r_rel = out
    assert t_rel == pytest.approx(0.0, abs=1e-6)
    assert r_rel == pytest.approx(0.0, abs=1e-5)


def test_kitti_metric_detects_scale_error():
    rels = random_rel_transforms(300)
    poses_gt = P.compute_poses(rels)
    rels_bad = [T.copy() for T in rels]
    for T in rels_bad:
        T[:3, 3] *= 1.05  # 5% scale error
    poses_bad = P.compute_poses(rels_bad)
    t_rel, _ = P.kitti_benchmark_summary(poses_gt, poses_bad)
    assert 3.0 < t_rel < 8.0  # ~5% translational error


def test_kitti_metric_none_for_short_trajectory():
    rels = random_rel_transforms(5)  # ~5 m travelled < 100 m minimum
    poses = P.compute_poses(rels)
    assert P.kitti_benchmark_summary(poses, poses) is None
