import os

import numpy as np

from delora_tpu.data.kitti import read_velodyne_bin
from delora_tpu.data.synthetic import (
    forward_trajectory,
    make_world,
    simulate_scan,
    write_kitti_layout,
)
from delora_tpu.utils.poses import read_poses_from_text_file


def test_simulated_scan_geometry():
    world = make_world(seed=0)
    pts = simulate_scan(world, np.eye(4), rings=16, azimuth_steps=180,
                        noise=0.0)
    assert len(pts) > 500
    r = np.linalg.norm(pts, axis=-1)
    assert (r > 0.1).all() and (r <= 80.0 + 1e-3).all()
    # Ground-plane hits sit at z = -1.8.
    ground = pts[np.abs(pts[:, 2] + 1.8) < 1e-3]
    assert len(ground) > 100


def test_scans_consistent_across_poses():
    """Points from two poses, mapped into world frame, must lie on the same
    surfaces (z = -1.8 for ground)."""
    world = make_world(seed=1)
    traj = forward_trajectory(2, step=1.0)
    a = simulate_scan(world, traj[0], rings=8, azimuth_steps=90, noise=0.0)
    b = simulate_scan(world, traj[1], rings=8, azimuth_steps=90, noise=0.0)
    bw = b @ traj[1][:3, :3].T + traj[1][:3, 3]
    ground_b = bw[np.abs(bw[:, 2] + 1.8) < 1e-3]
    assert len(ground_b) > 50
    aw = a @ traj[0][:3, :3].T + traj[0][:3, 3]
    ground_a = aw[np.abs(aw[:, 2] + 1.8) < 1e-3]
    assert len(ground_a) > 50


def test_write_kitti_layout(tmp_path):
    seq_dir, pose_file = write_kitti_layout(
        str(tmp_path), n_scans=5, rings=8, azimuth_steps=90
    )
    bins = sorted(os.listdir(seq_dir))
    assert len(bins) == 5
    scan = read_velodyne_bin(os.path.join(seq_dir, bins[0]))
    assert scan.shape[1] == 4 and len(scan) > 200
    poses = read_poses_from_text_file(pose_file)
    assert poses.shape == (5, 4, 4)
    # Forward lidar motion appears as +z in the KITTI world convention.
    assert poses[-1][2, 3] > 2.0
    assert abs(poses[-1][1, 3]) < 0.5
