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


def test_rotated_plane_segment_intersection():
    """Yawed wall: ray hits satisfy the plane equation and stay in bounds."""
    import numpy as np

    from delora_tpu.data.synthetic import RotatedPlaneSegment, _add_box_yawed

    yaw = 0.7
    c, s = np.cos(yaw), np.sin(yaw)
    ex = np.array([c, s, 0.0])
    seg = RotatedPlaneSegment(ex * 10.0, ex, np.array([-s, c, 0.0]),
                              np.array([0.0, 0.0, 1.0]), 2.0, 1.5)
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(500, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = np.zeros((500, 3))
    t = seg.intersect(origins, dirs)
    hit = np.isfinite(t)
    assert hit.any()
    p = dirs[hit] * t[hit][:, None]
    np.testing.assert_allclose((p - seg.center) @ seg.normal, 0.0, atol=1e-9)
    assert np.all(np.abs((p - seg.center) @ seg.a1) <= 2.0 + 1e-9)
    assert np.all(np.abs((p - seg.center) @ seg.a2) <= 1.5 + 1e-9)


def test_yawed_world_scan_and_cull():
    """Yawed-box worlds ray-cast and cull like axis-aligned ones, and their
    wall normals span azimuths outside {0, 90, 180, 270} deg."""
    import numpy as np

    from delora_tpu.data.synthetic import (
        cull_world, forward_trajectory, make_world_along, simulate_scan,
    )

    traj = forward_trajectory(40, step=0.8)
    world = make_world_along(traj, n_boxes=40, seed=1, lateral=(6.0, 25.0),
                             yawed=True)
    culled = cull_world(world, traj[0][:3, 3], max_range=80.0)
    assert 0 < len(culled) <= len(world)
    pts = simulate_scan(world, traj[0], rings=16, azimuth_steps=300)
    assert len(pts) > 1000
    # normal azimuth diversity of the generated walls
    from delora_tpu.data.synthetic import RotatedPlaneSegment

    az = [np.arctan2(w.normal[1], w.normal[0])
          for w in world if isinstance(w, RotatedPlaneSegment)]
    frac_offaxis = np.mean([min(abs(a % (np.pi / 2)),
                                np.pi / 2 - abs(a % (np.pi / 2))) > 0.1
                            for a in az])
    assert frac_offaxis > 0.5
