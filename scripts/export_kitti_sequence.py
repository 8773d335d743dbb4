#!/usr/bin/env python3
"""Export a KITTI-layout sequence to the bag-export .npy layout.

Counterpart of the reference's KITTI->rosbag converter (reference
scripts/convert_kitti_to_rosbag.py driving src/ros_utils/convert_to_rosbag.py:
KITTI velodyne scans -> PointCloud2 messages at 10 Hz on /velodyne_points).
TPU training hosts don't run ROS, so the interchange format here is the
"bag export" directory layout consumed by
``delora_tpu.data.rosbag.RosbagSequenceReader``: one ``NNNNNN.npy`` per scan
holding an ``[N, 4]`` float32 (x, y, z, intensity) array. The same
NaN/zero/min-range filtering the reference applies when *reading* bags
(rosbag_pcl_extractor.py:52-57) is applied here at export time so replaying
the export matches replaying a real bag.

Usage:
  python scripts/export_kitti_sequence.py <velodyne_dir> <out_dir>
      [--sequence 07] [--limit K] [--keep-intensity]
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("velodyne_dir", help="directory of KITTI *.bin scans")
    ap.add_argument("out_root", help="bag-export root (out_root/<sequence>/*.npy)")
    ap.add_argument("--sequence", default="07")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument(
        "--keep-intensity",
        action="store_true",
        help="write [N,4] x,y,z,intensity instead of [N,3]",
    )
    args = ap.parse_args()

    from delora_tpu.data.kitti import read_velodyne_bin
    from delora_tpu.data.rosbag import MIN_RANGE

    files = sorted(glob.glob(os.path.join(args.velodyne_dir, "*.bin")))
    if args.limit:
        files = files[: args.limit]
    if not files:
        raise FileNotFoundError(f"no *.bin scans in {args.velodyne_dir}")

    out_dir = os.path.join(args.out_root, args.sequence)
    os.makedirs(out_dir, exist_ok=True)

    for i, f in enumerate(files):
        pts = read_velodyne_bin(f)                       # [N, 4] x,y,z,intensity
        xyz = pts[:, :3]
        finite = np.isfinite(pts).all(axis=-1)
        r = np.linalg.norm(xyz, axis=-1)
        keep = finite & (r >= MIN_RANGE)                 # rosbag_pcl_extractor:52-57
        out = pts[keep] if args.keep_intensity else xyz[keep]
        np.save(os.path.join(out_dir, format(i, "06d") + ".npy"),
                out.astype(np.float32))

    print(f"exported {len(files)} scans -> {out_dir}")


if __name__ == "__main__":
    main()
