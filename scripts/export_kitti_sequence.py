#!/usr/bin/env python3
"""Export a KITTI-layout sequence to the bag-export .npy layout or a .bag.

Counterpart of the reference's KITTI->rosbag converter (reference
scripts/convert_kitti_to_rosbag.py driving src/ros_utils/convert_to_rosbag.py:
KITTI velodyne scans -> PointCloud2 messages at 10 Hz on /velodyne_points).
TPU training hosts don't usually run ROS, so the default interchange format
is the "bag export" directory layout consumed by
``delora_tpu.data.rosbag.RosbagSequenceReader``: one ``NNNNNN.npy`` per scan
holding an ``[N, 4]`` float32 (x, y, z, intensity) array. The same
NaN/zero/min-range filtering the reference applies when *reading* bags
(rosbag_pcl_extractor.py:52-57) is applied here at export time so replaying
the export matches replaying a real bag.

With ``--bag`` (requires a ROS1 python env: rosbag + sensor_msgs + rospy
importable) an actual ``<sequence>.bag`` is written instead, matching the
reference converter's contract: PointCloud2 messages with x/y/z/intensity
FLOAT32 fields, frame_id "velodyne", topic /velodyne_points, consecutive
timestamps 0.1 s apart (10 Hz). Deviation from the reference (documented):
timestamps start at t=0 instead of wall-clock ``rospy.Time.now()`` so the
conversion is deterministic.

Usage:
  python scripts/export_kitti_sequence.py <velodyne_dir> <out_dir>
      [--sequence 07] [--limit K] [--keep-intensity] [--bag]
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_bag(scans, out_path, topic="/velodyne_points", rate_hz=10.0):
    """Write an iterable of [N, 4] float32 scans to a ROS1 bag.

    Mirrors the reference converter (src/ros_utils/convert_to_rosbag.py:33-66):
    PointCloud2 with four FLOAT32 fields (x, y, z, intensity), frame_id
    "velodyne", one message every 1/rate_hz seconds on ``topic``.
    """
    try:
        import rosbag
        import rospy
        import sensor_msgs.msg
        import std_msgs.msg
        from sensor_msgs import point_cloud2
    except ImportError as e:
        raise ImportError(
            "--bag requires a ROS1 python environment (rosbag, rospy, "
            f"sensor_msgs, std_msgs importable): {e}"
        ) from e

    pf = sensor_msgs.msg.PointField
    fields = [
        pf(name=n, offset=4 * i, datatype=pf.FLOAT32, count=1)
        for i, n in enumerate(("x", "y", "z", "intensity"))
    ]
    header = std_msgs.msg.Header()
    header.frame_id = "velodyne"
    t = rospy.Time.from_sec(0.0)
    dt = rospy.Duration.from_sec(1.0 / rate_hz)
    count = 0
    with rosbag.Bag(out_path, "w") as bag:
        for scan in scans:
            header.stamp = t
            msg = point_cloud2.create_cloud(header, fields, scan)
            bag.write(topic, msg, t)
            t += dt
            count += 1
    return count


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
    ap.add_argument(
        "--bag",
        action="store_true",
        help="write <out_root>/<sequence>.bag (requires ROS1 python env) "
        "instead of the .npy directory layout",
    )
    args = ap.parse_args()

    from delora_tpu.data.kitti import read_velodyne_bin
    from delora_tpu.data.rosbag import MIN_RANGE

    files = sorted(glob.glob(os.path.join(args.velodyne_dir, "*.bin")))
    if args.limit:
        files = files[: args.limit]
    if not files:
        raise FileNotFoundError(f"no *.bin scans in {args.velodyne_dir}")

    def filtered_scans(keep_intensity):
        for f in files:
            pts = read_velodyne_bin(f)                   # [N, 4] x,y,z,intensity
            xyz = pts[:, :3]
            finite = np.isfinite(pts).all(axis=-1)
            r = np.linalg.norm(xyz, axis=-1)
            keep = finite & (r >= MIN_RANGE)             # rosbag_pcl_extractor:52-57
            out = pts[keep] if keep_intensity else xyz[keep]
            yield out.astype(np.float32)

    if args.bag:
        os.makedirs(args.out_root, exist_ok=True)
        out_bag = os.path.join(args.out_root, args.sequence + ".bag")
        n = write_bag(filtered_scans(keep_intensity=True), out_bag)
        print(f"exported {n} scans -> {out_bag}")
        return

    out_dir = os.path.join(args.out_root, args.sequence)
    os.makedirs(out_dir, exist_ok=True)
    for i, out in enumerate(filtered_scans(args.keep_intensity)):
        np.save(os.path.join(out_dir, format(i, "06d") + ".npy"), out)

    print(f"exported {len(files)} scans -> {out_dir}")


if __name__ == "__main__":
    main()
