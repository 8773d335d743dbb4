#!/usr/bin/env python3
"""Replay a KITTI-layout sequence against the streaming odometry engine.

Counterpart of the reference's KITTI->rosbag converter + ROS node pipeline
(reference scripts/convert_kitti_to_rosbag.py + bin/run_rosnode.py): instead
of producing a bag to replay into ROS, this drives the serving engine
directly at a fixed rate (default 10 Hz — convert_to_rosbag.py:22 timestamps),
reporting per-scan latency and the accumulated trajectory.

Usage:
  python scripts/replay_sequence.py <velodyne_dir> [--rate 10] [--limit K]
      [--checkpoint ckpt] [--out poses.txt]
"""

import argparse
import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("velodyne_dir")
    ap.add_argument("--rate", type=float, default=10.0)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--dataset", default="kitti")
    ap.add_argument("--out", default="/tmp/replay_poses.txt")
    ap.add_argument("--no-rate-limit", action="store_true")
    args = ap.parse_args()

    from delora_tpu.config import load_config
    from delora_tpu.data.kitti import read_velodyne_bin
    from delora_tpu.serving.stream import StreamingOdometry
    from delora_tpu.utils.poses import (
        TRANSFORM_LIDAR_TO_WORLD,
        write_poses_to_text_file,
    )

    config = load_config(mode="testing")
    engine = StreamingOdometry(config, checkpoint=args.checkpoint,
                               dataset=args.dataset)

    files = sorted(glob.glob(os.path.join(args.velodyne_dir, "*.bin")))
    if args.limit:
        files = files[: args.limit]
    if not files:
        raise SystemExit(f"no .bin scans under {args.velodyne_dir}")

    period = 1.0 / args.rate
    latencies, poses = [], [np.eye(4)]
    deadline_misses = 0
    L = TRANSFORM_LIDAR_TO_WORLD
    for i, path in enumerate(files):
        t_start = time.time()
        out = engine.push_scan(read_velodyne_bin(path))
        if out is not None:
            _, pose, latency = out
            latencies.append(latency)
            poses.append(L @ pose @ L.T)
            if latency > period:
                deadline_misses += 1
        if not args.no_rate_limit:
            sleep = period - (time.time() - t_start)
            if sleep > 0:
                time.sleep(sleep)

    lat_ms = np.asarray(latencies) * 1000
    print(f"replayed {len(files)} scans @ {args.rate:.0f} Hz: "
          f"p50={np.percentile(lat_ms, 50):.1f} ms "
          f"p99={np.percentile(lat_ms, 99):.1f} ms "
          f"deadline misses={deadline_misses}/{len(latencies)}")
    write_poses_to_text_file(args.out, np.stack(poses))
    print(f"trajectory -> {args.out}")


if __name__ == "__main__":
    main()
