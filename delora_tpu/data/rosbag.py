"""Rosbag-style dataset ingestion.

The reference reads PointCloud2 messages out of ROS bag files
(reference src/data/rosbag_scans.py:15-40, src/ros_utils/
rosbag_pcl_extractor.py:14-62), filtering NaN/zero points and ranges < 0.3 m.
TPU training hosts don't run ROS, so this module provides:

  * ``RosbagSequenceReader`` — if the ``rosbag`` package happens to be
    importable, iterate PointCloud2 messages from ``<id>*.bag`` exactly like
    the reference (same glob, same topic selection, same point filtering);
  * a directory fallback — a "bag export" layout ``<data_path>/<id>/*.npy``
    of per-scan [N, >=3] arrays, which is what
    ``scripts/export_rosbag.py``-style tooling produces offline. This keeps
    the rosbag-shaped dataset type usable end-to-end without ROS.
"""

from __future__ import annotations

import glob
import os
from typing import Iterator, Optional

import numpy as np

MIN_RANGE = 0.3


def filter_points(points: np.ndarray) -> np.ndarray:
    """NaN/zero/near-range filtering (rosbag_pcl_extractor.py:52-57)."""
    points = points[:, :3].astype(np.float32)
    finite = np.isfinite(points).all(axis=-1)
    r = np.linalg.norm(points, axis=-1)
    return points[finite & (r >= MIN_RANGE)]


class RosbagSequenceReader:
    def __init__(self, data_path: str, sequence: int, topic: Optional[str] = None):
        self.topic = topic
        self._bag_path = None
        self._npy_files = []

        bags = sorted(glob.glob(os.path.join(data_path, f"{sequence}*.bag")))
        if bags:
            try:
                import rosbag  # noqa: F401

                self._bag_path = bags[0]
                return
            except ImportError:
                raise ImportError(
                    f"Found bag file {bags[0]} but the 'rosbag' package is not "
                    "installed on this host. Export the bag to per-scan .npy "
                    "files (<data_path>/<id>/*.npy) instead."
                )
        export_dir = os.path.join(data_path, format(sequence, "02d"))
        if not os.path.isdir(export_dir):
            export_dir = os.path.join(data_path, str(sequence))
        self._npy_files = sorted(glob.glob(os.path.join(export_dir, "*.npy")))
        if not self._npy_files:
            raise FileNotFoundError(
                f"No <id>*.bag under {data_path} and no exported scans under "
                f"{export_dir} (expected per-scan .npy arrays)"
            )

    def __len__(self) -> int:
        if self._bag_path:
            import rosbag

            with rosbag.Bag(self._bag_path) as bag:
                return bag.get_message_count(topic_filters=[self.topic])
        return len(self._npy_files)

    def __iter__(self) -> Iterator[np.ndarray]:
        if self._bag_path:
            yield from self._iter_bag()
        else:
            for path in self._npy_files:
                yield filter_points(np.load(path))

    def _iter_bag(self) -> Iterator[np.ndarray]:
        import rosbag
        import sensor_msgs.point_cloud2 as pc2

        with rosbag.Bag(self._bag_path) as bag:
            for _, msg, _ in bag.read_messages(topics=[self.topic]):
                pts = np.array(
                    list(pc2.read_points(msg, field_names=("x", "y", "z"),
                                         skip_nans=True)),
                    dtype=np.float32,
                )
                yield filter_points(pts)
