"""KITTI odometry raw-data ingestion.

Replaces the reference's pykitti-based reader (reference
src/data/kitti_scans.py:35-50) with a dependency-free binary reader: KITTI
velodyne scans are flat little-endian float32 files of (x, y, z, intensity)
rows. A C++ threaded reader (native/) accelerates bulk preprocessing; this
module is the always-available pure-numpy path.
"""

from __future__ import annotations

import glob
import os
from typing import Iterator, List

import numpy as np


def read_velodyne_bin(path: str) -> np.ndarray:
    """One scan -> [N, 4] float32 (x, y, z, intensity)."""
    data = np.fromfile(path, dtype=np.float32)
    if data.size % 4 != 0:
        raise ValueError(f"Corrupt velodyne file (size % 4 != 0): {path}")
    return data.reshape(-1, 4)


class KittiSequenceReader:
    """Iterates the scans of one KITTI sequence directory.

    Layout parity with the reference (kitti_scans.py:41-47):
    ``<data_path>/<seq:02d>/velodyne/*.bin``.
    """

    def __init__(self, data_path: str, sequence: int):
        self.sequence_dir = os.path.join(data_path, format(sequence, "02d"))
        self.files: List[str] = sorted(
            glob.glob(os.path.join(self.sequence_dir, "velodyne", "*.bin"))
        )
        if not self.files:
            raise FileNotFoundError(
                f"No velodyne scans under {self.sequence_dir}/velodyne"
            )

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, i: int) -> np.ndarray:
        return read_velodyne_bin(self.files[i])

    def __iter__(self) -> Iterator[np.ndarray]:
        for f in self.files:
            yield read_velodyne_bin(f)
