#!/usr/bin/env python3
"""Preprocessed-scan normals inspection (matplotlib).

Replaces the reference's RViz-based normals visualizer
(reference bin/visualize_pointcloud_normals.py +
src/ros_utils/publish_point_cloud_and_normals.py:87-140) with a headless
3D quiver render — same purpose: eyeball whether the normal estimation
produced sane, sensor-facing normals.

Usage: python scripts/visualize_normals.py <preprocessed_seq_dir> [scan_idx]
       (e.g. datasets/kitti/preprocessed/sequences/07 0)
"""

import os
import sys

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(1)
    seq_dir = sys.argv[1]
    idx = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    out = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/normals_{idx:06d}.png"

    scan = np.load(os.path.join(seq_dir, "scans", f"{idx:06d}.npy"))
    normals = np.load(os.path.join(seq_dir, "normals", f"{idx:06d}.npy"))
    has_n = np.linalg.norm(normals, axis=-1) > 0
    print(f"scan {idx}: {len(scan)} points, {has_n.sum()} with normals "
          f"({100.0 * has_n.mean():.1f}%)")

    # Subsample for a legible quiver plot.
    rng = np.random.default_rng(0)
    sel = rng.choice(np.nonzero(has_n)[0], size=min(800, has_n.sum()),
                     replace=False)
    p, n = scan[sel], normals[sel]

    fig = plt.figure(figsize=(12, 9))
    ax = fig.add_subplot(projection="3d")
    bg = scan[rng.choice(len(scan), size=min(5000, len(scan)), replace=False)]
    ax.scatter(bg[:, 0], bg[:, 1], bg[:, 2], s=0.3, c="gray", alpha=0.4)
    ax.quiver(p[:, 0], p[:, 1], p[:, 2], n[:, 0], n[:, 1], n[:, 2],
              length=1.0, color="red", linewidth=0.5)
    ax.set_title(f"scan {idx}: normals ({has_n.sum()}/{len(scan)})")
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    print(f"wrote {out}")

    # Sanity stat: normals should mostly face the sensor (dot(n, p) <= 0).
    dots = np.sum(scan[has_n] * normals[has_n], axis=-1)
    frac = float((dots <= 1e-5).mean())
    print(f"sensor-facing fraction: {frac:.3f} (should be ~1.0)")


if __name__ == "__main__":
    main()
