"""Offline preprocessing: raw scans -> deduplicated point lists + normals.

Re-design of the reference's offline pipeline (reference
src/preprocessing/preprocesser.py): per scan, project at the HIGH azimuth
resolution (``horizontal_cells_preprocessing``, e.g. 2250 for KITTI vs 720 at
train time — preprocesser.py:74, the normals are deliberately estimated at the
finer resolution), estimate normals by neighborhood PCA, and write

    <preprocessed_path>/<seq:02d>/scans/NNNNNN.npy     [M, 3] float32 xyz
    <preprocessed_path>/<seq:02d>/normals/NNNNNN.npy   [M, 3] float32

— the exact on-disk contract of the reference (preprocesser.py:64-68,
consumed by dataset.py:114-122), so preprocessed data is interchangeable
between the two frameworks. The scan file holds only the points that survived
closest-point-per-pixel dedup; the normals array is row-aligned with it and
zero where no normal exists.

Unlike the reference (per-scan Python + a CPU LAPACK eigensolver), the whole
project->normals pipeline here is one jitted program; scans stream through a
fixed-size padded buffer.
"""

from __future__ import annotations

import functools
import os
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from delora_tpu.data.kitti import KittiSequenceReader
from delora_tpu.ops.normals import NormalsSpec
from delora_tpu.ops.projection import ProjectionSpec, project_scan


@functools.partial(jax.jit, static_argnames=("pspec", "nspec"))
def _preprocess_one(points, valid, pspec: ProjectionSpec, nspec: NormalsSpec):
    """Padded raw scan -> (survivor mask [N], per-point normals [N, 3]).

    Survivor-compacted on the host afterwards (ragged output is host-side).
    """
    from delora_tpu.ops.normals import normals_for_points

    proj = project_scan(points, valid, pspec)
    per_point_normals = normals_for_points(proj.image[..., :3], proj, nspec)
    return proj.survivor, per_point_normals


class Preprocessor:
    """Drives per-dataset, per-sequence preprocessing (preprocesser.py:70-101)."""

    def __init__(self, config):
        self.config = config

    def _pad_points(self, xyz: np.ndarray, capacity: int):
        n = min(len(xyz), capacity)
        out = np.zeros((capacity, 3), dtype=np.float32)
        out[:n] = xyz[:n]
        valid = np.zeros(capacity, dtype=bool)
        valid[:n] = True
        return out, valid, len(xyz) - n

    def preprocess_scan(
        self, xyz: np.ndarray, pspec: ProjectionSpec, nspec: NormalsSpec,
        capacity: int,
    ):
        points, valid, dropped = self._pad_points(xyz, capacity)
        survivor, normals = _preprocess_one(
            jnp.asarray(points), jnp.asarray(valid), pspec, nspec
        )
        survivor = np.asarray(survivor)
        scan_out = points[survivor]
        normal_out = np.asarray(normals)[survivor]
        return scan_out, normal_out, dropped

    def preview(self, dataset: str, sequence: Optional[int] = None,
                out_path: str = "/tmp/preprocess_preview.png") -> str:
        """Render the first scan's range + normal images and stop.

        Parity with the reference's single-image preprocessing preview
        (preprocesser.py:54-57, deployment_options.yaml
        ``visualize_single_img_preprocessing``).
        """
        import jax.numpy as jnp

        from delora_tpu.ops.normals import compute_normal_image
        from delora_tpu.ops.projection import project_scan
        from delora_tpu.utils.plotting import plot_range_image_grid

        spec = self.config[dataset]
        pspec = ProjectionSpec.from_config(self.config, dataset, preprocessing=True)
        nspec = NormalsSpec.from_config(self.config, dataset)
        seq = sequence if sequence is not None else spec["data_identifiers"][0]
        raw = next(iter(self._make_reader(dataset, seq)))
        capacity = int(spec["max_points"])
        points, valid, _ = self._pad_points(raw[:, :3].astype(np.float32), capacity)
        proj = project_scan(jnp.asarray(points), jnp.asarray(valid), pspec)
        nimg = np.asarray(compute_normal_image(proj.image[..., :3], nspec))
        plot_range_image_grid(
            [np.asarray(proj.image[..., 3]), nimg[..., 0], nimg[..., 1],
             nimg[..., 2]],
            ["range", "normal x", "normal y", "normal z"],
            out_path,
        )
        print(f"[preprocess] preview -> {out_path}")
        return out_path

    def run_dataset(
        self,
        dataset: str,
        sequences: Optional[Iterable[int]] = None,
        max_scans: Optional[int] = None,
        progress: bool = True,
    ) -> int:
        spec = self.config[dataset]
        pspec = ProjectionSpec.from_config(self.config, dataset, preprocessing=True)
        nspec = NormalsSpec.from_config(self.config, dataset)
        # Raw scans can exceed the train-time cap; size the staging buffer to
        # the projection grid (an upper bound on surviving points) plus slack.
        capacity = max(
            int(spec["max_points"]),
            int(np.ceil(pspec.height * pspec.width / 4096)) * 4096,
        )
        total = 0
        seq_ids = list(sequences) if sequences is not None else list(
            spec["data_identifiers"]
        )
        for seq in seq_ids:
            reader = self._make_reader(dataset, seq)
            out_dir = os.path.join(spec["preprocessed_path"], format(seq, "02d"))
            scans_dir = os.path.join(out_dir, "scans")
            normals_dir = os.path.join(out_dir, "normals")
            os.makedirs(scans_dir, exist_ok=True)
            os.makedirs(normals_dir, exist_ok=True)
            for i, raw in enumerate(reader):
                if max_scans is not None and i >= max_scans:
                    break
                scan, normals, dropped = self.preprocess_scan(
                    raw[:, :3].astype(np.float32), pspec, nspec, capacity
                )
                if dropped > 0 and progress:
                    print(f"[preprocess] {dataset}/{seq:02d}/{i:06d}: "
                          f"dropped {dropped} points beyond capacity {capacity}")
                np.save(os.path.join(scans_dir, format(i, "06d") + ".npy"), scan)
                np.save(os.path.join(normals_dir, format(i, "06d") + ".npy"), normals)
                total += 1
                if progress and i % 100 == 0:
                    print(f"[preprocess] {dataset}/{seq:02d}: scan {i}", flush=True)
        return total

    def _make_reader(self, dataset: str, seq: int):
        spec = self.config[dataset]
        kind = spec.get("dataset_type", "kitti")
        if kind == "kitti":
            return KittiSequenceReader(spec["data_path"], seq)
        if kind == "rosbag":
            from delora_tpu.data.rosbag import RosbagSequenceReader

            return RosbagSequenceReader(spec["data_path"], seq, spec.get("topic"))
        raise ValueError(f"Unknown dataset_type {kind!r} for {dataset!r}")
