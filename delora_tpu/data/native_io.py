"""ctypes bindings to the native IO runtime (native/delora_io.cpp).

The C++ layer is the GIL-free counterpart of the reference's DataLoader
worker processes (reference src/deploy/trainer.py:95-101): threaded .npy/.bin
reading + padding into fixed-shape batch buffers. Python-only fallbacks exist
everywhere; this module returns None handles when the library isn't built
(``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libdelora_io.so",
)
_lib = None


def _load(build_if_missing: bool = True):
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build_if_missing:
        try:
            subprocess.run(
                ["make", "-C", os.path.dirname(_LIB_PATH)],
                check=True, capture_output=True,
            )
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.dio_read_velodyne.restype = ctypes.c_int
    lib.dio_read_velodyne.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int
    ]
    lib.dio_read_npy_f32.restype = ctypes.c_int
    lib.dio_read_npy_f32.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int,
    ]
    lib.dio_loader_create.restype = ctypes.c_void_p
    lib.dio_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.dio_loader_request.restype = ctypes.c_long
    lib.dio_loader_request.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int
    ]
    lib.dio_loader_next.restype = ctypes.c_int
    lib.dio_loader_next.argtypes = [ctypes.c_void_p] + [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_ubyte),
    ] * 2
    lib.dio_loader_destroy.argtypes = [ctypes.c_void_p]
    lib.dio_project_scan.restype = ctypes.c_int
    lib.dio_project_scan.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_ubyte),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return lib


def project_scan_native(points: np.ndarray, valid: np.ndarray, spec):
    """Native twin of ops.projection_host.project_scan_np.

    -> (image [H,W,4] f32, point_index [H,W] i32, mean_range float), or None
    if the library isn't available. Same winner/tie semantics (scatter-min
    with strict '<': smallest index wins exact range ties, like the stable
    sorts in the numpy/XLA paths).
    """
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(np.asarray(points, np.float32)[:, :3])
    val = np.ascontiguousarray(np.asarray(valid), np.uint8)
    H, W = spec.height, spec.width
    image = np.zeros((H, W, 4), np.float32)
    point_index = np.zeros((H, W), np.int32)
    mean_range = ctypes.c_float(0.0)
    n = lib.dio_project_scan(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        val.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        len(pts), H, W,
        spec.fov_up, spec.fov_down, spec.fov_left, spec.fov_right,
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        point_index.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(mean_range),
    )
    if n < 0:
        return None
    return image, point_index, float(mean_range.value)


def available() -> bool:
    return _load() is not None


def read_velodyne_native(path: str, capacity: int = 200_000) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    buf = np.empty((capacity, 4), np.float32)
    n = lib.dio_read_velodyne(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        capacity,
    )
    if n < 0:
        raise IOError(f"native velodyne read failed: {path}")
    return buf[:n].copy()


def read_npy_native(path: str, capacity: int, cols: int = 3) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    buf = np.empty((capacity, cols), np.float32)
    n = lib.dio_read_npy_f32(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        capacity, cols,
    )
    if n < 0:
        raise IOError(f"native npy read failed: {path}")
    return buf[:n].copy()


class NativePairLoader:
    """Threaded batch producer over preprocessed scan/normal file lists.

    Usage: request batches ahead (pipelined), then drain with ``next_batch``.
    """

    def __init__(self, scan_paths: List[str], normal_paths: List[str],
                 max_points: int, n_threads: int = 4):
        lib = _load()
        if lib is None:
            raise RuntimeError("native IO library unavailable (make -C native)")
        self._lib = lib
        self.max_points = max_points
        n = len(scan_paths)
        self._scan_arr = (ctypes.c_char_p * n)(*[p.encode() for p in scan_paths])
        self._norm_arr = (ctypes.c_char_p * n)(*[p.encode() for p in normal_paths])
        self._handle = lib.dio_loader_create(
            self._scan_arr, self._norm_arr, n, max_points, n_threads
        )

    def request(self, first_scan_indices: np.ndarray) -> int:
        idx = np.ascontiguousarray(first_scan_indices, dtype=np.int32)
        return int(self._lib.dio_loader_request(
            self._handle, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            len(idx),
        ))

    def next_batch(self, batch_size: int):
        mp = self.max_points
        f = lambda: np.empty((batch_size, mp, 3), np.float32)
        u = lambda: np.empty((batch_size, mp), np.uint8)
        pts1, nrm1, pts2, nrm2 = f(), f(), f(), f()
        val1, val2 = u(), u()
        args = []
        for arr in (pts1, nrm1):
            args.append(arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        args.append(val1.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
        for arr in (pts2, nrm2):
            args.append(arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        args.append(val2.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
        got = self._lib.dio_loader_next(self._handle, *args)
        if got < 0:
            raise RuntimeError("native loader shut down")
        if got != batch_size:
            raise RuntimeError(f"batch size mismatch: {got} != {batch_size}")
        return (pts1, nrm1, val1.astype(bool), pts2, nrm2, val2.astype(bool))

    def close(self):
        if self._handle:
            self._lib.dio_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
