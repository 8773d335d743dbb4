"""Native C++ IO layer tests (skipped if the library can't build)."""

import os

import numpy as np
import pytest

from delora_tpu.data import native_io

pytestmark = pytest.mark.skipif(
    not native_io.available(), reason="native library not built"
)


def test_native_velodyne_matches_numpy(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.normal(size=(1000, 4)).astype(np.float32)
    path = str(tmp_path / "000000.bin")
    data.tofile(path)
    out = native_io.read_velodyne_native(path)
    np.testing.assert_array_equal(out, data)


def test_native_npy_matches_numpy(tmp_path):
    rng = np.random.default_rng(1)
    data = rng.normal(size=(321, 3)).astype(np.float32)
    path = str(tmp_path / "a.npy")
    np.save(path, data)
    out = native_io.read_npy_native(path, capacity=1000)
    np.testing.assert_array_equal(out, data)


def test_native_npy_capacity_truncation(tmp_path):
    data = np.arange(300, dtype=np.float32).reshape(100, 3)
    path = str(tmp_path / "b.npy")
    np.save(path, data)
    out = native_io.read_npy_native(path, capacity=40)
    np.testing.assert_array_equal(out, data[:40])


def test_pair_loader_batches(tmp_path):
    rng = np.random.default_rng(2)
    scans, normals = [], []
    raw = []
    for i in range(6):
        s = rng.normal(size=(50 + i * 10, 3)).astype(np.float32)
        n = rng.normal(size=(50 + i * 10, 3)).astype(np.float32)
        sp = str(tmp_path / f"s{i}.npy")
        np_ = str(tmp_path / f"n{i}.npy")
        np.save(sp, s)
        np.save(np_, n)
        scans.append(sp)
        normals.append(np_)
        raw.append((s, n))

    loader = native_io.NativePairLoader(scans, normals, max_points=128,
                                        n_threads=2)
    loader.request(np.array([0, 2]))
    loader.request(np.array([4]))
    pts1, nrm1, val1, pts2, nrm2, val2 = loader.next_batch(2)
    assert pts1.shape == (2, 128, 3)
    # Batch 0: pairs (0,1) and (2,3).
    np.testing.assert_array_equal(pts1[0][:50], raw[0][0])
    np.testing.assert_array_equal(pts2[0][:60], raw[1][0])
    np.testing.assert_array_equal(nrm1[1][:70], raw[2][1])
    assert val1[0].sum() == 50 and val2[0].sum() == 60
    assert np.all(pts1[0][50:] == 0)
    # Batch 1 delivered in order: pair (4,5).
    p1, _, v1, p2, _, v2 = loader.next_batch(1)
    np.testing.assert_array_equal(p1[0][:90], raw[4][0])
    assert v2[0].sum() == 100
    loader.close()
