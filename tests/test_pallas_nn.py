"""Pallas NN kernel, interpret mode on CPU (compiled path exercised on TPU
by bench/perf runs)."""

import numpy as np
from scipy.spatial import cKDTree

import jax.numpy as jnp

from delora_tpu.ops.pallas.nn_search import nn_search_pallas


def test_interpret_matches_kdtree():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(700, 3)).astype(np.float32) * 5
    tgt = rng.normal(size=(900, 3)).astype(np.float32) * 5
    valid = np.ones(900, bool)
    valid[100:200] = False

    idx, sq = nn_search_pallas(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(valid),
        tile_s=128, tile_t=256, interpret=True,
    )
    idx, sq = np.asarray(idx), np.asarray(sq)

    tree = cKDTree(tgt[valid])
    dist, kidx = tree.query(src)
    # Map kd indices back to the unfiltered target array.
    remap = np.nonzero(valid)[0]
    ours_d = np.linalg.norm(tgt[idx] - src, axis=-1)
    np.testing.assert_allclose(ours_d, dist, atol=1e-2)
    assert valid[idx].all()           # never matches padding/invalid
    agree = idx == remap[kidx]
    assert agree.mean() > 0.95        # rest are fp near-ties


def test_no_valid_targets_flagged():
    src = np.zeros((130, 3), np.float32)
    tgt = np.ones((200, 3), np.float32)
    valid = np.zeros(200, bool)
    idx, sq = nn_search_pallas(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(valid),
        tile_s=128, tile_t=128, interpret=True,
    )
    assert np.all(np.asarray(sq) >= 1e29)


def test_ragged_sizes_padded_correctly():
    rng = np.random.default_rng(1)
    src = rng.normal(size=(333, 3)).astype(np.float32)
    tgt = rng.normal(size=(555, 3)).astype(np.float32)
    valid = np.ones(555, bool)
    idx, sq = nn_search_pallas(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(valid),
        tile_s=128, tile_t=128, interpret=True,
    )
    assert idx.shape == (333,) and sq.shape == (333,)
    tree = cKDTree(tgt)
    dist, _ = tree.query(src)
    np.testing.assert_allclose(np.sqrt(np.asarray(sq)), dist, atol=1e-2)
