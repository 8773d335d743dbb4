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


def test_window_match_pallas_matches_xla_core():
    """Fused Pallas window matcher == XLA fori_loop core (same iteration
    order, same tie-breaking), interpret mode on CPU."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from delora_tpu.ops.correspondence import image_space_correspondence_core
    from delora_tpu.ops.pallas.window_match import window_match_pallas
    from delora_tpu.ops.projection import ProjectionSpec

    H, W, wv, wu = 8, 32, 3, 5
    spec = ProjectionSpec(
        height=H, width=W,
        fov_down=np.deg2rad(-24.5), fov_up=np.deg2rad(2.0),
        fov_left=np.deg2rad(-179.9), fov_right=np.deg2rad(179.9),
    )
    rng = np.random.default_rng(3)
    B = 2
    src = rng.normal(size=(B, H * W, 3)).astype(np.float32) * 4
    occ_src = rng.random((B, H * W)) > 0.2
    timg = rng.normal(size=(B, H, W, 4)).astype(np.float32) * 4
    # Some empty target pixels (zero xyz -> unoccupied).
    timg[rng.random((B, H, W)) < 0.3] = 0.0
    nimg = rng.normal(size=(B, H, W, 3)).astype(np.float32)
    nimg[np.all(timg[..., :3] == 0, axis=-1)] = 0.0

    ref = jax.vmap(
        lambda sx, so, i, n: image_space_correspondence_core(
            sx, so, i, n, spec, (wv, wu)
        )
    )(jnp.asarray(src), jnp.asarray(occ_src), jnp.asarray(timg),
      jnp.asarray(nimg))

    a = wv // 2
    occ = np.any(timg[..., :3] != 0, axis=-1, keepdims=True)
    tgt = np.concatenate([timg[..., :3], nimg, occ.astype(np.float32)], -1)
    tgt_pad = np.pad(tgt, ((0, 0), (a, a), (0, 0), (0, 0)))
    sq, xyz, nrm = window_match_pallas(
        jnp.asarray(src.reshape(B, H, W, 3).transpose(0, 3, 1, 2)),
        jnp.asarray(tgt_pad.transpose(0, 3, 1, 2)),
        wv=wv, wu=wu, interpret=True,
    )
    xyz = np.asarray(xyz).transpose(0, 2, 3, 1).reshape(B, H * W, 3)
    nrm = np.asarray(nrm).transpose(0, 2, 3, 1).reshape(B, H * W, 3)
    sq = np.asarray(sq).reshape(B, H * W)

    valid = occ_src & np.isfinite(sq)
    np.testing.assert_array_equal(valid, np.asarray(ref.valid))
    np.testing.assert_allclose(
        np.where(valid[..., None], xyz, 0.0), np.asarray(ref.target_points),
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.where(valid[..., None], nrm, 0.0), np.asarray(ref.target_normals),
        rtol=1e-6, atol=1e-6,
    )


def test_window_match_pallas_batch_chunking():
    """max_batch chunking (VMEM-overflow guard for large B) returns exactly
    the single-call result."""
    import jax.numpy as jnp
    import numpy as np

    from delora_tpu.ops.pallas.window_match import window_match_pallas

    H, W, wv, wu = 8, 32, 3, 5
    rng = np.random.default_rng(7)
    B = 5
    src = jnp.asarray(rng.normal(size=(B, 3, H, W)).astype(np.float32))
    tgt = rng.normal(size=(B, 7, H + wv - 1, W)).astype(np.float32)
    tgt[:, 6] = (rng.random((B, H + wv - 1, W)) > 0.3).astype(np.float32)
    tgt = jnp.asarray(tgt)

    whole = window_match_pallas(src, tgt, wv=wv, wu=wu, interpret=True)
    chunked = window_match_pallas(
        src, tgt, wv=wv, wu=wu, interpret=True, max_batch=2
    )
    for a, b in zip(whole, chunked):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_vmap_batched_kernel_matches_per_sample():
    """jax.vmap over nn_search_pallas routes to the natively-batched kernel
    (custom_vmap; the default vmap lift produced un-lowerable (1, tile_s)
    output blocks — broken until r5). Batched results must equal per-sample
    single-kernel results, including all-invalid-target batches."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from delora_tpu.ops.pallas.nn_search import nn_search_pallas

    rng = np.random.default_rng(3)
    B, S, T = 3, 700, 900
    src = jnp.asarray(rng.normal(size=(B, S, 3)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(B, T, 3)), jnp.float32)
    valid = jnp.asarray(rng.random((B, T)) < 0.8)
    valid = valid.at[2].set(False)          # one batch with no valid targets

    fn = lambda s, t, v: nn_search_pallas(s, t, v, interpret=True)
    idx_b, sq_b = jax.vmap(fn)(src, tgt, valid)
    for b in range(B):
        idx_1, sq_1 = fn(src[b], tgt[b], valid[b])
        np.testing.assert_array_equal(np.asarray(idx_b[b]), np.asarray(idx_1))
        np.testing.assert_allclose(np.asarray(sq_b[b]), np.asarray(sq_1),
                                   rtol=1e-6)
