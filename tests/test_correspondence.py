import numpy as np
import pytest
from scipy.spatial import cKDTree

import jax.numpy as jnp

from delora_tpu.ops.correspondence import (
    brute_force_correspondence,
    image_space_correspondence_batch,
    projective_correspondence,
)
from delora_tpu.ops.projection import ProjectionSpec, project_scan

SPEC = ProjectionSpec(
    height=16, width=64,
    fov_down=np.deg2rad(-24.5), fov_up=np.deg2rad(2.0),
    fov_left=np.deg2rad(-179.9), fov_right=np.deg2rad(179.9),
)


def clouds(seed=0, n_src=300, n_tgt=400):
    rng = np.random.default_rng(seed)
    src = rng.normal(size=(n_src, 3)).astype(np.float32) * 5.0
    tgt = rng.normal(size=(n_tgt, 3)).astype(np.float32) * 5.0
    return src, tgt


def test_brute_force_matches_kdtree():
    src, tgt = clouds()
    src_valid = np.ones(len(src), dtype=bool)
    tgt_valid = np.ones(len(tgt), dtype=bool)
    tgt_valid[50:80] = False  # padding region must never match
    nrm = np.zeros_like(tgt)

    corr = brute_force_correspondence(
        jnp.asarray(src), jnp.asarray(src_valid),
        jnp.asarray(tgt), jnp.asarray(tgt_valid), jnp.asarray(nrm),
        tile=128,
    )
    tree = cKDTree(tgt[tgt_valid])
    dist, idx = tree.query(src)
    # The matmul-form distance (|s|^2+|t|^2-2s.t in f32) can pick a different
    # but equidistant-within-epsilon neighbor; compare achieved distances.
    ours = np.linalg.norm(np.asarray(corr.target_points) - src, axis=-1)
    np.testing.assert_allclose(ours, dist, atol=1e-2)
    exact = ours <= dist + 1e-6
    assert exact.mean() > 0.95
    np.testing.assert_allclose(
        np.asarray(corr.target_points)[exact], tgt[tgt_valid][idx][exact], atol=1e-5
    )


def test_brute_force_respects_source_mask():
    src, tgt = clouds(seed=1)
    src_valid = np.zeros(len(src), dtype=bool)
    src_valid[:10] = True
    corr = brute_force_correspondence(
        jnp.asarray(src), jnp.asarray(src_valid),
        jnp.asarray(tgt), jnp.ones(len(tgt), dtype=bool),
        jnp.zeros_like(jnp.asarray(tgt)), tile=64,
    )
    valid = np.asarray(corr.valid)
    assert valid[:10].all() and not valid[10:].any()
    assert np.all(np.asarray(corr.target_points)[~valid] == 0.0)


def test_projective_finds_exact_self_matches():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(500, 3)).astype(np.float32) * np.array([8, 8, 0.5], np.float32)
    pts[:, 2] -= 1.5
    valid = np.ones(500, dtype=bool)
    proj = project_scan(jnp.asarray(pts), jnp.asarray(valid), SPEC)

    survivors = np.asarray(proj.survivor)
    src = pts[survivors]
    normal_img = jnp.zeros((SPEC.height, SPEC.width, 3))
    corr = projective_correspondence(
        jnp.asarray(src), jnp.ones(len(src), dtype=bool),
        proj.image, normal_img, SPEC, window=(3, 3),
    )
    # Every surviving point projects onto its own pixel -> distance 0.
    np.testing.assert_allclose(np.asarray(corr.sq_dist), 0.0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(corr.target_points), src, atol=1e-6)


def test_projective_window_finds_nearby_target():
    # Source = slightly perturbed target points: the window search should find
    # the unperturbed original within a small distance.
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(800, 3)).astype(np.float32) * np.array([8, 8, 0.5], np.float32)
    pts[:, 2] -= 1.5
    proj = project_scan(jnp.asarray(pts), jnp.ones(800, dtype=bool), SPEC)
    survivors = np.asarray(proj.survivor)
    src = pts[survivors] + rng.normal(size=(survivors.sum(), 3)).astype(np.float32) * 0.02

    corr = projective_correspondence(
        jnp.asarray(src), jnp.ones(len(src), dtype=bool),
        proj.image, jnp.zeros((SPEC.height, SPEC.width, 3)), SPEC, window=(5, 9),
    )
    valid = np.asarray(corr.valid)
    assert valid.mean() > 0.99
    assert np.sqrt(np.asarray(corr.sq_dist)[valid]).mean() < 0.2


def test_projective_azimuth_wraparound():
    # A target point right at the +/-pi seam must be found from the other side.
    tgt = np.array([[-10.0, -0.01, -1.0]], dtype=np.float32)   # azimuth ~ -pi
    proj = project_scan(jnp.asarray(tgt), jnp.ones(1, dtype=bool), SPEC)
    src = np.array([[-10.0, 0.01, -1.0]], dtype=np.float32)    # azimuth ~ +pi
    corr = projective_correspondence(
        jnp.asarray(src), jnp.ones(1, dtype=bool),
        proj.image, jnp.zeros((SPEC.height, SPEC.width, 3)), SPEC, window=(3, 9),
    )
    assert bool(np.asarray(corr.valid)[0])
    assert float(np.asarray(corr.sq_dist)[0]) < 0.01


def test_window_match_vmem_guard():
    """Shape-aware VMEM guard (VERDICT r1 weak #5): limits derive from
    (H, W, wv), not hard-coded 8/4; the 2250-wide preprocessing shape is
    rejected by the kernel with a clear error and 'auto' falls back to xla."""
    from delora_tpu.ops.pallas.window_match import (
        fits_vmem, max_batch_for_shape, window_match_pallas,
    )

    # KITTI train shape fits and keeps the proven anchor batch.
    assert fits_vmem(64, 720, 5)
    assert max_batch_for_shape(64, 720, 5) == 8
    # The 2250-wide preprocessing shape does not fit one row (measured on a
    # v5e: compile fails even at B=1) — it now takes the W-TILED kernel.
    assert not fits_vmem(64, 2250, 5)
    from delora_tpu.ops.pallas.window_match import tile_width_for

    wt = tile_width_for(64, 2250, 5, 9)
    # Mosaic wants 128-multiple lane blocks; W is padded up to whole tiles.
    assert wt > 0 and wt % 128 == 0 and wt < 2250, wt
    # Non-128-divisible widths tile too (padding columns never match).
    assert tile_width_for(64, 2251, 5, 9) % 128 == 0
    # Intermediate shape: max_batch scales down with the footprint.
    assert 1 <= max_batch_for_shape(64, 1440, 5) <= 4

    # 'auto' at the oversized shape silently takes the XLA core (runs fine
    # on any backend) — exercised at a reduced width for test speed.
    wide = ProjectionSpec(
        height=16, width=2250,
        fov_down=SPEC.fov_down, fov_up=SPEC.fov_up,
        fov_left=SPEC.fov_left, fov_right=SPEC.fov_right,
    )
    HW = wide.height * wide.width
    rng = np.random.default_rng(7)
    src_xyz = jnp.asarray(rng.normal(size=(2, HW, 3)).astype(np.float32) * 5.0)
    img = jnp.zeros((2, wide.height, wide.width, 4))
    nimg = jnp.zeros((2, wide.height, wide.width, 3))
    corr = image_space_correspondence_batch(
        src_xyz, jnp.ones((2, HW), bool),
        img, nimg, wide, (5, 9), backend="auto",
    )
    assert corr.valid.shape == (2, HW)


def test_window_match_tiled_matches_untiled():
    """The W-tiled kernel (VERDICT r2 item 10: the 2250-wide preprocessing
    shape) selects identical winners to the full-width kernel — the haloed
    per-tile target slab bakes in the azimuth wrap the full-width roll
    provides. Interpret mode on CPU; real-chip parity is measured in
    docs/BENCH_NOTES.md."""
    from delora_tpu.ops.pallas.window_match import (
        _window_match_tiled, window_match_pallas,
    )

    rng = np.random.default_rng(31)
    B, H, W, wv, wu = 2, 8, 64, 5, 9
    Hp = H + wv - 1
    src = jnp.asarray(rng.normal(size=(B, 3, H, W)).astype(np.float32) * 4)
    tgt = jnp.asarray(rng.normal(size=(B, 7, Hp, W)).astype(np.float32) * 4)
    # Occupancy plane in {0, 1} with gaps.
    tgt = tgt.at[:, 6].set(
        (rng.random((B, Hp, W)) > 0.3).astype(np.float32)
    )

    ref = window_match_pallas(src, tgt, wv=wv, wu=wu, interpret=True)
    for wt in (16, 24, 32):   # 24 exercises the W-padding path (64 % 24 != 0)
        out = _window_match_tiled(
            src, tgt, wv=wv, wu=wu, wt=wt, interpret=True
        )
        for a, b in zip(ref, out):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_soft_match_tiny_sigma_equals_hard():
    """Small soft_sigma recovers the hard argmin winner (the best candidate
    dominates the blend). sigma must stay above the f32 underflow threshold
    of the unnormalized accumulation (~exp(-88)): at the test's best-match
    distance ~0.02 m, sigma = 0.01 keeps the winner's weight finite while
    suppressing every other candidate by >= e^-800."""
    import numpy as np

    import jax.numpy as jnp

    from delora_tpu.ops.correspondence import image_space_correspondence_core
    from delora_tpu.ops.projection import ProjectionSpec, project_scan

    H, W = 12, 48
    spec = ProjectionSpec(
        height=H, width=W,
        fov_down=np.deg2rad(-24.5), fov_up=np.deg2rad(2.0),
        fov_left=np.deg2rad(-179.9), fov_right=np.deg2rad(179.9),
    )
    rng = np.random.default_rng(5)
    pts = rng.normal(size=(600, 3)).astype(np.float32) * np.array(
        [6, 6, 0.6], np.float32) - np.array([0, 0, 1.2], np.float32)
    proj = project_scan(jnp.asarray(pts), jnp.ones(600, bool), spec)
    timg = proj.image
    nimg = jnp.where(
        timg[..., 3:4] > 0, jnp.asarray([0.0, 0.0, 1.0]), 0.0
    ) * jnp.ones((H, W, 3))
    src = timg[..., :3].reshape(H * W, 3) + 0.013
    occ = timg[..., 3].reshape(H * W) > 0

    hard = image_space_correspondence_core(src, occ, timg, nimg, spec, (3, 5))
    soft = image_space_correspondence_core(
        src, occ, timg, nimg, spec, (3, 5), soft_sigma=0.01
    )
    assert bool(jnp.all(hard.valid == soft.valid))
    m = hard.valid
    np.testing.assert_allclose(
        np.asarray(soft.target_points)[m], np.asarray(hard.target_points)[m],
        rtol=1e-4, atol=1e-5,
    )


def test_soft_match_is_smooth_in_pose():
    """The blended match point varies continuously as the source shifts by a
    sub-column amount, while the hard winner jumps discretely — the r19 yaw
    ripple mechanism."""
    import numpy as np

    import jax.numpy as jnp

    from delora_tpu.ops.correspondence import image_space_correspondence_core
    from delora_tpu.ops.projection import ProjectionSpec, project_scan

    H, W = 12, 96
    spec = ProjectionSpec(
        height=H, width=W,
        fov_down=np.deg2rad(-24.5), fov_up=np.deg2rad(2.0),
        fov_left=np.deg2rad(-179.9), fov_right=np.deg2rad(179.9),
    )
    rng = np.random.default_rng(6)
    pts = rng.normal(size=(800, 3)).astype(np.float32) * np.array(
        [6, 6, 0.6], np.float32) - np.array([0, 0, 1.2], np.float32)
    proj = project_scan(jnp.asarray(pts), jnp.ones(800, bool), spec)
    timg = proj.image
    nimg = jnp.zeros((H, W, 3)).at[..., 2].set(
        (timg[..., 3] > 0).astype(jnp.float32))
    occ = timg[..., 3].reshape(H * W) > 0
    base = timg[..., :3].reshape(H * W, 3)

    def match_mean(dyaw, sigma):
        c, s = np.cos(dyaw), np.sin(dyaw)
        R = jnp.asarray(
            [[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]], jnp.float32)
        src = base @ R.T
        corr = image_space_correspondence_core(
            src, occ, timg, nimg, spec, (3, 9), soft_sigma=sigma
        )
        return float(jnp.sum(jnp.where(
            corr.valid[:, None], corr.target_points, 0.0)))

    # total |delta| of the aggregate match across tiny yaw steps
    yaws = np.linspace(0.0, 2 * np.pi / W, 9)   # one azimuth column
    hard_steps = np.abs(np.diff([match_mean(y, 0.0) for y in yaws]))
    soft_steps = np.abs(np.diff([match_mean(y, 0.5) for y in yaws]))
    # soft: no step much larger than the mean (smooth); hard: has jumps
    assert soft_steps.max() < 5.0 * max(soft_steps.mean(), 1e-9)
    assert hard_steps.max() > soft_steps.max()


def test_soft_match_pallas_matches_xla():
    """Pallas soft-blend kernel (interpret mode on CPU) == XLA streaming
    softmax core, same sigma."""
    import numpy as np

    import jax.numpy as jnp

    from delora_tpu.ops.correspondence import image_space_correspondence_batch
    from delora_tpu.ops.projection import ProjectionSpec, project_scan

    H, W = 16, 128
    spec = ProjectionSpec(
        height=H, width=W,
        fov_down=np.deg2rad(-24.5), fov_up=np.deg2rad(2.0),
        fov_left=np.deg2rad(-179.9), fov_right=np.deg2rad(179.9),
    )
    rng = np.random.default_rng(7)
    pts = rng.normal(size=(2, 900, 3)).astype(np.float32) * np.array(
        [6, 6, 0.6], np.float32) - np.array([0, 0, 1.2], np.float32)
    imgs, nimgs, srcs, occs = [], [], [], []
    for b in range(2):
        proj = project_scan(jnp.asarray(pts[b]), jnp.ones(900, bool), spec)
        timg = proj.image
        imgs.append(timg)
        nimgs.append(jnp.zeros((H, W, 3)).at[..., 2].set(
            (timg[..., 3] > 0).astype(jnp.float32)))
        srcs.append(timg[..., :3].reshape(H * W, 3) + 0.02)
        occs.append(timg[..., 3].reshape(H * W) > 0)
    args = (jnp.stack(srcs), jnp.stack(occs), jnp.stack(imgs),
            jnp.stack(nimgs), spec, (3, 5))
    cx = image_space_correspondence_batch(*args, backend="xla",
                                          soft_sigma=0.25)
    cp = image_space_correspondence_batch(*args, backend="pallas",
                                          soft_sigma=0.25)
    np.testing.assert_array_equal(np.asarray(cx.valid), np.asarray(cp.valid))
    np.testing.assert_allclose(
        np.asarray(cp.target_points), np.asarray(cx.target_points),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(cp.target_normals), np.asarray(cx.target_normals),
        rtol=1e-5, atol=1e-6,
    )


def test_max_batch_conservative_outside_validated_shapes():
    """r5 multires crash: at (64, 512, wv=9) the anchor scaling allowed a
    direct B=8 pallas call whose XLA scoped-VMEM staging measured 39.34 MB
    against the 16 MB stack. Unvalidated (H, W) shapes must fall back to the
    observed-staging bound (~2.2x row bytes); the validated 720-wide family
    keeps the anchor-derived cap."""
    from delora_tpu.ops.pallas.window_match import max_batch_for_shape

    # Validated family unchanged: full 8-row direct calls.
    assert max_batch_for_shape(64, 720, 5) == 8
    assert max_batch_for_shape(32, 720, 9) == 8
    # The crash shape: 39.34M staging / 16M limit -> at most 3 rows.
    assert max_batch_for_shape(64, 512, 9) <= 3
    # Tiny shapes still allow the full cap (staging bound is generous).
    assert max_batch_for_shape(16, 64, 5) == 8
