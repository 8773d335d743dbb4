"""Reverse (target -> warped-source) matching: index matcher parity and the
anti-sliding reverse po2pl term (lambda_reverse_po2pl)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from delora_tpu.ops.correspondence import (
    image_space_correspondence_core,
    window_match_indices,
)
from delora_tpu.ops.projection import ProjectionSpec, project_scan

SPEC = ProjectionSpec(
    height=16, width=64,
    fov_down=np.deg2rad(-24.5), fov_up=np.deg2rad(2.0),
    fov_left=np.deg2rad(-179.9), fov_right=np.deg2rad(179.9),
)


def _scene(seed=0, n=800):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    pts *= np.array([6.0, 6.0, 0.6], np.float32)
    pts[:, 2] -= 1.2
    proj = project_scan(jnp.asarray(pts), jnp.ones(n, bool), SPEC)
    return proj.image                                    # [H, W, 4+]


def test_index_matcher_reconstructs_core_winners():
    """window_match_indices + index->pixel reconstruction yields exactly the
    value matcher's winners (same order, same tie-break)."""
    timg = _scene(0)
    simg = _scene(1)
    H, W = SPEC.height, SPEC.width
    HW = H * W
    window = (3, 5)
    wv, wu = window

    q_xyz = simg[..., 0:3].reshape(HW, 3) + 0.03
    q_occ = simg[..., 3].reshape(HW) > 0
    nimg = jnp.zeros((H, W, 3)).at[..., 0].set(
        (timg[..., 3] > 0).astype(jnp.float32))

    core = image_space_correspondence_core(
        q_xyz, q_occ, timg, nimg, SPEC, window
    )
    k, sq, valid = window_match_indices(
        q_xyz, q_occ, timg[..., 0:3], timg[..., 3] > 0, SPEC, window
    )
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(core.valid))

    p = jnp.arange(HW)
    row = jnp.clip(p // W + k // wu - wv // 2, 0, H - 1)
    col = jnp.mod(p % W + k % wu - wu // 2, W)
    win = row * W + col
    recon = timg[..., 0:3].reshape(HW, 3)[win]
    m = np.asarray(valid)
    np.testing.assert_allclose(
        np.asarray(recon)[m], np.asarray(core.target_points)[m],
        rtol=0, atol=0,
    )
    # And the squared selection distances agree.
    np.testing.assert_allclose(
        np.asarray(sq)[m], np.asarray(core.sq_dist)[m], rtol=1e-5, atol=1e-6
    )


def _tail_loss(t_vec, lam):
    """Run _loss_tail with a stubbed pose head so the transform is an
    explicit function of ``t_vec`` (identity rotation + translation)."""
    from delora_tpu.losses.icp import IcpLossConfig
    from delora_tpu.training.step import StepConfig, _loss_core

    cfg = StepConfig(
        proj=SPEC, icp=IcpLossConfig(),
        lambda_rev_po2pl=lam, matcher_backend="xla",
    )

    rng = np.random.default_rng(3)
    n = 900
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    pts *= np.array([6.0, 6.0, 0.6], np.float32)
    pts[:, 2] -= 1.2
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)

    proj = project_scan(jnp.asarray(pts), jnp.ones(n, bool), SPEC)
    timg = proj.image
    image_1 = jnp.concatenate([timg[..., 0:3], timg[..., 3:4]], axis=-1)
    nimg = jnp.asarray(nrm)[proj.point_index] * (
        timg[..., 3:4] > 0
    )

    def apply_fn(params, i1, i2, **kw):
        B = i1.shape[0]
        t = jnp.tile(t_vec[None], (B, 1))
        q = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0]), (B, 1))
        return t, q

    loss, (metrics, _) = _loss_core(
        apply_fn, {}, image_1[None], nimg[None],
        jnp.asarray(pts)[None], jnp.asarray(nrm)[None],
        jnp.ones((1, n), bool), cfg, jax.random.PRNGKey(0),
    )
    return loss, metrics


def test_reverse_term_zero_at_identity_and_penalizes_offsets():
    """Same scan as source and target: at the identity pose the reverse
    residuals vanish; a translated pose makes them positive, the total loss
    includes lam * rev, and the gradient w.r.t. the translation is finite
    and nonzero (i.e. the term actually steers the pose)."""
    z = jnp.zeros(3)
    loss0, m0 = _tail_loss(z, 0.5)
    assert float(m0["loss_po2pl_rev"]) < 1e-8

    t = jnp.asarray([0.25, 0.0, 0.0])
    loss1, m1 = _tail_loss(t, 0.5)
    rev = float(m1["loss_po2pl_rev"])
    assert rev > 1e-6

    # loss_pc includes the weighted reverse term.
    lossA, mA = _tail_loss(t, 0.0)
    assert float(m1["loss_pc"]) == pytest.approx(
        float(mA["loss_pc"]) + 0.5 * rev, rel=1e-5
    )

    g = jax.grad(lambda tv: _tail_loss(tv, 0.5)[0])(t)
    g0 = jax.grad(lambda tv: _tail_loss(tv, 0.0)[0])(t)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.linalg.norm(g - g0)) > 0.0   # reverse term contributes


def test_reverse_term_absent_when_disabled():
    """lambda 0: metric present (schema-stable) and exactly zero."""
    loss, m = _tail_loss(jnp.asarray([0.1, 0.0, 0.0]), 0.0)
    assert float(m["loss_po2pl_rev"]) == 0.0
