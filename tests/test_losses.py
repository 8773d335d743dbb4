import numpy as np

import jax
import jax.numpy as jnp

from delora_tpu.losses.icp import IcpLossConfig, icp_losses, masked_mse
from delora_tpu.ops.correspondence import Correspondence


def make_corr(tgt_pts, tgt_nrm, valid):
    sq = np.sum((tgt_pts * 0.0) ** 2, axis=-1)  # not used unless trimming
    return Correspondence(
        jnp.asarray(tgt_pts), jnp.asarray(tgt_nrm), jnp.asarray(valid), jnp.asarray(sq)
    )


def test_masked_mse_matches_dense_subset():
    rng = np.random.default_rng(0)
    r = rng.normal(size=100) ** 2
    m = rng.random(100) > 0.5
    ours = float(masked_mse(jnp.asarray(r), jnp.asarray(m)))
    assert np.isclose(ours, r[m].mean())


def test_masked_mse_empty_mask_is_zero():
    assert float(masked_mse(jnp.ones(10), jnp.zeros(10, dtype=bool))) == 0.0


def test_po2pl_and_pl2pl_match_reference_formulas():
    rng = np.random.default_rng(1)
    S = 64
    src = rng.normal(size=(S, 3)).astype(np.float32)
    src_nrm = rng.normal(size=(S, 3)).astype(np.float32)
    src_nrm /= np.linalg.norm(src_nrm, axis=-1, keepdims=True)
    src_nrm[40:] = 0.0                       # no source normal
    tgt = src + rng.normal(size=(S, 3)).astype(np.float32) * 0.1
    tgt_nrm = rng.normal(size=(S, 3)).astype(np.float32)
    tgt_nrm /= np.linalg.norm(tgt_nrm, axis=-1, keepdims=True)
    tgt_nrm[30:40] = 0.0                     # no target normal (source has one)
    tgt_nrm[45:] = 0.0                       # neither side has a normal
    valid = np.ones(S, dtype=bool)

    cfg = IcpLossConfig(point_to_point=True, point_to_plane=True,
                        plane_to_plane=True, normal_loss="squared",
                        lambda_po2pl=2.0)
    out = icp_losses(
        jnp.asarray(src), jnp.asarray(src_nrm), jnp.asarray(valid),
        make_corr(tgt, tgt_nrm, valid), cfg,
    )

    both = (np.linalg.norm(src_nrm, axis=-1) > 0) & (np.linalg.norm(tgt_nrm, axis=-1) > 0)
    neither = (np.linalg.norm(src_nrm, axis=-1) == 0) & (np.linalg.norm(tgt_nrm, axis=-1) == 0)

    # Reference formulas computed densely on the selected subsets
    # (icp_losses.py:196-203, 232-238, 168-179).
    diff = src - tgt
    po2pl_ref = np.mean(np.sum(diff[both] * tgt_nrm[both], axis=-1) ** 2)
    pl2pl_ref = np.mean(np.sum((src_nrm[both] - tgt_nrm[both]) ** 2, axis=-1))
    po2po_ref = np.mean((diff[neither] ** 2))

    assert np.isclose(float(out["loss_po2pl"]), po2pl_ref, rtol=1e-5)
    assert np.isclose(float(out["loss_pl2pl"]), pl2pl_ref, rtol=1e-5)
    assert np.isclose(float(out["loss_po2po"]), po2po_ref, rtol=1e-5)
    assert np.isclose(
        float(out["loss_pc"]),
        po2po_ref + 2.0 * po2pl_ref + pl2pl_ref,
        rtol=1e-5,
    )


def test_pl2pl_linear_mode():
    rng = np.random.default_rng(2)
    S = 32
    src_nrm = rng.normal(size=(S, 3)).astype(np.float32)
    src_nrm /= np.linalg.norm(src_nrm, axis=-1, keepdims=True)
    tgt_nrm = rng.normal(size=(S, 3)).astype(np.float32)
    tgt_nrm /= np.linalg.norm(tgt_nrm, axis=-1, keepdims=True)
    src = rng.normal(size=(S, 3)).astype(np.float32)
    valid = np.ones(S, dtype=bool)

    cfg = IcpLossConfig(point_to_plane=False, plane_to_plane=True,
                        normal_loss="linear")
    out = icp_losses(
        jnp.asarray(src), jnp.asarray(src_nrm), jnp.asarray(valid),
        make_corr(src, tgt_nrm, valid), cfg,
    )
    ref = np.mean((1.0 - np.sum(src_nrm * tgt_nrm, axis=-1)) ** 2)
    assert np.isclose(float(out["loss_pl2pl"]), ref, rtol=1e-5)


def test_gradients_flow_through_source_only():
    rng = np.random.default_rng(3)
    S = 16
    src = rng.normal(size=(S, 3)).astype(np.float32)
    nrm = np.tile(np.array([0, 0, 1.0], dtype=np.float32), (S, 1))
    tgt = src + 0.5
    valid = np.ones(S, dtype=bool)
    cfg = IcpLossConfig()

    def loss_fn(s):
        out = icp_losses(s, jnp.asarray(nrm), jnp.asarray(valid),
                         make_corr(tgt, nrm, valid), cfg)
        return out["loss_pc"]

    g = jax.grad(loss_fn)(jnp.asarray(src))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0.0


def test_alignment_gives_zero_loss():
    rng = np.random.default_rng(4)
    S = 32
    src = rng.normal(size=(S, 3)).astype(np.float32)
    nrm = rng.normal(size=(S, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    valid = np.ones(S, dtype=bool)
    out = icp_losses(
        jnp.asarray(src), jnp.asarray(nrm), jnp.asarray(valid),
        make_corr(src, nrm, valid), IcpLossConfig(),
    )
    assert float(out["loss_pc"]) < 1e-10


def test_po2po_alone_mode():
    """po2po_alone: normals ignored, every matched pair contributes po2po
    (reference icp_losses.py:36-46)."""
    rng = np.random.default_rng(5)
    S = 48
    src = rng.normal(size=(S, 3)).astype(np.float32)
    nrm = rng.normal(size=(S, 3)).astype(np.float32)  # present but ignored
    tgt = src + 0.2
    tgt_nrm = rng.normal(size=(S, 3)).astype(np.float32)
    valid = np.ones(S, dtype=bool)
    valid[40:] = False

    cfg = IcpLossConfig(po2po_alone=True)
    out = icp_losses(
        jnp.asarray(src), jnp.asarray(nrm), jnp.asarray(valid),
        make_corr(tgt, tgt_nrm, valid), cfg,
    )
    ref = np.mean((src[:40] - tgt[:40]) ** 2)
    assert np.isclose(float(out["loss_po2po"]), ref, rtol=1e-5)
    assert float(out["loss_po2pl"]) == 0.0
    assert float(out["loss_pl2pl"]) == 0.0
    assert np.isclose(float(out["loss_pc"]), ref, rtol=1e-5)
    assert int(out["num_po2pl_pairs"]) == 40


def test_lambda_pl2pl_weights_the_combined_loss():
    """lambda_pl2pl scales pl2pl's contribution to loss_pc (1.0 = reference
    parity, where the weight is hardwired)."""
    import jax.numpy as jnp
    import numpy as np

    from delora_tpu.losses.icp import IcpLossConfig, icp_losses
    from delora_tpu.ops.correspondence import Correspondence

    S = 16
    rng = np.random.default_rng(0)
    sp = jnp.asarray(rng.normal(size=(S, 3)).astype(np.float32))
    sn = jnp.asarray(rng.normal(size=(S, 3)).astype(np.float32))
    valid = jnp.ones(S, bool)
    corr = Correspondence(
        target_points=sp + 0.1, target_normals=sn + 0.05,
        valid=valid, sq_dist=jnp.full(S, 0.01),
    )
    full = icp_losses(sp, sn, valid, corr, IcpLossConfig())
    tenth = icp_losses(sp, sn, valid, corr,
                       IcpLossConfig(lambda_pl2pl=0.1))
    np.testing.assert_allclose(float(tenth["loss_pl2pl"]),
                               float(full["loss_pl2pl"]))  # raw term equal
    np.testing.assert_allclose(
        float(tenth["loss_pc"]),
        float(full["loss_po2pl"]) + 0.1 * float(full["loss_pl2pl"]),
        rtol=1e-6,
    )
