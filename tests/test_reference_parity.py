"""Full-pipeline numerical parity against the ACTUAL reference implementation.

These tests import the reference sources from /root/reference/src and execute
them (never copy them): the reference's own torch code is the oracle. Covered
(VERDICT r1 "Next round" item 1):

  (a) whole-network forward: our Flax OdometryModel with importer-mapped
      weights == reference models/model.py:103 ``OdometryModel.forward``
      (quaternion_normalization="global"),
  (b) projection: our project_scan == reference utility/projection.py:48
      ``ImageProjectionLayer.project_to_img`` (image + survivor set),
  (c) normals: our compute_normal_image == reference
      preprocessing/normal_computation.py:89 ``compute_normal_vectors``,
  (d) loss: our brute-force NN + icp_losses == reference
      losses/icp_losses.py:28 ``ICPLosses.forward`` on identical inputs,
  (e) euler conversion: our matrix_to_euler_zyx == reference
      utility/geometry.py:48 ``matrix_to_euler_angles(convention="ZYX")``.

Environment shims (the reference env pins packages this image lacks):
  * ``numba.njit`` -> identity decorator: the reference's dedup loop
    (projection.py:36-43) runs as plain Python — same code, just unjitted.
  * ``kornia`` -> a stub whose attributes RAISE if touched: nothing under
    test may silently fall back to non-reference semantics (the reference's
    forward path never calls kornia; only GeometryHandler methods do).
  * ``torch.symeig`` (removed in torch 2.x) -> ``torch.linalg.eigh``, which
    has identical semantics to ``symeig(eigenvectors=True)`` (ascending
    eigenvalues, LAPACK).

All tests are skipped wholesale if torch or /root/reference are unavailable.
"""

import importlib
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REFERENCE_SRC = "/root/reference/src"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_SRC), reason="reference sources not mounted"
)


def _kornia_guard(*_a, **_k):
    raise RuntimeError(
        "kornia stub invoked: parity tests must exercise only reference code "
        "paths that do not depend on kornia"
    )


def _install_reference_shims():
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")

        def njit(*args, **kwargs):
            if len(args) == 1 and callable(args[0]) and not kwargs:
                return args[0]
            return lambda f: f

        numba.njit = njit
        sys.modules["numba"] = numba
    if "kornia" not in sys.modules:
        kornia = types.ModuleType("kornia")
        kornia.quaternion_to_rotation_matrix = _kornia_guard
        kornia.angle_axis_to_rotation_matrix = _kornia_guard
        sys.modules["kornia"] = kornia
    if not getattr(torch, "_delora_symeig_shim", False):
        # torch.symeig exists in torch 2.x only as a stub that raises; always
        # replace it with linalg.eigh (identical semantics to
        # symeig(eigenvectors=True): ascending eigenvalues, LAPACK).
        def symeig(input, eigenvectors=False, upper=True):
            w, v = torch.linalg.eigh(input, UPLO="U" if upper else "L")
            if not eigenvectors:
                v = torch.zeros_like(v)
            return w, v

        torch.symeig = symeig
        torch._delora_symeig_shim = True


def _import_reference(module: str):
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    _install_reference_shims()
    return importlib.import_module(module)


# ---------------------------------------------------------------------------
# (a) whole-network forward parity
# ---------------------------------------------------------------------------


REF_MODEL_CONFIG = {
    "device": "cpu",
    "pre_feature_extraction": False,
    "activation_fct": "tanh",
    "resnet_outputs": 100,
    "use_dropout": False,
    "layers": [2, 2, 2, 2],
    "factor_fewer_resnet_channels": 4,
    "use_single_mlp_at_output": False,
}


def test_model_forward_matches_reference():
    ref_model_mod = _import_reference("models.model")

    torch.manual_seed(7)
    ref_model = ref_model_mod.OdometryModel(REF_MODEL_CONFIG).eval()

    from delora_tpu.models.odometry import ModelConfig, OdometryModel
    from delora_tpu.utils.torch_import import torch_state_dict_to_params

    params = torch_state_dict_to_params(ref_model.state_dict())
    params = jax.tree.map(jnp.asarray, params)
    cfg = ModelConfig(
        resnet_outputs=100,
        channel_divisor=4,
        activation="tanh",
        quaternion_normalization="global",
    )
    ours = OdometryModel(cfg)

    rng = np.random.default_rng(17)
    # Reference-shaped VLP-16 input (scripts/time_network.py:62), batch 2.
    img1 = rng.normal(size=(2, 4, 16, 720)).astype(np.float32)
    img2 = rng.normal(size=(2, 4, 16, 720)).astype(np.float32)

    with torch.no_grad():
        t_ref, q_ref = ref_model(torch.from_numpy(img1), torch.from_numpy(img2))

    t_ours, q_ours = ours.apply(
        params,
        jnp.asarray(img1.transpose(0, 2, 3, 1)),
        jnp.asarray(img2.transpose(0, 2, 3, 1)),
    )

    np.testing.assert_allclose(
        np.asarray(t_ours), t_ref.numpy(), rtol=1e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(q_ours), q_ref.numpy(), rtol=1e-4, atol=2e-5
    )


def test_model_forward_matches_reference_single_mlp():
    ref_model_mod = _import_reference("models.model")

    cfg_ref = dict(REF_MODEL_CONFIG, use_single_mlp_at_output=True)
    torch.manual_seed(11)
    ref_model = ref_model_mod.OdometryModel(cfg_ref).eval()

    from delora_tpu.models.odometry import ModelConfig, OdometryModel
    from delora_tpu.utils.torch_import import torch_state_dict_to_params

    params = torch_state_dict_to_params(
        ref_model.state_dict(), use_single_mlp=True
    )
    params = jax.tree.map(jnp.asarray, params)
    ours = OdometryModel(ModelConfig(
        resnet_outputs=100, channel_divisor=4, activation="tanh",
        use_single_mlp=True, quaternion_normalization="global",
    ))

    rng = np.random.default_rng(23)
    img1 = rng.normal(size=(1, 4, 16, 360)).astype(np.float32)
    img2 = rng.normal(size=(1, 4, 16, 360)).astype(np.float32)
    with torch.no_grad():
        t_ref, q_ref = ref_model(torch.from_numpy(img1), torch.from_numpy(img2))
    t_ours, q_ours = ours.apply(
        params,
        jnp.asarray(img1.transpose(0, 2, 3, 1)),
        jnp.asarray(img2.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(np.asarray(t_ours), t_ref.numpy(), rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(q_ours), q_ref.numpy(), rtol=1e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# (b) projection parity
# ---------------------------------------------------------------------------


PROJ_H, PROJ_W = 16, 360
REF_PROJ_CONFIG = {
    "device": "cpu",
    "horizontal_field_of_view": [np.deg2rad(-180.0), np.deg2rad(180.0)],
    "sensor": {
        "horizontal_cells": PROJ_W,
        "vertical_cells": PROJ_H,
        "vertical_field_of_view": [np.deg2rad(-24.8), np.deg2rad(2.0)],
    },
}


def _sample_scan(rng, n, spec):
    """Random scan with every point kept >= 1e-3 pixels away from (u, v)
    rounding boundaries (computed in float64 numpy): torch-vs-XLA atan2 ulp
    differences must not flip any pixel assignment, so that parity can be
    asserted EXACTLY rather than within a mismatch budget."""
    pts = np.zeros((0, 3), np.float32)
    while len(pts) < n:
        cand = rng.normal(size=(2 * n, 3)).astype(np.float32) * np.array(
            [10.0, 10.0, 1.5], np.float32
        )
        cand[:, 2] -= 1.0
        r = np.linalg.norm(cand, axis=-1)
        cand = cand[r > 0.5]
        c64 = cand.astype(np.float64)
        u = (np.arctan2(c64[:, 1], c64[:, 0]) - spec.fov_left) / (
            spec.fov_right - spec.fov_left
        ) * (spec.width - 1)
        v = (
            np.arctan2(c64[:, 2], np.linalg.norm(c64[:, :2], axis=-1))
            - spec.fov_down
        ) / (spec.fov_up - spec.fov_down) * (spec.height - 1)
        frac_u = np.abs(u - np.floor(u) - 0.5)
        frac_v = np.abs(v - np.floor(v) - 0.5)
        keep = (frac_u > 1e-3) & (frac_v > 1e-3)
        pts = np.concatenate([pts, cand[keep]])[:n]
    return pts


def test_projection_matches_reference():
    ref_proj_mod = _import_reference("utility.projection")

    from delora_tpu.ops.projection import ProjectionSpec, project_scan

    spec = ProjectionSpec(
        height=PROJ_H, width=PROJ_W,
        fov_down=REF_PROJ_CONFIG["sensor"]["vertical_field_of_view"][0],
        fov_up=REF_PROJ_CONFIG["sensor"]["vertical_field_of_view"][1],
        fov_left=REF_PROJ_CONFIG["horizontal_field_of_view"][0],
        fov_right=REF_PROJ_CONFIG["horizontal_field_of_view"][1],
    )
    rng = np.random.default_rng(31)
    pts = _sample_scan(rng, 4000, spec)

    layer = ref_proj_mod.ImageProjectionLayer(REF_PROJ_CONFIG)
    with torch.no_grad():
        ref_img, _, _, ref_survivor_idx, _ = layer.project_to_img(
            torch.from_numpy(pts.T[None]), dataset="sensor"
        )

    ours = project_scan(jnp.asarray(pts), jnp.ones(len(pts), bool), spec)

    # Image: reference [1, 4, H, W] vs ours [H, W, 4].
    np.testing.assert_allclose(
        np.asarray(ours.image).transpose(2, 0, 1),
        ref_img.numpy()[0],
        rtol=1e-5, atol=1e-5,
    )
    # Survivor sets: identical original-point indices.
    ref_set = set(ref_survivor_idx.numpy().tolist())
    ours_set = set(np.nonzero(np.asarray(ours.survivor))[0].tolist())
    assert ref_set == ours_set


# ---------------------------------------------------------------------------
# (c) normals parity
# ---------------------------------------------------------------------------


def test_normals_match_reference():
    ref_norm_mod = _import_reference("preprocessing.normal_computation")

    from delora_tpu.ops.normals import NormalsSpec, compute_normal_image
    from delora_tpu.ops.projection import ProjectionSpec, project_scan

    H, W = 16, 180
    spec = ProjectionSpec(
        height=H, width=W,
        fov_down=np.deg2rad(-24.8), fov_up=np.deg2rad(2.0),
        fov_left=np.deg2rad(-180.0), fov_right=np.deg2rad(180.0),
    )
    # Structured scene (rays from the sensor hitting an axis-aligned box
    # room + noise): planar neighborhoods give well-conditioned smallest
    # eigenvectors, so LAPACK vs the closed-form 3x3 solver must agree; a
    # random Gaussian cloud would compare two valid answers to a degenerate
    # eigenproblem. ~15% of pixels are dropped to exercise the masks.
    rng = np.random.default_rng(41)
    vv, uu = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    az = spec.fov_left + uu / (W - 1) * (spec.fov_right - spec.fov_left)
    el = spec.fov_down + vv / (H - 1) * (spec.fov_up - spec.fov_down)
    d = np.stack(
        [np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)], -1
    )
    lo, hi = np.array([-12.0, -9.0, -2.0]), np.array([12.0, 9.0, 3.0])
    with np.errstate(divide="ignore"):
        t_all = np.where(d > 0, hi / d, lo / d)                  # per-axis exit
    t_masked = np.where(np.abs(d) > 1e-9, t_all, np.inf)
    t = np.min(t_masked, axis=-1)
    hit_axis = np.argmin(t_masked, axis=-1)                      # which face
    face = hit_axis * 2 + (np.take_along_axis(
        d, hit_axis[..., None], axis=-1
    )[..., 0] > 0)
    image = (d * t[..., None]).astype(np.float32)
    image += (0.01 * rng.normal(size=image.shape)).astype(np.float32)
    image[rng.random((H, W)) < 0.15] = 0.0

    cfg = {
        "device": "cpu",
        "epsilon_range": 0.5,
        "epsilon_plane": 0.01,
        "epsilon_line": 0.01,
        "min_num_points_in_neighborhood_to_determine_point_class": 10,
        "sensor": {
            "horizontal_cells": W,
            "vertical_cells": H,
            "neighborhood_side_length": [7, 11],
        },
    }
    computer = ref_norm_mod.NormalsComputer(cfg, "sensor")
    with torch.no_grad():
        ref_normals, _, ref_locations = computer.compute_normal_vectors(
            torch.from_numpy(image.transpose(2, 0, 1)[None])
        )
    ref_normals = ref_normals.numpy()           # [P, 3], zeros where none
    ref_locations = ref_locations.numpy()       # [P, 3] nonzero-pixel coords

    nspec = NormalsSpec(
        patch_v=7, patch_u=11, epsilon_range=0.5, min_neighbors=10
    )
    ours_img = np.asarray(compute_normal_image(jnp.asarray(image), nspec))

    # Reference emits normals for the flattened list of nonzero pixels
    # (normal_computation.py:32-40: AND over coordinates).
    flat = image.reshape(-1, 3)
    nonzero = (flat[:, 0] != 0) & (flat[:, 1] != 0) & (flat[:, 2] != 0)
    ours_at = ours_img.reshape(-1, 3)[nonzero]
    locs_at = flat[nonzero]
    assert ref_normals.shape == ours_at.shape
    np.testing.assert_allclose(locs_at, ref_locations, rtol=1e-6, atol=1e-6)

    # Existence masks must agree exactly (count-based, integer semantics).
    ref_has = np.any(ref_normals != 0, axis=-1)
    ours_has = np.any(ours_at != 0, axis=-1)
    np.testing.assert_array_equal(ref_has, ours_has)

    # Direction: angular agreement, conditioned on well-posedness. At box
    # EDGES the 7x11 patch spans two faces, the two smallest eigenvalues
    # nearly coincide, and the smallest eigenvector is arbitrary — LAPACK and
    # the closed-form solver legitimately return different (both valid)
    # answers there, so the direction comparison is restricted to pixels
    # whose whole clamped patch lies on ONE face (the overwhelming majority).
    from scipy.ndimage import maximum_filter, minimum_filter

    single_face = (
        maximum_filter(face, size=(7, 11), mode="nearest")
        == minimum_filter(face, size=(7, 11), mode="nearest")
    ).reshape(-1)[nonzero]
    # Grazing-incidence pixels are also excluded: there n . p ~ 0, so the
    # flip-toward-sensor sign (normal_computation.py:79-81) is decided by
    # noise-level arithmetic differences.
    pdir = locs_at / np.maximum(
        np.linalg.norm(locs_at, axis=-1, keepdims=True), 1e-12
    )
    nref_unit = ref_normals / np.maximum(
        np.linalg.norm(ref_normals, axis=-1, keepdims=True), 1e-12
    )
    not_grazing = np.abs(np.sum(nref_unit * pdir, axis=-1)) > 0.05
    well_posed = ref_has & single_face & not_grazing
    assert well_posed.sum() > 0.4 * len(ref_has)       # comparison has teeth

    dots = np.sum(ref_normals[well_posed] * ours_at[well_posed], axis=-1)
    norms = (
        np.linalg.norm(ref_normals[well_posed], axis=-1)
        * np.linalg.norm(ours_at[well_posed], axis=-1)
    )
    cosine = np.clip(dots / np.maximum(norms, 1e-12), -1.0, 1.0)
    angles = np.arccos(cosine)
    assert np.quantile(angles, 0.95) < 5e-3, np.quantile(angles, 0.95)
    assert np.max(angles) < 0.1, np.max(angles)


# ---------------------------------------------------------------------------
# (d) loss parity
# ---------------------------------------------------------------------------


REF_LOSS_CONFIG = {
    "device": "cpu",
    "point_to_point_loss": True,
    "point_to_plane_loss": True,
    "plane_to_plane_loss": True,
    "po2po_alone": False,
    "normal_loss": "squared",
}


def _loss_fixture(seed, s=700, t=900):
    rng = np.random.default_rng(seed)
    src = rng.normal(size=(s, 3)).astype(np.float32) * 5.0
    # Targets: source points perturbed + extra clutter, so NN matches are
    # unambiguous for most points but include cross-matches.
    tgt = np.concatenate(
        [
            src[: t // 2 if t // 2 <= s else s] + 0.05 * rng.normal(size=(min(t // 2, s), 3)).astype(np.float32),
            rng.normal(size=(t - min(t // 2, s), 3)).astype(np.float32) * 5.0,
        ]
    ).astype(np.float32)
    def normals(n):
        v = rng.normal(size=(n, 3)).astype(np.float32)
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        v[rng.random(n) < 0.3] = 0.0            # zero-sentinel: no normal
        return v
    return src, normals(s), tgt, normals(len(tgt))


@pytest.mark.parametrize("normal_loss", ["squared", "linear"])
def test_losses_match_reference(normal_loss):
    ref_icp_mod = _import_reference("losses.icp_losses")

    from delora_tpu.losses.icp import IcpLossConfig, icp_losses
    from delora_tpu.ops.correspondence import brute_force_correspondence

    src, src_n, tgt, tgt_n = _loss_fixture(53)
    cfg_ref = dict(REF_LOSS_CONFIG, normal_loss=normal_loss)
    ref_losses_head = ref_icp_mod.ICPLosses(cfg_ref)
    with torch.no_grad():
        ref_losses, _ = ref_losses_head(
            torch.from_numpy(src.T[None]),
            torch.from_numpy(src_n.T[None]),
            torch.from_numpy(tgt.T[None]),
            torch.from_numpy(tgt_n.T[None]),
            compute_pointwise_loss_bool=False,
        )

    corr = brute_force_correspondence(
        jnp.asarray(src), jnp.ones(len(src), bool),
        jnp.asarray(tgt), jnp.ones(len(tgt), bool), jnp.asarray(tgt_n),
    )
    ours = icp_losses(
        jnp.asarray(src), jnp.asarray(src_n), jnp.ones(len(src), bool),
        corr,
        IcpLossConfig(
            point_to_point=True, point_to_plane=True, plane_to_plane=True,
            normal_loss=normal_loss,
        ),
    )

    for key in ("loss_po2po", "loss_po2pl", "loss_pl2pl"):
        np.testing.assert_allclose(
            float(ours[key]), float(ref_losses[key]), rtol=1e-4, atol=1e-6,
        ), key


def test_losses_match_reference_po2po_alone():
    ref_icp_mod = _import_reference("losses.icp_losses")

    from delora_tpu.losses.icp import IcpLossConfig, icp_losses
    from delora_tpu.ops.correspondence import brute_force_correspondence

    src, src_n, tgt, tgt_n = _loss_fixture(59, s=500, t=600)
    cfg_ref = dict(
        REF_LOSS_CONFIG,
        po2po_alone=True, point_to_point_loss=True,
        point_to_plane_loss=False, plane_to_plane_loss=False,
    )
    ref_losses_head = ref_icp_mod.ICPLosses(cfg_ref)
    with torch.no_grad():
        ref_losses, _ = ref_losses_head(
            torch.from_numpy(src.T[None]), torch.from_numpy(src_n.T[None]),
            torch.from_numpy(tgt.T[None]), torch.from_numpy(tgt_n.T[None]),
            compute_pointwise_loss_bool=False,
        )

    corr = brute_force_correspondence(
        jnp.asarray(src), jnp.ones(len(src), bool),
        jnp.asarray(tgt), jnp.ones(len(tgt), bool), jnp.asarray(tgt_n),
    )
    ours = icp_losses(
        jnp.asarray(src), jnp.asarray(src_n), jnp.ones(len(src), bool),
        corr, IcpLossConfig(po2po_alone=True, point_to_point=True),
    )
    np.testing.assert_allclose(
        float(ours["loss_po2po"]), float(ref_losses["loss_po2po"]),
        rtol=1e-4, atol=1e-6,
    )


# ---------------------------------------------------------------------------
# (e) euler conversion parity
# ---------------------------------------------------------------------------


def test_euler_zyx_matches_reference():
    ref_geom = _import_reference("utility.geometry")

    from delora_tpu.se3 import axis_angle_to_rotmat, matrix_to_euler_zyx

    rng = np.random.default_rng(61)
    aa = rng.normal(size=(32, 3)).astype(np.float32)
    R = np.asarray(jax.vmap(axis_angle_to_rotmat)(jnp.asarray(aa)))

    ref = ref_geom.matrix_to_euler_angles(
        matrix=torch.from_numpy(R), convention="ZYX"
    ).numpy()
    ours = np.asarray(jax.vmap(matrix_to_euler_zyx)(jnp.asarray(R)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# (f) deployment closure: reference runtime consumes our exported checkpoint
# ---------------------------------------------------------------------------


def test_deployment_closure_reference_runtime(tmp_path):
    """VERDICT r3 #6: close the deployment loop against the actual reference
    runtime. A `delora export-torch`-format checkpoint
    (utils.torch_import.save_reference_checkpoint — the CLI's engine) is
    loaded by the REFERENCE's own model code and driven through the
    reference inference path — reference ImageProjectionLayer projection of
    our preprocessed scans (utility/projection.py:48), reference
    OdometryModel.forward (models/model.py:103), pose chaining with the
    reference's utility.poses.compute_poses (poses.py:11) — over a synthetic
    sequence. The resulting trajectory must match our own Tester's output
    on the same scans within float tolerance."""
    from tests.test_e2e import e2e_config, synthesize_kitti_sequence

    synthesize_kitti_sequence(str(tmp_path / "raw"), n_scans=8)
    config = dict(e2e_config(tmp_path))
    # Reference-exact quaternion normalization (whole-tensor, model.py:114).
    config["quaternion_normalization"] = "global"
    from delora_tpu.data.preprocess import Preprocessor

    Preprocessor(config).run_dataset("kitti", progress=False)

    # --- our side: random-init state -> Tester trajectory -----------------
    import jax.numpy as jnp2

    from delora_tpu.models.odometry import ModelConfig, OdometryModel
    from delora_tpu.training.state import create_train_state
    from delora_tpu.training.tester import Tester
    from delora_tpu.utils import poses as pose_utils

    model = OdometryModel(ModelConfig.from_config(config))
    state = create_train_state(
        model, config, jnp2.zeros((2, 16, 64, 4), jnp2.float32)
    )
    tester = Tester(config, state=state, run_name="closure")
    rel_ours = tester.predict_sequence("kitti", 0)          # [7, 4, 4]
    poses_ours = pose_utils.compute_poses(list(rel_ours))   # [8, 4, 4]

    # --- export to the reference checkpoint format ------------------------
    from delora_tpu.utils.torch_import import save_reference_checkpoint

    ckpt_path = str(tmp_path / "export.pth")
    save_reference_checkpoint(
        ckpt_path, state.params, config=config,
        blocks_per_stage=tuple(config["layers"]),
    )

    # --- reference side ----------------------------------------------------
    ref_model_mod = _import_reference("models.model")
    ref_proj_mod = _import_reference("utility.projection")
    ref_poses_mod = _import_reference("utility.poses")

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    assert set(ckpt) >= {"epoch", "model_state_dict", "optimizer_state_dict",
                         "loss", "parameters"}
    ref_model = ref_model_mod.OdometryModel({
        "device": "cpu",
        "pre_feature_extraction": False,
        "activation_fct": "tanh",
        "resnet_outputs": int(config["resnet_outputs"]),
        "use_dropout": False,
        "layers": list(config["layers"]),
        "factor_fewer_resnet_channels": int(
            config["factor_fewer_resnet_channels"]),
        "use_single_mlp_at_output": False,
    }).eval()
    ref_model.load_state_dict(ckpt["model_state_dict"])

    from delora_tpu.ops.projection import ProjectionSpec

    spec = ProjectionSpec.from_config(config, "kitti")
    layer = ref_proj_mod.ImageProjectionLayer({
        "device": "cpu",
        "horizontal_field_of_view": [spec.fov_left, spec.fov_right],
        "kitti": {
            "horizontal_cells": spec.width,
            "vertical_cells": spec.height,
            "vertical_field_of_view": [spec.fov_down, spec.fov_up],
        },
    })

    import glob as glob_mod

    scan_files = sorted(glob_mod.glob(
        str(tmp_path / "preprocessed" / "00" / "scans" / "*.npy")))
    assert len(scan_files) == 8

    def ref_project(path):
        pts = np.load(path).astype(np.float32)
        with torch.no_grad():
            img, _, _, _, _ = layer.project_to_img(
                torch.from_numpy(pts.T[None]), dataset="kitti"
            )
        return img                                           # [1, 4, H, W]

    from delora_tpu import se3 as se3_mod

    images = [ref_project(p) for p in scan_files]
    rel_ref = []
    with torch.no_grad():
        for k in range(len(images) - 1):
            t, q = ref_model(images[k], images[k + 1])
            T = np.asarray(se3_mod.transform_from_quat(
                jnp.asarray(t.numpy()), jnp.asarray(q.numpy())))[0]
            rel_ref.append(T[None])                          # [1, 4, 4]
    poses_ref = ref_poses_mod.compute_poses(rel_ref)         # [8, 4, 4]

    # Same predicted relative transforms (identical weights, parity-proven
    # projection + forward), hence the same chained trajectory.
    np.testing.assert_allclose(
        np.stack([r[0] for r in rel_ref]), rel_ours, rtol=1e-3, atol=2e-4
    )
    np.testing.assert_allclose(poses_ref, poses_ours, rtol=1e-3, atol=5e-4)


@pytest.mark.slow
def test_trained_reference_checkpoint_imports_with_trajectory_parity(tmp_path):
    """VERDICT r4 #7: exercise the importer on TRAINED-scale weights, not
    random init. The EXECUTED reference model (parity-harness shims) is
    trained for a few hundred torch-Adam steps on reference-projected
    synthetic scans toward a fixed nontrivial pose (the closest achievable
    proxy for the un-downloadable kitti_example.pth, whose LFS pointer is
    134 bytes here), saved as the reference trainer's exact checkpoint dict
    INCLUDING the real optimizer state (reference src/deploy/trainer.py:
    155-173), imported with utils.torch_import.load_reference_checkpoint,
    and driven through OUR Tester — the trajectory must match the reference
    runtime's own inference (reference projection + forward + pose chaining)
    on the same scans."""
    from tests.test_e2e import e2e_config, synthesize_kitti_sequence

    synthesize_kitti_sequence(str(tmp_path / "raw"), n_scans=8)
    config = dict(e2e_config(tmp_path))
    config["quaternion_normalization"] = "global"  # reference model.py:114
    from delora_tpu.data.preprocess import Preprocessor

    Preprocessor(config).run_dataset("kitti", progress=False)

    ref_model_mod = _import_reference("models.model")
    ref_proj_mod = _import_reference("utility.projection")
    ref_poses_mod = _import_reference("utility.poses")

    ref_model = ref_model_mod.OdometryModel({
        "device": "cpu",
        "pre_feature_extraction": False,
        "activation_fct": "tanh",
        "resnet_outputs": int(config["resnet_outputs"]),
        "use_dropout": False,
        "layers": list(config["layers"]),
        "factor_fewer_resnet_channels": int(
            config["factor_fewer_resnet_channels"]),
        "use_single_mlp_at_output": False,
    })

    from delora_tpu.ops.projection import ProjectionSpec

    spec = ProjectionSpec.from_config(config, "kitti")
    layer = ref_proj_mod.ImageProjectionLayer({
        "device": "cpu",
        "horizontal_field_of_view": [spec.fov_left, spec.fov_right],
        "kitti": {
            "horizontal_cells": spec.width,
            "vertical_cells": spec.height,
            "vertical_field_of_view": [spec.fov_down, spec.fov_up],
        },
    })

    import glob as glob_mod

    scan_files = sorted(glob_mod.glob(
        str(tmp_path / "preprocessed" / "00" / "scans" / "*.npy")))
    assert len(scan_files) == 8

    def ref_project(path):
        pts = np.load(path).astype(np.float32)
        with torch.no_grad():
            img, _, _, _, _ = layer.project_to_img(
                torch.from_numpy(pts.T[None]), dataset="kitti"
            )
        return img                                           # [1, 4, H, W]

    images = [ref_project(p) for p in scan_files]
    img1 = torch.cat(images[:-1], dim=0)                     # [7, 4, H, W]
    img2 = torch.cat(images[1:], dim=0)

    # Train toward a fixed nontrivial pose (supervised, like the reference's
    # identity-fit warmup but with a non-degenerate target so the resulting
    # trajectory actually moves): t = [0.3, 0.02, 0], q = small yaw. The
    # quaternion loss compares the ROW-normalized direction: the reference
    # head's whole-tensor normalization (model.py:114) makes unit rows
    # unreachable, but the direction is what transform_from_quat consumes.
    t_tgt = torch.tensor([[0.30, 0.02, 0.0]]).repeat(7, 1)
    yaw = 0.05
    q_tgt = torch.tensor(
        [[0.0, 0.0, np.sin(yaw / 2), np.cos(yaw / 2)]], dtype=torch.float32
    ).repeat(7, 1)
    opt = torch.optim.Adam(ref_model.parameters(), lr=1e-3)
    ref_model.train()
    loss = None
    for step in range(150):
        opt.zero_grad()
        t, q = ref_model(img1, img2)
        qn = q / q.norm(dim=-1, keepdim=True).clamp_min(1e-8)
        loss = ((t - t_tgt) ** 2).sum(-1).mean() + (
            (qn - q_tgt) ** 2).sum(-1).mean()
        loss.backward()
        opt.step()
    loss = float(loss.detach())
    assert loss < 1e-3, loss  # it actually trained

    # Save the reference trainer's exact checkpoint layout with the REAL
    # optimizer state (trainer.py:155-161).
    ckpt_path = str(tmp_path / "trained_ref.pth")
    torch.save({
        "epoch": 299,
        "model_state_dict": ref_model.state_dict(),
        "optimizer_state_dict": opt.state_dict(),
        "loss": loss,
        "parameters": {"source": "executed-reference training"},
    }, ckpt_path)

    # ---- import into our framework -> Tester trajectory ------------------
    import jax.numpy as jnp2

    from delora_tpu.models.odometry import ModelConfig, OdometryModel
    from delora_tpu.training.state import create_train_state
    from delora_tpu.training.tester import Tester
    from delora_tpu.utils import poses as pose_utils
    from delora_tpu.utils.torch_import import load_reference_checkpoint

    imported = load_reference_checkpoint(
        ckpt_path, blocks_per_stage=tuple(config["layers"])
    )
    model = OdometryModel(ModelConfig.from_config(config))
    state = create_train_state(
        model, config, jnp2.zeros((2, 16, 64, 4), jnp2.float32)
    )
    state = state.replace(params=jax.tree.map(jnp2.asarray, imported))
    tester = Tester(config, state=state, run_name="trained_import")
    rel_ours = tester.predict_sequence("kitti", 0)           # [7, 4, 4]
    poses_ours = pose_utils.compute_poses(list(rel_ours))

    # ---- reference runtime on the same scans -----------------------------
    from delora_tpu import se3 as se3_mod

    ref_model.eval()
    rel_ref = []
    with torch.no_grad():
        for k in range(len(images) - 1):
            t, q = ref_model(images[k], images[k + 1])
            T = np.asarray(se3_mod.transform_from_quat(
                jnp.asarray(t.numpy()), jnp.asarray(q.numpy())))[0]
            rel_ref.append(T[None])
    poses_ref = ref_poses_mod.compute_poses(rel_ref)

    # The trained model predicts ~0.3 m / ~3 deg steps; the chained 8-pose
    # trajectories must agree to float tolerance.
    step_norms = np.linalg.norm(
        np.stack([r[0][:3, 3] for r in rel_ref]), axis=-1)
    assert (step_norms > 0.1).all()            # non-degenerate motion
    np.testing.assert_allclose(
        np.stack([r[0] for r in rel_ref]), rel_ours, rtol=1e-3, atol=5e-4
    )
    np.testing.assert_allclose(poses_ref, poses_ours, rtol=1e-3, atol=2e-3)
