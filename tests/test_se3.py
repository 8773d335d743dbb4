import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from delora_tpu import se3


RNG = np.random.default_rng(0)


def random_quats(n):
    q = RNG.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_to_rotmat_matches_scipy():
    q = random_quats(32)  # scipy uses (x, y, z, w) — same as our convention
    R_ours = np.asarray(se3.quat_to_rotmat(jnp.asarray(q)))
    R_scipy = Rotation.from_quat(q).as_matrix()
    np.testing.assert_allclose(R_ours, R_scipy, atol=1e-6)


def test_quat_to_rotmat_normalizes_input():
    q = random_quats(8)
    R1 = np.asarray(se3.quat_to_rotmat(jnp.asarray(q)))
    R2 = np.asarray(se3.quat_to_rotmat(jnp.asarray(q * 3.7)))
    np.testing.assert_allclose(R1, R2, atol=1e-6)


def test_rotmat_to_quat_roundtrip():
    q = random_quats(64)
    R = Rotation.from_quat(q).as_matrix()
    q_back = np.asarray(se3.rotmat_to_quat(jnp.asarray(R)))
    # Quaternion double cover: compare rotations, not raw vectors.
    R_back = Rotation.from_quat(q_back).as_matrix()
    np.testing.assert_allclose(R_back, R, atol=1e-5)


def test_axis_angle_matches_scipy():
    aa = RNG.normal(size=(16, 3)) * 0.5
    R_ours = np.asarray(se3.axis_angle_to_rotmat(jnp.asarray(aa)))
    R_scipy = Rotation.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(R_ours, R_scipy, atol=1e-6)


def test_axis_angle_zero_is_identity():
    R = np.asarray(se3.axis_angle_to_rotmat(jnp.zeros((3,))))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-7)


def test_transform_points_matches_manual():
    q = random_quats(4)
    t = RNG.normal(size=(4, 3))
    T = np.asarray(se3.make_transform(jnp.asarray(t), jnp.asarray(
        Rotation.from_quat(q).as_matrix())))
    pts = RNG.normal(size=(4, 100, 3))
    out = np.asarray(se3.transform_points(jnp.asarray(T), jnp.asarray(pts)))
    for b in range(4):
        expected = pts[b] @ T[b, :3, :3].T + T[b, :3, 3]
        np.testing.assert_allclose(out[b], expected, atol=1e-5)


def test_invert():
    q = random_quats(8)
    t = RNG.normal(size=(8, 3))
    T = se3.make_transform(jnp.asarray(t), se3.quat_to_rotmat(jnp.asarray(q)))
    eye = np.asarray(se3.compose(T, se3.invert(T)))
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-5)


def test_euler_zyx_matches_scipy():
    q = random_quats(32)
    R = Rotation.from_quat(q).as_matrix()
    ours = np.asarray(se3.matrix_to_euler_zyx(jnp.asarray(R)))
    ref = Rotation.from_quat(q).as_euler("ZYX")  # intrinsic Z-Y-X (capital)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_reorthonormalize_fixes_drift():
    q = random_quats(8)
    R = Rotation.from_quat(q).as_matrix() + RNG.normal(size=(8, 3, 3)) * 1e-4
    T = se3.make_transform(jnp.zeros((8, 3)), jnp.asarray(R))
    T_fixed = np.asarray(se3.reorthonormalize(T))
    for b in range(8):
        Rb = T_fixed[b, :3, :3]
        np.testing.assert_allclose(Rb @ Rb.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(Rb) == pytest.approx(1.0, abs=1e-5)


def test_geodesic_angle():
    aa = np.zeros((5, 3))
    aa[:, 2] = np.linspace(0.1, 1.0, 5)
    R = Rotation.from_rotvec(aa).as_matrix()
    eye = np.broadcast_to(np.eye(3), R.shape)
    ang = np.asarray(se3.rotation_geodesic_angle(jnp.asarray(eye), jnp.asarray(R)))
    np.testing.assert_allclose(ang, aa[:, 2], atol=1e-5)
