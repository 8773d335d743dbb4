"""SE(3) / quaternion / rotation math (pure jnp, fully batched & jittable).

Replaces the reference's kornia + pytorch3d + scipy.Rotation stack
(reference src/models/model_parts.py, src/utility/geometry.py,
src/utility/poses.py:43-49) with one self-contained library.

Conventions
-----------
* Quaternions are ``(x, y, z, w)`` — the kornia 0.3.0 convention the reference
  model was trained under (model_parts.py:30-31 calls
  ``kornia.quaternion_to_rotation_matrix`` which unpacks x,y,z,w). Helpers to
  convert to/from ``(w, x, y, z)`` are provided.
* ``quat_to_rotmat`` normalizes the quaternion per row internally, as kornia
  0.3.0 does — this makes rotations well-defined even under the reference's
  whole-tensor output normalization (model.py:114).
* Points are row vectors with trailing dim 3: ``[..., N, 3]``.
* Transforms are ``[..., 4, 4]`` homogeneous matrices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_quat(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize quaternion(s) along the last axis."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (x, y, z, w), any scale -> rotation matrix [..., 3, 3]."""
    q = normalize_quat(q)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    row0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1)
    row1 = jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1)
    row2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> unit quaternion (x, y, z, w).

    Branchless magnitude-plus-copysign construction; exact on true rotation
    matrices, stable enough for SO(3) re-orthonormalization round trips.
    """
    r00, r01, r02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    r10, r11, r12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    r20, r21, r22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    qw = 0.5 * jnp.sqrt(jnp.clip(1.0 + r00 + r11 + r22, 0.0, None))
    qx = 0.5 * jnp.sqrt(jnp.clip(1.0 + r00 - r11 - r22, 0.0, None))
    qy = 0.5 * jnp.sqrt(jnp.clip(1.0 - r00 + r11 - r22, 0.0, None))
    qz = 0.5 * jnp.sqrt(jnp.clip(1.0 - r00 - r11 + r22, 0.0, None))
    qx = jnp.copysign(qx, r21 - r12)
    qy = jnp.copysign(qy, r02 - r20)
    qz = jnp.copysign(qz, r10 - r01)
    return normalize_quat(jnp.stack([qx, qy, qz, qw], axis=-1))


def axis_angle_to_rotmat(aa: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Axis-angle vector [..., 3] (angle = |aa|) -> rotation matrix (Rodrigues).

    Replaces kornia.angle_axis_to_rotation_matrix used for augmentation
    rotations (reference model_parts.py:34-35, deployer.py:191-199).
    """
    angle = jnp.linalg.norm(aa, axis=-1, keepdims=True)
    axis = aa / jnp.maximum(angle, eps)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    theta = angle[..., 0]
    c, s = jnp.cos(theta), jnp.sin(theta)
    C = 1.0 - c
    row0 = jnp.stack([c + x * x * C, x * y * C - z * s, x * z * C + y * s], -1)
    row1 = jnp.stack([y * x * C + z * s, c + y * y * C, y * z * C - x * s], -1)
    row2 = jnp.stack([z * x * C - y * s, z * y * C + x * s, c + z * z * C], -1)
    R = jnp.stack([row0, row1, row2], axis=-2)
    # angle ~ 0 -> identity
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    return jnp.where(theta[..., None, None] < eps, eye, R)


def make_transform(translation: jnp.ndarray, rotation: jnp.ndarray) -> jnp.ndarray:
    """Assemble [..., 4, 4] from translation [..., 3] and rotation [..., 3, 3].

    Parity: reference GeometryHandler.get_transformation_matrix_quaternion
    (model_parts.py:38-44).
    """
    batch_shape = rotation.shape[:-2]
    T = jnp.zeros(batch_shape + (4, 4), dtype=rotation.dtype)
    T = T.at[..., :3, :3].set(rotation)
    T = T.at[..., :3, 3].set(translation)
    T = T.at[..., 3, 3].set(1.0)
    return T


def transform_from_quat(translation: jnp.ndarray, quat_xyzw: jnp.ndarray) -> jnp.ndarray:
    return make_transform(translation, quat_to_rotmat(quat_xyzw))


def transform_points(T: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply [..., 4, 4] to points [..., N, 3] -> [..., N, 3] (rotate+translate).

    Parity: reference Deployer.transform_point_cloud_transformation_matrix
    (deployer.py:184-189), in [N, 3] layout instead of [3, N].
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return points @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


def rotate_points(T_or_R: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Rotate-only (for normals — reference deployer.py:181-182)."""
    R = T_or_R[..., :3, :3]
    return points @ jnp.swapaxes(R, -1, -2)


def compose(T_a: jnp.ndarray, T_b: jnp.ndarray) -> jnp.ndarray:
    """T_a @ T_b."""
    return T_a @ T_b


def invert(T: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a rigid transform without a general solve."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_transform(-(Rt @ t[..., None])[..., 0], Rt)


def reorthonormalize(T: jnp.ndarray) -> jnp.ndarray:
    """Snap the rotation block back onto SO(3) via a quaternion round trip.

    Parity: reference poses.py:43-49 (scipy Rotation -> quat -> normalize ->
    matrix) applied after every pose chaining step.
    """
    R = quat_to_rotmat(rotmat_to_quat(T[..., :3, :3]))
    return make_transform(T[..., :3, 3], R)


def matrix_to_euler_zyx(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> (yaw, pitch, roll) Tait-Bryan ZYX angles.

    Semantics match pytorch3d's matrix_to_euler_angles(convention="ZYX") which
    the reference vendored (src/utility/geometry.py:48, used by
    GeometryHandler.get_euler_angles_from_matrix for error plots):
    yaw = atan2(R10, R00), pitch = asin(-R20), roll = atan2(R21, R22).
    """
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    pitch = jnp.arcsin(jnp.clip(-R[..., 2, 0], -1.0, 1.0))
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    return jnp.stack([yaw, pitch, roll], axis=-1)


def quat_wxyz_to_xyzw(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([q[..., 1:], q[..., :1]], axis=-1)


def quat_xyzw_to_wxyz(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([q[..., 3:], q[..., :3]], axis=-1)


def rotation_geodesic_angle(R_a: jnp.ndarray, R_b: jnp.ndarray) -> jnp.ndarray:
    """Angle of R_a^T R_b in radians (for eval metrics)."""
    M = jnp.swapaxes(R_a, -1, -2) @ R_b
    cos = (jnp.trace(M, axis1=-2, axis2=-1) - 1.0) * 0.5
    return jnp.arccos(jnp.clip(cos, -1.0, 1.0))
