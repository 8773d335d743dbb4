import numpy as np

import jax.numpy as jnp

from delora_tpu.ops.normals import NormalsSpec, compute_normal_image, normals_for_points
from delora_tpu.ops.projection import ProjectionSpec, project_scan

SPEC = NormalsSpec(patch_v=7, patch_u=11, epsilon_range=0.5, min_neighbors=10)


def plane_image(H=16, W=32, normal=(0.0, 0.0, 1.0), d=-2.0):
    """Pixels sample a plane n.x = d below the sensor; regular grid in x-y."""
    n = np.asarray(normal) / np.linalg.norm(normal)
    xs = np.linspace(2.0, 6.0, W)
    ys = np.linspace(-2.0, 2.0, H)
    img = np.zeros((H, W, 3), dtype=np.float32)
    for i, y in enumerate(ys):
        for j, x in enumerate(xs):
            z = (d - n[0] * x - n[1] * y) / n[2]
            img[i, j] = (x, y, z)
    return img, n


def test_plane_normals():
    img, n = plane_image()
    # epsilon_range gate: points on a tilted plane have varying range; use a
    # generous epsilon so the neighborhood survives.
    spec = SPEC._replace(epsilon_range=5.0)
    normals = np.asarray(compute_normal_image(jnp.asarray(img), spec))
    inner = normals[3:-3, 5:-5]
    norms = np.linalg.norm(inner, axis=-1)
    assert np.all(norms > 0.99)
    cos = np.abs(inner @ n)
    assert np.all(cos > 0.999)


def test_normals_flipped_toward_sensor():
    img, _ = plane_image()
    spec = SPEC._replace(epsilon_range=5.0)
    normals = np.asarray(compute_normal_image(jnp.asarray(img), spec))
    pts = img.reshape(-1, 3)
    nrm = normals.reshape(-1, 3)
    mask = np.linalg.norm(nrm, axis=-1) > 0.5
    dots = np.sum(pts[mask] * nrm[mask], axis=-1)
    assert np.all(dots <= 1e-5)  # dot(n, p) > 0 must have been flipped


def test_empty_pixels_get_zero_normals():
    img, _ = plane_image()
    img[5:9, 10:20] = 0.0  # a hole
    spec = SPEC._replace(epsilon_range=5.0)
    normals = np.asarray(compute_normal_image(jnp.asarray(img), spec))
    assert np.all(normals[6:8, 12:18] == 0.0)


def test_min_neighbor_threshold():
    # Single isolated pixel: not enough neighbors -> zero normal.
    img = np.zeros((16, 32, 3), dtype=np.float32)
    img[8, 16] = (4.0, 0.1, -1.0)
    normals = np.asarray(compute_normal_image(jnp.asarray(img), SPEC))
    assert np.all(normals == 0.0)


def test_epsilon_range_excludes_outliers():
    # A flat plane with one far-away outlier neighbor: the outlier pixel's
    # contribution must be excluded from its neighbors' covariances.
    img, n = plane_image()
    spec = SPEC._replace(epsilon_range=5.0)
    base = np.asarray(compute_normal_image(jnp.asarray(img), spec))
    img2 = img.copy()
    img2[8, 16] *= 50.0  # huge range outlier
    with_outlier = np.asarray(compute_normal_image(jnp.asarray(img2), spec))
    # Away from the outlier pixel itself, normals should be unchanged.
    np.testing.assert_allclose(with_outlier[:4], base[:4], atol=1e-5)
    # Neighbors of the outlier still get ~plane normals (outlier excluded).
    neighbor = with_outlier[8, 14]
    assert abs(np.dot(neighbor, n)) > 0.99


def test_normals_for_points_roundtrip():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(400, 3)) * np.array([8.0, 8.0, 0.5]) - np.array([0, 0, 1.5])
    pts = pts.astype(np.float32)
    valid = np.ones(400, dtype=bool)
    pspec = ProjectionSpec(
        height=16, width=64,
        fov_down=np.deg2rad(-24.5), fov_up=np.deg2rad(2.0),
        fov_left=np.deg2rad(-179.9), fov_right=np.deg2rad(179.9),
    )
    proj = project_scan(jnp.asarray(pts), jnp.asarray(valid), pspec)
    per_point = np.asarray(
        normals_for_points(proj.image[..., :3], proj, spec=SPEC)
    )
    survivor = np.asarray(proj.survivor)
    # Non-surviving points must have zero normals.
    assert np.all(per_point[~survivor] == 0.0)
    # Surviving points' normals match the image computation at their pixel.
    normal_img = np.asarray(compute_normal_image(proj.image[..., :3], SPEC))
    pidx = np.asarray(proj.point_index)
    for vv, uu in zip(*np.nonzero(pidx >= 0)):
        np.testing.assert_allclose(per_point[pidx[vv, uu]], normal_img[vv, uu], atol=1e-6)
