"""Cached-target-projection path: host projection parity + step equivalence.

The trainer's default projective path precomputes each scan's target image /
normal image once on the host (delora_tpu/ops/projection_host.py) instead of
re-projecting on device every step. These tests pin (a) bit-level parity of
the host projection with the device op, and (b) loss equality of the cached
step against the full step — including under pair normalization, where the
cached image is rescaled by 1/s rather than re-projected.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from delora_tpu.losses.icp import IcpLossConfig
from delora_tpu.models.odometry import ModelConfig, OdometryModel
from delora_tpu.ops.projection import ProjectionSpec, gather_image_attribute, project_scan
from delora_tpu.ops.projection_host import project_scan_np, target_artifacts_np
from delora_tpu.training.state import create_train_state
from delora_tpu.training.step import (
    CachedTargetBatch,
    StepConfig,
    loss_and_metrics,
    loss_and_metrics_cached,
)
from tests.test_step import PSPEC, synthetic_batch


def test_host_projection_matches_device():
    batch, _ = synthetic_batch(seed=3)
    pts = np.asarray(batch.points_1[0])
    valid = np.asarray(batch.valid_1[0])
    dev = project_scan(jnp.asarray(pts), jnp.asarray(valid), PSPEC)
    host = project_scan_np(pts, valid, PSPEC)

    np.testing.assert_array_equal(host.point_index, np.asarray(dev.point_index))
    np.testing.assert_allclose(host.image, np.asarray(dev.image), rtol=1e-6, atol=1e-6)

    nimg_dev = gather_image_attribute(batch.normals_1[0], dev.point_index)
    _, nimg_host, mean_r = target_artifacts_np(
        pts, np.asarray(batch.normals_1[0]), valid, PSPEC
    )
    np.testing.assert_allclose(nimg_host, np.asarray(nimg_dev), rtol=1e-6, atol=1e-6)

    r = np.linalg.norm(pts, axis=-1)
    assert mean_r == pytest.approx(float((r * valid).sum() / valid.sum()), rel=1e-6)


def _cached_from(batch):
    imgs, nimgs, mrs = [], [], []
    for b in range(batch.points_1.shape[0]):
        img, nimg, mr = target_artifacts_np(
            np.asarray(batch.points_1[b]),
            np.asarray(batch.normals_1[b]),
            np.asarray(batch.valid_1[b]),
            PSPEC,
        )
        imgs.append(img)
        nimgs.append(nimg)
        mrs.append(mr)
    return CachedTargetBatch(
        image_1=jnp.asarray(np.stack(imgs)),
        normal_image_1=jnp.asarray(np.stack(nimgs)),
        mean_range_1=jnp.asarray(np.asarray(mrs, np.float32)),
        points_2=batch.points_2,
        normals_2=batch.normals_2,
        valid_2=batch.valid_2,
    )


@pytest.mark.parametrize("normalization", [False, True])
@pytest.mark.parametrize("augment", [False, True])
def test_cached_step_matches_uncached(normalization, augment):
    batch, _ = synthetic_batch(seed=7)
    cached = _cached_from(batch)

    model = OdometryModel(ModelConfig())
    state = create_train_state(
        model, {"learning_rate": 1e-4},
        jnp.zeros((2, PSPEC.height, PSPEC.width, 4)),
    )
    cfg = StepConfig(
        proj=PSPEC, icp=IcpLossConfig(),
        normalization_scaling=normalization, augment=augment,
    )
    rng = jax.random.PRNGKey(42)

    loss_a, (metrics_a, _) = jax.jit(
        lambda p, b, r: loss_and_metrics(state.apply_fn, p, b, cfg, r)
    )(state.params, batch, rng)
    loss_b, (metrics_b, _) = jax.jit(
        lambda p, b, r: loss_and_metrics_cached(state.apply_fn, p, b, cfg, r)
    )(state.params, cached, rng)

    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5, atol=1e-7)
    for k in metrics_a:
        np.testing.assert_allclose(
            float(metrics_a[k]), float(metrics_b[k]), rtol=1e-4, atol=1e-6,
            err_msg=f"metric {k} diverges between cached and uncached step",
        )


def test_dataset_cached_batch_and_trainer_default(tmp_path):
    """ScanPairDataset.make_cached_batch agrees with target_artifacts_np and
    feeds a shape-consistent CachedTargetBatch."""
    from tests.test_data import tiny_config, write_synthetic_preprocessed
    from delora_tpu.data.dataset import ScanPairDataset

    write_synthetic_preprocessed(str(tmp_path))
    config = tiny_config(tmp_path)
    ds = ScanPairDataset(config, "kitti")
    cb = ds.make_cached_batch([0, 1])
    spec = ProjectionSpec.from_config(config, "kitti")
    assert cb.image_1.shape == (2, spec.height, spec.width, 4)
    assert cb.normal_image_1.shape == (2, spec.height, spec.width, 3)
    assert cb.mean_range_1.shape == (2,)
    assert cb.points_2.shape == cb.normals_2.shape

    pair = ds.get_pair(0)
    img, nimg, mr = target_artifacts_np(
        pair["points_1"], pair["normals_1"], pair["valid_1"], spec
    )
    np.testing.assert_array_equal(cb.image_1[0], img)
    np.testing.assert_array_equal(cb.normal_image_1[0], nimg)
