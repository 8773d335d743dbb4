"""Fully-cached feed (both scans' projections precomputed on the host).

Pins (a) bit-level parity of the host survivor compaction
(``scan_artifacts_np``) with the device op (``project_scan_compact``),
(b) loss/metric equality of the fully-cached step against the cached-target
step — the trainer's default path when augmentation is off — including under
pair normalization, and (c) the dataset/trainer feed-mode plumbing.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from delora_tpu.losses.icp import IcpLossConfig
from delora_tpu.models.odometry import ModelConfig, OdometryModel
from delora_tpu.ops.projection import project_scan_compact
from delora_tpu.ops.projection_host import scan_artifacts_np
from delora_tpu.training.state import create_train_state
from delora_tpu.training.step import (
    CachedTargetBatch,
    FullyCachedBatch,
    StepConfig,
    loss_and_metrics_cached,
    loss_and_metrics_fullcached,
    make_train_step_fullcached,
)
from tests.test_cached_target import _cached_from
from tests.test_step import PSPEC, synthetic_batch


def test_host_compaction_matches_device():
    batch, _ = synthetic_batch(seed=11)
    pts = np.asarray(batch.points_2[0])
    nrm = np.asarray(batch.normals_2[0])
    valid = np.asarray(batch.valid_2[0])

    dev = project_scan_compact(jnp.asarray(pts), jnp.asarray(valid), PSPEC)
    host = scan_artifacts_np(pts, nrm, valid, PSPEC)

    np.testing.assert_array_equal(host.src_valid, np.asarray(dev.mask))
    k = int(host.src_valid.sum())
    # Winner ids in identical (pixel-ascending) order.
    np.testing.assert_array_equal(
        np.asarray(dev.ids)[:k], np.flatnonzero(
            np.isin(np.arange(len(pts)), np.asarray(dev.ids)[:k])
        )[np.argsort(np.argsort(np.asarray(dev.ids)[:k]))],
    )
    np.testing.assert_allclose(
        host.src_points[:k], pts[np.asarray(dev.ids)[:k]], rtol=1e-6
    )
    np.testing.assert_allclose(
        host.src_normals[:k], nrm[np.asarray(dev.ids)[:k]], rtol=1e-6
    )
    np.testing.assert_allclose(
        host.image, np.asarray(dev.image), rtol=1e-6, atol=1e-6
    )


def _fullcached_from(batch):
    """Assemble a FullyCachedBatch from a raw ScanPairBatch via host caching."""
    cols = {f: [] for f in FullyCachedBatch._fields}
    for b in range(batch.points_1.shape[0]):
        tgt = scan_artifacts_np(
            np.asarray(batch.points_1[b]), np.asarray(batch.normals_1[b]),
            np.asarray(batch.valid_1[b]), PSPEC,
        )
        src = scan_artifacts_np(
            np.asarray(batch.points_2[b]), np.asarray(batch.normals_2[b]),
            np.asarray(batch.valid_2[b]), PSPEC,
        )
        cols["image_1"].append(tgt.image)
        cols["normal_image_1"].append(tgt.normal_image)
        cols["mean_range_1"].append(tgt.mean_range)
        cols["image_2"].append(src.image)
        cols["src_points"].append(src.src_points)
        cols["src_normals"].append(src.src_normals)
        cols["src_valid"].append(src.src_valid)
        cols["mean_range_2"].append(src.mean_range)
    return FullyCachedBatch(
        image_1=jnp.asarray(np.stack(cols["image_1"])),
        normal_image_1=jnp.asarray(np.stack(cols["normal_image_1"])),
        mean_range_1=jnp.asarray(np.asarray(cols["mean_range_1"], np.float32)),
        image_2=jnp.asarray(np.stack(cols["image_2"])),
        src_points=jnp.asarray(np.stack(cols["src_points"])),
        src_normals=jnp.asarray(np.stack(cols["src_normals"])),
        src_valid=jnp.asarray(np.stack(cols["src_valid"])),
        mean_range_2=jnp.asarray(np.asarray(cols["mean_range_2"], np.float32)),
    )


@pytest.mark.parametrize("normalization", [False, True])
@pytest.mark.parametrize("correspondence", ["image", "projective"])
def test_fullcached_step_matches_cached(normalization, correspondence):
    batch, _ = synthetic_batch(seed=13)
    cached = _cached_from(batch)
    full = _fullcached_from(batch)

    model = OdometryModel(ModelConfig())
    state = create_train_state(
        model, {"learning_rate": 1e-4},
        jnp.zeros((2, PSPEC.height, PSPEC.width, 4)),
    )
    cfg = StepConfig(
        proj=PSPEC, icp=IcpLossConfig(),
        correspondence=correspondence,
        normalization_scaling=normalization,
    )
    rng = jax.random.PRNGKey(21)

    loss_a, (metrics_a, _) = jax.jit(
        lambda p, b, r: loss_and_metrics_cached(state.apply_fn, p, b, cfg, r)
    )(state.params, cached, rng)
    loss_b, (metrics_b, _) = jax.jit(
        lambda p, b, r: loss_and_metrics_fullcached(state.apply_fn, p, b, cfg, r)
    )(state.params, full, rng)

    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5, atol=1e-7)
    for k in metrics_a:
        if k == "visible_pixels":
            # The fullcached step's visibility stat counts compacted source
            # slots; cached counts raw padded slots — same up to dedup ties.
            np.testing.assert_allclose(
                float(metrics_a[k]), float(metrics_b[k]), rtol=0.02,
            )
            continue
        np.testing.assert_allclose(
            float(metrics_a[k]), float(metrics_b[k]), rtol=1e-4, atol=1e-6,
            err_msg=f"metric {k} diverges between fullcached and cached step",
        )


@pytest.mark.parametrize("normalization", [False, True])
def test_fullcached_augment_equals_cached(normalization):
    """Augment-on fullcached step == cached-target step when projection keeps
    every source point (survivor rotation is then identical to raw-cloud
    rotation; see loss_and_metrics_fullcached docstring for the dense-cloud
    deviation this pins the absence of)."""
    batch, _ = synthetic_batch(seed=17)
    # Make the raw source EXACTLY the unrotated survivor set: projecting it
    # has no dedup losers, so rotating survivors == rotating the raw cloud.
    full0 = _fullcached_from(batch)
    batch = batch._replace(
        points_2=full0.src_points,
        normals_2=full0.src_normals,
        valid_2=full0.src_valid,
    )
    cached = _cached_from(batch)
    full = _fullcached_from(batch)

    model = OdometryModel(ModelConfig())
    state = create_train_state(
        model, {"learning_rate": 1e-4},
        jnp.zeros((2, PSPEC.height, PSPEC.width, 4)),
    )
    cfg = StepConfig(
        proj=PSPEC, icp=IcpLossConfig(),
        augment=True, augment_magnitude_rad=0.0698,
        normalization_scaling=normalization,
    )
    rng = jax.random.PRNGKey(33)

    loss_a, (metrics_a, _) = jax.jit(
        lambda p, b, r: loss_and_metrics_cached(state.apply_fn, p, b, cfg, r)
    )(state.params, cached, rng)
    loss_b, (metrics_b, _) = jax.jit(
        lambda p, b, r: loss_and_metrics_fullcached(state.apply_fn, p, b, cfg, r)
    )(state.params, full, rng)

    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5, atol=1e-7)
    for k in metrics_a:
        np.testing.assert_allclose(
            float(metrics_a[k]), float(metrics_b[k]), rtol=1e-4, atol=1e-6,
            err_msg=f"metric {k} diverges (augment-on fullcached vs cached)",
        )


def test_fullcached_augment_train_step_runs():
    batch, _ = synthetic_batch(seed=19)
    full = _fullcached_from(batch)
    model = OdometryModel(ModelConfig())
    state = create_train_state(
        model, {"learning_rate": 1e-4},
        jnp.zeros((2, PSPEC.height, PSPEC.width, 4)),
    )
    cfg = StepConfig(proj=PSPEC, icp=IcpLossConfig(), augment=True)
    step = make_train_step_fullcached(model, cfg, donate=False)
    _, metrics = step(state, full, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_dataset_fullcached_batch_and_trainer_feed(tmp_path):
    from tests.test_data import tiny_config, write_synthetic_preprocessed
    from delora_tpu.data.dataset import ScanPairDataset
    from delora_tpu.ops.projection import ProjectionSpec

    write_synthetic_preprocessed(str(tmp_path))
    config = tiny_config(tmp_path)
    ds = ScanPairDataset(config, "kitti")
    fb = ds.make_fullcached_batch([0, 1])
    spec = ProjectionSpec.from_config(config, "kitti")
    cap = min(ds.max_points, spec.height * spec.width)
    assert fb.image_1.shape == (2, spec.height, spec.width, 4)
    assert fb.image_2.shape == (2, spec.height, spec.width, 4)
    assert fb.src_points.shape == (2, cap, 3)
    assert fb.src_valid.shape == (2, cap)
    # pair 0's source scan is pair 1's target scan: same cached image.
    np.testing.assert_array_equal(fb.image_2[0], fb.image_1[1])


def test_fullcached_augment_deviation_quantified_at_density():
    """VERDICT r2 item 5: quantify the fullcached-augment estimator deviation
    at KITTI-like candidate density (structured world, ~6 ray hits per
    occupied train pixel — the reference stores 2250-azimuth preprocessed
    scans and trains at 720, so train-time projection always has same-surface
    dedup losers) and the reference's 4 deg augment magnitude
    (deployer.py:205). Normals are computed at the PREPROCESSING resolution
    (every stored point has one), faithful to the reference scheme.

    Deviation mechanism (loss_and_metrics_fullcached docstring): points that
    LOST the per-pixel dedup in the unrotated frame cannot resurface as
    winners after rotation. Measured decomposition vs the deviation-free
    cached path (which rotates the RAW cloud and re-projects):
      * coverage loss — pixels occupied under raw rotation but EMPTY under
        survivor rotation (two winners collide post-rotation): ~6%,
      * winner swaps — both occupied but a different (same-surface)
        candidate won: ~40% of occupied pixels, median |delta range| ~0.5 m,
      * relative loss delta at a random init: ~18%.
    These numbers are cited from the step.py docstring; the asserted bounds
    pin them against regression. The TRAINING-QUALITY impact is measured
    separately by the on-chip augment A/B (docs/BENCH_NOTES.md)."""
    from delora_tpu.data.synthetic import make_world, simulate_scan
    from delora_tpu.ops.normals import normals_for_points
    from delora_tpu.ops.projection import (
        ProjectionSpec, project_compact_exact_batch, project_scan,
    )
    from delora_tpu.training.step import ScanPairBatch, _augment
    from tests.test_step import NSPEC, make_model_and_state

    hi_spec = ProjectionSpec(
        height=32, width=192,
        fov_down=PSPEC.fov_down, fov_up=PSPEC.fov_up,
        fov_left=PSPEC.fov_left, fov_right=PSPEC.fov_right,
    )
    world = make_world(seed=3)
    hits = simulate_scan(world, np.eye(4), rings=32, azimuth_steps=192)
    Nd = 6144
    pts = np.zeros((Nd, 3), np.float32)
    pts[: len(hits)] = hits
    valid = np.zeros(Nd, bool)
    valid[: len(hits)] = True
    # Normals at preprocessing resolution: every stored point is a winner
    # there, so train-time dedup losers carry valid normals (reference
    # preprocesser.py:74 resolution switch).
    hproj = project_scan(jnp.asarray(pts), jnp.asarray(valid), hi_spec)
    nrm = np.asarray(normals_for_points(hproj.image[..., :3], hproj, NSPEC))

    B = 2
    tile = lambda a: jnp.asarray(np.stack([a] * B))  # noqa: E731
    batch = ScanPairBatch(
        points_1=tile(pts), normals_1=tile(nrm), valid_1=tile(valid),
        points_2=tile(pts), normals_2=tile(nrm), valid_2=tile(valid),
    )
    cached = _cached_from(batch)
    full = _fullcached_from(batch)

    # Dedup losers must actually exist for this test to mean anything.
    n_valid = int(valid.sum())
    n_losers = n_valid - int(np.asarray(full.src_valid[0]).sum())
    assert n_losers > n_valid // 2, n_losers

    model, state = make_model_and_state()
    cfg = StepConfig(
        proj=PSPEC, icp=IcpLossConfig(),
        augment=True, augment_magnitude_rad=0.0698,   # 4 degrees
    )
    rng = jax.random.PRNGKey(41)

    loss_a, (ma, _) = jax.jit(
        lambda p, b, r: loss_and_metrics_cached(state.apply_fn, p, b, cfg, r)
    )(state.params, cached, rng)
    loss_b, (mb, _) = jax.jit(
        lambda p, b, r: loss_and_metrics_fullcached(state.apply_fn, p, b, cfg, r)
    )(state.params, full, rng)
    rel_loss_delta = abs(float(loss_a) - float(loss_b)) / max(
        abs(float(loss_a)), 1e-12
    )

    # Differing model-input pixels: project the rotated RAW cloud (cached
    # path) vs the rotated SURVIVORS (fullcached path) with the same
    # augmentation rng split the steps use internally.
    aug_rng, _ = jax.random.split(rng)
    p_rot, n_rot = _augment(batch.points_2, batch.normals_2, aug_rng, cfg)
    s_rot, sn_rot = _augment(full.src_points, full.src_normals, aug_rng, cfg)
    img_a = project_compact_exact_batch(
        p_rot, batch.valid_2, PSPEC,
        values=jnp.concatenate([p_rot, n_rot], -1),
    ).image
    img_b = project_compact_exact_batch(
        s_rot, full.src_valid, PSPEC,
        values=jnp.concatenate([s_rot, sn_rot], -1),
    ).image
    ra = np.asarray(img_a[..., 6])
    rb = np.asarray(img_b[..., 6])
    occupied = (ra > 0) | (rb > 0)
    coverage_loss = ((ra > 0) & (rb == 0)).sum() / occupied.sum()
    both = (ra > 0) & (rb > 0)
    swaps = (both & (ra != rb)).sum() / occupied.sum()
    dr = np.abs(ra - rb)[both & (ra != rb)]
    pair_ratio = float(mb["num_po2pl_pairs"]) / max(
        float(ma["num_po2pl_pairs"]), 1.0
    )
    print(
        f"augment deviation: coverage_loss={coverage_loss:.4f} "
        f"winner_swaps={swaps:.4f} median|dr|={np.median(dr):.3f} m "
        f"rel_loss_delta={rel_loss_delta:.4f} po2pl_pair_ratio="
        f"{pair_ratio:.3f} losers={n_losers}/{n_valid}"
    )

    # Bounds cited in the loss_and_metrics_fullcached docstring.
    assert coverage_loss <= 0.10, coverage_loss
    assert swaps <= 0.55, swaps
    assert np.median(dr) <= 2.0, np.median(dr)
    assert rel_loss_delta <= 0.30, rel_loss_delta
    assert 0.5 <= pair_ratio <= 1.5, pair_ratio
