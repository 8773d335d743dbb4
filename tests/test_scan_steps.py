"""K-steps-per-dispatch training equivalence.

The HBM-resident trainer path runs K optimizer steps inside one jitted
``lax.scan`` program (trainer._scan_steps_fn) to amortize per-dispatch
round trips. This must be numerically equivalent to dispatching the steps
one at a time: same batch order (on-device gather from the stacked tables
vs per-step selection), same RNG stream (the carried key is split once per
step exactly as the host loop would), same optimizer trajectory.
"""

import numpy as np
import pytest

from tests.test_e2e import e2e_config, synthesize_kitti_sequence


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("scan_steps")
    # 12 scans -> 11 pairs -> 5 steps at batch 2 (epoch_indices drops to a
    # multiple of the batch), so K=4 runs one FULL K=4 chunk plus a k=1
    # remainder chunk — both compiled programs are exercised.
    synthesize_kitti_sequence(str(tmp_path / "raw"), n_scans=12)
    from delora_tpu.data.preprocess import Preprocessor

    Preprocessor(e2e_config(tmp_path)).run_dataset("kitti", progress=False)
    return tmp_path


def _train(world, k, seed=0):
    import jax

    from delora_tpu.training.trainer import Trainer

    config = e2e_config(world)
    config["steps_per_dispatch"] = k
    config["seed"] = seed
    config["checkpoint_dir"] = str(world / f"ckpt_k{k}")
    config["log_dir"] = str(world / f"runs_k{k}")
    trainer = Trainer(config, run_name=f"k{k}")
    assert trainer.device_cached and trainer.mesh is None
    assert trainer._device_tables  # stacked form on the no-mesh path
    stats = trainer.train_epoch(0)
    params = jax.device_get(trainer.state.params)
    return params, stats


def test_k_steps_match_per_step_dispatch(world):
    """steps_per_dispatch=4 reproduces the K=1 trajectory (5 steps with
    batch 2 over 11 pairs -> one full K=4 chunk + one k=1 remainder chunk,
    so the full-chunk and remainder programs are both exercised, and RNG
    threading across the chunk boundary is covered)."""
    import jax

    p1, s1 = _train(world, 1)
    p4, s4 = _train(world, 4)
    assert s1["steps"] == s4["steps"] > 1
    flat1 = np.concatenate([np.ravel(x) for x in jax.tree.leaves(p1)])
    flat4 = np.concatenate([np.ravel(x) for x in jax.tree.leaves(p4)])
    np.testing.assert_allclose(flat4, flat1, rtol=2e-5, atol=2e-7)
    assert np.isclose(s1["loss"], s4["loss"], rtol=2e-4)


def test_epoch_metrics_rows_match_step_count(world):
    """The mixed scalar/vector metric aggregation counts every real step."""
    _, stats = _train(world, 3, seed=1)
    # 11 pairs, batch 2 -> 5 steps: one K=3 chunk + one k=2 remainder.
    assert stats["steps"] == 5
    assert np.isfinite(stats["loss"])
