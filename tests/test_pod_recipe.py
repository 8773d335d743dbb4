"""Pod large-batch recipe in CI (VERDICT r1 item 3).

The 4096-pair preset must load through the 3-YAML stack, resolve the
linear-scaled LR to 1.28e-3, produce correct disjoint per-host loader
shards, and compile + run ONE sharded fullcached step at the full 4096
global batch on the 8-device virtual CPU mesh (reduced model). The scaling
SWEEP lives in scripts/pod_scaling.py --sweep (wall-clock efficiency is
meaningless on virtual devices sharing two cores, so it is not asserted
here).
"""

import sys

import jax


pytestmark = __import__("pytest").mark.slow


def test_pod_recipe_4096_dryrun():
    sys.path.insert(0, "scripts")
    from pod_scaling import run_recipe

    out = run_recipe(n_devices=8)
    assert out["ok"]
    assert out["global_batch"] == 4096
    assert abs(out["effective_lr"] - 1.28e-3) < 1e-9
    assert out["host_shard_sizes"] == [6144, 6144]
    assert out["devices"] == len(jax.devices()[:8])
