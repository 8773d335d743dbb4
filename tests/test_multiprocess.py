"""True multi-process distributed training (VERDICT r1 item 2).

Spawns 2 real OS processes (jax.distributed.initialize over loopback, 4
virtual CPU devices each) running the full Trainer, and checks their global
behavior against a single-process 8-device run: identical losses across
ranks, per-epoch loss parity with the single-process run, process-0
checkpointing + resume on all ranks. The heavy lifting lives in
scripts/multiprocess_smoke.py so the driver's dryrun can reuse it.
"""

import sys

import pytest


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    sys.path.insert(0, "scripts")
    from multiprocess_smoke import run_smoke

    verdict = run_smoke(str(tmp_path), nproc=2, port=12461)
    assert verdict["ok"]
    assert verdict["max_rel_drift"] < 1e-3


def test_two_process_training_parity_fast(tmp_path):
    """Default-gate 2-process parity (VERDICT r4 item 9): same harness as the
    slow smoke at a trimmed profile (2 procs x 2 devices, 1 epoch, tiny
    shapes, no resume leg) so a multiprocess regression — distributed init,
    the process-local shard_batch branch, per-host loader shards, collective
    checkpointing — surfaces in plain ``pytest``, not just the slow tier."""
    sys.path.insert(0, "scripts")
    from multiprocess_smoke import run_smoke

    verdict = run_smoke(str(tmp_path), nproc=2, port=12471, fast=True)
    assert verdict["ok"]
    assert verdict["max_rel_drift"] < 1e-3
