"""Compile-cache seed hydration (utils/cache.py) and the seeding script."""

import os
import subprocess
import sys

from delora_tpu.utils.cache import _hydrate_from_seed

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_hydrate_copies_missing_entries_only(tmp_path):
    seed = tmp_path / ".jax_cache_seed"
    live = tmp_path / ".jax_cache"
    seed.mkdir()
    live.mkdir()
    (seed / "jit_a-111-cache").write_bytes(b"AAA")
    (seed / "jit_b-222-cache").write_bytes(b"BBB")
    (live / "jit_b-222-cache").write_bytes(b"LIVE")  # must not be clobbered

    n = _hydrate_from_seed(str(live))
    assert n == 1
    assert (live / "jit_a-111-cache").read_bytes() == b"AAA"
    assert (live / "jit_b-222-cache").read_bytes() == b"LIVE"
    # Idempotent.
    assert _hydrate_from_seed(str(live)) == 0


def test_hydrate_without_seed_dir_is_noop(tmp_path):
    live = tmp_path / "cache"
    live.mkdir()
    assert _hydrate_from_seed(str(live)) == 0
    assert os.listdir(live) == []


def test_seed_script_excludes_and_snapshots(tmp_path):
    cache = tmp_path / "cache"
    seed = tmp_path / "seed"
    cache.mkdir()
    (cache / "jit_good-abc-cache").write_bytes(b"x" * 10)
    (cache / "jit_bad-dead-cache").write_bytes(b"y" * 10)
    (cache / "jit_huge-fff-cache").write_bytes(b"z" * 2_000_000)

    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "seed_compile_cache.py"),
         "--cache", str(cache), "--seed", str(seed),
         "--max-mb", "1", "--exclude", "dead", "--fresh"],
        capture_output=True, text=True, check=True,
    )
    assert "2 excluded" in out.stdout
    assert sorted(os.listdir(seed)) == ["jit_good-abc-cache"]

    # The repo seed itself must never contain the process-unstable-keyed
    # or diagnostics-only programs' multi-MB entries by accident: everything
    # tracked is a file, non-empty.
    repo_seed = os.path.join(ROOT, ".jax_cache_seed")
    if os.path.isdir(repo_seed):
        names = os.listdir(repo_seed)
        assert names, "seed dir tracked but empty"
        assert all(os.path.getsize(os.path.join(repo_seed, n)) > 0
                   for n in names)
