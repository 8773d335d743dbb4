"""Compile-cache seed hydration (utils/cache.py) and the seeding script."""

import os
import subprocess
import sys

import pytest

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

    n = _hydrate_from_seed(str(live), seed=str(seed))
    assert n == 1
    assert (live / "jit_a-111-cache").read_bytes() == b"AAA"
    assert (live / "jit_b-222-cache").read_bytes() == b"LIVE"
    # Hydrated entries are COPIES, not hardlinks — a cache rewrite must never
    # reach back into the git-tracked seed through a shared inode.
    assert os.stat(live / "jit_a-111-cache").st_ino != os.stat(
        seed / "jit_a-111-cache").st_ino
    # Idempotent.
    assert _hydrate_from_seed(str(live), seed=str(seed)) == 0


def test_hydrate_default_seed_is_repo_root_anchored(tmp_path):
    """With no explicit seed, hydration resolves the repo-root seed dir even
    for cache dirs far outside the repo (DELORA_JAX_CACHE) or with trailing
    slashes — it must never silently no-op on a custom location."""
    from delora_tpu.utils import cache as C

    live = tmp_path / "deep" / "custom-cache"
    live.mkdir(parents=True)
    repo_seed = os.path.join(C._REPO_ROOT, ".jax_cache_seed")
    expected = len(os.listdir(repo_seed)) if os.path.isdir(repo_seed) else 0
    assert _hydrate_from_seed(str(live)) == expected
    assert len(os.listdir(live)) == expected


def test_hydrate_without_seed_dir_is_noop(tmp_path):
    live = tmp_path / "cache"
    live.mkdir()
    assert _hydrate_from_seed(str(live), seed=str(tmp_path / "nope")) == 0
    assert os.listdir(live) == []


def test_seed_script_excludes_and_snapshots(tmp_path):
    cache = tmp_path / "cache"
    seed = tmp_path / "seed"
    cache.mkdir()
    seed.mkdir()
    (cache / "jit_good-abc-cache").write_bytes(b"x" * 10)
    (cache / "jit_bad-dead-cache").write_bytes(b"y" * 10)
    (cache / "jit_huge-fff-cache").write_bytes(b"z" * 2_000_000)
    # A previously-seeded entry that no longer exists in the live cache:
    # the default exact-snapshot mode must drop it (refreshes replace, not
    # accrete — stale multi-MB blobs otherwise pile up in git history).
    (seed / "jit_stale-000-cache").write_bytes(b"old")

    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "seed_compile_cache.py"),
         "--cache", str(cache), "--seed", str(seed),
         "--max-mb", "1", "--exclude", "dead"],
        capture_output=True, text=True, check=True,
    )
    assert "2 excluded" in out.stdout
    assert sorted(os.listdir(seed)) == ["jit_good-abc-cache"]

    # --merge keeps pre-existing entries.
    (cache / "jit_more-123-cache").write_bytes(b"m" * 10)
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "seed_compile_cache.py"),
         "--cache", str(cache), "--seed", str(seed),
         "--max-mb", "1", "--exclude", "dead", "--merge"],
        capture_output=True, text=True, check=True,
    )
    assert sorted(os.listdir(seed)) == [
        "jit_good-abc-cache", "jit_more-123-cache"
    ]


def test_repo_seed_dir_sane():
    """The committed seed must hold only non-empty entry files (no
    accidentally-tracked empty or directory entries)."""
    repo_seed = os.path.join(ROOT, ".jax_cache_seed")
    if not os.path.isdir(repo_seed):
        pytest.skip("no committed compile-cache seed in this checkout")
    names = os.listdir(repo_seed)
    assert names, "seed dir tracked but empty"
    for n in names:
        p = os.path.join(repo_seed, n)
        assert os.path.isfile(p) and os.path.getsize(p) > 0, n
