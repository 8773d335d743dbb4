"""Persistent XLA compilation cache.

First compiles of the big train-step programs cost 30-300 s through this
TPU toolchain; the on-disk executable cache turns every subsequent process's
compile into a sub-second load (measured 23.3 s -> 0.7 s for the projection
program). Every entry point (CLI, bench, graft entry, serving) calls
:func:`enable_persistent_cache` before building programs.
"""

from __future__ import annotations

import os

# Repo root (the directory holding delora_tpu/): both the default live cache
# and the git-tracked seed anchor here, so hydration works no matter where
# DELORA_JAX_CACHE or an explicit ``directory`` points.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def enable_persistent_cache(directory: str | None = None,
                            hydrate: bool = True) -> str:
    """Idempotently enable the JAX persistent compilation cache.

    ``hydrate=False`` skips seeding from the git-tracked TPU-program seed —
    for CPU-only harnesses (multiprocess smoke) where the seed entries could
    never hit and copying them is pure IO waste.
    """
    import jax

    if directory is None:
        directory = os.environ.get(
            "DELORA_JAX_CACHE",
            os.path.join(_REPO_ROOT, ".jax_cache"),
        )
    directory = os.path.normpath(directory)
    os.makedirs(directory, exist_ok=True)
    if hydrate:
        _hydrate_from_seed(directory)
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return directory


def _hydrate_from_seed(directory: str, seed: str | None = None) -> int:
    """Copy missing entries from the git-tracked seed into the live cache.

    A fresh checkout starts with an empty ``.jax_cache/`` — on this TPU
    toolchain that means 150-300 s of cold compiles before the first useful
    step, which has previously cost the round's bench artifact its
    diagnostics (docs/BENCH_NOTES.md r20). ``.jax_cache_seed/`` holds the
    stable-keyed programs of the bench/train hot path (refresh with
    ``scripts/seed_compile_cache.py``). Entries are keyed by XLA on
    (program, jaxlib, backend, flags) — on any mismatch the key simply never
    hits and XLA recompiles, so a stale seed is dead weight, never wrong.

    The seed lives at the REPO ROOT (not as a sibling of ``directory``):
    custom DELORA_JAX_CACHE locations still hydrate. Entries are COPIED,
    never hardlinked — sharing inodes with the git-tracked seed would let a
    cache rewrite corrupt the committed blobs.
    """
    if seed is None:
        seed = os.path.join(_REPO_ROOT, ".jax_cache_seed")
    if not os.path.isdir(seed):
        return 0
    import shutil

    n = 0
    for name in os.listdir(seed):
        dst = os.path.join(directory, name)
        if os.path.exists(dst):
            continue
        shutil.copy2(os.path.join(seed, name), dst)
        n += 1
    return n
