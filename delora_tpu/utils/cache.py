"""Persistent XLA compilation cache.

First compiles of the big train-step programs cost 30-300 s through this
TPU toolchain; the on-disk executable cache turns every subsequent process's
compile into a sub-second load (measured 23.3 s -> 0.7 s for the projection
program). Every entry point (CLI, bench, graft entry, serving) calls
:func:`enable_persistent_cache` before building programs.
"""

from __future__ import annotations

import os


def enable_persistent_cache(directory: str | None = None) -> str:
    """Idempotently enable the JAX persistent compilation cache."""
    import jax

    if directory is None:
        directory = os.environ.get(
            "DELORA_JAX_CACHE",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))),
                ".jax_cache",
            ),
        )
    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return directory
