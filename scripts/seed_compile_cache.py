#!/usr/bin/env python
"""Snapshot the live XLA compile cache into the git-tracked seed.

Usage (after a bench.py run has populated ``.jax_cache/`` with the
programs you want a fresh checkout to start warm with)::

    python scripts/seed_compile_cache.py [--max-mb 25] [--exclude HASHPREFIX ...]

Rationale: first compiles of the big train-step programs cost 150-300 s on
this TPU toolchain, and a fresh checkout (driver bench run, next-round
session) starts with an empty cache — which has previously cost a round's
bench artifact its diagnostics (docs/BENCH_NOTES.md r20 / BENCH_r03).
XLA persistent-cache entries are keyed on (program, jaxlib version,
backend, compile flags) and are internally compressed; on any environment
mismatch a seeded entry is simply never hit, so the seed can only help.
``delora_tpu.utils.cache.enable_persistent_cache`` hydrates the live cache
from the seed at every entry point.

Entries whose cache key is process-unstable (the single-dispatch
fullcached program — see BENCH_NOTES r20) are pointless to seed; exclude
them by hash prefix.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", default=os.path.join(ROOT, ".jax_cache"))
    ap.add_argument("--seed", default=os.path.join(ROOT, ".jax_cache_seed"))
    ap.add_argument(
        "--max-mb", type=float, default=None,
        help="skip entries larger than this (after exclusions)",
    )
    ap.add_argument(
        "--exclude", nargs="*", default=[],
        help="skip entries whose filename contains any of these substrings",
    )
    ap.add_argument(
        "--merge", action="store_true",
        help="keep pre-existing seed entries (default is an exact snapshot: "
             "entries absent from the live cache are pruned, so refreshes "
             "replace stale blobs in git history instead of accreting them)",
    )
    ap.add_argument(
        "--fresh", action="store_true",
        help="(default behavior; kept for compatibility) exact snapshot",
    )
    args = ap.parse_args()

    if not os.path.isdir(args.cache):
        print(f"no cache at {args.cache}", file=sys.stderr)
        return 1
    if not args.merge and os.path.isdir(args.seed):
        shutil.rmtree(args.seed)
    os.makedirs(args.seed, exist_ok=True)

    copied = skipped = total = 0
    for name in sorted(os.listdir(args.cache)):
        src = os.path.join(args.cache, name)
        if not os.path.isfile(src):
            continue
        size = os.path.getsize(src)
        if any(sub in name for sub in args.exclude):
            skipped += 1
            continue
        if args.max_mb is not None and size > args.max_mb * 1e6:
            skipped += 1
            continue
        dst = os.path.join(args.seed, name)
        if not (os.path.exists(dst) and os.path.getsize(dst) == size):
            shutil.copy2(src, dst)
            copied += 1
        total += size
    print(
        f"seed: {copied} copied, {skipped} excluded, "
        f"{total / 1e6:.1f} MB total in {args.seed}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
