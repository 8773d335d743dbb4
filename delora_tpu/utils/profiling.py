"""Profiler integration (jax.profiler) — SURVEY.md §5 "tracing/profiling".

The reference's only performance instrumentation is wall-clock prints
(odometry_publisher.py:143-151, time_network.py:66-93). Here:

  * ``trace(log_dir)`` — context manager around any region; emits a
    TensorBoard-viewable XLA trace (`tensorboard --logdir <dir>`,
    needs tensorboard-plugin-profile),
  * ``annotate(name)`` — named sub-regions inside a trace,
  * trainer integration: set config ``profile_epochs: [2]`` to trace those
    epochs into ``<log_dir>/<run>/profile``.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)
