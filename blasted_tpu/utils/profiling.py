"""Profiling helpers — the TPU equivalent of the reference's tracing posture.

The reference has no tracer; it relies on per-instance timers plus optional
gprof builds (SURVEY.md §5: blasted_petsc.h:56-84, CMakeLists.txt:239-251).
Here the platform tracer is ``jax.profiler``; these helpers wrap it so solve
drivers can emit traces viewable in TensorBoard/XProf, alongside the
wall-clock timers in utils/timing.py.
"""

from __future__ import annotations

import contextlib

__all__ = ["trace", "annotate"]


@contextlib.contextmanager
def trace(logdir: str | None):
    """Capture a jax.profiler trace around a code region (no-op when logdir
    is None)."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace span for a code region (shows up in the profiler UI)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
