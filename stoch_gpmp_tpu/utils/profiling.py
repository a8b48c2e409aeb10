"""On-device profiling hooks (SURVEY.md §5: the reference only has wall-clock
prints; here we pair host-side timers with ``jax.profiler`` traces)."""

from __future__ import annotations

from contextlib import contextmanager


@contextmanager
def trace(log_dir: str):
    """Capture a TPU/XLA profile viewable in TensorBoard/XProf:

    >>> with trace("/tmp/profile"):
    ...     planner.optimize(opt_iters=100)
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextmanager
def annotate(name: str):
    """Named region inside a trace (shows up on the XProf timeline)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
