"""Profiling hooks (SURVEY.md §5 "Tracing / profiling").

Thin wrappers over ``jax.profiler``: a trace server for live XProf
connections, on-demand trace capture around training windows, and named
annotations to separate input-feed time from step time in the trace.
"""

from __future__ import annotations

import contextlib

import jax


def start_server(port: int = 9999):
    """Start the profiler server (connect TensorBoard/XProf to this port)."""
    return jax.profiler.start_server(port)


def start_trace(log_dir: str) -> None:
    """Begin capturing a trace into ``log_dir`` (see :func:`stop_trace`).

    Used by ``train.py --profile N`` to bracket N steady-state steps."""
    jax.profiler.start_trace(log_dir)


def stop_trace() -> None:
    jax.profiler.stop_trace()


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a trace for the enclosed steps into ``log_dir``."""
    start_trace(log_dir)
    try:
        yield
    finally:
        stop_trace()


def annotate(name: str):
    """Named region visible in the trace (host-side annotation)."""
    return jax.profiler.TraceAnnotation(name)
