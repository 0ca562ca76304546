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


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a trace for the enclosed steps into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in the trace (host-side annotation)."""
    return jax.profiler.TraceAnnotation(name)
