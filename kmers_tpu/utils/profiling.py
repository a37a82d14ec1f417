"""Profiling hooks (SURVEY.md §5 tracing/profiling obligation).

Thin wrappers over ``jax.profiler`` so pipelines can be traced without
importing profiler plumbing at call sites::

    with trace("/tmp/kmer-trace"):
        canonical_count(data, K=31)

View with TensorBoard or xprof.  ``annotate`` scopes label regions in
the trace timeline.
"""

from __future__ import annotations

import contextlib

import jax

__all__ = ["trace", "annotate"]


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """TraceAnnotation context manager for labeling pipeline stages."""
    return jax.profiler.TraceAnnotation(name)
