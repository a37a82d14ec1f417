"""Checked mode for the unsafe surface.

The reference gates bounds-check-free methods behind an ``Unsafe`` trait
and documents each function's safety obligations
(/root/reference/src/Kmers.jl:103-110, construction_utils.jl:13-16).  In
Python nothing segfaults, but the same violations produce *silently wrong
results*: a negative ``from_index`` wraps, a too-short packed stream
clamps slices, a register colliding with the count sentinel drops counts.

Checked mode turns those into loud errors:

- ``unsafe_extract`` / ``unsafe_shift_from`` validate source bounds;
- ``window_u64`` validates the packed stream covers L (+ carry words);
- the counting pipelines verify count conservation (every valid window
  counted exactly once — the kernel-level assert path).

Enable with the environment variable ``KMERS_TPU_CHECKED=1``, or
programmatically via :func:`set_checked` / the :func:`checked` context
manager.  The checks run on the host (eager shapes) or as one extra
device reduction per chunk — zero cost when disabled.
"""

from __future__ import annotations

import contextlib
import os

__all__ = ["checked_mode", "set_checked", "checked"]

_checked: bool = os.environ.get("KMERS_TPU_CHECKED", "").lower() in (
    "1",
    "true",
    "yes",
    "on",
)


def checked_mode() -> bool:
    """True when debug validation of unsafe preconditions is enabled."""
    return _checked


def set_checked(on: bool) -> None:
    """Enable/disable checked mode process-wide."""
    global _checked
    _checked = bool(on)


@contextlib.contextmanager
def checked(on: bool = True):
    """Temporarily enable (or disable) checked mode."""
    global _checked
    prev = _checked
    _checked = bool(on)
    try:
        yield
    finally:
        _checked = prev
