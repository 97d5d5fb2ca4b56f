"""Profiling helpers (SURVEY §5.1: the reference has wall-clock meters only).

``trace(logdir)``: context manager around ``jax.profiler`` producing
TensorBoard-viewable device traces (wall-clock step/data meters live in
train/loop.py's AverageMeters, matching video_action_recognition.py:78-98).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator


@contextlib.contextmanager
def trace(logdir: str, enabled: bool = True) -> Iterator[None]:
    """Capture a jax.profiler trace (no-op when disabled or unsupported)."""
    if not enabled:
        yield
        return
    import jax

    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception as exc:  # degrade to a no-op, but SAY so — a silent
        # miss leaves an empty profile dir with zero diagnostics
        print(f"warning: jax.profiler.start_trace({logdir!r}) failed "
              f"({type(exc).__name__}: {exc}); tracing disabled")
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception as exc:
                print(f"warning: jax.profiler.stop_trace failed "
                      f"({type(exc).__name__}: {exc}); trace may be "
                      "incomplete")
