"""Profiling helpers (SURVEY §5.1: the reference has wall-clock meters only).

``trace(logdir)``: context manager around ``jax.profiler`` producing
TensorBoard-viewable device traces. ``step_timer``: wall-clock per-step
timing with the reference's data/batch meter semantics
(video_action_recognition.py:78-98).
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
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


class StepTimer:
    """data/step wall-clock split around an iteration loop."""

    def __init__(self):
        self.data_s = 0.0
        self.step_s = 0.0
        self.count = 0
        self._mark = time.perf_counter()

    def data_ready(self):
        now = time.perf_counter()
        self.data_s += now - self._mark
        self._mark = now

    def step_done(self):
        now = time.perf_counter()
        self.step_s += now - self._mark
        self._mark = now
        self.count += 1

    @property
    def avg_data(self) -> float:
        return self.data_s / max(self.count, 1)

    @property
    def avg_step(self) -> float:
        return self.step_s / max(self.count, 1)
