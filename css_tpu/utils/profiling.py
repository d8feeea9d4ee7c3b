"""Profiling & step timing (the reference has none — SURVEY.md section 5).

``maybe_profile`` wraps a region in a jax.profiler trace when a directory is
given (view with TensorBoard/XProf); ``StepTimer`` is a lightweight
steps/sec meter for the train loop.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax

__all__ = ["maybe_profile", "StepTimer"]


@contextlib.contextmanager
def maybe_profile(trace_dir: Optional[str], enabled: bool = True):
    if trace_dir and enabled:
        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield


class StepTimer:
    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.count = 0
        self.total = 0.0
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self.count += 1
            if self.count > self.warmup:
                self.total += now - self._last
        self._last = now

    @property
    def steps_per_sec(self) -> float:
        n = self.count - self.warmup
        return n / self.total if n > 0 and self.total > 0 else 0.0

    def summary(self) -> str:
        sps = self.steps_per_sec
        return f"steps/s {sps:.3f}" if sps else "steps/s n/a"
