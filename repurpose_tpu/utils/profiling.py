"""Profiling & step timing — first-class here, absent in the reference
(SURVEY.md §5.1: no torch.profiler/NVTX anywhere; only wall-clock prints).

- ``trace(logdir)``: context manager around ``jax.profiler`` —  view with
  TensorBoard or xprof/Perfetto.
- ``StepTimer``: cheap rolling wall-clock stats with explicit device sync so
  step boundaries are honest under async dispatch.
- ``annotate``: named TraceAnnotation for custom spans.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling step-time stats; ``tick`` returns seconds since the last tick."""

    def __init__(self, window: int = 50):
        self._times: deque[float] = deque(maxlen=window)
        self._last: float | None = None

    def tick(self, sync_on=None) -> float:
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        now = time.perf_counter()
        dt = 0.0 if self._last is None else now - self._last
        if self._last is not None:
            self._times.append(dt)
        self._last = now
        return dt

    @property
    def mean(self) -> float:
        return sum(self._times) / len(self._times) if self._times else 0.0

    @property
    def p50(self) -> float:
        if not self._times:
            return 0.0
        s = sorted(self._times)
        return s[len(s) // 2]

    def summary(self) -> dict:
        return {"step_time_mean_s": self.mean, "step_time_p50_s": self.p50}
