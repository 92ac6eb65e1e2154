"""Tracing / profiling: per-step host timing + optional device traces.

The reference has no profiling at all (SURVEY.md §5 — only carriage-return
progress prints).  Here:

* ``StepTimer`` — cheap rolling wall-clock stats around the jitted train
  step, feeding steps/sec and utterances/sec scalars to the metric logger;
* ``device_trace`` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace for a window of steps (XLA op-level timeline on
  TPU), gated so it costs nothing when unused.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Deque, Optional


class StepTimer:
    """Rolling wall-clock timing across training steps."""

    def __init__(self, window: int = 50):
        self.window = window
        self._durations: Deque[float] = deque(maxlen=window)
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        """Call once per step; returns the last step's duration (or None)."""
        now = time.perf_counter()
        dur = None
        if self._last is not None:
            dur = now - self._last
            self._durations.append(dur)
        self._last = now
        return dur

    def reset(self) -> None:
        self._last = None
        self._durations.clear()

    @property
    def steps_per_sec(self) -> float:
        if not self._durations:
            return 0.0
        return len(self._durations) / sum(self._durations)

    def utt_per_sec(self, batch_size: int) -> float:
        return self.steps_per_sec * batch_size


@contextlib.contextmanager
def device_trace(logdir: str, enabled: bool = True):
    """Capture a jax.profiler trace (TensorBoard 'profile' plugin format)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region that shows up on the device timeline."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
