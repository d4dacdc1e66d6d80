"""Profiling helpers: jax.profiler traces around train/sample steps.

The reference has no tracing infrastructure (SURVEY.md §5: tutorials use
time.time()); here steps can be annotated for the TPU profiler and traces
captured for TensorBoard.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a profiler trace (viewable in TensorBoard / XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up on the TPU trace timeline."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Host-side steps/sec meter with warmup exclusion."""

    def __init__(self, warmup: int = 2) -> None:
        self.warmup = warmup
        self._count = 0
        self._start = None

    def tick(self) -> None:
        self._count += 1
        if self._count == self.warmup:
            self._start = time.time()

    @property
    def steps_per_sec(self) -> float | None:
        measured = self._count - self.warmup
        if self._start is None or measured <= 0:
            return None
        return measured / (time.time() - self._start)
