"""Profiling helpers (SURVEY.md §5.1).

``trace_context`` wraps a region in a ``jax.profiler`` TraceAnnotation (and
optionally a full device trace to a directory, viewable in Perfetto /
TensorBoard). ``StepTimer`` measures steady-state step wall time with an
explicit device sync, giving the images/sec/chip headline metric.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace_context(name: str, trace_dir: Optional[str] = None):
    """Annotate (and optionally capture) a profiler trace for a region."""
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    finally:
        if trace_dir:
            jax.profiler.stop_trace()


class StepTimer:
    """Throughput meter: call ``tick(batch_size)`` once per completed step.

    The first ``skip`` ticks (compile + warmup) are excluded. Rates are per
    process; divide by local device count for per-chip numbers.
    """

    def __init__(self, skip: int = 2):
        self.skip = skip
        self._n = 0
        self._images = 0
        self._t0 = None

    def tick(self, batch_size: int):
        self._n += 1
        if self._n == self.skip:
            self._t0 = time.perf_counter()
            self._images = 0
        elif self._n > self.skip:
            self._images += batch_size

    @property
    def images_per_sec(self) -> float:
        if self._t0 is None or self._images == 0:
            return 0.0
        return self._images / (time.perf_counter() - self._t0)
