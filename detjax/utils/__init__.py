"""Observability utilities (SURVEY.md §5.1/§5.5).

The reference's observability is print/tqdm of running losses; here we keep
structured per-step metrics (JSONL), wall-clock step timing for
images/sec/chip, and optional jax.profiler traces.
"""

from detjax.utils.logging import MetricsLogger
from detjax.utils.profiling import StepTimer, trace_context

__all__ = ["MetricsLogger", "StepTimer", "trace_context"]
