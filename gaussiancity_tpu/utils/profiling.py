# -*- coding: utf-8 -*-
"""Profiling/tracing hooks (SURVEY.md §5: the reference has none beyond
wall-clock meters; the TPU build provides jax.profiler integration)."""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    log_dir = log_dir or os.environ.get("GCT_TRACE_DIR", "/tmp/gct_trace")
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def step_annotation(name: str, step: int) -> Iterator[None]:
    import jax

    with jax.profiler.StepTraceAnnotation(name, step_num=step):
        yield


class Timer:
    """Lightweight wall-clock section timer with named accumulators."""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self):
        return {
            k: {"total_s": v, "count": self.counts[k],
                "mean_ms": v / self.counts[k] * 1e3}
            for k, v in self.totals.items()
        }
