"""Profiling and throughput observability.

The reference only logs wall-clock per trial/epoch (``main.py:218,258``,
``src/train/run.py:84,293-296``).  SURVEY.md §5 calls for ``jax.profiler``
trace hooks plus per-step ``edges/s`` counters — the north-star throughput
metric — which this module provides.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def profiler_trace(logdir: Optional[str]):
    """Capture a jax.profiler trace (TensorBoard format) when ``logdir``
    is set; no-op otherwise."""
    if logdir:
        jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        if logdir:
            jax.profiler.stop_trace()


class ThroughputMeter:
    """Per-step edges/s counter with exponential smoothing."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.edges_per_s: Optional[float] = None
        self.total_edges = 0
        self.total_time = 0.0
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, num_edges: int) -> float:
        dt = time.perf_counter() - self._t0
        rate = num_edges / max(dt, 1e-9)
        self.total_edges += num_edges
        self.total_time += dt
        if self.edges_per_s is None:
            self.edges_per_s = rate
        else:
            self.edges_per_s = (
                self.alpha * rate + (1 - self.alpha) * self.edges_per_s
            )
        return rate

    @property
    def mean_edges_per_s(self) -> float:
        return self.total_edges / max(self.total_time, 1e-9)
