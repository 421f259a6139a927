"""Structured tracing/profiling.

The reference has only ad-hoc chrono spans (SURVEY.md section 5). Here:
named trace annotations around every pipeline stage (visible in TensorBoard
/ Perfetto via jax.profiler), a device-trace context manager, and a
lightweight host-side span timer with an aggregated report.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


def annotate(name: str):
    """Named region that shows up in device traces (use around dispatches)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (open with TensorBoard or Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class SpanTimer:
    """Host-side span aggregation: cheap, always-on, printable."""

    def __init__(self):
        self.total: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            with jax.profiler.TraceAnnotation(name):
                yield
        finally:
            dt = time.perf_counter() - t0
            self.total[name] += dt
            self.count[name] += 1

    def report(self) -> str:
        lines = ["span                              calls   total_ms    avg_ms"]
        for name in sorted(self.total, key=lambda n: -self.total[n]):
            t = self.total[name] * 1e3
            c = self.count[name]
            lines.append(f"{name:32s} {c:7d} {t:10.1f} {t / c:9.2f}")
        return "\n".join(lines)

    def reset(self):
        self.total.clear()
        self.count.clear()
