"""Structured per-stage timing + device profiling.

Replaces the reference's ad-hoc `std::chrono` + stdout timing pairs
(`visual-inertial-slam.cpp:21-64`, `feature-tracker.cpp:73-108`) with a
timer registry and optional `jax.profiler` traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StageTimers:
    """Accumulates wall-clock per named stage; blocking on device results so
    the numbers mean what they say."""

    def __init__(self):
        self.total = defaultdict(float)
        self.count = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - t0
        self.total[name] += dt
        self.count[name] += 1

    def add(self, name: str, seconds: float):
        self.total[name] += seconds
        self.count[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.total):
            n = max(self.count[name], 1)
            lines.append(
                f"{name:30s} {self.total[name] / n * 1e3:9.3f} ms/call "
                f"x{self.count[name]}"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
