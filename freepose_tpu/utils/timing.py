"""Per-stage timing and profiling.

The reference has no profiling at all and hard-codes placeholder times into
its result CSVs (SURVEY.md §5.1; src/pipeline/utils.py:67). Here every
pipeline stage runs under a StageTimer whose measurements flow into the BOP
CSV `time` column as REAL numbers, and `trace()` wraps jax.profiler for
TensorBoard-compatible device traces.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StageTimer:
    """Accumulates wall-clock per named stage; device-synchronizing."""

    def __init__(self, sync: bool = True):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        self.sync = sync

    @contextlib.contextmanager
    def stage(self, name: str):
        if self.sync:
            jax.effects_barrier()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                jax.effects_barrier()
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def mean(self, name: str) -> float:
        return self.totals[name] / max(self.counts[name], 1)

    def total(self) -> float:
        return sum(self.totals.values())

    def report(self) -> str:
        lines = [
            f"{name:<28s} {self.totals[name]:8.3f}s total  {self.mean(name) * 1000:8.2f} ms/call  x{self.counts[name]}"
            for name in sorted(self.totals, key=lambda n: -self.totals[n])
        ]
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace scope (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
