"""Profiling and tracing (new surface; the reference has none — SURVEY.md section 5).

Thin wrappers over `jax.profiler` plus a per-step statistics aggregator, so trainers
can emit XLA traces viewable in TensorBoard/Perfetto and per-phase wall-clock budgets
without littering call sites.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA profiler trace for the enclosed block (open with TensorBoard or
    ui.perfetto.dev)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up inside device traces."""
    return jax.profiler.TraceAnnotation(name)


class PhaseTimer:
    """Accumulate wall-clock per named phase (data, step, eval, ckpt, ...)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_ms": 1e3 * self.totals[name] / max(self.counts[name], 1),
            }
            for name in self.totals
        }
