"""Profiling / tracing hooks (jax.profiler + stage timers).

The reference has only coarse wall-clock logs (SURVEY.md §5); here we add
first-class tracing: ``stage_timer`` context managers accumulate per-stage
wall time (slicing, IO, device step, stitch, write) and
``profile_trace(logdir)`` captures a jax.profiler trace viewable in
TensorBoard or Perfetto.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict

logger = logging.getLogger(__name__)


class StageTimers:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = [f"{'stage':<24} {'total_s':>10} {'calls':>8} {'mean_ms':>10}"]
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(
                f"{name:<24} {total:>10.3f} {n:>8} {1000 * total / n:>10.2f}"
            )
        report = "\n".join(lines)
        logger.info("\n%s", report)
        return report


@contextlib.contextmanager
def profile_trace(logdir: str | None):
    """Capture a jax.profiler trace when logdir is set; no-op otherwise."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("jax profiler trace written to %s", logdir)
