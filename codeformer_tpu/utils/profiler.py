"""Tracing / profiling subsystem (SURVEY §5: from-scratch design — the
reference only has wall-clock iter timers, basicsr/train.py:168-187).

Two layers:
  * `stage(name)` — lightweight host-side stage timers with a summary
    report (per-stage count/total/mean), cheap enough to leave on.
  * `jax_trace(logdir)` — a jax.profiler trace context producing
    TensorBoard-viewable device traces (op-level TPU timeline).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


class StageTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = ['stage                          count    total      mean']
        for name in sorted(self.totals, key=self.totals.get,
                           reverse=True):
            t, c = self.totals[name], self.counts[name]
            lines.append(f'{name:<30} {c:>5d} {t:>8.3f}s '
                         f'{t / c * 1e3:>8.1f}ms')
        return '\n'.join(lines)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


# process-wide default timer
TIMER = StageTimer()
stage = TIMER.stage


@contextlib.contextmanager
def jax_trace(logdir: str = '/tmp/jax_trace') -> Iterator[None]:
    """Device-level trace (open with TensorBoard's profile plugin)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region that shows up inside jax profiler traces."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield
