"""Profiling / tracing helpers (SURVEY.md §5 observability subsystem).

The reference's only instrumentation is wall-clock deltas in log lines
(train.py:109,162-170).  Here: a context manager around `jax.profiler`
producing TensorBoard-loadable traces, plus a step timer that reports
the steady-state step time and derived clouds/sec.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace when log_dir is set; no-op otherwise.

    View with: tensorboard --logdir <log_dir> (Profile tab), or the
    xprof/perfetto converters.
    """
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step statistics with warmup discard.

    NOTE for tunneled TPU platforms: only trust timings where the step
    result is consumed on host (the train loop reads metrics at log
    points, making those intervals honest).
    """

    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self._times: List[float] = []
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
        self._last = now

    @property
    def steady_times(self) -> List[float]:
        return self._times[self.warmup:]

    @staticmethod
    def percentile(sorted_ts: List[float], q: float) -> float:
        """Nearest-rank percentile (q in [0, 100]) of a pre-sorted list."""
        if not sorted_ts:
            return float("nan")
        idx = min(len(sorted_ts) - 1,
                  max(0, int(round(q / 100.0 * (len(sorted_ts) - 1)))))
        return sorted_ts[idx]

    def summary(self, items_per_step: int = 1) -> dict:
        ts = self.steady_times or self._times
        if not ts:
            return {}
        ts_sorted = sorted(ts)
        return {
            "steps": len(ts),
            "mean_s": sum(ts) / len(ts),
            "p50_s": self.percentile(ts_sorted, 50),
            "p90_s": self.percentile(ts_sorted, 90),
            "p99_s": self.percentile(ts_sorted, 99),
            "items_per_sec": items_per_step * len(ts) / sum(ts),
        }
