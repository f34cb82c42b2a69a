"""First-class tracing / profiling.

The reference has no profiling at all (SURVEY.md §5 — tqdm bars only).
Here profiling is built in: ``StepTimer`` records per-step wall times and
derived throughput, and ``trace`` wraps ``jax.profiler`` to capture a
TensorBoard-viewable device trace of any step window.
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path
from typing import Optional

import jax

__all__ = ["StepTimer", "trace"]


class StepTimer:
    """Rolling step-time statistics (call ``tick`` once per step)."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times = []
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self._times.append(dt)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now
        return dt

    @property
    def mean_step_time(self) -> Optional[float]:
        if not self._times:
            return None
        return sum(self._times) / len(self._times)

    def throughput(self, batch_size: int) -> Optional[float]:
        mst = self.mean_step_time
        return batch_size / mst if mst else None

    def summary(self, batch_size: int) -> dict:
        return {
            "mean_step_time_s": self.mean_step_time,
            "samples_per_sec": self.throughput(batch_size),
            "steps_measured": len(self._times),
        }


@contextlib.contextmanager
def trace(log_dir, *, first_step_done=True):
    """Capture a jax.profiler device trace around a step window.

    Usage:
        with trace(log_dir):
            for _ in range(5):
                trainer.step(batch, rng)
    View with TensorBoard's profile plugin or xprof.
    """
    log_dir = Path(log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        (log_dir / "TRACE_INFO.json").write_text(
            json.dumps({"captured_at": time.time()})
        )
