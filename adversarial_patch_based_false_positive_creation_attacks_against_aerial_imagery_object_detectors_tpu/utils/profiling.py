"""Tracing / profiling helpers.

The reference's observability is ad-hoc ``time.time()`` deltas and
disabled stage timers (SURVEY §5). Here:

- ``StepTimer``: low-overhead rolling step timer that only forces a
  device sync at report boundaries;
- ``trace``: context manager around ``jax.profiler`` writing a TensorBoard
  trace when enabled (no-op otherwise);
- ``annotate``: named trace region (``jax.profiler.TraceAnnotation``).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class StepTimer:
    """Rolling throughput meter. ``tick(sync_value)`` counts a step; every
    ``report_every`` steps it blocks on ``sync_value`` once and records the
    interval."""

    def __init__(self, report_every: int = 50):
        self.report_every = report_every
        self.count = 0
        self._t0: Optional[float] = None
        self.last_steps_per_sec = 0.0

    def tick(self, sync_value=None) -> Optional[float]:
        self.count += 1
        if self.count % self.report_every:
            return None
        if sync_value is not None:
            jax.block_until_ready(sync_value)
        now = time.perf_counter()
        if self._t0 is not None:
            self.last_steps_per_sec = self.report_every / (now - self._t0)
        self._t0 = now
        return self.last_steps_per_sec or None


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Capture a device trace into ``log_dir`` (TensorBoard format) when a
    directory is given; otherwise a no-op."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in profiler traces."""
    return jax.profiler.TraceAnnotation(name)
