"""Profiling and debugging hooks.

TPU-native replacement for the reference's apex pyprof NVTX tracing
(reference: apex/apex/pyprof/): ``jax.profiler`` traces viewable in
TensorBoard/XProf, plus ``jax.named_scope`` annotations emitted by the
encoder. ``enable_nan_debugging`` mirrors a sanitizer run (checks every op
output for NaNs — slow, CI/debug only).
"""

from __future__ import annotations

import contextlib
import logging
import os

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(logdir: str, enabled: bool = True):
    """Capture a profiler trace around the enclosed steps."""
    if not enabled or jax.process_index() != 0:
        yield
        return
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", logdir)


def enable_nan_debugging():
    jax.config.update("jax_debug_nans", True)


class StepTimer:
    """Lightweight wall-clock step timing with a sync point per window."""

    def __init__(self, window: int = 50):
        import time

        self.window = window
        self._time = time.perf_counter
        self._t0 = None
        self._count = 0

    def tick(self, sync_value=None) -> float | None:
        """Returns steps/sec once per window (forces sync via the value)."""
        self._count += 1
        if self._count % self.window:
            return None
        if sync_value is not None:
            float(sync_value)
        now = self._time()
        rate = None
        if self._t0 is not None:
            rate = self.window / (now - self._t0)
        self._t0 = now
        return rate
