"""Tracing / profiling utilities.

The reference's only profiling hook is a commented-out Lightning flag
(``train.py:29``, SURVEY.md §5); here profiling is a first-class subsystem:

* ``trace(logdir)`` — context manager around ``jax.profiler`` producing a
  Perfetto/TensorBoard trace of the enclosed steps;
* ``StepTimer`` — wall-clock per-step timing with warmup skip and percentile
  summary (uses value-fetch sync: ``block_until_ready`` can return early
  through remote-TPU tunnels, see .claude/skills/verify);
* ``annotate(name)`` — named trace span for host-side phases.
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Profile the enclosed block: `with trace('/tmp/trace'): run_steps()`.
    View with TensorBoard's profile plugin or ui.perfetto.dev."""
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in the device trace (host-side annotation)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: List[float] = []
        self._t0: Optional[float] = None
        self._count = 0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_value=None):
        """sync_value: a device scalar to fetch (forces real completion).
        A stop() without a prior start() is a no-op returning 0.0."""
        if self._t0 is None:
            return 0.0
        if sync_value is not None:
            float(sync_value)
        dt = time.perf_counter() - self._t0
        self._t0 = None
        self._count += 1
        if self._count > self.warmup:
            self._times.append(dt)
        return dt

    def summary(self) -> dict:
        if not self._times:
            return {}
        a = np.asarray(self._times)
        return {
            "steps": len(a),
            "mean_ms": float(a.mean() * 1e3),
            "p50_ms": float(np.percentile(a, 50) * 1e3),
            "p90_ms": float(np.percentile(a, 90) * 1e3),
            "max_ms": float(a.max() * 1e3),
        }
