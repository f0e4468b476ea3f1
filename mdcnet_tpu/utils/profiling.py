"""Tracing / profiling helpers (SURVEY §5.1 — the reference has none).

- ``trace`` context: jax.profiler trace with named annotations, dumping a
  TensorBoard-readable profile directory.
- ``StepTimer``: wall-clock step timing with a device fence.  NB over the
  axon tunnel ``block_until_ready`` does not synchronize; the fence is a
  tiny device->host readback.
- ``annotate``: TraceAnnotation wrapper for labeling train/decode phases.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import numpy as np


def fence(x) -> None:
    """Reliable device fence: force a (tiny) host readback."""
    leaves = jax.tree_util.tree_leaves(x)
    if leaves:
        np.asarray(jax.tree_util.tree_map(
            lambda a: a.ravel()[0] if hasattr(a, "ravel") else a, leaves[0]))


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace around a block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Running step-time statistics with proper fencing."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times: List[float] = []
        self._seen = 0
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        if result is not None:
            fence(result)
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self.warmup:
            self.times.append(dt)
        return dt

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {"mean_s": float(arr.mean()),
                "p50_s": float(np.percentile(arr, 50)),
                "p90_s": float(np.percentile(arr, 90)),
                "steps": len(arr)}
