"""Profiling helpers — the subsystem the reference lacks entirely
(SURVEY.md §5: tqdm bars and one vestigial time.time()).

* ``trace(logdir)`` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable device trace (XLA op timeline, HBM usage).
* ``StepTimer`` — cheap steady-state throughput meter that skips warmup
  steps (compile) and reports examples/sec percentiles.
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, skip_first: int = 2):
        self.skip_first = skip_first
        self._steps: List[float] = []
        self._last: Optional[float] = None
        self._seen = 0

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self._seen += 1
            if self._seen > self.skip_first:
                self._steps.append(now - self._last)
        self._last = now

    def summary(self, batch_size: int = 1) -> dict:
        if not self._steps:
            return {}
        arr = np.asarray(self._steps)
        # examples_per_sec from the p50 step, not the mean: a mid-run
        # compile (a new seq bucket's first batch, a resumed shape) is a
        # multi-second outlier that would skew the mean for the whole run
        return {
            "steps": len(arr),
            "mean_ms": float(arr.mean() * 1e3),
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p95_ms": float(np.percentile(arr, 95) * 1e3),
            "examples_per_sec": float(batch_size
                                      / np.percentile(arr, 50)),
        }
