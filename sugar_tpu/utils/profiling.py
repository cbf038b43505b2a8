"""Lightweight profiling/telemetry.

Replaces the reference's CUDA-event timing + tensorboard iter_time
(gaussian_splatting/train.py:44-67, 160) with jax.profiler traces and a
stage timer that plays nice with async dispatch.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict

import jax


class StageTimer:
    """Accumulates wall-clock per named stage; blocks on device results so
    timings are real (dispatch is async)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> dict:
        return {
            k: dict(total_s=self.totals[k], count=self.counts[k],
                    mean_ms=1e3 * self.totals[k] / max(self.counts[k], 1))
            for k in self.totals
        }

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
