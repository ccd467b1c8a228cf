"""Lightweight phase timing.

The reference instruments with bare time.time() prints
(exp_bunny/test.py:154,182).  PhaseTimer gives the same signal with
aggregation, plus jax.profiler hooks for TPU traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


class PhaseTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block: bool = False):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block:
                # ensure async dispatch has drained before reading the clock
                (jax.device_put(0.0) + 0).block_until_ready()
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> str:
        rows = [
            f"{k}: {self.totals[k]:.3f}s / {self.counts[k]}x"
            for k in sorted(self.totals)
        ]
        return "; ".join(rows)


@contextlib.contextmanager
def trace(dirname: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(dirname)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
