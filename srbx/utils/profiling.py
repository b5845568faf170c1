"""Timing / tracing helpers.

Replaces the reference's ad-hoc tic/toc prints (`optimization/iSWIFT/include/
timer.h`, `driver_scripts/qp_only_exp.cpp:157-187`, SNOPT chrono timing at
`src/MPC_dist.cpp:410-419`) with (a) wall-clock stage timers that block on
device results, and (b) one-line helpers around jax.profiler for real traces.
"""

from __future__ import annotations

import contextlib
import json
import time

import jax


class StageTimer:
    """Accumulates per-stage wall times; blocks on pytrees for honesty."""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def time_fn(self, name, fn, *args, **kw):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1
        return out

    def summary(self):
        return {
            name: {
                "total_s": round(self.totals[name], 6),
                "count": self.counts[name],
                "mean_ms": round(1e3 * self.totals[name] / self.counts[name], 3),
            }
            for name in sorted(self.totals)
        }

    def dump(self):
        return json.dumps(self.summary())


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
