"""Tracing/profiling utilities (SURVEY.md section 5: the reference has none;
this is the TPU-native observability layer built new).

- ``trace(logdir)``: context manager around ``jax.profiler`` producing a
  TensorBoard-compatible trace of device execution.
- ``StepTimer``: lightweight wall-clock stats for the train loop with
  percentile summaries (the reference only had an unused
  ``timeit.default_timer()`` per iteration, `InfoInv/main.py:263`).
- ``annotate(name)``: named trace region (shows up in the profiler UI).
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Accumulates per-step wall times; reports mean/p50/p95 and throughput."""

    def __init__(self, unit_per_step: float = 1.0, unit_name: str = "items"):
        self.times: list[float] = []
        self.unit_per_step = unit_per_step
        self.unit_name = unit_name
        self._t0: float | None = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        self._t0 = None

    def summary(self, last_n: int | None = None) -> dict:
        ts = np.asarray(self.times[-last_n:] if last_n else self.times)
        if ts.size == 0:
            return {}
        return {
            "steps": int(ts.size),
            "mean_ms": float(ts.mean() * 1e3),
            "p50_ms": float(np.percentile(ts, 50) * 1e3),
            "p95_ms": float(np.percentile(ts, 95) * 1e3),
            f"{self.unit_name}_per_sec": float(self.unit_per_step / ts.mean()),
        }

    def __str__(self) -> str:
        s = self.summary()
        if not s:
            return "StepTimer(empty)"
        return (
            f"steps={s['steps']} mean={s['mean_ms']:.2f}ms "
            f"p50={s['p50_ms']:.2f}ms p95={s['p95_ms']:.2f}ms "
            f"{self.unit_name}/s={s[f'{self.unit_name}_per_sec']:,.0f}"
        )
