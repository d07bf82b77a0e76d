"""Profiling / tracing utilities (SURVEY.md §5: the reference has none; this
is the TPU-native tracing subsystem).

- `trace(out_dir)`: context manager around jax.profiler.trace — produces a
  TensorBoard-compatible trace of device execution.
- `StepTimer`: robust wall-clock step timing that forces a scalar to host
  every sample (block_until_ready is unreliable on tunneled backends) and
  subtracts the measured host round-trip overhead.
- `annotate(name)`: TraceAnnotation wrapper for labeling host spans.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(out_dir: str):
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def measure_roundtrip(n: int = 20) -> float:
    """Host<->device round-trip latency in seconds."""
    tiny = jax.jit(lambda k: jnp.sum(jax.random.normal(k, (8,))))
    float(tiny(jax.random.PRNGKey(0)))
    t0 = time.perf_counter()
    for i in range(n):
        float(tiny(jax.random.PRNGKey(i)))
    return (time.perf_counter() - t0) / n


class StepTimer:
    """Times a step function that returns something reducible to a scalar."""

    def __init__(self, subtract_roundtrip: bool = True):
        self.roundtrip = measure_roundtrip() if subtract_roundtrip else 0.0
        self.samples = []

    def time(self, fn: Callable[[], jnp.ndarray], n: int = 10,
             warmup: int = 1) -> float:
        """Mean seconds per call of fn (which must return a jnp scalar)."""
        for _ in range(warmup):
            float(fn())
        t0 = time.perf_counter()
        for _ in range(n):
            float(fn())
        per_call = (time.perf_counter() - t0) / n - self.roundtrip
        per_call = max(per_call, 0.0)
        self.samples.append(per_call)
        return per_call

    def summary(self):
        return {"mean_s": float(np.mean(self.samples)),
                "min_s": float(np.min(self.samples)),
                "roundtrip_s": self.roundtrip}
