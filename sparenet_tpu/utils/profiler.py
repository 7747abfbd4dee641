"""Tracing / profiling hooks.

The reference's observability is ad-hoc perf_counter deltas
(runners/base_runner.py:160-163, cuda/emd/emd_module.py:102-111). Here:

- ``trace(dir)``: context manager around jax.profiler.trace — produces a
  TensorBoard-loadable xplane trace of device execution.
- ``StepTimer``: wall-clock per-step timing with percentile summary
  (device-synchronized when given outputs to block on).
- ``annotate``: named TraceAnnotation for custom spans inside host code.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard's profile plugin."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span annotation (shows up in traces)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Per-step wall timing with a summary; call .stop(outputs) with any
    device arrays to block on for accurate device timing."""

    def __init__(self, name: str = "step"):
        self.name = name
        self.samples: list[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, outputs=None):
        if outputs is not None:
            for leaf in jax.tree_util.tree_leaves(outputs):
                if hasattr(leaf, "block_until_ready"):
                    leaf.block_until_ready()
        dt = time.perf_counter() - self._t0
        self.samples.append(dt)
        return dt

    def summary(self) -> dict:
        if not self.samples:
            return {}
        arr = np.asarray(self.samples)
        return {
            "name": self.name,
            "n": len(arr),
            "mean_ms": float(arr.mean() * 1000),
            "p50_ms": float(np.percentile(arr, 50) * 1000),
            "p90_ms": float(np.percentile(arr, 90) * 1000),
            "min_ms": float(arr.min() * 1000),
        }
