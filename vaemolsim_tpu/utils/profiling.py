"""Profiling / step-timing utilities (SURVEY.md §5.1: the reference has
no first-party tracing; the TPU build makes it a module).

``trace(logdir)`` wraps ``jax.profiler.trace`` for TensorBoard-viewable
device traces; ``StepTimer`` collects per-phase wall times with proper
``block_until_ready`` fencing so numbers mean what they say under async
dispatch.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List

import jax

__all__ = ["trace", "StepTimer", "benchmark_fn"]


@contextlib.contextmanager
def trace(logdir: str):
    """Device-level profiler trace: view with TensorBoard's profile tab."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Named phase timer: ``with timer.phase("mc_step"): ...``.

    Fences device work on phase exit so async dispatch does not hide
    compute inside later phases.
    """

    def __init__(self):
        self.times: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.times.setdefault(name, []).append(
                time.perf_counter() - t0)

    def mean(self, name: str) -> float:
        return sum(self.times[name]) / len(self.times[name])

    def summary(self) -> Dict[str, float]:
        return {k: self.mean(k) for k in self.times}


def benchmark_fn(fn, *args, warmup: int = 1, iters: int = 10) -> float:
    """Mean wall time per call of a jitted fn, with warmup + fencing."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
