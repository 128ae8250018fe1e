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

__all__ = ["trace", "StepTimer", "benchmark_fn", "count_params"]


@contextlib.contextmanager
def trace(logdir: str):
    """Device-level profiler trace: view with TensorBoard's profile tab."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class _PhaseHandle:
    """Set ``handle.result = <output>`` inside the phase so the timer can
    fence on the work the body actually produced."""

    result = None


class StepTimer:
    """Named phase timer with async-dispatch fencing::

        with timer.phase("mc_step") as ph:
            state = step(state)
            ph.result = state      # fenced with block_until_ready on exit

    Without setting ``ph.result`` the recorded time is dispatch-only
    (JAX is asynchronous) — set it whenever the body launches device
    work.
    """

    def __init__(self):
        self.times: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        handle = _PhaseHandle()
        t0 = time.perf_counter()
        try:
            yield handle
        finally:
            if handle.result is not None:
                jax.block_until_ready(handle.result)
            self.times.setdefault(name, []).append(
                time.perf_counter() - t0)

    def mean(self, name: str) -> float:
        return sum(self.times[name]) / len(self.times[name])

    def summary(self) -> Dict[str, float]:
        return {k: self.mean(k) for k in self.times}


def benchmark_fn(fn, *args, warmup: int = 1, iters: int = 10) -> float:
    """Mean wall time per call of a jitted fn, with warmup + fencing."""
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def count_params(tree) -> int:
    """Total number of array elements in a model pytree — the summary
    line the reference gets from Keras ``model.summary()``."""
    import numpy as _np
    return int(sum(_np.prod(leaf.shape)
                   for leaf in jax.tree_util.tree_leaves(tree)
                   if hasattr(leaf, "shape")))
