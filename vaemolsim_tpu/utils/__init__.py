"""Utilities: profiling / step timing (SURVEY.md §5.1)."""

from vaemolsim_tpu.utils.profiling import (  # noqa: F401
    StepTimer,
    benchmark_fn,
    trace,
)
