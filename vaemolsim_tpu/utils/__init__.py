"""Utilities: profiling / step timing (SURVEY.md §5.1) and runtime
numerical sanitizers (§5.2)."""

from vaemolsim_tpu.utils.profiling import (  # noqa: F401
    StepTimer,
    benchmark_fn,
    count_params,
    trace,
)
from vaemolsim_tpu.utils.debug import (  # noqa: F401
    assert_finite,
    assert_shape,
    checked,
)
from vaemolsim_tpu.utils.scan import scan_collect  # noqa: F401
