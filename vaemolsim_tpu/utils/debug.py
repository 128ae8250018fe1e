"""Runtime numerical sanitizers (SURVEY.md §5.2: the reference's closest
analog is TFP ``validate_args``; the TPU build makes checking a
first-class, jit-compatible facility).

``checked(fn)`` instruments a jittable function with
``jax.experimental.checkify`` so NaN/Inf production, out-of-bounds
indexing, and division errors inside compiled code surface as Python
errors with locations — usable on anything from a single distribution
log-prob to the full MCMC scan.  ``assert_finite`` / ``assert_shape``
are lightweight eager-or-traced guards for layer implementations (built
on chex).
"""

from __future__ import annotations

import functools
from typing import Callable

import chex
import jax
from jax.experimental import checkify

__all__ = ["checked", "assert_finite", "assert_shape"]


def checked(fn: Callable, *, jit: bool = True) -> Callable:
    """Wrap a jittable fn with float (NaN/Inf), index, and div checks.

    The wrapper raises ``checkify.JaxRuntimeError`` (with the failing
    check's location) instead of silently propagating NaNs.

    >>> safe_step = checked(lambda s: run_mcmc(step, s, 100)[0])
    >>> state = safe_step(state)   # raises if any check trips
    """
    errs = checkify.float_checks | checkify.index_checks | checkify.div_checks
    cfn = checkify.checkify(fn, errors=errs)
    if jit:
        cfn = jax.jit(cfn)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return wrapper


def assert_finite(x, name: str = "value") -> None:
    """Eager/traced finiteness guard (no-op inside jit unless checkify'd)."""
    chex.assert_tree_all_finite(x)


def assert_shape(x, shape, name: str = "value") -> None:
    chex.assert_shape(x, shape)
