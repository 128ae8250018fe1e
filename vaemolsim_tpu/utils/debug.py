"""Runtime numerical sanitizers (SURVEY.md §5.2: the reference's closest
analog is TFP ``validate_args``; the TPU build makes checking a
first-class, jit-compatible facility).

``checked(fn)`` instruments a jittable function with
``jax.experimental.checkify`` so NaN production, out-of-bounds
indexing, division errors, and the function's own ``checkify.check``
assertions inside compiled code surface as Python errors with
locations — usable on anything from a single distribution log-prob to
the full MCMC scan.  (checkify has no Inf check class; guard against
overflow-to-inf with ``assert_finite`` on eager outputs or an explicit
``checkify.check(jnp.all(jnp.isfinite(x)), ...)`` inside the wrapped
function.)  ``assert_finite`` / ``assert_shape`` are lightweight
eager-or-traced guards for layer implementations (built on chex).
"""

from __future__ import annotations

import functools
from typing import Callable

import chex
import jax
from jax.experimental import checkify

__all__ = ["checked", "assert_finite", "assert_shape"]


def checked(fn: Callable, *, jit: bool = True) -> Callable:
    """Wrap a jittable fn with float (NaN), index, div, and user checks.

    The wrapper raises ``checkify.JaxRuntimeError`` (with the failing
    check's location) instead of silently propagating NaNs.  User
    ``checkify.check`` calls inside ``fn`` fire too (omitting
    user_checks would silently discharge them as no-ops).

    >>> safe_step = checked(lambda s: run_mcmc(step, s, 100)[0])
    >>> state = safe_step(state)   # raises if any check trips
    """
    errs = (checkify.float_checks | checkify.index_checks
            | checkify.div_checks | checkify.user_checks)
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
    """Finiteness guard for eager code; a true no-op under tracing (use
    :func:`checked` to get in-jit value checks)."""
    leaves = jax.tree_util.tree_leaves(x)
    if any(isinstance(leaf, jax.core.Tracer) for leaf in leaves):
        return
    try:
        chex.assert_tree_all_finite(x)
    except AssertionError as e:
        raise AssertionError(f"{name}: {e}") from None


def assert_shape(x, shape, name: str = "value") -> None:
    """Static shape guard (works eagerly and under tracing)."""
    try:
        chex.assert_shape(x, shape)
    except AssertionError as e:
        raise AssertionError(f"{name}: {e}") from None
