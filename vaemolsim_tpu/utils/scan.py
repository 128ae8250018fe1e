"""Shared scan-with-collection scaffolding for the sampler/integrator
run loops (one implementation of the "outer scan over inner scan,
snapshot every k-th state" pattern the MD/MC/WE runners all use)."""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax

__all__ = ["scan_collect"]


def scan_collect(step_fn: Callable[[Any], Any], state: Any,
                 n_steps: int, *, collect_every: int = 0,
                 snapshot_fn: Optional[Callable[[Any], Any]] = None
                 ) -> Tuple[Any, Optional[Any]]:
    """Apply ``step_fn`` ``n_steps`` times under ``lax.scan``.

    With ``collect_every = k > 0``, also return ``snapshot_fn(state)``
    (default: the state itself) stacked after every k-th step —
    ``n_steps`` must then divide evenly.  This is the single shared
    implementation of the run-loop scaffolding; runners wrap it with
    their own signatures."""
    if collect_every and n_steps % collect_every != 0:
        raise ValueError("n_steps must be a multiple of collect_every")
    snap = snapshot_fn if snapshot_fn is not None else (lambda s: s)

    def body(s, _):
        return step_fn(s), None

    if collect_every:
        def outer(s, _):
            s, _ = jax.lax.scan(body, s, None, length=collect_every)
            return s, snap(s)

        return jax.lax.scan(outer, state, None,
                            length=n_steps // collect_every)

    state, _ = jax.lax.scan(body, state, None, length=n_steps)
    return state, None
