"""Checkpoint / resume via orbax.

The reference relies on Keras ``get_config`` + weight files, with several
serialization bugs (SURVEY.md §5.4); the capability to preserve is
"checkpoint = params + optimizer state + PRNG keys (+ MC chain state)".
Here any framework object — model pytrees, optax states, ``MCMCState`` /
``REMCState`` — checkpoints as a pytree; restore uses a same-structure
template (create the object, then restore into it).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

__all__ = ["save_checkpoint", "restore_checkpoint", "CheckpointManager"]


def save_checkpoint(path: str, tree: Any, force: bool = True) -> None:
    """Save a pytree (model / opt state / MC state / dict of them)."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=force)


def _counter_cls():
    from vaemolsim_tpu.mcmc.engine import Counter
    return Counter


def _has_counters(tree: Any) -> bool:
    Counter = _counter_cls()
    found = []
    jax.tree_util.tree_map(
        lambda x: found.append(True) if isinstance(x, Counter) else None,
        tree, is_leaf=lambda x: isinstance(x, Counter))
    return bool(found)


def _legacy_counter_template(tree: Any) -> Any:
    """Template with each two-word ``Counter`` replaced by the single
    int32 scalar that pre-Counter checkpoints stored."""
    Counter = _counter_cls()
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(0, jnp.int32) if isinstance(x, Counter) else x,
        tree, is_leaf=lambda x: isinstance(x, Counter))


def _upgrade_legacy_counters(template: Any, restored: Any) -> Any:
    """Rebuild ``Counter`` leaves from the restored legacy int32 scalars."""
    from vaemolsim_tpu.mcmc.engine import _COUNTER_BASE, Counter

    def up(tmpl, rest):
        if isinstance(tmpl, Counter):
            v = jnp.asarray(rest, jnp.int32)
            return Counter(lo=v % _COUNTER_BASE, hi=v // _COUNTER_BASE)
        return rest

    return jax.tree_util.tree_map(
        up, template, restored,
        is_leaf=lambda x: isinstance(x, _counter_cls()))


def restore_checkpoint(path: str, template: Any) -> Any:
    """Restore into the structure of ``template`` (an object with the
    same pytree structure, e.g. a freshly-created model).

    Checkpoints written before the two-word ``Counter`` (which stored
    acceptance counters as single int32 scalars) are migrated
    transparently: on a structure mismatch the restore is retried with a
    legacy template and the scalars are widened into ``Counter``s."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        try:
            return ckptr.restore(path, template)
        except Exception:
            if not _has_counters(template):
                raise
            legacy = ckptr.restore(path, _legacy_counter_template(template))
            return _upgrade_legacy_counters(template, legacy)


class CheckpointManager:
    """Step-indexed checkpoints with retention, for long MC runs /
    training (the fault-tolerance capability of SURVEY.md §5.3)."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))

    def save(self, step: int, tree: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(tree))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: Any, step: Optional[int] = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            raise ValueError(
                f"no checkpoints found in {self._mgr.directory}")
        try:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template))
        except Exception:
            if not _has_counters(template):
                raise
            legacy = self._mgr.restore(
                step,
                args=ocp.args.StandardRestore(
                    _legacy_counter_template(template)))
            return _upgrade_legacy_counters(template, legacy)

    def close(self) -> None:
        self._mgr.close()
