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

import orbax.checkpoint as ocp

__all__ = ["save_checkpoint", "restore_checkpoint", "CheckpointManager"]


def save_checkpoint(path: str, tree: Any, force: bool = True) -> None:
    """Save a pytree (model / opt state / MC state / dict of them)."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=force)


def restore_checkpoint(path: str, template: Any) -> Any:
    """Restore into the structure of ``template`` (an object with the
    same pytree structure, e.g. a freshly-created model)."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, template)


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
        return self._mgr.restore(step,
                                 args=ocp.args.StandardRestore(template))

    def close(self) -> None:
        self._mgr.close()
