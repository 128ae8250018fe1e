"""Multi-process (multi-host) runtime support.

SURVEY.md §2.4: a real multi-slice TPU pod is one JAX *process per
host*, with ICI collectives inside a slice and DCN across slices.  The
mesh/sharding layer (``parallel.sharding``) is already process-agnostic
— ``jax.devices()`` spans every process once the distributed runtime is
initialized — so this module supplies the runtime pieces:

- :func:`initialize_distributed` — ``jax.distributed.initialize``
  wrapper that also selects the CPU cross-process collectives backend
  (gloo) when running on CPU devices, so multi-process programs can be
  developed and CI-tested on one machine (the 2-process x 4-device
  dryrun in ``tools/distributed_smoke.py``).
- :func:`local_to_global` / :func:`global_to_local` — move between
  per-process local batches and globally-sharded ``jax.Array``s
  (each host feeds its shard; XLA sees one global array).
- :func:`process_allmean`, :func:`broadcast_from_coordinator`,
  :func:`sync_processes` — the host-side coordination primitives
  (all jitted-collective-backed via ``jax.experimental.multihost_utils``).

On a real pod: run one process per host with ``coordinator_address``
pointing at host 0 (or under a launcher that sets the standard cluster
env vars, in which case call ``initialize_distributed()`` with no
arguments), then build meshes exactly as single-process code does —
``make_mesh``/``make_hybrid_mesh`` already span ``jax.devices()``.
Checkpointing via ``train.checkpoint`` is multi-host-safe: orbax writes
each process's addressable shards and coordinates the commit, as long as
every process calls save/restore collectively on a shared filesystem.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np

__all__ = ["initialize_distributed", "shutdown_distributed",
           "process_count", "process_index", "is_coordinator",
           "local_to_global", "global_to_local", "process_allmean",
           "broadcast_from_coordinator", "sync_processes"]


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           local_device_ids: Optional[Sequence[int]] = None,
                           cpu_collectives: str = "gloo") -> None:
    """Initialize the multi-process JAX runtime (idempotent).

    With no arguments, cluster auto-detection applies (TPU pod metadata
    or the standard env vars JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES
    / JAX_PROCESS_ID).  On CPU platforms the cross-process collectives
    implementation must be chosen BEFORE backend initialization;
    ``cpu_collectives`` selects it (gloo is in-tree and needs no extra
    deps — the config is harmless on TPU, where collectives ride
    ICI/DCN natively).
    """
    # NOTE: must not touch jax.devices()/process_count() here — any
    # backend-initializing call before jax.distributed.initialize makes
    # initialization impossible.
    if _already_initialized():
        return
    try:
        jax.config.update("jax_cpu_collectives_implementation",
                          cpu_collectives)
    except Exception:
        pass  # unknown on very old jax; TPU pods don't need it
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        # Belt-and-braces idempotence: _already_initialized reads a
        # private jax module that may move between versions; if its
        # fallback said "not initialized" but the runtime disagrees,
        # honor the documented idempotence instead of raising.
        if "already initialized" not in str(e):
            raise


def _already_initialized() -> bool:
    try:
        from jax._src.distributed import global_state
        return global_state.client is not None
    except Exception:
        return False


def shutdown_distributed() -> None:
    """Tear down the distributed runtime (tests / clean exit)."""
    if _already_initialized():
        jax.distributed.shutdown()


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_coordinator() -> bool:
    return jax.process_index() == 0


def local_to_global(local_data: Any, sharding) -> Any:
    """Assemble per-process local batches into globally-sharded arrays.

    ``local_data`` is a pytree of arrays holding THIS process's samples
    (each process passes its own shard, e.g. the slice of the dataset it
    loaded); ``sharding`` is a ``NamedSharding`` whose leading mesh axis
    spans processes (or a callable ``array -> sharding`` for per-leaf
    specs).  Returns a pytree of global ``jax.Array``s whose global
    leading size is the sum over processes.
    """

    def put(a):
        a = np.asarray(a)
        s = sharding(a) if callable(sharding) else sharding
        return jax.make_array_from_process_local_data(s, a)

    return jax.tree_util.tree_map(put, local_data)


def global_to_local(global_tree: Any) -> Any:
    """This process's addressable data of globally-sharded arrays, as
    numpy (concatenated over the leading axis in shard order)."""

    def get(a):
        shards = sorted(a.addressable_shards, key=lambda s: s.index)
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)

    return jax.tree_util.tree_map(get, global_tree)


def process_allmean(tree: Any) -> Any:
    """Mean of a (host-local numpy/scalar) pytree over processes —
    e.g. per-process validation metrics."""
    from jax.experimental import multihost_utils

    n = jax.process_count()
    if n == 1:
        return jax.tree_util.tree_map(np.asarray, tree)
    gathered = multihost_utils.process_allgather(tree)
    return jax.tree_util.tree_map(lambda a: np.mean(a, axis=0), gathered)


def broadcast_from_coordinator(tree: Any) -> Any:
    """Broadcast a pytree from process 0 to all processes (e.g. an
    initial model so every process starts from identical parameters
    without relying on seed discipline)."""
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return tree
    return multihost_utils.broadcast_one_to_all(tree)


def sync_processes(name: str = "sync") -> None:
    """Barrier across processes (checkpoint commit points etc.)."""
    from jax.experimental import multihost_utils

    if jax.process_count() > 1:
        multihost_utils.sync_global_devices(name)
