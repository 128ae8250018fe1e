"""Device-mesh utilities: chain-parallel data layout for the MC engine.

The reference has no distributed execution at all (SURVEY.md §2.4); its
only concurrency is batching chains on one device.  Here the chain axis
(and the replica axis, for parallel tempering) are sharded over a
``jax.sharding.Mesh``: the MC scan is pure data-parallel over chains, so
XLA compiles it SPMD with the only cross-device traffic being the scalar
acceptance statistics (an all-reduce over ICI) and the replica-exchange
permutation (a collective-permute over ICI).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "chain_sharding", "shard_chain_state",
           "replicate"]


def make_mesh(axis_sizes: Optional[dict] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a mesh over the available devices.

    ``axis_sizes`` maps axis names to sizes (last axis may be -1 to absorb
    the remainder); default is a 1-D ``("chain",)`` mesh over all devices.
    """
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = {"chain": len(devices)}
    names = tuple(axis_sizes)
    sizes = list(axis_sizes.values())
    n = len(devices)
    known = int(np.prod([s for s in sizes if s != -1]))
    sizes = [n // known if s == -1 else s for s in sizes]
    if int(np.prod(sizes)) != n:
        raise ValueError(f"Mesh {dict(zip(names, sizes))} does not use all "
                         f"{n} devices")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, names)


def chain_sharding(mesh: Mesh, ndim: int, chain_axis: int = 0,
                   mesh_axis: str = "chain") -> NamedSharding:
    """NamedSharding that splits array axis ``chain_axis`` over
    ``mesh_axis`` and replicates the rest."""
    spec = [None] * ndim
    spec[chain_axis] = mesh_axis
    return NamedSharding(mesh, P(*spec))


def shard_chain_state(state, mesh: Mesh, mesh_axis: str = "chain"):
    """Place an ``MCMCState`` (or any pytree whose array leaves carry the
    chain axis first) onto the mesh, chain-axis sharded.  Scalars and the
    PRNG key are replicated."""

    def put(x):
        x = jnp.asarray(x)
        if x.ndim == 0 or (x.dtype == jnp.uint32 and x.ndim == 1):
            return jax.device_put(x, NamedSharding(mesh, P()))
        return jax.device_put(x, chain_sharding(mesh, x.ndim, 0, mesh_axis))

    return jax.tree_util.tree_map(put, state)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (e.g. model parameters) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), sharding), tree)
