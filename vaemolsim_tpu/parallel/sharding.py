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

__all__ = ["make_mesh", "make_hybrid_mesh", "chain_sharding",
           "shard_chain_state", "replicate", "shard_map_compat"]


def shard_map_compat(f, mesh: Mesh, in_specs, out_specs):
    """Version-stable ``shard_map`` wrapper (jax >= 0.7 promoted the API
    out of ``jax.experimental`` and renamed ``check_rep`` to
    ``check_vma``; replication checking is off either way — kernels here
    use collectives whose replication the checker can't always infer)."""
    try:
        from jax import shard_map as _sm
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=False)
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map as _sm
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=False)


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


def make_hybrid_mesh(dcn_axis_sizes: dict, ici_axis_sizes: dict,
                     devices: Optional[Sequence] = None) -> Mesh:
    """Slice-aware mesh for multi-slice TPU pods (SURVEY.md §2.4: ICI
    within a pod slice, DCN across slices).

    ``dcn_axis_sizes`` name the mesh axes laid out ACROSS slices (slow
    DCN links — e.g. the replica-exchange ladder, which swaps only small
    per-chain scalars), ``ici_axis_sizes`` the axes WITHIN a slice (fast
    ICI — e.g. the chain axis whose collectives carry state).  On real
    multi-slice hardware the layout comes from
    ``mesh_utils.create_hybrid_device_mesh``; on single-slice or virtual
    (CPU) devices the same logical mesh is emulated by factoring the
    device list, so multi-slice programs compile and dry-run anywhere.

    The last axis of either dict may be -1 to absorb the remainder.
    """
    from jax.experimental import mesh_utils

    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)

    def _resolve(sizes: dict, total: int) -> dict:
        vals = list(sizes.values())
        known = int(np.prod([s for s in vals if s != -1]))
        vals = [total // known if s == -1 else s for s in vals]
        return dict(zip(sizes, vals))

    slice_ids = {getattr(d, "slice_index", None) for d in devices}
    multi_slice = len(slice_ids) > 1 and None not in slice_ids

    if multi_slice:
        n_slices = len(slice_ids)
        dcn = _resolve(dcn_axis_sizes, n_slices)
        ici = _resolve(ici_axis_sizes, n // n_slices)
        names = tuple(dcn) + tuple(ici)
        # Hybrid helper wants per-axis (dcn, ici) factors on shared axes:
        # give DCN axes ici-factor 1 and ICI axes dcn-factor 1.
        ici_shape = tuple([1] * len(dcn) + list(ici.values()))
        dcn_shape = tuple(list(dcn.values()) + [1] * len(ici))
        dev_array = mesh_utils.create_hybrid_device_mesh(
            ici_shape, dcn_shape, devices=devices)
        return Mesh(dev_array, names)

    # Single slice / virtual devices: emulate by factoring the flat list,
    # DCN axes outermost (so a future multi-slice run keeps the layout).
    # A single -1 (in either dict) absorbs the remainder over ALL
    # explicit axes — so e.g. ({"replica": -1}, {"chain": 4}) on 8
    # devices resolves replica=2, matching what multi-slice hardware
    # would give.  With a -1 in each dict, the DCN one absorbs the
    # remainder and the ICI one gets what is left.
    explicit = int(np.prod([s for s in (*dcn_axis_sizes.values(),
                                        *ici_axis_sizes.values())
                            if s != -1]))
    if explicit == 0 or n % max(explicit, 1):
        raise ValueError(
            f"explicit hybrid axes {dict(**dcn_axis_sizes, **ici_axis_sizes)} "
            f"do not divide the {n} devices")
    wilds = sum(s == -1 for s in (*dcn_axis_sizes.values(),
                                  *ici_axis_sizes.values()))
    if wilds <= 1:
        dcn = {k: (n // explicit if s == -1 else s)
               for k, s in dcn_axis_sizes.items()}
        ici = {k: (n // explicit if s == -1 else s)
               for k, s in ici_axis_sizes.items()}
    else:
        dcn = _resolve(dcn_axis_sizes, n)
        rem = n // max(int(np.prod(list(dcn.values()))), 1)
        ici = _resolve(ici_axis_sizes, rem)
    names = tuple(dcn) + tuple(ici)
    sizes = list(dcn.values()) + list(ici.values())
    if int(np.prod(sizes)) != n:
        raise ValueError(f"Hybrid mesh {dict(zip(names, sizes))} does not "
                         f"use all {n} devices")
    return Mesh(np.asarray(devices).reshape(sizes), names)


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
