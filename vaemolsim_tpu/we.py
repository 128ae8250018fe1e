"""Weighted-ensemble (WE) rare-event sampling.

Beyond-reference enhanced-sampling capability in the WESTPA
methodology (Huber & Kim 1996; Zuckerman & Chong 2017): many weighted
walkers advance by UNBIASED dynamics, and a periodic split/merge
resampling step equalizes walker counts across bins of a progress
coordinate — so the tails of the distribution (the transition region)
stay populated without ever biasing the dynamics or the weights.
With recycling at a target state, the mean recycled weight per
iteration IS the steady-state rate (the Hill relation).

TPU-first design: the walker population lives in a FIXED
``(n_bins, m_per_bin)`` slot array (weight 0 = empty slot), the bin
assignment is a Voronoi/threshold ``bin_fn``, and the per-bin
split/merge is ONE vectorized systematic-resampling pass — a masked
cumulative sum over all slots per bin plus a one-hot gather, no
host-side lists (WESTPA's per-bin Python bookkeeping is replaced by a
(n_bins, N_slots) comparison grid).  Systematic resampling keeps the
estimator unbiased: the expected total weight landing on each walker
equals its own weight, and each bin's total weight is conserved
EXACTLY (no Metropolis step, no bias — pinned by tests against plain
MD moments and Boltzmann bin populations).

Walkers are PYTREES: positions alone, or ``(x, v)`` so velocities
persist across WE iterations (restarting velocities from zero each
segment is NOT the target dynamics — with segment times below the
thermalization time ``1/friction`` it visibly cripples diffusion), or
any richer per-walker state.  ``propagate_fn(walkers, key)``,
``bin_fn(walkers)`` and ``recycle_fn(walkers)`` all receive the pytree;
every leaf's leading axis is the slot axis.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array

__all__ = ["WEState", "we_init", "make_we_step", "run_we"]


@struct.dataclass
class WEState:
    """Fixed-slot walker population.  ``x``: a pytree of walker state
    whose leaves have leading slot axis ``S = n_bins * m_per_bin``;
    ``w``: (S,) weights summing to 1 (0 = empty slot); ``flux``:
    accumulated recycled weight (target-state arrivals); ``n_iters``
    completed WE iterations."""

    x: Any
    w: Array
    key: Array
    flux: Array
    n_iters: Array

    @property
    def rate(self) -> Array:
        """Hill-relation steady-state rate: mean recycled probability
        per WE iteration (divide by the iteration's physical time for
        a rate in time units)."""
        return self.flux / jnp.maximum(self.n_iters.astype(self.w.dtype),
                                       1.0)


def we_init(x0: Any, n_bins: int, m_per_bin: int, key: Array,
            weights: Optional[Array] = None) -> WEState:
    """Start a WE run from ``k`` seed walkers (a pytree whose leaves
    have leading axis ``k <= n_bins * m_per_bin``): seeds fill the
    first slots with uniform (or given) weights; remaining slots are
    empty.  The first resampling pass redistributes them across bins."""
    leaves = jax.tree_util.tree_leaves(x0)
    k = leaves[0].shape[0]
    S = n_bins * m_per_bin
    if k > S:
        raise ValueError(f"{k} seeds > {S} slots")
    w0 = (jnp.full((k,), 1.0 / k) if weights is None
          else jnp.asarray(weights) / jnp.sum(weights))

    def pad(a):
        a = jnp.asarray(a)
        fill = jnp.tile(a[:1], (S - k,) + (1,) * (a.ndim - 1))
        return jnp.concatenate([a, fill], axis=0)

    x = jax.tree_util.tree_map(pad, x0)
    w = jnp.concatenate([w0, jnp.zeros((S - k,), w0.dtype)])
    return WEState(x=x, w=w, key=jnp.asarray(key),
                   flux=jnp.zeros((), w0.dtype),
                   n_iters=jnp.zeros((), jnp.int32))


def _systematic_resample(x: Any, w: Array, bins: Array, n_bins: int,
                         m_per_bin: int, key: Array
                         ) -> Tuple[Any, Array]:
    """Per-bin systematic resampling over the flat slot axis.

    For every bin with total weight W_b > 0, select ``m_per_bin``
    walkers with expected multiplicity proportional to weight and
    assign each weight ``W_b / m_per_bin``.  One (n_bins, S) masked
    cumsum + (n_bins, m) comparison-count; the gather is
    ``jnp.take`` over the flat slot axis."""
    S = w.shape[0]
    onehot_bin = (bins[None, :] == jnp.arange(n_bins)[:, None])  # (B,S)
    w_in = jnp.where(onehot_bin, w[None, :], 0.0)                # (B,S)
    csum = jnp.cumsum(w_in, axis=1)                              # (B,S)
    # Use the cumsum's OWN final entry as the bin total: comparing the
    # points against pts * W_b with W_b from a separate reduction can
    # disagree with the cumsum at float32 resolution and select a slot
    # from another bin (cross-bin probability teleportation).  With
    # W_b = csum[:, -1] and pts in (0, 1), pts * W_b <= W_b exactly, so
    # the selected slot is always one carrying in-bin weight; u0 is
    # clamped away from 0 so the first point cannot select slot 0 of a
    # foreign bin.
    W_b = csum[:, -1]                                            # (B,)
    u0 = jax.random.uniform(key, (n_bins, 1), minval=1e-6)
    pts = (jnp.arange(m_per_bin)[None, :] + u0) / m_per_bin      # (B,m)
    target = pts * W_b[:, None]
    idx = jnp.sum(csum[:, None, :] < target[:, :, None],
                  axis=-1).astype(jnp.int32)                     # (B,m)
    idx = jnp.clip(idx, 0, S - 1)
    flat_idx = idx.reshape(-1)
    new_x = jax.tree_util.tree_map(
        lambda a: jnp.take(a, flat_idx, axis=0), x)
    new_w = jnp.broadcast_to(
        jnp.where(W_b[:, None] > 0.0, W_b[:, None] / m_per_bin, 0.0),
        (n_bins, m_per_bin))
    return new_x, new_w.reshape(-1)


def make_we_step(propagate_fn: Callable[[Any, Array], Any],
                 bin_fn: Callable[[Any], Array], *,
                 n_bins: int, m_per_bin: int,
                 target_bin: Optional[int] = None,
                 recycle_fn: Optional[Callable[[Any], Any]] = None
                 ) -> Callable[[WEState], WEState]:
    """Build one WE iteration: propagate -> (recycle at target) ->
    split/merge resampling.

    ``bin_fn(x) -> int32 (...,)`` maps configurations to bins in
    ``[0, n_bins)``.  With ``target_bin`` set, a walker reaching it has
    its weight accumulated into ``flux`` and is re-injected at
    ``recycle_fn(x) -> x_source`` (probability is conserved — the
    walker keeps its weight at the source; the Hill relation reads the
    steady-state rate off ``state.rate``).
    """
    if target_bin is not None and recycle_fn is None:
        raise ValueError("recycling a target requires recycle_fn "
                         "(where does the probability re-enter?)")

    def step(state: WEState) -> WEState:
        key, k_prop, k_res = jax.random.split(state.key, 3)
        x = propagate_fn(state.x, k_prop)
        bins = bin_fn(x).astype(jnp.int32)
        flux = state.flux
        if target_bin is not None:
            hit = bins == target_bin
            flux = flux + jnp.sum(jnp.where(hit, state.w, 0.0))
            recycled = recycle_fn(x)
            x = jax.tree_util.tree_map(
                lambda new, old: jnp.where(
                    hit.reshape((-1,) + (1,) * (old.ndim - 1)), new, old),
                recycled, x)
            bins = jnp.where(hit, bin_fn(x).astype(jnp.int32), bins)
        new_x, new_w = _systematic_resample(x, state.w, bins, n_bins,
                                            m_per_bin, k_res)
        return state.replace(x=new_x, w=new_w, key=key, flux=flux,
                             n_iters=state.n_iters + 1)

    return step


def run_we(step_fn: Callable[[WEState], WEState], state: WEState,
           n_iters: int, *, collect_every: int = 0
           ) -> Tuple[WEState, Optional[Tuple[Array, Array]]]:
    """Scan ``n_iters`` WE iterations; with ``collect_every = k``, also
    return ``(xs, ws)`` snapshots every k-th iteration (weighted
    ensemble estimates use BOTH)."""
    from vaemolsim_tpu.utils.scan import scan_collect
    return scan_collect(step_fn, state, n_iters,
                        collect_every=collect_every,
                        snapshot_fn=lambda s: (s.x, s.w))
