"""Simulated tempering: single-chain expanded-ensemble temperature
sampling with on-device Wang-Landau weight adaptation.

The memory-lean sibling of replica exchange
(:mod:`vaemolsim_tpu.parallel.replica` / ``.remd``): instead of R
simultaneous replicas, each chain carries ONE configuration plus a
temperature index and random-walks through the inverse-temperature
ladder, sampling the joint target

    pi(x, k) ~ exp(beta_k * l(x) + w_k),        l = log pi_target(x)

(the reference's log-density sign convention,
/root/reference/vaemolsim/mcmc.py:116).  With ``w_k = -ln Z_k`` the
rung occupancy is uniform and the beta=1 conditional is exactly the
target — so the ADAPTED weights are simultaneously a free-energy
estimate across the ladder (``w_k - w_0 -> F_k - F_0`` in reduced
units), which the tests pin against closed forms.

TPU-first: the whole run is one ``lax.scan``; the configuration move
reuses the production local-move trial (`mcmc.moves._scaled_trial` —
random-walk/MALA/HMC all available) under a per-chain tempered
closure; the temperature hop is a vectorized +-1 proposal with
out-of-ladder rejection (exactly symmetric, no boundary correction
needed); Wang-Landau updates are one one-hot matmul over chains with a
``1/(1 + t/tau)`` stochastic-approximation decay (Belardinelli-Pereyra
style) and mean-recentring so weights cannot drift.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from vaemolsim_tpu.mcmc.engine import Counter, log_uniform
from vaemolsim_tpu.mcmc.moves import _scaled_trial

Array = jax.Array

__all__ = ["STState", "make_st_step", "run_st"]


@struct.dataclass
class STState:
    """Per-chain expanded-ensemble state plus the shared adaptive
    weights.  ``energies`` stores the UNTEMPERED log target ``l(x)``."""

    x: Array             # (chains, *event)
    energies: Array      # (chains,)
    temp_idx: Array      # (chains,) int32
    log_weights: Array   # (R,) adaptive w_k
    betas: Array         # (R,)
    key: Array
    step_index: Array    # () int32 — drives the WL decay
    occupancy: Array     # (R,) float32 visit counts (diagnostics)
    num_trials: Counter
    num_acc: Counter
    num_temp_trials: Counter
    num_temp_acc: Counter

    @property
    def acceptance_rate(self) -> Array:
        return (self.num_acc.to_float()
                / jnp.maximum(self.num_trials.to_float(), 1.0))

    @property
    def temp_acceptance_rate(self) -> Array:
        return (self.num_temp_acc.to_float()
                / jnp.maximum(self.num_temp_trials.to_float(), 1.0))

    @property
    def free_energies(self) -> Array:
        """Reduced free energies of the rungs relative to rung 0:
        ``F_k - F_0 = ln(Z_0 / Z_k)`` estimated by the adapted weights
        (exact as the WL increment -> 0)."""
        return self.log_weights - self.log_weights[0]

    @classmethod
    def create(cls, x: Array, log_target_fn, betas: Array, key: Array,
               log_weights: Optional[Array] = None,
               temp_idx: Optional[Array] = None) -> "STState":
        x = jnp.asarray(x)
        betas = jnp.asarray(betas)
        R = betas.shape[0]
        n = x.shape[0]
        if temp_idx is None:
            temp_idx = jnp.zeros(n, jnp.int32)
        w = (jnp.zeros(R, x.dtype) if log_weights is None
             else jnp.asarray(log_weights, x.dtype))
        return cls(x=x, energies=log_target_fn(x),
                   temp_idx=jnp.asarray(temp_idx, jnp.int32),
                   log_weights=w, betas=betas, key=jnp.asarray(key),
                   step_index=jnp.asarray(0, jnp.int32),
                   occupancy=jnp.zeros(R, jnp.float32),
                   num_trials=Counter.zero(), num_acc=Counter.zero(),
                   num_temp_trials=Counter.zero(),
                   num_temp_acc=Counter.zero())


def make_st_step(log_target_fn: Callable[[Array], Array], *,
                 kind: str = "random_walk", scale: float = 0.5,
                 n_leapfrog: int = 10,
                 adapt: bool = True, wl_f0: float = 0.5,
                 wl_tau: float = 200.0
                 ) -> Callable[[STState], STState]:
    """Build the fused (configuration move + temperature hop [+ weight
    update]) step.  ``kind``/``scale``/``n_leapfrog`` select the local
    move family (shared with :mod:`vaemolsim_tpu.mcmc.moves`).  With
    ``adapt=False`` the weights are frozen (production sampling with
    known/converged weights); with ``adapt=True`` they follow the
    Wang-Landau decay ``f_t = wl_f0 / (1 + t / wl_tau)``."""

    def step(state: STState) -> STState:
        key, k_move, k_dir, k_u = jax.random.split(state.key, 4)
        beta_c = state.betas[state.temp_idx]          # (chains,)

        # --- configuration phase: tempered local move ---
        tempered = lambda xs: beta_c * log_target_fn(xs)
        x2, e2_t, accept = _scaled_trial(kind, tempered, state.x,
                                         beta_c * state.energies,
                                         scale, k_move,
                                         n_leapfrog=n_leapfrog)
        l_new = jnp.where(accept, e2_t / beta_c, state.energies)
        x_new = jnp.where(
            accept[(...,) + (None,) * (state.x.ndim - 1)], x2, state.x)

        # --- temperature phase: +-1 hop, reject outside the ladder ---
        R = state.betas.shape[0]
        direction = jnp.where(
            jax.random.uniform(k_dir, beta_c.shape) < 0.5, -1, 1)
        j = state.temp_idx + direction
        in_range = (j >= 0) & (j < R)
        j_c = jnp.clip(j, 0, R - 1)
        log_acc = ((state.betas[j_c] - beta_c) * l_new
                   + state.log_weights[j_c]
                   - state.log_weights[state.temp_idx])
        hop = in_range & (log_acc >= log_uniform(k_u, beta_c.shape,
                                                 l_new.dtype))
        temp_new = jnp.where(hop, j_c, state.temp_idx)

        # --- Wang-Landau update on the SHARED weights ---
        counts = jnp.sum(
            jax.nn.one_hot(temp_new, R, dtype=state.log_weights.dtype),
            axis=0) / temp_new.shape[0]
        if adapt:
            f = wl_f0 / (1.0 + state.step_index.astype(l_new.dtype)
                         / wl_tau)
            w = state.log_weights - f * counts
            w = w - jnp.mean(w)
        else:
            w = state.log_weights

        n = int(accept.size)
        return state.replace(
            x=x_new, energies=l_new, temp_idx=temp_new,
            log_weights=w, key=key,
            step_index=state.step_index + 1,
            occupancy=state.occupancy
            + counts.astype(jnp.float32) * temp_new.shape[0],
            num_trials=state.num_trials.add(n),
            num_acc=state.num_acc.add(jnp.sum(accept, dtype=jnp.int32)),
            num_temp_trials=state.num_temp_trials.add(n),
            num_temp_acc=state.num_temp_acc.add(
                jnp.sum(hop, dtype=jnp.int32)))

    return step


def run_st(step_fn: Callable[[STState], STState], state: STState,
           n_steps: int, *, collect_every: int = 0
           ) -> Tuple[STState, Optional[Tuple[Array, Array]]]:
    """Scan ``n_steps`` tempering steps.  With ``collect_every = k``,
    also returns ``(xs, temp_idxs)`` stacked every k-th step — filter
    by ``temp_idxs == 0`` for target-ensemble samples."""
    from vaemolsim_tpu.utils.scan import scan_collect
    return scan_collect(step_fn, state, n_steps,
                        collect_every=collect_every,
                        snapshot_fn=lambda s: (s.x, s.temp_idx))
