"""Replica-exchange (parallel-tempering) VAE-proposal Monte Carlo.

New first-class capability of the TPU build (SURVEY.md §2.4, BASELINE
config 5: "10k vmapped parallel MC chains with flow prior + replica
exchange over ICI").  ``R`` temperature replicas, each holding ``C``
chains, run tempered VAE-proposal Metropolis steps; every
``exchange_every`` steps adjacent replicas attempt per-chain swaps with
the standard parallel-tempering criterion

    A = min(1, exp((beta_i - beta_j) * (l_j - l_i))),   l = log pi(x)

alternating even/odd pairings.  Written in the global view: the swap is a
static partner permutation + where-select, which XLA lowers to a
collective-permute over ICI when the replica axis is sharded over the
mesh (no hand-written communication).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct

from vaemolsim_tpu.mcmc.engine import Counter, mh_propose

Array = jax.Array

__all__ = ["REMCState", "make_remc_step", "run_remc", "temperature_ladder"]


@struct.dataclass
class REMCState:
    """State of R replicas x C chains.  ``energies`` stores the *untempered*
    log target density l = log pi(x); tempering happens in the kernel."""

    configs: Array  # (R, C, D)
    energies: Array  # (R, C)
    betas: Array  # (R,)
    key: Array
    step_index: Array  # () int32, drives even/odd pairing
    # Wide exact counters (mcmc.engine.Counter): two int32 words, no
    # wrap to 2^61 events.
    num_trials: Counter
    num_acc: Counter
    num_swap_trials: Counter
    num_swap_acc: Counter

    @property
    def acceptance_rate(self) -> Array:
        return (self.num_acc.to_float()
                / jnp.maximum(self.num_trials.to_float(), 1.0))

    @property
    def swap_acceptance_rate(self) -> Array:
        return (self.num_swap_acc.to_float()
                / jnp.maximum(self.num_swap_trials.to_float(), 1.0))

    @classmethod
    def create(cls, configs: Array, log_target_fn, betas: Array,
               key: Array) -> "REMCState":
        configs = jnp.asarray(configs)
        return cls(configs=configs,
                   energies=log_target_fn(configs),
                   betas=jnp.asarray(betas), key=key,
                   step_index=jnp.asarray(0, jnp.int32),
                   num_trials=Counter.zero(), num_acc=Counter.zero(),
                   num_swap_trials=Counter.zero(),
                   num_swap_acc=Counter.zero())


def temperature_ladder(n_replicas: int, beta_min: float = 0.2,
                       beta_max: float = 1.0) -> Array:
    """Geometric inverse-temperature ladder, replica 0 coldest (beta=1)."""
    return jnp.geomspace(beta_max, beta_min, n_replicas)


def _swap_partner_perm(R: int, odd_phase: Array) -> Array:
    """Partner indices for even pairing (0,1)(2,3)... and odd pairing
    (1,2)(3,4)... as a traced selection between two static permutations."""
    idx = jnp.arange(R)
    # min(idx+1, R-1) already maps an unpaired tail replica (odd R) to
    # itself in both phases, so no extra tail guards are needed.
    even = jnp.where(idx % 2 == 0,
                     jnp.minimum(idx + 1, R - 1),
                     idx - 1)
    shifted = idx - 1
    odd = jnp.where(shifted % 2 == 0,
                    jnp.minimum(idx + 1, R - 1), idx - 1)
    odd = jnp.where(idx == 0, 0, odd)
    return jnp.where(odd_phase, odd, even)


def make_remc_step(encoder_fn: Callable[[Array], Any],
                   prior_fn: Callable[[Array], Any],
                   decoder_fn: Callable[[Array], Any],
                   log_target_fn: Callable[[Array], Array],
                   exchange_every: int = 1
                   ) -> Callable[[REMCState], REMCState]:
    """Build the fused tempered-MC + exchange step.

    The proposal machinery is shared across replicas (the VAE is
    temperature-independent); only the Metropolis criterion is tempered:
    log_acc = beta*(l2 - l1) + (reverse - forward).
    """

    def mc_phase(state: REMCState) -> REMCState:
        key, sub = jax.random.split(state.key)
        x1, l1 = state.configs, state.energies  # (R, C, D), (R, C)
        # Shared VAE-MH kernel (mcmc/engine.py), tempered per replica.
        x2, l2, accept = mh_propose(encoder_fn, prior_fn, decoder_fn,
                                    log_target_fn, x1, l1, sub,
                                    beta=state.betas[:, None])
        return state.replace(
            configs=jnp.where(accept[..., None], x2, x1),
            energies=jnp.where(accept, l2, l1),
            key=key,
            num_trials=state.num_trials.add(accept.size),
            num_acc=state.num_acc.add(jnp.sum(accept, dtype=jnp.int32)))

    def exchange_phase(state: REMCState) -> REMCState:
        R = state.configs.shape[0]
        if R < 2:
            return state
        key, k_u = jax.random.split(state.key)
        odd_phase = (state.step_index // exchange_every) % 2 == 1
        partner = _swap_partner_perm(R, odd_phase)  # (R,)

        l = state.energies  # (R, C)
        x = state.configs
        beta = state.betas
        l_p = jnp.take(l, partner, axis=0)
        x_p = jnp.take(x, partner, axis=0)
        beta_p = jnp.take(beta, partner, axis=0)

        # Pair-symmetric acceptance: (b_i - b_j)(l_j - l_i) is identical
        # from both sides; the shared uniform is indexed by the pair's
        # lower replica id so both partners draw the same number.
        delta = (beta[:, None] - beta_p[:, None]) * (l_p - l)
        u = jax.random.uniform(k_u, (R, l.shape[1]), minval=1e-38)
        pair_lo = jnp.minimum(jnp.arange(R), partner)
        u_pair = jnp.take(u, pair_lo, axis=0)
        has_partner = partner != jnp.arange(R)
        accept = (jnp.log(u_pair) <= delta) & has_partner[:, None]

        new_x = jnp.where(accept[..., None], x_p, x)
        new_l = jnp.where(accept, l_p, l)
        # Each attempted pair counts once (the two-sided counts are
        # even by pair symmetry; keep them exact integers).
        n_att = (jnp.sum(has_partner, dtype=jnp.int32) // 2) * l.shape[1]
        n_acc = jnp.sum(accept, dtype=jnp.int32) // 2
        return state.replace(
            configs=new_x, energies=new_l, key=key,
            num_swap_trials=state.num_swap_trials.add(n_att),
            num_swap_acc=state.num_swap_acc.add(n_acc))

    def step(state: REMCState) -> REMCState:
        state = mc_phase(state)
        do_swap = (state.step_index % exchange_every) == (exchange_every - 1)
        state = jax.lax.cond(do_swap, exchange_phase, lambda s: s, state)
        return state.replace(step_index=state.step_index + 1)

    return step


def run_remc(step_fn: Callable[[REMCState], REMCState], state: REMCState,
             n_steps: int) -> REMCState:
    def body(s, _):
        return step_fn(s), None

    state, _ = jax.lax.scan(body, state, None, length=n_steps)
    return state
