"""Hamiltonian replica exchange (lambda exchange / HREX).

Generalizes parallel tempering (:mod:`vaemolsim_tpu.parallel.replica`)
from a temperature ladder to ANY family of reduced log densities
``log pi(x; lam)`` — the standard driver for alchemical ladders
(:func:`~vaemolsim_tpu.potentials.lennard_jones_softcore`), umbrella
ladders, or any smoothness parameter.  R replicas, each holding C
independent chains, run local MC at their own ``lam`` (the production
random-walk/MALA/HMC trial kernel, ``mcmc.moves._scaled_trial``, with
optional per-replica scales — optimal step sizes vary along the
ladder); every ``exchange_every`` steps adjacent replicas attempt the
pair-symmetric Hamiltonian swap

    A = min(1, exp([l(x_i; lam_j) + l(x_j; lam_i)]
                   - [l(x_i; lam_i) + l(x_j; lam_j)]))

alternating even/odd pairings.  The two cross terms are ONE extra
batched density evaluation per exchange (each replica evaluates its own
configuration at its partner's lambda; the partner's cross term arrives
by the same static partner gather as the swap itself) — in the global
view the swap is a permutation + where-select, which XLA lowers to a
collective-permute over ICI when the replica axis is sharded.

Temperature REMC falls out as the special case
``log_prob_fn(x, lam) = lam * l(x)`` (lam = beta), but the dedicated
:mod:`~vaemolsim_tpu.parallel.replica` kernel stays preferable there:
tempering needs no cross evaluations (the swap factorizes through the
untempered ``l``), while the general Hamiltonian swap cannot avoid
them.

Free energies along the ladder come from the samples, not the swap:
collect configurations with ``run_hrex(..., collect_every=...)``,
cross-evaluate ``log_prob_fn`` at all lambdas for
:func:`~vaemolsim_tpu.mcmc.free_energy.mbar_from_samples`, or feed
``d log pi/d lam`` draws to
:func:`~vaemolsim_tpu.mcmc.free_energy.ti_free_energy`.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from vaemolsim_tpu.mcmc.engine import Counter
from vaemolsim_tpu.mcmc.moves import _scaled_trial
from vaemolsim_tpu.parallel.replica import _swap_partner_perm

Array = jax.Array

__all__ = ["HREXState", "make_hrex_step", "run_hrex"]


@struct.dataclass
class HREXState:
    """State of R lambda-replicas x C chains.  ``energies`` stores each
    chain's reduced log density AT ITS OWN lambda (unlike tempering
    there is no useful untempered quantity to carry)."""

    configs: Array       # (R, C, *event)
    energies: Array      # (R, C)  log pi(x; lam_own)
    lambdas: Array       # (R,)
    key: Array
    step_index: Array    # () int32, drives even/odd pairing
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
    def create(cls, configs: Array, log_prob_fn, lambdas, key
               ) -> "HREXState":
        """``configs``: (R, C, *event); ``log_prob_fn(x, lam)`` must be
        vectorized over leading axes of ``x`` with ``lam`` broadcasting
        against the (R, C) energy shape (write it with plain jnp
        broadcasting and it is)."""
        configs = jnp.asarray(configs)
        lambdas = jnp.asarray(lambdas)
        if lambdas.ndim != 1 or lambdas.shape[0] != configs.shape[0]:
            raise ValueError(
                f"lambdas must be ({configs.shape[0]},) to match the "
                f"replica axis of configs {configs.shape}; got "
                f"{lambdas.shape}")
        energies = log_prob_fn(configs, lambdas[:, None])
        if energies.shape != configs.shape[:2]:
            raise ValueError(
                f"log_prob_fn returned {energies.shape}; expected the "
                f"(R, C) = {configs.shape[:2]} energy shape")
        return cls(configs=configs, energies=energies, lambdas=lambdas,
                   key=key, step_index=jnp.asarray(0, jnp.int32),
                   num_trials=Counter.zero(), num_acc=Counter.zero(),
                   num_swap_trials=Counter.zero(),
                   num_swap_acc=Counter.zero())


def make_hrex_step(log_prob_fn: Callable[[Array, Array], Array],
                   *, kind: str = "random_walk", scale=0.1,
                   n_leapfrog: int = 10, exchange_every: int = 1
                   ) -> Callable[[HREXState], HREXState]:
    """Build the fused local-move + Hamiltonian-exchange step.

    ``scale`` may be a scalar or per-replica ``(R,)`` (ladder ends often
    want different step sizes; tune each rung with
    :func:`~vaemolsim_tpu.mcmc.moves.tune_scale` on a fixed-lambda
    closure and pass the vector).
    """
    exchange_every = int(exchange_every)
    if exchange_every < 1:
        raise ValueError("exchange_every must be >= 1")

    def mc_phase(state: HREXState) -> HREXState:
        key, sub = jax.random.split(state.key)
        lam_col = state.lambdas[:, None]
        event_ndim = state.configs.ndim - 2
        s = jnp.asarray(scale, state.configs.dtype)
        if s.ndim == 1:
            s = s.reshape(s.shape[0], *([1] * (1 + event_ndim)))
        x, e, accept = _scaled_trial(
            kind, lambda x: log_prob_fn(x, lam_col),
            state.configs, state.energies, s, sub, n_leapfrog=n_leapfrog)
        return state.replace(
            configs=x, energies=e, key=key,
            num_trials=state.num_trials.add(accept.size),
            num_acc=state.num_acc.add(jnp.sum(accept, dtype=jnp.int32)))

    def exchange_phase(state: HREXState) -> HREXState:
        r = state.configs.shape[0]
        if r < 2:
            return state
        key, k_u = jax.random.split(state.key)
        odd_phase = (state.step_index // exchange_every) % 2 == 1
        partner = _swap_partner_perm(r, odd_phase)  # (R,)

        x, e, lam = state.configs, state.energies, state.lambdas
        lam_p = jnp.take(lam, partner, axis=0)
        # Own configuration at the PARTNER's lambda — the one extra
        # batched evaluation the Hamiltonian swap costs.
        e_cross = log_prob_fn(x, lam_p[:, None])          # (R, C)
        e_p = jnp.take(e, partner, axis=0)
        e_cross_p = jnp.take(e_cross, partner, axis=0)    # l(x_j; lam_i)
        x_p = jnp.take(x, partner, axis=0)

        # Pair-symmetric: delta_i == delta_j by construction; the shared
        # uniform is indexed by the pair's lower replica id so both
        # partners draw the same number and decide identically.
        delta = (e_cross + e_cross_p) - (e + e_p)
        u = jax.random.uniform(k_u, e.shape, minval=1e-38)
        pair_lo = jnp.minimum(jnp.arange(r), partner)
        u_pair = jnp.take(u, pair_lo, axis=0)
        has_partner = partner != jnp.arange(r)
        accept = (jnp.log(u_pair) <= delta) & has_partner[:, None]

        new_x = jnp.where(accept[(...,) + (None,) * (x.ndim - 2)], x_p, x)
        # Incoming config x_j at MY lambda is exactly the partner's
        # cross term — no third evaluation.
        new_e = jnp.where(accept, e_cross_p, e)
        n_att = (jnp.sum(has_partner, dtype=jnp.int32) // 2) * e.shape[1]
        n_acc = jnp.sum(accept, dtype=jnp.int32) // 2
        return state.replace(
            configs=new_x, energies=new_e, key=key,
            num_swap_trials=state.num_swap_trials.add(n_att),
            num_swap_acc=state.num_swap_acc.add(n_acc))

    def step(state: HREXState) -> HREXState:
        state = mc_phase(state)
        do_swap = (state.step_index % exchange_every) == (exchange_every - 1)
        state = jax.lax.cond(do_swap, exchange_phase, lambda s: s, state)
        return state.replace(step_index=state.step_index + 1)

    return step


def run_hrex(step_fn: Callable[[HREXState], HREXState], state: HREXState,
             n_steps: int, *, collect_every: Optional[int] = None
             ) -> Tuple[HREXState, Optional[Array]]:
    """Scan ``n_steps`` HREX steps.  With ``collect_every=k`` also
    stacks every k-th post-step configuration into a
    ``(n_steps // k, R, C, *event)`` sample block (for MBAR
    cross-evaluation or TI derivatives); None collects nothing."""
    if collect_every is None:
        def body(s, _):
            return step_fn(s), None

        state, _ = jax.lax.scan(body, state, None, length=n_steps)
        return state, None
    k = int(collect_every)
    if k < 1 or n_steps % k:
        raise ValueError(f"collect_every={k} must be >= 1 and divide "
                         f"n_steps={n_steps}")

    def chunk(s, _):
        def body(s2, _):
            return step_fn(s2), None

        s, _ = jax.lax.scan(body, s, None, length=k)
        return s, s.configs

    state, samples = jax.lax.scan(chunk, state, None, length=n_steps // k)
    return state, samples
