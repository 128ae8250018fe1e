"""Replica-exchange molecular dynamics (parallel tempering for MD).

The MD counterpart of :mod:`vaemolsim_tpu.parallel.replica` (which
tempers the VAE-proposal MC engine): ``R`` temperature replicas each
run Langevin (BAOAB) dynamics at their own ``kT_r = 1/beta_r``, and
every ``md_steps_per_exchange`` steps adjacent replicas attempt the
standard parallel-tempering swap

    A = min(1, exp((beta_i - beta_j) (U_i - U_j)))

on their *potential* energies, alternating even/odd pairings.  Accepted
swaps exchange positions and forces and carry velocities across with
the exact rescale ``v -> v * sqrt(beta_from / beta_to)`` so the
Maxwell-Boltzmann marginal at the receiving temperature is preserved
(the momentum part of the extended-ensemble target cancels from the
acceptance, which is why only potential energies appear).

Beyond-reference capability (the reference has no MD at all,
/root/reference/vaemolsim/mcmc.py is its only sampler); TPU-first like
the REMC engine: the whole R-replica ladder (each replica holding an
arbitrary batch of walkers) is ONE compiled scan, the swap is a static
partner permutation + where-select that XLA lowers to a
collective-permute over ICI when the replica axis is sharded over a
mesh, and no step ever leaves the device.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from vaemolsim_tpu.mcmc.engine import Counter, log_uniform
from vaemolsim_tpu.md import MDState, _force_fn, _masses_arr
from vaemolsim_tpu.parallel.replica import _swap_partner_perm

Array = jax.Array

__all__ = ["REMDState", "make_remd_step", "run_remd"]


@struct.dataclass
class REMDState:
    """R replicas of MD state.  ``x``/``v``/``force`` have shape
    ``(R, *batch, n_atoms, dim)`` (any walker batch per replica,
    including none); ``energies`` holds the *potential* energies
    ``U(x)`` of shape ``(R, *batch)``."""

    x: Array
    v: Array
    force: Array
    energies: Array
    betas: Array  # (R,)
    key: Array
    exchange_index: Array  # () int32, drives even/odd pairing
    num_swap_trials: Counter
    num_swap_acc: Counter

    @property
    def swap_acceptance_rate(self) -> Array:
        return (self.num_swap_acc.to_float()
                / jnp.maximum(self.num_swap_trials.to_float(), 1.0))

    @classmethod
    def create(cls, potential: Callable[[Array], Array], x: Array,
               betas: Array, key: Array,
               v: Optional[Array] = None, masses=1.0) -> "REMDState":
        """Initialize the ladder; absent ``v``, velocities are drawn
        from Maxwell-Boltzmann at each replica's own temperature."""
        x = jnp.asarray(x)
        betas = jnp.asarray(betas, x.dtype)
        R = x.shape[0]
        if betas.shape != (R,):
            raise ValueError(f"betas must be shape ({R},) to match the "
                             f"leading replica axis of x, got {betas.shape}")
        key, k_v = jax.random.split(jnp.asarray(key))
        if v is None:
            m = _masses_arr(masses, x)
            kT = (1.0 / betas).reshape((R,) + (1,) * (x.ndim - 1))
            v = jnp.sqrt(kT / m) * jax.random.normal(k_v, x.shape, x.dtype)
        e, f = _force_fn(potential)(x)
        return cls(x=x, v=jnp.asarray(v), force=f, energies=e,
                   betas=betas, key=key,
                   exchange_index=jnp.asarray(0, jnp.int32),
                   num_swap_trials=Counter.zero(),
                   num_swap_acc=Counter.zero())


def make_remd_step(potential: Callable[[Array], Array], *,
                   dt: float, friction: float = 1.0, masses=1.0,
                   md_steps_per_exchange: int = 10
                   ) -> Callable[[REMDState], REMDState]:
    """Build the fused (MD sweep + exchange) step: one call advances
    every replica ``md_steps_per_exchange`` BAOAB steps at its own
    temperature, then attempts one round of adjacent swaps."""
    force = _force_fn(potential)

    def md_phase(state: REMDState) -> REMDState:
        m = _masses_arr(masses, state.x)
        dt_ = jnp.asarray(dt, state.x.dtype)
        # Per-replica kT broadcast against (R, *batch, n_atoms, dim).
        kT = (1.0 / state.betas).reshape(
            (state.betas.shape[0],) + (1,) * (state.x.ndim - 1))
        c1 = jnp.exp(-friction * dt_)
        c2 = jnp.sqrt(kT * (1.0 - c1 * c1) / m)

        def one(carry, k):
            s, _ = carry
            v = s.v + 0.5 * dt_ * s.force / m                     # B
            x = s.x + 0.5 * dt_ * v                               # A
            v = c1 * v + c2 * jax.random.normal(k, v.shape, v.dtype)  # O
            x = x + 0.5 * dt_ * v                                 # A
            # The closing force evaluation also yields the energy at
            # the final positions — carried out for the swap criterion
            # (no redundant re-evaluation after the sweep).
            e, f = force(x)
            v = v + 0.5 * dt_ * f / m                             # B
            return (MDState(x=x, v=v, force=f), e), None

        key, sub = jax.random.split(state.key)
        (md, e), _ = jax.lax.scan(
            one,
            (MDState(x=state.x, v=state.v, force=state.force),
             state.energies),
            jax.random.split(sub, md_steps_per_exchange))
        return state.replace(x=md.x, v=md.v, force=md.force,
                             energies=e, key=key)

    def exchange_phase(state: REMDState) -> REMDState:
        R = state.x.shape[0]
        if R < 2:
            return state.replace(exchange_index=state.exchange_index + 1)
        key, k_u = jax.random.split(state.key)
        odd_phase = state.exchange_index % 2 == 1
        partner = _swap_partner_perm(R, odd_phase)  # (R,)
        idx = jnp.arange(R)

        u_shape = state.energies.shape  # (R, *batch)
        e = state.energies
        beta = state.betas
        e_p = jnp.take(e, partner, axis=0)
        bcast = (R,) + (1,) * (e.ndim - 1)
        beta_r = beta.reshape(bcast)
        beta_p = jnp.take(beta, partner, axis=0).reshape(bcast)

        # A = min(1, exp((b_i - b_j)(U_i - U_j))) — pair-symmetric; the
        # shared uniform is indexed by the pair's lower replica id so
        # both partners decide identically.
        delta = (beta_r - beta_p) * (e - e_p)
        lu = log_uniform(k_u, u_shape, e.dtype)
        pair_lo = jnp.minimum(idx, partner)
        u_pair = jnp.take(lu, pair_lo, axis=0)
        has_partner = partner != idx
        accept = ((u_pair <= delta)
                  & has_partner.reshape(bcast))

        acc_x = accept.reshape(accept.shape + (1,) * (state.x.ndim
                                                      - accept.ndim))
        x_p = jnp.take(state.x, partner, axis=0)
        f_p = jnp.take(state.force, partner, axis=0)
        v_p = jnp.take(state.v, partner, axis=0)
        # Receiving replica i takes the partner's velocities rescaled
        # from T_p to T_i: v' = v_p * sqrt(T_i / T_p) = sqrt(b_p / b_i).
        scale = jnp.sqrt(beta_p / beta_r).reshape(
            bcast + (1,) * (state.x.ndim - e.ndim))
        new_x = jnp.where(acc_x, x_p, state.x)
        new_v = jnp.where(acc_x, v_p * scale, state.v)
        new_f = jnp.where(acc_x, f_p, state.force)
        new_e = jnp.where(accept, e_p, e)

        n_att = ((jnp.sum(has_partner, dtype=jnp.int32) // 2)
                 * int(jnp.size(e) // R))
        n_acc = jnp.sum(accept, dtype=jnp.int32) // 2
        return state.replace(
            x=new_x, v=new_v, force=new_f, energies=new_e, key=key,
            exchange_index=state.exchange_index + 1,
            num_swap_trials=state.num_swap_trials.add(n_att),
            num_swap_acc=state.num_swap_acc.add(n_acc))

    def step(state: REMDState) -> REMDState:
        return exchange_phase(md_phase(state))

    return step


def run_remd(step_fn: Callable[[REMDState], REMDState], state: REMDState,
             n_rounds: int, *, collect_every: int = 0
             ) -> Tuple[REMDState, Optional[Array]]:
    """Scan ``n_rounds`` (MD sweep + exchange) rounds.  With
    ``collect_every = k > 0``, also returns the stacked positions after
    every k-th round, shape ``(n_rounds // k, R, *batch, n_atoms, dim)``
    (collection granularity is a round, i.e. ``md_steps_per_exchange``
    MD steps)."""
    from vaemolsim_tpu.utils.scan import scan_collect
    return scan_collect(step_fn, state, n_rounds,
                        collect_every=collect_every,
                        snapshot_fn=lambda s: s.x)
