"""Grand-canonical (muVT) Monte Carlo: open-system sampling on device.

Beyond-reference capability (the reference engine is fixed-N NVT,
/root/reference/vaemolsim/mcmc.py): particle insertions and deletions
at fixed chemical potential — the ensemble behind adsorption isotherms,
phase coexistence, and open reservoirs (Frenkel & Smit ch. 5.6).

Variable particle number is the canonical "dynamic shapes" problem;
the TPU-native answer is a **fixed capacity with an active mask**:

* state is ``x (..., n_max, dim)`` + ``active (..., n_max)`` bool —
  static shapes, thousands of independent chains batched on the
  leading axes exactly like the NVT/NPT engines;
* every move needs only the tagged particle's interaction energy —
  one masked ``(n_max,)`` row of pair energies per chain (O(n_max)
  vector math, no N^2 recompute, no scatter);
* inactive slots hold coordinates that simply never enter any sum;
  insertion activates the first free slot (slot labels are
  exchangeable, so the choice of free slot does not affect detailed
  balance — the physical state is the multiset of active positions).

Acceptance (reduced units, thermal wavelength folded into ``mu`` so
the activity is ``z = exp(beta mu)``):

* insertion at a uniform position:  ``min(1, zV/(N+1) exp(-beta dU))``
* deletion of a uniform active particle: ``min(1, N/(zV) exp(-beta dU))``
* single-particle displacement: standard Metropolis.

Chains at full capacity reject insertions (an infinite-energy wall —
a valid constraint, but it truncates the N distribution: size
``n_max`` with headroom and check ``max(state.n)`` stays below it;
:func:`run_gcmc` reports the high-water mark when collecting).

The pair potential enters as ``pair_u(r2) -> energy`` on SQUARED
minimum-image distances (build the standard truncated-shifted LJ with
:func:`lj_pair_u` — exact parity with the dense
:func:`~vaemolsim_tpu.potentials.lennard_jones` factory is pinned by
test).  Validation: exact Poisson N-statistics for the ideal gas, and
a Widom-insertion chemical-potential round trip
(``tests/test_gcmc.py``).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from vaemolsim_tpu.mcmc.engine import Counter, _scan_unroll, log_uniform

Array = jax.Array

__all__ = ["GCMCState", "lj_pair_u", "gcmc_init", "make_gcmc_step",
           "run_gcmc", "total_energy"]

_EPS = 1e-12


def lj_pair_u(sigma: float = 1.0, epsilon: float = 1.0, *,
              cutoff: Optional[float] = None,
              shift: bool = True) -> Callable[[Array], Array]:
    """Truncated-shifted Lennard-Jones on squared distances, with the
    SAME float32 safety devices as the dense factory
    (:func:`vaemolsim_tpu.potentials.lennard_jones`): linear core below
    ``0.3 sigma`` (finite overlap forces) and a distance floor at exact
    coincidence.  Parity with the dense form is pinned by test."""
    sigma = float(sigma)
    epsilon = float(epsilon)

    def u(r2: Array) -> Array:
        r = jnp.sqrt(jnp.maximum(r2, _EPS))
        rc = 0.3 * sigma
        r_eff = jnp.maximum(r, rc)
        sr6 = (sigma / r_eff) ** 6
        val = 4.0 * epsilon * (sr6 * sr6 - sr6)
        src6 = (sigma / rc) ** 6
        slope = 24.0 * epsilon / rc * (src6 - 2.0 * src6 * src6)
        val = val + jnp.where(r < rc, slope * (r - rc), 0.0)
        if cutoff is not None:
            if shift:
                sc6 = (sigma / cutoff) ** 6
                val = val - 4.0 * epsilon * (sc6 * sc6 - sc6)
            val = jnp.where(r2 < cutoff * cutoff, val, 0.0)
        return val

    return u


@struct.dataclass
class GCMCState:
    """Carry of the scanned muVT loop (checkpointable pytree)."""

    x: Array       # (..., n_max, dim)
    active: Array  # (..., n_max) bool
    key: Array
    disp_trials: Counter
    disp_acc: Counter
    ins_trials: Counter
    ins_acc: Counter
    del_trials: Counter
    del_acc: Counter

    @property
    def n(self) -> Array:
        """Active-particle count per chain: (...,) int32."""
        return jnp.sum(self.active, axis=-1).astype(jnp.int32)

    @property
    def disp_acceptance_rate(self) -> Array:
        return self.disp_acc.to_float() / self.disp_trials.to_float()

    @property
    def exchange_acceptance_rate(self) -> Array:
        """Joint insert+delete acceptance rate."""
        acc = self.ins_acc.to_float() + self.del_acc.to_float()
        tri = self.ins_trials.to_float() + self.del_trials.to_float()
        return acc / tri


def _one_particle_energy(pair_u, x: Array, active: Array, pos: Array,
                         box: Array, exclude_idx: Array) -> Array:
    """Interaction energy of a tagged particle at ``pos (..., dim)``
    with every active particle except slot ``exclude_idx (...,)``:
    one masked (n_max,) reduction per chain."""
    d = pos[..., None, :] - x
    d = d - box * jnp.round(d / box)
    r2 = jnp.sum(d * d, axis=-1)                       # (..., n_max)
    slots = jnp.arange(x.shape[-2])
    m = active & (slots != exclude_idx[..., None])
    return jnp.sum(jnp.where(m, pair_u(r2), 0.0), axis=-1)


def total_energy(state: GCMCState, pair_u, box) -> Array:
    """Exact masked total energy U = sum_{i<j active} u(r_ij) per chain
    (observable; the sampler itself only ever uses single-particle
    rows)."""
    x, active = state.x, state.active
    box = jnp.asarray(box, x.dtype)
    d = x[..., :, None, :] - x[..., None, :, :]
    d = d - box * jnp.round(d / box)
    r2 = jnp.sum(d * d, axis=-1)
    n_max = x.shape[-2]
    pair = (active[..., :, None] & active[..., None, :]
            & jnp.triu(jnp.ones((n_max, n_max), bool), k=1))
    return jnp.sum(jnp.where(pair, pair_u(r2), 0.0), axis=(-2, -1))


def gcmc_init(x: Array, active: Array, key: Array) -> GCMCState:
    """``x`` (..., n_max, dim) slot coordinates (inactive slots may hold
    anything); ``active`` (..., n_max) bool."""
    return GCMCState(
        x=jnp.asarray(x), active=jnp.asarray(active, bool), key=key,
        disp_trials=Counter.zero(), disp_acc=Counter.zero(),
        ins_trials=Counter.zero(), ins_acc=Counter.zero(),
        del_trials=Counter.zero(), del_acc=Counter.zero())


def _random_active_index(key: Array, active: Array) -> Array:
    """Uniform index among active slots per chain ((...,) int32; 0 when
    none are active — callers must gate on n > 0)."""
    g = jax.random.gumbel(key, active.shape, jnp.float32)
    return jnp.argmax(jnp.where(active, g, -jnp.inf), axis=-1)


def _first_free_index(active: Array) -> Array:
    """Lowest inactive slot per chain (n_max-1 when full — callers gate
    on n < n_max)."""
    return jnp.argmin(active, axis=-1)


def make_gcmc_step(pair_u: Callable[[Array], Array], *,
                   box, mu, beta: float = 1.0,
                   dx_scale: float = 0.1, n_disp: int = 1
                   ) -> Callable[[GCMCState], GCMCState]:
    """Build one muVT sweep: ``n_disp`` single-particle displacement
    trials, then one exchange trial (insert or delete, p=1/2 each,
    chosen independently per chain).

    ``mu``: chemical potential in reduced units with the thermal
    wavelength absorbed (activity ``z = exp(beta mu)``; for an ideal
    gas ``<N> = zV`` — pinned by test).  A scalar, or an array
    broadcastable to the chain shape — per-chain chemical potentials
    put an ENTIRE adsorption isotherm in one compiled program
    (``examples/19_gcmc_isotherm.py``).  ``box``: per-dimension edge
    lengths (fixed — combine with NPT externally if needed).
    """
    beta = float(beta)
    mu = jnp.asarray(mu)
    if n_disp < 0:
        raise ValueError(f"n_disp must be >= 0; got {n_disp}")

    def step(state: GCMCState) -> GCMCState:
        x, active = state.x, state.active
        dtype = x.dtype
        box_arr = jnp.asarray(box, dtype)
        n_max, dim = x.shape[-2], x.shape[-1]
        chains = x.shape[:-2]
        n_chains = 1
        for s in chains:
            n_chains *= int(s)
        volume = jnp.prod(box_arr * jnp.ones((dim,), dtype))
        z = jnp.exp(beta * mu)
        key = state.key

        disp_acc_n = jnp.asarray(0, jnp.int32)
        disp_tri_n = jnp.asarray(0, jnp.int32)
        for _ in range(n_disp):
            key, k_pick, k_move, k_mh = jax.random.split(key, 4)
            n_act = jnp.sum(active, axis=-1)
            idx = _random_active_index(k_pick, active)
            old = jnp.take_along_axis(x, idx[..., None, None].repeat(
                dim, axis=-1), axis=-2)[..., 0, :]          # (..., dim)
            new = old + dx_scale * jax.random.normal(
                k_move, old.shape, dtype)
            du = (_one_particle_energy(pair_u, x, active, new, box_arr, idx)
                  - _one_particle_energy(pair_u, x, active, old, box_arr,
                                         idx))
            ok = (n_act > 0) & ((-beta * du)
                                >= log_uniform(k_mh, du.shape, du.dtype))
            upd = jnp.where(ok[..., None], new, old)
            x = _set_slot(x, idx, upd)
            disp_acc_n = disp_acc_n + jnp.sum(ok, dtype=jnp.int32)
            disp_tri_n = disp_tri_n + jnp.sum(n_act > 0, dtype=jnp.int32)

        # --- exchange: insert (p=1/2) or delete (p=1/2), per chain ---
        key, k_which, k_pos, k_pick, k_mh = jax.random.split(key, 5)
        n_act = jnp.sum(active, axis=-1).astype(dtype)
        do_insert = jax.random.bernoulli(k_which, 0.5, chains)

        # insertion candidate: uniform in the box, first free slot
        pos_ins = box_arr * jax.random.uniform(k_pos, chains + (dim,),
                                               dtype)
        slot_ins = _first_free_index(active)
        du_ins = _one_particle_energy(pair_u, x, active, pos_ins, box_arr,
                                      jnp.full(chains, n_max, jnp.int32))
        log_acc_ins = (jnp.log(z * volume) - jnp.log1p(n_act)
                       - beta * du_ins)
        log_acc_ins = jnp.where(jnp.all(active, axis=-1), -jnp.inf,
                                log_acc_ins)  # capacity wall

        # deletion candidate: uniform among active
        slot_del = _random_active_index(k_pick, active)
        pos_del = jnp.take_along_axis(x, slot_del[..., None, None].repeat(
            dim, axis=-1), axis=-2)[..., 0, :]
        du_del = -_one_particle_energy(pair_u, x, active, pos_del, box_arr,
                                       slot_del)
        log_acc_del = (jnp.log(jnp.maximum(n_act, 1.0))
                       - jnp.log(z * volume) - beta * du_del)
        log_acc_del = jnp.where(n_act < 0.5, -jnp.inf, log_acc_del)

        log_acc = jnp.where(do_insert, log_acc_ins, log_acc_del)
        ok = log_acc >= log_uniform(k_mh, log_acc.shape, dtype)

        slot = jnp.where(do_insert, slot_ins, slot_del)
        onehot = (jnp.arange(n_max) == slot[..., None])     # (..., n_max)
        active2 = jnp.where(onehot, do_insert[..., None], active)
        active = jnp.where(ok[..., None], active2, active)
        x = jnp.where((ok & do_insert)[..., None, None] & onehot[..., None],
                      pos_ins[..., None, :], x)

        ins = ok & do_insert
        dele = ok & ~do_insert
        return GCMCState(
            x=x, active=active, key=key,
            disp_trials=state.disp_trials.add(disp_tri_n),
            disp_acc=state.disp_acc.add(disp_acc_n),
            ins_trials=state.ins_trials.add(
                jnp.sum(do_insert, dtype=jnp.int32)),
            ins_acc=state.ins_acc.add(jnp.sum(ins, dtype=jnp.int32)),
            del_trials=state.del_trials.add(
                jnp.sum(~do_insert, dtype=jnp.int32)),
            del_acc=state.del_acc.add(jnp.sum(dele, dtype=jnp.int32)))

    return step


def _set_slot(x: Array, idx: Array, value: Array) -> Array:
    """Write ``value (..., dim)`` into slot ``idx (...,)`` of
    ``x (..., n_max, dim)`` without scatter: a one-hot blend."""
    onehot = (jnp.arange(x.shape[-2]) == idx[..., None])[..., None]
    return jnp.where(onehot, value[..., None, :], x)


def run_gcmc(step_fn: Callable[[GCMCState], GCMCState], state: GCMCState,
             n_steps: int, collect_every: int = 0, unroll: int = 4
             ) -> Tuple[GCMCState, Optional[Array]]:
    """Scan ``n_steps`` muVT sweeps on device.  With
    ``collect_every=k > 0`` also returns the per-chain particle counts
    of every k-th sweep, shape ``(n_steps//k, ...)`` int32 (the N
    trajectory — the primary muVT observable)."""
    if collect_every and n_steps % collect_every:
        raise ValueError(f"collect_every={collect_every} must divide "
                         f"n_steps={n_steps}")

    if not collect_every:
        def body(s, _):
            return step_fn(s), None

        state, _ = jax.lax.scan(body, state, None, length=n_steps,
                                unroll=_scan_unroll(n_steps, unroll))
        return state, None

    def outer(s, _):
        def body(s2, _):
            return step_fn(s2), None

        s, _ = jax.lax.scan(body, s, None, length=collect_every,
                            unroll=_scan_unroll(collect_every, unroll))
        return s, s.n

    state, ns = jax.lax.scan(outer, state, None,
                             length=n_steps // collect_every)
    return state, ns
