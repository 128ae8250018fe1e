"""Gibbs-ensemble Monte Carlo: direct phase coexistence on device.

Beyond-reference capability: two coupled simulation boxes exchanging
volume and particles at fixed total N, V, T (Panagiotopoulos 1987;
Frenkel & Smit ch. 8) — the classic route to vapor-liquid coexistence
WITHOUT an interface: below the critical point the boxes spontaneously
specialize into the two phases, and their densities are the binodal.

TPU design mirrors :mod:`vaemolsim_tpu.mcmc.gcmc`: each box is a
fixed-capacity slot array with an active mask (static shapes), both
boxes batch over a leading chain axis (hundreds of independent
coexistence estimates as one compiled scan), and every transfer costs
two masked ``(n_max,)`` pair-energy rows.  Volume exchange rescales all
particles, so it re-evaluates both boxes' total energies — one masked
O(n_max^2) pass each, once per sweep.

Moves per sweep (per chain):

* ``n_disp`` single-particle displacements in each box (Metropolis);
* one volume exchange: a Gaussian step in ``ln(V_A/V_B)`` at fixed
  ``V_A + V_B``; cubic boxes rescale isotropically; acceptance
  ``exp(-b dU_A - b dU_B + (N_A+1) ln(V_A'/V_A) + (N_B+1) ln(V_B'/V_B))``
  (the ln-volume-sampling Jacobian, same convention as
  :mod:`vaemolsim_tpu.mcmc.npt`);
* one particle transfer: direction A->B or B->A with p=1/2; a uniform
  active particle of the source is re-inserted uniformly in the
  destination, accepted with
  ``min(1, N_src V_dst / ((N_dst + 1) V_src) exp(-b dU))``.

Validation (``tests/test_gibbs.py``): exact Binomial N-partitioning
for the ideal gas at fixed volumes, ideal-gas density equalization
under volume moves, energy bookkeeping parity, and — in
``examples/21_gibbs_coexistence.py`` — LJ vapor-liquid coexistence
with equal-chemical-potential cross-validation via Widom insertion in
BOTH phases.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from vaemolsim_tpu.mcmc.engine import Counter, _scan_unroll, log_uniform
from vaemolsim_tpu.mcmc.gcmc import (_first_free_index, _one_particle_energy,
                                     _random_active_index, _set_slot)

Array = jax.Array

__all__ = ["GibbsState", "gibbs_init", "make_gibbs_step", "run_gibbs"]


@struct.dataclass
class GibbsState:
    """Carry of the scanned Gibbs-ensemble loop (checkpointable pytree).

    Boxes are cubic: ``box_a``/``box_b`` are per-chain EDGE LENGTHS
    ``(...,)``; coordinates live in ``[0, L)^dim`` of their own box.
    """

    x_a: Array       # (..., n_max, dim)
    act_a: Array     # (..., n_max) bool
    x_b: Array
    act_b: Array
    box_a: Array     # (...,) edge length
    box_b: Array
    key: Array
    disp_trials: Counter
    disp_acc: Counter
    vol_trials: Counter
    vol_acc: Counter
    xfer_trials: Counter
    xfer_acc: Counter

    @property
    def n_a(self) -> Array:
        return jnp.sum(self.act_a, axis=-1).astype(jnp.int32)

    @property
    def n_b(self) -> Array:
        return jnp.sum(self.act_b, axis=-1).astype(jnp.int32)

    @property
    def rho_a(self) -> Array:
        dim = self.x_a.shape[-1]
        return self.n_a / self.box_a ** dim

    @property
    def rho_b(self) -> Array:
        dim = self.x_b.shape[-1]
        return self.n_b / self.box_b ** dim

    @property
    def disp_acceptance_rate(self) -> Array:
        return self.disp_acc.to_float() / self.disp_trials.to_float()

    @property
    def vol_acceptance_rate(self) -> Array:
        return self.vol_acc.to_float() / self.vol_trials.to_float()

    @property
    def xfer_acceptance_rate(self) -> Array:
        return self.xfer_acc.to_float() / self.xfer_trials.to_float()


def gibbs_init(x_a: Array, act_a: Array, x_b: Array, act_b: Array,
               box_a, box_b, key: Array) -> GibbsState:
    x_a = jnp.asarray(x_a)
    chains = x_a.shape[:-2]
    return GibbsState(
        x_a=x_a, act_a=jnp.asarray(act_a, bool),
        x_b=jnp.asarray(x_b), act_b=jnp.asarray(act_b, bool),
        box_a=jnp.broadcast_to(jnp.asarray(box_a, x_a.dtype), chains),
        box_b=jnp.broadcast_to(jnp.asarray(box_b, x_a.dtype), chains),
        key=key,
        disp_trials=Counter.zero(), disp_acc=Counter.zero(),
        vol_trials=Counter.zero(), vol_acc=Counter.zero(),
        xfer_trials=Counter.zero(), xfer_acc=Counter.zero())


def _box_energy(pair_u, x: Array, active: Array, box_l: Array) -> Array:
    """Masked total energy of one box with per-chain edge length."""
    d = x[..., :, None, :] - x[..., None, :, :]
    b = box_l[..., None, None, None]
    d = d - b * jnp.round(d / b)
    r2 = jnp.sum(d * d, axis=-1)
    n_max = x.shape[-2]
    import numpy as _np
    tri = jnp.asarray(_np.triu(_np.ones((n_max, n_max), bool), k=1))
    pair = active[..., :, None] & active[..., None, :] & tri
    return jnp.sum(jnp.where(pair, pair_u(r2), 0.0), axis=(-2, -1))


def make_gibbs_step(pair_u: Callable[[Array], Array], *,
                    beta: float = 1.0, dx_scale: float = 0.1,
                    dlnv_scale: float = 0.05, n_disp: int = 1,
                    min_box: Optional[float] = None
                    ) -> Callable[[GibbsState], GibbsState]:
    """Build one Gibbs-ensemble sweep (see module docstring).

    ``min_box``: reject volume exchanges that shrink either box's edge
    below it — REQUIRED for truncated pair potentials (set to
    ``2 * cutoff`` to keep minimum-image validity, exactly like
    :func:`vaemolsim_tpu.mcmc.npt.make_npt_step`).
    """
    beta = float(beta)

    def one_box_disp(key, x, act, box_l):
        k_pick, k_move, k_mh = jax.random.split(key, 3)
        dim = x.shape[-1]
        n_act = jnp.sum(act, axis=-1)
        idx = _random_active_index(k_pick, act)
        old = jnp.take_along_axis(
            x, idx[..., None, None].repeat(dim, -1), axis=-2)[..., 0, :]
        new = old + dx_scale * jax.random.normal(k_move, old.shape, x.dtype)
        box_vec = box_l[..., None, None]
        du = (_one_particle_energy(pair_u, x, act, new, box_vec, idx)
              - _one_particle_energy(pair_u, x, act, old, box_vec, idx))
        ok = (n_act > 0) & ((-beta * du)
                            >= log_uniform(k_mh, du.shape, du.dtype))
        x = _set_slot(x, idx, jnp.where(ok[..., None], new, old))
        return x, jnp.sum(ok, dtype=jnp.int32), \
            jnp.sum(n_act > 0, dtype=jnp.int32)

    def step(state: GibbsState) -> GibbsState:
        x_a, act_a = state.x_a, state.act_a
        x_b, act_b = state.x_b, state.act_b
        dtype = x_a.dtype
        dim = x_a.shape[-1]
        chains = x_a.shape[:-2]
        n_chains = 1
        for s in chains:
            n_chains *= int(s)
        key = state.key

        disp_acc_n = jnp.asarray(0, jnp.int32)
        disp_tri_n = jnp.asarray(0, jnp.int32)
        for _ in range(n_disp):
            key, ka, kb = jax.random.split(key, 3)
            x_a, na, ta = one_box_disp(ka, x_a, act_a, state.box_a)
            x_b, nb, tb = one_box_disp(kb, x_b, act_b, state.box_b)
            disp_acc_n = disp_acc_n + na + nb
            disp_tri_n = disp_tri_n + ta + tb

        # --- volume exchange at fixed V_A + V_B (step in ln(V_A/V_B)) ---
        key, k_v, k_vmh = jax.random.split(key, 3)
        v_a = state.box_a ** dim
        v_b = state.box_b ** dim
        v_tot = v_a + v_b
        dl = dlnv_scale * jax.random.normal(k_v, v_a.shape, dtype)
        # new V_A from ln-ratio step: r' = (V_A/V_B) e^dl
        r_new = (v_a / v_b) * jnp.exp(dl)
        v_a2 = v_tot * r_new / (1.0 + r_new)
        v_b2 = v_tot - v_a2
        box_a2 = v_a2 ** (1.0 / dim)
        box_b2 = v_b2 ** (1.0 / dim)
        sa = (box_a2 / state.box_a)[..., None, None]
        sb = (box_b2 / state.box_b)[..., None, None]
        e_a1 = _box_energy(pair_u, x_a, act_a, state.box_a)
        e_b1 = _box_energy(pair_u, x_b, act_b, state.box_b)
        e_a2 = _box_energy(pair_u, x_a * sa, act_a, box_a2)
        e_b2 = _box_energy(pair_u, x_b * sb, act_b, box_b2)
        n_a = jnp.sum(act_a, axis=-1).astype(dtype)
        n_b = jnp.sum(act_b, axis=-1).astype(dtype)
        log_acc = (-beta * (e_a2 - e_a1) - beta * (e_b2 - e_b1)
                   + (n_a + 1.0) * jnp.log(v_a2 / v_a)
                   + (n_b + 1.0) * jnp.log(v_b2 / v_b))
        if min_box is not None:
            log_acc = jnp.where(
                jnp.minimum(box_a2, box_b2) < float(min_box),
                -jnp.inf, log_acc)
        okv = log_acc >= log_uniform(k_vmh, log_acc.shape, dtype)
        x_a = jnp.where(okv[..., None, None], x_a * sa, x_a)
        x_b = jnp.where(okv[..., None, None], x_b * sb, x_b)
        box_a = jnp.where(okv, box_a2, state.box_a)
        box_b = jnp.where(okv, box_b2, state.box_b)

        # --- particle transfer (A->B or B->A, p=1/2 per chain) ---
        key, k_dir, k_pick_a, k_pick_b, k_pos, k_xmh = jax.random.split(
            key, 6)
        a_to_b = jax.random.bernoulli(k_dir, 0.5, chains)
        v_a = box_a ** dim
        v_b = box_b ** dim
        n_a = jnp.sum(act_a, axis=-1).astype(dtype)
        n_b = jnp.sum(act_b, axis=-1).astype(dtype)

        # source removal candidates
        idx_a = _random_active_index(k_pick_a, act_a)
        idx_b = _random_active_index(k_pick_b, act_b)
        pos_a = jnp.take_along_axis(
            x_a, idx_a[..., None, None].repeat(dim, -1), -2)[..., 0, :]
        pos_b = jnp.take_along_axis(
            x_b, idx_b[..., None, None].repeat(dim, -1), -2)[..., 0, :]
        du_rm_a = -_one_particle_energy(pair_u, x_a, act_a, pos_a,
                                        box_a[..., None, None], idx_a)
        du_rm_b = -_one_particle_energy(pair_u, x_b, act_b, pos_b,
                                        box_b[..., None, None], idx_b)

        # destination insertion candidates (uniform in the dest box)
        uni = jax.random.uniform(k_pos, chains + (dim,), dtype)
        ins_in_b = uni * box_b[..., None]
        ins_in_a = uni * box_a[..., None]
        no_excl = jnp.full(chains, x_a.shape[-2], jnp.int32)
        du_in_b = _one_particle_energy(pair_u, x_b, act_b, ins_in_b,
                                       box_b[..., None, None], no_excl)
        du_in_a = _one_particle_energy(pair_u, x_a, act_a, ins_in_a,
                                       box_a[..., None, None], no_excl)

        log_acc_ab = (jnp.log(jnp.maximum(n_a, 1.0) * v_b)
                      - jnp.log((n_b + 1.0) * v_a)
                      - beta * (du_in_b + du_rm_a))
        log_acc_ba = (jnp.log(jnp.maximum(n_b, 1.0) * v_a)
                      - jnp.log((n_a + 1.0) * v_b)
                      - beta * (du_in_a + du_rm_b))
        # walls: empty source, full destination
        cap_b = jnp.all(act_b, axis=-1)
        cap_a = jnp.all(act_a, axis=-1)
        log_acc_ab = jnp.where((n_a < 0.5) | cap_b, -jnp.inf, log_acc_ab)
        log_acc_ba = jnp.where((n_b < 0.5) | cap_a, -jnp.inf, log_acc_ba)
        log_acc_x = jnp.where(a_to_b, log_acc_ab, log_acc_ba)
        okx = log_acc_x >= log_uniform(k_xmh, log_acc_x.shape, dtype)

        # apply A->B where ok & a_to_b
        n_max = x_a.shape[-2]
        slots = jnp.arange(n_max)
        rm_a = okx & a_to_b
        rm_b = okx & ~a_to_b
        oh_rm_a = slots == idx_a[..., None]
        oh_rm_b = slots == idx_b[..., None]
        ins_slot_b = _first_free_index(act_b)
        ins_slot_a = _first_free_index(act_a)
        oh_in_b = slots == ins_slot_b[..., None]
        oh_in_a = slots == ins_slot_a[..., None]

        act_a2 = act_a & ~(oh_rm_a & rm_a[..., None])
        act_b2 = act_b & ~(oh_rm_b & rm_b[..., None])
        act_a2 = act_a2 | (oh_in_a & rm_b[..., None])
        act_b2 = act_b2 | (oh_in_b & rm_a[..., None])
        x_b = jnp.where((rm_a[..., None] & oh_in_b)[..., None],
                        ins_in_b[..., None, :], x_b)
        x_a = jnp.where((rm_b[..., None] & oh_in_a)[..., None],
                        ins_in_a[..., None, :], x_a)

        return GibbsState(
            x_a=x_a, act_a=act_a2, x_b=x_b, act_b=act_b2,
            box_a=box_a, box_b=box_b, key=key,
            disp_trials=state.disp_trials.add(disp_tri_n),
            disp_acc=state.disp_acc.add(disp_acc_n),
            vol_trials=state.vol_trials.add(n_chains),
            vol_acc=state.vol_acc.add(jnp.sum(okv, dtype=jnp.int32)),
            xfer_trials=state.xfer_trials.add(n_chains),
            xfer_acc=state.xfer_acc.add(jnp.sum(okx, dtype=jnp.int32)))

    return step


def run_gibbs(step_fn: Callable[[GibbsState], GibbsState],
              state: GibbsState, n_steps: int, collect_every: int = 0,
              unroll: int = 2
              ) -> Tuple[GibbsState, Optional[Tuple[Array, Array]]]:
    """Scan ``n_steps`` Gibbs sweeps.  With ``collect_every=k > 0`` also
    returns ``(rho_a, rho_b)`` densities of every k-th sweep, shapes
    ``(n_steps//k, ...)`` — the coexistence observables."""
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
        return s, (s.rho_a, s.rho_b)

    state, rhos = jax.lax.scan(outer, state, None,
                               length=n_steps // collect_every)
    return state, rhos
