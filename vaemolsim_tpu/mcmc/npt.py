"""Isothermal-isobaric (NPT) Monte Carlo: volume moves on device.

Beyond-reference capability (the reference engine is fixed-geometry
NVT, /root/reference/vaemolsim/mcmc.py): constant-pressure sampling by
the standard two-move scheme (Frenkel & Smit ch. 5.4) —

- **displacement move**: all-atom Gaussian random walk at fixed box,
  accepted with ``exp(-beta dU)`` (the same symmetric-proposal MH as
  :func:`vaemolsim_tpu.mcmc.moves.make_random_walk_step`);
- **volume move**: a Gaussian step in ``ln V`` per chain, coordinates
  and box dilated uniformly by ``(V'/V)^(1/d)``, accepted with

      ``exp(-beta dU - beta P dV + (N + 1) ln(V'/V))``

  (the ``N + 1`` — not ``N`` — Jacobian exponent is the ln-V-sampling
  convention).

Every chain carries its OWN box, so thousands of NPT replicas batch
over the leading axis as one compiled scan, exactly like the NVT
engine; the box axis shards with the chain axis over a mesh.

The potential enters as a *box-parametric factory*
``potential_for_box(box_array) -> energy_fn`` — the dense periodic
factories in :mod:`vaemolsim_tpu.potentials` accept traced box arrays,
so one closure serves every chain's box inside jit (the cell-list
variant bakes its grid at trace time and is NOT usable here).  Keep
``shift=True``: a bare-truncated potential makes volume moves see an
impulsive energy at the cutoff.

Energies here are POTENTIAL ENERGIES in reduced units (``beta``
scales them), not the NVT engine's log-target convention — pressure
coupling needs U and V separately.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from vaemolsim_tpu.mcmc.engine import (Counter, _scan_unroll,
                                       log_uniform)

Array = jax.Array

__all__ = ["NPTState", "npt_init", "make_npt_step", "run_npt"]


@struct.dataclass
class NPTState:
    """Carry of the scanned NPT loop (checkpointable pytree).

    ``x``: ``(..., n_atoms, dim)`` coordinates; ``box``: ``(..., dim)``
    per-chain edge lengths; ``energy``: ``(...,)`` potential energy
    ``U(x; box)``.  Displacement and volume acceptance are counted
    separately — their healthy ranges differ (and are tuned by
    different scales).
    """

    x: Array
    box: Array
    energy: Array
    key: Array
    disp_trials: Counter
    disp_acc: Counter
    vol_trials: Counter
    vol_acc: Counter

    @property
    def volume(self) -> Array:
        return jnp.prod(self.box, axis=-1)

    @property
    def disp_acceptance_rate(self) -> Array:
        return self.disp_acc.to_float() / self.disp_trials.to_float()

    @property
    def vol_acceptance_rate(self) -> Array:
        return self.vol_acc.to_float() / self.vol_trials.to_float()


def _energy_at(potential_for_box, x: Array, box: Array) -> Array:
    """Evaluate U(x; box) with per-chain boxes: the factory sees the box
    shaped ``(..., 1, 1, dim)`` so it broadcasts against the pair
    displacement tensor ``(..., n, n, dim)`` of the dense potentials."""
    return potential_for_box(box[..., None, None, :])(x)


def npt_init(potential_for_box, x: Array, box, key: Array) -> NPTState:
    """Build the initial state; ``box`` broadcasts to one box per chain
    (``x.shape[:-2] + (dim,)``) so a single ``[L, L, L]`` seeds every
    chain."""
    x = jnp.asarray(x)
    box_arr = jnp.broadcast_to(jnp.asarray(box, x.dtype),
                               x.shape[:-2] + (x.shape[-1],))
    return NPTState(
        x=x, box=box_arr, energy=_energy_at(potential_for_box, x, box_arr),
        key=key, disp_trials=Counter.zero(), disp_acc=Counter.zero(),
        vol_trials=Counter.zero(), vol_acc=Counter.zero())


def make_npt_step(potential_for_box: Callable[[Array], Callable],
                  *, pressure: float, beta: float = 1.0,
                  dx_scale: float = 0.1, dlnv_scale: float = 0.02,
                  n_disp: int = 1,
                  min_box: Optional[float] = None,
                  anisotropic: bool = False
                  ) -> Callable[[NPTState], NPTState]:
    """Build one NPT sweep: ``n_disp`` all-atom displacement trials then
    one ``ln V`` volume trial, per chain.

    ``pressure``/``beta`` in reduced units.  ``dx_scale`` is the
    per-coordinate Gaussian displacement width; ``dlnv_scale`` the
    Gaussian width in ``ln V`` (typical targets: ~25-40 % displacement
    acceptance, ~30-50 % volume acceptance).

    ``min_box``: hard wall on the smallest box edge — volume proposals
    shrinking any edge below it are rejected outright (an infinite-
    energy wall, a valid Boltzmann constraint).  SET THIS to
    ``2 * cutoff`` when the potential is a truncated minimum-image
    pair form (the dense :func:`~vaemolsim_tpu.potentials.lennard_jones`
    etc. are silently wrong below that edge: multiple periodic images
    of a pair fall inside the cutoff sphere but only the nearest is
    counted).  High-pressure dense-fluid runs reach that regime.

    ``anisotropic``: propose independent Gaussian steps in EACH
    ``ln L_a`` (box shape relaxes — solids/interfaces) instead of one
    uniform dilation.  The stationary density in ``(ln L_1, ln L_2,
    ln L_3)`` is ``V^(N+1) exp(-beta U - beta P V)``, so the acceptance
    exponent is the SAME ``(N+1) ln(V'/V)`` with ``ln V = sum ln L_a``
    (isotropic-fluid box statistics under both modes are pinned by
    test).
    """
    pressure = float(pressure)
    beta = float(beta)
    if n_disp < 1:
        raise ValueError(f"n_disp must be >= 1; got {n_disp}")
    min_box_v = None if min_box is None else float(min_box)

    def step(state: NPTState) -> NPTState:
        key, k_vol = jax.random.split(state.key)
        x, e = state.x, state.energy
        dtype = x.dtype
        n, dim = x.shape[-2], x.shape[-1]
        disp_acc_n = jnp.asarray(0, jnp.int32)

        for _ in range(n_disp):
            key, k1, k2 = jax.random.split(key, 3)
            x2 = x + dx_scale * jax.random.normal(k1, x.shape, dtype)
            e2 = _energy_at(potential_for_box, x2, state.box)
            accept = (-beta * (e2 - e)) >= log_uniform(k2, e.shape, e2.dtype)
            x = jnp.where(accept[..., None, None], x2, x)
            e = jnp.where(accept, e2, e)
            disp_acc_n = disp_acc_n + jnp.sum(accept, dtype=jnp.int32)

        # Volume move in ln V (one dilation, or per-axis ln L steps).
        k3, k4 = jax.random.split(k_vol)
        v1 = jnp.prod(state.box, axis=-1)
        ln_v1 = jnp.log(v1)
        if anisotropic:
            dln = dlnv_scale * jax.random.normal(
                k3, state.box.shape, dtype)         # (..., dim)
            box2 = state.box * jnp.exp(dln)
            x2 = x * jnp.exp(dln)[..., None, :]
            ln_v2 = ln_v1 + jnp.sum(dln, axis=-1)
        else:
            ln_v2 = ln_v1 + dlnv_scale * jax.random.normal(
                k3, v1.shape, dtype)
            s = jnp.exp((ln_v2 - ln_v1) / dim)
            box2 = s[..., None] * state.box
            x2 = s[..., None, None] * x
        e2 = _energy_at(potential_for_box, x2, box2)
        v2 = jnp.exp(ln_v2)
        log_acc = (-beta * (e2 - e) - beta * pressure * (v2 - v1)
                   + (n + 1) * (ln_v2 - ln_v1))
        if min_box_v is not None:
            log_acc = jnp.where(jnp.min(box2, axis=-1) < min_box_v,
                                -jnp.inf, log_acc)
        accept = log_acc >= log_uniform(k4, e.shape, log_acc.dtype)

        n_chains = int(e.size)
        return NPTState(
            x=jnp.where(accept[..., None, None], x2, x),
            box=jnp.where(accept[..., None], box2, state.box),
            energy=jnp.where(accept, e2, e), key=key,
            disp_trials=state.disp_trials.add(n_disp * n_chains),
            disp_acc=state.disp_acc.add(disp_acc_n),
            vol_trials=state.vol_trials.add(n_chains),
            vol_acc=state.vol_acc.add(jnp.sum(accept, dtype=jnp.int32)))

    return step


def run_npt(step_fn: Callable[[NPTState], NPTState], state: NPTState,
            n_steps: int, collect_every: int = 0, unroll: int = 4
            ) -> Tuple[NPTState, Optional[Tuple[Array, Array]]]:
    """Scan ``n_steps`` NPT sweeps on device.

    With ``collect_every=k > 0``, also returns ``(xs, boxes)`` — the
    coordinates and boxes of every k-th sweep, shapes
    ``(n_steps // k, ...)`` (both are needed downstream: NPT
    observables are per-sample-box).
    """
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
        def body(s, _):
            return step_fn(s), None

        s, _ = jax.lax.scan(body, s, None, length=collect_every,
                            unroll=_scan_unroll(collect_every, unroll))
        return s, (s.x, s.box)

    state, collected = jax.lax.scan(outer, state, None,
                                    length=n_steps // collect_every)
    return state, collected
