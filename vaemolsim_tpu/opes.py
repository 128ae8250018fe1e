"""OPES — on-the-fly probability enhanced sampling (Invernizzi &
Parrinello, J. Phys. Chem. Lett. 11, 2731 (2020)).

The modern successor to well-tempered metadynamics
(:mod:`~vaemolsim_tpu.metadynamics`): instead of accumulating repulsive
hills, OPES builds an on-the-fly weighted kernel-density estimate of
the UNBIASED marginal ``P(s)`` along the collective variable and
biases toward its well-tempered target ``p(s) ~ P(s)^{1/gamma}``:

    V_n(s) = (1 - 1/gamma) kT ln( P~_n(s) / Z_n + eps ),
    eps    = exp( -beta DeltaE / (1 - 1/gamma) ),

where ``P~_n`` is the weighted KDE (each deposition weighted by
``exp(beta V(s_k))`` — the reweighting factor that undoes the bias
active when the point was visited), ``Z_n`` its average over the CV
domain, and ``eps`` puts a HARD floor on the bias: ``V(s) >= -DeltaE``
everywhere — the headline OPES property.  Unexplored CV values are
never favored by more than the user-set ``barrier`` allowance, so the
bias cannot overfill and spill the system into unphysical regions
(metadynamics' classic failure mode); the range above the floor adds
only the ``ln(P_max/Z)`` peak excess.

TPU design mirrors :mod:`~vaemolsim_tpu.metadynamics`: the KDE value
and derivative live on a FIXED grid (one broadcast Gaussian per
deposition; bias evaluation is O(grid) linear interpolation forever),
the whole run is one nested ``lax.scan``, multiple walkers share one
estimate, and periodic CVs wrap grid and kernels.  Differences from the
PLUMED implementation, by design: fixed kernel bandwidth (no adaptive
shrinking/compression — the grid already bounds the cost) and ``Z``
normalized over the WHOLE grid range rather than the visited subset
(exact for bounded/periodic CVs; choose the grid to cover the
physically reachable range).

The free-energy readout is direct: ``F(s) = -kT ln P~(s)``
(:func:`free_energy_from_opes`) — no ``gamma/(gamma-1)`` bias scaling as
in metadynamics, because OPES estimates the distribution itself.
"""

from __future__ import annotations

import math

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from vaemolsim_tpu.md import MDState, _force_fn, _masses_arr
from vaemolsim_tpu.metadynamics import (BiasGrid, _cv_delta, _grid_points,
                                        _interp)

Array = jax.Array

__all__ = ["OPESBias", "opes_grid", "opes_deposit", "opes_bias_value",
           "opes_bias_derivative", "opes_baoab", "free_energy_from_opes"]


@struct.dataclass
class OPESBias:
    """On-the-fly probability estimate on a fixed CV grid.

    ``prob``/``dprob``: weighted kernel-density value and d/ds at the
    grid nodes (UNnormalized — divide by ``sum_w``); ``sum_w``: total
    deposition weight so far (0 before the first deposit: the bias is
    exactly zero then).  Static fields as in
    :class:`~vaemolsim_tpu.metadynamics.BiasGrid`, plus the OPES
    parameters ``barrier`` (DeltaE, the hard bias cap, in energy units),
    ``gamma`` (well-tempered bias factor) and ``kT``.
    """

    prob: Array
    dprob: Array
    sum_w: Array
    lo: float = struct.field(pytree_node=False)
    hi: float = struct.field(pytree_node=False)
    periodic: bool = struct.field(pytree_node=False)
    barrier: float = struct.field(pytree_node=False)
    gamma: float = struct.field(pytree_node=False)
    kT: float = struct.field(pytree_node=False)

    # borrow BiasGrid's interpolation helpers via a structural view
    def _as_grid(self) -> BiasGrid:
        return BiasGrid(v=self.prob, dv=self.dprob, lo=self.lo,
                        hi=self.hi, periodic=self.periodic)

    @property
    def _eps(self) -> float:
        frac = 1.0 - 1.0 / self.gamma
        # pure-Python math: the fields are static, and jnp would TRACE
        # the constant under jit (float() of it then fails)
        return math.exp(-self.barrier / (self.kT * frac))

    @property
    def _prefactor(self) -> float:
        return (1.0 - 1.0 / self.gamma) * self.kT


def opes_grid(lo: float, hi: float, n: int, *, barrier: float,
              gamma: float = 10.0, kT: float = 1.0,
              periodic: bool = False) -> OPESBias:
    """Fresh OPES state over ``n`` grid nodes on ``[lo, hi]``.

    ``barrier``: DeltaE — set it a little above the highest barrier you
    need to cross (the bias saturates there); ``gamma``: bias factor of
    the well-tempered target ``P^{1/gamma}``.
    """
    if barrier <= 0.0:
        raise ValueError("barrier must be positive")
    if gamma <= 1.0:
        raise ValueError("gamma must exceed 1 (gamma -> inf flattens "
                         "fully; gamma = 1 means no bias)")
    return OPESBias(prob=jnp.zeros((n,)), dprob=jnp.zeros((n,)),
                    sum_w=jnp.zeros(()), lo=float(lo), hi=float(hi),
                    periodic=bool(periodic), barrier=float(barrier),
                    gamma=float(gamma), kT=float(kT))


def _prob_and_z(ob: OPESBias, s: Array) -> Tuple[Array, Array, Array]:
    """Normalized KDE P~(s), dP~/ds, and the domain-average Z; all
    gracefully zero before the first deposit."""
    g = ob._as_grid()
    denom = jnp.maximum(ob.sum_w, 1e-30)
    p = _interp(g, ob.prob, s) / denom
    dp = _interp(g, ob.dprob, s) / denom
    # Z = <P~> over the domain: node mean (exact for periodic grids;
    # trapezoid end-correction for bounded ones).
    node_p = ob.prob / denom
    if ob.periodic:
        z = jnp.mean(node_p)
    else:
        z = (jnp.sum(node_p) - 0.5 * (node_p[0] + node_p[-1])) / (
            node_p.shape[0] - 1)
    z = jnp.maximum(z, 1e-30)
    return p, dp, z


def opes_bias_value(ob: OPESBias, s: Array) -> Array:
    """V(s) = (1 - 1/gamma) kT ln(P~(s)/Z + eps); exactly 0 before the
    first deposition."""
    p, _, z = _prob_and_z(ob, s)
    v = ob._prefactor * jnp.log(p / z + ob._eps)
    return jnp.where(ob.sum_w > 0.0, v, jnp.zeros_like(v))


def opes_bias_derivative(ob: OPESBias, s: Array) -> Array:
    p, dp, z = _prob_and_z(ob, s)
    dv = ob._prefactor * (dp / z) / (p / z + ob._eps)
    return jnp.where(ob.sum_w > 0.0, dv, jnp.zeros_like(dv))


def opes_deposit(ob: OPESBias, s: Array, *, sigma: float) -> OPESBias:
    """Add one Gaussian kernel of bandwidth ``sigma`` per walker CV in
    ``s`` (any shape; flattened), each weighted by ``exp(V(s_i)/kT)``
    under the CURRENT bias — the on-the-fly reweighting that makes the
    running estimate target the UNBIASED ``P(s)``."""
    pts = _grid_points(ob._as_grid())
    s = jnp.ravel(s)
    w_i = jnp.exp(opes_bias_value(ob, s) / ob.kT)
    d = _cv_delta(ob._as_grid(), pts[None, :], s[:, None])  # (walkers, n)
    norm = 1.0 / (sigma * jnp.sqrt(2.0 * jnp.pi))
    gauss = norm * jnp.exp(-0.5 * (d / sigma) ** 2)
    p_add = jnp.sum(w_i[:, None] * gauss, axis=0)
    dp_add = jnp.sum(w_i[:, None] * gauss * (-d / sigma ** 2), axis=0)
    return ob.replace(prob=ob.prob + p_add, dprob=ob.dprob + dp_add,
                      sum_w=ob.sum_w + jnp.sum(w_i))


def opes_baoab(potential: Callable[[Array], Array],
               cv_fn: Callable[[Array], Array],
               x0: Array, v0: Array, key: Array, *,
               dt: float, n_steps: int, deposit_every: int,
               grid: OPESBias, sigma: float,
               friction: float = 1.0, masses=1.0,
               collect_cv: bool = True
               ) -> Tuple[MDState, OPESBias, Optional[Array]]:
    """OPES over BAOAB Langevin dynamics — same harness contract as
    :func:`~vaemolsim_tpu.metadynamics.metad_baoab` (walkers = leading
    batch axis sharing one estimate; CV trajectory collected at each
    deposition).  ``kT``/``gamma``/``barrier`` live on ``grid``
    (:func:`opes_grid`); the thermostat temperature is ``grid.kT``.

    Read the converged profile with :func:`free_energy_from_opes`.
    """
    if n_steps % deposit_every:
        raise ValueError(f"deposit_every={deposit_every} must divide "
                         f"n_steps={n_steps}")
    kT = grid.kT
    m = _masses_arr(masses, x0)
    dt_a = jnp.asarray(dt, x0.dtype)
    c1 = jnp.exp(-friction * dt_a)
    c2 = jnp.sqrt(kT * (1.0 - c1 * c1) / m)
    base_force = _force_fn(potential)

    def cv_and_grad(x):
        s, vjp = jax.vjp(cv_fn, x)
        (gs,) = vjp(jnp.ones_like(s))
        return s, gs

    def total_force(x, ob):
        _, f = base_force(x)
        s, gs = cv_and_grad(x)
        return f - opes_bias_derivative(ob, s)[..., None, None] * gs

    def one(carry, k):
        st, ob = carry
        v = st.v + 0.5 * dt_a * st.force / m                  # B
        x = st.x + 0.5 * dt_a * v                             # A
        v = c1 * v + c2 * jax.random.normal(k, v.shape, v.dtype)  # O
        x = x + 0.5 * dt_a * v                                # A
        f = total_force(x, ob)
        v = v + 0.5 * dt_a * f / m                            # B
        return (MDState(x=x, v=v, force=f), ob), None

    def outer(carry, ks):
        st, ob = carry
        (st, ob), _ = jax.lax.scan(one, (st, ob), ks)
        s = cv_fn(st.x)
        ob = opes_deposit(ob, s, sigma=sigma)
        st = st._replace(force=total_force(st.x, ob))
        return (st, ob), (s if collect_cv else None)

    x0 = jnp.asarray(x0)
    st = MDState(x=x0, v=jnp.asarray(v0), force=total_force(x0, grid))
    keys = jax.random.split(key, n_steps).reshape(
        n_steps // deposit_every, deposit_every, -1)
    (st, grid), cvs = jax.lax.scan(outer, (st, grid), keys)
    return st, grid, (cvs if collect_cv else None)


def free_energy_from_opes(ob: OPESBias) -> Tuple[Array, Array]:
    """``F(s) = -kT ln P~(s)`` at the grid nodes, zeroed at its minimum
    — the direct distribution readout (floored where the estimate has
    no mass, so untouched regions report a large-but-finite value rather
    than inf).  Returns ``(s_grid, F)``."""
    denom = jnp.maximum(ob.sum_w, 1e-30)
    p = jnp.maximum(ob.prob / denom, 1e-30)
    f = -ob.kT * jnp.log(p)
    return _grid_points(ob._as_grid()), f - jnp.min(f)
