"""Extended-system adaptive biasing force (eABF) with CZAR estimation.

The third adaptive-bias family alongside well-tempered metadynamics
(:mod:`vaemolsim_tpu.metadynamics`) and umbrella sampling + MBAR
(`examples/20`): instead of depositing repulsive hills, ABF measures
the running MEAN FORCE along the collective variable and applies its
negative, so the biased dynamics becomes diffusive along the CV once
the estimate converges (Darve & Pohorille 2001; comte de Laplace would
approve: unbiased estimator, no hill-shape hyperparameters).

This is the EXTENDED-system variant (Lelievre et al. 2007; Fu et al.
2016 "eABF"): a fictitious particle ``lam`` is harmonically tethered to
the true CV ``s(x)`` with stiffness ``kappa``, and ABF acts on ``lam``.
That sidesteps the classic ABF requirement of the instantaneous-force
projector ``kT div(grad s / |grad s|^2)`` (a Hessian-trace per step —
expensive and CV-specific): the instantaneous free-energy gradient at
fixed ``lam`` is EXACTLY ``kappa (lam - s)``, one subtraction.  The
unbiased profile along the true CV is then recovered by the CZAR
estimator (Lesage, Leliexvre, Stoltz & Henin 2017):

    A'(s) = -kT d ln rho~(s) / ds + kappa ( <lam>_s - s )

with ``rho~`` the biased marginal of ``s`` — an asymptotically exact
deconvolution, accumulated from the same trajectory.

TPU design (mirrors ``metad_baoab``):

* the whole run is ONE ``lax.scan`` over steps; the mean-force tables
  (force sum + visit count per bin, plus the CZAR accumulators) are
  scan carry, updated by fixed-shape ``scatter-add``;
* all batch leading axes of ``x0`` are WALKERS sharing the tables
  (shared adaptive bias = multiple-walker ABF), so chain-parallel
  sharding (`parallel.sharding`) applies unchanged;
* the applied bias is ramped in per bin (``min(count/ramp_count, 1)``,
  the standard guard against early noise) and read by nearest bin;
* periodic CVs (torsions) wrap the tether difference, the binning, and
  the CZAR derivative stencil.

Validation (``tests/test_abf.py``): exact harmonic free energy through
both estimators, double-well FES against quadrature plus a crossing
that plain MD cannot make, exact bin bookkeeping, and the periodic
torsion path on the library's 4-atom chain.

Reference parity note: the reference library has no enhanced sampling
at all (SURVEY.md §2.4) — this module is beyond-reference capability
built on the same ``cv_fn`` contract as the rest of the bias engines,
so every :mod:`vaemolsim_tpu.colvars` factory works here unchanged.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from vaemolsim_tpu.md import MDState, _force_fn, _masses_arr

Array = jax.Array

__all__ = ["ABFState", "abf_grid", "eabf_baoab", "abf_free_energy",
           "czar_free_energy"]


@struct.dataclass
class ABFState:
    """Adaptive mean-force tables on a fixed CV grid of ``n`` bins.

    ``f_sum``/``count``: per-bin sum of instantaneous free-energy
    gradients ``kappa (lam - s)`` and visit counts, binned by ``lam``
    (the ABF tables).  ``s_count``/``delta_sum``: CZAR accumulators
    binned by the TRUE CV ``s`` — visit counts and the sum of the
    (wrapped) tether elongation ``lam - s``.  Range/periodicity are
    static; only the tables are traced.
    """

    f_sum: Array
    count: Array
    s_count: Array
    delta_sum: Array
    lo: float = struct.field(pytree_node=False)
    hi: float = struct.field(pytree_node=False)
    periodic: bool = struct.field(pytree_node=False)

    @property
    def n_bins(self) -> int:
        return self.f_sum.shape[0]


def abf_grid(lo: float, hi: float, n: int,
             periodic: bool = False) -> ABFState:
    z = jnp.zeros((n,))
    return ABFState(f_sum=z, count=z, s_count=z, delta_sum=z,
                    lo=float(lo), hi=float(hi), periodic=bool(periodic))


def _bin_centers(g: ABFState) -> Array:
    n = g.n_bins
    w = (g.hi - g.lo) / n
    return g.lo + w * (jnp.arange(n) + 0.5)


def _bin_index(g: ABFState, s: Array) -> Array:
    n = g.n_bins
    u = (s - g.lo) / (g.hi - g.lo) * n
    i = jnp.floor(u).astype(jnp.int32)
    if g.periodic:
        return jnp.mod(i, n)
    return jnp.clip(i, 0, n - 1)


def _wrap(g: ABFState, d: Array) -> Array:
    if not g.periodic:
        return d
    period = g.hi - g.lo
    return d - period * jnp.round(d / period)


def eabf_baoab(potential: Callable[[Array], Array],
               cv_fn: Callable[[Array], Array],
               x0: Array, v0: Array, key: Array, *,
               dt: float, n_steps: int, grid: ABFState,
               kappa: float, kT: float = 1.0,
               lam_mass: float = 1.0, friction: float = 1.0,
               friction_lam: Optional[float] = None, masses=1.0,
               ramp_count: float = 200.0,
               collect_every: int = 0
               ) -> Tuple[MDState, Array, ABFState, Optional[Array]]:
    """Multiple-walker eABF over joint BAOAB Langevin dynamics.

    ``cv_fn``: differentiable CV ``(..., n_atoms, d) -> (...)`` (one
    scalar per walker, e.g. any :mod:`vaemolsim_tpu.colvars` factory).
    Every walker carries its own extended particle ``lam`` (initialized
    at ``cv_fn(x0)``) and all walkers share the adaptive tables.

    Returns ``(final MDState, final lam, tables, cv trajectory)`` — the
    trajectory records ``(s, lam)`` every ``collect_every`` steps when
    requested (shape ``(n_collect, 2) + batch``).

    Read the free-energy profile with :func:`czar_free_energy` (exact
    in the sampling limit) or :func:`abf_free_energy` (the raw
    extended-variable profile — convolved with the kT/kappa tether
    width, fine for stiff tethers).
    """
    if collect_every and n_steps % collect_every:
        raise ValueError(f"collect_every={collect_every} must divide "
                         f"n_steps={n_steps}")
    m = _masses_arr(masses, x0)
    x0 = jnp.asarray(x0)
    dt_a = jnp.asarray(dt, x0.dtype)
    g_l = friction if friction_lam is None else friction_lam
    c1 = jnp.exp(-friction * dt_a)
    c2 = jnp.sqrt(kT * (1.0 - c1 * c1) / m)
    c1l = jnp.exp(-g_l * dt_a)
    c2l = jnp.sqrt(kT * (1.0 - c1l * c1l) / lam_mass)
    base_force = _force_fn(potential)

    def cv_and_grad(x):
        s, vjp = jax.vjp(cv_fn, x)
        (gs,) = vjp(jnp.ones_like(s))
        return s, gs

    def forces(x, lam, tbl):
        """Joint forces on (x, lam) under tether + current ABF bias."""
        _, f = base_force(x)
        s, gs = cv_and_grad(x)
        delta = _wrap(tbl, lam - s)                      # lam - s
        f_x = f + (kappa * delta)[..., None, None] * gs
        # instantaneous dA/dlam estimate is kappa * delta; ABF applies
        # its running bin mean so the net mean force on lam -> 0.
        idx = _bin_index(tbl, lam)
        mean_f = tbl.f_sum[idx] / jnp.maximum(tbl.count[idx], 1.0)
        ramp = jnp.minimum(tbl.count[idx] / ramp_count, 1.0)
        f_lam = -kappa * delta + ramp * mean_f
        return f_x, f_lam, s, delta

    def accumulate(tbl, lam, s, delta):
        il = jnp.ravel(_bin_index(tbl, lam))
        isx = jnp.ravel(_bin_index(tbl, s))
        inst = jnp.ravel(kappa * delta)
        one = jnp.ones_like(inst)
        return tbl.replace(
            f_sum=tbl.f_sum.at[il].add(inst),
            count=tbl.count.at[il].add(one),
            s_count=tbl.s_count.at[isx].add(one),
            delta_sum=tbl.delta_sum.at[isx].add(jnp.ravel(delta)))

    def step(carry, k):
        st, lam, vl, f_lam, tbl = carry
        kx, kl = jax.random.split(k)
        v = st.v + 0.5 * dt_a * st.force / m                    # B
        vl = vl + 0.5 * dt_a * f_lam / lam_mass
        x = st.x + 0.5 * dt_a * v                               # A
        lam = lam + 0.5 * dt_a * vl
        v = c1 * v + c2 * jax.random.normal(kx, v.shape, v.dtype)   # O
        vl = c1l * vl + c2l * jax.random.normal(kl, vl.shape, vl.dtype)
        x = x + 0.5 * dt_a * v                                  # A
        lam = lam + 0.5 * dt_a * vl
        f_x, f_lam, s, delta = forces(x, lam, tbl)              # B
        v = v + 0.5 * dt_a * f_x / m
        vl = vl + 0.5 * dt_a * f_lam / lam_mass
        tbl = accumulate(tbl, lam, s, delta)
        out = jnp.stack([s, lam]) if collect_every else None
        return (MDState(x=x, v=v, force=f_x), lam, vl, f_lam, tbl), out

    s0 = cv_fn(x0)
    lam0 = s0
    vl0 = jnp.zeros_like(lam0)
    f_x0, f_lam0, _, _ = forces(x0, lam0, grid)
    st = MDState(x=x0, v=jnp.asarray(v0), force=f_x0)
    carry = (st, lam0, vl0, f_lam0, grid)
    if collect_every:
        def outer(c, ks):
            c, outs = jax.lax.scan(step, c, ks)
            return c, outs[-1]
        keys = jax.random.split(key, n_steps).reshape(
            n_steps // collect_every, collect_every, -1)
        carry, traj = jax.lax.scan(outer, carry, keys)
    else:
        keys = jax.random.split(key, n_steps)
        carry, _ = jax.lax.scan(step, carry, keys)
        traj = None
    st, lam, _, _, tbl = carry
    return st, lam, tbl, traj


def abf_free_energy(g: ABFState) -> Tuple[Array, Array]:
    """Free-energy profile of the EXTENDED variable: integrate the
    per-bin mean force along ``lam`` (trapezoid over bin centers).
    Converges to A(s) convolved with the tether Gaussian of width
    ``sqrt(kT/kappa)`` — use :func:`czar_free_energy` for the exact
    deconvolved profile.  Returns ``(centers, A)`` zeroed at the min.
    """
    centers = _bin_centers(g)
    w = (g.hi - g.lo) / g.n_bins
    mean_f = g.f_sum / jnp.maximum(g.count, 1.0)
    # A(lam) = integral of dA/dlam; midpoint rule on the bin grid
    a = jnp.concatenate([jnp.zeros((1,)),
                         jnp.cumsum(0.5 * (mean_f[1:] + mean_f[:-1]) * w)])
    return centers, a - jnp.min(a)


def czar_free_energy(g: ABFState, *, kappa: float, kT: float = 1.0,
                     min_count: float = 1.0) -> Tuple[Array, Array]:
    """CZAR estimator of the free energy along the TRUE CV:

        A'(s) = -kT d ln rho~(s)/ds + kappa <lam - s>_s

    with the log-density derivative by (periodic-aware) central
    differences on the bin grid.  Bins visited fewer than ``min_count``
    times contribute a zero gradient (and should be treated as
    unexplored).  Returns ``(centers, A)`` zeroed at the minimum.
    """
    centers = _bin_centers(g)
    n = g.n_bins
    w = (g.hi - g.lo) / n
    visited = g.s_count >= min_count
    logp = jnp.log(jnp.maximum(g.s_count, 0.5))
    if g.periodic:
        dlogp = (jnp.roll(logp, -1) - jnp.roll(logp, 1)) / (2 * w)
        ok = visited & jnp.roll(visited, -1) & jnp.roll(visited, 1)
    else:
        dlogp = jnp.gradient(logp, w)  # central interior, one-sided edges
        ok = visited
    mean_delta = g.delta_sum / jnp.maximum(g.s_count, 1.0)
    dA = jnp.where(ok, -kT * dlogp + kappa * mean_delta, 0.0)
    a = jnp.concatenate([jnp.zeros((1,)),
                         jnp.cumsum(0.5 * (dA[1:] + dA[:-1]) * w)])
    return centers, a - jnp.min(a)
