"""Well-tempered metadynamics: adaptive-bias free-energy surfaces.

Beyond-reference enhanced sampling (Barducci, Bussi & Parrinello 2008;
Laio & Parrinello 2002): Gaussian repulsive hills deposited along a
collective variable (CV) progressively flatten the free-energy surface,
and in the well-tempered limit the accumulated bias CONVERGES to
``-(1 - 1/gamma) F(s)``, so the free-energy profile is read directly
off the bias.

TPU design:

* the bias lives on a FIXED grid over the CV range — hills are
  accumulated onto the grid at deposit time (one broadcast Gaussian per
  deposit), so bias evaluation is O(grid) via linear interpolation
  forever, not O(n_hills) growing per step; the whole run is one
  nested ``lax.scan`` (outer over deposits, inner over MD steps);
* the bias force is exact for the interpolated bias:
  ``F = -V'(s) grad_x s`` with ``V'`` from an analytically-accumulated
  derivative grid (each hill's derivative is deposited alongside its
  value — smoother than differencing the value grid) and ``grad_x s``
  by one vjp of the CV function;
* **multiple walkers**: all batched replicas share ONE bias grid and
  all deposit each interval (the standard multiple-walker scheme —
  walkers explore in parallel and the bias converges with the COMBINED
  statistics);
* periodic CVs (torsions — this library's central coordinate type,
  SURVEY.md §0) wrap both the grid interpolation and the hill
  deposition.

Validation (``tests/test_metadynamics.py``): double-well crossing that
plain dynamics cannot achieve, free-energy recovery against the exact
quadrature profile, well-tempered hill-height decay, and the periodic
CV path; ``examples/23_metadynamics.py`` recovers a butane-like
torsional PMF.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from vaemolsim_tpu.md import MDState, _force_fn, _masses_arr

Array = jax.Array

__all__ = ["BiasGrid", "bias_grid", "bias_value", "bias_derivative",
           "deposit_hills", "metad_baoab", "free_energy_from_bias"]


@struct.dataclass
class BiasGrid:
    """Accumulated metadynamics bias on a fixed CV grid.

    ``v``/``dv``: bias value and d(bias)/ds at the ``n`` grid nodes;
    ``lo``/``hi``: CV range (for a periodic CV, one period, ``hi``
    exclusive); ``periodic``: wrap interpolation and deposition.
    The range/periodicity are STATIC (compiled into the program); only
    the accumulated tables are traced scan state.
    """

    v: Array
    dv: Array
    lo: float = struct.field(pytree_node=False)
    hi: float = struct.field(pytree_node=False)
    periodic: bool = struct.field(pytree_node=False)

    def _replace(self, **kw) -> "BiasGrid":
        return self.replace(**kw)


def bias_grid(lo: float, hi: float, n: int,
              periodic: bool = False) -> BiasGrid:
    return BiasGrid(v=jnp.zeros((n,)), dv=jnp.zeros((n,)),
                    lo=float(lo), hi=float(hi), periodic=bool(periodic))


def _grid_points(g: BiasGrid) -> Array:
    n = g.v.shape[0]
    if g.periodic:
        return g.lo + (g.hi - g.lo) * jnp.arange(n) / n
    return jnp.linspace(g.lo, g.hi, n)


def _interp(g: BiasGrid, table: Array, s: Array) -> Array:
    """Linear interpolation of ``table`` at CV values ``s``."""
    n = table.shape[0]
    if g.periodic:
        u = (s - g.lo) / (g.hi - g.lo) * n
        i0 = jnp.floor(u).astype(jnp.int32)
        w = u - i0
        i0 = jnp.mod(i0, n)
        i1 = jnp.mod(i0 + 1, n)
    else:
        u = (s - g.lo) / (g.hi - g.lo) * (n - 1)
        u = jnp.clip(u, 0.0, n - 1.0)
        i0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, n - 2)
        w = u - i0
        i1 = i0 + 1
    return (1.0 - w) * table[i0] + w * table[i1]


def bias_value(g: BiasGrid, s: Array) -> Array:
    return _interp(g, g.v, s)


def bias_derivative(g: BiasGrid, s: Array) -> Array:
    return _interp(g, g.dv, s)


def _cv_delta(g: BiasGrid, a: Array, b: Array) -> Array:
    d = a - b
    if g.periodic:
        period = g.hi - g.lo
        d = d - period * jnp.round(d / period)
    return d


def deposit_hills(g: BiasGrid, s: Array, *, height, width: float,
                  kT: float = 1.0, gamma: float = 5.0) -> BiasGrid:
    """Add one well-tempered Gaussian hill per walker CV in ``s``
    (any shape; flattened).  Each hill's height is scaled by
    ``exp(-V(s_i) / (kT (gamma - 1)))`` — the well-tempered rule that
    makes the bias converge instead of endlessly overfilling."""
    pts = _grid_points(g)
    s = jnp.ravel(s)
    w_i = height * jnp.exp(-bias_value(g, s) / (kT * (gamma - 1.0)))
    d = _cv_delta(g, pts[None, :], s[:, None])        # (walkers, n)
    gauss = jnp.exp(-0.5 * (d / width) ** 2)
    v_add = jnp.sum(w_i[:, None] * gauss, axis=0)
    dv_add = jnp.sum(w_i[:, None] * gauss * (-d / width ** 2), axis=0)
    return g._replace(v=g.v + v_add, dv=g.dv + dv_add)


def metad_baoab(potential: Callable[[Array], Array],
                cv_fn: Callable[[Array], Array],
                x0: Array, v0: Array, key: Array, *,
                dt: float, n_steps: int, deposit_every: int,
                grid: BiasGrid,
                hill_height: float, hill_width: float,
                kT: float = 1.0, gamma: float = 5.0,
                friction: float = 1.0, masses=1.0,
                collect_cv: bool = True
                ) -> Tuple[MDState, BiasGrid, Optional[Array]]:
    """Well-tempered metadynamics over BAOAB Langevin dynamics.

    ``cv_fn``: differentiable collective variable ``(..., n, d) ->
    (...)`` (one scalar per replica).  All replicas are WALKERS sharing
    ``grid``: each deposits a hill every ``deposit_every`` steps.
    Returns ``(final MDState, final BiasGrid, cv trajectory)`` — the cv
    trajectory records every walker's CV at each deposit (shape
    ``(n_deposits, ...)``) for reweighting/diagnostics.

    Read the converged free energy with :func:`free_energy_from_bias`.
    """
    if n_steps % deposit_every:
        raise ValueError(f"deposit_every={deposit_every} must divide "
                         f"n_steps={n_steps}")
    m = _masses_arr(masses, x0)
    dt_a = jnp.asarray(dt, x0.dtype)
    c1 = jnp.exp(-friction * dt_a)
    c2 = jnp.sqrt(kT * (1.0 - c1 * c1) / m)
    base_force = _force_fn(potential)

    def cv_and_grad(x):
        s, vjp = jax.vjp(cv_fn, x)
        (gs,) = vjp(jnp.ones_like(s))
        return s, gs

    def total_force(x, g):
        _, f = base_force(x)
        s, gs = cv_and_grad(x)
        return f - bias_derivative(g, s)[..., None, None] * gs

    def one(carry, k):
        st, g = carry
        v = st.v + 0.5 * dt_a * st.force / m                  # B
        x = st.x + 0.5 * dt_a * v                             # A
        v = c1 * v + c2 * jax.random.normal(k, v.shape, v.dtype)  # O
        x = x + 0.5 * dt_a * v                                # A
        f = total_force(x, g)
        v = v + 0.5 * dt_a * f / m                            # B
        return (MDState(x=x, v=v, force=f), g), None

    def outer(carry, ks):
        st, g = carry
        (st, g), _ = jax.lax.scan(one, (st, g), ks)
        s = cv_fn(st.x)
        g = deposit_hills(g, s, height=hill_height, width=hill_width,
                          kT=kT, gamma=gamma)
        # re-evaluate the force under the updated bias so the carried
        # force stays consistent with the bias the next step sees
        st = st._replace(force=total_force(st.x, g))
        return (st, g), (s if collect_cv else None)

    x0 = jnp.asarray(x0)
    st = MDState(x=x0, v=jnp.asarray(v0), force=total_force(x0, grid))
    keys = jax.random.split(key, n_steps).reshape(
        n_steps // deposit_every, deposit_every, -1)
    (st, grid), cvs = jax.lax.scan(outer, (st, grid), keys)
    return st, grid, (cvs if collect_cv else None)


def free_energy_from_bias(g: BiasGrid, *, kT: float = 1.0,
                          gamma: float = 5.0) -> Tuple[Array, Array]:
    """The well-tempered estimator ``F(s) = -gamma/(gamma-1) V(s)``
    (up to a constant — returned zeroed at its minimum), with the grid
    points.  Returns ``(s_grid, F)``."""
    f = -(gamma / (gamma - 1.0)) * g.v
    return _grid_points(g), f - jnp.min(f)
