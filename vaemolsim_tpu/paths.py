"""Minimum-energy paths: climbing-image NEB and the string method.

Beyond-reference capability (the reference has no transition-path
tooling; its MC engine /root/reference/vaemolsim/mcmc.py samples
basins, it does not connect them).  Given two minima of any
:mod:`vaemolsim_tpu.potentials`-contract energy, these find the
minimum-energy path (MEP) and the saddle point between them — the
barrier that controls every rate.

TPU design: a path is a fixed ``(n_images, n_atoms, dim)`` array, so
the whole optimization is one ``lax.scan`` over fused elementwise
updates + one batched force evaluation (all images in a single
``potential`` call, which the dense potentials vectorize for free).
The image count is static; the climbing image is selected by a one-hot
``argmax`` mask instead of indexing, so there is no data-dependent
control flow anywhere.  Independent paths batch with ``jax.vmap``.

- :func:`climbing_neb` — nudged elastic band with the improved
  (upwinded) tangent of Henkelman & Jonsson (2000) and a climbing
  image driven UP the band to the exact saddle, relaxed by the FIRE
  optimizer (Bitzek et al. 2006) in a single compiled scan.
- :func:`string_method` — the simplified string method (E, Ren &
  Vanden-Eijnden 2007): full-gradient descent steps alternating with
  equal-arc-length reparametrization (batched ``jnp.interp`` over
  coordinates — no sorting, no dynamic shapes).
- :func:`interpolate_path` — linear initial path between endpoints.

Pinned in ``tests/test_paths.py`` by the Muller-Brown surface's
literature saddle points (E = -40.6648 / -72.2489) and an exact
quartic double-well barrier.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

__all__ = ["MEPResult", "interpolate_path", "climbing_neb",
           "string_method", "harmonic_tst_rate"]


class MEPResult(NamedTuple):
    """Converged path diagnostics.

    - ``path``: ``(n_images, ..., n_atoms, dim)``
    - ``energies``: ``(n_images,)`` at the final path
    - ``f_max``: scalar — max over images/components of the projected
      (NEB) or perpendicular (string) force, the convergence measure
    - ``barrier``: ``max(energies) - energies[0]``
    """
    path: Array
    energies: Array
    f_max: Array

    @property
    def barrier(self) -> Array:
        return jnp.max(self.energies) - self.energies[0]

    @property
    def saddle(self) -> Array:
        return self.path[jnp.argmax(self.energies)]


def interpolate_path(x_a: Array, x_b: Array, n_images: int) -> Array:
    """Linear path from ``x_a`` to ``x_b`` inclusive:
    ``(n_images, *x_a.shape)``."""
    x_a, x_b = jnp.asarray(x_a), jnp.asarray(x_b)
    t = jnp.linspace(0.0, 1.0, n_images, dtype=x_a.dtype)
    t = t.reshape((n_images,) + (1,) * x_a.ndim)
    return x_a[None] * (1.0 - t) + x_b[None] * t


def _energy_forces(potential, path):
    e, vjp = jax.vjp(potential, path)
    (g,) = vjp(jnp.ones_like(e))
    return e, -g


def _upwind_tangents(path: Array, energies: Array) -> Array:
    """Improved NEB tangent (Henkelman & Jonsson 2000 eq. 8-11) for
    the interior images, unit-normalized: ``(K-2, n, d)``."""
    t_plus = path[2:] - path[1:-1]
    t_minus = path[1:-1] - path[:-2]
    e_prev, e, e_next = energies[:-2], energies[1:-1], energies[2:]
    d_next = jnp.abs(e_next - e)
    d_prev = jnp.abs(e_prev - e)
    d_max = jnp.maximum(d_next, d_prev)[:, None, None]
    d_min = jnp.minimum(d_next, d_prev)[:, None, None]
    up = (e_next > e) & (e > e_prev)          # monotone uphill
    down = (e_next < e) & (e < e_prev)        # monotone downhill
    next_higher = (e_next > e_prev)[:, None, None]
    mixed = jnp.where(next_higher,
                      t_plus * d_max + t_minus * d_min,
                      t_plus * d_min + t_minus * d_max)
    tau = jnp.where(up[:, None, None], t_plus,
                    jnp.where(down[:, None, None], t_minus, mixed))
    norm = jnp.sqrt(jnp.sum(tau * tau, axis=(-2, -1), keepdims=True))
    return tau / jnp.maximum(norm, 1e-30)


class _FIREState(NamedTuple):
    path: Array
    v: Array
    dt: Array
    alpha: Array
    n_pos: Array
    f_max: Array


def climbing_neb(potential: Callable[[Array], Array],
                 path0: Array, *,
                 n_steps: int,
                 k_spring: float = 1.0,
                 dt: float = 0.05,
                 climb: bool = True,
                 climb_after: int = 0,
                 dt_max_factor: float = 10.0
                 ) -> MEPResult:
    """Relax a path to the MEP by climbing-image NEB under FIRE.

    Interior images feel the true force projected perpendicular to the
    upwinded tangent plus a spring force along it
    (``k (|t+| - |t-|) tau``); with ``climb`` the instantaneously
    highest interior image instead feels
    ``F - 2 (F . tau) tau`` — the true force with its parallel
    component inverted — and converges to the saddle point itself, not
    merely near it.  ``climb_after`` delays climbing for that many
    steps so the band roughly equilibrates first (recommended when the
    initial path is far from the MEP).

    Endpoints stay fixed: relax them to their minima first (e.g. with
    :func:`vaemolsim_tpu.potentials.minimize_energy`).

    FIRE (fast inertial relaxation engine) integrates all images as
    one system: velocity mixed toward the force direction while the
    power ``F . v`` stays positive (growing ``dt`` up to
    ``dt_max_factor * dt``), reset on any uphill step.  Everything is
    a single ``lax.scan``; per-step cost is one batched force call.
    """
    path0 = jnp.asarray(path0)
    if path0.ndim < 3 or path0.shape[0] < 3:
        raise ValueError("path0 must be (n_images >= 3, n_atoms, dim)")
    k = jnp.asarray(k_spring, path0.dtype)
    dt0 = jnp.asarray(dt, path0.dtype)
    dt_max = dt_max_factor * dt0
    f_inc, f_dec, alpha0, f_alpha, n_min = 1.1, 0.5, 0.1, 0.99, 5

    def neb_forces(path, step):
        e, f_true = _energy_forces(potential, path)
        tau = _upwind_tangents(path, e)
        f_int = f_true[1:-1]
        f_par = jnp.sum(f_int * tau, axis=(-2, -1), keepdims=True)
        f_perp = f_int - f_par * tau
        lens_plus = jnp.sqrt(jnp.sum((path[2:] - path[1:-1]) ** 2,
                                     axis=(-2, -1), keepdims=True))
        lens_minus = jnp.sqrt(jnp.sum((path[1:-1] - path[:-2]) ** 2,
                                      axis=(-2, -1), keepdims=True))
        f_neb = f_perp + k * (lens_plus - lens_minus) * tau
        if climb:
            # One-hot mask of the highest interior image; swapped to
            # the climbing force once step >= climb_after.
            hot = jax.nn.one_hot(jnp.argmax(e[1:-1]), e.shape[0] - 2,
                                 dtype=path.dtype)[:, None, None]
            f_climb = f_int - 2.0 * f_par * tau
            on = (step >= climb_after).astype(path.dtype)
            f_neb = f_neb + on * hot * (f_climb - f_neb)
        return f_neb, e

    def step_fn(s: _FIREState, i):
        f, _ = neb_forces(s.path, i)
        power = jnp.sum(f * s.v)
        f_norm = jnp.sqrt(jnp.sum(f * f))
        v_norm = jnp.sqrt(jnp.sum(s.v * s.v))
        v_mix = ((1.0 - s.alpha) * s.v
                 + s.alpha * f * v_norm / jnp.maximum(f_norm, 1e-30))
        uphill = power <= 0.0
        n_pos = jnp.where(uphill, 0, s.n_pos + 1)
        grow = n_pos > n_min
        dt_new = jnp.where(uphill, s.dt * f_dec,
                           jnp.where(grow, jnp.minimum(s.dt * f_inc,
                                                       dt_max), s.dt))
        alpha = jnp.where(uphill, alpha0,
                          jnp.where(grow, s.alpha * f_alpha, s.alpha))
        v = jnp.where(uphill, jnp.zeros_like(v_mix), v_mix)
        v = v + dt_new * f
        interior = s.path[1:-1] + dt_new * v
        path = jnp.concatenate([s.path[:1], interior, s.path[-1:]])
        f_max = jnp.max(jnp.abs(f))
        return _FIREState(path, v, dt_new, alpha, n_pos, f_max), None

    init = _FIREState(path=path0,
                      v=jnp.zeros_like(path0[1:-1]),
                      dt=dt0,
                      alpha=jnp.asarray(alpha0, path0.dtype),
                      n_pos=jnp.asarray(0, jnp.int32),
                      f_max=jnp.asarray(jnp.inf, path0.dtype))
    out, _ = jax.lax.scan(step_fn, init, jnp.arange(n_steps))
    energies = potential(out.path)
    return MEPResult(path=out.path, energies=energies, f_max=out.f_max)


def _reparametrize(path: Array) -> Array:
    """Redistribute images to equal arc length along the piecewise-
    linear path (endpoints fixed): batched ``jnp.interp`` per
    coordinate over the cumulative-length parameter."""
    n = path.shape[0]
    flat = path.reshape(n, -1)
    seg = jnp.sqrt(jnp.sum((flat[1:] - flat[:-1]) ** 2, axis=-1))
    s = jnp.concatenate([jnp.zeros((1,), seg.dtype), jnp.cumsum(seg)])
    s_new = jnp.linspace(0.0, s[-1], n)
    new_flat = jax.vmap(lambda c: jnp.interp(s_new, s, c),
                        in_axes=1, out_axes=1)(flat)
    return new_flat.reshape(path.shape)


def string_method(potential: Callable[[Array], Array],
                  path0: Array, *,
                  n_steps: int,
                  step_size: float = 0.01
                  ) -> MEPResult:
    """Simplified string method: interior images take one
    steepest-descent step on the TRUE force, then the whole string is
    reparametrized to equal arc length — the reparametrization supplies
    the tangential constraint NEB gets from springs.  Converges to the
    same MEP; no spring constant to tune, but no climbing image (read
    the barrier from the maximum-energy image / refine with
    :func:`climbing_neb` if the exact saddle is needed).
    """
    path0 = jnp.asarray(path0)
    if path0.ndim < 3 or path0.shape[0] < 3:
        raise ValueError("path0 must be (n_images >= 3, n_atoms, dim)")
    eta = jnp.asarray(step_size, path0.dtype)

    def step_fn(path, _):
        e, f = _energy_forces(potential, path)
        interior = path[1:-1] + eta * f[1:-1]
        path = jnp.concatenate([path[:1], interior, path[-1:]])
        path = _reparametrize(path)
        return path, None

    path, _ = jax.lax.scan(step_fn, path0, None, length=n_steps)
    e, f = _energy_forces(potential, path)
    tau = _upwind_tangents(path, e)
    f_int = f[1:-1]
    f_perp = f_int - jnp.sum(f_int * tau, axis=(-2, -1),
                             keepdims=True) * tau
    return MEPResult(path=path, energies=e,
                     f_max=jnp.max(jnp.abs(f_perp)))


def harmonic_tst_rate(potential: Callable[[Array], Array],
                      x_min: Array, x_saddle: Array, *, kt: float,
                      masses=1.0, zero_tol: float = 1e-4) -> Array:
    """Harmonic transition-state-theory escape rate (Vineyard 1957):

        ``k = [prod_i omega_i(min) / prod_j omega_j(saddle)]
              / (2 pi) * exp(-(E_saddle - E_min) / kT)``,

    where the saddle product runs over its REAL modes only (the single
    imaginary mode is the reaction coordinate).  Both stationary points
    get a mass-weighted :func:`observables.normal_modes` analysis;
    modes with ``|omega| <= zero_tol`` (rigid-body translations/
    rotations) are excluded on both sides.  The result is NaN — loud,
    never silently wrong — unless the saddle has EXACTLY one imaginary
    mode, the minimum has none, and the excluded-zero-mode counts
    match (a saddle from :func:`climbing_neb` at loose convergence, or
    mismatched cluster orientations, trips this).

    This is the no-recrossing upper bound of classical rate theory
    (exact TST flux through the dividing surface, harmonic wells);
    compare :func:`vaemolsim_tpu.msm.mfpt` or weighted-ensemble rates
    for dynamically corrected numbers.
    """
    from vaemolsim_tpu.observables import normal_modes

    w_min, _ = normal_modes(potential, x_min, masses=masses)
    w_sad, _ = normal_modes(potential, x_saddle, masses=masses)

    pos_min = w_min > zero_tol
    pos_sad = w_sad > zero_tol
    neg_min = w_min < -zero_tol
    neg_sad = w_sad < -zero_tol
    ok = ((jnp.sum(neg_min) == 0)
          & (jnp.sum(neg_sad) == 1)
          & (jnp.sum(pos_min) == jnp.sum(pos_sad) + 1))

    log_prod_min = jnp.sum(jnp.where(pos_min, jnp.log(jnp.abs(w_min)),
                                     0.0))
    log_prod_sad = jnp.sum(jnp.where(pos_sad, jnp.log(jnp.abs(w_sad)),
                                     0.0))
    de = (jnp.reshape(potential(x_saddle), ())
          - jnp.reshape(potential(x_min), ()))
    log_k = (log_prod_min - log_prod_sad - jnp.log(2.0 * jnp.pi)
             - de / kt)
    return jnp.where(ok, jnp.exp(log_k), jnp.nan)
