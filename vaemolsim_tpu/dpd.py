"""Dissipative particle dynamics — mesoscale dynamics for the CG
representations this library exists to build.

The reference maps molecules to CG sites (vaemolsim/mappings.py:169-305)
but has no dynamics to run ON the CG scale; DPD (Hoogerbrugge &
Koelman 1992; Groot & Warren, J. Chem. Phys. 107, 4423 (1997)) is the
standard choice there: soft conservative repulsion plus a PAIRWISE
thermostat whose dissipative/random forces act along interparticle
lines, so total momentum is conserved exactly and hydrodynamics is
preserved (unlike Langevin/BAOAB, which damps collective flow).

Forces between particles i, j with e = r_ij / |r_ij|, w(r) = 1 - r/r_c
inside the cutoff (0 outside):

    F^C = a_ij w e                      (soft repulsion)
    F^D = -gamma w^2 (e . v_ij) e       (dissipative)
    F^R = sigma w theta_ij e / sqrt(dt) (random; theta_ij = theta_ji)

with the fluctuation-dissipation tie sigma^2 = 2 gamma kT (Espanol &
Warren 1995).  TPU-native layout: one (N, N, 3) broadcast difference
tensor, minimum-image wrap, and reductions — the same dense static-mask
form as :func:`~vaemolsim_tpu.potentials.lennard_jones`; the symmetric
noise matrix is one normal draw symmetrized as (A + A^T)/sqrt(2).
Antisymmetry of all three terms under i <-> j makes momentum
conservation exact by construction (theta symmetric, e odd, e.v_ij
even).

Integrator: the Groot-Warren modified velocity Verlet (lambda-predictor
for the velocity-dependent force, one force evaluation per step,
GW 1997 eqs. 13-16).  At gamma = 0 and kT = 0 it reduces exactly to
velocity Verlet on the conservative soft potential
(:func:`soft_pair_energy`).  The known GW artifact applies: kinetic
temperature overshoots ~O((gamma dt)^2); keep gamma dt <~ 0.05 for
sub-percent accuracy.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from vaemolsim_tpu.md import MDState, _masses_arr

Array = jax.Array

__all__ = ["soft_pair_energy", "dpd_forces", "dpd_vv"]

_EPS = 1e-12


def _pair_geometry(x: Array, r_cut: float, box):
    """Minimum-image pair vectors, distances, unit vectors, and the
    DPD weight w = max(1 - r/r_c, 0) with the diagonal masked out."""
    n = x.shape[-2]
    d = x[..., :, None, :] - x[..., None, :, :]
    if box is not None:
        box_arr = jnp.asarray(box, x.dtype)
        d = d - box_arr * jnp.round(d / box_arr)
    r2 = jnp.sum(d * d, axis=-1)
    off_diag = ~jnp.eye(n, dtype=bool)
    # Coincident/diagonal pairs: floor r before dividing so e stays
    # finite; their weight is zeroed by the mask anyway.
    r = jnp.sqrt(jnp.maximum(r2, _EPS))
    e = d / r[..., None]
    w = jnp.where(off_diag, jnp.maximum(1.0 - r / r_cut, 0.0), 0.0)
    return e, w


def soft_pair_energy(a=25.0, *, r_cut: float = 1.0,
                     box=None) -> Callable[[Array], Array]:
    """Conservative DPD energy ``sum_{i<j} a_ij r_c/2 (1 - r/r_c)^2``
    (the potential whose gradient is ``-F^C``).  ``a``: scalar or
    (n, n) per-pair repulsion matrix (species-dependent ``a_ij`` is how
    DPD encodes chemistry — Groot-Warren eq. 25 maps it to
    Flory-Huggins chi).  Returns a ``potentials``-contract callable
    ``x -> energy`` usable with every sampler in the framework.
    """
    a = jnp.asarray(a)

    def energy(x: Array) -> Array:
        _, w = _pair_geometry(x, r_cut, box)
        aij = a.astype(x.dtype)   # match dpd_forces' precision under x64
        u = 0.5 * aij * (r_cut / 2.0) * w * w  # 0.5: double-counted pairs
        return jnp.sum(u, axis=(-2, -1))

    return energy


def dpd_forces(x: Array, v: Array, theta: Array, *,
               a, gamma, kT: float, dt: float,
               r_cut: float = 1.0, box=None) -> Array:
    """Total DPD force (N, 3) at one instant.

    ``theta``: (n, n) SYMMETRIC standard-normal matrix (see
    :func:`dpd_vv` for the draw); ``a``/``gamma``: scalar or (n, n)
    per-pair.  The random-force amplitude is
    ``sigma = sqrt(2 gamma kT)`` — fluctuation-dissipation is built in,
    not a separate knob.
    """
    a = jnp.asarray(a, x.dtype)
    gamma = jnp.asarray(gamma, x.dtype)
    e, w = _pair_geometry(x, r_cut, box)
    v_ij = v[..., :, None, :] - v[..., None, :, :]
    ev = jnp.sum(e * v_ij, axis=-1)
    sigma = jnp.sqrt(2.0 * gamma * kT)
    mag = (a * w
           - gamma * w * w * ev
           + sigma * w * theta / jnp.sqrt(jnp.asarray(dt, x.dtype)))
    return jnp.sum(mag[..., None] * e, axis=-2)


def _symmetric_normal(key: Array, n: int, dtype) -> Array:
    """(n, n) matrix with theta_ij = theta_ji ~ N(0, 1): symmetrize an
    iid draw as (A + A^T)/sqrt(2) (off-diagonal variance exactly 1)."""
    aa = jax.random.normal(key, (n, n), dtype)
    return (aa + aa.T) / jnp.sqrt(jnp.asarray(2.0, dtype))


def dpd_vv(x0: Array, v0: Array, key: Array, *,
           n_steps: int, dt: float,
           a=25.0, gamma: float = 4.5, kT: float = 1.0,
           r_cut: float = 1.0, box=None, masses=1.0,
           lam: float = 0.5, collect_every: int = 0,
           collect_v: bool = False
           ) -> Tuple[MDState, Optional[Array]]:
    """Groot-Warren modified velocity Verlet DPD run, scanned on device.

    Per step: drift with the carried force, predict velocities with the
    ``lam`` factor (GW 1997 eq. 14; 0.5 recovers standard VV structure),
    evaluate the full force ONCE at the new positions/predicted
    velocities with a fresh symmetric noise matrix, correct velocities
    with the trapezoidal average.  ``collect_every``/``collect_v`` as in
    :func:`~vaemolsim_tpu.md.baoab`.

    Returns ``(MDState, trajectory-or-None)``.  Total momentum is
    conserved to summation roundoff; check kinetic temperature with
    :func:`~vaemolsim_tpu.md.temperature`.
    """
    if collect_every and n_steps % collect_every != 0:
        raise ValueError("n_steps must be a multiple of collect_every")
    x0 = jnp.asarray(x0)
    v0 = jnp.asarray(v0)
    m = _masses_arr(masses, x0)
    n = x0.shape[-2]
    dt = jnp.asarray(dt, x0.dtype)

    def force(x, v, k):
        theta = _symmetric_normal(k, n, x.dtype)
        return dpd_forces(x, v, theta, a=a, gamma=gamma, kT=kT,
                          dt=dt, r_cut=r_cut, box=box)

    def one(s: MDState, k) -> MDState:
        x = s.x + dt * s.v + 0.5 * dt * dt * s.force / m
        v_pred = s.v + lam * dt * s.force / m
        f_new = force(x, v_pred, k)
        v = s.v + 0.5 * dt * (s.force + f_new) / m
        return MDState(x=x, v=v, force=f_new)

    k_init, key = jax.random.split(key)
    f0 = force(x0, v0, k_init)
    init = MDState(x=x0, v=v0, force=f0)
    keys = jax.random.split(key, n_steps)

    if collect_every:
        keys = keys.reshape(n_steps // collect_every, collect_every,
                            *keys.shape[1:])

        def chunk(s, ks):
            def inner(s, k):
                return one(s, k), None

            s, _ = jax.lax.scan(inner, s, ks)
            return s, (s.x, s.v) if collect_v else s.x

        return jax.lax.scan(chunk, init, keys)

    def body(s, k):
        return one(s, k), None

    out, _ = jax.lax.scan(body, init, keys)
    return out, None
