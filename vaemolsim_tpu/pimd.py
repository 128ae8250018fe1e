"""Path-integral molecular dynamics: PIMD, RPMD and TRPMD.

Beyond-reference capability (the reference is classical-only,
/root/reference/vaemolsim/mcmc.py): nuclear quantum effects —
zero-point energy, tunneling broadening, quantum heat capacities — via
the imaginary-time path-integral isomorphism (Feynman; Parrinello &
Rahman 1984): each quantum particle becomes a ring polymer of ``P``
classical beads joined by harmonic springs of frequency
``omega_P = P kT / hbar``, and classical sampling of the extended
system at ``P kT`` spring stiffness yields exact quantum Boltzmann
statistics as ``P -> inf``.

TPU-first design
----------------
The bead axis is ONE MORE BATCH AXIS: arrays are
``(..., P, n_atoms, dim)`` and the :mod:`vaemolsim_tpu.potentials`
contract (``potential(x) -> (...,)`` over ``(..., n, d)``) applies to
every bead with no code changes — forces for all beads of all replicas
are one vjp.  The free-ring-polymer part of the dynamics is solved
EXACTLY in normal-mode coordinates: the bead<->mode change of basis is
a single orthonormal ``(P, P)`` matmul over the bead axis (MXU work,
not an FFT butterfly — at molecular ``P`` of 8-256 one matmul beats
staged FFTs on TPU and needs no complex dtype), and each mode then
evolves analytically as an independent harmonic oscillator.  No inner
Python loops; whole trajectories are one ``lax.scan``.

Integrators
-----------
- :func:`rpmd_nve` — symplectic ring-polymer MD (Craig & Manolopoulos
  2004): half-kick with the physical force, exact free-ring evolution
  in normal modes, half-kick.  Conserves the ring-polymer Hamiltonian;
  the basis of RPMD approximate quantum dynamics (Kubo-transformed
  correlation functions, rates).
- :func:`pimd_pile` — PILE-thermostatted sampling (Ceriotti,
  Parrinello, Markland & Manolopoulos 2010): Langevin on normal modes
  with the optimal mode-specific frictions ``gamma_k = 2 omega_k`` and
  a tunable centroid friction ``1/tau0``, arranged BAOAB-style
  (B half-kick, A half free-ring, O full thermostat, A, B) to match
  this repo's classical :func:`vaemolsim_tpu.md.baoab`.
- :func:`trpmd` — :func:`pimd_pile` with the centroid thermostat OFF
  (Rossi, Ceriotti & Manolopoulos 2014): internal modes thermostatted,
  centroid Hamiltonian — the standard choice for spectra/rates.

Estimators
----------
:func:`energy_primitive` (Barker) and :func:`energy_virial`
(centroid-virial, Herman-Bruskin-Berne) measure the quantum total
energy; the virial form's variance is P-independent and is the one to
use.  :func:`radius_of_gyration2` measures quantum delocalization.

Conventions: reduced units with ``hbar`` explicit (default 1);
``kT`` is the PHYSICAL temperature; per-atom ``masses`` broadcast as
``(n_atoms, 1)``.  The literature-standard RPMD phase-space convention
is used throughout: the ring-polymer Hamiltonian carries the full
``U(x_j)`` per bead with springs ``m omega_P^2 = m (P kT / hbar)^2``,
and its canonical ensemble is at ``P kT`` — so bead VELOCITIES are
Maxwellian at ``P kT``, which is what the thermostats target and
:func:`init_thermal_ring` draws (the configurational marginal is the
exact P-bead quantum Boltzmann distribution at the physical ``kT``
either way; this convention keeps RPMD time literature-standard).
Exactness anchors (tests): finite-P harmonic statistics against the
closed-form normal-mode Gaussians, free-particle virial identity,
ring-Hamiltonian conservation, and the P -> inf limit against
``(hbar w / 2) coth(beta hbar w / 2)``.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vaemolsim_tpu.md import MDState, _force_fn, _masses_arr

Array = jax.Array

__all__ = ["RPMDState", "normal_mode_matrix", "ring_frequencies",
           "spring_energy", "ring_hamiltonian",
           "energy_primitive", "energy_virial", "radius_of_gyration2",
           "init_thermal_ring", "rpmd_nve", "pimd_pile", "trpmd"]


class RPMDState(NamedTuple):
    """Bead positions/velocities ``(..., P, n_atoms, dim)`` plus the
    cached PHYSICAL force (``-grad U`` per bead; the spring force is
    never materialized — free-ring motion is exact in normal modes)."""
    x: Array
    v: Array
    force: Array


def normal_mode_matrix(n_beads: int) -> np.ndarray:
    """Orthonormal bead->mode transform ``C`` of shape ``(P, P)``.

    Rows are the real discrete-Fourier modes of the ring: row 0 the
    centroid ``1/sqrt(P)``, rows ``1..P//2`` cosines, row ``P/2`` the
    alternating mode (even P), rows ``P//2+1..P-1`` sines.  Built so
    that row ``k`` has free-ring frequency ``2 omega_P sin(pi k / P)``
    for EVERY k (the sine row ``k`` pairs with cosine row ``P - k``,
    whose frequency is the same).  Applied as
    ``q = einsum('kj,...jnd->...knd', C, x)`` — one matmul over the
    bead axis.  NumPy/static: ``P`` is a compile-time constant.
    """
    p = int(n_beads)
    if p < 1:
        raise ValueError(f"n_beads must be >= 1, got {p}")
    j = np.arange(p)
    c = np.zeros((p, p))
    c[0] = 1.0 / math.sqrt(p)
    for k in range(1, p // 2 + 1):
        if 2 * k == p:
            c[k] = (-1.0) ** j / math.sqrt(p)
        else:
            c[k] = math.sqrt(2.0 / p) * np.cos(2.0 * math.pi * k * j / p)
    for k in range(p // 2 + 1, p):
        c[k] = math.sqrt(2.0 / p) * np.sin(2.0 * math.pi * (p - k) * j / p)
    return c


def ring_frequencies(n_beads: int, kT: float,
                     hbar: float = 1.0) -> Tuple[float, np.ndarray]:
    """``(omega_P, omega_k)``: the spring frequency ``P kT / hbar`` and
    the ``(P,)`` free-ring normal-mode frequencies
    ``2 omega_P sin(pi k / P)`` (``omega_0 = 0`` is the centroid),
    indexed to match :func:`normal_mode_matrix` rows."""
    p = int(n_beads)
    omega_p = p * kT / hbar
    k = np.arange(p)
    return omega_p, 2.0 * omega_p * np.sin(math.pi * k / p)


def _to_modes(c: Array, x: Array) -> Array:
    return jnp.einsum("kj,...jnd->...knd", c, x)


def _to_beads(c: Array, q: Array) -> Array:
    return jnp.einsum("jk,...jnd->...knd", c, q)


def spring_energy(x: Array, *, kT: float, hbar: float = 1.0,
                  masses=1.0) -> Array:
    """Harmonic inter-bead spring energy
    ``sum_j m omega_P^2 |x_j - x_{j+1}|^2 / 2`` per replica (reduces
    the bead, atom and coordinate axes of ``(..., P, n, d)``)."""
    m = _masses_arr(masses, x)
    omega_p = x.shape[-3] * kT / hbar
    diff = x - jnp.roll(x, shift=-1, axis=-3)
    return 0.5 * omega_p * omega_p * jnp.sum(m * diff * diff,
                                             axis=(-3, -2, -1))


def ring_hamiltonian(potential: Callable[[Array], Array], x: Array,
                     v: Array, *, kT: float, hbar: float = 1.0,
                     masses=1.0) -> Array:
    """The conserved quantity of :func:`rpmd_nve`:
    ``sum_beads [KE_j + U(x_j)] + E_spring`` per replica."""
    m = _masses_arr(masses, x)
    ke = 0.5 * jnp.sum(m * v * v, axis=(-3, -2, -1))
    return (ke + spring_energy(x, kT=kT, hbar=hbar, masses=masses)
            + jnp.sum(potential(x), axis=-1))


def energy_primitive(potential: Callable[[Array], Array], x: Array, *,
                     kT: float, hbar: float = 1.0, masses=1.0) -> Array:
    """Barker primitive estimator of the quantum total energy,
    instantaneous per replica:

        ``d n P kT / 2  -  E_spring(x) / P  +  (1/P) sum_j U(x_j)``

    (the ``1/P`` converts :func:`spring_energy`'s ring-Hamiltonian
    springs ``m omega_P^2`` to the physical-temperature estimator
    stiffness ``m P / (beta hbar)^2``).  Unbiased at any P for the
    P-bead discretized system, but its variance GROWS linearly with P
    (two large terms cancel); prefer :func:`energy_virial` for
    production averages.
    """
    p, n, d = x.shape[-3:]
    u = jnp.mean(potential(x), axis=-1)
    return (0.5 * d * n * p * kT
            - spring_energy(x, kT=kT, hbar=hbar, masses=masses) / p + u)


def energy_virial(potential: Callable[[Array], Array], x: Array, *,
                  kT: float, masses=1.0) -> Array:
    """Centroid-virial estimator of the quantum total energy,
    instantaneous per replica:

        ``d n kT / 2  +  (1/2P) sum_j (x_j - xbar) . grad U(x_j)
          +  (1/P) sum_j U(x_j)``

    Variance is P-independent (only the quantum fluctuation part is
    measured; the classical ``d n kT / 2`` is exact).  For a free
    particle the gradient term vanishes identically and the kinetic
    part is exactly ``d n kT / 2``.  ``masses`` is accepted for
    signature symmetry but unused (the virial form is mass-free).
    """
    del masses
    p, n, d = x.shape[-3:]
    u, vjp = jax.vjp(potential, x)
    (g,) = vjp(jnp.ones_like(u))
    centroid = jnp.mean(x, axis=-3, keepdims=True)
    vir = jnp.sum((x - centroid) * g, axis=(-3, -2, -1)) / (2.0 * p)
    return 0.5 * d * n * kT + vir + jnp.mean(u, axis=-1)


def radius_of_gyration2(x: Array) -> Array:
    """Per-atom squared radius of gyration of the ring,
    ``(1/P) sum_j |x_j - xbar|^2`` of shape ``(..., n_atoms)`` — the
    standard measure of quantum delocalization (0 in the classical
    ``P = 1`` / high-temperature limit)."""
    centroid = jnp.mean(x, axis=-3, keepdims=True)
    return jnp.mean(jnp.sum((x - centroid) ** 2, axis=-1), axis=-2)


def init_thermal_ring(key: Array, x: Array, *, n_beads: int, kT: float,
                      hbar: float = 1.0, masses=1.0,
                      dtype=None) -> Tuple[Array, Array]:
    """Exact free-ring-polymer thermal initialization around classical
    positions ``x`` of shape ``(..., n_atoms, dim)``.

    Returns ``(x_beads, v_beads)`` of shape ``(..., P, n_atoms, dim)``:
    internal normal modes drawn from their ring-ensemble Gaussians
    ``q_k ~ N(0, P kT / (m omega_k^2))`` (the exact free-ring marginal
    — the ring canonical ensemble lives at ``P kT``, see module
    docstring; centroid pinned at ``x``), velocities iid
    ``N(0, P kT / m)`` per bead component (kinetic part is diagonal in
    either basis).  This removes the ring-breathing equilibration
    transient entirely for harmonic internal modes.
    """
    if dtype is None:
        dtype = jnp.asarray(x).dtype
    p = int(n_beads)
    x = jnp.asarray(x, dtype)
    m = _masses_arr(masses, x)
    c = jnp.asarray(normal_mode_matrix(p), dtype)
    _, omega_k = ring_frequencies(p, kT, hbar)
    kT = p * kT                                # ring ensemble is at P kT
    kq, kv = jax.random.split(key)
    shape = x.shape[:-2] + (p,) + x.shape[-2:]
    if p > 1:
        sigma = jnp.sqrt(kT / m) / jnp.asarray(omega_k[1:, None, None],
                                               dtype)
        q_int = sigma * jax.random.normal(
            kq, shape[:-3] + (p - 1,) + shape[-2:], dtype)
    q0 = math.sqrt(p) * x[..., None, :, :]     # centroid row of C
    q = q0 if p == 1 else jnp.concatenate([q0, q_int], axis=-3)
    v = jnp.sqrt(kT / m) * jax.random.normal(kv, shape, dtype)
    return _to_beads(c, q), v


def _free_ring_step(c: Array, omega_k: Array, dt) -> Callable:
    """Exact free-ring propagator for time ``dt``: transform to modes,
    rotate each (q, v) pair at its frequency (centroid drifts), back.
    Mass cancels: mode frequencies are mass-independent because spring
    constants are ``m omega_P^2``."""
    w = omega_k[:, None, None]                 # (P, 1, 1) vs (..., P, n, d)
    cos = jnp.cos(w * dt)
    # sin(w t)/w with the w -> 0 (centroid) limit t, branch-free.
    safe_w = jnp.where(w == 0.0, 1.0, w)
    sinc = jnp.where(w == 0.0, dt, jnp.sin(w * dt) / safe_w)
    wsin = jnp.where(w == 0.0, 0.0, w * jnp.sin(w * dt))

    def step(x: Array, v: Array) -> Tuple[Array, Array]:
        q, u = _to_modes(c, x), _to_modes(c, v)
        q, u = cos * q + sinc * u, cos * u - wsin * q
        return _to_beads(c, q), _to_beads(c, u)

    return step


def _pimd_dispatch(potential, x0, v0, *, kT, hbar, masses, dt, n_steps,
                   collect_every, collect_v, keys, gamma0, tau0):
    """Shared RPMD/PILE driver.  ``keys=None`` -> NVE (no O step):
    B half, A(dt) exact free ring, B half.  With keys: B half, A(dt/2),
    O full PILE, A(dt/2), B half — the BAOAB arrangement of Ceriotti et
    al. 2010's mode-resolved Langevin thermostat."""
    if collect_every and n_steps % collect_every != 0:
        raise ValueError("n_steps must be a multiple of collect_every")
    x0 = jnp.asarray(x0)
    p = x0.shape[-3]
    force = _force_fn(lambda x: jnp.sum(potential(x), axis=-1))
    m = _masses_arr(masses, x0)
    dt = jnp.asarray(dt, x0.dtype)
    c = jnp.asarray(normal_mode_matrix(p), x0.dtype)
    _, omega_np = ring_frequencies(p, kT, hbar)
    omega_k = jnp.asarray(omega_np, x0.dtype)

    if keys is None:
        drift = _free_ring_step(c, omega_k, dt)

        def one(s, _):
            v = s.v + 0.5 * dt * s.force / m            # B
            x, v = drift(s.x, v)                        # A (exact, dt)
            _, f = force(x)
            return RPMDState(x, v + 0.5 * dt * f / m, f), None
    else:
        drift = _free_ring_step(c, omega_k, 0.5 * dt)
        # PILE frictions: gamma_k = 2 omega_k internal, gamma0 centroid.
        gam = 2.0 * omega_k
        gam = gam.at[0].set(0.0 if gamma0 is None else 1.0 / tau0)
        c1 = jnp.exp(-gam * dt)[:, None, None]
        # Ring canonical ensemble lives at P kT (module docstring).
        c2 = jnp.sqrt(p * kT * (1.0 - c1 * c1) / m)

        def one(s, k):
            v = s.v + 0.5 * dt * s.force / m            # B
            x, v = drift(s.x, v)                        # A
            u = _to_modes(c, v)                         # O on modes
            u = c1 * u + c2 * jax.random.normal(k, u.shape, u.dtype)
            v = _to_beads(c, u)
            x, v = drift(x, v)                          # A
            _, f = force(x)
            return RPMDState(x, v + 0.5 * dt * f / m, f), None

    _, f0 = force(x0)
    init = RPMDState(x0, jnp.asarray(v0, x0.dtype), f0)
    xs = (None if keys is None
          else jax.random.split(keys, n_steps))

    if collect_every:
        if xs is not None:
            xs = xs.reshape(n_steps // collect_every, collect_every,
                            *xs.shape[1:])

        def body(s, ks):
            s, _ = jax.lax.scan(lambda s, k: one(s, k), s, ks,
                                length=collect_every)
            return s, (s.x, s.v) if collect_v else s.x

        return jax.lax.scan(body, init, xs,
                            length=n_steps // collect_every)
    out, _ = jax.lax.scan(one, init, xs, length=n_steps)
    return out, None


def rpmd_nve(potential: Callable[[Array], Array], x0: Array, v0: Array,
             *, dt: float, n_steps: int, kT: float, hbar: float = 1.0,
             masses=1.0, collect_every: int = 0,
             collect_v: bool = False
             ) -> Tuple[RPMDState, Optional[Array]]:
    """Symplectic ring-polymer MD (Craig & Manolopoulos 2004): exact
    free-ring normal-mode evolution between physical half-kicks.

    ``kT`` sets the SPRING STIFFNESS (``omega_P = P kT / hbar``) — the
    ring-polymer Hamiltonian (:func:`ring_hamiltonian` at this ``kT``)
    is conserved; there is no thermostat.  Initialize from
    :func:`pimd_pile` samples (or :func:`init_thermal_ring`) to compute
    RPMD approximations to Kubo-transformed correlation functions.
    Shapes as :func:`pimd_pile`.
    """
    return _pimd_dispatch(potential, x0, v0, kT=kT, hbar=hbar,
                          masses=masses, dt=dt, n_steps=n_steps,
                          collect_every=collect_every,
                          collect_v=collect_v, keys=None, gamma0=None,
                          tau0=None)


def pimd_pile(potential: Callable[[Array], Array], x0: Array,
              v0: Array, key: Array, *, dt: float, n_steps: int,
              kT: float, hbar: float = 1.0, masses=1.0,
              tau0: float = 1.0, collect_every: int = 0,
              collect_v: bool = False
              ) -> Tuple[RPMDState, Optional[Array]]:
    """PILE-thermostatted PIMD sampling of exact quantum Boltzmann
    statistics at the P-bead discretization level.

    ``x0, v0``: ``(..., P, n_atoms, dim)`` bead arrays (see
    :func:`init_thermal_ring`).  Each internal normal mode gets its
    optimal white-noise friction ``gamma_k = 2 omega_k`` (critically
    coupled to the free-ring frequency); the centroid gets
    ``gamma_0 = 1 / tau0`` with ``tau0`` a physical correlation time.
    One force vjp + one Gaussian draw + two (P, P) matmul pairs per
    step, scanned on device.  Trajectory averages of
    :func:`energy_virial` / :func:`radius_of_gyration2` over the
    collected positions converge to the finite-P quantum values (pinned
    by closed-form harmonic tests).
    """
    return _pimd_dispatch(potential, x0, v0, kT=kT, hbar=hbar,
                          masses=masses, dt=dt, n_steps=n_steps,
                          collect_every=collect_every,
                          collect_v=collect_v, keys=key, gamma0=1.0,
                          tau0=tau0)


def trpmd(potential: Callable[[Array], Array], x0: Array, v0: Array,
          key: Array, *, dt: float, n_steps: int, kT: float,
          hbar: float = 1.0, masses=1.0, collect_every: int = 0,
          collect_v: bool = False
          ) -> Tuple[RPMDState, Optional[Array]]:
    """Thermostatted RPMD (Rossi, Ceriotti & Manolopoulos 2014):
    :func:`pimd_pile` with the CENTROID thermostat off — internal modes
    are PILE-damped (killing the spurious spring resonances that
    contaminate RPMD spectra) while centroid dynamics stays
    Hamiltonian, preserving the short-time accuracy of Kubo-transformed
    correlation functions."""
    return _pimd_dispatch(potential, x0, v0, kT=kT, hbar=hbar,
                          masses=masses, dt=dt, n_steps=n_steps,
                          collect_every=collect_every,
                          collect_v=collect_v, keys=key, gamma0=None,
                          tau0=None)
