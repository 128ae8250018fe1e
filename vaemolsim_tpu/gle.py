"""Generalized Langevin (colored-noise) thermostats.

Beyond-reference capability: the GLE thermostat of Ceriotti, Bussi &
Parrinello (2009-2010) — Markovian embedding of the non-Markovian
generalized Langevin equation.  Each momentum is coupled to ``n_s``
auxiliary momenta ``s`` and the joint ``(1 + n_s)``-vector undergoes a
linear Ornstein-Uhlenbeck process

    ``d[p; s] = -A [p; s] dt + B dW,    A C + C A^T = B B^T``

whose memory kernel ``K(t) = 2 a_pp delta(t) + a_p^T e^{-|t| A_s}
bar{a}_p`` is shaped entirely by the drift matrix ``A``.  With a
general stationary covariance ``C`` (not ``kT I``) the same machinery
gives quantum-style thermostats (custom frequency-dependent effective
temperatures); with ``A = [[gamma]]`` it reduces EXACTLY to white-noise
Langevin.

TPU-first design: the thermostat step is EXACT for any ``dt`` — the
propagator ``T = expm(-A dt)`` and noise factor ``S`` with
``S S^T = C - T C T^T`` are computed once on the host (tiny
``(1+n_s)^2`` matrices, scipy/numpy), and on device the O-step is one
``(1+n_s, 1+n_s)`` matmul over the trailing auxiliary axis plus one
Gaussian draw — identical cost profile to the repo's other thermostats
and batching over replicas/atoms/components as pure MXU work.  The
integrator arranges B-A-O-A-B exactly like :func:`vaemolsim_tpu.md.baoab`
(mass-scaled momenta ``p / sqrt(m)`` so one ``T`` serves every atom).

Exactness anchors (tests): stationary covariance of the full ``(p, s)``
vector equals ``C`` for arbitrary stable ``A`` (the fluctuation-
dissipation construction), harmonic-well equipartition under strong
memory, exact white-noise reduction, and a custom-``C`` stationary
state.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vaemolsim_tpu.md import _force_fn, _masses_arr

Array = jax.Array

__all__ = ["GLEState", "gle_matrices", "white_noise_matrix",
           "exp_memory_matrix", "gle_baoab"]


class GLEState(NamedTuple):
    """Positions, velocities, auxiliary momenta
    ``s (..., n_atoms, dim, n_s)`` (mass-scaled units), cached force."""
    x: Array
    v: Array
    s: Array
    force: Array


def white_noise_matrix(friction: float) -> np.ndarray:
    """``A = [[gamma]]`` (no auxiliary momenta): the exact white-noise
    Langevin limit — :func:`gle_baoab` then reproduces
    :func:`vaemolsim_tpu.md.baoab` statistics."""
    return np.array([[float(friction)]])


def exp_memory_matrix(friction: float, tau: float) -> np.ndarray:
    """One-auxiliary drift matrix for a pure exponential memory kernel
    ``K(t) = (gamma / tau) exp(-t / tau)`` (total friction
    ``integral K = gamma``):

        ``A = [[0, sqrt(gamma/tau)], [-sqrt(gamma/tau), 1/tau]]``

    — no instantaneous (Markovian) friction at all; all dissipation
    arrives through the memory channel.  Large ``tau`` at fixed
    ``gamma`` gives strongly non-Markovian dynamics (velocity
    autocorrelations develop structure white noise cannot produce).
    """
    a = np.sqrt(float(friction) / float(tau))
    return np.array([[0.0, a], [-a, 1.0 / tau]])


def _expm_scaled(m: np.ndarray) -> np.ndarray:
    """Host float64 matrix exponential by scaling-and-squaring over a
    Taylor series.  A raw Taylor series alone diverges catastrophically
    for moderate ``||m||`` (e.g. ``gamma*dt = 40`` gave ``-7.5e15``
    instead of ``4.2e-18``); scaling to ``||m/2^s|| <= 0.5`` first
    keeps every term well-conditioned, then ``s`` squarings restore the
    full exponent."""
    norm = np.linalg.norm(m, 1)
    s = max(0, int(np.ceil(np.log2(max(norm, 1e-300)))) + 1) if norm > 0.5 else 0
    a = m / (2.0 ** s)
    t = np.eye(m.shape[0])
    term = np.eye(m.shape[0])
    for k in range(1, 30):
        term = term @ a / k
        t = t + term
    for _ in range(s):
        t = t @ t
    return t


def gle_matrices(a_matrix, dt: float, kT: float,
                 c_matrix=None) -> Tuple[np.ndarray, np.ndarray]:
    """Exact OU propagator pair ``(T, S)`` for time ``dt``:
    ``T = expm(-A dt)`` and ``S`` with ``S S^T = C - T C T^T`` (host-
    side, float64).  ``C`` defaults to ``kT I`` (classical FDT); pass a
    custom symmetric ``c_matrix`` for generalized (e.g. quantum-style)
    stationary covariances.  Raises if ``A`` is not stable (the OU
    covariance equation then has no PSD solution)."""
    a = np.asarray(a_matrix, np.float64)
    if a.ndim != 2 or a.shape[0] != a.shape[1]:
        raise ValueError(f"a_matrix must be square, got {a.shape}")
    n = a.shape[0]
    c = (kT * np.eye(n) if c_matrix is None
         else np.asarray(c_matrix, np.float64))
    if c.shape != a.shape:
        raise ValueError(f"c_matrix shape {c.shape} != A shape {a.shape}")
    if np.any(np.real(np.linalg.eigvals(a)) < -1e-12):
        raise ValueError("a_matrix must be stable (eigenvalues with "
                         "non-negative real part)")
    try:
        from scipy.linalg import expm
        t = expm(-a * float(dt))
    except Exception:                           # scipy-free fallback
        t = _expm_scaled(-a * float(dt))
    cov = c - t @ c @ t.T
    cov = 0.5 * (cov + cov.T)
    w, v = np.linalg.eigh(cov)
    # A genuinely indefinite cov means (A, C) is NOT a valid stationary
    # OU pair (A C + C A^T must be PSD — e.g. quantum-thermostat C
    # matrices are FITTED jointly with A).  Clipping would silently
    # thermostat to a different covariance; refuse loudly instead.
    if w.min() < -1e-8 * max(w.max(), 1e-30):
        raise ValueError(
            "(a_matrix, c_matrix) is not a valid stationary OU pair: "
            "A C + C A^T has negative eigenvalues, so no noise B "
            f"exists (got discrete-cov eigenvalues {w})")
    s = v @ np.diag(np.sqrt(np.maximum(w, 0.0)))
    return t, s


def gle_baoab(potential: Callable[[Array], Array], x0: Array,
              v0: Array, key: Array, *, dt: float, n_steps: int,
              kT: float, a_matrix, c_matrix=None, masses=1.0,
              s0: Optional[Array] = None, collect_every: int = 0,
              collect_v: bool = False
              ) -> Tuple[GLEState, Optional[Array]]:
    """Colored-noise NVT dynamics: B half-kick, A half-drift, exact
    GLE O-step on ``(p/sqrt(m), s)``, A half-drift, B half-kick.

    ``a_matrix``: ``(1 + n_s, 1 + n_s)`` drift matrix (see
    :func:`white_noise_matrix`, :func:`exp_memory_matrix`, or matrices
    fitted with the GLE4MD tools).  ``c_matrix``: optional stationary
    covariance (defaults to classical ``kT I``).  Auxiliary momenta
    start from their exact stationary Gaussian unless ``s0`` (e.g. a
    previous segment's ``GLEState.s``) is given, so there is no
    thermostat transient.  Samples ``exp(-U/kT)`` configurationally
    for the classical ``C``; with memory, DYNAMICS change (that is the
    point) but the sampled ensemble does not (pinned by test).
    """
    if collect_every and n_steps % collect_every != 0:
        raise ValueError("n_steps must be a multiple of collect_every")
    x0, v0 = jnp.asarray(x0), jnp.asarray(v0)
    a_np = np.asarray(a_matrix, np.float64)
    n_tot = a_np.shape[0]
    n_s = n_tot - 1
    t_np, s_np = gle_matrices(a_np, dt, kT, c_matrix)
    c_np = (kT * np.eye(n_tot) if c_matrix is None
            else np.asarray(c_matrix, np.float64))
    t_m = jnp.asarray(t_np, x0.dtype)
    s_m = jnp.asarray(s_np, x0.dtype)
    force = _force_fn(potential)
    m = _masses_arr(masses, x0)
    sqrt_m = jnp.sqrt(m)
    dtj = jnp.asarray(dt, x0.dtype)

    def o_step(v, s, k):
        # Joint (..., n, d, 1 + n_s) vector in mass-scaled momenta.
        vec = jnp.concatenate([(v * sqrt_m)[..., None], s], axis=-1)
        xi = jax.random.normal(k, vec.shape, vec.dtype)
        vec = (jnp.einsum("ab,...b->...a", t_m, vec)
               + jnp.einsum("ab,...b->...a", s_m, xi))
        return vec[..., 0] / sqrt_m, vec[..., 1:]

    def one(st: GLEState, k) -> GLEState:
        v = st.v + 0.5 * dtj * st.force / m               # B
        x = st.x + 0.5 * dtj * v                          # A
        v, s = o_step(v, st.s, k)                         # O (exact)
        x = x + 0.5 * dtj * v                             # A
        _, f = force(x)
        v = v + 0.5 * dtj * f / m                         # B
        return GLEState(x=x, v=v, s=s, force=f)

    _, f0 = force(x0)
    if s0 is None:
        ks, key = jax.random.split(jnp.asarray(key))
        if n_s > 0:
            # Stationary marginal of the auxiliary block: C_ss.
            w, vec = np.linalg.eigh(0.5 * (c_np[1:, 1:]
                                           + c_np[1:, 1:].T))
            half = vec @ np.diag(np.sqrt(np.maximum(w, 0.0)))
            xi = jax.random.normal(ks, x0.shape + (n_s,), x0.dtype)
            s0 = jnp.einsum("ab,...b->...a",
                            jnp.asarray(half, x0.dtype), xi)
        else:
            s0 = jnp.zeros(x0.shape + (0,), x0.dtype)
    init = GLEState(x=x0, v=v0, s=jnp.asarray(s0), force=f0)
    keys = jax.random.split(key, n_steps)

    if collect_every:
        keys = keys.reshape(n_steps // collect_every, collect_every,
                            *keys.shape[1:])

        def body(st, ks_):
            st, _ = jax.lax.scan(lambda s_, k: (one(s_, k), None), st,
                                 ks_)
            return st, (st.x, st.v) if collect_v else st.x

        return jax.lax.scan(body, init, keys)
    out, _ = jax.lax.scan(lambda s_, k: (one(s_, k), None), init, keys)
    return out, None
