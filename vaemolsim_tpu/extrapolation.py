"""Thermodynamic extrapolation: observables at unsampled temperatures
from fluctuations at one state point.

Beyond-reference capability squarely in the reference ecosystem: the
reference's author develops this methodology as its own library
(thermoextrap; cited from the vaemolsim README ecosystem), and it is
the natural consumer of the ensembles this package's MC/MD engines
produce.  The estimator: with samples at ``beta0``,

    <A>(beta) = <A e^{-d U}> / <e^{-d U}>,   d = beta - beta0,

whose Taylor coefficients in ``d`` follow from joint central moments
``<A dU^k>`` and ``<dU^k>`` by one series division (the generating-
function route — no hand-derived cumulant formulas at each order, any
order from the same code path).

TPU-first: all moments are computed in ONE pass as a matmul between the
(k, n_samples) power matrix of centered energies and the sample matrix
— batched over any number of observables, jit/grad-safe (static
``order``).  :func:`beta_reweight` provides the exact-in-expectation
perturbation estimate the extrapolation is validated against.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

__all__ = ["beta_extrapolation_coefficients", "beta_extrapolate",
           "beta_reweight"]


def _series_ratio(num: Array, den: Array) -> Array:
    """Coefficients of ``num(x)/den(x)`` truncated at the input order
    (``den[0]`` must be nonzero; here it is 1).  num: (K+1, ...),
    den: (K+1,)."""
    K = num.shape[0] - 1
    out = []
    for k in range(K + 1):
        acc = num[k]
        for j in range(k):
            acc = acc - out[j] * den[k - j]
        out.append(acc / den[0])
    return jnp.stack(out)


def beta_extrapolation_coefficients(a: Array, u: Array, order: int = 2
                                    ) -> Array:
    """Taylor coefficients ``c_k`` of ``<A>(beta0 + d) = sum_k c_k d^k``
    from samples at ``beta0``.

    ``a``: observable samples ``(n_samples, ...)`` (any trailing batch
    of observables shares the one energy series); ``u``: potential
    energies ``(n_samples,)`` in the same reduced units as beta.
    Returns ``(order+1, ...)``.  ``c_0`` is the sample mean; ``c_1`` is
    ``-Cov(A, U)``; higher orders come from the series division of the
    joint moment generating functions (exact at every order)."""
    if order < 0:
        raise ValueError(f"order must be >= 0, got {order}")
    a = jnp.asarray(a)
    u = jnp.asarray(u)
    if u.ndim != 1 or a.shape[0] != u.shape[0]:
        raise ValueError("a and u must share the leading sample axis; "
                         f"got {a.shape} vs {u.shape}")
    du = u - jnp.mean(u)
    # Power matrix (order+1, n): du^k, k = 0..order.
    pw = jnp.cumprod(
        jnp.concatenate([jnp.ones((1, u.shape[0]), u.dtype),
                         jnp.tile(du[None], (order, 1))]), axis=0) \
        if order > 0 else jnp.ones((1, u.shape[0]), u.dtype)
    fact = jnp.asarray([(-1.0) ** k / math.factorial(k)
                        for k in range(order + 1)], u.dtype)
    den = fact * jnp.mean(pw, axis=1)                     # (K+1,)
    flat = a.reshape(a.shape[0], -1)
    num = fact[:, None] * (pw @ flat) / u.shape[0]        # (K+1, B)
    c = _series_ratio(num, den)
    return c.reshape((order + 1,) + a.shape[1:])


def beta_extrapolate(a: Array, u: Array, beta0: float, betas,
                     order: int = 2) -> Array:
    """Extrapolate ``<A>`` from samples at ``beta0`` to each target in
    ``betas``: returns ``(len(betas), ...)`` (scalar ``betas`` gives
    ``a.shape[1:]``)."""
    betas_arr = jnp.atleast_1d(jnp.asarray(betas,
                                           jnp.asarray(u).dtype))
    c = beta_extrapolation_coefficients(a, u, order)      # (K+1, ...)
    d = betas_arr - beta0                                 # (M,)
    powers = d[:, None] ** jnp.arange(c.shape[0])         # (M, K+1)
    out = jnp.tensordot(powers, c, axes=[[1], [0]])       # (M, ...)
    return out[0] if jnp.ndim(betas) == 0 else out


def beta_reweight(a: Array, u: Array, beta0: float, betas
                  ) -> Tuple[Array, Array]:
    """Exact perturbation reweighting to each target beta:
    ``<A>_beta = <A w> / <w>`` with ``w = e^{-(beta-beta0) U}``
    (log-sum-exp stabilized).  Returns ``(estimates, ess)`` where
    ``ess`` is the per-target effective sample size — the reliability
    gauge extrapolation does not need but reweighting does."""
    a = jnp.asarray(a)
    u = jnp.asarray(u)
    betas_arr = jnp.atleast_1d(jnp.asarray(betas, u.dtype))
    logw = -(betas_arr[:, None] - beta0) * u[None, :]     # (M, n)
    logw = logw - jax.scipy.special.logsumexp(logw, axis=1,
                                              keepdims=True)
    w = jnp.exp(logw)                                     # normalized
    flat = a.reshape(a.shape[0], -1)
    est = (w @ flat).reshape((betas_arr.shape[0],) + a.shape[1:])
    ess = 1.0 / jnp.sum(w * w, axis=1)
    if jnp.ndim(betas) == 0:
        return est[0], ess[0]
    return est, ess
