"""MC chain diagnostics: autocorrelation, effective sample size, and
potential-scale-reduction (R-hat) over batched chains.

The reference only tracks an acceptance counter (vaemolsim/mcmc.py:48-50);
production sampling needs convergence diagnostics, so the TPU build adds
them as vectorized, jittable functions over ``(n_samples, n_chains, ...)``
trajectories (the output of ``run_mcmc(..., collect_every=k)``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

__all__ = ["autocorrelation", "effective_sample_size",
           "potential_scale_reduction", "block_averaging_error",
           "statistical_inefficiency"]


def autocorrelation(x: Array, max_lag: int = 100) -> Array:
    """Normalized autocorrelation over axis 0 (FFT-based).

    x: (T, ...) -> (min(max_lag, T-1) + 1, ...), rho[0] = 1.  (Lags
    beyond T-1 do not exist; requesting them returns the valid prefix
    rather than zero-padding artifacts.)
    """
    T = x.shape[0]
    max_lag = min(max_lag, T - 1)
    x = x - jnp.mean(x, axis=0, keepdims=True)
    n_fft = 1 << (2 * T - 1).bit_length()
    f = jnp.fft.rfft(x, n=n_fft, axis=0)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=n_fft, axis=0)[: max_lag + 1]
    return acov / jnp.maximum(acov[:1], 1e-30)


def effective_sample_size(x: Array, max_lag: int = 100) -> Array:
    """ESS per chain via Geyer initial-positive-sequence truncation.

    x: (T, ...) samples; returns (...) effective sample sizes.
    """
    T = x.shape[0]
    rho = autocorrelation(x, max_lag=min(max_lag, T - 1))
    # Sum consecutive-lag pairs; truncate at the first non-positive pair.
    L = rho.shape[0]
    pair_count = (L - 1) // 2
    pairs = rho[1:1 + 2 * pair_count]
    pair_sums = pairs[0::2] + pairs[1::2]  # (pair_count, ...)
    positive = pair_sums > 0.0
    keep = jnp.cumprod(positive.astype(rho.dtype), axis=0)
    tau = 1.0 + 2.0 * jnp.sum(pair_sums * keep, axis=0)
    ess = T / jnp.maximum(tau, 1.0 / T)
    # A zero-variance (stuck) chain has no information, not maximal
    # information: the normalized autocorrelation degenerates to 0 and
    # tau to 1, which would report ESS = T for the worst possible chain.
    var = jnp.var(x, axis=0)
    return jnp.where(var > 0.0, ess, jnp.nan)


def potential_scale_reduction(x: Array) -> Array:
    """Gelman–Rubin split R-hat.

    x: (T, n_chains, ...) -> (...); values near 1 indicate convergence.
    """
    T = x.shape[0] - (x.shape[0] % 2)
    half = T // 2
    # Split each chain in two.
    splits = jnp.concatenate([x[:half], x[half:T]], axis=1)  # (half, 2C, ...)
    chain_means = jnp.mean(splits, axis=0)
    chain_vars = jnp.var(splits, axis=0, ddof=1)
    W = jnp.mean(chain_vars, axis=0)
    B = half * jnp.var(chain_means, axis=0, ddof=1)
    var_hat = (half - 1) / half * W + B / half
    rhat = jnp.sqrt(var_hat / jnp.maximum(W, 1e-30))
    # Stuck chains (zero within-chain variance) must not read as
    # "converged": identical constants -> NaN (no information),
    # distinct constants -> +inf (definitely not mixed).
    degenerate = W <= 1e-30
    return jnp.where(degenerate,
                     jnp.where(B <= 1e-30, jnp.nan, jnp.inf), rhat)


def block_averaging_error(x: Array, n_levels: int = None) -> Array:
    """Flyvbjerg-Petersen blocking analysis: the standard error of the
    mean of a CORRELATED series, by repeated pairwise block averaging.

    x: (T, ...) samples; returns ``(n_levels + 1, ...)`` — the naive
    standard-error estimate ``sqrt(var / (n - 1))`` at each blocking
    level (level 0 = raw data).  For a correlated series the estimates
    RISE with level and plateau at the true error once blocks exceed
    the correlation time; report the plateau (e.g. ``max`` over levels
    with enough blocks).  Each level is one reshape-mean — the whole
    analysis is ~log2(T) reductions, jittable with a static level
    count."""
    x = jnp.asarray(x)
    T = x.shape[0]
    max_levels = max(int(T).bit_length() - 5, 1)  # keep >= ~16 blocks
    if n_levels is None:
        n_levels = max_levels
    n_levels = min(n_levels, max_levels)

    out = []
    for _ in range(n_levels + 1):
        n = x.shape[0]
        out.append(jnp.sqrt(jnp.var(x, axis=0, ddof=1)
                            / jnp.maximum(n - 1, 1)))
        m = (n // 2) * 2
        x = 0.5 * (x[0:m:2] + x[1:m:2])
    return jnp.stack(out)


def statistical_inefficiency(x: Array, max_lag: int = 1000) -> Array:
    """``g = T / ESS = 1 + 2 tau_int``: how many correlated samples
    equal one independent one (the factor production error bars divide
    by).  x: (T, ...) -> (...)."""
    T = x.shape[0]
    ess = effective_sample_size(x, max_lag=max_lag)
    return T / ess
