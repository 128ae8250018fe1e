"""Markov state models: kinetics from simulation trajectories.

Beyond-reference analysis capability (the reference carries no
trajectory analysis at all; its MC engine only counts acceptances,
/root/reference/vaemolsim/mcmc.py:48-50): estimate discrete-state
kinetic models from the trajectories this library's MD/MC engines
produce, in the standard MSM methodology (Prinz et al. 2011, JCP 134,
174105).

TPU-first design decisions:

- **Count matrices are one matmul**: trajectories are one-hot encoded
  and contracted, ``C = sum_t onehot(s_t)^T onehot(s_{t+lag})`` — MXU
  work, batched over any number of trajectories, no scatters.
- **Reversible MLE** is the classic fixed-point iteration on the
  symmetric flux matrix, run a static number of sweeps under
  ``lax.scan`` (convergence is geometric; the default 200 sweeps is
  far past float32 resolution for well-connected counts).
- **Spectral analysis avoids nonsymmetric eig** (unsupported on TPU):
  a reversible transition matrix is similar to the symmetric matrix
  ``D^{1/2} T D^{-1/2}`` (D = diag(pi)), so eigenvalues/timescales come
  from ``eigh``.
- **Committors and MFPTs are linear solves** with boundary conditions
  imposed by masking — no Python-side state partitioning.

Everything operates on plain arrays, so a (chains,) batch of
trajectories from ``run_mcmc``/``baoab(collect_every=...)`` feeds
straight in after discretization by :func:`assign_states`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

__all__ = ["assign_states", "count_matrix", "transition_matrix",
           "stationary_distribution", "implied_timescales", "committor",
           "mean_first_passage_time", "chapman_kolmogorov", "tica",
           "reactive_flux", "tpt_rate", "kmeans"]


def _one_ulp(dtype) -> float:
    """Spacing just below 1.0 in ``dtype`` (so ``1 - _one_ulp`` is the
    largest representable value strictly less than 1)."""
    return float(jnp.finfo(dtype).epsneg)


def _as_mask(idx, n: int) -> Array:
    """Boolean state mask from either a bool mask or an index array."""
    idx = jnp.asarray(idx)
    if idx.dtype == jnp.bool_:
        return idx
    return jnp.zeros(n, bool).at[idx].set(True)


def assign_states(x: Array, centers: Array) -> Array:
    """Discretize ``x`` of shape ``(..., d)`` (or ``(...,)`` for 1-D) to
    the nearest of ``n`` ``centers`` (``(n, d)`` or ``(n,)``) —
    Euclidean Voronoi assignment, the standard MSM state definition.
    Returns int32 state indices of shape ``(...,)``."""
    x = jnp.asarray(x)
    centers = jnp.asarray(centers)
    if centers.ndim == 1:
        centers = centers[:, None]
        x = x[..., None]
    d2 = jnp.sum((x[..., None, :] - centers) ** 2, axis=-1)
    return jnp.argmin(d2, axis=-1).astype(jnp.int32)


def kmeans(key: Array, x: Array, k: int, n_iter: int = 50
           ) -> Tuple[Array, Array]:
    """K-means state centers for MSM discretization: k-means++ style
    seeding (greedy farthest-point from a random start) followed by
    ``n_iter`` Lloyd sweeps as one ``lax.scan``.

    ``x``: features ``(..., d)`` (any batch/time axes; flattened);
    returns ``(centers (k, d), inertia)``.  Each sweep is one dense
    distance matmul + masked mean — no scatters; empty clusters keep
    their previous center (standard Lloyd fix)."""
    x = jnp.asarray(x)
    flat = x.reshape(-1, x.shape[-1])
    n = flat.shape[0]
    if k < 1 or k > n:
        raise ValueError(f"k must be in [1, {n}], got {k}")

    x_sq = jnp.sum(flat * flat, axis=-1)                 # (n,)

    def dist2(c):
        # ||x - c||^2 via the matmul form: the (n, k) result is the
        # only materialized tensor (the (n, k, d) broadcast would be
        # gigabytes at MSM scale: 1e6 frames x 100 states x 10 dims).
        return (x_sq[:, None] - 2.0 * flat @ c.T
                + jnp.sum(c * c, axis=-1)[None, :])

    # Farthest-point seeding (deterministic given the keyed start).
    first = flat[jax.random.randint(key, (), 0, n)]

    def seed_step(carry, _):
        centers, m = carry  # centers (k, d) with rows >= m garbage
        d2 = jnp.min(dist2(centers)
                     + jnp.where(jnp.arange(k) < m, 0.0,
                                 jnp.inf)[None], axis=1)
        nxt = flat[jnp.argmax(d2)]
        centers = jnp.where(
            (jnp.arange(k) == m)[:, None], nxt[None], centers)
        return (centers, m + 1), None

    c0 = jnp.tile(first[None], (k, 1))
    (centers, _), _ = jax.lax.scan(seed_step, (c0, 1), None,
                                   length=k - 1)

    def lloyd(c, _):
        lbl = jnp.argmin(dist2(c), axis=1)
        oh = jax.nn.one_hot(lbl, k, dtype=flat.dtype)        # (n, k)
        counts = oh.sum(axis=0)                              # (k,)
        sums = oh.T @ flat                                   # (k, d)
        c_new = jnp.where(counts[:, None] > 0,
                          sums / jnp.maximum(counts[:, None], 1.0), c)
        return c_new, None

    centers, _ = jax.lax.scan(lloyd, centers, None, length=n_iter)
    inertia = jnp.sum(jnp.maximum(jnp.min(dist2(centers), axis=1), 0.0))
    return centers, inertia


def count_matrix(dtraj: Array, n_states: int, lag: int = 1,
                 sliding: bool = True) -> Array:
    """Transition-count matrix ``C[i, j] = #(s_t = i, s_{t+lag} = j)``
    from integer trajectories ``dtraj`` of shape ``(..., T)`` (any
    leading batch of independent trajectories; counts pool).

    ``sliding=True`` uses every window start (the standard estimator);
    ``False`` strides by ``lag`` for independent counts."""
    dtraj = jnp.asarray(dtraj, jnp.int32)
    if dtraj.ndim == 1:
        dtraj = dtraj[None]
    T = dtraj.shape[-1]
    if lag < 1 or lag >= T:
        raise ValueError(f"lag must be in [1, T-1], got {lag} for T={T}")
    src = dtraj[..., :-lag]
    dst = dtraj[..., lag:]
    if not sliding:
        src = src[..., ::lag]
        dst = dst[..., ::lag]
    src = src.reshape(-1)
    dst = dst.reshape(-1)
    # Chunked float32 matmuls accumulated in int32: each chunk's counts
    # are < 2^22 (exact in float32) and the int32 accumulator is exact
    # to 2^31 - 1 per cell — a plain float32 matmul silently STOPS
    # counting past 2^24 per cell, which production-scale pooled
    # trajectories exceed.
    chunk = 1 << 22
    acc = jnp.zeros((n_states, n_states), jnp.int32)
    for start in range(0, src.shape[0], chunk):
        s = jax.nn.one_hot(src[start:start + chunk], n_states,
                           dtype=jnp.float32)
        d = jax.nn.one_hot(dst[start:start + chunk], n_states,
                           dtype=jnp.float32)
        acc = acc + (s.T @ d).astype(jnp.int32)
    return acc.astype(jnp.float32)


def transition_matrix(C: Array, reversible: bool = True,
                      n_iter: int = 200, eps: float = 1e-12) -> Array:
    """Maximum-likelihood row-stochastic transition matrix from counts.

    ``reversible=False``: plain row normalization.  ``reversible=True``:
    the detailed-balance-constrained MLE via the standard fixed-point
    iteration on the symmetric flux ``x_ij`` (Bowman et al. 2009):

        x_ij <- (c_ij + c_ji) / (c_i / x_i + c_j / x_j)

    which converges geometrically to the optimum; ``T = x / rowsum(x)``
    then satisfies ``pi_i T_ij = pi_j T_ji`` exactly."""
    C = jnp.asarray(C, jnp.float64 if jax.config.jax_enable_x64
                    else jnp.float32)
    if not reversible:
        return C / jnp.maximum(C.sum(axis=1, keepdims=True), eps)

    c_sym = C + C.T
    c_row = C.sum(axis=1)

    def sweep(x, _):
        x_row = x.sum(axis=1)
        denom = (c_row / jnp.maximum(x_row, eps))[:, None] \
            + (c_row / jnp.maximum(x_row, eps))[None, :]
        x = jnp.where(c_sym > 0, c_sym / jnp.maximum(denom, eps), 0.0)
        return x, None

    x0 = jnp.where(c_sym > 0, c_sym / 2.0, 0.0)
    x, _ = jax.lax.scan(sweep, x0, None, length=n_iter)
    return x / jnp.maximum(x.sum(axis=1, keepdims=True), eps)


def stationary_distribution(T: Array) -> Array:
    """Stationary distribution ``pi T = pi, sum(pi) = 1`` by ONE linear
    solve of ``(I - T^T + 1 1^T) pi = 1`` — exact for any irreducible
    row-stochastic ``T`` (no nonsymmetric eigendecomposition needed, and
    no power-iteration convergence dependence on the spectral gap:
    metastable chains with ``lambda_2 -> 1`` are exactly the MSM use
    case, and iteration would converge as ``lambda_2^n``)."""
    n = T.shape[0]
    A = (jnp.eye(n, dtype=T.dtype) - T.T
         + jnp.ones((n, n), T.dtype))
    return jnp.linalg.solve(A, jnp.ones((n,), T.dtype))


def _symmetrized_spectrum(T: Array, pi: Optional[Array] = None
                          ) -> Tuple[Array, Array, Array]:
    """Eigen-decompose a REVERSIBLE ``T`` through its symmetric
    similarity transform ``S = D^{1/2} T D^{-1/2}`` (D = diag(pi)):
    returns (eigenvalues desc, right eigenvectors of T as columns, pi).
    """
    if pi is None:
        pi = stationary_distribution(T)
    sqrt_pi = jnp.sqrt(jnp.maximum(pi, 1e-30))
    S = sqrt_pi[:, None] * T / sqrt_pi[None, :]
    S = 0.5 * (S + S.T)  # enforce exact symmetry against roundoff
    w, V = jnp.linalg.eigh(S)
    order = jnp.argsort(-w)
    w = w[order]
    V = V[:, order]
    right = V / sqrt_pi[:, None]  # right eigenvectors of T
    return w, right, pi


def implied_timescales(T: Array, lag: float = 1.0, k: Optional[int] = None,
                       pi: Optional[Array] = None) -> Array:
    """Implied relaxation timescales ``t_i = -lag / ln lambda_i`` of a
    reversible transition matrix (slowest first, stationary eigenvalue
    excluded).  ``k`` limits how many are returned."""
    w, _, _ = _symmetrized_spectrum(T, pi)
    # Upper clip must be representable below 1 in the working dtype —
    # float32 rounds 1 - 1e-12 to exactly 1.0, making the log(1) = 0
    # guard a no-op (degenerate eigenvalue -> -inf timescale).
    lam = jnp.clip(jnp.abs(w[1:]), 1e-12, 1.0 - _one_ulp(w.dtype))
    ts = -lag / jnp.log(lam)
    return ts if k is None else ts[:k]


def committor(T: Array, source: Array, sink: Array) -> Array:
    """Forward committor ``q_i = P(reach sink before source | start i)``.

    ``source``/``sink`` are boolean masks (or index arrays) over states.
    Interior states solve ``q = T q``; boundaries are pinned (0 on the
    source, 1 on the sink) — assembled as one masked linear system."""
    n = T.shape[0]
    src = _as_mask(source, n)
    snk = _as_mask(sink, n)
    boundary = src | snk
    # Rows: interior -> (I - T); boundary -> identity. RHS: sink rows 1.
    A = jnp.where(boundary[:, None], jnp.eye(n, dtype=T.dtype),
                  jnp.eye(n, dtype=T.dtype) - T)
    b = snk.astype(T.dtype)
    return jnp.linalg.solve(A, b)


def mean_first_passage_time(T: Array, target: Array,
                            lag: float = 1.0) -> Array:
    """MFPT to the ``target`` set from every state (0 on the target):
    solve ``m = lag + T m`` on the complement, as a masked system."""
    n = T.shape[0]
    tgt = _as_mask(target, n)
    A = jnp.where(tgt[:, None], jnp.eye(n, dtype=T.dtype),
                  jnp.eye(n, dtype=T.dtype) - T)
    b = jnp.where(tgt, 0.0, lag).astype(T.dtype)
    return jnp.linalg.solve(A, b)


def reactive_flux(T: Array, source: Array, sink: Array,
                  pi: Optional[Array] = None
                  ) -> Tuple[Array, Array]:
    """Transition-path-theory fluxes for the source -> sink reaction
    (Metzner, Schuette & Vanden-Eijnden 2009): returns
    ``(gross_flux, net_flux)`` matrices

        f_ij = pi_i (1 - q_i) T_ij q_j   (i != j),
        f+_ij = max(f_ij - f_ji, 0),

    where ``q`` is the forward committor.  The committor boundary
    conditions make the gross flux vanish into the source and out of
    the sink automatically."""
    n = T.shape[0]
    if pi is None:
        pi = stationary_distribution(T)
    q_fwd = committor(T, source, sink)
    f = (pi * (1.0 - q_fwd))[:, None] * T * q_fwd[None, :]
    f = f * (1.0 - jnp.eye(n, dtype=T.dtype))
    return f, jnp.maximum(f - f.T, 0.0)


def tpt_rate(T: Array, source: Array, sink: Array,
             pi: Optional[Array] = None, lag: float = 1.0) -> Array:
    """TPT rate constant of the source -> sink reaction: total reactive
    flux out of the source divided by the reactant population,

        k_AB = F / (lag * sum_i pi_i (1 - q_i)),   F = sum_{i in A, j} f_ij.
    """
    n = T.shape[0]
    if pi is None:
        pi = stationary_distribution(T)
    src = _as_mask(source, n)
    f, _ = reactive_flux(T, source, sink, pi)
    total_flux = jnp.sum(jnp.where(src[:, None], f, 0.0))
    q_fwd = committor(T, source, sink)
    reactant_pop = jnp.sum(pi * (1.0 - q_fwd))
    return total_flux / (lag * jnp.maximum(reactant_pop, 1e-30))


def tica(x: Array, lag: int, k: Optional[int] = None,
         eps: float = 1e-6) -> Tuple[Array, Array, Array]:
    """Time-lagged independent component analysis: the linear
    collective variables that decorrelate slowest (Perez-Hernandez et
    al. 2013, JCP 139, 015102) — the standard featurization step
    upstream of :func:`assign_states`.

    ``x``: features of shape ``(..., T, d)`` (any batch of independent
    trajectories; covariances pool).  Solves the generalized
    eigenproblem ``C_lag v = lambda C_0 v`` with symmetrized time-lagged
    covariances through the whitened symmetric form
    ``C_0^{-1/2} C_lag C_0^{-1/2}`` (``eigh`` — TPU-supported; ``eps``
    regularizes the whitening against rank-deficient features).

    Returns ``(timescales, components, eigenvalues)``: implied
    timescales ``-lag / ln |lambda_i|`` (slowest first), the matching
    projection vectors as COLUMNS of ``components`` (project with
    ``(x - mean) @ components``), and the autocorrelation eigenvalues.
    Both covariance matrices are single matmuls over all pooled frames.
    """
    x = jnp.asarray(x)
    if x.ndim == 2:
        x = x[None]
    B = x.reshape(-1, x.shape[-2], x.shape[-1])  # (n_traj, T, d)
    T = B.shape[1]
    if lag < 1 or lag >= T:
        raise ValueError(f"lag must be in [1, T-1], got {lag} for T={T}")
    a = B[:, :-lag].reshape(-1, B.shape[-1])
    b = B[:, lag:].reshape(-1, B.shape[-1])
    mean = 0.5 * (a.mean(axis=0) + b.mean(axis=0))
    a = a - mean
    b = b - mean
    n = a.shape[0]
    c0 = (a.T @ a + b.T @ b) / (2.0 * n)
    ct = (a.T @ b + b.T @ a) / (2.0 * n)

    w0, V0 = jnp.linalg.eigh(c0)
    inv_sqrt = V0 @ (V0 / jnp.sqrt(jnp.maximum(w0, eps))[None, :]).T
    s = inv_sqrt @ ct @ inv_sqrt
    s = 0.5 * (s + s.T)
    lam, U = jnp.linalg.eigh(s)
    order = jnp.argsort(-lam)
    lam = lam[order]
    comps = inv_sqrt @ U[:, order]
    ts = -lag / jnp.log(jnp.clip(jnp.abs(lam), 1e-12,
                                 1.0 - _one_ulp(lam.dtype)))
    if k is not None:
        ts, comps, lam = ts[:k], comps[:, :k], lam[:k]
    return ts, comps, lam


def chapman_kolmogorov(dtraj: Array, n_states: int, lag: int,
                       factors=(1, 2, 4), reversible: bool = True
                       ) -> Tuple[Array, Array]:
    """Chapman-Kolmogorov validation: for each ``k`` in ``factors``,
    compare the model prediction ``T(lag)^k`` against the re-estimated
    ``T(k lag)``.  Returns ``(predicted, estimated)`` stacked
    ``(len(factors), n, n)`` — Markovian data makes them agree."""
    T1 = transition_matrix(count_matrix(dtraj, n_states, lag),
                           reversible=reversible)
    pred, est = [], []
    for k in factors:
        pred.append(jnp.linalg.matrix_power(T1, k))
        est.append(transition_matrix(
            count_matrix(dtraj, n_states, lag * k),
            reversible=reversible))
    return jnp.stack(pred), jnp.stack(est)
