"""VAMPnets: learned kinetic featurization by VAMP-score maximization.

Deep extension of the package's linear kinetics stack (``msm.tica`` /
``msm.count_matrix`` pipelines): instead of hand-picked features +
linear TICA + hard k-means states, a neural lobe ``chi(x)`` is trained
to maximize the variational approach for Markov processes (VAMP) score
of Wu & Noé (2020, J. Nonlin. Sci. 30, 23) / Mardt et al. (2018,
"VAMPnets for deep learning of molecular kinetics", Nat. Commun. 9, 5)
— the network discovers the slow collective variables and (with a
softmax head) fuzzy metastable state memberships end-to-end.

TPU-first design decisions:

- **The training objective never calls an SVD.**  The VAMP-2 score is
  ``1 + || C00^{-1/2} C0t Ctt^{-1/2} ||_F^2`` (the +1 is the constant
  singular function); the Frobenius form is a trace of matmuls, so the
  whole loss is covariance matmuls + two ``eigh`` of tiny ``(k, k)``
  matrices — no rectangular SVD in the differentiated graph (TPU
  ``svd`` gradients at degenerate singular values are the classic
  instability; ``eigh`` of the small Gram matrices is the supported,
  stable path, same device rule as ``msm.tica``).
- Covariances over all frames are single matmuls (MXU); the lobe is a
  fused Dense stack batched over frames.
- Analysis-time quantities (singular functions, implied timescales)
  DO use one small eigendecomposition — outside any gradient.

Typical flow::

    net = VAMPNet.create(key, in_dim=d, k=3)
    net, hist = train.fit(net, lambda m, b, k: m.loss(*b), (x0, xt), ...)
    sv = net.singular_values(x0, xt)           # Koopman spectrum
    ts = vamp_timescales(sv, lag_time)          # implied timescales
    chi = net(x)                                # soft state memberships

Cross-validated against the exact spectrum of analytic Markov chains
and the package's own TICA/MSM estimates in ``tests/test_vamp.py``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from vaemolsim_tpu.nn.core import MLP

Array = jax.Array

__all__ = ["vamp_score", "koopman_singular_values", "vamp_timescales",
           "VAMPNet"]


def _mean_free(a: Array) -> Array:
    return a - jnp.mean(a, axis=0, keepdims=True)


def _inv_sqrt_psd(c: Array, eps: float) -> Array:
    """PSEUDO-inverse matrix square root of a PSD matrix via ``eigh``:
    directions with eigenvalue below ``eps * max(w)`` are projected
    OUT (weight zero), not clamped.  The default cut (1e-4 relative)
    is set for float32 covariance accumulation: at ~1e5 frames the
    exact null direction of softmax/one-hot features carries ~1e-5
    relative roundoff variance, which a tighter cut would "whiten"
    into a spurious singular value > 1.  Mean-free softmax/one-hot
    features are exactly rank-deficient (outputs sum to 1); clamping
    the null eigenvalue to eps would amplify float32 covariance
    roundoff in that direction by 1/eps and blow the score up —
    trimming is the standard estimator (deeptime's 'trunc' mode).
    The ``where``-guarded rsqrt keeps gradients NaN-free at w = 0."""
    w, v = jnp.linalg.eigh(c)
    keep = w > eps * jnp.max(w)
    w_safe = jnp.where(keep, w, 1.0)
    inv = jnp.where(keep, jax.lax.rsqrt(w_safe), 0.0)
    return (v * inv) @ v.T


def _whitened_koopman(chi0: Array, chit: Array, eps: float
                      ) -> Tuple[Array, int]:
    """``K_w = C00^{-1/2} C0t Ctt^{-1/2}`` from mean-free features."""
    if chi0.ndim != 2 or chi0.shape != chit.shape:
        raise ValueError(
            f"chi0/chit must be matching (n_pairs, k); got {chi0.shape} "
            f"vs {chit.shape}")
    n = chi0.shape[0]
    a = _mean_free(chi0)
    b = _mean_free(chit)
    c00 = a.T @ a / n
    c0t = a.T @ b / n
    ctt = b.T @ b / n
    return _inv_sqrt_psd(c00, eps) @ c0t @ _inv_sqrt_psd(ctt, eps), n


def vamp_score(chi0: Array, chit: Array, *, method: str = "vamp2",
               eps: float = 1e-4) -> Array:
    """VAMP score of featurized transition pairs — differentiable, to
    be MAXIMIZED.

    ``chi0``/``chit``: features of the pair ends, ``(n_pairs, k)``
    (build pairs with :func:`lagged_pairs` or slice trajectories as
    ``x[..., :-lag, :]`` / ``x[..., lag:, :]`` and flatten).

    ``method="vamp2"`` (default): ``1 + sum_i sigma_i^2`` — the sum of
    squared singular values of the whitened Koopman matrix plus the
    constant function's ``sigma_0 = 1``.  Computed as a Frobenius norm
    (trace of matmuls): no SVD in the gradient graph.
    ``method="vamp1"``: ``1 + sum_i sigma_i`` (nuclear norm; this one
    needs the singular values themselves — analysis use).

    ``eps`` is the RELATIVE eigenvalue cut of the covariance
    pseudo-inverses: directions carrying less than ``eps * max``
    variance are projected out (see :func:`_inv_sqrt_psd`).

    Upper bound: ``min(k, rank) + ...`` — for features spanning the
    top-k Koopman singular functions the score attains
    ``1 + sum_{i<=k} sigma_i^2`` of the true operator, which is how the
    tests pin it against analytic chains.
    """
    kw, _ = _whitened_koopman(jnp.asarray(chi0), jnp.asarray(chit), eps)
    if method == "vamp2":
        return 1.0 + jnp.sum(kw * kw)
    if method == "vamp1":
        s = jnp.linalg.svd(kw, compute_uv=False)
        return 1.0 + jnp.sum(s)
    raise ValueError(f"unknown VAMP method: {method!r}")


def koopman_singular_values(chi0: Array, chit: Array, *,
                            eps: float = 1e-4) -> Array:
    """Singular values of the whitened Koopman matrix, descending —
    estimates of the true operator's singular values ``sigma_i <= 1``
    (for a reversible process, ``|lambda_i|`` of the transfer
    operator).  Analysis path (not differentiated)."""
    kw, _ = _whitened_koopman(jnp.asarray(chi0), jnp.asarray(chit), eps)
    return jnp.linalg.svd(kw, compute_uv=False)


def vamp_timescales(singular_values: Array, lag_time: float) -> Array:
    """Implied timescales ``-lag / ln sigma_i`` (same convention as
    ``msm.implied_timescales``); ``sigma >= 1`` maps to +inf."""
    s = jnp.clip(jnp.asarray(singular_values), 0.0, None)
    safe = jnp.clip(s, 1e-12, 1.0 - 1e-12)
    ts = -lag_time / jnp.log(safe)
    return jnp.where(s >= 1.0, jnp.inf, ts)


@struct.dataclass
class VAMPNet:
    """A feature lobe trained by VAMP-2 maximization.

    One shared MLP lobe applied to both pair ends (the standard
    weight-tied VAMPnet; Mardt et al. 2018 use tied lobes for
    stationary dynamics).  ``softmax=True`` (default) makes the k
    outputs fuzzy state memberships (rows sum to 1 — a soft MSM
    discretization whose covariances feed ``msm``-style analysis);
    ``softmax=False`` gives unconstrained collective variables (a
    nonlinear TICA).

    Train with ``train.fit``::

        loss = lambda m, batch, key: m.loss(*batch)
        net, hist = fit(net, loss, (x0, xt), ...)
    """

    lobe: MLP
    softmax: bool = struct.field(pytree_node=False, default=True)
    eps: float = struct.field(pytree_node=False, default=1e-4)

    @classmethod
    def create(cls, key: Array, in_dim: int, k: int, *,
               hidden_dims: Sequence[int] = (64, 64),
               activation: str = "gelu", softmax: bool = True,
               eps: float = 1e-4) -> "VAMPNet":
        return cls(lobe=MLP.create(key, in_dim, list(hidden_dims), k,
                                   activation=activation),
                   softmax=softmax, eps=eps)

    def __call__(self, x: Array) -> Array:
        """Features / state memberships, ``(..., in_dim) -> (..., k)``."""
        y = self.lobe(x)
        return jax.nn.softmax(y, axis=-1) if self.softmax else y

    def loss(self, x0: Array, xt: Array) -> Array:
        """Negative VAMP-2 score of the batch of pairs (minimize)."""
        return -vamp_score(self(x0), self(xt), method="vamp2",
                           eps=self.eps)

    def singular_values(self, x0: Array, xt: Array) -> Array:
        return koopman_singular_values(self(x0), self(xt), eps=self.eps)

    def koopman_matrix(self, x0: Array, xt: Array) -> Array:
        """Galerkin-projected Koopman matrix in the TRIMMED WHITENED
        mean-free feature basis, ``C00^{-1/2} C0t C00^{-1/2}`` — its
        eigenvalue magnitudes estimate the NONTRIVIAL transfer-operator
        eigenvalues ``|lambda_2|, |lambda_3|, ...`` (the constant
        eigenfunction, ``lambda_1 = 1``, is removed by mean-freeing).
        A raw ``solve(C00, C0t)`` in the feature basis is the textbook
        form but ill-conditioned when the lobe collapses a direction
        (softmax outputs are exactly rank-deficient mean-free, and
        trained lobes often park a redundant output); whitening with
        the pseudo-inverse sqrt projects those directions out instead
        of letting the regularizer pollute the spectrum."""
        a = _mean_free(self(x0))
        b = _mean_free(self(xt))
        n = a.shape[0]
        w = _inv_sqrt_psd(a.T @ a / n, self.eps)
        return w @ (a.T @ b / n) @ w


def lagged_pairs(x: Array, lag: int) -> Tuple[Array, Array]:
    """Flatten trajectories ``(..., T, d)`` into transition-pair ends
    ``(n_pairs, d)`` at ``lag`` frames, pooling all batch trajectories
    (same pooling convention as ``msm.tica``)."""
    x = jnp.asarray(x)
    if x.ndim == 2:
        x = x[None]
    b = x.reshape(-1, x.shape[-2], x.shape[-1])
    T = b.shape[1]
    if lag < 1 or lag >= T:
        raise ValueError(f"lag must be in [1, T-1], got {lag} for T={T}")
    return (b[:, :-lag].reshape(-1, b.shape[-1]),
            b[:, lag:].reshape(-1, b.shape[-1]))


__all__.append("lagged_pairs")
