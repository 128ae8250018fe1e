"""ELBO losses and information regularizers.

TPU-first replacement for vaemolsim/losses.py (reference L4).  Losses are
plain callables over distribution pytrees; sampling-based estimators take
an explicit PRNG key (the functional replacement for TFP's implicit
sampling).  Reductions are batch means, matching Keras' default loss
reduction applied by the reference.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array

__all__ = [
    "LogProbLoss",
    "PotentialEnergyLogProbLoss",
    "InfoRegularizer",
    "NonRegularizer",
    "KLDivergenceEstimate",
    "LogProbRegularizer",
    "ReverseKLDivergenceEstimate",
]


@struct.dataclass
class LogProbLoss:
    """Negative log-likelihood of samples under a predicted distribution:
    ``mean(-dist.log_prob(samples))`` (reference vaemolsim/losses.py:26-62).
    """

    def __call__(self, samples: Array, dist) -> Array:
        return -jnp.mean(dist.log_prob(samples))


@struct.dataclass
class PotentialEnergyLogProbLoss:
    """Reverse-ELBO reconstruction term:
    ``mean(potential(samples) - dist.log_prob(samples))`` with samples
    drawn from the decoder distribution when not provided (reference
    vaemolsim/losses.py:69-120).  ``potential_fn`` must be jittable
    (beta*U, i.e. negative log target density up to a constant).
    """

    potential_fn: Callable[[Array], Array] = struct.field(pytree_node=False)

    def __call__(self, dist, samples: Optional[Array] = None,
                 key: Optional[Array] = None) -> Array:
        if samples is None:
            if key is None:
                raise ValueError("key required to draw samples from dist")
            samples = dist.sample(key)
        return jnp.mean(self.potential_fn(samples) - dist.log_prob(samples))


@struct.dataclass
class InfoRegularizer:
    """Base for VAE information regularizers (reference
    vaemolsim/losses.py:128-198): callable on (dist_a, dist_b) — encoder
    posterior and prior — returning ``weight * call(...)``.  Samples are
    drawn from ``sample_dist`` ("dist_a" or "dist_b") when not given.
    """

    weight: float = struct.field(pytree_node=False, default=1.0)
    sample_dist: str = struct.field(pytree_node=False, default="dist_a")

    def __post_init__(self):
        if self.sample_dist not in ("dist_a", "dist_b"):
            raise ValueError(
                "sample_dist must be 'dist_a' or 'dist_b' (reference "
                "contract, vaemolsim/losses.py:169-172)")

    def _get_samples(self, dist_a, dist_b, samples, key):
        if samples is not None:
            return samples
        if key is None:
            raise ValueError("key required when samples not provided")
        src = dist_a if self.sample_dist == "dist_a" else dist_b
        return src.sample(key)

    def call(self, dist_a, dist_b, samples) -> Array:  # pragma: no cover
        raise NotImplementedError

    def __call__(self, dist_a, dist_b, samples: Optional[Array] = None,
                 key: Optional[Array] = None) -> Array:
        samples = self._get_samples(dist_a, dist_b, samples, key)
        return self.weight * self.call(dist_a, dist_b, samples)


@struct.dataclass
class NonRegularizer(InfoRegularizer):
    """No regularization (reference vaemolsim/losses.py:201-223)."""

    def __call__(self, dist_a, dist_b, samples=None, key=None) -> Array:
        return jnp.asarray(0.0)


@struct.dataclass
class KLDivergenceEstimate(InfoRegularizer):
    """Monte-Carlo KL(dist_a || dist_b) estimate from samples of dist_a:
    ``mean(log p_a(s) - log p_b(s))`` (reference losses.py:226-253)."""

    def call(self, dist_a, dist_b, samples) -> Array:
        return jnp.mean(dist_a.log_prob(samples) - dist_b.log_prob(samples))


@struct.dataclass
class LogProbRegularizer(InfoRegularizer):
    """``mean(-log p_b(s))`` on samples of dist_a — prior-only training
    under a deterministic encoder (reference losses.py:256-296)."""

    def call(self, dist_a, dist_b, samples) -> Array:
        return -jnp.mean(dist_b.log_prob(samples))


@struct.dataclass
class ReverseKLDivergenceEstimate(InfoRegularizer):
    """KL(dist_b || dist_a) estimated from samples of dist_b — the
    reverse direction for reverse-ELBO training (reference
    losses.py:299-330): equals the forward estimator with swapped args.
    """

    sample_dist: str = struct.field(pytree_node=False, default="dist_b")

    def call(self, dist_a, dist_b, samples) -> Array:
        return jnp.mean(dist_b.log_prob(samples) - dist_a.log_prob(samples))
