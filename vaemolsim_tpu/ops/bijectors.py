"""Functional bijectors as JAX pytrees.

TPU-first replacement for the tfp.bijectors the reference composes
(vaemolsim/flows.py:42-58, 288-323, 602-640; vaemolsim/dists.py:69 —
see SURVEY.md §2.3).  A bijector is a ``flax.struct`` dataclass with

- ``forward(x, context=None)`` / ``inverse(y, context=None)``
- ``forward_and_log_det(x, context=None)`` -> (y, fldj)
- ``inverse_and_log_det(y, context=None)`` -> (x, ildj)

Log-dets are *elementwise* for scalar bijectors (``event_ndims == 0``) and
reduced over the event for vector bijectors.  Wrap a scalar bijector in
:class:`Block` to sum its log-det over trailing event axes.  ``context`` is
an optional conditioning array, threaded explicitly (the reference routes
conditional inputs via a ``kwargs_split_fn`` dict hack,
vaemolsim/flows.py:671-690; here it is a first-class argument).

The train/eval asymmetry of the BatchNormalization bijector (the reference
mutates ``bij.training`` imperatively, vaemolsim/flows.py:344-348) is a
*static* ``use_batch_stats`` flag here: flows construct the bijector pytree
per-call with the right flag, keeping everything pure.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array

__all__ = [
    "Bijector",
    "Identity",
    "Shift",
    "Scale",
    "Sigmoid",
    "Tanh",
    "Softplus",
    "SoftClip",
    "Block",
    "Chain",
    "Inverse",
    "BatchNormBijector",
    "make_domain_transform",
]


class Bijector:
    """Mixin with derived conveniences (not a pytree itself)."""

    def forward(self, x: Array, context: Optional[Array] = None) -> Array:
        return self.forward_and_log_det(x, context)[0]

    def inverse(self, y: Array, context: Optional[Array] = None) -> Array:
        return self.inverse_and_log_det(y, context)[0]

    def forward_log_det(self, x: Array, context: Optional[Array] = None) -> Array:
        return self.forward_and_log_det(x, context)[1]

    def inverse_log_det(self, y: Array, context: Optional[Array] = None) -> Array:
        return self.inverse_and_log_det(y, context)[1]

    def __call__(self, x: Array, context: Optional[Array] = None) -> Array:
        return self.forward(x, context)


@struct.dataclass
class Identity(Bijector):
    def forward_and_log_det(self, x, context=None):
        return x, jnp.zeros_like(x)

    def inverse_and_log_det(self, y, context=None):
        return y, jnp.zeros_like(y)


@struct.dataclass
class Shift(Bijector):
    shift: Array

    def forward_and_log_det(self, x, context=None):
        return x + self.shift, jnp.zeros_like(x)

    def inverse_and_log_det(self, y, context=None):
        return y - self.shift, jnp.zeros_like(y)


@struct.dataclass
class Scale(Bijector):
    scale: Array

    def forward_and_log_det(self, x, context=None):
        ldj = jnp.broadcast_to(jnp.log(jnp.abs(self.scale)), jnp.shape(x))
        return x * self.scale, ldj

    def inverse_and_log_det(self, y, context=None):
        ldj = jnp.broadcast_to(jnp.log(jnp.abs(self.scale)), jnp.shape(y))
        return y / self.scale, -ldj


@struct.dataclass
class Sigmoid(Bijector):
    def forward_and_log_det(self, x, context=None):
        y = jax.nn.sigmoid(x)
        ldj = -jax.nn.softplus(-x) - jax.nn.softplus(x)
        return y, ldj

    def inverse_and_log_det(self, y, context=None):
        x = jnp.log(y) - jnp.log1p(-y)
        ldj = -jnp.log(y) - jnp.log1p(-y)
        return x, ldj


@struct.dataclass
class Tanh(Bijector):
    def forward_and_log_det(self, x, context=None):
        y = jnp.tanh(x)
        # log|dy/dx| = log(1 - tanh^2 x) = 2*(log2 - x - softplus(-2x))
        ldj = 2.0 * (jnp.log(2.0) - x - jax.nn.softplus(-2.0 * x))
        return y, ldj

    def inverse_and_log_det(self, y, context=None):
        x = jnp.arctanh(y)
        ldj = -jnp.log1p(-y * y)
        return x, ldj


@struct.dataclass
class Softplus(Bijector):
    def forward_and_log_det(self, x, context=None):
        y = jax.nn.softplus(x)
        ldj = -jax.nn.softplus(-x)  # log sigmoid(x)
        return y, ldj

    def inverse_and_log_det(self, y, context=None):
        # inverse softplus: x = y + log(1 - exp(-y))
        x = y + jnp.log(-jnp.expm1(-y))
        ldj = -jnp.log(-jnp.expm1(-y))  # = y - log(e^y - 1); d x/d y = 1/(1-e^-y)
        return x, ldj


@struct.dataclass
class SoftClip(Bijector):
    """Smoothly clip to (low, high), matching tfp.bijectors.SoftClip's
    essential semantics: approximately the IDENTITY for values well inside
    the bounds, softplus-rounded at the edges:

        y = low + s*softplus((x-low)/s) - s*softplus((x-high)/s)

    with ``s = hinge_softness``.  This is load-bearing for the von Mises
    concentration bound (reference vaemolsim/dists.py:66-71: SoftClip to
    [eps, sqrt(float32.max)/2]): an O(1) raw network output must map to an
    O(1) concentration, with the huge upper bound acting only as an
    overflow guard.  The inverse uses Newton iteration (the transform is
    smooth and monotone with derivative in (0, 1)); only the forward
    direction sits on the training path.
    """

    low: float = struct.field(pytree_node=False)
    high: float = struct.field(pytree_node=False)
    hinge_softness: float = struct.field(pytree_node=False, default=1.0)

    def forward_and_log_det(self, x, context=None):
        s = self.hinge_softness
        y = (self.low + s * jax.nn.softplus((x - self.low) / s)
             - s * jax.nn.softplus((x - self.high) / s))
        # dy/dx = sigmoid((x-low)/s) - sigmoid((x-high)/s), in (0, 1).
        d = (jax.nn.sigmoid((x - self.low) / s)
             - jax.nn.sigmoid((x - self.high) / s))
        return y, jnp.log(jnp.maximum(d, 1e-38))

    def inverse_and_log_det(self, y, context=None):
        def fwd(x):
            return self.forward_and_log_det(x)[0]

        # Newton from the identity-region guess x0 = y.  The codomain is
        # the OPEN interval (low, high): clip the iterate into it, and
        # return NaN for y outside — a silent wrong x for impossible
        # inputs corrupted downstream values undetectably.  (Near the
        # bounds the recovered x is only float32-representable-accurate:
        # the forward saturates, so distinct x map to the same y.)
        x = jnp.clip(y, self.low + 1e-6, self.high - 1e-6)
        for _ in range(25):
            s = self.hinge_softness
            d = (jax.nn.sigmoid((x - self.low) / s)
                 - jax.nn.sigmoid((x - self.high) / s))
            x = x - (fwd(x) - y) / jnp.maximum(d, 1e-12)
        out_of_domain = (y <= self.low) | (y >= self.high)
        x = jnp.where(out_of_domain, jnp.nan, x)
        _, fldj = self.forward_and_log_det(x)
        return x, -fldj


@struct.dataclass
class Block(Bijector):
    """Promote a scalar bijector to act on vector events: log-dets are
    summed over the trailing ``ndims`` axes (distrax-style)."""

    inner: Any
    ndims: int = struct.field(pytree_node=False, default=1)

    def forward_and_log_det(self, x, context=None):
        y, ldj = self.inner.forward_and_log_det(x, context)
        return y, jnp.sum(ldj, axis=tuple(range(-self.ndims, 0)))

    def inverse_and_log_det(self, y, context=None):
        x, ldj = self.inner.inverse_and_log_det(y, context)
        return x, jnp.sum(ldj, axis=tuple(range(-self.ndims, 0)))


@struct.dataclass
class Inverse(Bijector):
    inner: Any

    def forward_and_log_det(self, x, context=None):
        return self.inner.inverse_and_log_det(x, context)

    def inverse_and_log_det(self, y, context=None):
        return self.inner.forward_and_log_det(y, context)


@struct.dataclass
class Chain(Bijector):
    """Composition; like tfp.bijectors.Chain, ``bijectors[-1]`` is applied
    FIRST in the forward direction (vaemolsim/flows.py:323)."""

    bijectors: Tuple[Any, ...]

    def forward_and_log_det(self, x, context=None):
        ldj = 0.0
        for bij in reversed(self.bijectors):
            x, l = bij.forward_and_log_det(x, context)
            ldj = ldj + l
        return x, ldj

    def inverse_and_log_det(self, y, context=None):
        ldj = 0.0
        for bij in self.bijectors:
            y, l = bij.inverse_and_log_det(y, context)
            ldj = ldj + l
        return y, ldj


@struct.dataclass
class BatchNormBijector(Bijector):
    """Batch-normalization bijector over the last axis.

    Reference analog: ``tfp.bijectors.BatchNormalization`` between flow
    blocks (vaemolsim/flows.py:308-309, 623-624) with its imperative
    ``training`` toggle (flows.py:344-348).  Here the mode is the static
    flag ``use_batch_stats``:

    * ``use_batch_stats=True`` (training): ``inverse`` (the density /
      log-prob direction) normalizes with the *current batch* moments,
      computed over all leading axes of its input.
    * ``use_batch_stats=False`` (eval): uses the stored running moments.

    ``inverse_and_log_det_and_moments`` additionally returns the batch
    moments so a training loop can update the running statistics (the
    functional replacement for TF's in-op EMA update).

    The forward direction (sampling) always uses the stored running
    moments — batch moments are not defined when generating.
    """

    mean: Array
    var: Array
    log_gamma: Array
    beta: Array
    eps: float = struct.field(pytree_node=False, default=1e-5)
    use_batch_stats: bool = struct.field(pytree_node=False, default=False)
    momentum: float = struct.field(pytree_node=False, default=0.99)

    def _running(self):
        # Running statistics are NEVER trainable (matching TF's
        # BatchNormalization): without stop_gradient, sampling-path
        # losses would push gradients into mean/var and the optimizer
        # would fight the EMA updates.
        return (jax.lax.stop_gradient(self.mean),
                jax.lax.stop_gradient(self.var))

    def _moments(self, y: Array):
        if self.use_batch_stats:
            axes = tuple(range(y.ndim - 1))
            m = jnp.mean(y, axis=axes)
            v = jnp.var(y, axis=axes)
            return m, v
        return self._running()

    def forward_and_log_det(self, x, context=None):
        # x is the normalized variable; un-normalize with running stats.
        mean, var = self._running()
        sigma = jnp.sqrt(var + self.eps)
        y = (x - self.beta) * jnp.exp(-self.log_gamma) * sigma + mean
        ldj = jnp.broadcast_to(0.5 * jnp.log(var + self.eps)
                               - self.log_gamma, jnp.shape(x))
        return y, ldj

    def inverse_and_log_det(self, y, context=None):
        x, ldj, _, _ = self.inverse_and_log_det_and_moments(y, context)
        return x, ldj

    def inverse_and_log_det_and_moments(self, y, context=None):
        m, v = self._moments(y)
        sigma = jnp.sqrt(v + self.eps)
        x = (y - m) / sigma * jnp.exp(self.log_gamma) + self.beta
        ldj = jnp.broadcast_to(self.log_gamma - 0.5 * jnp.log(v + self.eps),
                               jnp.shape(y))
        return x, ldj, m, v


def make_domain_transform(domains: Sequence[Tuple[float, float]],
                          target: Tuple[float, float] = (-1.0, 1.0),
                          from_target: bool = False):
    """Affine map taking each per-DOF interval ``domains[i] = (min_i, max_i)``
    to the common ``target`` interval (or back if ``from_target``).

    Reference analog: ``make_domain_transform`` building a
    Shift∘Scale∘Shift tfp chain (vaemolsim/flows.py:15-60).  Returns a
    scalar-acting :class:`Chain` (wrap in :class:`Block` for vector events).
    """
    lo = jnp.asarray([d[0] for d in domains], dtype=jnp.float32)
    hi = jnp.asarray([d[1] for d in domains], dtype=jnp.float32)
    t_lo, t_hi = float(target[0]), float(target[1])
    scale = (t_hi - t_lo) / (hi - lo)
    chain = Chain((
        Shift(jnp.full_like(lo, t_lo)),
        Scale(scale),
        Shift(-lo),
    ))
    if from_target:
        return Inverse(chain)
    return chain
