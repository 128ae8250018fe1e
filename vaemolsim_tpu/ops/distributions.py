"""Functional probability distributions as JAX pytrees.

TPU-first replacement for the tfp.distributions objects the reference
library emits from its layers (reference: vaemolsim/dists.py,
vaemolsim/flows.py — see SURVEY.md §2.3).  Each distribution is a
``flax.struct`` dataclass: parameters are pytree leaves (traced, vmappable,
shardable), structural configuration is static.  All distributions expose

- ``log_prob(x)``
- ``sample(key, sample_shape=())``
- ``sample_and_log_prob(key, sample_shape=())``  (reference:
  ``experimental_sample_and_log_prob``, vaemolsim/mcmc.py:100-103)
- ``event_shape`` / ``batch_shape`` following TFP conventions: samples have
  shape ``sample_shape + batch_shape + event_shape``.

Design notes
------------
* Heterogeneous per-DOF distributions (reference
  ``tfp.distributions.Blockwise`` built from a Python list of scalar dists,
  vaemolsim/dists.py:213-217) are vectorized *by family* in
  :class:`Blockwise` here: one fused log-prob per distribution family
  instead of a Python loop per DOF.  This is the main structural
  performance win for the ELBO hot path.
* Von Mises sampling is a fixed-shape Best–Fisher rejection loop that is
  jit/vmap/scan-safe (no data-dependent shapes), with *implicit
  reparameterization gradients* (Figurnov et al. 2018) attached via
  custom_jvp — dz/dloc = 1 and dz/dconcentration from the cdf identity —
  so sampling-based losses (reverse KL, dual ELBO) differentiate through
  von Mises draws, matching TFP's behavior the reference relies on.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

Array = jax.Array

__all__ = [
    "Distribution",
    "Normal",
    "Uniform",
    "VonMises",
    "Beta",
    "Gamma",
    "Deterministic",
    "Independent",
    "Categorical",
    "MixtureSameFamily",
    "Blockwise",
    "TransformedDistribution",
]

_TWO_PI = 2.0 * math.pi


def _reduce_last(x: Array, ndims: int) -> Array:
    """Sum over the trailing ``ndims`` axes."""
    if ndims == 0:
        return x
    return jnp.sum(x, axis=tuple(range(-ndims, 0)))


class Distribution:
    """Mixin with shared conveniences (not a pytree itself)."""

    def sample_and_log_prob(self, key: Array, sample_shape: Tuple[int, ...] = ()):
        s = self.sample(key, sample_shape)
        return s, self.log_prob(s)

    def sample(self, key, sample_shape=()):  # pragma: no cover - abstract
        raise NotImplementedError

    def mean(self):  # pragma: no cover - optional per family
        raise NotImplementedError(
            f"{type(self).__name__} does not define a closed-form mean")

    def log_prob(self, x):  # pragma: no cover - abstract
        raise NotImplementedError

    @property
    def event_shape(self) -> Tuple[int, ...]:
        return ()

    @property
    def batch_shape(self) -> Tuple[int, ...]:
        raise NotImplementedError


@struct.dataclass
class Normal(Distribution):
    """Scalar normal distribution (batched elementwise).

    Reference analog: ``tfp.distributions.Normal`` as used for latent
    encoders and flow bases (e.g. vaemolsim/tests/conftest.py:14-18).
    """

    loc: Array
    scale: Array

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.loc), jnp.shape(self.scale))

    def log_prob(self, x: Array) -> Array:
        z = (x - self.loc) / self.scale
        return -0.5 * z * z - jnp.log(self.scale) - 0.5 * math.log(_TWO_PI)

    def sample(self, key: Array, sample_shape: Tuple[int, ...] = ()) -> Array:
        shape = tuple(sample_shape) + self.batch_shape
        eps = jax.random.normal(key, shape, dtype=jnp.result_type(self.loc))
        return self.loc + self.scale * eps

    def mean(self) -> Array:
        return jnp.broadcast_to(self.loc, self.batch_shape)

    def entropy(self) -> Array:
        return 0.5 * (1.0 + math.log(_TWO_PI)) + jnp.log(self.scale)

    def kl_divergence(self, other: "Normal") -> Array:
        """Analytic KL(self || other) for two normals."""
        var_ratio = (self.scale / other.scale) ** 2
        t1 = ((self.loc - other.loc) / other.scale) ** 2
        return 0.5 * (var_ratio + t1 - 1.0 - jnp.log(var_ratio))


@struct.dataclass
class Uniform(Distribution):
    """Scalar uniform distribution on [low, high)."""

    low: Array
    high: Array

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.low), jnp.shape(self.high))

    def log_prob(self, x: Array) -> Array:
        inside = (x >= self.low) & (x < self.high)
        lp = -jnp.log(self.high - self.low)
        return jnp.where(inside, lp, -jnp.inf)

    def sample(self, key: Array, sample_shape: Tuple[int, ...] = ()) -> Array:
        shape = tuple(sample_shape) + self.batch_shape
        u = jax.random.uniform(key, shape, dtype=jnp.result_type(self.low))
        return self.low + u * (self.high - self.low)

    def mean(self) -> Array:
        return jnp.broadcast_to(0.5 * (self.low + self.high),
                                self.batch_shape)


def _von_mises_sample_raw(key: Array, loc: Array, concentration: Array,
                          shape: Tuple[int, ...],
                          max_iters: int = 60) -> Array:
    """Best–Fisher (1979) rejection sampler, fixed-shape and jit-safe.

    Uses a wrapped-Cauchy envelope; the while_loop re-draws only until all
    lanes have accepted (capped at ``max_iters`` rounds).  Small
    concentrations (< 1e-5) fall back to a uniform draw on [-pi, pi).
    Gradients flow via implicit reparameterization in
    :func:`_von_mises_sample` (this raw function stop-gradients its
    parameters).
    """
    dtype = jnp.result_type(loc)
    loc = jax.lax.stop_gradient(jnp.broadcast_to(loc, shape).astype(dtype))
    kappa = jax.lax.stop_gradient(
        jnp.broadcast_to(concentration, shape).astype(dtype))
    safe_kappa = jnp.maximum(kappa, 1e-7)

    tau = 1.0 + jnp.sqrt(1.0 + 4.0 * safe_kappa * safe_kappa)
    rho = (tau - jnp.sqrt(2.0 * tau)) / (2.0 * safe_kappa)
    r = (1.0 + rho * rho) / (2.0 * rho)

    def cond(state):
        i, _, _, done = state
        return (i < max_iters) & (~jnp.all(done))

    def body(state):
        i, k, theta, done = state
        k, k1, k2, k3 = jax.random.split(k, 4)
        u1 = jax.random.uniform(k1, shape, dtype=dtype)
        u2 = jax.random.uniform(k2, shape, dtype=dtype, minval=1e-12)
        u3 = jax.random.uniform(k3, shape, dtype=dtype)
        z = jnp.cos(math.pi * u1)
        f = (1.0 + r * z) / (r + z)
        c = safe_kappa * (r - f)
        accept = ((c * (2.0 - c) - u2) > 0.0) | ((jnp.log(c / u2) + 1.0 - c) >= 0.0)
        new_theta = jnp.sign(u3 - 0.5) * jnp.arccos(jnp.clip(f, -1.0, 1.0))
        theta = jnp.where(done, theta, jnp.where(accept, new_theta, theta))
        done = done | accept
        return i + 1, k, theta, done

    key, sub = jax.random.split(key)
    init = (jnp.asarray(0), sub, jnp.zeros(shape, dtype), jnp.zeros(shape, bool))
    _, _, theta, done = jax.lax.while_loop(cond, body, init)

    # Lanes (astronomically unlikely; acceptance >= ~0.66/round) that
    # exhausted max_iters fall back to the large-kappa wrapped-normal
    # approximation instead of returning the initial zero.
    key, sub = jax.random.split(key)
    approx = jax.random.normal(sub, shape, dtype) * jax.lax.rsqrt(safe_kappa)
    approx = approx - _TWO_PI * jnp.round(approx / _TWO_PI)
    theta = jnp.where(done, theta, approx)

    # Uniform fallback for tiny concentration.
    key, sub = jax.random.split(key)
    uni = jax.random.uniform(sub, shape, dtype=dtype,
                             minval=-math.pi, maxval=math.pi)
    theta = jnp.where(kappa < 1e-5, uni, theta)

    # Shift by loc and wrap to [-pi, pi].
    out = theta + loc
    return out - _TWO_PI * jnp.round(out / _TWO_PI)


# ---------------------------------------------------------------------------
# Implicit reparameterization for the von Mises sampler
# (Figurnov, Mohamed & Mnih 2018, arXiv:1805.08498 — see PAPERS.md; the
# reference gets this behavior from TFP's VonMises implementation).
# ---------------------------------------------------------------------------

_GL_NODES, _GL_WEIGHTS = np.polynomial.legendre.leggauss(64)
_GL_NODES = _GL_NODES.astype(np.float32)
_GL_WEIGHTS = _GL_WEIGHTS.astype(np.float32)


def _von_mises_dz_dconc(z0: Array, kappa: Array) -> Array:
    """d sample / d concentration at centered sample z0 in [-pi, pi]:
    -(dF/dkappa)(z0) / p(z0) with dF/dkappa = int_{-pi}^{z0}
    p(t) (cos t - I1/I0) dt (Figurnov et al. 2018; the reference gets
    this from TFP's VonMises).

    Computed by a ratio-stabilized ONE-SIDED Gauss-Legendre quadrature:
    since the full integral of p(t)(cos t - r) vanishes,

        -dF/p(z0) = sign(z0) * int_{|z0|}^{pi}
                        exp(kappa*(cos t - cos z0)) (cos t - r) dt,

    where the density ratio inside the integrand cancels the tail
    underflow that makes the naive two-sided form blow up for
    kappa >~ 20 beyond ~3 sigma.  Measured accuracy vs 30-digit mpmath
    ground truth (tests/test_distributions.py): rel err <= 2e-4 for
    kappa in [0.5, 100] and <= 2e-3 at kappa=1000, for all z0; the
    asymptotic branch
    -z0/(2 kappa) takes over only at kappa > 1000 where the two branches
    agree to ~1e-3 (the old kappa=15 seam had O(20%) tail jumps).
    """
    r = jax.scipy.special.i1e(kappa) / jax.scipy.special.i0e(kappa)
    a = jnp.abs(z0)
    half = (math.pi - a) / 2.0
    t = a[..., None] + half[..., None] * (_GL_NODES + 1.0)  # (..., Q)
    ratio = jnp.exp(kappa[..., None] * (jnp.cos(t) - jnp.cos(a)[..., None]))
    g = jnp.sum(_GL_WEIGHTS * ratio * (jnp.cos(t) - r[..., None]),
                axis=-1) * half
    grad_quad = jnp.sign(z0) * g
    grad_normal = -z0 / (2.0 * kappa)
    return jnp.where(kappa > 1000.0, grad_normal, grad_quad)


@functools.partial(jax.custom_jvp, nondiff_argnums=(0, 3))
def _von_mises_sample(key: Array, loc: Array, concentration: Array,
                      shape: Tuple[int, ...]) -> Array:
    return _von_mises_sample_raw(key, loc, concentration, shape)


@_von_mises_sample.defjvp
def _von_mises_sample_jvp(key, shape, primals, tangents):
    loc, concentration = primals
    dloc, dconc = tangents
    z = _von_mises_sample_raw(key, loc, concentration, shape)
    z0 = z - jnp.broadcast_to(loc, shape)
    z0 = z0 - _TWO_PI * jnp.round(z0 / _TWO_PI)
    kappa = jnp.broadcast_to(concentration, shape)
    dz_dk = _von_mises_dz_dconc(z0, jnp.maximum(kappa, 1e-7))
    tangent = (jnp.broadcast_to(dloc, shape)
               + jnp.broadcast_to(dconc, shape) * dz_dk)
    return z, tangent


@struct.dataclass
class VonMises(Distribution):
    """Scalar von Mises distribution on [-pi, pi].

    log_prob(x) = concentration*cos(x - loc) - log(2*pi*I0(concentration)),
    computed via the exponentially-scaled Bessel function for stability:
    log I0(k) = log(i0e(k)) + k.

    Reference analog: ``tfp.distributions.VonMises`` with the special
    parameter transform of vaemolsim/dists.py:59-72 (see
    ``dists.param_transforms``).
    """

    loc: Array
    concentration: Array

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.loc),
                                    jnp.shape(self.concentration))

    def log_prob(self, x: Array) -> Array:
        k = self.concentration
        log_norm = jnp.log(jax.scipy.special.i0e(k)) + k + math.log(_TWO_PI)
        return k * jnp.cos(x - self.loc) - log_norm

    def sample(self, key: Array, sample_shape: Tuple[int, ...] = ()) -> Array:
        shape = tuple(sample_shape) + self.batch_shape
        return _von_mises_sample(key, self.loc, self.concentration, shape)

    def mean(self) -> Array:
        # Circular mean is the location parameter.
        return jnp.broadcast_to(self.loc, self.batch_shape)


@struct.dataclass
class Beta(Distribution):
    """Scalar Beta distribution on (0, 1)."""

    concentration1: Array
    concentration0: Array

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.concentration1),
                                    jnp.shape(self.concentration0))

    def log_prob(self, x: Array) -> Array:
        a, b = self.concentration1, self.concentration0
        norm = (jax.scipy.special.gammaln(a) + jax.scipy.special.gammaln(b)
                - jax.scipy.special.gammaln(a + b))
        # xlogy/xlog1py: x==0 / x==1 with unit concentration must give
        # the finite uniform-edge density, not 0*(-inf)=NaN (float32
        # sampling does return exact endpoints).
        return (jax.scipy.special.xlogy(a - 1.0, x)
                + jax.scipy.special.xlog1py(b - 1.0, -x) - norm)

    def sample(self, key: Array, sample_shape: Tuple[int, ...] = ()) -> Array:
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.beta(key, self.concentration1, self.concentration0,
                               shape)

    def mean(self) -> Array:
        return jnp.broadcast_to(
            self.concentration1 / (self.concentration1
                                   + self.concentration0),
            self.batch_shape)


@struct.dataclass
class Gamma(Distribution):
    """Scalar Gamma distribution (concentration/rate parametrization)."""

    concentration: Array
    rate: Array

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.concentration),
                                    jnp.shape(self.rate))

    def log_prob(self, x: Array) -> Array:
        a, r = self.concentration, self.rate
        # xlogy: a==1 at x==0 is the exponential's finite log(rate), not
        # 0*(-inf)=NaN (jax.random.gamma emits exact 0.0 in float32 for
        # small concentrations).
        return (a * jnp.log(r) + jax.scipy.special.xlogy(a - 1.0, x)
                - r * x - jax.scipy.special.gammaln(a))

    def sample(self, key: Array, sample_shape: Tuple[int, ...] = ()) -> Array:
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.gamma(key, self.concentration, shape) / self.rate

    def mean(self) -> Array:
        return jnp.broadcast_to(self.concentration / self.rate,
                                self.batch_shape)


@struct.dataclass
class Deterministic(Distribution):
    """Dirac delta at ``loc`` (reference: vaemolsim/dists.py:701-704).

    ``sample`` returns ``loc`` *with gradients* — this is what makes the
    reference's deterministic-encoder VAE trainable (the encoder output
    flows through the prior's log-prob).  ``log_prob`` is 0 at the atom and
    -inf elsewhere (within ``atol``), matching tfp.distributions.Deterministic.
    """

    loc: Array
    atol: float = struct.field(pytree_node=False, default=1e-6)

    @property
    def batch_shape(self):
        return jnp.shape(self.loc)

    def log_prob(self, x: Array) -> Array:
        eq = jnp.abs(x - self.loc) <= self.atol
        return jnp.where(eq, 0.0, -jnp.inf)

    def sample(self, key: Array, sample_shape: Tuple[int, ...] = ()) -> Array:
        del key
        return jnp.broadcast_to(self.loc, tuple(sample_shape) + self.batch_shape)

    def mean(self) -> Array:
        return jnp.broadcast_to(self.loc, self.batch_shape)


@struct.dataclass
class Independent(Distribution):
    """Reinterpret the trailing ``reinterpreted_batch_ndims`` batch axes of a
    scalar distribution as event axes (log-probs summed over them).

    Reference analog: ``tfp.distributions.Independent`` (e.g.
    vaemolsim/dists.py:604-610).
    """

    base: Distribution
    reinterpreted_batch_ndims: int = struct.field(pytree_node=False, default=1)

    @property
    def batch_shape(self):
        bs = self.base.batch_shape
        return bs[: len(bs) - self.reinterpreted_batch_ndims]

    @property
    def event_shape(self):
        bs = self.base.batch_shape
        return bs[len(bs) - self.reinterpreted_batch_ndims:]

    def log_prob(self, x: Array) -> Array:
        return _reduce_last(self.base.log_prob(x), self.reinterpreted_batch_ndims)

    def sample(self, key: Array, sample_shape: Tuple[int, ...] = ()) -> Array:
        return self.base.sample(key, sample_shape)

    def mean(self) -> Array:
        return self.base.mean()

    def entropy(self) -> Array:
        return _reduce_last(self.base.entropy(), self.reinterpreted_batch_ndims)


@struct.dataclass
class Categorical(Distribution):
    """Categorical over the last axis of ``logits``."""

    logits: Array

    @property
    def batch_shape(self):
        return jnp.shape(self.logits)[:-1]

    @property
    def num_categories(self):
        return jnp.shape(self.logits)[-1]

    def log_prob(self, x: Array) -> Array:
        lp = jax.nn.log_softmax(self.logits, axis=-1)
        return jnp.take_along_axis(
            lp, x[..., None].astype(jnp.int32), axis=-1)[..., 0]

    def sample(self, key: Array, sample_shape: Tuple[int, ...] = ()) -> Array:
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.categorical(key, self.logits, axis=-1, shape=shape)


@struct.dataclass
class MixtureSameFamily(Distribution):
    """Mixture with a shared component family.

    ``components`` is any distribution whose *last batch axis* indexes the
    mixture components — scalar-event (``Normal``) or vector-event
    (``Independent(Normal(locs, scales), 1)`` with ``locs`` of shape
    ``(K, d)``), matching ``tfp.distributions.MixtureSameFamily``'s
    event-shape semantics.  Used for analytic multi-mode targets in
    tests/benchmarks (reference notebooks build tfp Mixture data sources).
    """

    mixing_logits: Array  # (..., K)
    components: Distribution  # batch shape (..., K), any event shape

    @property
    def batch_shape(self):
        return jnp.shape(self.mixing_logits)[:-1]

    @property
    def event_shape(self):
        return self.components.event_shape

    def log_prob(self, x: Array) -> Array:
        e = len(self.components.event_shape)
        # Insert the K axis just before the event dims so x broadcasts
        # against the components' (..., K) batch.
        lp_comp = self.components.log_prob(
            jnp.expand_dims(x, axis=-(e + 1)))  # (..., K)
        log_mix = jax.nn.log_softmax(self.mixing_logits, axis=-1)
        return jax.scipy.special.logsumexp(lp_comp + log_mix, axis=-1)

    def sample(self, key: Array, sample_shape: Tuple[int, ...] = ()) -> Array:
        k1, k2 = jax.random.split(key)
        shape = tuple(sample_shape) + self.batch_shape
        idx = jax.random.categorical(k1, self.mixing_logits, axis=-1, shape=shape)
        # (sample, ..., K, *event)
        comp_samples = self.components.sample(k2, sample_shape)
        e = len(self.components.event_shape)
        k_axis = -(e + 1)
        idx_e = idx.reshape(idx.shape + (1,) * (e + 1))
        picked = jnp.take_along_axis(comp_samples, idx_e, axis=k_axis)
        return jnp.squeeze(picked, axis=k_axis)


# ---------------------------------------------------------------------------
# Family-grouped Blockwise
# ---------------------------------------------------------------------------


@struct.dataclass
class Blockwise(Distribution):
    """Concatenation of per-DOF scalar distributions into one event vector,
    vectorized by distribution family.

    Reference analog: ``tfp.distributions.Blockwise`` over a Python list of
    per-DOF dists (vaemolsim/dists.py:210-217) — a Python-object loop per
    call.  Here, DOFs sharing a family are evaluated in one fused op: each
    entry of ``families`` is a scalar distribution whose last batch axis
    spans that family's DOFs, and ``perm``/static index bookkeeping scatters
    results back to the original DOF order.

    Attributes
    ----------
    families : tuple of Distribution
        One batched scalar distribution per family; family f has batch shape
        ``batch + (n_f,)``.
    dof_indices : tuple of tuple of int  (static)
        ``dof_indices[f][j]`` is the original DOF position of family f's
        j-th column.  Together the indices are a permutation of
        ``range(num_dofs)``.
    """

    families: Tuple[Distribution, ...]
    dof_indices: Tuple[Tuple[int, ...], ...] = struct.field(pytree_node=False)

    @property
    def num_dofs(self) -> int:
        return sum(len(ix) for ix in self.dof_indices)

    @property
    def event_shape(self):
        return (self.num_dofs,)

    @property
    def batch_shape(self):
        bs = self.families[0].batch_shape
        return bs[:-1]

    def _gather_cols(self, x: Array, f: int) -> Array:
        idx = jnp.asarray(self.dof_indices[f])
        return jnp.take(x, idx, axis=-1)

    @property
    def _inverse_perm(self):
        """Static inverse permutation mapping family-concatenated column
        order back to original DOF order."""
        perm = [i for ix in self.dof_indices for i in ix]
        inv = [0] * len(perm)
        for pos, dof in enumerate(perm):
            inv[dof] = pos
        return tuple(inv)

    def log_prob(self, x: Array) -> Array:
        total = 0.0
        for f, fam in enumerate(self.families):
            total = total + jnp.sum(fam.log_prob(self._gather_cols(x, f)), axis=-1)
        return total

    def log_prob_per_dof(self, x: Array) -> Array:
        """Per-DOF log probs in the original DOF order (for diagnostics)."""
        parts = [fam.log_prob(self._gather_cols(x, f))
                 for f, fam in enumerate(self.families)]
        cat = jnp.concatenate(parts, axis=-1)
        return jnp.take(cat, jnp.asarray(self._inverse_perm), axis=-1)

    def sample(self, key: Array, sample_shape: Tuple[int, ...] = ()) -> Array:
        keys = jax.random.split(key, len(self.families))
        parts = [fam.sample(k, sample_shape)
                 for fam, k in zip(self.families, keys)]
        cat = jnp.concatenate(parts, axis=-1)
        return jnp.take(cat, jnp.asarray(self._inverse_perm), axis=-1)


# ---------------------------------------------------------------------------
# Transformed distribution
# ---------------------------------------------------------------------------


@struct.dataclass
class TransformedDistribution(Distribution):
    """Pushforward of ``base`` through ``bijector``.

    Reference analog: ``tfp.distributions.TransformedDistribution``
    (vaemolsim/flows.py:350-355, 678-690).  Conditional context for the
    bijector (the reference's ``kwargs_split_fn`` / ``bijector_kwargs``
    machinery, vaemolsim/flows.py:684-688) is carried explicitly as the
    ``context`` field — an array pytree passed to every bijector call.
    """

    base: Distribution
    bijector: Any  # ops.bijectors.Bijector
    context: Optional[Array] = None

    @property
    def batch_shape(self):
        return self.base.batch_shape

    @property
    def event_shape(self):
        return self.base.event_shape

    def log_prob(self, y: Array) -> Array:
        x, ildj = self.bijector.inverse_and_log_det(y, context=self.context)
        return self.base.log_prob(x) + ildj

    def sample(self, key: Array, sample_shape: Tuple[int, ...] = ()) -> Array:
        x = self.base.sample(key, sample_shape)
        return self.bijector.forward(x, context=self.context)

    def sample_and_log_prob(self, key: Array, sample_shape: Tuple[int, ...] = ()):
        x, base_lp = self.base.sample_and_log_prob(key, sample_shape)
        y, fldj = self.bijector.forward_and_log_det(x, context=self.context)
        return y, base_lp - fldj
