"""Rational-quadratic spline transform (Durkan et al. 2019, NeurIPS).

First-party TPU-native replacement for
``tfp.bijectors.RationalQuadraticSpline`` as used by the reference's flows
(vaemolsim/flows.py:204-207, 512-515 — see SURVEY.md §2.3).  Semantics
match TFP:

- ``bin_widths`` (..., K) and ``bin_heights`` (..., K) are positive and the
  knot grid starts at ``range_min`` (x-knots = range_min + cumsum(widths),
  y-knots likewise); the caller guarantees widths and heights sum to the
  same total range (the reference's softmax·(range - K*1e-2) + 1e-2
  activation, vaemolsim/flows.py:86-93, does exactly this).
- ``knot_slopes`` (..., K-1) are the derivatives at the K-1 *interior*
  knots; boundary derivatives are fixed to 1 so the transform continues as
  the identity outside ``[range_min, range_min + total]``.
- Outside the range the transform is the identity with zero log-det.

Everything is elementwise + one gather — fully fusable by XLA.  The
bin search is a vectorized comparison-sum (no sort, no dynamic shapes),
which maps onto the VPU as a (K x lanes) broadcast-compare.  A fused
Pallas kernel for the (chains x DOFs) MCMC hot path lives in
``ops/rqs_pallas.py``; this module is the reference XLA path and the
ground truth for its tests.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from vaemolsim_tpu.ops.bijectors import Bijector

Array = jax.Array

__all__ = ["rqs_forward", "rqs_inverse", "rqs_forward_circular",
           "rqs_inverse_circular", "RationalQuadraticSpline",
           "set_implementation"]


def _knots(widths: Array, heights: Array, range_min: float):
    """Cumulative knot positions with a leading range_min knot: (..., K+1)."""
    x_knots = range_min + jnp.concatenate(
        [jnp.zeros_like(widths[..., :1]), jnp.cumsum(widths, axis=-1)], axis=-1)
    y_knots = range_min + jnp.concatenate(
        [jnp.zeros_like(heights[..., :1]), jnp.cumsum(heights, axis=-1)], axis=-1)
    return x_knots, y_knots


def _pad_slopes(slopes: Array) -> Array:
    """Boundary derivatives are 1: (..., K-1) -> (..., K+1)."""
    ones = jnp.ones_like(slopes[..., :1])
    return jnp.concatenate([ones, slopes, ones], axis=-1)


def _search(knots: Array, t: Array) -> Array:
    """Index of the bin containing t: comparisons against interior knots.

    knots: (..., K+1); t: (...,).  Returns int32 (...,) in [0, K-1].
    """
    # Compare against knots[1:-1] (interior boundaries).
    interior = knots[..., 1:-1]
    return jnp.sum((t[..., None] >= interior).astype(jnp.int32), axis=-1)


def _gather(params: Array, idx: Array) -> Array:
    # One-hot contraction instead of take_along_axis: generic gathers are
    # slow on TPU, while a (., K) masked reduction is a pure VPU op that
    # XLA fuses with the surrounding elementwise work (measured ~10x on
    # the (10k chains x 32 bins) MCMC hot path).
    K = params.shape[-1]
    onehot = (jax.lax.broadcasted_iota(jnp.int32, idx.shape + (K,),
                                       idx.ndim)
              == idx[..., None])
    return jnp.sum(jnp.where(onehot, params, 0.0), axis=-1)


_IMPL = "xla"  # "xla" | "pallas"; see set_implementation()


def set_implementation(impl: str) -> None:
    """Select the RQS backend: "xla" (default, fused elementwise) or
    "pallas" (the fused VMEM kernel in ops/rqs_pallas.py; TPU only —
    falls back to XLA off-TPU)."""
    global _IMPL
    if impl not in ("xla", "pallas"):
        raise ValueError(f"impl must be 'xla' or 'pallas', got {impl!r}")
    _IMPL = impl


def _use_pallas() -> bool:
    return _IMPL == "pallas" and jax.default_backend() == "tpu"


def rqs_forward(x: Array, widths: Array, heights: Array, slopes: Array,
                range_min: float) -> Tuple[Array, Array]:
    """Forward spline: returns (y, elementwise log|dy/dx|)."""
    if _use_pallas():
        from vaemolsim_tpu.ops.rqs_pallas import rqs_forward_pallas
        return rqs_forward_pallas(x, widths, heights, slopes, range_min)
    return _rqs_forward_xla(x, widths, heights, slopes, range_min)


def _rqs_forward_xla(x: Array, widths: Array, heights: Array, slopes: Array,
                     range_min: float) -> Tuple[Array, Array]:
    x_knots, y_knots = _knots(widths, heights, range_min)
    d = _pad_slopes(slopes)
    total = x_knots[..., -1]

    inside = (x >= range_min) & (x <= total)
    # Clamp to a safe in-range value so gathers/ratios stay finite.
    x_safe = jnp.clip(x, range_min, total)

    idx = jnp.clip(_search(x_knots, x_safe), 0, widths.shape[-1] - 1)
    xk = _gather(x_knots, idx)
    yk = _gather(y_knots, idx)
    wk = _gather(widths, idx)
    hk = _gather(heights, idx)
    dk = _gather(d, idx)
    dk1 = _gather(d, idx + 1)

    s = hk / wk
    xi = (x_safe - xk) / wk
    xi1m = 1.0 - xi
    num = hk * (s * xi * xi + dk * xi * xi1m)
    den = s + (dk1 + dk - 2.0 * s) * xi * xi1m
    y = yk + num / den

    deriv = (s * s) * (dk1 * xi * xi + 2.0 * s * xi * xi1m + dk * xi1m * xi1m) / (den * den)
    ldj = jnp.log(deriv)

    y = jnp.where(inside, y, x)
    ldj = jnp.where(inside, ldj, jnp.zeros_like(ldj))
    return y, ldj


def rqs_inverse(y: Array, widths: Array, heights: Array, slopes: Array,
                range_min: float) -> Tuple[Array, Array]:
    """Inverse spline: returns (x, elementwise log|dx/dy|)."""
    if _use_pallas():
        from vaemolsim_tpu.ops.rqs_pallas import rqs_inverse_pallas
        return rqs_inverse_pallas(y, widths, heights, slopes, range_min)
    return _rqs_inverse_xla(y, widths, heights, slopes, range_min)


def _rqs_inverse_xla(y: Array, widths: Array, heights: Array, slopes: Array,
                     range_min: float) -> Tuple[Array, Array]:
    x_knots, y_knots = _knots(widths, heights, range_min)
    d = _pad_slopes(slopes)
    total = y_knots[..., -1]

    inside = (y >= range_min) & (y <= total)
    y_safe = jnp.clip(y, range_min, total)

    idx = jnp.clip(_search(y_knots, y_safe), 0, heights.shape[-1] - 1)
    xk = _gather(x_knots, idx)
    yk = _gather(y_knots, idx)
    wk = _gather(widths, idx)
    hk = _gather(heights, idx)
    dk = _gather(d, idx)
    dk1 = _gather(d, idx + 1)

    s = hk / wk
    t = y_safe - yk
    dsum = dk1 + dk - 2.0 * s
    a = hk * (s - dk) + t * dsum
    b = hk * dk - t * dsum
    c = -s * t
    # Stable quadratic root in [0, 1]: xi = 2c / (-b - sqrt(b^2 - 4ac)).
    disc = b * b - 4.0 * a * c
    disc = jnp.maximum(disc, 0.0)
    xi = (2.0 * c) / (-b - jnp.sqrt(disc))
    xi = jnp.clip(xi, 0.0, 1.0)
    x = xk + xi * wk

    xi1m = 1.0 - xi
    den = s + dsum * xi * xi1m
    deriv = (s * s) * (dk1 * xi * xi + 2.0 * s * xi * xi1m + dk * xi1m * xi1m) / (den * den)
    ldj = -jnp.log(deriv)

    x = jnp.where(inside, x, y)
    ldj = jnp.where(inside, ldj, jnp.zeros_like(ldj))
    return x, ldj


def _rqs_circular(t: Array, widths: Array, heights: Array,
                  slopes: Array, range_min: float,
                  inverse: bool) -> Tuple[Array, Array]:
    """Circular RQS (Rezende et al. 2020, "Normalizing Flows on Tori and
    Spheres"): a diffeomorphism of the circle lifted to the line.

    ``slopes`` has K entries — the derivative at EVERY knot, with knot K
    identified with knot 0 (``d_K = d_0``), which makes the transform's
    derivative continuous across the seam (the linear spline's
    identity-tail boundary condition breaks exactly there).  Inputs are
    wrapped into the base period and the winding offset added back, so
    ``f(t + P) = f(t) + P`` exactly."""
    x_knots, y_knots = _knots(widths, heights, range_min)
    d = jnp.concatenate([slopes, slopes[..., :1]], axis=-1)  # d_K = d_0
    period = x_knots[..., -1] - range_min

    t_wrap = range_min + jnp.mod(t - range_min, period)
    winding = t - t_wrap

    knots_in = y_knots if inverse else x_knots
    idx = jnp.clip(_search(knots_in, t_wrap), 0, widths.shape[-1] - 1)
    xk = _gather(x_knots, idx)
    yk = _gather(y_knots, idx)
    wk = _gather(widths, idx)
    hk = _gather(heights, idx)
    dk = _gather(d, idx)
    dk1 = _gather(d, idx + 1)
    s = hk / wk

    if not inverse:
        xi = (t_wrap - xk) / wk
        xi1m = 1.0 - xi
        den = s + (dk1 + dk - 2.0 * s) * xi * xi1m
        out = yk + hk * (s * xi * xi + dk * xi * xi1m) / den
    else:
        tt = t_wrap - yk
        dsum = dk1 + dk - 2.0 * s
        a = hk * (s - dk) + tt * dsum
        b = hk * dk - tt * dsum
        c = -s * tt
        disc = jnp.maximum(b * b - 4.0 * a * c, 0.0)
        xi = jnp.clip((2.0 * c) / (-b - jnp.sqrt(disc)), 0.0, 1.0)
        xi1m = 1.0 - xi
        den = s + dsum * xi * xi1m
        out = xk + xi * wk

    deriv = (s * s) * (dk1 * xi * xi + 2.0 * s * xi * xi1m
                       + dk * xi1m * xi1m) / (den * den)
    ldj = jnp.log(deriv)
    return out + winding, (-ldj if inverse else ldj)


def rqs_forward_circular(x: Array, widths: Array, heights: Array,
                         slopes: Array, range_min: float
                         ) -> Tuple[Array, Array]:
    """Forward circular spline (``slopes``: (..., K), periodic seam
    derivative).  Returns (y, log|dy/dx|)."""
    return _rqs_circular(x, widths, heights, slopes, range_min, False)


def rqs_inverse_circular(y: Array, widths: Array, heights: Array,
                         slopes: Array, range_min: float
                         ) -> Tuple[Array, Array]:
    """Inverse circular spline.  Returns (x, log|dx/dy|)."""
    return _rqs_circular(y, widths, heights, slopes, range_min, True)


@struct.dataclass
class RationalQuadraticSpline(Bijector):
    """Scalar-acting RQS bijector (wrap in ``Block(..., 1)`` for vector
    events).  Parameters may carry arbitrary leading batch axes; each
    element of the input has its own spline.

    ``circular=True`` selects the Rezende-et-al. circle variant:
    ``knot_slopes`` then has K entries (one per knot, seam shared) and
    the transform is an exact circle diffeomorphism — periodic with
    continuous derivative across the seam — instead of an
    identity-tailed line transform.  (The Pallas backend covers the
    linear variant only; circular always runs the XLA path.)"""

    bin_widths: Array  # (..., K)
    bin_heights: Array  # (..., K)
    knot_slopes: Array  # (..., K-1); (..., K) when circular
    range_min: float = struct.field(pytree_node=False, default=-1.0)
    circular: bool = struct.field(pytree_node=False, default=False)

    def forward_and_log_det(self, x, context=None):
        if self.circular:
            return rqs_forward_circular(x, self.bin_widths,
                                        self.bin_heights,
                                        self.knot_slopes, self.range_min)
        return rqs_forward(x, self.bin_widths, self.bin_heights,
                           self.knot_slopes, self.range_min)

    def inverse_and_log_det(self, y, context=None):
        if self.circular:
            return rqs_inverse_circular(y, self.bin_widths,
                                        self.bin_heights,
                                        self.knot_slopes, self.range_min)
        return rqs_inverse(y, self.bin_widths, self.bin_heights,
                           self.knot_slopes, self.range_min)
