"""Fused Pallas TPU kernel for the rational-quadratic spline.

The RQS transform (ops/rqs.py) is the hot op of both flow training and
the MCMC inner loop (SURVEY.md §2.3 row 1: "Pallas kernel: fused
bin-search + spline eval + logdet, forward and inverse, batched over
(chains x DOFs)").  The XLA path materializes the knot cumsums and
one-hot selects between fused loops; this kernel keeps the whole
computation — cumulative knots, bin search, per-bin gather, rational
quadratic evaluation and log-det — in VMEM registers for a (TILE_N, K)
block, emitting (y, ldj) in one pass.

Layout: inputs are flattened to (N,) elements with per-element parameter
rows (N, K) / (N, K-1); the grid tiles N by ``TILE_N`` rows (K rides the
lane dimension).  Forward and inverse share the kernel body via a static
``inverse`` flag.

Gradients: the public entry points carry a ``jax.custom_vjp`` whose
backward pass reuses the *XLA* implementation's autodiff (the spline is
cheap to recompute; this keeps the kernel forward-only and the
gradients exactly consistent with ops/rqs.py).

Measured on TPU v5e (30k elements x 32 bins, 100-step scan): this kernel
runs ~272us/iter vs ~125us/iter for the one-hot XLA path in ops/rqs.py —
after the XLA path's gathers were replaced with one-hot VPU reductions,
XLA's fusion wins (the kernel cannot fuse with the producing MADE matmuls
and pays tile/pad overheads).  The XLA path therefore stays the default
(``ops.rqs.set_implementation``); this kernel is kept as a correct,
tested backend and as the substrate for a future fully-fused MAF-block
kernel (MADE matmuls + activations + spline in one VMEM pass), which is
the fusion XLA cannot do across the conditioner boundary.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vaemolsim_tpu.ops import rqs as rqs_xla

Array = jax.Array

__all__ = ["rqs_forward_pallas", "rqs_inverse_pallas"]

TILE_N = 512


def _rqs_kernel(x_ref, w_ref, h_ref, s_ref, y_ref, ldj_ref, *,
                range_min: float, inverse: bool):
    x = x_ref[:]  # (T, 1)
    w = w_ref[:]  # (T, K)
    h = h_ref[:]  # (T, K)
    s = s_ref[:]  # (T, K-1)
    T, K = w.shape

    # Knot offsets via an inclusive-prefix-sum matmul (cumsum has no
    # Pallas TPU lowering; a (K, K) triangular matmul rides the MXU).
    lk = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    tril = (lk <= lj).astype(w.dtype)  # [k, j] = 1 if k <= j
    # HIGHEST precision: the default MXU f32 path rounds through bf16,
    # which shifts knot positions enough to flip bin assignments.
    cw = jnp.dot(w, tril, preferred_element_type=w.dtype,
                 precision=jax.lax.Precision.HIGHEST)  # (T, K)
    ch = jnp.dot(h, tril, preferred_element_type=h.dtype,
                 precision=jax.lax.Precision.HIGHEST)
    total_in = (ch if inverse else cw)[:, -1:]  # (T, 1)

    t = x - range_min  # offset coordinate
    inside = (t >= 0.0) & (t <= total_in)
    t_safe = jnp.clip(t, 0.0, total_in)

    # Bin index: number of *interior* knot offsets <= t (K-1 comparisons).
    c_in = ch if inverse else cw
    idx = jnp.sum((t_safe >= c_in[:, :-1]).astype(jnp.int32), axis=-1,
                  keepdims=True)  # (T, 1) in [0, K-1]

    # One-hot gathers of the bin quantities (VPU reductions over K lanes).
    lane = jax.lax.broadcasted_iota(jnp.int32, (T, K), 1)
    onehot = (lane == idx).astype(w.dtype)  # (T, K)

    def sel(p):  # (T, K) -> (T, 1)
        return jnp.sum(p * onehot, axis=-1, keepdims=True)

    wk = sel(w)
    hk = sel(h)
    # Knot offsets at the bin's lower edge: cumsum shifted right.
    xk = sel(cw) - wk
    yk = sel(ch) - hk
    # Padded slopes: d_k with boundary 1s; d has K+1 entries, bin k uses
    # d[k], d[k+1].  Build the two gathers from s with edge handling.
    ones = jnp.ones((T, 1), w.dtype)
    s_pad = jnp.concatenate([ones, s, ones], axis=-1)  # (T, K+1)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (T, K + 1), 1)
    dk = jnp.sum(s_pad * (lane1 == idx).astype(w.dtype), axis=-1,
                 keepdims=True)
    dk1 = jnp.sum(s_pad * (lane1 == idx + 1).astype(w.dtype), axis=-1,
                  keepdims=True)

    sl = hk / wk  # bin slope
    if not inverse:
        xi = (t_safe - xk) / wk
        xi1m = 1.0 - xi
        den = sl + (dk1 + dk - 2.0 * sl) * xi * xi1m
        num = hk * (sl * xi * xi + dk * xi * xi1m)
        out = range_min + yk + num / den
        deriv = (sl * sl) * (dk1 * xi * xi + 2.0 * sl * xi * xi1m
                             + dk * xi1m * xi1m) / (den * den)
        ldj = jnp.log(deriv)
    else:
        ty = t_safe - yk
        dsum = dk1 + dk - 2.0 * sl
        a = hk * (sl - dk) + ty * dsum
        b = hk * dk - ty * dsum
        c = -sl * ty
        disc = jnp.maximum(b * b - 4.0 * a * c, 0.0)
        xi = (2.0 * c) / (-b - jnp.sqrt(disc))
        xi = jnp.clip(xi, 0.0, 1.0)
        out = range_min + xk + xi * wk
        xi1m = 1.0 - xi
        den = sl + dsum * xi * xi1m
        deriv = (sl * sl) * (dk1 * xi * xi + 2.0 * sl * xi * xi1m
                             + dk * xi1m * xi1m) / (den * den)
        ldj = -jnp.log(deriv)

    y_ref[:] = jnp.where(inside, out, x)
    ldj_ref[:] = jnp.where(inside, ldj, jnp.zeros_like(ldj))


def _pallas_impl(x: Array, w: Array, h: Array, s: Array, range_min: float,
                 inverse: bool, interpret: bool) -> Tuple[Array, Array]:
    K = w.shape[-1]
    # Parameters may carry MORE leading batch axes than x (the public
    # contract): the output shape is the broadcast of both.
    orig_shape = jax.lax.broadcast_shapes(x.shape, w.shape[:-1],
                                          h.shape[:-1], s.shape[:-1])
    x2 = jnp.broadcast_to(x, orig_shape).reshape(-1, 1)
    w2 = jnp.broadcast_to(w, orig_shape + (K,)).reshape(-1, K)
    h2 = jnp.broadcast_to(h, orig_shape + (K,)).reshape(-1, K)
    s2 = jnp.broadcast_to(s, orig_shape + (K - 1,)).reshape(-1, K - 1)
    N = x2.shape[0]
    pad = (-N) % TILE_N
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        w2 = jnp.pad(w2, ((0, pad), (0, 0)), constant_values=1.0)
        h2 = jnp.pad(h2, ((0, pad), (0, 0)), constant_values=1.0)
        s2 = jnp.pad(s2, ((0, pad), (0, 0)), constant_values=1.0)
    Np = x2.shape[0]

    kernel = functools.partial(_rqs_kernel, range_min=range_min,
                               inverse=inverse)
    grid = (Np // TILE_N,)
    y, ldj = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, K - 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_N, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, 1), x2.dtype),
            jax.ShapeDtypeStruct((Np, 1), x2.dtype),
        ],
        interpret=interpret,
    )(x2, w2, h2, s2)
    y = y[:N, 0].reshape(orig_shape)
    ldj = ldj[:N, 0].reshape(orig_shape)
    return y, ldj


def _make_entry(inverse: bool):
    # The PRIVATE XLA implementations, not the public dispatcher: with
    # the pallas backend enabled the dispatcher would route this very
    # op's backward back into the pallas op's own vjp — unbounded
    # recursion on the first jax.grad.
    xla_fn = (rqs_xla._rqs_inverse_xla if inverse
              else rqs_xla._rqs_forward_xla)

    @functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
    def op(x, w, h, s, range_min, interpret=False):
        return _pallas_impl(x, w, h, s, range_min, inverse, interpret)

    def fwd(x, w, h, s, range_min, interpret=False):
        out = _pallas_impl(x, w, h, s, range_min, inverse, interpret)
        return out, (x, w, h, s)

    def bwd(range_min, interpret, res, g):
        x, w, h, s = res
        # Recompute through the XLA path for exact, cheap gradients.
        _, vjp = jax.vjp(lambda *a: xla_fn(*a, range_min), x, w, h, s)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


rqs_forward_pallas = _make_entry(inverse=False)
rqs_inverse_pallas = _make_entry(inverse=True)
