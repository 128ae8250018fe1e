"""Fused MAF-block Pallas kernel: MADE matmuls + spline activations +
RQS evaluation in one VMEM pass.

This is the cross-conditioner-boundary fusion that plain XLA cannot do
(see ops/rqs_pallas.py:23-31 and ops/fused_mlp.py): for one masked-
autoregressive RQS block (reference semantics:
vaemolsim/flows.py:489-515 — three single-hidden-layer MADEs for
widths/heights/slopes, tanh hidden, softmax/softplus spline activations
with the 1e-2 floors, then tfp.RationalQuadraticSpline), the whole
density (inverse) pass

    h   = tanh(y @ K1 [+ ctx @ C1] + b1)          # merged 3-net hidden
    out = h @ K2 [+ ctx @ C2] + b2                # block-diagonal heads
    w, hh = softmax-floor(raw), s = softplus-floor(raw)
    x, ildj = RQS^{-1}(y; w, hh, s)

runs per (TILE_N x ...) tile entirely in VMEM: one HBM read of y (and
ctx), one write of (x, ildj).  The forward (sampling) pass iterates the
conditioner D times *inside* the kernel (the MAF fixed-point over the
autoregressive depth), so sampling needs zero HBM round-trips between
refinement passes.

Weight layout matches flows.MaskedSplineConditioner._merged_raw: K1 is
the three masked first-layer kernels concatenated along the output axis
(D, 3H); K2 is block-diag of the three masked second layers
(3H, D*(3K-1)); biases concatenated likewise.  Masks are pre-applied
(they are static), so the kernel sees plain dense matmuls.

Gradients: custom_vjp whose backward pass recomputes through the XLA
path (exactly consistent with the default implementation; the block is
cheap to recompute).  Numerics: f32 matmuls run at HIGHEST precision so
the kernel is bit-comparable to the XLA path within float32 roundoff
(golden-tested in tests/test_maf_fused.py; max err ~5e-7 on chip).

MEASURED (TPU v5e, marginal us per block-inverse eval, bf16, hidden
200, 32 bins; see docs/performance.md for the full study):
10k x D=1: XLA 22 / fused ~150;  10k x D=3: XLA 97 / fused 347;
100k x D=3: XLA 1880 / fused 3638;  10k x D=8: XLA 159 / fused 914.
XLA wins at every reference-relevant shape — for D=1 the constant-
spline optimization (flows.MAFLayer._spline) removes the matmuls
entirely, and at D>=2 XLA's MXU codegen outruns this handwritten
matmul ~2x at these widths while the bf16 hidden activation keeps the
HBM round-trip cheap.  The kernel therefore stays an OPTIONAL backend
(flows.set_maf_fused) — correct, gradient-checked, and kept for larger
conditioner widths where the fusion economics change.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

__all__ = ["maf_block_inverse_fused", "maf_block_forward_fused"]

TILE_N = 512
_HIGH = jax.lax.Precision.HIGHEST


def _spline_params_tile(raw_w, raw_h, raw_s, bin_min, bin_max, num_bins):
    """Reference activations (vaemolsim/flows.py:86-101) on a 2-D tile."""
    span = bin_max - bin_min - num_bins * 1e-2
    w = jax.nn.softmax(raw_w, axis=-1) * span + 1e-2
    h = jax.nn.softmax(raw_h, axis=-1) * span + 1e-2
    s = jax.nn.softplus(raw_s) + 1e-2
    return w, h, s


def _rqs_tile(t_in, w, h, s, range_min, inverse):
    """RQS eval + log-det for a (T,) column against (T, K) params.

    Same math as ops/rqs_pallas.py (one-hot selects, prefix-sum knots via
    triangular matmul, identity tails); kept 2-D throughout for TPU
    lane/sublane layout.
    """
    T, K = w.shape
    x = t_in[:, None]  # (T, 1)
    lk = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    tril = (lk <= lj).astype(w.dtype)
    cw = jnp.dot(w, tril, preferred_element_type=w.dtype, precision=_HIGH)
    ch = jnp.dot(h, tril, preferred_element_type=h.dtype, precision=_HIGH)
    c_in = ch if inverse else cw
    total_in = c_in[:, -1:]

    t = x - range_min
    inside = (t >= 0.0) & (t <= total_in)
    t_safe = jnp.clip(t, 0.0, total_in)

    idx = jnp.sum((t_safe >= c_in[:, :-1]).astype(jnp.int32), axis=-1,
                  keepdims=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, (T, K), 1)
    onehot = (lane == idx).astype(w.dtype)

    def sel(p):
        return jnp.sum(p * onehot, axis=-1, keepdims=True)

    wk, hk = sel(w), sel(h)
    xk = sel(cw) - wk
    yk = sel(ch) - hk
    ones = jnp.ones((T, 1), w.dtype)
    s_pad = jnp.concatenate([ones, s, ones], axis=-1)  # (T, K+1)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (T, K + 1), 1)
    dk = jnp.sum(s_pad * (lane1 == idx).astype(w.dtype), axis=-1,
                 keepdims=True)
    dk1 = jnp.sum(s_pad * (lane1 == idx + 1).astype(w.dtype), axis=-1,
                  keepdims=True)

    sl = hk / wk
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

    out = jnp.where(inside, out, x)
    ldj = jnp.where(inside, ldj, jnp.zeros_like(ldj))
    return out[:, 0], ldj[:, 0]


def _conditioner_tile(y, ctx, k1, b1, k2, b2, c1, c2, compute_dtype):
    """(T, D) -> three raw spline-parameter tiles via the merged MADE.

    bf16 inputs use the MXU's native bf16 path with f32 accumulation
    (Mosaic rejects HIGHEST precision on mixed bf16->f32 matmuls);
    f32 inputs use HIGHEST so the kernel matches the XLA path bit-for-
    bit within roundoff.
    """
    cd = compute_dtype
    prec = _HIGH if cd == jnp.float32 else jax.lax.Precision.DEFAULT

    def mm(a, b):
        return jnp.dot(a.astype(cd), b.astype(cd),
                       preferred_element_type=jnp.float32, precision=prec)

    h = mm(y, k1)
    if ctx is not None:
        h = h + mm(ctx, c1)
    h = jnp.tanh(h.astype(jnp.float32) + b1)
    out = mm(h, k2)
    if ctx is not None:
        out = out + mm(ctx, c2)
    return out.astype(jnp.float32) + b2


def _maf_kernel(y_ref, k1_ref, b1_ref, k2_ref, b2_ref, c_refs, x_ref,
                ldj_ref, *, data_dim: int, num_bins: int, bin_min: float,
                bin_max: float, inverse: bool, compute_dtype):
    """One MAF block on a (TILE_N, D) tile, fully in VMEM.

    c_refs is () for unconditional blocks or (ctx_ref, c1_ref, c2_ref).
    """
    D, K = data_dim, num_bins
    y = y_ref[:]  # (T, D)
    k1, b1, k2, b2 = k1_ref[:], b1_ref[:], k2_ref[:], b2_ref[:]
    if c_refs:
        ctx, c1, c2 = c_refs[0][:], c_refs[1][:], c_refs[2][:]
    else:
        ctx, c1, c2 = None, None, None

    def eval_spline(cond_in, t_eval, inv):
        raw = _conditioner_tile(cond_in, ctx, k1, b1, k2, b2, c1, c2,
                                compute_dtype)
        outs, ldjs = [], []
        for dof in range(D):
            raw_w = raw[:, dof * K:(dof + 1) * K]
            raw_h = raw[:, D * K + dof * K:D * K + (dof + 1) * K]
            raw_s = raw[:, 2 * D * K + dof * (K - 1):
                        2 * D * K + (dof + 1) * (K - 1)]
            w, hh, s = _spline_params_tile(raw_w, raw_h, raw_s, bin_min,
                                           bin_max, K)
            o, l = _rqs_tile(t_eval[:, dof], w, hh, s, bin_min, inv)
            outs.append(o[:, None])
            ldjs.append(l[:, None])
        return (jnp.concatenate(outs, axis=-1),
                jnp.concatenate(ldjs, axis=-1))

    if inverse:
        x, ldj = eval_spline(y, y, True)
    else:
        # MAF forward fixed point: D-1 refinement passes entirely in
        # VMEM, then the final pass also yields the log-det.
        cur = y
        for _ in range(D - 1):
            cur, _ = eval_spline(cur, y, False)
        x, ldj = eval_spline(cur, y, False)
    x_ref[:] = x
    ldj_ref[:] = jnp.sum(ldj, axis=-1, keepdims=True)


# Column layout of the merged conditioner output (_maf_kernel's raw
# slicing): the merged K2 is block-diag over (w_net, h_net, s_net),
# giving columns [D*K widths | D*K heights | D*(K-1) slopes], each
# net's output row-major over (dof, param).
def _run(y: Array, params: Tuple[Array, ...], ctx: Optional[Array],
         data_dim: int, num_bins: int, bin_min: float, bin_max: float,
         inverse: bool, compute_dtype, interpret: bool
         ) -> Tuple[Array, Array]:
    k1, b1, k2, b2 = params[:4]
    # Biases ride as (1, n) rows (TPU tiles are 2-D; broadcasting in the
    # kernel handles the rest).
    b1 = b1.reshape(1, -1)
    b2 = b2.reshape(1, -1)
    N, D = y.shape
    pad = (-N) % TILE_N
    if pad:
        y = jnp.pad(y, ((0, pad), (0, 0)))
        if ctx is not None:
            ctx = jnp.pad(ctx, ((0, pad), (0, 0)))
    Np = y.shape[0]
    grid = (Np // TILE_N,)

    def row_spec(width):
        return pl.BlockSpec((TILE_N, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def full_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [row_spec(D), full_spec(k1.shape), full_spec(b1.shape),
                full_spec(k2.shape), full_spec(b2.shape)]
    args = [y, k1, b1, k2, b2]
    n_cond = 0
    if ctx is not None:
        c1, c2 = params[4], params[5]
        in_specs += [row_spec(ctx.shape[1]), full_spec(c1.shape),
                     full_spec(c2.shape)]
        args += [ctx, c1, c2]
        n_cond = 3

    def kernel(*refs):
        y_ref, k1_ref, b1_ref, k2_ref, b2_ref = refs[:5]
        c_refs = refs[5:5 + n_cond]
        x_ref, ldj_ref = refs[5 + n_cond:]
        _maf_kernel(y_ref, k1_ref, b1_ref, k2_ref, b2_ref, c_refs,
                    x_ref, ldj_ref, data_dim=data_dim, num_bins=num_bins,
                    bin_min=bin_min, bin_max=bin_max, inverse=inverse,
                    compute_dtype=compute_dtype)

    x, ldj = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[row_spec(D), row_spec(1)],
        out_shape=[jax.ShapeDtypeStruct((Np, D), jnp.float32),
                   jax.ShapeDtypeStruct((Np, 1), jnp.float32)],
        interpret=interpret,
    )(*args)
    return x[:N], ldj[:N, 0]


def _make_entry(inverse: bool):

    @functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
    def op(y, params, ctx, data_dim, num_bins, bin_min, bin_max,
           compute_dtype, interpret=False):
        return _run(y, params, ctx, data_dim, num_bins, bin_min, bin_max,
                    inverse, compute_dtype, interpret)

    def fwd(y, params, ctx, data_dim, num_bins, bin_min, bin_max,
            compute_dtype, interpret=False):
        out = _run(y, params, ctx, data_dim, num_bins, bin_min, bin_max,
                   inverse, compute_dtype, interpret)
        return out, (y, params, ctx)

    def bwd(data_dim, num_bins, bin_min, bin_max, compute_dtype,
            interpret, res, g):
        y, params, ctx = res
        # Recompute through the XLA reference implementation for exact,
        # cheap gradients (same strategy as ops/rqs_pallas.py).
        from vaemolsim_tpu.ops.maf_fused import _xla_reference

        def f(y_, params_, ctx_):
            return _xla_reference(y_, params_, ctx_, data_dim, num_bins,
                                  bin_min, bin_max, inverse, compute_dtype)

        _, vjp = jax.vjp(f, y, params, ctx)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


def _xla_reference(y, params, ctx, data_dim, num_bins, bin_min, bin_max,
                   inverse, compute_dtype):
    """Plain-XLA evaluation of the identical merged-block math (used for
    the custom-vjp backward pass and as the golden in tests).

    Calls the PRIVATE XLA spline implementations, never the rqs
    dispatcher: with set_implementation("pallas") active, the
    dispatcher would route this "XLA reference" (and the fused op's
    backward recompute) through the pallas kernel."""
    from vaemolsim_tpu.ops import rqs

    k1, b1, k2, b2 = params[:4]
    D, K = data_dim, num_bins
    cd = compute_dtype

    def mm(a, b):
        # Same dtype semantics as the kernel: inputs in cd, f32
        # accumulation/output (no bf16 rounding of the accumulator).
        return jnp.dot(a.astype(cd), b.astype(cd),
                       preferred_element_type=jnp.float32)

    def conditioner(t):
        h = mm(t, k1)
        if ctx is not None:
            h = h + mm(ctx, params[4])
        h = jnp.tanh(h + b1)
        out = mm(h, k2)
        if ctx is not None:
            out = out + mm(ctx, params[5])
        out = out + b2
        span = bin_max - bin_min - K * 1e-2
        raw_w = out[..., :D * K].reshape(out.shape[:-1] + (D, K))
        raw_h = out[..., D * K:2 * D * K].reshape(out.shape[:-1] + (D, K))
        raw_s = out[..., 2 * D * K:].reshape(out.shape[:-1] + (D, K - 1))
        w = jax.nn.softmax(raw_w, axis=-1) * span + 1e-2
        hh = jax.nn.softmax(raw_h, axis=-1) * span + 1e-2
        s = jax.nn.softplus(raw_s) + 1e-2
        return w, hh, s

    if inverse:
        w, hh, s = conditioner(y)
        x, ldj = rqs._rqs_inverse_xla(y, w, hh, s, bin_min)
        return x, jnp.sum(ldj, axis=-1)
    cur = y
    for _ in range(D - 1):
        w, hh, s = conditioner(cur)
        cur, _ = rqs._rqs_forward_xla(y, w, hh, s, bin_min)
    w, hh, s = conditioner(cur)
    x, ldj = rqs._rqs_forward_xla(y, w, hh, s, bin_min)
    return x, jnp.sum(ldj, axis=-1)


maf_block_inverse_fused = _make_entry(inverse=True)
maf_block_forward_fused = _make_entry(inverse=False)
