"""Fused GA-attention pair-grid Pallas kernel (optional TPU backend).

After the split-weight rewrite (`nn/attention.py::_dense_blocks`,
measured 1.95x) the dense embed's remaining device time is the pair
GRID intermediates — `h_score`/`h_value` (B, N, N, H), the LayerNorm
statistics, and the value head — round-tripping HBM between XLA
fusions (boundary traffic ~1.2x HBM peak with VMEM reuse).  This
kernel runs the whole per-frame pair grid in VMEM: one program per
frame computes both split-weight trunks from the PRE-PROJECTED node
tensors (the tiny (N, F) matmuls stay in XLA where they fuse well),
adds the invariant-plane contributions, applies LayerNorm + act +
value head + masked softmax + the attention contraction, and writes
only the (N, F_out) (or reduced (F_out,)) result.  HBM traffic per
frame collapses from ~5.7 MB to ~50 KB.

Same numerics contract as the XLA path to f32 roundoff (LN/softmax
reductions reassociate); gradients via custom_vjp recomputation
through the XLA path (the `ops/fused_mlp.py` / `ops/maf_fused.py`
pattern).  Toggle with ``set_attention_pallas(True)`` — the XLA path
stays the default and the ground truth.  Off-TPU the toggle is
ignored (Mosaic kernels are TPU-only; tests run interpret mode).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

__all__ = ["fused_pair_attention", "set_attention_pallas",
           "use_attention_pallas"]

_ENABLED = False


def set_attention_pallas(on: bool) -> None:
    """Route VectorAttention's pair grid through the fused kernel on
    TPU (measured study in docs/performance.md)."""
    global _ENABLED
    _ENABLED = bool(on)


def use_attention_pallas() -> bool:
    return _ENABLED and jax.default_backend() == "tpu"


def _kernel(q_ref, ni_s_ref, nj_s_ref, ni_v_ref, nj_v_ref, m_ref,
            wq_s_ref, b1_s_ref, w2_s_ref, b2_s_ref,
            wq_v_ref, b1_v_ref, ln_g_ref, ln_b_ref, w2_v_ref, b2_v_ref,
            out_ref, *, reduce: bool, act_kind: str, ln_eps: float):
    # Block holds TILE_B frames; unrolled loop amortizes program
    # overhead (one-frame programs measured overhead-dominated).
    for t in range(q_ref.shape[0]):
        _one_frame(q_ref[t], ni_s_ref[t], nj_s_ref[t], ni_v_ref[t],
                   nj_v_ref[t], m_ref[t], wq_s_ref, b1_s_ref, w2_s_ref,
                   b2_s_ref, wq_v_ref, b1_v_ref, ln_g_ref, ln_b_ref,
                   w2_v_ref, b2_v_ref, out_ref, t, reduce=reduce,
                   act_kind=act_kind, ln_eps=ln_eps)


def _one_frame(q, ni_s, nj_s, ni_v, nj_v, mask,
               wq_s_ref, b1_s_ref, w2_s_ref, b2_s_ref,
               wq_v_ref, b1_v_ref, ln_g_ref, ln_b_ref, w2_v_ref,
               b2_v_ref, out_ref, t, *, reduce: bool, act_kind: str,
               ln_eps: float):
    n = ni_s.shape[0]

    def act(h):
        if act_kind == "relu":
            return jnp.maximum(h, 0.0)
        if act_kind == "tanh":
            return jnp.tanh(h)
        return h

    def trunk(ni, nj, wq, b1):
        # (N, N, H): node broadcasts + 4 invariant planes.
        h = ni[:, None, :] + nj[None, :, :] + b1[None, None, :]
        for k in range(4):
            h = h + q[k][:, :, None] * wq[k][None, None, :]
        return h

    # --- score trunk -> (N, N) logits ---
    h_s = act(trunk(ni_s, nj_s, wq_s_ref[:], b1_s_ref[:]))
    scores = (jnp.sum(h_s * w2_s_ref[:][None, None, :], axis=-1)
              + b2_s_ref[0])

    # --- value trunk -> LN -> act -> head -> (N, N, Fo) ---
    h_v = trunk(ni_v, nj_v, wq_v_ref[:], b1_v_ref[:])
    mu = jnp.mean(h_v, axis=-1, keepdims=True)
    var = jnp.mean((h_v - mu) ** 2, axis=-1, keepdims=True)
    h_v = ((h_v - mu) * jax.lax.rsqrt(var + ln_eps)
           * ln_g_ref[:][None, None, :] + ln_b_ref[:][None, None, :])
    h_v = act(h_v)
    vals = (jax.lax.dot_general(
        h_v.reshape(n * n, h_v.shape[-1]), w2_v_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(n, n, -1)
        + b2_v_ref[:][None, None, :])

    # --- masked softmax + contraction ---
    pm = mask[0][:, None] * mask[0][None, :]        # (N, N)
    neg = jnp.float32(-1e9)
    scores = jnp.where(pm > 0.5, scores, neg)
    if reduce:
        m0 = jnp.max(scores)
        e = jnp.exp(scores - m0) * pm
        denom = jnp.maximum(jnp.sum(e), jnp.float32(1e-30))
        out = jnp.sum((e / denom)[:, :, None] * vals, axis=(0, 1))
        out_ref[t] = out[None, :]
    else:
        m0 = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m0) * pm
        denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True),
                            jnp.float32(1e-30))
        alpha = e / denom
        out_ref[t] = jnp.sum(alpha[:, :, None] * vals, axis=1)


@functools.partial(jax.jit, static_argnames=("reduce", "act_kind",
                                             "ln_eps", "interpret"))
def fused_pair_attention(q4: Array, ni_s: Array, nj_s: Array,
                         ni_v: Array, nj_v: Array, mask: Array,
                         wq_s: Array, b1_s: Array, w2_s: Array,
                         b2_s: Array, wq_v: Array, b1_v: Array,
                         ln_g: Array, ln_b: Array, w2_v: Array,
                         b2_v: Array, *, reduce: bool,
                         act_kind: str = "relu",
                         ln_eps: float = 1e-3,
                         interpret: bool = False) -> Array:
    """One fused pass over the (N, N) pair grid per frame.

    q4: (B, 4, N, N) invariant planes; ni/nj_{s,v}: (B, N, H) node
    projections (values @ W-block, bias excluded); mask: (B, N) bool;
    weights: score/value trunk q-blocks (4, H), biases, LN params,
    heads.  Returns (B, N, Fo) or (B, Fo) for reduce=True.  All f32.
    """
    b, _, n, _ = q4.shape
    fo = w2_v.shape[-1]
    tile_b = 1
    for cand in (8, 4, 2):
        if b % cand == 0:
            tile_b = cand
            break
    f32 = jnp.float32
    args = [q4.astype(f32), ni_s.astype(f32), nj_s.astype(f32),
            ni_v.astype(f32), nj_v.astype(f32),
            mask.astype(f32).reshape(b, 1, n)]
    wargs = [wq_s.astype(f32), b1_s.astype(f32), w2_s.astype(f32),
             jnp.atleast_1d(b2_s).astype(f32), wq_v.astype(f32),
             b1_v.astype(f32), ln_g.astype(f32), ln_b.astype(f32),
             w2_v.astype(f32), b2_v.astype(f32)]

    def frame_spec(a):
        return pl.BlockSpec((tile_b,) + a.shape[1:],
                            lambda i: (i,) + (0,) * (a.ndim - 1),
                            memory_space=pltpu.VMEM)

    def rep_spec(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    out_shape = ((b, 1, fo) if reduce else (b, n, fo))
    out = pl.pallas_call(
        functools.partial(_kernel, reduce=reduce, act_kind=act_kind,
                          ln_eps=ln_eps),
        grid=(b // tile_b,),
        in_specs=[frame_spec(a) for a in args] + [rep_spec(a)
                                                  for a in wargs],
        out_specs=pl.BlockSpec((tile_b,) + out_shape[1:],
                               lambda i: (i,) + (0,) * (len(out_shape) - 1),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, f32),
        interpret=interpret,
    )(*args, *wargs)
    return out[:, 0, :] if reduce else out
