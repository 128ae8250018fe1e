"""Geometric-algebra attention over local particle environments.

First-party TPU-native implementation of the rotation-invariant,
permutation-equivariant point-cloud attention the reference borrows from
the external ``geometric_algebra_attention`` package (Spellings 2021,
arXiv:2110.02393; reference usage vaemolsim/mappings.py:480-688 — see
SURVEY.md §2.3, which requires a first-party equivalent).

Design (rank-2, merge='concat', join='concat', matching the reference's
configuration):

* For every ordered particle pair (i, j) the *geometric product* of the
  two position vectors yields the rotation-invariant features
  ``q_ij = [r_i . r_j, |r_i x r_j|, |r_i|^2, |r_j|^2]`` (scalar part,
  bivector magnitude, and the two vector norms).
* The pair representation is ``concat(v_i, v_j, value_net(q_ij))`` in
  spirit; concretely both the score and value nets read
  ``concat(v_i, v_j, q_ij)`` — the same information flow with one fused
  input, chosen so the whole (N x N) pair grid evaluates as two batched
  matmuls on the MXU.
* ``reduce=False``: masked softmax over j per query i -> per-particle
  outputs (permutation *equivariant*).  ``reduce=True``: masked softmax
  over the joint (i, j) grid -> a single summary vector (permutation
  *invariant*), used for the final embedding reduction
  (mappings.py:633-647).

Invariance properties (rotation invariance of outputs, permutation
equivariance/invariance, zero-mask correctness) are locked in by tests
(tests/test_attention.py) rather than by matching the external package's
exact weights.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from vaemolsim_tpu.nn.core import (Dense, LayerNorm, compute_dtype,
                                   resolve_activation)
from vaemolsim_tpu.nn.mappings import DistanceSelection

Array = jax.Array

__all__ = ["VectorAttention", "VectorAttentionTwoStage", "AttentionBlock",
           "ParticleEmbedding", "LocalParticleDescriptors"]

_NEG_INF = -1e9


def pair_invariants(coords: Array) -> Array:
    """Rotation-invariant rank-2 pair features.

    coords: (..., N, 3) -> (..., N, N, 4):
    [r_i . r_j, |r_i x r_j|, |r_i|^2, |r_j|^2].
    """
    dots = jnp.einsum("...id,...jd->...ij", coords, coords)
    cross = jnp.cross(coords[..., :, None, :], coords[..., None, :, :])
    cross_norm = jnp.sqrt(jnp.sum(cross * cross, axis=-1) + 1e-12)
    n2 = jnp.sum(coords * coords, axis=-1)
    n2_i = jnp.broadcast_to(n2[..., :, None], dots.shape)
    n2_j = jnp.broadcast_to(n2[..., None, :], dots.shape)
    return jnp.stack([dots, cross_norm, n2_i, n2_j], axis=-1)


def _dense_blocks(d: Dense, parts, keep_compute_dtype: bool = False
                  ) -> Array:
    """Evaluate ``d(concat(parts))`` over the (N, N) pair grid without
    materializing the concatenated pair tensor.

    The first Dense is linear before its activation, so it splits by
    input block: ``concat(a, b, ...) @ W = a @ W[:fa] + b @ W[fa:fa+fb]
    + ... + bias``.  ``parts`` is a list of ``(array, kind)`` with kind
    ``"i"``/``"j"`` for (..., N, F) node tensors broadcast along the
    j/i pair axis — their matmuls run on the NODE tensor and only the
    cheap ADD touches the grid — or ``None`` for (..., N, N, F) grids.

    Why: profiled on v5e (batch 200, N=50, F=64) the three
    ``concatenate`` ops building pair inputs were 34% of embed device
    time, and the grid contraction carried 2F+4 lanes where only the 4
    invariant lanes vary per pair.  Same dtype flow as
    ``Dense.__call__`` (matmul/bias/activation in the compute dtype).
    """
    W, b = d.kernel, d.bias
    # Promoted dtype of every part — the concat form's output dtype
    # (bf16 values with f32 invariants must come back f32).
    out_dtype = jnp.result_type(*[a.dtype for a, _ in parts])
    cd = compute_dtype()
    if cd is not None:
        W, b = W.astype(cd), b.astype(cd)
    y = None
    off = 0
    for arr, kind in parts:
        f = arr.shape[-1]
        if cd is not None:
            arr = arr.astype(cd)
        t = arr @ W[off:off + f]
        off += f
        if kind == "i":
            t = t[..., :, None, :]
        elif kind == "j":
            t = t[..., None, :, :]
        y = t if y is None else y + t
    if off != W.shape[0]:
        raise ValueError(f"parts cover {off} of {W.shape[0]} input dims")
    y = resolve_activation(d.activation)(y + b)
    if cd is not None and not keep_compute_dtype:
        return y.astype(out_dtype)
    return y


@struct.dataclass
class _ScoreNet:
    """Dense(hidden, act) -> Dense(1) (reference mappings.py:509-511)."""

    d1: Dense
    d2: Dense

    @classmethod
    def create(cls, key, in_dim, hidden_dim, activation="relu"):
        k1, k2 = jax.random.split(key)
        return cls(Dense.create(k1, in_dim, hidden_dim, activation),
                   Dense.create(k2, hidden_dim, 1))

    def __call__(self, x):
        return self.d2(self.d1(x))[..., 0]


@struct.dataclass
class _ValueNet:
    """Dense -> LayerNorm -> act -> Dense (reference mappings.py:512-517)."""

    d1: Dense
    ln: LayerNorm
    d2: Dense
    activation: str = struct.field(pytree_node=False, default="relu")

    @classmethod
    def create(cls, key, in_dim, hidden_dim, out_dim, activation="relu"):
        k1, k2 = jax.random.split(key)
        return cls(Dense.create(k1, in_dim, hidden_dim),
                   LayerNorm.create(hidden_dim),
                   Dense.create(k2, hidden_dim, out_dim),
                   activation=activation)

    def __call__(self, x):
        from vaemolsim_tpu.nn.core import resolve_activation
        return self.d2(resolve_activation(self.activation)(self.ln(self.d1(x))))


@struct.dataclass
class VectorAttention:
    """Rank-2 geometric-algebra attention over a point cloud.

    ``__call__(coords (..., N, 3), values (..., N, F), mask (..., N))``:
    reduce=False -> (..., N, F_out); reduce=True -> (..., F_out).
    """

    score_net: _ScoreNet
    value_net: _ValueNet
    reduce: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(cls, key: Array, value_dim: int, out_dim: int,
               hidden_dim: int = 40, reduce: bool = False,
               activation: str = "relu") -> "VectorAttention":
        k1, k2 = jax.random.split(key)
        pair_in = 2 * value_dim + 4
        return cls(
            score_net=_ScoreNet.create(k1, pair_in, hidden_dim, activation),
            value_net=_ValueNet.create(k2, pair_in, hidden_dim, out_dim,
                                       activation),
            reduce=reduce)

    def __call__(self, coords: Array, values: Array,
                 mask: Optional[Array] = None) -> Array:
        from vaemolsim_tpu.ops.attention_pallas import use_attention_pallas
        # The fused kernel hard-codes the create() wiring: d1 linear ->
        # LayerNorm -> activation -> d2 linear on the value trunk, one
        # shared activation kind, and f32 arithmetic.  Hand-constructed
        # nets that deviate (an activation on value_net.d1 / either d2)
        # or a configured non-f32 compute dtype (the custom_vjp backward
        # recomputes through the dtype-honoring XLA path, which would
        # differentiate a different function than the f32 forward) must
        # take the XLA path.
        if (use_attention_pallas()
                and self.score_net.d1.activation
                == self.value_net.activation
                and self.score_net.d1.activation in ("relu", "tanh",
                                                     None)
                and self.value_net.d1.activation is None
                and self.score_net.d2.activation is None
                and self.value_net.d2.activation is None
                and compute_dtype() is None):
            mf = (jnp.ones(coords.shape[:-1], coords.dtype)
                  if mask is None else mask.astype(coords.dtype))
            return _va_fused(self, coords, values, mf)
        return self._xla_call(coords, values, mask)

    def _xla_call(self, coords: Array, values: Array,
                  mask: Optional[Array] = None) -> Array:
        N = coords.shape[-2]
        q = pair_invariants(coords)  # (..., N, N, 4)
        # Split-weight evaluation of score/value nets on
        # concat(v_i, v_j, q) — the node matmuls run on (N, F), only
        # adds touch the (N, N) grid, no concat materializes
        # (_dense_blocks; same math as self.score_net(pair)).
        parts = [(values, "i"), (values, "j"), (q, None)]
        cd = compute_dtype()
        if cd is None:
            scores = self.score_net.d2(
                _dense_blocks(self.score_net.d1, parts))[..., 0]
            h = self.value_net.ln(_dense_blocks(self.value_net.d1,
                                                parts))
            vals = self.value_net.d2(
                resolve_activation(self.value_net.activation)(h))
        else:
            # Keep the (N, N, H) pair-grid INTERMEDIATES in the compute
            # dtype explicitly.  Measured on chip (round-5 embed study,
            # docs/performance.md): XLA's convert-motion was ALREADY
            # collapsing the per-Dense f32 cast-backs to bf16 grids
            # (boundary bytes and device time are identical either
            # way), so this branch is about making the numerics
            # contract explicit — the grid tensors are compute-dtype,
            # scores are cast to f32 before the softmax, LayerNorm
            # statistics run in f32 — rather than relying on a
            # compiler pass.  The workload itself is VPU-elementwise
            # bound at these shapes, not HBM bound.
            scores = self.score_net.d2(_dense_blocks(
                self.score_net.d1, parts,
                keep_compute_dtype=True))[..., 0]
            h = _dense_blocks(self.value_net.d1, parts,
                              keep_compute_dtype=True)
            h = self.value_net.ln(h.astype(jnp.float32))
            h = resolve_activation(self.value_net.activation)(h)
            vals = self.value_net.d2(h.astype(cd))

        pair_mask = (None if mask is None
                     else mask[..., :, None] & mask[..., None, :])
        if pair_mask is not None:
            scores = jnp.where(pair_mask, scores, _NEG_INF)
        scores = scores.astype(jnp.float32)  # stable softmax arithmetic

        if self.reduce:
            flat = scores.reshape(scores.shape[:-2] + (N * N,))
            alpha = jax.nn.softmax(flat, axis=-1).reshape(scores.shape)
            out = jnp.einsum("...ij,...ijf->...f", alpha, vals)
            if mask is not None:
                # A fully-masked cloud would softmax uniform weights over
                # padding rows; emit a consistent zero embedding instead.
                any_valid = jnp.any(mask, axis=-1)
                out = jnp.where(any_valid[..., None], out, 0.0)
            return out
        alpha = jax.nn.softmax(scores, axis=-1)  # over j
        if pair_mask is not None:
            # Fully-masked query rows produce uniform alpha; zero them.
            alpha = jnp.where(pair_mask, alpha, 0.0)
        return jnp.einsum("...ij,...ijf->...if", alpha, vals)


def _va_fused_impl(attn: "VectorAttention", coords: Array, values: Array,
                   maskf: Array, interpret: bool = False) -> Array:
    """Prepare node projections + invariant planes and call the fused
    pair-grid kernel (ops/attention_pallas.py).  f32 inside."""
    from vaemolsim_tpu.ops.attention_pallas import fused_pair_attention
    lead = coords.shape[:-2]
    N, F = coords.shape[-2], values.shape[-1]
    c = coords.reshape((-1, N, 3)).astype(jnp.float32)
    v = values.reshape((-1, N, F)).astype(jnp.float32)
    m = maskf.reshape((-1, N))
    q4 = jnp.moveaxis(pair_invariants(c), -1, 1)     # (B, 4, N, N)
    w_s, w_v = attn.score_net.d1.kernel, attn.value_net.d1.kernel
    out = fused_pair_attention(
        q4, v @ w_s[:F], v @ w_s[F:2 * F], v @ w_v[:F],
        v @ w_v[F:2 * F], m,
        w_s[2 * F:], attn.score_net.d1.bias,
        attn.score_net.d2.kernel[:, 0], attn.score_net.d2.bias,
        w_v[2 * F:], attn.value_net.d1.bias,
        attn.value_net.ln.scale, attn.value_net.ln.offset,
        attn.value_net.d2.kernel, attn.value_net.d2.bias,
        reduce=attn.reduce,
        act_kind=attn.score_net.d1.activation or "linear",
        ln_eps=float(attn.value_net.ln.eps), interpret=interpret)
    fo = attn.value_net.d2.out_dim
    out = out.astype(values.dtype)
    return out.reshape(lead + ((fo,) if attn.reduce else (N, fo)))


@jax.custom_vjp
def _va_fused(attn, coords, values, maskf):
    # interpret off-TPU so direct calls (tests) stay runnable; the
    # __call__ dispatch only routes here on TPU anyway.
    return _va_fused_impl(attn, coords, values, maskf,
                          interpret=jax.default_backend() != "tpu")


def _va_fused_fwd(attn, coords, values, maskf):
    return _va_fused(attn, coords, values, maskf), (attn, coords,
                                                    values, maskf)


def _va_fused_bwd(res, g):
    # Exact gradients by recomputation through the XLA path (the
    # fused_mlp/maf_fused pattern): the two paths agree to f32
    # roundoff, so their gradients are interchangeable.
    attn, coords, values, maskf = res

    def f(a, c, v):
        return a._xla_call(c, v, maskf > 0.5)

    _, vjp = jax.vjp(f, attn, coords, values)
    da, dc, dv = vjp(g)
    return da, dc, dv, jnp.zeros_like(maskf)


_va_fused.defvjp(_va_fused_fwd, _va_fused_bwd)


@struct.dataclass
class VectorAttentionTwoStage:
    """Paper-faithful two-stage GA attention (Spellings 2021 §3 /
    geometric_algebra_attention's VectorAttention structure, the exact
    layer the reference configures at vaemolsim/mappings.py:518-525):

    1. ``value_net`` reads the rotation-invariant pair features ALONE
       (the geometric-product invariants), like the reference's
       ``value_fun`` (Dense -> LayerNorm -> act -> Dense).
    2. ``merge_fun='concat'``: node representations combine through a
       learned projection  m_ij = W_m . concat(v_i, v_j).
    3. ``join_fun='concat'``: the merged node rep joins the invariant
       values through a second learned projection
       j_ij = W_j . concat(m_ij, value_net(q_ij)).
    4. Scores come from ``score_net(j_ij)``; the output is the
       attention-weighted sum of the joined representations.

    Same call signature and invariance guarantees as the fused
    :class:`VectorAttention` (which collapses steps 1-3 into one fused
    pair input so the whole (N x N) grid is two batched MXU matmuls —
    the default for speed).  Select with ``attention="two_stage"`` on
    :class:`AttentionBlock` / :class:`ParticleEmbedding`.  Expressive
    equivalence of the two variants on the backmapping task is pinned
    by tests/test_attention.py::TestCapabilityEquivalence; exact
    numerics vs the external package need the out-of-container harness
    (tools/gaa_reference_parity.py, docs/attention_equivalence.md).
    """

    value_net: _ValueNet  # on invariants only
    merge: Dense  # concat(v_i, v_j) -> working_dim
    join: Dense  # concat(merged, values(q)) -> working_dim
    score_net: _ScoreNet  # on the joined rep
    reduce: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(cls, key: Array, value_dim: int, out_dim: int,
               hidden_dim: int = 40, reduce: bool = False,
               activation: str = "relu") -> "VectorAttentionTwoStage":
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return cls(
            value_net=_ValueNet.create(k1, 4, hidden_dim, out_dim,
                                       activation),
            merge=Dense.create(k2, 2 * value_dim, out_dim),
            join=Dense.create(k3, 2 * out_dim, out_dim),
            score_net=_ScoreNet.create(k4, out_dim, hidden_dim, activation),
            reduce=reduce)

    def __call__(self, coords: Array, values: Array,
                 mask: Optional[Array] = None) -> Array:
        N = coords.shape[-2]
        q = pair_invariants(coords)  # (..., N, N, 4)
        inv_vals = self.value_net(q)  # (..., N, N, F_out)
        # Split-weight evaluation (no pair-grid concats; _dense_blocks).
        merged = _dense_blocks(self.merge,
                               [(values, "i"), (values, "j")])
        joined = _dense_blocks(self.join,
                               [(merged, None), (inv_vals, None)])
        scores = self.score_net(joined)  # (..., N, N)

        pair_mask = (None if mask is None
                     else mask[..., :, None] & mask[..., None, :])
        if pair_mask is not None:
            scores = jnp.where(pair_mask, scores, _NEG_INF)

        if self.reduce:
            flat = scores.reshape(scores.shape[:-2] + (N * N,))
            alpha = jax.nn.softmax(flat, axis=-1).reshape(scores.shape)
            out = jnp.einsum("...ij,...ijf->...f", alpha, joined)
            if mask is not None:
                any_valid = jnp.any(mask, axis=-1)
                out = jnp.where(any_valid[..., None], out, 0.0)
            return out
        alpha = jax.nn.softmax(scores, axis=-1)  # over j
        if pair_mask is not None:
            alpha = jnp.where(pair_mask, alpha, 0.0)
        return jnp.einsum("...ij,...ijf->...if", alpha, joined)


def _make_attention(kind: str, key: Array, value_dim: int, out_dim: int,
                    hidden_dim: int, reduce: bool, activation: str):
    if kind == "fused":
        return VectorAttention.create(key, value_dim, out_dim, hidden_dim,
                                      reduce=reduce, activation=activation)
    if kind == "two_stage":
        return VectorAttentionTwoStage.create(
            key, value_dim, out_dim, hidden_dim, reduce=reduce,
            activation=activation)
    raise ValueError(
        f"attention must be 'fused' or 'two_stage', got {kind!r}")


@struct.dataclass
class AttentionBlock:
    """One GA-attention block: VectorAttention(reduce=False) + post-MLP
    with residual add (reference vaemolsim/mappings.py:480-561)."""

    attn: Any  # VectorAttention | VectorAttentionTwoStage
    post_d1: Dense
    post_ln: LayerNorm
    post_d2: Dense
    activation: str = struct.field(pytree_node=False, default="relu")

    @classmethod
    def create(cls, key: Array, working_dim: int, hidden_dim: int = 40,
               activation: str = "relu",
               attention: str = "fused") -> "AttentionBlock":
        k1, k2, k3 = jax.random.split(key, 3)
        return cls(
            attn=_make_attention(attention, k1, working_dim, working_dim,
                                 hidden_dim, reduce=False,
                                 activation=activation),
            post_d1=Dense.create(k2, working_dim, hidden_dim),
            post_ln=LayerNorm.create(hidden_dim),
            post_d2=Dense.create(k3, hidden_dim, working_dim),
            activation=activation)

    def __call__(self, coords: Array, embedding: Array,
                 mask: Optional[Array] = None) -> Array:
        from vaemolsim_tpu.nn.core import resolve_activation
        act = resolve_activation(self.activation)
        new = self.attn(coords, embedding, mask)
        new = self.post_d2(act(self.post_ln(self.post_d1(new))))
        return new + embedding


@struct.dataclass
class ParticleEmbedding:
    """Point cloud + per-particle info -> fixed-size rotation-invariant
    embedding (reference vaemolsim/mappings.py:564-688): linear info_net,
    ``num_blocks`` AttentionBlocks (equivariant), then a reduce=True
    VectorAttention summing over particles (invariant).

    ``mask_zero=True`` reproduces the reference's Keras ``Masking``: rows
    whose coordinates are exactly (0,0,0) are treated as padding
    (mappings.py:625-628) — DistanceSelection zero-fills invalid rows.
    An explicit ``mask`` argument overrides this.
    """

    info_net: Dense
    blocks: Tuple[AttentionBlock, ...]
    final_attn: Any  # VectorAttention | VectorAttentionTwoStage
    mask_zero: bool = struct.field(pytree_node=False, default=True)

    @classmethod
    def create(cls, key: Array, info_dim: int, embedding_dim: int,
               hidden_dim: int = 40, num_blocks: int = 2,
               mask_zero: bool = True,
               activation: str = "relu",
               attention: str = "fused") -> "ParticleEmbedding":
        keys = jax.random.split(key, num_blocks + 2)
        return cls(
            info_net=Dense.create(keys[0], info_dim, embedding_dim),
            blocks=tuple(
                AttentionBlock.create(keys[i + 1], embedding_dim, hidden_dim,
                                      activation, attention=attention)
                for i in range(num_blocks)),
            final_attn=_make_attention(attention, keys[-1], embedding_dim,
                                       embedding_dim, hidden_dim,
                                       reduce=True, activation=activation),
            mask_zero=mask_zero)

    def __call__(self, coords: Array, particle_info: Array,
                 mask: Optional[Array] = None) -> Array:
        if mask is None and self.mask_zero:
            mask = jnp.any(coords != 0.0, axis=-1)
        embedding = self.info_net(particle_info)
        for block in self.blocks:
            embedding = block(coords, embedding, mask)
        return self.final_attn(coords, embedding, mask)


@struct.dataclass
class LocalParticleDescriptors:
    """DistanceSelection then ParticleEmbedding (reference
    vaemolsim/mappings.py:691-762): select up to ``max_included`` nearest
    particles around a reference site, then embed them invariantly.

    ``embed`` is any call-compatible embedding — ``ParticleEmbedding``
    (GA attention) or ``nn.schnet.SchNetEmbedding``."""

    select: DistanceSelection
    embed: Any  # ParticleEmbedding | SchNetEmbedding

    def __call__(self, coords: Array, ref: Array, particle_info: Array,
                 mask: Optional[Array] = None,
                 box_lengths: Optional[Array] = None) -> Array:
        sel, valid, sel_info = self.select(coords, ref, mask=mask,
                                           particle_info=particle_info,
                                           box_lengths=box_lengths)
        return self.embed(sel, sel_info, mask=valid)
