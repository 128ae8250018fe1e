"""Rational-quadratic-spline normalizing flows: RealNVP and MAF chains.

TPU-first replacement for vaemolsim/flows.py (reference L2 layer).  All
flows are parameter pytrees (flax.struct) that act as *bijectors* and are
polymorphic like the reference (SURVEY.md idiom 2): calling on an array
transforms the array; calling on a distribution returns a
``TransformedDistribution`` (vaemolsim/flows.py:350-355, 678-690).

Numerics match the reference's load-bearing constants
(SURVEY.md §5.2): spline bin positions are
``softmax(raw) * (bin_max - bin_min - num_bins*1e-2) + 1e-2``
(vaemolsim/flows.py:86-93) and knot slopes are ``softplus(raw) + 1e-2``
(flows.py:95-101); defaults bin_range=[-10,10], num_bins=32,
hidden_dim=200, truncated-normal init (flows.py:106-109).

Train/eval asymmetry of interleaved BatchNorm bijectors is handled
functionally: the flow stores BN parameters and constructs
``BatchNormBijector`` pytrees with the static ``use_batch_stats`` flag at
call time (the reference instead mutates ``bij.training`` imperatively,
flows.py:344-348).  ``update_batch_stats`` returns a flow with
EMA-updated running moments from a data batch.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from vaemolsim_tpu.nn.core import Dense, MADE
from vaemolsim_tpu.ops import bijectors as bj
from vaemolsim_tpu.ops import distributions as dist_lib
from vaemolsim_tpu.ops.rqs import RationalQuadraticSpline

Array = jax.Array

__all__ = ["SplineConditioner", "CouplingLayer", "RQSSplineRealNVP",
           "MaskedSplineConditioner", "MAFLayer", "RQSSplineMAF",
           "set_maf_fused", "maf_fused_enabled"]


def _bin_positions(raw: Array, bin_min: float, bin_max: float,
                   num_bins: int) -> Array:
    out = jax.nn.softmax(raw, axis=-1)
    return out * (bin_max - bin_min - num_bins * 1e-2) + 1e-2


def _slopes(raw: Array) -> Array:
    return jax.nn.softplus(raw) + 1e-2


@struct.dataclass
class SplineConditioner:
    """Coupling-flow conditioner: Dense(tanh) trunk + three linear heads
    producing RQS spline parameters for ``data_dim`` outputs.

    Reference analog: ``SplineBijector`` (vaemolsim/flows.py:63-218).
    The 1-D event edge case — RealNVP passes a zero-width tensor when
    nothing is masked — feeds ones to the trunk instead
    (flows.py:180-187).
    """

    trunk: Dense
    w_head: Dense
    h_head: Dense
    s_head: Dense
    data_dim: int = struct.field(pytree_node=False)
    bin_min: float = struct.field(pytree_node=False, default=-10.0)
    bin_max: float = struct.field(pytree_node=False, default=10.0)
    num_bins: int = struct.field(pytree_node=False, default=32)
    circular: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(cls, key: Array, in_dim: int, data_dim: int,
               bin_range: Sequence[float] = (-10.0, 10.0),
               num_bins: int = 32, hidden_dim: int = 200,
               circular: bool = False,
               kernel_initializer="truncated_normal") -> "SplineConditioner":
        k1, k2, k3, k4 = jax.random.split(key, 4)
        eff_in = max(in_dim, 1)  # zero-width input is replaced by ones
        n_slopes = num_bins if circular else num_bins - 1
        return cls(
            trunk=Dense.create(k1, eff_in, hidden_dim, "tanh",
                               kernel_initializer),
            w_head=Dense.create(k2, hidden_dim, data_dim * num_bins, None,
                                kernel_initializer),
            h_head=Dense.create(k3, hidden_dim, data_dim * num_bins, None,
                                kernel_initializer),
            s_head=Dense.create(k4, hidden_dim, data_dim * n_slopes,
                                None, kernel_initializer),
            data_dim=data_dim, bin_min=float(bin_range[0]),
            bin_max=float(bin_range[1]), num_bins=num_bins,
            circular=circular)

    def __call__(self, x: Array) -> RationalQuadraticSpline:
        from vaemolsim_tpu.ops.fused_mlp import fused_dense_stack
        if x.shape[-1] == 0:
            x = jnp.ones(x.shape[:-1] + (1,), x.dtype)
        # Trunk + all three heads as one fused two-layer stack (heads are
        # independent linear maps of the same hidden state, so their
        # kernels concatenate along the output axis).
        head_k = jnp.concatenate([self.w_head.kernel, self.h_head.kernel,
                                  self.s_head.kernel], axis=-1)
        head_b = jnp.concatenate([self.w_head.bias, self.h_head.bias,
                                  self.s_head.bias], axis=-1)
        out = fused_dense_stack(x, [self.trunk.kernel, head_k],
                                [self.trunk.bias, head_b],
                                [self.trunk.activation, None])
        D, K = self.data_dim, self.num_bins
        raw_w = out[..., :D * K]
        raw_h = out[..., D * K:2 * D * K]
        raw_s = out[..., 2 * D * K:]
        shp = out.shape[:-1] + (D, K)
        w = _bin_positions(raw_w.reshape(shp), self.bin_min, self.bin_max, K)
        hh = _bin_positions(raw_h.reshape(shp), self.bin_min, self.bin_max, K)
        n_slopes = K if self.circular else K - 1
        s = _slopes(raw_s.reshape(out.shape[:-1] + (D, n_slopes)))
        return RationalQuadraticSpline(w, hh, s, range_min=self.bin_min,
                                       circular=self.circular)


@struct.dataclass
class CouplingLayer(bj.Bijector):
    """RealNVP coupling: ``num_masked`` DOFs pass through and condition an
    RQS transform of the remainder (reference uses tfp.bijectors.RealNVP,
    vaemolsim/flows.py:312-316).  Negative ``num_masked`` masks the *last*
    |num_masked| DOFs instead (tfp convention, flows.py:291-306)."""

    conditioner: SplineConditioner
    num_masked: int = struct.field(pytree_node=False)

    def _split(self, x: Array):
        n = self.num_masked
        if n >= 0:
            return x[..., :n], x[..., n:], False
        return x[..., n:], x[..., :n], True

    def _join(self, cond_part: Array, moved: Array, flipped: bool) -> Array:
        if flipped:
            return jnp.concatenate([moved, cond_part], axis=-1)
        return jnp.concatenate([cond_part, moved], axis=-1)

    def _spline(self, cond_part):
        if cond_part.shape[-1] == 0:
            # The zero-width (data_dim==1) conditioner sees a constant
            # ones input (reference flows.py:180-187): evaluate ONE row
            # and broadcast, instead of running the (batch, hidden)
            # trunk (same constant-spline optimization as
            # MAFLayer._spline; measured ~2x on 1-D flow training).
            return self.conditioner(jnp.zeros((1, 0), cond_part.dtype))
        return self.conditioner(cond_part)

    def forward_and_log_det(self, x, context=None):
        cond_part, rest, flipped = self._split(x)
        spline = self._spline(cond_part)
        y, ldj = spline.forward_and_log_det(rest)
        return self._join(cond_part, y, flipped), jnp.sum(ldj, axis=-1)

    def inverse_and_log_det(self, y, context=None):
        cond_part, rest, flipped = self._split(y)
        spline = self._spline(cond_part)
        x, ldj = spline.inverse_and_log_det(rest)
        return self._join(cond_part, x, flipped), jnp.sum(ldj, axis=-1)


def _ensure_event_transform(t, data_dim: int):
    """Auto-wrap scalar-acting bijectors in Block(.., 1) so their
    log-dets reduce over the event axis — a raw make_domain_transform
    (the reference accepted these directly) would otherwise broadcast a
    per-DOF log-det into the flow's reduced log-prob silently.

    Decided by PROBING the bijector's log-det shape on a zero event (an
    isinstance allowlist silently mishandled both unlisted scalar
    bijectors and already-Blocked chains): a (batch, D) log-det means
    per-DOF (wrap); (batch,) means already event-reduced (keep)."""
    try:
        _, ldj = t.forward_and_log_det(jnp.zeros((1, data_dim)))
    except Exception:
        return t  # exotic transform: leave the caller's choice intact
    if jnp.ndim(ldj) >= 2:
        return bj.Block(t, 1)
    return t


def _assemble_chain(blocks, bn_params, before, after, train: bool,
                    data_dim: int):
    """Forward-order list: before, block0, BN, block1, ..., after
    (reference vaemolsim/flows.py:286-323 builds the same order and chains
    reversed).  Returns a Chain (whose forward applies last-entry first)."""
    seq = []
    before = (None if before is None
              else _ensure_event_transform(before, data_dim))
    after = (None if after is None
             else _ensure_event_transform(after, data_dim))
    if before is not None:
        seq.append(before)
    for i, blk in enumerate(blocks):
        if i > 0 and bn_params:
            seq.append(bj.Block(
                bn_params[i - 1].replace(use_batch_stats=train), 1))
        seq.append(blk)
    if after is not None:
        seq.append(after)
    return bj.Chain(tuple(reversed(seq)))


def _make_bns(data_dim: int, n: int) -> Tuple[bj.BatchNormBijector, ...]:
    return tuple(
        bj.BatchNormBijector(
            mean=jnp.zeros(data_dim), var=jnp.ones(data_dim),
            log_gamma=jnp.zeros(data_dim), beta=jnp.zeros(data_dim))
        for _ in range(n))


class _FlowMixin:
    """Shared polymorphic-call + batch-stat machinery for flow chains."""

    def as_bijector(self, train: bool = False) -> bj.Chain:
        return _assemble_chain(self.blocks, self.bn_params,
                               self.before_flow_transform,
                               self.after_flow_transform, train,
                               self.data_dim)

    def __call__(self, inputs, train: bool = False,
                 conditional_input: Optional[Array] = None):
        if self.conditional and conditional_input is None:
            raise ValueError(
                "This flow is conditional; pass conditional_input= "
                "(reference contract, vaemolsim/flows.py test coverage).")
        if not self.conditional and conditional_input is not None:
            raise ValueError(
                "conditional_input passed to a non-conditional flow; "
                "set conditional=True in rqs_params (silently ignoring "
                "the context would train an unconditioned model).")
        chain = self.as_bijector(train)
        if isinstance(inputs, dist_lib.Distribution):
            return dist_lib.TransformedDistribution(
                base=inputs, bijector=chain, context=conditional_input)
        return chain.forward(inputs, context=conditional_input)

    def update_batch_stats(self, x: Array,
                           conditional_input: Optional[Array] = None):
        """Run the density (inverse) pass on a batch and EMA-update the
        BatchNorm running statistics; returns the updated flow."""
        if not self.bn_params:
            return self
        chain = self.as_bijector(train=True)
        new_bns = list(self.bn_params)
        # Walk the chain in inverse order (density direction), updating
        # each BN with the moments of its input.
        bn_i = len(new_bns)
        y = x
        for bijector in chain.bijectors:
            inner = bijector.inner if isinstance(bijector, bj.Block) else None
            if isinstance(inner, bj.BatchNormBijector):
                bn_i -= 1
                y, _, m, v = inner.inverse_and_log_det_and_moments(y)
                mom = inner.momentum
                old = new_bns[bn_i]
                new_bns[bn_i] = old.replace(
                    mean=mom * old.mean + (1 - mom) * m,
                    var=mom * old.var + (1 - mom) * v)
            else:
                y = bijector.inverse(y, context=conditional_input)
        return self.replace(bn_params=tuple(new_bns))


@struct.dataclass
class RQSSplineRealNVP(_FlowMixin):
    """Chain of RQS coupling blocks with alternating half-masks.

    Reference analog: ``RQSSplineRealNVP`` (vaemolsim/flows.py:221-360):
    ``num_blocks`` (default 4) blocks; even blocks mask the first
    floor(d/2) DOFs, odd blocks mask the last ceil(d/2)
    (matching the reference's ``-(d - d//2)`` split exactly)
    (flows.py:291-306); data_dim==1 masks nothing and transforms the
    single DOF via the ones-fed conditioner (flows.py:294-296); optional
    BatchNorm between blocks (flows.py:308-309) and before/after domain
    bijectors (flows.py:288-289, 318-319).  Never conditional
    (flows.py:274).
    """

    blocks: Tuple[CouplingLayer, ...]
    bn_params: Tuple[bj.BatchNormBijector, ...]
    before_flow_transform: Optional[Any] = None
    after_flow_transform: Optional[Any] = None
    data_dim: int = struct.field(pytree_node=False, default=1)
    conditional: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(cls, key: Array, data_dim: int, num_blocks: int = 4,
               rqs_params: Optional[dict] = None, batch_norm: bool = False,
               before_flow_transform=None, after_flow_transform=None
               ) -> "RQSSplineRealNVP":
        rqs_params = dict(rqs_params or {})
        keys = jax.random.split(key, num_blocks)
        blocks = []
        for i in range(num_blocks):
            if data_dim == 1:
                n_masked, cond_in, n_out = 0, 0, 1
            else:
                half = data_dim // 2
                if i % 2 == 0:
                    # Mask (condition on) the first floor(d/2) DOFs.
                    n_masked, cond_in, n_out = half, half, data_dim - half
                else:
                    # Mask the last ceil(d/2) DOFs (reference
                    # flows.py:291-306 semantics for odd data_dim).
                    n_masked = -(data_dim - half)
                    cond_in, n_out = data_dim - half, half
            conditioner = SplineConditioner.create(
                keys[i], cond_in, n_out, **rqs_params)
            blocks.append(CouplingLayer(conditioner, num_masked=n_masked))
        bns = _make_bns(data_dim, num_blocks - 1) if batch_norm else ()
        return cls(blocks=tuple(blocks), bn_params=bns,
                   before_flow_transform=before_flow_transform,
                   after_flow_transform=after_flow_transform,
                   data_dim=data_dim)


@struct.dataclass
class MaskedSplineConditioner:
    """MAF conditioner: three MADE networks (widths / heights / slopes)
    with shared input order, optional conditional input.

    Reference analog: ``MaskedSplineBijector`` (vaemolsim/flows.py:363-528)
    — tanh hidden activation applied only to hidden units, spline
    activations applied manually to the outputs.
    """

    w_net: MADE
    h_net: MADE
    s_net: MADE
    bin_min: float = struct.field(pytree_node=False, default=-10.0)
    bin_max: float = struct.field(pytree_node=False, default=10.0)
    num_bins: int = struct.field(pytree_node=False, default=32)
    circular: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(cls, key: Array, data_dim: int,
               bin_range: Sequence[float] = (-10.0, 10.0),
               num_bins: int = 32, hidden_dim: int = 200,
               conditional: bool = False,
               conditional_event_shape: Optional[int] = None,
               input_order="left-to-right",
               circular: bool = False,
               kernel_initializer="truncated_normal"
               ) -> "MaskedSplineConditioner":
        k1, k2, k3 = jax.random.split(key, 3)
        common = dict(hidden_units=[hidden_dim], input_order=input_order,
                      conditional=conditional,
                      conditional_event_size=conditional_event_shape,
                      activation="tanh",
                      kernel_initializer=kernel_initializer)
        n_slopes = num_bins if circular else num_bins - 1
        return cls(
            w_net=MADE.create(k1, data_dim, num_bins, **common),
            h_net=MADE.create(k2, data_dim, num_bins, **common),
            s_net=MADE.create(k3, data_dim, n_slopes, **common),
            bin_min=float(bin_range[0]), bin_max=float(bin_range[1]),
            num_bins=num_bins, circular=circular)

    @property
    def conditional(self) -> bool:
        return self.w_net.conditional

    @property
    def mergeable(self) -> bool:
        """True when the three MADEs are the standard single-hidden-layer
        tanh nets that merge into one block-diagonal evaluation (the
        merged path hardcodes tanh, so a custom activation must fall
        back to per-net evaluation)."""
        return all(len(n.kernels) == 2
                   and getattr(n, "activation", "tanh") == "tanh"
                   for n in (self.w_net, self.h_net, self.s_net))

    def merged_params(self) -> Tuple[Optional[Array], ...]:
        """Merged block-diagonal weights (k1, b1, k2, b2, c1, c2):
        first-layer masked kernels stacked side by side, second layers
        block-diagonal (no cross-talk), conditional kernels concatenated.
        c1/c2 are None for unconditional nets.  Depends only on
        parameters, so XLA hoists the assembly out of scan loops; also
        the exact layout the fused Pallas kernel (ops/maf_fused.py)
        consumes."""
        nets = (self.w_net, self.h_net, self.s_net)
        k1 = jnp.concatenate(
            [n.kernels[0] * n.masks[0] for n in nets], axis=1)
        b1 = jnp.concatenate([n.biases[0] for n in nets])
        k2 = jax.scipy.linalg.block_diag(
            *[n.kernels[1] * n.masks[1] for n in nets])
        b2 = jnp.concatenate([n.biases[1] for n in nets])
        if self.w_net.conditional:
            c1 = jnp.concatenate([n.cond_kernels[0] for n in nets], axis=1)
            c2 = jnp.concatenate([n.cond_kernels[1] for n in nets], axis=1)
        else:
            c1 = c2 = None
        return k1, b1, k2, b2, c1, c2

    def _check_conditional(self, conditional_input):
        if self.w_net.conditional and conditional_input is None:
            raise ValueError(
                "This conditioner is conditional; conditional_input is "
                "required (reference flows.py contract).")
        if not self.w_net.conditional and conditional_input is not None:
            raise ValueError(
                "conditional_input passed to a non-conditional "
                "conditioner; build with conditional=True.")

    def _merged_raw(self, x: Array,
                    conditional_input: Optional[Array]) -> Tuple[Array, ...]:
        """Evaluate the three MADEs as ONE block-diagonal masked net.

        Exactly equivalent, but 2 matmuls per conditioner eval instead
        of 6 (measured win on the latency-bound 10k-chain workload).
        Exactness is pinned by the golden MAF log-prob tests.
        """
        if not self.mergeable:
            # Merged path assumes the standard single-hidden-layer MADEs
            # (MaskedSplineConditioner.create always builds these); fall
            # back to three separate evaluations otherwise.
            return (self.w_net(x, conditional_input),
                    self.h_net(x, conditional_input),
                    self.s_net(x, conditional_input))
        self._check_conditional(conditional_input)
        k1, b1, k2, b2, c1, c2 = self.merged_params()
        # Honor set_compute_dtype (bf16 MXU path with f32 accumulation) —
        # identical semantics to the fused Pallas kernel
        # (ops/maf_fused.py), so the two backends agree bit-for-bit.
        from vaemolsim_tpu.nn.core import compute_dtype
        cd = compute_dtype()

        def mm(a, b):
            if cd is None:
                return a @ b
            return jnp.dot(a.astype(cd), b.astype(cd),
                           preferred_element_type=jnp.float32)

        h = jnp.tanh(mm(x, k1) + b1
                     + (mm(conditional_input, c1)
                        if self.w_net.conditional else 0.0))
        out = (mm(h, k2) + b2
               + (mm(conditional_input, c2)
                  if self.w_net.conditional else 0.0))
        D, K = self.w_net.event_size, self.num_bins
        raw_w = out[..., : D * K].reshape(out.shape[:-1] + (D, K))
        raw_h = out[..., D * K: 2 * D * K].reshape(out.shape[:-1] + (D, K))
        n_slopes = K if self.circular else K - 1
        raw_s = out[..., 2 * D * K:].reshape(out.shape[:-1] + (D, n_slopes))
        return raw_w, raw_h, raw_s

    def __call__(self, x: Array,
                 conditional_input: Optional[Array] = None
                 ) -> RationalQuadraticSpline:
        raw_w, raw_h, raw_s = self._merged_raw(x, conditional_input)
        w = _bin_positions(raw_w, self.bin_min, self.bin_max, self.num_bins)
        h = _bin_positions(raw_h, self.bin_min, self.bin_max, self.num_bins)
        s = _slopes(raw_s)
        return RationalQuadraticSpline(w, h, s, range_min=self.bin_min,
                                       circular=self.circular)


_MAF_FUSED = False  # see set_maf_fused()


def set_maf_fused(enabled: bool) -> None:
    """Toggle the fused MAF-block Pallas kernel (ops/maf_fused.py): the
    whole block — merged MADE matmuls, tanh, spline activations, RQS
    eval + log-det — runs in one VMEM pass per tile instead of
    round-tripping the (batch, 3*hidden) activation through HBM.  TPU
    only; layers silently use the XLA path when the input/conditioner
    shape is outside the kernel's support (non-merged MADEs, >2-D
    batches).  Exactness vs the XLA path is golden-tested
    (tests/test_maf_fused.py).

    The flag is read at TRACE time: functions already jit-compiled keep
    their cached backend — toggle BEFORE tracing (or re-jit) for the
    change to take effect."""
    global _MAF_FUSED
    _MAF_FUSED = bool(enabled)


def maf_fused_enabled() -> bool:
    return _MAF_FUSED


@struct.dataclass
class MAFLayer(bj.Bijector):
    """Masked autoregressive flow layer over an RQS conditioner.

    Reference analog: ``tfp.bijectors.MaskedAutoregressiveFlow``
    (vaemolsim/flows.py:628-637).  Density (inverse) is one parallel
    pass; sampling (forward) is the inherent D-step fixed-point iteration,
    expressed as ``lax.fori_loop`` so it stays one fused XLA program
    (SURVEY.md §7 hard part 1).  With ``set_maf_fused(True)`` both passes
    run as single Pallas VMEM kernels on TPU.
    """

    conditioner: MaskedSplineConditioner

    def _fused_args(self, t, context):
        """(params, ctx) for the fused kernel, or None if unsupported."""
        cond = self.conditioner
        if not (_MAF_FUSED and cond.mergeable and t.ndim == 2
                and (context is None or context.ndim == 2)
                and not cond.circular  # fused kernel is linear-tail only
                and jax.default_backend() == "tpu"):
            return None
        cond._check_conditional(context)
        k1, b1, k2, b2, c1, c2 = cond.merged_params()
        if context is not None:
            return (k1, b1, k2, b2, c1, c2), context
        return (k1, b1, k2, b2), None

    def _fused_call(self, t, context, inverse: bool):
        from vaemolsim_tpu.nn.core import compute_dtype
        from vaemolsim_tpu.ops import maf_fused

        args = self._fused_args(t, context)
        if args is None:
            return None
        params, ctx = args
        cond = self.conditioner
        fn = (maf_fused.maf_block_inverse_fused if inverse
              else maf_fused.maf_block_forward_fused)
        return fn(t, params, ctx, cond.w_net.event_size, cond.num_bins,
                  cond.bin_min, cond.bin_max,
                  compute_dtype() or jnp.float32)

    def _spline(self, t, context):
        cond = self.conditioner
        if cond.w_net.event_size == 1 and not cond.conditional:
            # Keep the non-shortcut path's validation: a context passed
            # to a non-conditional conditioner is a wiring error, not
            # something to silently drop.
            cond._check_conditional(context)
            # A 1-D autoregressive net's output may not depend on its
            # input (every MADE mask is zero), so the spline parameters
            # are a pure function of the biases/weights: evaluate ONE
            # dummy row and broadcast, instead of the full
            # (batch, 3*hidden) matmul + tanh XLA would otherwise run
            # (measured ~2x on the flagship MC prior's per-step cost).
            return cond(jnp.zeros((1, 1), t.dtype))
        return cond(t, context)

    def forward_and_log_det(self, x, context=None):
        fused = self._fused_call(x, context, inverse=False)
        if fused is not None:
            return fused
        D = self.conditioner.w_net.event_size

        def body(_, y):
            spline = self._spline(y, context)
            return spline.forward(x)

        # D total conditioner applications suffice (after k passes all
        # DOFs of autoregressive depth <= k are final): loop D-1 times
        # and let the final log-det evaluation be the D-th.
        y = jax.lax.fori_loop(0, D - 1, body, x)
        spline = self._spline(y, context)
        y, ldj = spline.forward_and_log_det(x)
        return y, jnp.sum(ldj, axis=-1)

    def inverse_and_log_det(self, y, context=None):
        fused = self._fused_call(y, context, inverse=True)
        if fused is not None:
            return fused
        spline = self._spline(y, context)
        x, ldj = spline.inverse_and_log_det(y)
        return x, jnp.sum(ldj, axis=-1)


@struct.dataclass
class RQSSplineMAF(_FlowMixin):
    """Chain of masked-autoregressive RQS blocks.

    Reference analog: ``RQSSplineMAF`` (vaemolsim/flows.py:531-700):
    ``num_blocks`` (default 2); input orders — first block right-to-left,
    last left-to-right, middle blocks a random permutation drawn from
    ``order_seed`` (flows.py:606-621) unless ``input_order`` is given in
    ``rqs_params`` (flows.py:626-637); optional BatchNorm between blocks;
    before/after transforms; ``conditional`` inherited from rqs_params.
    Conditional context is threaded explicitly to every MAF block (the
    reference's kwargs_split_fn dict, flows.py:671-690).
    """

    blocks: Tuple[MAFLayer, ...]
    bn_params: Tuple[bj.BatchNormBijector, ...]
    before_flow_transform: Optional[Any] = None
    after_flow_transform: Optional[Any] = None
    data_dim: int = struct.field(pytree_node=False, default=1)
    conditional: bool = struct.field(pytree_node=False, default=False)
    order_seed: Optional[int] = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, key: Array, data_dim: int, num_blocks: int = 2,
               order_seed: Optional[int] = None,
               rqs_params: Optional[dict] = None, batch_norm: bool = False,
               before_flow_transform=None, after_flow_transform=None
               ) -> "RQSSplineMAF":
        rqs_params = dict(rqs_params or {})
        explicit_order = rqs_params.pop("input_order", None)
        conditional = rqs_params.get("conditional", False)
        rng = np.random.default_rng(order_seed)
        keys = jax.random.split(key, num_blocks)
        blocks = []
        for i in range(num_blocks):
            if explicit_order is not None:
                order = explicit_order
            elif i == 0:
                order = "right-to-left"
            elif i == num_blocks - 1:
                order = "left-to-right"
            else:
                order = np.arange(1, data_dim + 1)
                rng.shuffle(order)
            cond = MaskedSplineConditioner.create(
                keys[i], data_dim, input_order=order, **rqs_params)
            blocks.append(MAFLayer(cond))
        bns = _make_bns(data_dim, num_blocks - 1) if batch_norm else ()
        return cls(blocks=tuple(blocks), bn_params=bns,
                   before_flow_transform=before_flow_transform,
                   after_flow_transform=after_flow_transform,
                   data_dim=data_dim, conditional=conditional,
                   order_seed=order_seed)
