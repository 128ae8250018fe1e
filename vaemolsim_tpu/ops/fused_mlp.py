"""Fused dense-stack Pallas kernel: whole MLP in one VMEM pass.

Profiling the MCMC hot loop (SURVEY.md §3.3) on TPU v5e shows the step is
bandwidth-bound on *hidden activations*: XLA cannot fuse through a
matmul, so every (batch, hidden) intermediate of the 6 conditioner/trunk
network passes per MC step round-trips HBM (~32 MB per pass at 10k
chains x hidden 200).  This kernel runs an entire dense stack —
``h = act(h @ W_i + b_i (+ c @ C_i))`` per layer — on a (TILE, .) batch
tile with every weight and intermediate resident in VMEM, so HBM traffic
collapses to the input and output tiles.

Used by ``nn.Dense``-stack consumers (MLP trunks, spline conditioners,
MADE — masks are folded into the weights before the call) behind
``set_implementation("fused")``; the default XLA path remains ground
truth and supplies exact gradients via custom_vjp recomputation.

Measured verdict (TPU v5e, MCMC bench, 10k chains): the fused kernel
HALVES throughput (12.2M vs 26.7M proposals/s) — the stacks' leading
matmuls have tiny contraction dims (K=1..2) that waste the MXU inside
the kernel, while XLA schedules the same ops better and its per-op
overheads turn out negligible at this scale.  The activation-HBM-traffic
hypothesis did not survive measurement.  XLA therefore stays the default;
the kernel is kept as a tested alternative for future shapes (wide
trunks / large batch) where the fusion tradeoff may flip.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

__all__ = ["fused_dense_stack", "dense_stack_xla", "set_implementation",
           "use_fused"]

TILE_N = 1024

_IMPL = "xla"


def set_implementation(impl: str) -> None:
    """"xla" (default) or "fused" (Pallas VMEM kernel on TPU; falls back
    to XLA off-TPU)."""
    global _IMPL
    if impl not in ("xla", "fused"):
        raise ValueError(f"impl must be 'xla' or 'fused', got {impl!r}")
    _IMPL = impl


def use_fused() -> bool:
    return _IMPL == "fused" and jax.default_backend() == "tpu"


def _apply_act(h: Array, name: Optional[str]) -> Array:
    if name is None or name == "linear":
        return h
    if name == "tanh":
        return jnp.tanh(h)
    if name == "relu":
        return jnp.maximum(h, 0.0)
    # Other activations only reach the XLA path (the fused dispatch
    # falls back for them); resolve via the shared registry.
    from vaemolsim_tpu.nn.core import resolve_activation
    return resolve_activation(name)(h)


def dense_stack_xla(x: Array, kernels: Sequence[Array],
                    biases: Sequence[Array], activations: Sequence[Optional[str]],
                    cond: Optional[Array] = None,
                    cond_kernels: Optional[Sequence[Array]] = None) -> Array:
    """Reference implementation (and gradient path).

    Honors ``nn.core.set_compute_dtype``: with e.g. bfloat16, the entire
    stack (weights AND hidden activations) runs in that dtype and only
    the final output is cast back — halving the dominant activation HBM
    traffic on TPU.
    """
    if (cond is None) != (cond_kernels is None):
        raise ValueError(
            "cond and cond_kernels must be provided together (a dropped "
            "conditional input would silently train unconditioned)")
    from vaemolsim_tpu.nn.core import compute_dtype
    cd = compute_dtype()
    out_dtype = x.dtype
    h = x if cd is None else x.astype(cd)
    if cond is not None and cd is not None:
        cond = cond.astype(cd)

    def cast(w):
        return w if cd is None else w.astype(cd)

    for i, (W, b) in enumerate(zip(kernels, biases)):
        h = h @ cast(W) + cast(b)
        if cond is not None and cond_kernels is not None:
            h = h + cond @ cast(cond_kernels[i])
        h = _apply_act(h, activations[i])
    return h if cd is None else h.astype(out_dtype)


def _stack_kernel(*refs, n_layers: int, activations, has_cond: bool):
    if has_cond:
        x_ref, c_ref = refs[0], refs[1]
        w_refs = refs[2:2 + n_layers]
        b_refs = refs[2 + n_layers:2 + 2 * n_layers]
        ck_refs = refs[2 + 2 * n_layers:2 + 3 * n_layers]
        out_ref = refs[-1]
        c = c_ref[:]
    else:
        x_ref = refs[0]
        w_refs = refs[1:1 + n_layers]
        b_refs = refs[1 + n_layers:1 + 2 * n_layers]
        ck_refs = None
        out_ref = refs[-1]
    h = x_ref[:]
    for i in range(n_layers):
        h = jnp.dot(h, w_refs[i][:], preferred_element_type=jnp.float32)
        h = h + b_refs[i][:]
        if has_cond:
            h = h + jnp.dot(c, ck_refs[i][:],
                            preferred_element_type=jnp.float32)
        h = _apply_act(h, activations[i])
    out_ref[:] = h


def _fused_impl(x, kernels, biases, activations, cond, cond_kernels,
                interpret: bool) -> Array:
    lead = x.shape[:-1]
    din = x.shape[-1]
    dout = kernels[-1].shape[-1]
    x2 = x.reshape(-1, din)
    N = x2.shape[0]
    pad = (-N) % TILE_N
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    Np = x2.shape[0]
    has_cond = cond is not None
    n_layers = len(kernels)

    def row_spec(width):
        return pl.BlockSpec((TILE_N, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def full_spec(a):
        return pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape),
                            memory_space=pltpu.VMEM)

    inputs = [x2]
    in_specs = [row_spec(din)]
    if has_cond:
        c2 = cond.reshape(-1, cond.shape[-1])
        if pad:
            c2 = jnp.pad(c2, ((0, pad), (0, 0)))
        inputs.append(c2)
        in_specs.append(row_spec(c2.shape[-1]))
    # Biases as (1, D) rows for 2-D VMEM layout.
    b2 = [b.reshape(1, -1) for b in biases]
    inputs += list(kernels) + b2
    in_specs += [full_spec(w) for w in kernels] + [full_spec(b) for b in b2]
    if has_cond:
        inputs += list(cond_kernels)
        in_specs += [full_spec(ck) for ck in cond_kernels]

    kernel = functools.partial(_stack_kernel, n_layers=n_layers,
                               activations=tuple(activations),
                               has_cond=has_cond)
    out = pl.pallas_call(
        kernel,
        grid=(Np // TILE_N,),
        in_specs=in_specs,
        out_specs=row_spec(dout),
        out_shape=jax.ShapeDtypeStruct((Np, dout), x.dtype),
        interpret=interpret,
    )(*inputs)
    return out[:N].reshape(lead + (dout,))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 6))
def _fused_op(x, kernels, biases, activations, cond, cond_kernels,
              interpret):
    return _fused_impl(x, kernels, biases, activations, cond, cond_kernels,
                       interpret)


def _fused_fwd(x, kernels, biases, activations, cond, cond_kernels,
               interpret):
    out = _fused_impl(x, kernels, biases, activations, cond, cond_kernels,
                      interpret)
    return out, (x, kernels, biases, cond, cond_kernels)


def _fused_bwd(activations, interpret, res, g):
    x, kernels, biases, cond, cond_kernels = res

    def f(x, kernels, biases, cond, cond_kernels):
        return dense_stack_xla(x, kernels, biases, activations, cond,
                               cond_kernels)

    _, vjp = jax.vjp(f, x, kernels, biases, cond, cond_kernels)
    return vjp(g)


_fused_op.defvjp(_fused_fwd, _fused_bwd)


def fused_dense_stack(x: Array, kernels: Sequence[Array],
                      biases: Sequence[Array],
                      activations: Sequence[Optional[str]],
                      cond: Optional[Array] = None,
                      cond_kernels: Optional[Sequence[Array]] = None,
                      interpret: bool = False) -> Array:
    """Dense stack; dispatches to the fused kernel when enabled
    (set_implementation("fused") on TPU, or interpret=True), else XLA.

    The fused kernel computes in float32 only; under
    ``nn.core.set_compute_dtype(bfloat16)`` the XLA path is used so the
    user's dtype choice is honored rather than silently ignored."""
    from vaemolsim_tpu.nn.core import compute_dtype
    supported = (all(a in (None, "linear", "tanh", "relu")
                     for a in activations)
                 and compute_dtype() in (None, jnp.float32))
    if (use_fused() or interpret) and supported:
        return _fused_op(x, tuple(kernels), tuple(biases),
                         tuple(activations), cond,
                         None if cond_kernels is None else tuple(cond_kernels),
                         interpret)
    return dense_stack_xla(x, kernels, biases, activations, cond,
                           cond_kernels)
