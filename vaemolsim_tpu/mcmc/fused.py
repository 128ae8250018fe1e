"""Fused VAE-proposal kernel: the whole MC proposal in one Pallas pass.

The generic engine (mcmc/engine.py) is ~60 small XLA ops per step —
encoder/decoder matmuls, spline evals, PRNG, density reductions — and
at the 10k-chain reference workload the step is launch-bound (~100 us
marginal, see docs/performance.md).  For the flagship model family
(config 4/5: FCDeepNN + independent-normal encoder/decoder, RQS-spline
MAF prior over a 1-D latent with a diagonal-normal base) the entire
proposal —

    z1 ~ q(.|x1),  z2 ~ p(.),  x2 ~ q(.|z2),
    forward  = log q(z1|x1) + log p(z2) + log q(x2|z2)
    reverse  = log q(z2|x2) + log p(z1) + log q(x1|z1)

— runs as ONE Pallas kernel per step: both MLPs (twice each), the
per-block spline forward/inverse chains, Box-Muller normal sampling
from the on-core PRNG, and all density arithmetic stay in VMEM.  The
target evaluation and Metropolis accept/reject remain plain XLA, so
``log_target_fn`` stays an arbitrary user callable and the MH
bookkeeping reuses the tested engine (reference sign convention,
vaemolsim/mcmc.py:116).

The 1-D-latent prior's spline parameters are input-independent (the
constant-spline property, flows.MAFLayer._spline), so they are computed
once outside the kernel (XLA hoists them out of the scan) and enter as
small (B, K) tables.

RNG: the kernel uses the TPU core PRNG (pltpu.prng_random_bits), seeded
per (step, tile) with two 32-bit words derived from the chain's JAX key
plus the tile id (~64-bit stream; a single 31-bit seed would suffer
birthday collisions across steps).  The
proposal distribution is identical to the generic engine's; only the
random stream differs — Metropolis-Hastings is exact either way.
Density EXACTNESS vs the XLA distributions is what the tests pin: the
kernel also emits (z1, z2), and tests/test_mcmc_fused.py recomputes
forward/reverse log-probs for those samples through the model's own
distribution objects and requires agreement.

Use :func:`make_fused_vae_step` (raises ``UnsupportedModelError`` for
architectures outside the family; callers can fall back to
``make_mcmc_step``).

MEASURED OUTCOME (v5e, tools/bench_fused.py, 1000-step scans, bf16
generic path): the generic XLA engine wins — 84.5M props/s vs 24.0M
(10k chains) and 130.6M vs 26.7M (50k chains).  Two reasons: (a) the
constant-spline optimization (flows.MAFLayer._spline) already removed
the conditioner matmuls this kernel was built to fuse, collapsing the
XLA step to ~12 us marginal; (b) inside one jitted ``lax.scan`` there
are no per-step dispatches to amortize, and the kernel's VPU
broadcast-FMA MLPs run slower than XLA's fused codegen at these tiny
widths.  The kernel stays as a correct, density-exact, tested backend
(tests/test_mcmc_fused.py); see docs/performance.md for the study.
"""

from __future__ import annotations

import functools
import math
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vaemolsim_tpu.mcmc.engine import MCMCState, log_uniform

Array = jax.Array

__all__ = ["make_fused_vae_step", "fused_vae_proposal",
           "UnsupportedModelError"]

_TWO_PI = 2.0 * math.pi
_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)
_F32_EPS = float(np.finfo(np.float32).eps)

# 512-row tiles: at hidden width ~200 the kernel's live intermediates
# (four MLP evals + spline tables per tile) fit the 16M scoped-VMEM
# stack with room to spare; 1024 exceeded it by ~3% on v5e.
TILE_N = 512


class UnsupportedModelError(ValueError):
    """The VAE is outside the fused kernel's model family."""


class _Spec(NamedTuple):
    d_x: int
    d_z: int
    enc_act: str
    dec_act: str
    num_bins: int
    range_min: float


# ---------------------------------------------------------------------------
# Kernel body helpers (all on (T, ...) tiles in VMEM)
# ---------------------------------------------------------------------------


def _act(name, x):
    if name == "relu":
        return jnp.maximum(x, 0.0)
    if name == "tanh":
        return jnp.tanh(x)
    raise ValueError(name)


def _mlp(x, w1, b1, w2, b2, act):
    """One-hidden-layer FCDeepNN trunk + linear head, shaped for the VPU.

    Both contractions are degenerate for the MXU (first: K = d_x <= ~4;
    second: output lanes 2*d <= ~8, padded 128 on the systolic array —
    XLA itself lowers these to elementwise broadcast/reduce, which is
    why the generic engine's MLPs cost ~3 us).  Do the same here:
    explicit broadcast-FMA over the tiny axis.  All arithmetic is
    float32 (densities feed exact MH acceptance)."""
    T = x.shape[0]
    H = w1.shape[1]
    h = jnp.broadcast_to(b1, (T, H))
    for i in range(w1.shape[0]):
        h = h + x[:, i:i + 1] * w1[i:i + 1, :]
    h = _act(act, h)
    outs = []
    for j in range(w2.shape[1]):
        outs.append(jnp.sum(h * w2[:, j][None, :], axis=-1,
                            keepdims=True))
    return jnp.concatenate(outs, axis=-1) + b2


def _normal_params(raw, d):
    """IndependentBlockwise all-normal raw layout: per-DOF (loc, raw_scale)
    pairs (dists/layers.py): returns (T, d) loc and scale."""
    locs = [raw[:, 2 * i:2 * i + 1] for i in range(d)]
    scls = [raw[:, 2 * i + 1:2 * i + 2] for i in range(d)]
    loc = jnp.concatenate(locs, axis=-1)
    scale = jax.nn.softplus(jnp.concatenate(scls, axis=-1)) + _F32_EPS
    return loc, scale


def _normal_logprob(x, loc, scale):
    z = (x - loc) / scale
    return jnp.sum(-0.5 * z * z - jnp.log(scale) - _HALF_LOG_2PI, axis=-1,
                   keepdims=True)


def _uniforms(shape):
    """(0,1) uniforms from the core PRNG."""
    # prng_random_bits may come back as SIGNED int32; bitcast so the
    # shift is logical (an arithmetic >> on negative bits produced
    # garbage uniforms — caught by the on-chip acceptance-rate check),
    # then back to int32 for the float cast (Mosaic has no uint32->f32).
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    top24 = pltpu.bitcast(bits >> 8, jnp.int32)
    # Top 24 bits -> (0, 1): u in [2^-25, 1 - 2^-25].
    return top24.astype(jnp.float32) * (2.0 ** -24) + (2.0 ** -25)


def _normals(t, n):
    """(t, n) standard normals via Box-Muller."""
    n_pair = (n + 1) // 2
    u1 = _uniforms((t, n_pair))
    u2 = _uniforms((t, n_pair))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = _TWO_PI * u2
    z = jnp.concatenate([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)
    return z[:, :n]


def _spline_scalar(t_in, w, h, s, range_min, inverse):
    """RQS transform of a (T, 1) column against shared (1, K) parameter
    rows (the constant-spline tables).  Same math as ops/maf_fused."""
    from vaemolsim_tpu.ops.maf_fused import _rqs_tile

    T = t_in.shape[0]
    K = w.shape[-1]
    wt = jnp.broadcast_to(w, (T, K))
    ht = jnp.broadcast_to(h, (T, K))
    st = jnp.broadcast_to(s, (T, K - 1))
    out, ldj = _rqs_tile(t_in[:, 0], wt, ht, st, range_min, inverse)
    return out[:, None], ldj[:, None]


def _proposal_kernel(seed_ref, x1_ref, ew1_ref, eb1_ref, ew2_ref, eb2_ref,
                     dw1_ref, db1_ref, dw2_ref, db2_ref, sw_ref, sh_ref,
                     ss_ref, base_ref, *refs, spec: _Spec, n_blocks: int,
                     use_noise_input: bool):
    if use_noise_input:
        # Externally supplied standard normals (tests / debugging — the
        # CPU Pallas interpreter has no core PRNG).
        noise_ref = refs[0]
        out_refs = refs[1:]
    else:
        out_refs = refs
    x2_ref, fwd_ref, rev_ref, z1_ref, z2_ref = out_refs

    d_x, d_z = spec.d_x, spec.d_z
    x1 = x1_ref[:]
    T = x1.shape[0]
    if use_noise_input:
        eps = noise_ref[:]
    else:
        # Two independent 32-bit words per step + the tile id: a ~64-bit
        # per-(step, tile) stream.  (A single 31-bit word risks birthday
        # collisions — ~1% already at 2e4 (step, tile) pairs — which
        # would replay identical noise blocks across steps.)
        pltpu.prng_seed(seed_ref[0], seed_ref[1] + pl.program_id(0))
        eps = _normals(T, 2 * d_z + d_x)

    # Encoder at x1: z1 ~ q(.|x1).
    raw = _mlp(x1, ew1_ref[:], eb1_ref[:], ew2_ref[:], eb2_ref[:],
               spec.enc_act)
    mu, sig = _normal_params(raw, d_z)
    z1 = mu + sig * eps[:, :d_z]
    log_z1_x1 = _normal_logprob(z1, mu, sig)

    # Prior sample: u -> forward through blocks 0..B-1; log p(z2).
    base_loc = base_ref[0, 0]
    base_scale = base_ref[0, 1]
    u = base_loc + base_scale * eps[:, d_z:2 * d_z]
    zu = (u - base_loc) / base_scale
    base_lp = jnp.sum(-0.5 * zu * zu - jnp.log(base_scale)
                      - _HALF_LOG_2PI, axis=-1, keepdims=True)
    cur, fldj = u, 0.0
    for b in range(n_blocks):
        cur, l = _spline_scalar(cur, sw_ref[b:b + 1, :], sh_ref[b:b + 1, :],
                                ss_ref[b:b + 1, :], spec.range_min, False)
        fldj = fldj + l
    z2 = cur
    log_z2 = base_lp - fldj

    # Decoder at z2: x2 ~ q(.|z2).
    raw = _mlp(z2, dw1_ref[:], db1_ref[:], dw2_ref[:], db2_ref[:],
               spec.dec_act)
    mu_x, sig_x = _normal_params(raw, d_x)
    x2 = mu_x + sig_x * eps[:, 2 * d_z:]
    log_x2_z2 = _normal_logprob(x2, mu_x, sig_x)

    # Reverse: log q(z2|x2), log p(z1), log q(x1|z1).
    raw = _mlp(x2, ew1_ref[:], eb1_ref[:], ew2_ref[:], eb2_ref[:],
               spec.enc_act)
    mu_r, sig_r = _normal_params(raw, d_z)
    log_z2_x2 = _normal_logprob(z2, mu_r, sig_r)

    cur, ildj = z1, 0.0
    for b in reversed(range(n_blocks)):
        cur, l = _spline_scalar(cur, sw_ref[b:b + 1, :], sh_ref[b:b + 1, :],
                                ss_ref[b:b + 1, :], spec.range_min, True)
        ildj = ildj + l
    zu1 = (cur - base_loc) / base_scale
    log_z1 = (jnp.sum(-0.5 * zu1 * zu1 - jnp.log(base_scale)
                      - _HALF_LOG_2PI, axis=-1, keepdims=True) + ildj)

    raw = _mlp(z1, dw1_ref[:], db1_ref[:], dw2_ref[:], db2_ref[:],
               spec.dec_act)
    mu_r, sig_r = _normal_params(raw, d_x)
    log_x1_z1 = _normal_logprob(x1, mu_r, sig_r)

    x2_ref[:] = x2
    fwd_ref[:] = log_z1_x1 + log_z2 + log_x2_z2
    rev_ref[:] = log_z2_x2 + log_z1 + log_x1_z1
    z1_ref[:] = z1
    z2_ref[:] = z2


def fused_vae_proposal(x1: Array, seed: Array, enc_w, dec_w, spline_tables,
                       base_params, spec: _Spec,
                       noise: Optional[Array] = None,
                       interpret: bool = False):
    """Run the proposal kernel over all chains.

    ``seed``: (2,) int32 — two independent words seeding the core PRNG
    (combined with the tile id inside the kernel).
    ``noise``: optional (N, 2*d_z + d_x) standard normals to use instead
    of the in-kernel PRNG (tests; CPU interpret mode has no core PRNG).
    Returns (x2, forward_log_p, reverse_log_p, z1, z2)."""
    ew1, eb1, ew2, eb2 = enc_w
    dw1, db1, dw2, db2 = dec_w
    sw, sh, ss = spline_tables
    N, d_x = x1.shape
    n_blocks = sw.shape[0]
    pad = (-N) % TILE_N
    if pad:
        x1 = jnp.pad(x1, ((0, pad), (0, 0)))
        if noise is not None:
            noise = jnp.pad(noise, ((0, pad), (0, 0)))
    Np = x1.shape[0]

    def row_spec(width):
        return pl.BlockSpec((TILE_N, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def full_spec(a):
        return pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape),
                            memory_space=pltpu.VMEM)

    def v2(a):  # biases as (1, n) rows
        return a.reshape(1, -1)

    kernel = functools.partial(_proposal_kernel, spec=spec,
                               n_blocks=n_blocks,
                               use_noise_input=noise is not None)
    args = [x1, ew1, v2(eb1), ew2, v2(eb2), dw1, v2(db1), dw2, v2(db2),
            sw, sh, ss, base_params.reshape(1, 2)]
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = ([seed_spec, row_spec(d_x)]
                + [full_spec(a) for a in args[1:]])
    if noise is not None:
        args.append(noise)
        in_specs.append(row_spec(noise.shape[1]))
    d_z = spec.d_z
    outs = pl.pallas_call(
        kernel,
        grid=(Np // TILE_N,),
        in_specs=in_specs,
        out_specs=[row_spec(d_x), row_spec(1), row_spec(1), row_spec(d_z),
                   row_spec(d_z)],
        out_shape=[jax.ShapeDtypeStruct((Np, d_x), jnp.float32),
                   jax.ShapeDtypeStruct((Np, 1), jnp.float32),
                   jax.ShapeDtypeStruct((Np, 1), jnp.float32),
                   jax.ShapeDtypeStruct((Np, d_z), jnp.float32),
                   jax.ShapeDtypeStruct((Np, d_z), jnp.float32)],
        interpret=interpret,
    )(seed.astype(jnp.int32).reshape(2), *args)
    x2, fwd, rev, z1, z2 = outs
    return (x2[:N], fwd[:N, 0], rev[:N, 0], z1[:N], z2[:N])


# ---------------------------------------------------------------------------
# Model extraction / step wiring
# ---------------------------------------------------------------------------


def _require(cond, what):
    if not cond:
        raise UnsupportedModelError(
            f"fused VAE step requires {what}; use mcmc.make_mcmc_step for "
            f"general models")


def _extract_mlp(m2d, label):
    """(w1, b1, w2, b2, activation, in_dim, out_dofs) from a
    MappingToDistribution with a 1-hidden-layer FCDeepNN and an
    all-normal IndependentBlockwise dist."""
    from vaemolsim_tpu.dists import IndependentBlockwise
    from vaemolsim_tpu.nn.mappings import FCDeepNN

    mapping, dist = m2d.mapping, m2d.dist
    _require(isinstance(mapping, FCDeepNN), f"{label}: FCDeepNN mapping")
    _require(len(mapping.layers) == 1 and not mapping.batch_norm
             and not any(mapping.periodic_mask),
             f"{label}: single plain hidden layer")
    act = mapping.layers[0].activation or "linear"
    _require(act in ("relu", "tanh"), f"{label}: relu/tanh activation")
    _require(isinstance(dist, IndependentBlockwise)
             and all(f == "normal" for f in dist.families),
             f"{label}: all-normal IndependentBlockwise")
    lyr, head = mapping.layers[0], mapping.head
    _require(head.activation in (None, "linear"), f"{label}: linear head")
    return ((lyr.kernel, lyr.bias, head.kernel, head.bias), act,
            lyr.kernel.shape[0], dist.num_dofs)


def _extract_prior(prior):
    """Constant spline tables (B, K)/(B, K-1) + (loc, scale) base params
    from a StaticFlowedDistribution(RQSSplineMAF over 1-D, diag-normal
    base)."""
    from vaemolsim_tpu.dists import StaticFlowedDistribution
    from vaemolsim_tpu.flows import RQSSplineMAF
    from vaemolsim_tpu.ops import distributions as d

    _require(isinstance(prior, StaticFlowedDistribution),
             "a StaticFlowedDistribution prior")
    flow, base = prior.flow, prior.base
    _require(isinstance(flow, RQSSplineMAF) and flow.data_dim == 1
             and not flow.conditional and not flow.bn_params
             and flow.before_flow_transform is None
             and flow.after_flow_transform is None,
             "a plain 1-D unconditional RQSSplineMAF prior flow")
    _require(isinstance(base, d.Independent)
             and isinstance(base.base, d.Normal),
             "an Independent(Normal) base")

    def tables():
        ws, hs, ss = [], [], []
        rm = None
        for blk in flow.blocks:
            spline = blk._spline(jnp.zeros((1, 1)), None)
            ws.append(spline.bin_widths.reshape(-1))
            hs.append(spline.bin_heights.reshape(-1))
            ss.append(spline.knot_slopes.reshape(-1))
            rm = spline.range_min
        return (jnp.stack(ws), jnp.stack(hs), jnp.stack(ss)), rm

    loc = jnp.reshape(base.base.loc, (-1,))
    scale = jnp.reshape(base.base.scale, (-1,))
    _require(loc.shape == (1,) and scale.shape == (1,),
             "a 1-D diagonal-normal base")
    base_params = jnp.stack([loc[0], scale[0]])
    return tables, base_params


def make_fused_vae_step(vae, log_target_fn: Callable[[Array], Array],
                        interpret: bool = False,
                        host_noise: bool = False):
    """Build a fused MCMCState -> MCMCState step for the flagship model
    family.  Raises :class:`UnsupportedModelError` otherwise.

    ``host_noise=True`` draws the proposal normals with jax.random
    outside the kernel (required with ``interpret=True`` on CPU, where
    the core PRNG is unavailable)."""
    if interpret and not host_noise:
        raise ValueError(
            "interpret=True requires host_noise=True: the Pallas "
            "interpreter has no TPU core PRNG (pltpu.prng_random_bits)")

    enc_w, enc_act, enc_in, d_z = _extract_mlp(vae.encoder, "encoder")
    dec_w, dec_act, dec_in, d_x = _extract_mlp(vae.decoder, "decoder")
    _require(dec_in == d_z and enc_in == d_x,
             "encoder/decoder dims forming an autoencoder")
    _require(d_z == 1, "a 1-D latent (constant-spline prior)")
    tables_fn, base_params = _extract_prior(vae.prior)

    def step(state: MCMCState) -> MCMCState:
        key, k_seed, k_acc = jax.random.split(state.key, 3)
        # Two full 32-bit words -> a ~64-bit per-step seed space; a
        # single 31-bit seed collides (birthday) within ~1e4 steps.
        seed = jax.random.randint(k_seed, (2,), np.iinfo(np.int32).min,
                                  np.iinfo(np.int32).max, dtype=jnp.int32)
        (sw, sh, ss), range_min = tables_fn()
        spec = _Spec(d_x=d_x, d_z=d_z, enc_act=enc_act, dec_act=dec_act,
                     num_bins=sw.shape[-1], range_min=float(range_min))
        x1, e1 = state.configs, state.energies
        noise = (jax.random.normal(k_seed,
                                   (x1.shape[0], 2 * d_z + d_x))
                 if host_noise else None)
        x2, fwd, rev, _, _ = fused_vae_proposal(
            x1, seed, enc_w, dec_w, (sw, sh, ss), base_params, spec,
            noise=noise, interpret=interpret)
        e2 = log_target_fn(x2)
        log_acc = (e2 - e1) + rev - fwd
        accept = log_acc >= log_uniform(k_acc, log_acc.shape,
                                        log_acc.dtype)
        return MCMCState(
            configs=jnp.where(accept[..., None], x2, x1),
            energies=jnp.where(accept, e2, e1), key=key,
            num_trials=state.num_trials.add(accept.size),
            num_acc=state.num_acc.add(jnp.sum(accept, dtype=jnp.int32)))

    return step
