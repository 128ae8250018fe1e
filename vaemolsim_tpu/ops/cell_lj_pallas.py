"""Fused Pallas TPU kernel for cell-list Lennard-Jones energy + force.

The winning kernel of the molecular stack (unlike the MAF/proposal
fusions, which XLA beat — see docs/performance.md): the XLA cell-list
force path materializes ~0.5 GB of (N, 27*capacity) pair tensors in
HBM per evaluation, while the whole working set (positions ~100 KB,
cell tables ~1 MB) fits in VMEM.  This kernel computes, per grid step
(= one cell), the (capacity, 27*capacity) pair interactions of the
cell's atoms against its 27 pre-gathered neighbor blocks and emits the
per-cell energy AND per-atom force in one VMEM pass — pair tensors
never touch HBM.

Measured on TPU v5e (N=8192, rho=0.8, cutoff 2.5, capacity 48), real
velocity-Verlet chains: 9.75M atom-steps/s vs 1.76M for the XLA path
(5.5x); force evaluation ~0.7 ms vs ~4 ms.

Design notes:
- Neighbor-cell positions are PRE-GATHERED outside the kernel into
  ``(n_cells, 3, 27*capacity)`` blocks (a block gather XLA does well),
  so the kernel needs no dynamic gathers.  Min-image wrapping happens
  IN the kernel (one round per axis against the static box) — a static
  per-(cell, neighbor) image shift is NOT sufficient, because an atom
  that wraps across a box face between build and evaluation would
  invalidate it (caught by test: dropped pairs, wrong forces).
- Transposed ``(3, capacity)`` layouts keep the per-axis pair
  differences as (capacity, 27*capacity) VPU ops (center coordinates
  broadcast from sublanes, neighbors from lanes).
- Transcendental-light math: one reciprocal + two rsqrt per pair
  (``w = du/dr / r = 24 eps (ir6 - 2 ir6^2) / max(r2, rcore2)`` needs
  no sqrt; the sqrts only feed the linear-core branch).
- Per-atom species (Lorentz-Berthelot): sigma_ij is the arithmetic
  mean of per-slot sigmas, eps_ij the product of per-slot sqrt(eps) —
  mixing costs multiplies/adds only, riding the same block layout as
  positions.
- The returned force is in CELL layout ``(n_cells, 3, capacity)``;
  the caller maps it back to atom order with the neighbor list's
  ``atom_slot`` index (one small row gather).

Used by ``potentials.lennard_jones_cell_neighbor(backend="pallas")``;
parity with the XLA path (and transitively the dense form) is pinned
by tests/test_potentials.py.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jax.Array

__all__ = ["cell_pair_energy_force"]

_SRC6 = (1.0 / 0.3) ** 6
_SLOPE_F = 24.0 / 0.3 * (_SRC6 - 2.0 * _SRC6 * _SRC6)


def _make_kernel(n_atoms: int, sigma: float, epsilon: float,
                 cutoff: float, shift: bool, box: Tuple[float, ...],
                 species: bool, coulomb: bool, alpha: float,
                 n_excl: int = 0):
    inv_box = tuple(1.0 / b for b in box)
    rc2 = float(cutoff) * float(cutoff)
    inv_cut6 = 1.0 / float(cutoff) ** 6
    two_opi = 2.0 / math.sqrt(math.pi)

    def kernel(cxt_ref, nxt_ref, cid_ref, nid_ref, *refs):
        i = 0
        if species:
            csig_ref, nsig_ref, cse_ref, nse_ref = refs[i:i + 4]
            i += 4
        if coulomb:
            cq_ref, nq_ref = refs[i:i + 2]
            i += 2
        if n_excl:
            cex_ref = refs[i]
            i += 1
        e_ref, ft_ref = refs[i:i + 2]
        cT = cxt_ref[0]                     # (3, C)
        nT = nxt_ref[0]                     # (3, 27C)
        ci = cid_ref[0]                     # (1, C)
        ni = nid_ref[0]                     # (1, 27C)

        ci_t = jnp.transpose(ci)            # (C, 1)
        d0 = jnp.transpose(cT[0:1, :]) - nT[0:1, :]   # (C, 27C)
        d1 = jnp.transpose(cT[1:2, :]) - nT[1:2, :]
        d2 = jnp.transpose(cT[2:3, :]) - nT[2:3, :]
        # Min image against the static box (wrap-crossing atoms make
        # any build-time image shift stale).
        d0 = d0 - box[0] * jnp.round(d0 * inv_box[0])
        d1 = d1 - box[1] * jnp.round(d1 * inv_box[1])
        d2 = d2 - box[2] * jnp.round(d2 * inv_box[2])
        r2 = d0 * d0 + d1 * d1 + d2 * d2

        if species:
            sg = 0.5 * (jnp.transpose(csig_ref[0]) + nsig_ref[0])
            ep = jnp.transpose(cse_ref[0]) * nse_ref[0]   # (C, 27C)
        else:
            sg = sigma
            ep = epsilon
        sig2 = sg * sg

        mask = ((ci_t < n_atoms) & (ni < n_atoms) & (ci_t != ni)
                & (r2 < rc2))
        if n_excl:
            # Bonded exclusions: cex holds each center slot's excluded
            # partner ids ((D, C), -1 padding never matches) — D static
            # (C, 27C) integer compares drop the bonded pairs BEFORE
            # the LJ wall is ever summed (subtract-after would cancel
            # catastrophically at float32; see potentials.py).
            exd = cex_ref[0]                # (D, C) int32
            for k in range(n_excl):
                mask = mask & (jnp.transpose(exd[k:k + 1, :]) != ni)
        # Same 1e-12 floor as the XLA paths: exactly coincident atoms
        # must get the finite linear-core energy/force (rsqrt(0) = inf
        # would NaN both), matching the dense form's contract.
        r2s = jnp.maximum(jnp.where(mask, r2, 1.0), 1e-12)
        rcore2 = 0.09 * sig2
        # r_eff = max(r, rcore) via the squared form: one reciprocal.
        irr = 1.0 / jnp.maximum(r2s, rcore2)
        ir2 = sig2 * irr
        ir6 = ir2 * ir2 * ir2
        u = 4.0 * ep * (ir6 * ir6 - ir6)
        if shift:
            s6 = sig2 * sig2 * sig2 * inv_cut6        # (sigma/cutoff)^6
            u = u - 4.0 * ep * (s6 * s6 - s6)
        w = 24.0 * ep * (ir6 - 2.0 * ir6 * ir6) * irr
        in_core = r2s < rcore2
        rs = jax.lax.rsqrt(r2s)
        if species:
            slope = _SLOPE_F * ep * jax.lax.rsqrt(sig2)   # /sigma_ij
        else:
            slope = _SLOPE_F * epsilon / sigma
        u = u + jnp.where(in_core, slope * (r2s * rs - 0.3 * sg), 0.0)
        w = jnp.where(in_core, slope * rs, w)
        if coulomb:
            # Ewald real-space term qq erfc(alpha r)/r; w adds
            # du/dr / r = -qq rs^2 (erfc rs + 2 alpha/sqrt(pi)
            # exp(-(alpha r)^2)).
            qq = jnp.transpose(cq_ref[0]) * nq_ref[0]
            ar = alpha * r2s * rs
            # In-kernel erfc via Abramowitz-Stegun 7.1.26 (|err| <=
            # 1.5e-7 for x >= 0; ar >= 0 always here): Mosaic has no
            # erf lowering (a jax upgrade removed it — caught by the
            # bench's molecular-stack stage), and the force term needs
            # exp(-ar^2) anyway, which the rational form reuses.
            exp_t = jnp.exp(-ar * ar)
            t = 1.0 / (1.0 + 0.3275911 * ar)
            erfc_t = (t * (0.254829592 + t * (-0.284496736 + t * (
                1.421413741 + t * (-1.453152027 + t * 1.061405429))))
                * exp_t)
            u = u + qq * erfc_t * rs
            w = w - qq * (erfc_t * rs
                          + two_opi * alpha * exp_t) * rs * rs
        w = jnp.where(mask, w, 0.0)

        e_ref[0] = (0.5 * jnp.sum(jnp.where(mask, u, 0.0))).reshape(1, 1)
        ft_ref[0, 0:1, :] = jnp.transpose(
            jnp.sum(w * d0, axis=1, keepdims=True))
        ft_ref[0, 1:2, :] = jnp.transpose(
            jnp.sum(w * d1, axis=1, keepdims=True))
        ft_ref[0, 2:3, :] = jnp.transpose(
            jnp.sum(w * d2, axis=1, keepdims=True))

    return kernel


@functools.partial(jax.jit, static_argnames=("n_atoms", "sigma", "epsilon",
                                             "cutoff", "shift", "box",
                                             "coulomb_alpha", "interpret"))
def cell_pair_energy_force(cxt: Array, nxt: Array, cid: Array, nid: Array,
                           species: Optional[Tuple[Array, Array,
                                                   Array, Array]] = None,
                           charge: Optional[Tuple[Array, Array]] = None,
                           exclusion: Optional[Array] = None,
                           *, n_atoms: int, sigma: float, epsilon: float,
                           cutoff: float, box: Tuple[float, ...],
                           shift: bool = True,
                           coulomb_alpha: float = 0.0,
                           interpret: bool = False
                           ) -> Tuple[Array, Array]:
    """Per-cell LJ energy and per-atom GRADIENT (dU/dx, cell layout).

    Inputs (K = 27 * capacity):
      cxt: (n_cells, 3, capacity) f32 — wrapped positions per cell;
      nxt: (n_cells, 3, K) f32 — neighbor-cell positions (wrapped);
      cid: (n_cells, 1, capacity) int32 — atom ids (n_atoms = padding);
      nid: (n_cells, 1, K) int32;
      species: optional (csig, nsig, cse, nse) per-slot sigma and
        sqrt(epsilon) blocks, shapes (n_cells, 1, capacity) /
        (n_cells, 1, K) — overrides the scalar sigma/epsilon;
      charge: optional (cq, nq) per-slot charge blocks — adds the
        Ewald real-space term ``qq erfc(coulomb_alpha r)/r``;
      exclusion: optional (n_cells, D, capacity) int32 excluded-partner
        ids per center slot (-1 padding) — bonded pairs are masked out
        of the sum in-kernel.

    Returns ``(e_cells (n_cells, 1, 1), grad_t (n_cells, 3, capacity))``
    with every pair's half-energy in its two cells and the full row sum
    as the gradient (see potentials.py for the derivation).
    """
    n_cells, _, cap = cxt.shape
    kp = nxt.shape[-1]
    kernel = _make_kernel(n_atoms, float(sigma), float(epsilon),
                          float(cutoff), bool(shift),
                          tuple(float(b) for b in box),
                          species is not None, charge is not None,
                          float(coulomb_alpha),
                          0 if exclusion is None else exclusion.shape[1])
    in_specs = [
        pl.BlockSpec((1, 3, cap), lambda c: (c, 0, 0)),
        pl.BlockSpec((1, 3, kp), lambda c: (c, 0, 0)),
        pl.BlockSpec((1, 1, cap), lambda c: (c, 0, 0)),
        pl.BlockSpec((1, 1, kp), lambda c: (c, 0, 0)),
    ]
    args = [cxt, nxt, cid, nid]
    for extra in (species, charge):
        if extra is not None:
            for a in extra:
                in_specs.append(pl.BlockSpec(
                    (1, 1, a.shape[-1]), lambda c: (c, 0, 0)))
                args.append(a)
    if exclusion is not None:
        in_specs.append(pl.BlockSpec(
            (1, exclusion.shape[1], cap), lambda c: (c, 0, 0)))
        args.append(exclusion)
    return pl.pallas_call(
        kernel,
        grid=(n_cells,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, 1), lambda c: (c, 0, 0)),
            pl.BlockSpec((1, 3, cap), lambda c: (c, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_cells, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_cells, 3, cap), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
