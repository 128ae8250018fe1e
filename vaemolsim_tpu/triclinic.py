"""General triclinic (sheared) periodic cells.

Beyond-reference frontier (VERDICT r3 item 8; the reference has no
periodic boxes at all and the rest of this framework is orthorhombic,
e.g. ``potentials.lennard_jones`` / ``observables``): sheared cells
unlock NPT crystal work, deformation studies, and non-cubic phases.

Conventions — the LAMMPS/HOOMD "restricted triclinic" form, which any
cell can be rotated into: a LOWER-TRIANGULAR cell matrix ``H`` whose
ROWS are the cell vectors,

    a = (ax, 0,  0)
    b = (bx, by, 0)
    c = (cx, cy, cz)

with positive diagonal and tilt bounds ``|bx| <= ax/2``,
``|cx| <= ax/2``, ``|cy| <= by/2``.  Cartesian coords relate to
fractional by ``x = s @ H`` (s in [0, 1)).  Under the tilt bounds the
SEQUENTIAL minimum image (wrap along c, then b, then a — valid because
H is lower triangular, so later wraps cannot disturb already-wrapped
components) is exact for any cutoff up to half the minimum
perpendicular width, the same validity condition as the orthorhombic
``box/2`` rule.

Pressure: the full virial tensor comes from the STRAIN DERIVATIVE,
``P V = sum_i m v_i (x) v_i - dU/d(eps)`` at eps=0 where every
coordinate and the cell are deformed affinely ``x -> x (1 + eps)`` —
one ``jax.grad`` through the energy, no per-potential pair-virial code
(matches the analytic pair-virial sum; pinned in
tests/test_triclinic.py).

MD in a fixed triclinic cell needs nothing new: close the cell over
:func:`lennard_jones_triclinic` and hand ``x -> energy`` to any
integrator in :mod:`vaemolsim_tpu.md`.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from vaemolsim_tpu.mcmc.engine import Counter, log_uniform

Array = jax.Array

__all__ = [
    "validate_cell", "cell_volume", "perpendicular_widths", "wrap",
    "to_fractional", "from_fractional", "min_image", "lattice_in_cell",
    "lennard_jones_triclinic", "ewald_coulomb_triclinic",
    "pressure_tensor", "kinetic_tensor",
    "lennard_jones_cell_triclinic", "NPTTriclinicState",
    "npt_triclinic_init", "make_npt_triclinic_step", "run_npt_triclinic",
]

_EPS = 1e-12


# ---------------------------------------------------------------------
# Cell geometry
# ---------------------------------------------------------------------

def validate_cell(cell) -> np.ndarray:
    """Static validation of a restricted-triclinic cell matrix.

    Accepts a (3, 3) lower-triangular matrix (rows a, b, c) or 3 edge
    lengths (orthorhombic shorthand).  Returns the (3, 3) float64 numpy
    matrix.  Raises on upper-triangular leakage, non-positive diagonal,
    or tilt factors outside the half-edge bounds (outside them the
    sequential minimum image is not valid — re-reduce the cell first).
    """
    h = np.asarray(cell, np.float64)
    if h.shape == (3,):
        h = np.diag(h)
    if h.shape != (3, 3):
        raise ValueError(f"cell must be (3,3) or 3 lengths; got {h.shape}")
    if np.abs(h[np.triu_indices(3, k=1)]).max() > 1e-12:
        raise ValueError("cell must be LOWER triangular (rows a, b, c "
                         "with a along x) — rotate the cell first")
    if (np.diag(h) <= 0).any():
        raise ValueError(f"cell diagonal must be positive; got {np.diag(h)}")
    ax, by = h[0, 0], h[1, 1]
    bad = []
    if abs(h[1, 0]) > ax / 2 + 1e-12:
        bad.append(f"|bx|={abs(h[1, 0])} > ax/2={ax / 2}")
    if abs(h[2, 0]) > ax / 2 + 1e-12:
        bad.append(f"|cx|={abs(h[2, 0])} > ax/2={ax / 2}")
    if abs(h[2, 1]) > by / 2 + 1e-12:
        bad.append(f"|cy|={abs(h[2, 1])} > by/2={by / 2}")
    if bad:
        raise ValueError("tilt factors outside the restricted-triclinic "
                         "bounds: " + "; ".join(bad))
    return h


def cell_volume(cell: Array) -> Array:
    """V = det H (product of the diagonal for lower-triangular H)."""
    h = jnp.asarray(cell)
    return h[..., 0, 0] * h[..., 1, 1] * h[..., 2, 2]


def perpendicular_widths(cell: Array) -> Array:
    """(3,) distances between opposite cell faces — the triclinic
    analog of the edge lengths: w_k = V / |area of the face spanned by
    the other two vectors|.  Cutoff validity: r_c <= min(w)/2."""
    h = jnp.asarray(cell)
    a, b, c = h[..., 0, :], h[..., 1, :], h[..., 2, :]
    v = jnp.abs(cell_volume(h))

    def area(u, w):
        cr = jnp.cross(u, w)
        return jnp.sqrt(jnp.sum(cr * cr, axis=-1) + _EPS)

    return jnp.stack([v / area(b, c), v / area(a, c), v / area(a, b)],
                     axis=-1)


def to_fractional(x: Array, cell: Array) -> Array:
    """Cartesian -> fractional: s with x = s @ H.

    Closed-form back-substitution on the lower-triangular H, written
    elementwise — NOT a matmul: on TPU a 3-wide matmul runs on the MXU
    at reduced default precision, and the wrap round-trip's ~1e-3
    coordinate noise gets amplified through r^-12 walls (caught as a
    1.5% cell-list-vs-dense energy error on the chip; elementwise VPU
    arithmetic is full f32)."""
    h = jnp.asarray(cell, x.dtype)

    def c(i, j):  # cell component, broadcast over the atom axis
        return h[..., i, j][..., None]

    x0, x1, x2 = x[..., 0], x[..., 1], x[..., 2]
    s2 = x2 / c(2, 2)
    s1 = (x1 - s2 * c(2, 1)) / c(1, 1)
    s0 = (x0 - s1 * c(1, 0) - s2 * c(2, 0)) / c(0, 0)
    return jnp.stack([s0, s1, s2], axis=-1)


def from_fractional(s: Array, cell: Array) -> Array:
    """Fractional -> Cartesian, elementwise (see to_fractional)."""
    h = jnp.asarray(cell, s.dtype)

    def c(i, j):
        return h[..., i, j][..., None]

    s0, s1, s2 = s[..., 0], s[..., 1], s[..., 2]
    x0 = s0 * c(0, 0) + s1 * c(1, 0) + s2 * c(2, 0)
    x1 = s1 * c(1, 1) + s2 * c(2, 1)
    x2 = s2 * c(2, 2)
    return jnp.stack([x0, x1, x2], axis=-1)


def wrap(x: Array, cell: Array) -> Array:
    """Wrap coordinates into the primary cell (fractional [0, 1))."""
    s = to_fractional(x, cell)
    return from_fractional(s - jnp.floor(s), cell)


def min_image(d: Array, cell: Array) -> Array:
    """Minimum-image displacement for a restricted-triclinic cell.

    Sequential wrap c -> b -> a: H is lower triangular, so removing
    multiples of c fixes the z component exactly, then b fixes y
    without touching z, then a fixes x.  Exact for separations below
    half the minimum perpendicular width (validate_cell's bounds)."""
    h = jnp.asarray(cell, d.dtype)
    d = d - h[..., 2, :] * jnp.round(d[..., 2:3] / h[..., 2, 2][..., None])
    d = d - h[..., 1, :] * jnp.round(d[..., 1:2] / h[..., 1, 1][..., None])
    d = d - h[..., 0, :] * jnp.round(d[..., 0:1] / h[..., 0, 0][..., None])
    return d


def lattice_in_cell(n_atoms: int, cell) -> jnp.ndarray:
    """~Uniform lattice seed: an m^3 fractional grid mapped through H
    (overlap-free start for MD/MC in a sheared cell)."""
    h = validate_cell(cell)
    m = int(np.ceil(n_atoms ** (1.0 / 3.0)))
    g = np.stack(np.meshgrid(*[np.arange(m)] * 3, indexing="ij"),
                 -1).reshape(-1, 3)[:n_atoms] / m
    return jnp.asarray(g @ h, jnp.float32)


# ---------------------------------------------------------------------
# Potentials
# ---------------------------------------------------------------------

def lennard_jones_triclinic(sigma: float = 1.0, epsilon: float = 1.0, *,
                            cutoff: float, shift: bool = True
                            ) -> Callable[[Array, Array], Array]:
    """Dense periodic LJ in a triclinic cell: ``energy(x, cell)``.

    CELL-PARAMETRIC (the cell is a call argument, traced under jit) so
    anisotropic NPT and strain derivatives differentiate through it —
    the triclinic analog of the orthorhombic box-parametric factories
    (``potentials.lennard_jones(box=...)``, mcmc/npt.py contract).
    ``shift=True`` removes the cutoff discontinuity (NPT volume moves
    see an impulsive energy otherwise).  Batched over leading axes of
    ``x`` with a matching (or broadcastable) batch of cells.
    """
    sig2 = float(sigma) ** 2
    eps4 = 4.0 * float(epsilon)
    rc2 = float(cutoff) ** 2
    s6c = (sig2 / rc2) ** 3
    u_cut = eps4 * (s6c * s6c - s6c) if shift else 0.0

    def energy(x: Array, cell: Array) -> Array:
        n = x.shape[-2]
        d = x[..., :, None, :] - x[..., None, :, :]
        d = min_image(d, cell[..., None, None, :, :]
                      if jnp.ndim(cell) > 2 else cell)
        r2 = jnp.sum(d * d, axis=-1)
        mask = jnp.triu(jnp.ones((n, n), bool), k=1) & (r2 < rc2)
        r2s = jnp.where(mask, r2, 1.0)
        s6 = (sig2 / r2s) ** 3
        u = eps4 * (s6 * s6 - s6) - u_cut
        return jnp.sum(jnp.where(mask, u, 0.0), axis=(-2, -1))

    return energy


def ewald_coulomb_triclinic(charges, *, reference_cell,
                            r_cutoff: float,
                            exclude: Optional[np.ndarray] = None,
                            alpha: Optional[float] = None,
                            tolerance: float = 1e-5,
                            k_cutoff: Optional[float] = None,
                            include_real_space: bool = True
                            ) -> Callable[[Array, Array], Array]:
    """EXACT periodic electrostatics in a general (sheared) cell:
    cell-parametric ``energy(x, cell)`` — the triclinic completion of
    :func:`vaemolsim_tpu.potentials.ewald_coulomb` (same reduced units,
    same tolerance heuristics, same correction terms, same
    ``include_real_space`` split contract), unlocking charged/ionic
    crystals for the anisotropic-NPT machinery in this module.

    TPU decomposition, triclinic pieces:

    - **reciprocal vectors** come from the dual basis ``H k = 2 pi n``
      (rows of H are the cell vectors, ``x = s @ H``): the
      lower-triangular inverse is written ELEMENTWISE (VPU full-f32;
      a 3-wide matmul-with-inverse would hit the MXU at bf16-mantissa
      default precision — the to_fractional lesson), so the traced
      cell differentiates cleanly and strain derivatives
      (:func:`pressure_tensor`) pick up the reciprocal-space virial
      through plain autodiff;
    - the integer half-space mode set is FIXED at build time from
      ``reference_cell`` (``|k| <= k_cutoff`` there) while the
      k-VALUES re-evaluate from the call-time cell — exactly
      ``ewald_coulomb``'s ``reference_box`` contract, so NPT tilt/
      stretch moves and strain dilations trace through with an
      O(tolerance) mode-set error for small deformations;
    - the short-range erfc sum uses the SEQUENTIAL triclinic minimum
      image (:func:`min_image`; valid while ``r_cutoff`` <= half the
      minimum perpendicular width of the call-time cell — the caller's
      NPT bounds must keep cells inside that, as with the
      orthorhombic ``min_box`` wall);
    - self term, neutralizing background (net charge), and sparse
      excluded-pair ``-q_i q_j erf(alpha r)/r`` compensation are as in
      the orthorhombic factory.

    Batched over leading axes of ``x`` with a matching/broadcastable
    batch of cells (per-chain cells in NPT MC).  Pinned by the
    orthorhombic-limit identity, lattice re-representation invariance
    (a unimodular shear of the SAME lattice), alpha-invariance in a
    sheared cell, and strain-pressure finite differences
    (tests/test_triclinic_ewald.py).
    """
    q = jnp.asarray(charges, jnp.float32)
    if q.ndim != 1:
        raise ValueError(f"charges must be (n,); got {q.shape}")
    h_ref = validate_cell(reference_cell)                # (3, 3) f64
    w_ref = np.asarray(perpendicular_widths(jnp.asarray(h_ref)))
    if not (r_cutoff * 2.0 <= w_ref.min() + 1e-9):
        raise ValueError(
            f"r_cutoff {r_cutoff} must be <= half the minimum "
            f"perpendicular width ({w_ref.min() / 2}) of the reference "
            "cell for minimum-image validity")
    ln_tol = float(np.sqrt(-np.log(tolerance)))
    alpha_v = float(alpha) if alpha is not None else ln_tol / float(r_cutoff)
    k_cut = (float(k_cutoff) if k_cutoff is not None
             else 2.0 * alpha_v * ln_tol)

    # Half-space integer mode set at the reference cell.  Per-axis
    # bound: |n_i| = |k . a_i| / 2pi <= k_cut |a_i| / 2pi.
    row_len = np.sqrt((h_ref ** 2).sum(axis=1))
    n_max = np.maximum(np.ceil(k_cut * row_len / (2 * np.pi)),
                       1).astype(int)
    axes_r = [np.arange(-m, m + 1) for m in n_max]
    nn = np.stack(np.meshgrid(*axes_r, indexing="ij"), -1).reshape(-1, 3)
    half = ((nn[:, 0] > 0)
            | ((nn[:, 0] == 0) & (nn[:, 1] > 0))
            | ((nn[:, 0] == 0) & (nn[:, 1] == 0) & (nn[:, 2] > 0)))
    nn = nn[half]
    k_ref = 2 * np.pi * nn @ np.linalg.inv(h_ref).T      # H k = 2pi n
    nn = nn[(k_ref ** 2).sum(-1) <= k_cut * k_cut]
    if nn.shape[0] == 0:
        raise ValueError("empty k-vector set; increase k_cutoff/"
                         "tolerance")
    modes = jnp.asarray(nn, jnp.float32)                 # (n_k, 3)

    qq = q[:, None] * q[None, :]
    from vaemolsim_tpu.potentials import _exclude_matrix
    excl_np = (None if exclude is None
               else _exclude_matrix(exclude, int(q.shape[0])))
    from jax.scipy.special import erf, erfc

    def _k_vectors(cell: Array) -> Array:
        """(..., n_k, 3) reciprocal vectors 2 pi H^{-1} n, elementwise
        lower-triangular back-substitution (differentiable in cell)."""
        h = cell

        def c(i, j):  # (...,) -> (..., 1) broadcast over the mode axis
            return h[..., i, j][..., None]

        n0, n1, n2 = modes[:, 0], modes[:, 1], modes[:, 2]
        k0 = n0 / c(0, 0)
        k1 = (n1 - k0 * c(1, 0)) / c(1, 1)
        k2 = (n2 - k0 * c(2, 0) - k1 * c(2, 1)) / c(2, 2)
        return 2 * jnp.pi * jnp.stack([k0, k1, k2], axis=-1)

    def energy(x: Array, cell: Array) -> Array:
        x = jnp.asarray(x)
        n = x.shape[-2]
        if n != q.shape[0]:
            raise ValueError(f"coords have {n} atoms but charges has "
                             f"{q.shape[0]}")
        h = jnp.asarray(cell, x.dtype)
        vol = cell_volume(h)
        xw = wrap(x, h)                          # bounds f32 phases

        # Reciprocal sum: one matmul + cos/sin reductions (half set,
        # factor 2 folded against the 1/2V prefactor).
        k = _k_vectors(h)                        # (..., n_k, 3)
        k2 = jnp.sum(k * k, -1)
        w = (4 * jnp.pi / k2) * jnp.exp(-k2 / (4 * alpha_v * alpha_v))
        # precision=HIGHEST: 3-wide contraction, O(100)-rad phases —
        # MXU default precision costs O(1e-3) relative energy on chip
        # (the to_fractional / PME-spreading lesson; measured live).
        phase = jnp.einsum("...nd,...kd->...nk", xw, k,
                           precision=jax.lax.Precision.HIGHEST)
        s_cos = jnp.sum(q[:, None] * jnp.cos(phase), axis=-2)
        s_sin = jnp.sum(q[:, None] * jnp.sin(phase), axis=-2)
        u_recip = (jnp.sum(w * (s_cos ** 2 + s_sin ** 2), axis=-1)
                   / vol)

        h_pair = (h[..., None, None, :, :] if jnp.ndim(h) > 2 else h)
        if include_real_space:
            pair_mask = np.triu(np.ones((n, n), bool), k=1)
            if excl_np is not None:
                pair_mask &= ~excl_np
            mask = jnp.asarray(pair_mask)
            d = xw[..., :, None, :] - xw[..., None, :, :]
            d = min_image(d, h_pair)
            r2 = jnp.sum(d * d, -1)
            mask = mask & (r2 < r_cutoff * r_cutoff)
            r = jnp.sqrt(jnp.maximum(jnp.where(mask, r2, 1.0), _EPS))
            u_real = jnp.sum(jnp.where(mask,
                                       qq * erfc(alpha_v * r) / r, 0.0),
                             axis=(-2, -1))
        else:
            u_real = 0.0

        u_self = -alpha_v / jnp.sqrt(jnp.pi) * jnp.sum(q * q)
        u_bg = -jnp.pi / (2 * vol * alpha_v * alpha_v) * jnp.sum(q) ** 2

        if excl_np is not None:
            em = jnp.asarray(np.triu(excl_np, k=1))
            de = xw[..., :, None, :] - xw[..., None, :, :]
            de = min_image(de, h_pair)
            re = jnp.sqrt(jnp.maximum(
                jnp.where(em, jnp.sum(de * de, -1), 1.0), _EPS))
            u_excl = -jnp.sum(jnp.where(em, qq * erf(alpha_v * re) / re,
                                        0.0), axis=(-2, -1))
        else:
            u_excl = 0.0

        return u_recip + u_real + u_self + u_bg + u_excl

    energy.ewald_alpha = alpha_v
    return energy


def kinetic_tensor(v: Array, mass=1.0) -> Array:
    """sum_i m v_i (x) v_i -> (..., 3, 3)."""
    m = jnp.asarray(mass)
    if m.ndim == 1:
        m = m[:, None]
    return jnp.einsum("...ia,...ib->...ab", m * v, v)


def pressure_tensor(energy: Callable[[Array, Array], Array], x: Array,
                    cell: Array, *, v: Optional[Array] = None,
                    mass=1.0, kT: Optional[float] = None) -> Array:
    """Full (3, 3) instantaneous pressure tensor by strain derivative.

    ``P V = K - dU/d(eps)`` at eps = 0, with the affine deformation
    ``x -> x (1 + eps)``, ``H -> H (1 + eps)`` applied through the
    cell-parametric ``energy(x, cell)`` — one reverse-mode gradient,
    valid for ANY differentiable potential (no pair-virial bookkeeping;
    agreement with the analytic LJ pair virial is pinned in tests).
    The kinetic part uses velocities when given, else the equipartition
    value ``N kT I`` (``kT=`` required in that case).
    """
    x = jnp.asarray(x)
    h = jnp.asarray(cell, x.dtype)
    eye = jnp.eye(3, dtype=x.dtype)

    def u_of_strain(eps):
        f = eye + eps
        return energy(x @ f, h @ f)

    virial = -jax.grad(u_of_strain)(jnp.zeros((3, 3), x.dtype))
    virial = 0.5 * (virial + virial.T)
    if v is not None:
        kin = kinetic_tensor(v, mass)
    else:
        if kT is None:
            raise ValueError("pass velocities v= or kT= for the "
                             "kinetic part")
        kin = x.shape[-2] * float(kT) * eye
    return (kin + virial) / cell_volume(h)


# ---------------------------------------------------------------------
# Cell list (fractional-space binning, static cell)
# ---------------------------------------------------------------------

def lennard_jones_cell_triclinic(cell, *, cutoff: float,
                                 skin: float = 0.3, capacity: int = 32,
                                 sigma: float = 1.0,
                                 epsilon: float = 1.0,
                                 shift: bool = True):
    """O(N) cell-list LJ for a STATIC triclinic cell:
    ``(build, energy)`` with the orthorhombic
    ``lennard_jones_cell_neighbor`` contract (build once, reuse while
    no atom moves more than skin/2; NaN on capacity overflow).

    Binning happens in FRACTIONAL space: axis k is split into
    ``floor(w_perp_k / (cutoff + skin))`` slabs, so any pair within the
    build cutoff lies in adjacent (27-neighborhood) fractional cells —
    the triclinic generalization of the orthorhombic edge/cells rule.
    Distances are Cartesian with the sequential minimum image.  XLA
    path (two-stage block gather + masked pair grid); the Pallas
    orthorhombic kernel stays specialized to rectangular cells where
    its in-kernel min-image is cheapest.
    """
    h_np = validate_cell(cell)
    h = jnp.asarray(h_np, jnp.float32)
    rc_build = float(cutoff) + float(skin)
    w = np.asarray(perpendicular_widths(jnp.asarray(h_np)))
    n_grid = np.maximum(np.floor(w / rc_build).astype(np.int64), 1)
    if (n_grid < 3).any():
        raise ValueError(
            f"cell with perpendicular widths {w.tolist()} fits "
            f"{n_grid.tolist()} bins of width >= cutoff+skin {rc_build};"
            " need >= 3 per axis (use lennard_jones_triclinic dense)")
    n_cells = int(n_grid.prod())
    strides = np.array([n_grid[1] * n_grid[2], n_grid[2], 1], np.int64)
    offs = np.stack(np.meshgrid(*[[-1, 0, 1]] * 3, indexing="ij"),
                    -1).reshape(-1, 3)
    g3 = np.stack(np.unravel_index(np.arange(n_cells), n_grid), -1)
    cell_nb = jnp.asarray(
        (((g3[:, None, :] + offs[None, :, :]) % n_grid) @ strides
         ).astype(np.int32))
    grid_j = jnp.asarray(n_grid, jnp.float32)

    sig2 = float(sigma) ** 2
    eps4 = 4.0 * float(epsilon)
    rc2 = jnp.float32(cutoff * cutoff)
    s6c = (sig2 / float(cutoff) ** 2) ** 3
    u_cut = jnp.float32(eps4 * (s6c * s6c - s6c) if shift else 0.0)
    drift2_max = jnp.float32((skin / 2.0) ** 2)

    class _NL(struct.PyTreeNode):
        blocks: Array      # (n_cells, capacity, 3) wrapped coords
        block_ids: Array   # (n_cells, capacity) atom ids (n = empty)
        slot_of: Array     # (n,) flat slot of each atom
        x_build: Array     # (n, 3) positions at build time

    def build(x: Array) -> _NL:
        n = x.shape[0]
        s = to_fractional(x, h)
        s = s - jnp.floor(s)
        xw = from_fractional(s, h)
        cid = jnp.clip((s * grid_j).astype(jnp.int32), 0,
                       jnp.asarray(n_grid - 1, jnp.int32))
        cid = cid @ jnp.asarray(strides, jnp.int32)
        order = jnp.argsort(cid)
        rank = jnp.searchsorted(cid[order], cid, side="left")
        slot_in_cell = jnp.arange(n) - rank[order]          # by order
        # Overflow -> park in an out-of-range slot; energy() NaNs.
        slot = jnp.where(slot_in_cell < capacity,
                         cid[order] * capacity + slot_in_cell,
                         n_cells * capacity)
        blocks = jnp.full((n_cells * capacity + 1, 3), 2.0 * rc_build,
                          x.dtype).at[slot].set(xw[order])
        ids = jnp.full((n_cells * capacity + 1,), n,
                       jnp.int32).at[slot].set(order.astype(jnp.int32))
        slot_of = jnp.zeros((n,), jnp.int32).at[order].set(
            jnp.minimum(slot, n_cells * capacity).astype(jnp.int32))
        overflow = jnp.any(slot_in_cell >= capacity)
        blocks = jnp.where(overflow, jnp.nan, 1.0) * blocks[:-1]
        return _NL(blocks=blocks.reshape(n_cells, capacity, 3),
                   block_ids=ids[:-1].reshape(n_cells, capacity),
                   slot_of=slot_of, x_build=x)

    def energy(nl: _NL, x: Array) -> Array:
        n = x.shape[0]
        # Current positions placed into the frozen slots (skin
        # contract); drift guard NaNs when an atom outran skin/2.
        s = to_fractional(x, h)
        xw = from_fractional(s - jnp.floor(s), h)
        drift = min_image(x - nl.x_build, h)
        bad = jnp.any(jnp.sum(drift * drift, -1) > drift2_max)
        cur = jnp.full((n_cells * capacity + 1, 3), 2.0 * rc_build,
                       x.dtype).at[nl.slot_of].set(xw)
        cur = cur[:-1].reshape(n_cells, capacity, 3)
        # (n_cells, capacity) vs 27 neighbor blocks -> masked pair grid.
        nb = cur[cell_nb]                  # (n_cells, 27, capacity, 3)
        nb_ids = nl.block_ids[cell_nb]     # (n_cells, 27, capacity)
        d = (cur[:, None, :, None, :] - nb[:, :, None, :, :])
        d = min_image(d, h)
        r2 = jnp.sum(d * d, -1)            # (n_cells, 27, cap, cap)
        ids_i = nl.block_ids[:, None, :, None]
        ids_j = nb_ids[:, :, None, :]
        mask = ((ids_i < n) & (ids_j < n) & (ids_i != ids_j)
                & (r2 < rc2))
        r2s = jnp.where(mask, r2, 1.0)
        s6 = (sig2 / r2s) ** 3
        u = eps4 * (s6 * s6 - s6) - u_cut
        tot = 0.5 * jnp.sum(jnp.where(mask, u, 0.0))
        return jnp.where(bad | jnp.any(jnp.isnan(nl.blocks)),
                         jnp.nan, tot)

    return build, energy


# ---------------------------------------------------------------------
# Anisotropic NPT Monte Carlo
# ---------------------------------------------------------------------

@struct.dataclass
class NPTTriclinicState:
    """Carry of the anisotropic-NPT scan: per-chain coordinates, CELL
    MATRIX (each chain owns a (3, 3) lower-triangular cell), potential
    energy, split displacement/cell acceptance counters, PRNG key."""

    x: Array           # (..., n, 3)
    cell: Array        # (..., 3, 3)
    energy: Array      # (...,)
    disp_trials: Counter
    disp_acc: Counter
    cell_trials: Counter
    cell_acc: Counter
    key: Array

    @property
    def volume(self) -> Array:
        return cell_volume(self.cell)

    @property
    def disp_acceptance_rate(self) -> Array:
        return self.disp_acc.to_float() / self.disp_trials.to_float()

    @property
    def cell_acceptance_rate(self) -> Array:
        return self.cell_acc.to_float() / self.cell_trials.to_float()


def npt_triclinic_init(energy: Callable[[Array, Array], Array],
                       x: Array, cell, key: Array) -> NPTTriclinicState:
    h = jnp.asarray(validate_cell(cell), jnp.float32)
    if x.ndim > 2:
        h = jnp.broadcast_to(h, x.shape[:-2] + (3, 3))
    return NPTTriclinicState(
        x=x, cell=h, energy=energy(x, h),
        disp_trials=Counter.zero(), disp_acc=Counter.zero(),
        cell_trials=Counter.zero(), cell_acc=Counter.zero(), key=key)


def make_npt_triclinic_step(energy: Callable[[Array, Array], Array], *,
                            beta: float, pressure: float,
                            dx_scale: float = 0.1,
                            dh_scale: float = 0.02,
                            min_perp: float = 0.0,
                            max_tilt_frac: float = 0.5,
                            diagonal_only: bool = False
                            ) -> Callable[[NPTTriclinicState],
                                          NPTTriclinicState]:
    """One anisotropic-NPT MC sweep: an all-atom displacement move,
    then a CELL move perturbing one random lower-triangle component of
    H (Gaussian, ``dh_scale`` in length units) with coordinates mapped
    affinely (fixed fractional coords).

    Acceptance of the cell move (Frenkel & Smit ch. 5.4 generalized to
    h-space sampling at fixed s):

        exp(-beta dU - beta P dV + N ln(V'/V))

    The ``N ln(V'/V)`` (not N+1) Jacobian is the convention for
    sampling the cell components LINEARLY (fixed fractional
    coordinates contribute V^N; ln-V sampling would add the +1).
    Moves violating the restricted-triclinic tilt bounds
    (``max_tilt_frac`` of the half-edge rule), a non-positive diagonal,
    or shrinking any perpendicular width below ``min_perp`` (set it to
    2x your cutoff to keep minimum image valid) auto-reject.  Batched:
    every leading-axis chain carries its own cell.
    ``diagonal_only=True`` restricts cell moves to the edge lengths
    (orthorhombic-anisotropic NPT; also the configuration whose
    stationary volume statistics the tests pin against quadrature).
    """
    b = float(beta)
    p = float(pressure)
    n_comp = 3 if diagonal_only else 6

    def step(st: NPTTriclinicState) -> NPTTriclinicState:
        key, k1, k2, k3, k4, k5 = jax.random.split(st.key, 6)
        batch = st.energy.shape
        n = st.x.shape[-2]

        # --- displacement move (all atoms, symmetric Gaussian) ---
        dx = dx_scale * jax.random.normal(k1, st.x.shape, st.x.dtype)
        x_new = st.x + dx
        e_new = energy(x_new, st.cell)
        acc = (log_uniform(k2, batch, st.x.dtype)
               <= -b * (e_new - st.energy))
        x = jnp.where(acc[..., None, None], x_new, st.x)
        e = jnp.where(acc, e_new, st.energy)
        disp_trials = st.disp_trials.add(acc.size)
        disp_acc = st.disp_acc.add(jnp.sum(acc).astype(jnp.int32))

        # --- cell move: one random lower-triangle component of H ---
        comp = jax.random.randint(k3, batch, 0, n_comp)
        tri = jnp.asarray([[0, 0], [1, 1], [2, 2], [1, 0], [2, 0],
                           [2, 1]])
        ij = tri[comp]                               # (..., 2)
        delta = dh_scale * jax.random.normal(k4, batch, st.x.dtype)
        bump = jnp.zeros(batch + (3, 3), st.x.dtype)
        bidx = (jnp.indices(batch, dtype=jnp.int32) if batch
                else ())
        if batch:
            bump = bump.at[(*bidx, ij[..., 0], ij[..., 1])].set(delta)
        else:
            bump = bump.at[ij[..., 0], ij[..., 1]].set(delta)
        h_new = st.cell + bump
        s = to_fractional(x, st.cell)
        x_cand = from_fractional(s, h_new)
        e_cand = energy(x_cand, h_new)
        v_old, v_new = cell_volume(st.cell), cell_volume(h_new)

        diag = jnp.stack([h_new[..., 0, 0], h_new[..., 1, 1],
                          h_new[..., 2, 2]], -1)
        w_new = perpendicular_widths(h_new)
        legal = (jnp.all(diag > 0.0, -1)
                 & (jnp.abs(h_new[..., 1, 0])
                    <= max_tilt_frac * h_new[..., 0, 0])
                 & (jnp.abs(h_new[..., 2, 0])
                    <= max_tilt_frac * h_new[..., 0, 0])
                 & (jnp.abs(h_new[..., 2, 1])
                    <= max_tilt_frac * h_new[..., 1, 1])
                 & jnp.all(w_new > min_perp, -1))
        log_acc = (-b * (e_cand - e) - b * p * (v_new - v_old)
                   + n * jnp.log(jnp.maximum(v_new, _EPS)
                                 / v_old))
        acc_c = legal & (log_uniform(k5, batch, st.x.dtype)
                         <= log_acc)
        x = jnp.where(acc_c[..., None, None], x_cand, x)
        cell_new = jnp.where(acc_c[..., None, None], h_new, st.cell)
        e = jnp.where(acc_c, e_cand, e)
        return NPTTriclinicState(
            x=x, cell=cell_new, energy=e,
            disp_trials=disp_trials, disp_acc=disp_acc,
            cell_trials=st.cell_trials.add(acc_c.size),
            cell_acc=st.cell_acc.add(jnp.sum(acc_c).astype(jnp.int32)),
            key=key)

    return step


def run_npt_triclinic(step_fn, state: NPTTriclinicState, n_steps: int,
                      collect_every: int = 0):
    """Scan ``n_steps`` sweeps; optionally collect (volume, cell)
    every ``collect_every`` sweeps -> (state, traj_dict | None).
    A remainder ``n_steps % collect_every`` still RUNS (after the last
    collection point) so the requested sweep count is always honored."""
    if collect_every:
        outer = n_steps // collect_every

        def chunk(s, _):
            def body(s2, _):
                return step_fn(s2), None

            s, _ = jax.lax.scan(body, s, None, length=collect_every)
            return s, {"volume": s.volume, "cell": s.cell}

        state, traj = jax.lax.scan(chunk, state, None, length=outer)
        rem = n_steps - outer * collect_every
        if rem:
            def body(s, _):
                return step_fn(s), None

            state, _ = jax.lax.scan(body, state, None, length=rem)
        return state, traj

    def body(s, _):
        return step_fn(s), None

    s, _ = jax.lax.scan(body, state, None, length=n_steps)
    return s, None
