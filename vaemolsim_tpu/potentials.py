"""Molecular potential-energy functions — differentiable, batched, jit-safe.

The reference's ``PotentialEnergyLogProbLoss`` and its MC engine take a
user-supplied potential callable but ship none
(/root/reference/vaemolsim/losses.py:69-120 expects ``potential(samples)``
over batched configurations; in practice users bring OpenMM/TF wrappers).
This module provides first-party TPU-native potentials so the full
molecular workflow — Boltzmann-distribution training, gradient-based MC
(MALA/HMC need ``grad U``), and free-energy ladders — runs as one
compiled XLA program with no host callbacks:

- every term is a pure function ``energy(coords) -> (...,)`` over
  ``coords`` of shape ``(..., n_atoms, dim)`` (leading batch axes map
  straight onto chains/devices),
- interaction topology (bond/angle/torsion index lists, exclusion
  masks) is STATIC — fixed shapes, no ragged structures, gathers compile
  to one-hot/dynamic-slice XLA ops,
- the nonbonded term is the dense all-pairs O(N^2) form with masking —
  on TPU a (N, N, dim) broadcast feeding reductions beats scatter-based
  neighbor lists up to thousands of atoms, and it is exact,
- energies are in REDUCED units (kT = 1); :func:`as_log_prob` adapts a
  potential to the MC engine's log-density convention
  (``energy_func`` = log target, mcmc/engine.py).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

__all__ = ["harmonic_bonds", "harmonic_angles", "periodic_torsions",
           "lennard_jones", "lennard_jones_softcore",
           "lennard_jones_cell", "lennard_jones_cell_neighbor",
           "lennard_jones_tail",
           "CellNeighborList", "coulomb", "ewald_coulomb", "pme_coulomb",
           "com_restraint", "composite", "as_log_prob",
           "exclusions_from_bonds", "minimize_energy",
           "morse_bonds", "harmonic_impropers", "buckingham"]


def _squeeze_box(box_arr: Array) -> Array:
    """Canonicalize a (possibly NPT-convention ``(..., 1, 1, 3)``) box
    array to leading-batch ``(..., 3)`` form."""
    squeeze = tuple(i for i in range(box_arr.ndim - 1)
                    if box_arr.shape[i] == 1)
    return jnp.squeeze(box_arr, axis=squeeze)


_EPS = 1e-12  # guards sqrt/atan2 gradients at coincident points


def _norm(d: Array) -> Array:
    return jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), _EPS))


def harmonic_bonds(bonds, k, r0) -> Callable[[Array], Array]:
    """Harmonic bond-stretch term ``sum_b k_b/2 (|r_i - r_j| - r0_b)^2``.

    ``bonds``: (B, 2) static atom-index pairs; ``k``/``r0``: scalars or
    (B,) per-bond constants.  Returns ``energy(coords)`` reducing the
    last two axes of ``(..., n_atoms, dim)`` to ``(...,)``.
    """
    bonds = np.asarray(bonds, np.int32)
    if bonds.ndim != 2 or bonds.shape[1] != 2:
        raise ValueError(f"bonds must be (B, 2); got {bonds.shape}")
    i, j = bonds[:, 0], bonds[:, 1]
    k = jnp.asarray(k, jnp.float32)
    r0 = jnp.asarray(r0, jnp.float32)

    def energy(x: Array) -> Array:
        r = _norm(x[..., i, :] - x[..., j, :])
        return jnp.sum(0.5 * k * (r - r0) ** 2, axis=-1)

    return energy


def harmonic_angles(angles, k, theta0) -> Callable[[Array], Array]:
    """Harmonic angle-bend term ``sum_a k_a/2 (theta - theta0_a)^2`` with
    ``theta`` the i-j-k angle at the center atom j.

    ``angles``: (A, 3) static index triples; ``k``/``theta0`` (radians):
    scalars or (A,).  The angle comes from ``atan2(|u x v|, u . v)``
    (full 3-D cross magnitude), which is gradient-stable at 0 and pi
    where the arccos form's derivative blows up.
    """
    angles = np.asarray(angles, np.int32)
    if angles.ndim != 2 or angles.shape[1] != 3:
        raise ValueError(f"angles must be (A, 3); got {angles.shape}")
    i, j, c = angles[:, 0], angles[:, 1], angles[:, 2]
    k = jnp.asarray(k, jnp.float32)
    theta0 = jnp.asarray(theta0, jnp.float32)

    def energy(x: Array) -> Array:
        u = x[..., i, :] - x[..., j, :]
        v = x[..., c, :] - x[..., j, :]
        cross = jnp.cross(u, v)
        # Dispatch on the COORDINATE dim (3-D cross is a vector, 2-D a
        # scalar) — cross.shape[-1] would misfire when there happen to
        # be exactly 3 angle triples in 2-D.
        sin_t = _norm(cross) if x.shape[-1] == 3 else jnp.abs(cross)
        cos_t = jnp.sum(u * v, axis=-1)
        theta = jnp.arctan2(sin_t, cos_t)
        return jnp.sum(0.5 * k * (theta - theta0) ** 2, axis=-1)

    return energy


def periodic_torsions(torsions, k, n, phase) -> Callable[[Array], Array]:
    """Periodic (cosine) dihedral term
    ``sum_t k_t (1 + cos(n_t phi - phase_t))`` over proper dihedrals
    i-j-k-l (3-D only).  ``phi`` IS ``coords.dihedrals`` — the same
    praxeolitic ``atan2`` dihedral the BAT transform produces, so
    torsion ENERGIES and torsion COORDINATES share one sign convention
    (a phase term would silently flip otherwise).

    ``torsions``: (T, 4) static index quadruples; ``k``/``phase``
    (radians): scalars or (T,); ``n``: integer multiplicities, scalar or
    (T,).
    """
    from vaemolsim_tpu.coords import dihedrals

    torsions = np.asarray(torsions, np.int32)
    if torsions.ndim != 2 or torsions.shape[1] != 4:
        raise ValueError(f"torsions must be (T, 4); got {torsions.shape}")
    k = jnp.asarray(k, jnp.float32)
    n = jnp.asarray(n, jnp.float32)
    phase = jnp.asarray(phase, jnp.float32)

    def energy(x: Array) -> Array:
        phi = dihedrals(x, torsions)
        return jnp.sum(k * (1.0 + jnp.cos(n * phi - phase)), axis=-1)

    return energy


def morse_bonds(bonds, D, a, r0) -> Callable[[Array], Array]:
    """Morse bond-stretch term ``sum_b D_b (1 - e^{-a_b (r - r0_b)})^2``
    — anharmonic bonds with a finite dissociation energy ``D`` (zero at
    ``r0``, ``D`` at infinite separation; curvature at the minimum is
    ``2 D a^2``, so ``k_harmonic = 2 D a^2`` matches a harmonic term).

    ``bonds``: (B, 2) static index pairs; ``D``/``a``/``r0``: scalars
    or (B,).
    """
    bonds = np.asarray(bonds, np.int32)
    if bonds.ndim != 2 or bonds.shape[1] != 2:
        raise ValueError(f"bonds must be (B, 2); got {bonds.shape}")
    i, j = bonds[:, 0], bonds[:, 1]
    D = jnp.asarray(D, jnp.float32)
    a = jnp.asarray(a, jnp.float32)
    r0 = jnp.asarray(r0, jnp.float32)

    def energy(x: Array) -> Array:
        r = _norm(x[..., i, :] - x[..., j, :])
        e = 1.0 - jnp.exp(-a * (r - r0))
        return jnp.sum(D * e * e, axis=-1)

    return energy


def harmonic_impropers(impropers, k, phi0=0.0) -> Callable[[Array], Array]:
    """Harmonic improper-dihedral term
    ``sum_t k_t/2 wrap(phi - phi0_t)^2`` over i-j-k-l quadruples (the
    planarity / chirality restraint form; ``phi`` is the same
    praxeolitic dihedral as :func:`periodic_torsions` and
    ``coords.dihedrals``).  The deviation is wrapped to (-pi, pi] so
    ``phi0 = pi`` restraints do not see a seam discontinuity.
    """
    from vaemolsim_tpu.coords import dihedrals

    impropers = np.asarray(impropers, np.int32)
    if impropers.ndim != 2 or impropers.shape[1] != 4:
        raise ValueError(
            f"impropers must be (T, 4); got {impropers.shape}")
    k = jnp.asarray(k, jnp.float32)
    phi0 = jnp.asarray(phi0, jnp.float32)

    def energy(x: Array) -> Array:
        phi = dihedrals(x, impropers)
        d = phi - phi0
        d = d - 2.0 * jnp.pi * jnp.round(d / (2.0 * jnp.pi))
        return jnp.sum(0.5 * k * d * d, axis=-1)

    return energy


def buckingham(A=1.0, rho=0.1, C=1.0, *, box=None, cutoff=None,
               exclusions=None, r_core=0.4) -> Callable[[Array], Array]:
    """Buckingham (exp-6) pair potential
    ``sum_{i<j} A e^{-r/rho} - C / r^6`` — the classic ionic/oxide
    form (Born-Mayer repulsion + dispersion).

    Same conventions as :func:`lennard_jones`: dense all pairs,
    optional orthorhombic minimum image ``box``, ``cutoff`` with energy
    shift, static bool ``exclusions``.  The exp-6 form turns over and
    diverges to -inf at small r (the well-known Buckingham
    catastrophe): below ``r_core`` the energy continues LINEARLY (value
    and slope matched), so minimization/MD from overlaps stays finite
    — the same float32-safe core device as the LJ term.
    """

    def energy(x: Array) -> Array:
        n = x.shape[-2]
        d = x[..., :, None, :] - x[..., None, :, :]
        if box is not None:
            b = jnp.asarray(box, x.dtype)
            d = d - b * jnp.round(d / b)
        r2 = jnp.sum(d * d, axis=-1) + jnp.eye(n, dtype=x.dtype)
        r = jnp.sqrt(r2)

        def pair_u(rr):
            return A * jnp.exp(-rr / rho) - C / rr ** 6

        # linear continuation below r_core (value+slope matched)
        u_core = pair_u(r_core)
        g_core = (-A / rho * jnp.exp(-r_core / rho)
                  + 6.0 * C / r_core ** 7)
        r_safe = jnp.maximum(r, r_core)
        u = jnp.where(r < r_core,
                      u_core + g_core * (r - r_core), pair_u(r_safe))
        if cutoff is not None:
            u = jnp.where(r_safe < cutoff, u - pair_u(cutoff), 0.0)
        mask = jnp.triu(jnp.ones((n, n), bool), 1)
        if exclusions is not None:
            mask = mask & ~jnp.asarray(exclusions, bool)
        return jnp.sum(jnp.where(mask, u, 0.0), axis=(-1, -2))

    return energy


def exclusions_from_bonds(n_atoms: int, bonds,
                          through_angles: bool = True) -> np.ndarray:
    """Static (n_atoms, n_atoms) bool mask of nonbonded EXCLUSIONS: 1-2
    pairs (bonded) and, with ``through_angles``, 1-3 pairs (two bonds
    apart) — the conventional molecular-mechanics exclusion rule.
    Feed to :func:`lennard_jones`'s ``exclude``."""
    adj = np.zeros((n_atoms, n_atoms), bool)
    for a, b in np.asarray(bonds, np.int64):
        adj[a, b] = adj[b, a] = True
    excl = adj.copy()
    if through_angles:
        two = (adj.astype(np.int32) @ adj.astype(np.int32)) > 0
        excl |= two
    np.fill_diagonal(excl, True)
    return excl


def _exclude_matrix(exclude, n: int) -> np.ndarray:
    """Normalize an ``exclude`` argument — an ``(n, n)`` bool matrix
    (:func:`exclusions_from_bonds`) or an ``(E, 2)`` integer pair
    list — to a validated symmetric ``(n, n)`` bool matrix.  Every
    dense potential's ``exclude`` accepts both forms through this
    (the cell-list path parses the same two forms natively)."""
    ex = np.asarray(exclude)
    if ex.dtype == bool:
        if ex.ndim != 2 or ex.shape[0] != ex.shape[1]:
            raise ValueError(f"bool exclude must be a square (n, n) "
                             f"matrix; got {ex.shape}")
        if ex.shape[0] != n:
            raise ValueError(f"exclude matrix is {ex.shape[0]}x"
                             f"{ex.shape[0]} but the system has {n} "
                             f"atoms")
        if not (ex == ex.T).all():
            raise ValueError("exclude matrix must be symmetric")
        return ex
    pr = ex.astype(np.int64).reshape(-1, 2)
    if (pr[:, 0] == pr[:, 1]).any():
        raise ValueError("exclude pair list contains self pairs")
    if pr.size and (pr.min() < 0 or pr.max() >= n):
        raise ValueError(f"exclude references atom {pr.max()} but the "
                         f"system has {n} atoms")
    m = np.zeros((n, n), bool)
    m[pr[:, 0], pr[:, 1]] = True
    m[pr[:, 1], pr[:, 0]] = True
    return m


def lennard_jones(sigma=1.0, epsilon=1.0, *,
                  exclude: Optional[np.ndarray] = None,
                  box: Optional[Sequence[float]] = None,
                  cutoff: Optional[float] = None,
                  shift: bool = True) -> Callable[[Array], Array]:
    """Lennard-Jones 12-6 nonbonded term
    ``sum_{i<j} 4 eps_ij [ (sig_ij/r)^12 - (sig_ij/r)^6 ]``.

    Dense all-pairs with a static mask (upper triangle minus
    ``exclude``) — the TPU-native form: one broadcast difference tensor
    and two reductions, no scatter.  ``sigma``/``epsilon``: scalars,
    (n,) per-atom (combined by Lorentz-Berthelot: arithmetic sigma,
    geometric epsilon), or (n, n) per-pair matrices.  ``box``: periodic
    box lengths per dimension — minimum-image convention (same wrapping
    rule as nn.mappings' DistanceSelection).  ``cutoff``: truncation
    radius; with ``shift`` the potential is shifted to 0 at the cutoff
    (continuous energies — the form HMC/MALA need; set ``shift=False``
    for bare truncation).  The pair mask is data-INdependent, so the
    compiled program has fixed shapes regardless of configuration.

    Below ``r = 0.3 sigma_ij`` the r^-12 wall is continued LINEARLY
    (value- and slope-matched): that region is Boltzmann-impossible
    (U > 2e6 eps) so sampling is unaffected, but bare r^-12 gradients
    overflow float32 near r ~ 1e-3 sigma and strand overlapped chains
    in :func:`minimize_energy` with inf/NaN forces; the linear core
    keeps a finite, strongly repulsive force everywhere.
    """
    sigma = jnp.asarray(sigma, jnp.float32)
    epsilon = jnp.asarray(epsilon, jnp.float32)
    if sigma.ndim == 1:
        sigma = 0.5 * (sigma[:, None] + sigma[None, :])
    if epsilon.ndim == 1:
        epsilon = jnp.sqrt(epsilon[:, None] * epsilon[None, :])
    box_arr = None if box is None else jnp.asarray(box, jnp.float32)

    def energy(x: Array) -> Array:
        n = x.shape[-2]
        pair_mask = np.triu(np.ones((n, n), bool), k=1)
        if exclude is not None:
            pair_mask &= ~_exclude_matrix(exclude, n)
        mask = jnp.asarray(pair_mask)

        d = x[..., :, None, :] - x[..., None, :, :]
        if box_arr is not None:
            d = d - box_arr * jnp.round(d / box_arr)
        r2 = jnp.sum(d * d, axis=-1)
        if cutoff is not None:
            mask = mask & (r2 < cutoff * cutoff)
        # Masked-out pairs get r2 = 1 so the powers stay finite (their
        # energy is zeroed below; NaN would still poison gradients).
        r2 = jnp.where(mask, r2, 1.0)
        # Floor before sqrt: at EXACT coincidence the max() picks its
        # constant branch, so the force is 0 (symmetric) instead of NaN.
        r = jnp.sqrt(jnp.maximum(r2, _EPS))
        rc = 0.3 * sigma                      # linear-core switch radius
        r_eff = jnp.maximum(r, rc)
        sr6 = (sigma / r_eff) ** 6
        u = 4.0 * epsilon * (sr6 * sr6 - sr6)
        # Value/slope-matched linear continuation inside the core.
        src6 = (sigma / rc) ** 6
        slope = 24.0 * epsilon / rc * (src6 - 2.0 * src6 * src6)
        u = u + jnp.where(r < rc, slope * (r - rc), 0.0)
        if cutoff is not None and shift:
            sc6 = (sigma / cutoff) ** 6
            u = u - 4.0 * epsilon * (sc6 * sc6 - sc6)
        return jnp.sum(jnp.where(mask, u, 0.0), axis=(-2, -1))

    return energy


def _nl_zero_cotangent(nl):
    """Zero/float0 cotangents for the (non-differentiable) neighbor
    list, leaf-by-leaf, as custom_vjp requires."""
    return jax.tree_util.tree_map(
        lambda a: (np.zeros(a.shape, jax.dtypes.float0)
                   if not jnp.issubdtype(a.dtype, jnp.floating)
                   else jnp.zeros_like(a)), nl)


class CellNeighborList(NamedTuple):
    """Frozen candidate structure from a cell-list ``build`` function.

    Valid for energy/force evaluation while no atom has moved more
    than ``skin/2`` from ``x_ref`` (the standard Verlet-list
    criterion); violations make the energy NaN (loud).  A plain
    pytree of fixed-shape arrays — jit/scan/vmap/shard like any other
    state."""

    x_ref: Array       # (n, 3) wrapped build-time positions
    cell_atoms: Array  # (n_cells, capacity) atom ids (n = empty slot)
    nb_cid: Array      # (n, 27) per-atom cell ids (xla; empty on pallas)
    mask: Array        # (n, 27*capacity) valid & not-self (xla; empty
    #                    on pallas builds — the kernel recomputes masks)
    overflow: Array    # () bool — some cell exceeded capacity
    atom_slot: Array   # (n,) flat cell*capacity+slot per atom (pallas)


def lennard_jones_cell_neighbor(
        sigma: float = 1.0, epsilon: float = 1.0, *,
        box: Sequence[float], cutoff: float, skin: float = 0.4,
        capacity: int = 24, shift: bool = True,
        backend: str = "xla", interpret: bool = False,
        mesh=None, mesh_axis: str = "cells",
        charges=None, coulomb_alpha: Optional[float] = None,
        exclude: Optional[np.ndarray] = None
        ) -> Tuple[Callable[[Array], CellNeighborList],
                   Callable[[CellNeighborList, Array], Array]]:
    """Cell-list Lennard-Jones with an explicit, reusable neighbor
    list: returns ``(build, energy)`` where ``build(x)`` makes a
    :class:`CellNeighborList` from the cell grid at edge >=
    ``cutoff + skin`` and ``energy(nl, x)`` evaluates the same
    truncated-shifted LJ as :func:`lennard_jones` against the frozen
    candidate set.

    The skin buys REUSE: candidates within ``cutoff + skin`` at build
    time cover every pair within ``cutoff`` until some atom moves more
    than ``skin/2`` — so MD/MC can rebuild every k steps instead of
    every force call (``md.velocity_verlet_neighbor`` /
    ``md.baoab_neighbor`` do exactly that), amortizing the sort.
    ``energy`` returns NaN when the drift bound is violated or a cell
    overflowed ``capacity`` — loud, never silently wrong.

    Single-system shapes ``(n_atoms, 3)`` (vmap both functions for
    replicas).  ``sigma``/``epsilon``: scalars or per-atom (n,) arrays
    (Lorentz-Berthelot mixing — multi-species fluids; (n, n) pair
    matrices need the dense form).  Forces come from an analytic
    ``custom_vjp`` on ``energy`` (first-order reverse-mode only; see
    :func:`lennard_jones_cell`).

    ``backend="pallas"`` routes energy+force through the fused VMEM
    kernel in :mod:`vaemolsim_tpu.ops.cell_lj_pallas` — measured 5.5x
    faster than the XLA path in real MD chains on TPU v5e (the pair
    tensors never touch HBM); energies/forces agree with the XLA path
    to float32 summation order.  The kernel computes the force even
    for energy-only evaluations (one fused pass); ``interpret=True``
    runs it in Pallas interpret mode for CPU tests.

    **Multi-chip MD for ONE large system**: pass a
    ``jax.sharding.Mesh`` (with the axis named ``mesh_axis``) and the
    pallas kernel's cell grid is partitioned over devices via
    ``shard_map`` — positions replicate (tiny: N*12 bytes), each device
    computes its slab of cells' pair blocks with ZERO collectives
    inside, and the only cross-device traffic is the final energy
    reduction and force gather XLA inserts.  Cells pad to a multiple of
    the axis size (padded cells carry only empty slots, contributing
    nothing).  This is the TPU-native alternative to halo-exchange
    domain decomposition for the N <= millions regime where replicated
    positions fit trivially in HBM.

    **Large-N exact electrostatics**: pass per-atom ``charges`` and the
    Ewald screening parameter ``coulomb_alpha`` to add the Ewald
    REAL-SPACE term ``q_i q_j erfc(alpha r)/r`` to every pair within
    the cutoff (both backends, analytic forces).  Pair it with
    ``ewald_coulomb(..., include_real_space=False,
    alpha=<same>, r_cutoff=<same cutoff>)`` for the reciprocal/self/
    background parts: the composite is the exact Ewald sum at
    O(N*capacity) + O(N*n_k) instead of dense O(N^2) (split-exactness
    pinned by test).  No core softening on the Coulomb term (the LJ
    core prevents opposite-charge collapse).

    **Bonded exclusions**: ``exclude`` takes an ``(n, n)`` bool matrix
    (:func:`exclusions_from_bonds`) or an ``(E, 2)`` pair list; the
    listed pairs are masked OUT of the pair sum itself on both backends
    (a per-atom partner table of width D = max exclusion degree, D
    static integer compares per candidate).  Masking inside — rather
    than subtracting a correction term after — is load-bearing at
    float32: a bonded pair sits deep in the LJ core where the wall is
    ~1e7-1e8, so a subtracted correction would cancel against a total
    whose ulp exceeds the entire remaining physics (the dense
    ``lennard_jones(exclude=...)`` masks for the same reason, and so
    does every production MD engine).  ``energy.stress`` inherits the
    mask automatically.  For the reciprocal side, pass the SAME
    exclusions to ``ewald_coulomb``/``pme_coulomb`` — their ``exclude``
    handles the ``-q_i q_j erf(alpha r)/r`` reciprocal-space
    correction, while this mask removes the real-space erfc term.
    ``heat_flux`` refuses exclusions (Irving-Kirkwood for bonded
    systems needs the bonded-force pair terms this potential does not
    see).

    **Pressure tensor**: ``energy.stress(nl, x)`` returns the full
    ``(dim, dim)`` configurational virial tensor (shear components
    included) from the same analytic per-pair derivatives — the
    large-N stress source for
    :func:`~vaemolsim_tpu.observables.green_kubo_viscosity` and
    NPT-style pressure control where the dilation-``jvp``
    :func:`~vaemolsim_tpu.observables.virial_pressure` cannot reach
    (this path has no forward-mode AD).
    """
    if backend not in ("xla", "pallas"):
        raise ValueError(f"backend must be 'xla' or 'pallas'; "
                         f"got {backend!r}")
    if mesh is not None and backend != "pallas":
        raise ValueError("mesh sharding of the cell grid requires "
                         "backend='pallas'")
    rc_build = float(cutoff) + float(skin)
    if skin < 0:
        raise ValueError(f"skin must be >= 0; got {skin}")
    box_np = np.asarray(box, np.float64)
    n_grid = np.maximum(np.floor(box_np / rc_build).astype(np.int64), 1)
    if (n_grid < 3).any():
        raise ValueError(
            f"box {box_np.tolist()} fits {n_grid.tolist()} cells of edge "
            f">= cutoff+skin {rc_build}; need >= 3 per dimension (use the "
            "dense lennard_jones for small boxes)")
    cell_size = box_np / n_grid
    n_cells = int(n_grid.prod())
    strides = np.array([n_grid[1] * n_grid[2], n_grid[2], 1], np.int64)
    # 27 neighbor-cell offsets.
    offs = np.stack(np.meshgrid(*[[-1, 0, 1]] * 3, indexing="ij"),
                    -1).reshape(-1, 3)
    # Static CELL-level neighbor table (the pallas backend evaluates
    # pairs cell-against-neighbor-cell; min-image happens in-kernel).
    g3 = np.stack(np.unravel_index(np.arange(n_cells), n_grid), -1)
    raw = g3[:, None, :] + offs[None, :, :]          # (n_cells, 27, 3)
    cell_nb_np = ((raw % n_grid) @ strides).astype(np.int32)
    # Mesh sharding pads the cell grid to a device-divisible count;
    # padded cells hold only empty slots (ids = n) and reference cell 0
    # as neighbors — fully masked, zero contribution.
    if mesh is not None:
        n_shards = int(mesh.shape[mesh_axis])
        n_cells_p = -(-n_cells // n_shards) * n_shards
        cell_nb_np = np.concatenate(
            [cell_nb_np,
             np.zeros((n_cells_p - n_cells, 27), np.int32)])
    else:
        n_cells_p = n_cells
    pad_cells = n_cells_p - n_cells
    box_j = jnp.asarray(box_np, jnp.float32)
    rc2 = jnp.float32(cutoff * cutoff)
    drift2_max = jnp.float32((skin / 2.0) ** 2)

    # Scalar or per-atom (n,) sigma/epsilon (Lorentz-Berthelot mixing:
    # arithmetic sigma, geometric epsilon — the latter as a product of
    # per-atom sqrt(eps), so mixing costs no per-pair transcendental).
    sigma_np = np.asarray(sigma, np.float64)
    epsilon_np = np.asarray(epsilon, np.float64)
    if sigma_np.ndim > 1 or epsilon_np.ndim > 1:
        raise ValueError(
            "cell-list LJ supports scalar or per-atom (n,) sigma/epsilon"
            " (Lorentz-Berthelot); use the dense lennard_jones for"
            " (n, n) pair matrices")
    per_atom = sigma_np.ndim == 1 or epsilon_np.ndim == 1
    if per_atom:
        n_spec = max(sigma_np.size if sigma_np.ndim else 1,
                     epsilon_np.size if epsilon_np.ndim else 1)
        sig_at = jnp.asarray(np.broadcast_to(sigma_np, (n_spec,)),
                             jnp.float32)
        seps_at = jnp.asarray(
            np.sqrt(np.broadcast_to(epsilon_np, (n_spec,))), jnp.float32)
        sigma = epsilon = None
    else:
        n_spec = None
        sigma = float(sigma_np)
        epsilon = float(epsilon_np)

    # Linear-core constants: rcore = 0.3 sigma_ij makes
    # src6 = (sigma/rcore)^6 a pure number, so the per-pair slope is
    # just _SLOPE_F * eps_ij / sigma_ij.
    _SRC6 = (1.0 / 0.3) ** 6
    _SLOPE_F = 24.0 / 0.3 * (_SRC6 - 2.0 * _SRC6 * _SRC6)

    if charges is not None:
        q_np = np.asarray(charges, np.float64)
        if q_np.ndim != 1:
            raise ValueError(f"charges must be (n,); got {q_np.shape}")
        if coulomb_alpha is None:
            raise ValueError(
                "charges need coulomb_alpha — use the SAME alpha as the "
                "reciprocal part (ewald_coulomb(...).ewald_alpha)")
        if per_atom and q_np.size != n_spec:
            raise ValueError(f"charges has {q_np.size} atoms but "
                             f"sigma/epsilon has {n_spec}")
        q_at = jnp.asarray(q_np, jnp.float32)
        c_alpha = float(coulomb_alpha)
        _TWO_OPI = 2.0 / float(np.sqrt(np.pi))
    else:
        q_at = None

    # ---- bonded exclusions: per-atom partner table, masked in-sum ----
    if exclude is not None:
        ex_np = np.asarray(exclude)
        if ex_np.dtype == bool:
            if ex_np.ndim != 2 or ex_np.shape[0] != ex_np.shape[1]:
                raise ValueError(f"bool exclude must be a square "
                                 f"(n, n) matrix; got {ex_np.shape}")
            if not (ex_np == ex_np.T).all():
                raise ValueError("exclude matrix must be symmetric")
            ex_i, ex_j = np.nonzero(np.triu(ex_np, k=1))
        else:
            pr = ex_np.astype(np.int64).reshape(-1, 2)
            lo = np.minimum(pr[:, 0], pr[:, 1])
            hi = np.maximum(pr[:, 0], pr[:, 1])
            if (lo == hi).any():
                raise ValueError("exclude pair list contains self pairs")
            if lo.size and lo.min() < 0:
                raise ValueError("exclude pair indices must be >= 0")
            pairs = np.unique(np.stack([lo, hi], 1), axis=0)
            ex_i, ex_j = pairs[:, 0], pairs[:, 1]
        ex_max = int(max(ex_i.max(), ex_j.max())) if ex_i.size else -1
        if n_spec is not None and ex_max >= n_spec:
            raise ValueError(f"exclude references atom {ex_max} but "
                             f"per-atom sigma/epsilon has {n_spec}")
        if q_at is not None and ex_max >= q_at.shape[0]:
            raise ValueError(f"exclude references atom {ex_max} but "
                             f"charges has {q_at.shape[0]}")
        if ex_i.size == 0:
            exclude = None
    if exclude is not None:
        # (ex_max+1, D) partner table padded with -1 (never a valid
        # candidate id): row a lists every atom excluded against a.
        deg = np.zeros(ex_max + 1, np.int64)
        np.add.at(deg, ex_i, 1)
        np.add.at(deg, ex_j, 1)
        ex_deg = int(deg.max())
        excl_tab0 = np.full((ex_max + 1, ex_deg), -1, np.int32)
        fill = np.zeros(ex_max + 1, np.int64)
        for a, b in zip(ex_i.tolist(), ex_j.tolist()):
            excl_tab0[a, fill[a]] = b
            fill[a] += 1
            excl_tab0[b, fill[b]] = a
            fill[b] += 1
    else:
        ex_max, ex_deg, excl_tab0 = -1, 0, None

    def _excl_tab(n):
        """(n, D) excluded-partner ids for an n-atom call (static n)."""
        if n <= ex_max:
            raise ValueError(f"exclude references atom {ex_max} but "
                             f"coords have {n} atoms")
        if n == excl_tab0.shape[0]:
            return jnp.asarray(excl_tab0)
        pad = np.full((n - excl_tab0.shape[0], ex_deg), -1, np.int32)
        return jnp.asarray(np.concatenate([excl_tab0, pad]))

    def _excl_mask(cand, n):
        """candidates-to-drop mask: cand (n, K) atom ids vs the partner
        table — D static compares, no rank-3 intermediate."""
        tab = _excl_tab(n)
        hit = jnp.zeros(cand.shape, bool)
        for k in range(ex_deg):
            hit = hit | (cand == tab[:, k:k + 1])
        return hit

    def _with_exclusions(energy_fn):
        """Attach the heat-flux refusal when exclusions are active (the
        energy/force/stress paths handle exclusions via the candidate
        mask and need no wrapping)."""
        if exclude is None:
            return energy_fn

        def heat_flux_ex(*a, **k):
            raise NotImplementedError(
                "heat_flux with bonded exclusions is not supported: the "
                "Irving-Kirkwood pair form needs ALL interatomic forces "
                "(including the bonded terms that motivate exclusions), "
                "which this nonbonded potential does not see")

        energy_fn.heat_flux = heat_flux_ex
        return energy_fn

    def _pair_qq(nl, n):
        """Per-pair charge products in the XLA candidate layout."""
        nb_cid, _ = _nb_cid_mask(nl, n)
        cells = jnp.clip(nl.cell_atoms, 0, n - 1)
        return q_at[:, None] * q_at[cells][nb_cid].reshape(n, -1)

    def _pair_params(nl, n):
        """Per-pair (sigma_ij, eps_ij) in the XLA candidate layout, or
        the scalar constants (broadcasting makes one math path serve
        both).  Per-atom values ride the same two-stage gather as
        positions."""
        if not per_atom:
            return sigma, epsilon
        nb_cid, _ = _nb_cid_mask(nl, n)
        cells = jnp.clip(nl.cell_atoms, 0, n - 1)
        sig_cand = sig_at[cells][nb_cid].reshape(n, -1)
        se_cand = seps_at[cells][nb_cid].reshape(n, -1)
        return (0.5 * (sig_at[:, None] + sig_cand),
                seps_at[:, None] * se_cand)

    def _check_n(n):
        if per_atom and n != n_spec:
            raise ValueError(f"coords have {n} atoms but per-atom "
                             f"sigma/epsilon has {n_spec}")
        if q_at is not None and n != q_at.shape[0]:
            raise ValueError(f"coords have {n} atoms but charges has "
                             f"{q_at.shape[0]}")
        if ex_max >= n:
            raise ValueError(f"exclude references atom {ex_max} but "
                             f"coords have {n} atoms")

    def _wrap(x):
        return x - box_j * jnp.floor(x / box_j)

    def build(x: Array) -> CellNeighborList:
        """Sort atoms into cells, pad each cell to ``capacity``, and
        record the 27 neighbor-cell ids per atom."""
        x = jnp.asarray(x)
        n = x.shape[0]
        xw = _wrap(x)
        c3 = jnp.clip((xw / jnp.asarray(cell_size, x.dtype)).astype(
            jnp.int32), 0, jnp.asarray(n_grid - 1, jnp.int32))
        cid = c3 @ jnp.asarray(strides, jnp.int32)       # (N,)
        order = jnp.argsort(cid)
        cid_sorted = cid[order]
        grid = jnp.arange(n_cells, dtype=cid.dtype)
        start = jnp.searchsorted(cid_sorted, grid, side="left")
        count = jnp.searchsorted(cid_sorted, grid, side="right") - start
        overflow = jnp.max(count) > capacity

        slot = start[:, None] + jnp.arange(capacity)[None, :]
        valid = jnp.arange(capacity)[None, :] < count[:, None]
        cell_atoms = jnp.where(valid, order[jnp.clip(slot, 0, n - 1)], n)
        if pad_cells:
            cell_atoms = jnp.concatenate(
                [cell_atoms,
                 jnp.full((pad_cells, capacity), n, cell_atoms.dtype)])

        if backend == "pallas":
            # The kernel path reads only cell_atoms/x_ref/overflow/
            # atom_slot: skip the per-atom candidate gather and the
            # (n, 27*capacity) mask (~10 MB at N=8192) that only the
            # XLA energy consumes.
            nb_cid = jnp.zeros((0,), jnp.int32)
            mask = jnp.zeros((0,), bool)
        else:
            # Neighbor cell ids per atom: (N, 27).
            nb3 = (c3[:, None, :] + jnp.asarray(offs, jnp.int32)[None]) \
                % jnp.asarray(n_grid, jnp.int32)
            nb_cid = nb3 @ jnp.asarray(strides, jnp.int32)
            cand = cell_atoms[nb_cid].reshape(n, 27 * capacity)
            mask = (cand < n) & (cand != jnp.arange(n)[:, None])
            if exclude is not None:
                mask = mask & ~_excl_mask(cand, n)
        # Atom -> flat (cell*capacity + slot), in atom order: maps the
        # kernel's cell-layout forces back with one row gather.
        slot_sorted = jnp.arange(n, dtype=jnp.int32) - start[cid_sorted]
        flat_sorted = cid_sorted * capacity + slot_sorted
        atom_slot = jnp.zeros((n,), jnp.int32).at[order].set(flat_sorted)
        return CellNeighborList(x_ref=xw, cell_atoms=cell_atoms,
                                nb_cid=nb_cid, mask=mask,
                                overflow=overflow, atom_slot=atom_slot)

    def _nb_cid_mask(nl: CellNeighborList, n):
        """Per-atom neighbor-cell ids and candidate masks: stored on
        XLA builds; recomputed from the frozen ``x_ref`` binning on
        pallas builds (which skip them to stay lean — only the
        occasional ``stress`` evaluation pays the recompute)."""
        if nl.nb_cid.size:
            return nl.nb_cid, nl.mask
        c3 = jnp.clip((nl.x_ref / jnp.asarray(
            cell_size, nl.x_ref.dtype)).astype(jnp.int32), 0,
            jnp.asarray(n_grid - 1, jnp.int32))
        nb3 = (c3[:, None, :] + jnp.asarray(offs, jnp.int32)[None]) \
            % jnp.asarray(n_grid, jnp.int32)
        nb_cid = nb3 @ jnp.asarray(strides, jnp.int32)
        cand = nl.cell_atoms[nb_cid].reshape(n, 27 * capacity)
        mask = (cand < n) & (cand != jnp.arange(n)[:, None])
        if exclude is not None:
            mask = mask & ~_excl_mask(cand, n)
        return nb_cid, mask

    def _pairs(nl: CellNeighborList, xw):
        """Min-image displacements/distances from CURRENT positions to
        each frozen candidate, cutoff folded into the mask (masked
        pairs get r = 1).

        Candidate positions come from a TWO-STAGE gather — atoms into
        per-cell blocks (n_cells*capacity rows), then whole (capacity,
        3) blocks per neighbor cell — because a flat per-candidate row
        gather moves 12-byte rows and runs ~180x slower on TPU
        (measured 37.8 ms vs 0.03 ms at N=8192, capacity=64)."""
        n = xw.shape[0]
        nb_cid, nb_mask = _nb_cid_mask(nl, n)
        cell_x = xw[jnp.clip(nl.cell_atoms, 0, n - 1)]   # (n_cells, C, 3)
        xc = cell_x[nb_cid].reshape(n, -1, 3)            # (N, K, 3)
        d = xw[:, None, :] - xc
        d = d - box_j * jnp.round(d / box_j)
        r2 = jnp.sum(d * d, axis=-1)
        mask = nb_mask & (r2 < rc2)
        r = jnp.sqrt(jnp.maximum(jnp.where(mask, r2, 1.0), _EPS))
        return d, r, mask

    def _invalid(nl: CellNeighborList, xw):
        """Capacity overflow at build, or some atom drifted past skin/2
        since build.  The strict ``>`` keeps the check live at skin=0
        too (any motion invalidates a zero-skin list — reusing one
        silently would break the loud-failure contract), while the
        fused build-per-call path passes bitwise-exactly (drift 0)."""
        d = xw - nl.x_ref
        d = d - box_j * jnp.round(d / box_j)
        return nl.overflow | (jnp.max(jnp.sum(d * d, -1)) > drift2_max)

    def _pair_u_of(nl, r, n):
        """Per-candidate pair energy u(r) (unmasked) — shared by the
        total energy and the per-atom energies of the heat flux."""
        sig_p, eps_p = _pair_params(nl, n)
        rcore_p = 0.3 * sig_p
        slope_p = _SLOPE_F * eps_p / sig_p
        r_eff = jnp.maximum(r, rcore_p)
        sr6 = (sig_p / r_eff) ** 6
        u = 4.0 * eps_p * (sr6 * sr6 - sr6)
        u = u + jnp.where(r < rcore_p, slope_p * (r - rcore_p), 0.0)
        if shift:
            sc6 = (sig_p / cutoff) ** 6
            u = u - 4.0 * eps_p * (sc6 * sc6 - sc6)
        if q_at is not None:
            from jax.scipy.special import erfc
            u = u + _pair_qq(nl, n) * erfc(c_alpha * r) / r
        return u

    def _energy_impl(nl, x):
        x = jnp.asarray(x)
        _check_n(x.shape[0])
        xw = _wrap(x)
        _, r, mask = _pairs(nl, xw)
        u = _pair_u_of(nl, r, xw.shape[0])
        # Each pair appears from both sides: halve.
        e = 0.5 * jnp.sum(jnp.where(mask, u, 0.0))
        return jnp.where(_invalid(nl, xw), jnp.nan, e), xw

    # Analytic reverse rule: AD through the gather graph would turn the
    # force into one giant scatter-add over N*27*capacity contributions
    # (measured ~100x slower than the forward on TPU); the row-local
    # pair force dE/dx_i = sum_j u'(r_ij) d_ij / r_ij needs only the
    # SAME gathers as the energy (each pair's two half-contributions
    # land in its two rows).  First-order reverse-mode only — the MD/
    # MALA/HMC force path; forward-mode AD (jvp) is unsupported here,
    # so use the dense form for virial_pressure-style dilations.
    @jax.custom_vjp
    def energy(nl: CellNeighborList, x: Array) -> Array:
        return _energy_impl(nl, x)[0]

    def _energy_fwd(nl, x):
        e, xw = _energy_impl(nl, x)
        return e, (nl, xw)

    def _pair_dudr(nl, xw):
        """Per-candidate ``(d, r, mask, du/dr)`` — the shared analytic
        core of the force rule and the stress tensor."""
        d, r, mask = _pairs(nl, xw)
        sig_p, eps_p = _pair_params(nl, xw.shape[0])
        rcore_p = 0.3 * sig_p
        slope_p = _SLOPE_F * eps_p / sig_p
        sr6 = (sig_p / r) ** 6
        dudr = 24.0 * eps_p / r * (sr6 - 2.0 * sr6 * sr6)
        dudr = jnp.where(r < rcore_p, slope_p, dudr)
        if q_at is not None:
            from jax.scipy.special import erfc
            qq = _pair_qq(nl, xw.shape[0])
            dudr = dudr - qq * (erfc(c_alpha * r) / (r * r)
                                + _TWO_OPI * c_alpha
                                * jnp.exp(-(c_alpha * r) ** 2) / r)
        return d, r, mask, jnp.where(mask, dudr, 0.0)

    def _energy_bwd(res, ct):
        nl, xw = res
        d, r, _, dudr = _pair_dudr(nl, xw)
        grad = jnp.sum((dudr / r)[..., None] * d, axis=1)
        grad = jnp.where(_invalid(nl, xw), jnp.nan, ct) * grad
        return (_nl_zero_cotangent(nl), grad)

    energy.defvjp(_energy_fwd, _energy_bwd)

    vol_f = float(box_np.prod())

    def stress(nl: CellNeighborList, x: Array) -> Array:
        """CONFIGURATIONAL pressure tensor of this potential,

            ``P^conf_ab = -(1/2V) sum_{i != j} (du/dr_ij) d_a d_b / r``

        — the full pair virial including shear components, from the
        SAME analytic per-pair derivative as the force rule (same
        gathers, one extra outer-product contraction; works on both
        backends and honors the drift/overflow NaN contract).  Add
        :func:`vaemolsim_tpu.observables.kinetic_stress` for the total
        instantaneous tensor; ``trace(P^conf)/dim`` equals the
        configurational part of
        :func:`~vaemolsim_tpu.observables.virial_pressure` (pinned by
        test).  Returns ``(dim, dim)``; evaluate every sample interval
        (it costs about one force call), feed the series to
        :func:`~vaemolsim_tpu.observables.green_kubo_viscosity`."""
        x = jnp.asarray(x)
        _check_n(x.shape[0])
        xw = _wrap(x)
        d, r, _, dudr = _pair_dudr(nl, xw)
        w = dudr / r
        sig = -0.5 * jnp.einsum("nk,nka,nkb->ab", w, d, d) / vol_f
        return jnp.where(_invalid(nl, xw), jnp.nan, sig)

    energy.stress = stress

    def heat_flux(nl: CellNeighborList, x: Array, v: Array,
                  masses=1.0) -> Array:
        """Microscopic energy (heat) flux of this potential,

            ``J V = sum_i e_i v_i
                    + (1/2) sum_{i<j} (f_ij . (v_i + v_j)) d_ij``,

        the Irving-Kirkwood pair form (LAMMPS ``compute heat/flux``
        convention) with per-atom energies
        ``e_i = m_i v_i^2 / 2 + (1/2) sum_j u(r_ij)`` and
        ``f_ij = -(du/dr) d_ij / r`` — the same analytic per-pair
        derivative and gathers as the force rule, plus one
        candidate-layout velocity gather.  Works on both backends and
        honors the drift/overflow NaN contract.  Returns the intensive
        flux ``J`` of shape ``(dim,)``.

        This is the ENERGY flux: it equals the heat flux (the input to
        :func:`~vaemolsim_tpu.observables.green_kubo_thermal_conductivity`)
        for a one-component fluid with zero total momentum — remove the
        center-of-mass drift from ``v`` first; multi-species fluids
        additionally need the partial-enthalpy subtraction this
        function does not perform.  Evaluate on NVE dynamics every
        sample interval (costs about one force call)."""
        x = jnp.asarray(x)
        v = jnp.asarray(v)
        n = x.shape[0]
        _check_n(n)
        xw = _wrap(x)
        d, r, mask, dudr = _pair_dudr(nl, xw)
        u = jnp.where(mask, _pair_u_of(nl, r, n), 0.0)
        nb_cid, _ = _nb_cid_mask(nl, n)
        cell_v = v[jnp.clip(nl.cell_atoms, 0, n - 1)]
        vc = cell_v[nb_cid].reshape(n, -1, v.shape[-1])
        m = jnp.asarray(masses, v.dtype)
        m_col = m[:, None] if m.ndim == 1 else m
        e_i = (0.5 * jnp.sum(m_col * v * v, -1)
               + 0.5 * jnp.sum(u, -1))                   # (N,)
        conv = jnp.sum(e_i[:, None] * v, axis=0)         # (dim,)
        # Ordered-pair sum counts each {i, j} twice and
        # sum_{i<j} = (1/2) sum_{i != j} of the symmetric summand,
        # so the 1/2 above becomes 1/4 here.
        w = dudr / r
        fdotv = -w * jnp.einsum("nka,nka->nk", d,
                                v[:, None, :] + vc)
        vir = 0.25 * jnp.einsum("nk,nka->a", fdotv, d)
        j = (conv + vir) / vol_f
        return jnp.where(_invalid(nl, xw), jnp.nan, j)

    energy.heat_flux = heat_flux

    if backend == "xla":
        return build, _with_exclusions(energy)

    # ---- pallas backend: fused VMEM energy+force kernel ----
    from vaemolsim_tpu.ops.cell_lj_pallas import cell_pair_energy_force

    cell_nb_j = jnp.asarray(cell_nb_np)

    def _pallas_impl(nl, x):
        x = jnp.asarray(x)
        n = x.shape[0]
        _check_n(n)
        xw = _wrap(x)
        cells = jnp.clip(nl.cell_atoms, 0, n - 1)
        cell_x = xw[cells]
        nb_x = cell_x[cell_nb_j]
        cxt = jnp.transpose(cell_x, (0, 2, 1))
        nxt = jnp.transpose(nb_x.reshape(n_cells_p, 27 * capacity, 3),
                            (0, 2, 1))
        nid = nl.cell_atoms[cell_nb_j].reshape(n_cells_p, 1,
                                               27 * capacity)
        cid = nl.cell_atoms.reshape(n_cells_p, 1, capacity)
        args = (cxt, nxt, cid, nid)
        if per_atom:
            sig_cell = sig_at[cells]
            se_cell = seps_at[cells]
            args += (sig_cell.reshape(n_cells_p, 1, capacity),
                     sig_cell[cell_nb_j].reshape(n_cells_p, 1,
                                                 27 * capacity),
                     se_cell.reshape(n_cells_p, 1, capacity),
                     se_cell[cell_nb_j].reshape(n_cells_p, 1,
                                                27 * capacity))
        if q_at is not None:
            q_cell = q_at[cells]
            args += (q_cell.reshape(n_cells_p, 1, capacity),
                     q_cell[cell_nb_j].reshape(n_cells_p, 1,
                                               27 * capacity))
        if exclude is not None:
            # Padding slots (id n -> clipped to n-1) gather a real
            # atom's partner row, but the kernel's ci < n_atoms mask
            # kills those columns before the ids are consulted.
            ex_cell = jnp.transpose(_excl_tab(n)[cells], (0, 2, 1))
            args += (ex_cell,)              # (n_cells, D, capacity)

        def _kern(*a):
            i = 4 + (4 if per_atom else 0)
            j = i + (2 if q_at is not None else 0)
            return cell_pair_energy_force(
                a[0], a[1], a[2], a[3],
                species=a[4:i] if per_atom else None,
                charge=a[i:j] if q_at is not None else None,
                exclusion=a[j] if exclude is not None else None,
                n_atoms=n,
                sigma=sigma if sigma is not None else 1.0,
                epsilon=epsilon if epsilon is not None else 1.0,
                cutoff=float(cutoff),
                coulomb_alpha=c_alpha if q_at is not None else 0.0,
                box=tuple(float(b) for b in box_np),
                shift=shift, interpret=interpret)

        if mesh is None:
            e_cells, grad_t = _kern(*args)
        else:
            from jax.sharding import PartitionSpec
            try:
                from jax import shard_map as _smap

                def _shard_map(f, **kw):
                    kw.pop("check_rep", None)  # renamed upstream
                    return _smap(f, check_vma=False, **kw)
            except ImportError:  # older jax
                from jax.experimental.shard_map import shard_map as _sm

                def _shard_map(f, **kw):
                    return _sm(f, **kw)
            spec = PartitionSpec(mesh_axis)
            e_cells, grad_t = _shard_map(
                _kern, mesh=mesh,
                in_specs=tuple(spec for _ in args),
                out_specs=(spec, spec), check_rep=False)(*args)
        bad = _invalid(nl, xw)
        grad = jnp.transpose(grad_t, (0, 2, 1)).reshape(
            n_cells_p * capacity, 3)[nl.atom_slot]
        return (jnp.where(bad, jnp.nan, jnp.sum(e_cells)),
                jnp.where(bad, jnp.nan, 1.0) * grad)

    @jax.custom_vjp
    def energy_pallas(nl: CellNeighborList, x: Array) -> Array:
        return _pallas_impl(nl, x)[0]

    def _ep_fwd(nl, x):
        e, grad = _pallas_impl(nl, x)
        return e, (nl, grad)

    def _ep_bwd(res, ct):
        nl, grad = res
        return (_nl_zero_cotangent(nl), ct * grad)

    energy_pallas.defvjp(_ep_fwd, _ep_bwd)
    # Stress/heat flux ride the XLA candidate path (recomputed from the
    # frozen build on demand — see _nb_cid_mask); they are sampled
    # observables, not per-step hot paths.
    energy_pallas.stress = stress
    energy_pallas.heat_flux = heat_flux
    return build, _with_exclusions(energy_pallas)


def lennard_jones_cell(sigma: float = 1.0, epsilon: float = 1.0, *,
                       box: Sequence[float], cutoff: float,
                       capacity: int = 24,
                       shift: bool = True) -> Callable[[Array], Array]:
    """Cell-list Lennard-Jones for LARGE periodic systems: O(N * 27 C)
    instead of the dense form's O(N^2), with every shape fixed at trace
    time (TPU-native: one sort + searchsorted builds the cell table,
    energies are batched gathers + reductions — no dynamic neighbor
    lists, no host callbacks).  This is the fused build-every-call form
    of :func:`lennard_jones_cell_neighbor` at ``skin=0`` — use that
    directly (with ``md.velocity_verlet_neighbor`` / ``baoab_neighbor``)
    to amortize the cell build across MD steps.

    The box is partitioned into cells of edge >= ``cutoff`` (>= 3 per
    dimension required — smaller boxes should use the exact dense
    :func:`lennard_jones`); each atom interacts with the <= ``capacity``
    atoms in each of its 27 surrounding cells.  Identical energies to
    the dense form with the same ``cutoff``/``shift`` (pinned by test),
    including the float32-safe linear core.

    ``capacity`` bounds atoms per cell.  If any cell overflows, the
    energy is returned as NaN (loud, composable with utils.checked) —
    size ``capacity`` to ~3x the mean atoms/cell
    (``N * cutoff^3 / V``).  ``sigma``/``epsilon``: scalars or per-atom
    (n,) arrays (Lorentz-Berthelot mixing).

    Forces come from an analytic ``custom_vjp`` (row-local pair sum —
    pure gathers, no scatter; pinned against the dense form's AD
    gradient by test).  First-order reverse-mode only: ``jax.grad``/
    ``jax.vjp`` (MD, MALA, HMC) work; forward-mode (``jax.jvp``, e.g.
    :func:`~vaemolsim_tpu.observables.virial_pressure` dilations) and
    higher-order derivatives need the dense :func:`lennard_jones`.
    """
    build, energy_nl = lennard_jones_cell_neighbor(
        sigma, epsilon, box=box, cutoff=cutoff, skin=0.0,
        capacity=capacity, shift=shift)

    def single(x: Array) -> Array:
        return energy_nl(build(x), x)

    def energy(x: Array) -> Array:
        x = jnp.asarray(x)
        if x.ndim == 2:
            return single(x)
        batch = x.shape[:-2]
        flat = x.reshape((-1,) + x.shape[-2:])
        return jax.vmap(single)(flat).reshape(batch)

    return energy


def lennard_jones_tail(sigma: float = 1.0, epsilon: float = 1.0, *,
                       box: Sequence[float],
                       cutoff: float) -> Callable[[Array], Array]:
    """Standard homogeneous-fluid long-range (tail) correction for a
    truncated LJ,

        ``U_tail = (8 pi N^2 eps sig^3) / (3 V)
                   [ (1/3)(sig/rc)^9 - (sig/rc)^3 ]``

    (Frenkel & Smit eq. 3.2.5, assuming g(r) = 1 beyond the cutoff).
    Compose with :func:`lennard_jones`/:func:`lennard_jones_cell` via
    :func:`composite`.  ``box`` may be a traced array (the NPT
    ``(..., 1, 1, 3)`` factory convention included), so the correction
    participates correctly in volume moves AND the
    :func:`~vaemolsim_tpu.observables.virial_pressure` dilation picks
    up the matching pressure tail automatically (dU_tail/dV through
    the trace).  Scalar sigma/epsilon (one species).
    """
    sigma = float(sigma)
    epsilon = float(epsilon)
    sr3 = (sigma / float(cutoff)) ** 3
    coeff = (8.0 / 3.0) * np.pi * epsilon * sigma ** 3 \
        * (sr3 ** 3 / 3.0 - sr3)

    def energy(x: Array) -> Array:
        x = jnp.asarray(x)
        n = x.shape[-2]
        box_sq = _squeeze_box(jnp.asarray(box, x.dtype))
        vol = jnp.prod(box_sq, axis=-1)
        return jnp.broadcast_to(coeff * n * n / vol, x.shape[:-2])

    return energy


def lennard_jones_softcore(sigma=1.0, epsilon=1.0, *,
                           alchemical,
                           alpha: float = 0.5,
                           exclude: Optional[np.ndarray] = None,
                           box: Optional[Sequence[float]] = None):
    """Alchemically-scalable LJ: pairs coupling an ``alchemical`` atom
    to the environment use the Beutler et al. (1994) soft core

        U(r; lam) = 4 eps lam [ (alpha (1-lam) + (r/sig)^6)^-2
                              - (alpha (1-lam) + (r/sig)^6)^-1 ],

    which is the exact LJ at ``lam=1``, zero at ``lam=0``, and FINITE
    at r=0 for every intermediate lam — the endpoint-singularity cure
    every decoupling free-energy ladder needs (a linearly-scaled r^-12
    diverges as the particle appears inside another).  Pairs entirely
    within the environment, and pairs entirely within the alchemical
    set (intramolecular), stay full LJ, independent of lam.

    ``alchemical``: static (n,) bool mask of the atoms being decoupled.
    Returns ``energy(x, lam)`` — two-argument so both samplers
    (``functools.partial(energy, lam=l)``) and exact thermodynamic
    integration (``jax.grad(energy, argnums=1)`` = dU/dlam) come for
    free.  sigma/epsilon: scalar, per-atom (Lorentz-Berthelot) or
    (n, n), as in :func:`lennard_jones`.
    """
    sigma = jnp.asarray(sigma, jnp.float32)
    epsilon = jnp.asarray(epsilon, jnp.float32)
    if sigma.ndim == 1:
        sigma = 0.5 * (sigma[:, None] + sigma[None, :])
    if epsilon.ndim == 1:
        epsilon = jnp.sqrt(epsilon[:, None] * epsilon[None, :])
    alch = np.asarray(alchemical, bool)
    box_arr = None if box is None else jnp.asarray(box, jnp.float32)
    # Pair classes (static): scaled = exactly one endpoint alchemical.
    scaled_np = alch[:, None] ^ alch[None, :]

    def energy(x: Array, lam) -> Array:
        n = x.shape[-2]
        if alch.shape != (n,):
            raise ValueError(f"alchemical must be ({n},); got {alch.shape}")
        lam = jnp.asarray(lam, x.dtype)
        pair_mask = np.triu(np.ones((n, n), bool), k=1)
        if exclude is not None:
            pair_mask &= ~_exclude_matrix(exclude, n)
        full_mask = jnp.asarray(pair_mask & ~scaled_np)
        soft_mask = jnp.asarray(pair_mask & scaled_np)

        d = x[..., :, None, :] - x[..., None, :, :]
        if box_arr is not None:
            d = d - box_arr * jnp.round(d / box_arr)
        r2 = jnp.sum(d * d, axis=-1)

        # Full-LJ pairs: same linear-core guard as lennard_jones.
        r2f = jnp.where(full_mask, r2, 1.0)
        r = jnp.sqrt(jnp.maximum(r2f, _EPS))
        rc = 0.3 * sigma
        r_eff = jnp.maximum(r, rc)
        sr6 = (sigma / r_eff) ** 6
        u_full = 4.0 * epsilon * (sr6 * sr6 - sr6)
        src6 = (sigma / rc) ** 6
        slope = 24.0 * epsilon / rc * (src6 - 2.0 * src6 * src6)
        u_full = u_full + jnp.where(r < rc, slope * (r - rc), 0.0)

        # Soft-core pairs: finite at r=0 by construction for lam < 1;
        # the tiny floor only guards the exact-overlap lam=1 corner.
        # lam broadcasts against the ENERGY (batch) shape — add the two
        # pair axes so per-replica lambda ladders (HREX) work directly.
        lam_p = lam[..., None, None]
        r6s = (jnp.where(soft_mask, r2, 1.0) / sigma ** 2) ** 3
        den = jnp.maximum(alpha * (1.0 - lam_p) + r6s, 1e-12)
        u_soft = 4.0 * epsilon * lam_p * (1.0 / den ** 2 - 1.0 / den)

        return (jnp.sum(jnp.where(full_mask, u_full, 0.0), axis=(-2, -1))
                + jnp.sum(jnp.where(soft_mask, u_soft, 0.0),
                          axis=(-2, -1)))

    return energy


def coulomb(charges, *, exclude: Optional[np.ndarray] = None,
            box: Optional[Sequence[float]] = None,
            cutoff: Optional[float] = None,
            shift: bool = True) -> Callable[[Array], Array]:
    """Pairwise Coulomb term ``sum_{i<j} q_i q_j / r_ij`` in reduced
    units (Coulomb constant = 1; fold ``1/(4 pi eps_0 eps_r kT)`` into
    the charges).

    Same dense-masked all-pairs TPU form as :func:`lennard_jones`, with
    minimum-image wrapping under ``box``, exclusions, and shifted
    truncation (``shift`` subtracts the cutoff energy so HMC/MALA see a
    continuous potential — for bulk electrolytes a proper Ewald/PME sum
    is the accurate treatment; this direct sum targets gas-phase
    molecules and the short-range part).  ``charges``: (n,) per-atom
    values; products ``q_i q_j`` are formed once at build time.
    """
    q = jnp.asarray(charges, jnp.float32)
    if q.ndim != 1:
        raise ValueError(f"charges must be (n,); got {q.shape}")
    qq = q[:, None] * q[None, :]
    box_arr = None if box is None else jnp.asarray(box, jnp.float32)

    def energy(x: Array) -> Array:
        n = x.shape[-2]
        if n != q.shape[0]:
            raise ValueError(f"coords have {n} atoms but charges has "
                             f"{q.shape[0]}")
        pair_mask = np.triu(np.ones((n, n), bool), k=1)
        if exclude is not None:
            pair_mask &= ~_exclude_matrix(exclude, n)
        mask = jnp.asarray(pair_mask)

        d = x[..., :, None, :] - x[..., None, :, :]
        if box_arr is not None:
            d = d - box_arr * jnp.round(d / box_arr)
        r2 = jnp.sum(d * d, axis=-1)
        if cutoff is not None:
            mask = mask & (r2 < cutoff * cutoff)
        r = jnp.sqrt(jnp.maximum(jnp.where(mask, r2, 1.0), _EPS))
        u = qq / r
        if cutoff is not None and shift:
            u = u - qq / cutoff
        return jnp.sum(jnp.where(mask, u, 0.0), axis=(-2, -1))

    return energy


def ewald_coulomb(charges, *, box: Sequence[float], r_cutoff: float,
                  exclude: Optional[np.ndarray] = None,
                  alpha: Optional[float] = None,
                  tolerance: float = 1e-5,
                  k_cutoff: Optional[float] = None,
                  reference_box: Optional[Sequence[float]] = None,
                  include_real_space: bool = True
                  ) -> Callable[[Array], Array]:
    """EXACT periodic electrostatics by classic Ewald summation — the
    accurate treatment :func:`coulomb`'s docstring defers to.  Reduced
    units (Coulomb constant = 1), orthorhombic boxes.

    TPU-native decomposition: the conditionally-convergent lattice sum
    splits into a short-range erfc part (the same dense minimum-image
    pair form as every other nonbonded term), a reciprocal-space sum
    whose structure factors are ONE matmul ``phase = x @ k.T`` feeding
    cos/sin reductions (MXU work, no FFT scatter/spread as in PME —
    B-spline charge spreading is scatter-bound on TPU, and for the
    N <= tens-of-thousands this library targets the O(N^1.5) classic
    sum is both faster and exact), a self term, and charge corrections:

    - excluded pairs (``exclude``, e.g. bonded 1-2/1-3) contribute
      nothing in total: their reciprocal-space part is cancelled by an
      explicit ``-q_i q_j erf(alpha r)/r`` term,
    - a net-charged system gets the uniform neutralizing-background
      term ``-pi (sum q)^2 / (2 V alpha^2)``.

    ``include_real_space=False`` drops the dense O(N^2) erfc pair term
    (keeping recip/self/background/exclusion corrections) — for LARGE
    systems compute that term at O(N * capacity) with
    :func:`lennard_jones_cell_neighbor`'s ``charges``/``coulomb_alpha``
    arguments using THIS factory's alpha (exposed as
    ``energy.ewald_alpha``) and ``r_cutoff``; the split total is the
    exact Ewald sum (pinned by test).

    ``alpha``/``k_cutoff`` default from ``tolerance`` by the standard
    heuristics ``alpha = sqrt(-ln tol)/r_cutoff``,
    ``k_cutoff = 2 alpha sqrt(-ln tol)``; the result is
    alpha-independent to ~tolerance (pinned by test, along with the
    NaCl Madelung constant and the Wigner single-charge constant).
    ``r_cutoff`` must be < half the smallest box edge (minimum image).

    The integer k-vector set is fixed at build time from
    ``reference_box`` (default: ``box``), so ``box`` itself may be a
    traced array — NPT volume moves and ``virial_pressure`` dilations
    re-evaluate ``k = 2 pi n / box`` under the trace while the SET of
    modes stays frozen (exact at the reference box; mode-set error
    O(tolerance) for small volume changes).
    """
    q = jnp.asarray(charges, jnp.float32)
    if q.ndim != 1:
        raise ValueError(f"charges must be (n,); got {q.shape}")
    if reference_box is None:
        reference_box = box
    try:
        ref_np = np.asarray(reference_box, np.float64)
    except Exception as e:  # traced box without a concrete reference
        raise ValueError(
            "ewald_coulomb needs a concrete box to build its k-vector "
            "set; pass reference_box=<build-time box lengths> when box "
            "is traced (NPT / virial dilations)") from e
    if ref_np.shape != (3,):
        raise ValueError(f"box must be 3 lengths; got {ref_np.shape}")
    if not (r_cutoff * 2.0 <= ref_np.min()):
        raise ValueError(
            f"r_cutoff {r_cutoff} must be <= half the smallest box edge "
            f"({ref_np.min() / 2}) for minimum-image validity")
    ln_tol = float(np.sqrt(-np.log(tolerance)))
    alpha_v = float(alpha) if alpha is not None else ln_tol / float(r_cutoff)
    k_cut = (float(k_cutoff) if k_cutoff is not None
             else 2.0 * alpha_v * ln_tol)

    # Half-space integer mode set |2 pi n / L_ref| <= k_cut (static).
    n_max = np.maximum(np.ceil(k_cut * ref_np / (2 * np.pi)), 1).astype(int)
    axes = [np.arange(-m, m + 1) for m in n_max]
    nn = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)
    half = ((nn[:, 0] > 0)
            | ((nn[:, 0] == 0) & (nn[:, 1] > 0))
            | ((nn[:, 0] == 0) & (nn[:, 1] == 0) & (nn[:, 2] > 0)))
    nn = nn[half]
    k_ref = 2 * np.pi * nn / ref_np
    nn = nn[(k_ref ** 2).sum(-1) <= k_cut * k_cut]
    if nn.shape[0] == 0:
        raise ValueError("empty k-vector set; increase k_cutoff/tolerance")
    modes = jnp.asarray(nn, jnp.float32)            # (n_k, 3)

    qq = q[:, None] * q[None, :]
    excl_np = (None if exclude is None
               else _exclude_matrix(exclude, q.shape[0]))
    from jax.scipy.special import erf, erfc

    def energy(x: Array) -> Array:
        x = jnp.asarray(x)
        n = x.shape[-2]
        if n != q.shape[0]:
            raise ValueError(f"coords have {n} atoms but charges has "
                             f"{q.shape[0]}")
        # Canonicalize the box to (..., 3) leading-batch form: NPT's
        # factory convention passes (..., 1, 1, 3) (pair-tensor
        # broadcast-ready); squeeze the inserted singleton axes so
        # volumes/k-vectors align with per-chain energies.
        box_sq = _squeeze_box(jnp.asarray(box, x.dtype))  # (..., 3)
        box_row = box_sq[..., None, :]                  # vs (..., n, 3)
        box_pair = box_sq[..., None, None, :]           # vs (..., n, n, 3)
        vol = jnp.prod(box_sq, axis=-1)
        xw = x - box_row * jnp.floor(x / box_row)   # bounds f32 phases

        # Reciprocal sum: one matmul + cos/sin reductions.
        k = 2 * jnp.pi * modes / box_row            # (..., n_k, 3)
        k2 = jnp.sum(k * k, -1)
        w = (4 * jnp.pi / k2) * jnp.exp(-k2 / (4 * alpha_v * alpha_v))
        # precision=HIGHEST: this 3-wide contraction otherwise hits the
        # MXU at bf16-mantissa default precision, and phases of O(100)
        # rad turn the mantissa loss into O(1e-3) relative energy error
        # (measured on chip in large cells; CPU tests cannot see it).
        phase = jnp.einsum("...nd,...kd->...nk", xw, k,
                           precision=jax.lax.Precision.HIGHEST)
        s_cos = jnp.sum(q[:, None] * jnp.cos(phase), axis=-2)
        s_sin = jnp.sum(q[:, None] * jnp.sin(phase), axis=-2)
        # Half set: each +-k pair counted once, factor 2 vs the 1/2V.
        u_recip = jnp.sum(w * (s_cos ** 2 + s_sin ** 2), axis=-1) / vol

        # Short-range erfc pairs (minimum image, dense masked).
        if include_real_space:
            pair_mask = np.triu(np.ones((n, n), bool), k=1)
            if excl_np is not None:
                pair_mask &= ~excl_np
            mask = jnp.asarray(pair_mask)
            d = xw[..., :, None, :] - xw[..., None, :, :]
            d = d - box_pair * jnp.round(d / box_pair)
            r2 = jnp.sum(d * d, -1)
            mask = mask & (r2 < r_cutoff * r_cutoff)
            r = jnp.sqrt(jnp.maximum(jnp.where(mask, r2, 1.0), _EPS))
            u_real = jnp.sum(jnp.where(mask, qq * erfc(alpha_v * r) / r,
                                       0.0), axis=(-2, -1))
        else:
            u_real = 0.0

        # Self energy + neutralizing background for net charge.
        u_self = -alpha_v / jnp.sqrt(jnp.pi) * jnp.sum(q * q)
        u_bg = -jnp.pi / (2 * vol * alpha_v * alpha_v) * jnp.sum(q) ** 2

        # Excluded pairs: remove their reciprocal-space interaction.
        if excl_np is not None:
            em = jnp.asarray(np.triu(excl_np, k=1))
            de = xw[..., :, None, :] - xw[..., None, :, :]
            de = de - box_pair * jnp.round(de / box_pair)
            re = jnp.sqrt(jnp.maximum(
                jnp.where(em, jnp.sum(de * de, -1), 1.0), _EPS))
            u_excl = -jnp.sum(jnp.where(em, qq * erf(alpha_v * re) / re,
                                        0.0), axis=(-2, -1))
        else:
            u_excl = 0.0

        return u_recip + u_real + u_self + u_bg + u_excl

    energy.ewald_alpha = alpha_v
    return energy


# Crossover for the two PME slot-table builders (see _spread_binned):
# below this (n * spread-cell count) the one-hot+cumsum build wins on
# TPU; above it the O(n * n_cells) cumsum footprint outgrows the
# argsort fallback.  Module-level so tests can force either branch.
_SLOT_CUMSUM_MAX = 16 * 2**20


def _bspline_weights(order: int, t: Array) -> Array:
    """Cardinal-B-spline spreading weights ``M_order(t + j)`` for
    ``j = 0..order-1`` as a trailing axis, via the stable PME
    coefficient recurrence (Essmann et al. 1995 eq. 4.1; the loop is
    over the STATIC order, so it unrolls at trace time).  ``t`` is the
    fractional grid offset in [0, 1); the weights sum to 1 exactly
    (partition of unity) and are C^(order-2) in ``t`` — order 4 gives
    continuously twice-differentiable energies, so autodiff forces are
    smooth."""
    if order < 2:
        raise ValueError("spline order must be >= 2")
    w = [1.0 - t, t] + [jnp.zeros_like(t) for _ in range(order - 2)]
    for k in range(3, order + 1):
        div = 1.0 / (k - 1)
        w[k - 1] = div * t * w[k - 2]
        for j in range(1, k - 1):
            w[k - 1 - j] = div * ((t + j) * w[k - 2 - j]
                                  + (k - j - t) * w[k - 1 - j])
        w[0] = div * (1.0 - t) * w[0]
    # The recurrence fills the list as M(t + order-1-j); reverse so the
    # returned axis is M(t + j) (pinned against the direct two-term
    # recursion by test — the reflected pairing spreads mirrored charge
    # clouds: energies almost right by symmetry, forces wrong).
    return jnp.stack(w[::-1], axis=-1)


def _bspline_integer_values(order: int) -> np.ndarray:
    """``M_order`` at the integers 1..order-1 (numpy, build time) for
    the Euler exponential-spline factors."""
    m = {2: lambda x: np.where((x >= 0) & (x <= 2), 1.0 - np.abs(x - 1.0),
                               0.0)}
    xs = np.arange(1, order, dtype=np.float64)

    def mn(n, x):
        if n == 2:
            return m[2](x)
        return (x * mn(n - 1, x) + (n - x) * mn(n - 1, x - 1.0)) / (n - 1)

    return mn(order, xs)


def pme_coulomb(charges, *, box: Optional[Sequence[float]] = None,
                cell=None, r_cutoff: float,
                grid_shape: Optional[Sequence[int]] = None,
                order: int = 6,
                exclude: Optional[np.ndarray] = None,
                alpha: Optional[float] = None,
                tolerance: float = 1e-5,
                include_real_space: bool = True,
                spread: str = "auto",
                mesh=None, mesh_axis: str = "atoms"
                ) -> Callable[[Array], Array]:
    """Smooth particle-mesh Ewald (Essmann et al. 1995) — the
    O(N log N) large-system complement of :func:`ewald_coulomb` (same
    reduced units, same correction terms, same split contract).

    TPU decomposition of the reciprocal sum: B-spline charge spreading
    (``spread=``: ``"scatter"`` is the direct N x order^3 scatter-add;
    ``"binned"`` is the TPU fast path — atoms binned to grid-aligned
    blocks, per-axis one-hot placement matmuls, dense per-cell outer
    products, and a static 8-way roll overlap-add, no f32 scatter at
    all (TPU scatters serialize; measured ~90% of the reciprocal
    gradient at 8k atoms); ``"auto"`` picks binned at n >= 1024.
    Both are exact to f32 roundoff of each other), one real 3-D FFT
    (``jnp.fft.rfftn``, XLA-native on TPU), a precomputed influence
    function ``4 pi/k^2 e^{-k^2/4 alpha^2} / |b1 b2 b3|^2`` (Euler
    exponential-spline factors folded in at build time), and one
    weighted reduction.  Forces come from plain autodiff: the order-4
    spreading weights are C^2 polynomials in the positions, so
    ``jax.grad`` differentiates THROUGH the scatter and the FFT
    (both linear) — no separate interpolation pass.

    Crossover guidance (measured, see docs/performance.md): the classic
    matmul-form :func:`ewald_coulomb` reciprocal sum is exact and
    MXU-friendly at the N <= tens-of-thousands this library usually
    targets; PME wins asymptotically and bounds memory at large N
    (the classic sum's (n, n_k) phase matrix grows as O(N^1.5)).
    Accuracy is set by ``grid_shape`` x ``order`` (defaults: spacing
    <= pi / (1.5 k_cut) rounded up to FFT-friendly sizes, order 6 —
    measured ~1e-5 relative energy / ~1e-4 max force error against the
    exact classic sum at tolerance 1e-5; order 4 with the same grid is
    ~30x worse and only ~2x cheaper to spread, so 6 is the default).

    ``include_real_space=False`` drops the dense erfc pair term exactly
    as in :func:`ewald_coulomb` — pair with
    :func:`lennard_jones_cell_neighbor`'s ``charges``/``coulomb_alpha``
    (using ``energy.ewald_alpha``) for the fully O(N) path.  The box is
    static (the grid is a build-time constant): for NPT/virial
    dilations use :func:`ewald_coulomb` with ``reference_box``.

    ``cell=`` (instead of ``box=``) accepts a restricted-triclinic
    (3, 3) cell matrix (:func:`vaemolsim_tpu.triclinic.validate_cell`
    conventions): spreading moves to FRACTIONAL space (``u = frac(s)
    G`` — the B-spline machinery is cell-agnostic there), the
    influence function uses the dual-basis ``k(m) = 2 pi H^{-1} m``,
    and real-space/exclusion corrections use the sequential triclinic
    minimum image.  Static cell, replicated path only (the slab
    decomposition stays orthorhombic); for traced NPT cells use
    :func:`vaemolsim_tpu.triclinic.ewald_coulomb_triclinic`.  Pinned
    against the classic triclinic sum, the diagonal-cell box path, and
    finite differences (tests/test_triclinic_ewald.py::TestTriclinicPME).

    ``mesh=`` shards the whole evaluation over a
    ``jax.sharding.Mesh`` axis named ``mesh_axis`` — the textbook
    slab-decomposed distributed FFT, so the reciprocal space genuinely
    scales past one device instead of running replicated:

    - atoms are sharded over the axis; each device B-spline-spreads its
      shard onto a full-size local grid (order^3 scatter, local);
    - ``psum_scatter`` (reduce-scatter, one ICI pass of the grid)
      leaves each device the fully-summed charge density of its x-slab;
    - local rFFT(z) + FFT(y) on the slab, ``all_to_all`` transpose
      (x-slabs -> y-slabs), local FFT(x): together = the full 3-D rFFT;
    - the influence-function reduction runs on each device's y-slab of
      the half-spectrum; partial energies ``psum`` to a replicated
      scalar.

    The dense erfc real-space term row-shards over the same axis (each
    device computes its (n/P, n) block with in-kernel iota masking — no
    O(n^2) operands); exclusion corrections apply sparsely from the
    pair list.  Forces are plain autodiff
    through the collectives (reduce-scatter transposes to all-gather,
    all-to-all to itself).  The auto-selected grid rounds the x/y sizes
    up to multiples of the axis size; an explicit ``grid_shape`` must
    already be divisible.  Energies match the replicated path to f32
    roundoff (tests/test_potentials.py sharded-PME tests).
    """
    q = jnp.asarray(charges, jnp.float32)
    if q.ndim != 1:
        raise ValueError(f"charges must be (n,); got {q.shape}")
    if (box is None) == (cell is None):
        raise ValueError("pass exactly one of box= (orthorhombic "
                         "lengths) or cell= (restricted-triclinic "
                         "(3, 3) matrix)")
    if cell is not None:
        # General (sheared) cells: spreading happens in FRACTIONAL
        # space (u = frac(s) * G, so the B-spline machinery is
        # unchanged), the influence function uses the dual-basis
        # k(m) = 2 pi H^{-1} m, and real-space/exclusion terms use the
        # sequential triclinic minimum image.  The cell is STATIC
        # (the grid and influence are build-time constants), like the
        # orthorhombic ``box``; for traced NPT cells use
        # :func:`vaemolsim_tpu.triclinic.ewald_coulomb_triclinic`.
        if mesh is not None:
            raise NotImplementedError(
                "mesh-sharded PME currently supports orthorhombic "
                "boxes only; pass box= for the slab-decomposed path")
        from vaemolsim_tpu.triclinic import (perpendicular_widths,
                                             validate_cell)
        h_np = validate_cell(cell)
        w_np = np.asarray(perpendicular_widths(jnp.asarray(h_np)))
        if not (r_cutoff * 2.0 <= w_np.min() + 1e-9):
            raise ValueError(
                f"r_cutoff {r_cutoff} must be <= half the minimum "
                f"perpendicular width ({w_np.min() / 2}) of the cell "
                "for minimum-image validity")
        # Per-axis grid heuristic uses the cell-vector lengths (the
        # fractional-space Nyquist rule along each cell vector).
        box_np = np.sqrt((h_np ** 2).sum(axis=1))
    else:
        h_np = None
        box_np = np.asarray(box, np.float64)
        if box_np.shape != (3,):
            raise ValueError(f"box must be 3 lengths; got {box_np.shape}")
        if not (r_cutoff * 2.0 <= box_np.min()):
            raise ValueError(
                f"r_cutoff {r_cutoff} must be <= half the smallest box "
                f"edge ({box_np.min() / 2}) for minimum-image validity")
    if order < 3:
        raise ValueError("PME needs spline order >= 3 for usable "
                         "accuracy (4 is standard)")
    ln_tol = float(np.sqrt(-np.log(tolerance)))
    alpha_v = float(alpha) if alpha is not None else ln_tol / float(r_cutoff)
    k_cut = 2.0 * alpha_v * ln_tol

    n_shards = 1 if mesh is None else int(mesh.shape[mesh_axis])
    if grid_shape is None:
        # Nyquist pi G / L >= 1.5 k_cut, rounded up to the next
        # 5-smooth even size (fast FFT lengths); the slab decomposition
        # additionally needs the x/y sizes divisible by the mesh-axis
        # size (clean reduce-scatter slabs / all_to_all blocks).
        need = np.ceil(1.5 * k_cut * box_np / np.pi).astype(int)

        def next_smooth(n, div=1):
            n = max(int(n), 4)
            # A 5-smooth even size divisible by div does not exist when
            # div has a prime factor > 5 (e.g. a 7- or 14-device mesh
            # axis) — bound the search and fall back to the smallest
            # even multiple of div (correct; the FFT is merely slower).
            for cand in range(n, 8 * n + 1):
                m = cand
                for p in (2, 3, 5):
                    while m % p == 0:
                        m //= p
                if m == 1 and cand % 2 == 0 and cand % div == 0:
                    return cand
            step = div if div % 2 == 0 else 2 * div
            return -(-n // step) * step

        grid_shape = (next_smooth(need[0], n_shards),
                      next_smooth(need[1], n_shards),
                      next_smooth(need[2]))
    gx, gy, gz = (int(g) for g in grid_shape)
    for g in (gx, gy, gz):
        if g < 2 * order:
            raise ValueError(f"grid_shape {grid_shape} too coarse for "
                             f"order {order} (need >= {2 * order})")
    if gx % n_shards or gy % n_shards:
        raise ValueError(
            f"mesh-sharded PME needs grid x/y sizes divisible by the "
            f"'{mesh_axis}' axis size {n_shards}; got {grid_shape} "
            "(leave grid_shape=None to auto-select)")
    grid_np = np.array([gx, gy, gz])

    # ---- build-time influence function on the rfft grid -------------
    def axis_modes(g):
        m = np.arange(g)
        return np.where(m <= g // 2, m, m - g)           # signed mode

    mz_len = gz // 2 + 1
    mx, my = axis_modes(gx), axis_modes(gy)
    mz = np.arange(mz_len)
    if h_np is None:
        kx = 2 * np.pi * mx / box_np[0]
        ky = 2 * np.pi * my / box_np[1]
        kz = 2 * np.pi * mz / box_np[2]
        k2 = (kx[:, None, None] ** 2 + ky[None, :, None] ** 2
              + kz[None, None, :] ** 2)
    else:
        # Dual basis H k = 2 pi m (rows of H are the cell vectors,
        # x = s @ H): same convention as ewald_coulomb_triclinic.
        m3 = np.stack(np.meshgrid(mx, my, mz, indexing="ij"), axis=0)
        kvec = 2 * np.pi * np.einsum("ab,bxyz->axyz",
                                     np.linalg.inv(h_np), m3)
        k2 = (kvec ** 2).sum(axis=0)

    def euler_b2(g, m_signed):
        """|b(m)|^2 per axis mode (Essmann eq. 4.4)."""
        mvals = _bspline_integer_values(order)           # M_n(1..n-1)
        kk = np.arange(order - 1)
        ph = np.exp(2j * np.pi * m_signed[:, None] * kk[None, :] / g)
        denom = (mvals[None, :] * ph).sum(axis=1)
        b2 = 1.0 / np.maximum(np.abs(denom) ** 2, 1e-300)
        # Even-order splines have a vanishing denominator AT Nyquist
        # (the interpolation cannot represent that mode): drop it.
        if order % 2 == 0 and g % 2 == 0:
            b2 = np.where(np.abs(m_signed) == g // 2, 0.0, b2)
        return b2

    b2x = euler_b2(gx, mx)
    b2y = euler_b2(gy, my)
    b2z = euler_b2(gz, mz)
    with np.errstate(divide="ignore", invalid="ignore"):
        infl = (4 * np.pi / k2) * np.exp(-k2 / (4 * alpha_v * alpha_v))
    infl[0, 0, 0] = 0.0                                  # k = 0 excluded
    infl = infl * (b2x[:, None, None] * b2y[None, :, None]
                   * b2z[None, None, :])
    # rfft half-spectrum: double every mode whose conjugate is NOT in
    # the stored half (kz strictly inside (0, gz/2)).
    dbl = np.full(mz_len, 2.0)
    dbl[0] = 1.0
    if gz % 2 == 0:
        dbl[-1] = 1.0
    infl = infl * dbl[None, None, :]
    vol = (float(np.prod(box_np)) if h_np is None
           else float(abs(np.linalg.det(h_np))))
    infl_j = jnp.asarray(0.5 / vol * infl, jnp.float32)  # (gx, gy, mz)

    box_j = jnp.asarray(box_np, jnp.float32)
    grid_j = jnp.asarray(grid_np, jnp.float32)

    # Geometry helpers shared by spreading / real space / exclusions:
    # the orthorhombic forms are elementwise in the box lengths; the
    # triclinic forms use fractional coords + the sequential minimum
    # image (triclinic.py), all static-cell.
    if h_np is None:
        def _frac_u(x):
            return (x / box_j - jnp.floor(x / box_j)) * grid_j

        def _wrapx(x):
            return x - box_j * jnp.floor(x / box_j)

        def _minimg(d):
            return d - box_j * jnp.round(d / box_j)
    else:
        from vaemolsim_tpu.triclinic import (from_fractional,
                                             min_image as _tric_mi,
                                             to_fractional)
        cell_j = jnp.asarray(h_np, jnp.float32)

        def _frac_u(x):
            s = to_fractional(x, cell_j)
            return (s - jnp.floor(s)) * grid_j

        def _wrapx(x):
            s = to_fractional(x, cell_j)
            return from_fractional(s - jnp.floor(s), cell_j)

        def _minimg(d):
            return _tric_mi(d, cell_j)
    n_q = int(q.shape[0])
    # qq and the (n, n) exclusion matrix only exist where an O(n^2)
    # term genuinely needs them — as HLO constants they are 4n^2 bytes
    # and broke remote compilation at 8k atoms (HTTP 413); the
    # exclusion CORRECTION itself is a sparse pair list, O(n_excl).
    qq = q[:, None] * q[None, :] if include_real_space else None
    if exclude is None:
        excl_np = excl_pairs_np = None
    else:
        m_host = _exclude_matrix(exclude, n_q)  # validates both forms
        excl_pairs_np = np.argwhere(np.triu(m_host, 1))
        # Only the replicated dense real-space mask still needs the
        # matrix form (the mesh path subtracts exclusions sparsely).
        excl_np = (m_host if (include_real_space and mesh is None)
                   else None)
    from jax.scipy.special import erf, erfc

    def _base_weights(x: Array):
        """(base int (n, 3), w (n, 3, order)) of the B-spline stamp."""
        u = _frac_u(x)                                   # [0, G)
        base = jnp.floor(u)
        t = u - base                                     # (n, 3)
        return base.astype(jnp.int32), _bspline_weights(order, t)

    def _spread_scatter(x: Array, qv: Array) -> Array:
        """B-spline charge spreading via one scatter-add (the direct
        form; see _spread_binned for the TPU fast path)."""
        base, w = _base_weights(x)
        j = jnp.arange(order)
        pts = (base[..., None] - j) % jnp.asarray(
            [gx, gy, gz], jnp.int32)[:, None]            # (n, 3, order)
        # Outer products over the three axes -> (n, order^3).
        wq = (qv[:, None, None, None]
              * w[:, 0, :, None, None] * w[:, 1, None, :, None]
              * w[:, 2, None, None, :]).reshape(x.shape[0], -1)
        flat = ((pts[:, 0, :, None, None] * gy
                 + pts[:, 1, None, :, None]) * gz
                + pts[:, 2, None, None, :]).reshape(x.shape[0], -1)
        grid = jnp.zeros(gx * gy * gz, x.dtype)
        grid = grid.at[flat.reshape(-1)].add(wq.reshape(-1))
        return grid.reshape(gx, gy, gz)

    # Scatter-free spreading (TPU fast path): TPU scatter-adds
    # serialize, and profiling showed the n x order^3 scatter was ~90%
    # of the whole reciprocal gradient (28 of 31 ms at 8k atoms, grid
    # 90^3).  Instead: bin atoms into grid-aligned blocks of B >= order
    # points per axis (an atom's order-wide stamp then fits a 2B-wide
    # buffer), place the per-axis weights with one-hot matmuls, take
    # dense per-cell outer products, and assemble the grid with a
    # STATIC overlap-add (8 roll+adds — blocks at stride B with width
    # 2B overlap only the next block per axis).  No scatter anywhere on
    # the f32 path; the only remaining scatter is the int32 slot table
    # (1 per atom, 1:1).  Exactness vs the scatter form is pinned in
    # tests/test_potentials.py (TestPME::test_binned_spread_*).
    def _block(g):
        for b in range(order, g + 1):
            if g % b == 0:
                return b
        return g

    bx_, by_, bz_ = _block(gx), _block(gy), _block(gz)
    ncx_, ncy_, ncz_ = gx // bx_, gy // by_, gz // bz_
    n_spread_cells = ncx_ * ncy_ * ncz_

    def _placement(b):
        """(b, order, 2b) one-hot: P[o, m, o + m] = 1 — places the
        reversed weight vector at offset o in the 2b buffer."""
        p = np.zeros((b, order, 2 * b), np.float32)
        for o in range(b):
            for m in range(order):
                p[o, m, o + m] = 1.0
        return jnp.asarray(p)

    place_x, place_y, place_z = (_placement(bx_), _placement(by_),
                                 _placement(bz_))

    def _spread_binned(x: Array, qv: Array) -> Array:
        n = x.shape[0]
        # Capacity from the CALL-time atom count (static shape): the
        # mesh-sharded path spreads per-shard subsets, and a capacity
        # sized from the global count would make every device pay the
        # full single-device slot-table and outer-product cost.
        spread_cap = int(max(order,
                             np.ceil(4.0 * n / max(n_spread_cells, 1))))
        base, w = _base_weights(x)
        w_rev = w[:, :, ::-1]                            # stamp order
        start = base - (order - 1)                       # lowest index
        bsz = jnp.asarray([bx_, by_, bz_], jnp.int32)
        c3 = jnp.floor_divide(start, bsz)
        o3 = start - bsz * c3                            # in [0, B)
        c3 = jnp.mod(c3, jnp.asarray([ncx_, ncy_, ncz_], jnp.int32))
        cid = (c3[:, 0] * ncy_ + c3[:, 1]) * ncz_ + c3[:, 2]

        # Capacity-slot table; the only scatter is an int32 1:1 set.
        # Slot-within-cell = count of earlier atoms in the same cell.
        # Two equivalent builders (both assign count-of-earlier-same-
        # cell-atoms, so the table is identical):
        # - one-hot + cumsum + diagonal gather: a few memory-bound
        #   passes over (n, n_cells) — beats argsort on TPU (the sort
        #   alone measured 0.82 ms of the 4.3 ms reciprocal gradient
        #   at 8k atoms) but its footprint is O(n * n_cells);
        # - argsort + searchsorted: O(n log n) time, O(n) memory — the
        #   large-scale fallback (262k atoms x a 128^3 grid's 4096
        #   bins would make the cumsum a 4.3 GB intermediate).
        # f32 counting is exact to 2^24 atoms.
        if n * n_spread_cells <= _SLOT_CUMSUM_MAX:
            occ = jax.nn.one_hot(cid, n_spread_cells, dtype=jnp.float32)
            run = jnp.cumsum(occ, axis=0)              # (n, n_cells)
            slot_in = jnp.take_along_axis(
                run, cid[:, None], axis=1)[:, 0].astype(jnp.int32) - 1
            src_ids = jnp.arange(n, dtype=jnp.int32)
        else:
            srt = jnp.argsort(cid)
            rank = jnp.searchsorted(cid[srt], cid, side="left")
            slot_in = jnp.arange(n) - rank[srt]
            cid = cid[srt]
            src_ids = srt.astype(jnp.int32)
        overflow = jnp.any(slot_in >= spread_cap)
        slot = jnp.where(slot_in < spread_cap,
                         cid * spread_cap + slot_in,
                         n_spread_cells * spread_cap)
        ids = jnp.full((n_spread_cells * spread_cap + 1,), n,
                       jnp.int32).at[slot].set(src_ids)
        ids = ids[:-1].reshape(n_spread_cells, spread_cap)
        valid = (ids < n).astype(x.dtype)
        idc = jnp.minimum(ids, n - 1)

        # Per-axis stamp vectors (n, 2B) via one-hot placement matmuls.
        def stamp(axis, b, place):
            # precision=HIGHEST: these contractions otherwise hit the
            # MXU at default (bf16-mantissa) precision — measured 0.7%
            # energy error at 8k atoms.
            h = jax.nn.one_hot(o3[:, axis], b, dtype=x.dtype)
            return jnp.einsum("no,omp,nm->np", h, place,
                              w_rev[:, axis, :],
                              precision=jax.lax.Precision.HIGHEST)

        sx = stamp(0, bx_, place_x) * qv[:, None]        # charge folded
        sy = stamp(1, by_, place_y)
        sz = stamp(2, bz_, place_z)

        # Gather per cell, dense outer-product accumulate.
        cxs = sx[idc] * valid[..., None]                 # (C, cap, 2Bx)
        cys = sy[idc]
        czs = sz[idc]
        contrib = jnp.einsum("ncx,ncy,ncz->nxyz", cxs, cys, czs,
                             precision=jax.lax.Precision.HIGHEST)

        # Static overlap-add: 8 roll+adds assemble the periodic grid.
        a6 = contrib.reshape(ncx_, ncy_, ncz_, 2 * bx_, 2 * by_,
                             2 * bz_)
        grid = jnp.zeros((gx, gy, gz), x.dtype)
        for hx in (0, 1):
            for hy in (0, 1):
                for hz in (0, 1):
                    t6 = a6[..., hx * bx_:(hx + 1) * bx_,
                            hy * by_:(hy + 1) * by_,
                            hz * bz_:(hz + 1) * bz_]
                    t3 = jnp.transpose(t6, (0, 3, 1, 4, 2, 5)).reshape(
                        gx, gy, gz)
                    grid = grid + jnp.roll(
                        t3, (hx * bx_, hy * by_, hz * bz_), axis=(0, 1, 2))
        # Loud-failure contract (shared with the cell list): capacity
        # overflow poisons the grid rather than silently dropping
        # charge.
        return jnp.where(overflow, jnp.nan, 1.0) * grid

    if spread not in ("auto", "scatter", "binned"):
        raise ValueError(f"spread must be auto/scatter/binned; "
                         f"got {spread!r}")
    use_binned = (spread == "binned"
                  or (spread == "auto" and n_q >= 1024))

    def _spread(x: Array, qv: Array) -> Array:
        return (_spread_binned if use_binned else _spread_scatter)(x, qv)

    def _recip_one(x: Array) -> Array:
        """Reciprocal energy of ONE (n, 3) configuration."""
        f = jnp.fft.rfftn(_spread(x, q))
        return jnp.sum(infl_j * (f.real ** 2 + f.imag ** 2))

    # ---- mesh-sharded path: slab-decomposed distributed FFT ---------
    if mesh is not None:
        from jax.sharding import PartitionSpec as _PS

        from .parallel.sharding import shard_map_compat

        n_total = int(q.shape[0])
        n_pad = -(-n_total // n_shards) * n_shards
        q_pad_j = jnp.concatenate(
            [q, jnp.zeros(n_pad - n_total, q.dtype)])

        def _recip_kernel(x_sh, q_sh, infl_sl):
            # Local spread of this device's atom shard onto a full-size
            # grid; reduce-scatter sums all shards and hands each
            # device its x-slab of the charge density in ONE ICI pass.
            rho = _spread(x_sh, q_sh)                  # (gx, gy, gz)
            slab = jax.lax.psum_scatter(
                rho, mesh_axis, scatter_dimension=0, tiled=True)
            f = jnp.fft.rfft(slab, axis=2)             # local z rFFT
            f = jnp.fft.fft(f, axis=1)                 # local y FFT
            # Transpose x-slabs -> y-slabs, then finish along x: the
            # three 1-D FFTs over distinct axes = the full 3-D rFFT.
            f = jax.lax.all_to_all(f, mesh_axis, split_axis=1,
                                   concat_axis=0, tiled=True)
            f = jnp.fft.fft(f, axis=0)                 # (gx, gy/P, mz)
            e_loc = jnp.sum(infl_sl * (f.real ** 2 + f.imag ** 2))
            return jax.lax.psum(e_loc, mesh_axis)

        _recip_sharded = shard_map_compat(
            _recip_kernel, mesh,
            in_specs=(_PS(mesh_axis, None), _PS(mesh_axis),
                      _PS(None, mesh_axis, None)),
            out_specs=_PS())

        if include_real_space:
            # Row-sharded erfc real space: each device computes its
            # (n_pad/P, n_pad) block.  The triu/validity mask comes
            # from in-kernel iota + axis_index and charges from the
            # per-shard q — NO (n, n) operands, which would bake 4n^2+
            # bytes of constants into the caller's HLO (the exact
            # remote-compile blowup the replicated path's sparse
            # exclusion fix removed).  Excluded pairs are SUBTRACTED
            # sparsely afterwards.
            rows = n_pad // n_shards

            def _pair_kernel(xw_sh, xw_all, q_sh, q_all):
                pidx = jax.lax.axis_index(mesh_axis)
                ig = pidx * rows + jnp.arange(rows)
                jg = jnp.arange(n_pad)
                d = xw_sh[:, None, :] - xw_all[None, :, :]
                d = d - box_j * jnp.round(d / box_j)
                r2 = jnp.sum(d * d, -1)
                mr = ((jg[None, :] > ig[:, None])
                      & (jg[None, :] < n_total)
                      & (r2 < r_cutoff * r_cutoff))
                r = jnp.sqrt(jnp.maximum(jnp.where(mr, r2, 1.0), _EPS))
                qq_r = q_sh[:, None] * q_all[None, :]
                u_r = jnp.sum(jnp.where(
                    mr, qq_r * erfc(alpha_v * r) / r, 0.0))
                return jax.lax.psum(u_r, mesh_axis)

            _pair_sharded = shard_map_compat(
                _pair_kernel, mesh,
                in_specs=(_PS(mesh_axis, None), _PS(None, None),
                          _PS(mesh_axis), _PS(None)),
                out_specs=_PS())

    def energy(x: Array) -> Array:
        x = jnp.asarray(x)
        n = x.shape[-2]
        if n != q.shape[0]:
            raise ValueError(f"coords have {n} atoms but charges has "
                             f"{q.shape[0]}")
        if x.ndim > 2:
            batch = x.shape[:-2]
            flat = x.reshape((-1,) + x.shape[-2:])
            return jax.vmap(energy)(flat).reshape(batch)

        if mesh is not None:
            pad = n_pad - n
            x_pad = (jnp.concatenate([x, jnp.zeros((pad, 3), x.dtype)])
                     if pad else x)  # zero-charge pad atoms: no effect
            u_recip = _recip_sharded(x_pad, q_pad_j, infl_j)
            u_self = -alpha_v / jnp.sqrt(jnp.pi) * jnp.sum(q * q)
            u_bg = (-jnp.pi / (2 * vol * alpha_v * alpha_v)
                    * jnp.sum(q) ** 2)
            u_pair = 0.0
            xw_pad = x_pad - box_j * jnp.floor(x_pad / box_j)
            if include_real_space:
                u_pair = _pair_sharded(xw_pad, xw_pad, q_pad_j,
                                       q_pad_j)
            if excl_pairs_np is not None and excl_pairs_np.size:
                # Sparse O(n_excl) corrections, replicated (negligible):
                # remove excluded pairs from the erfc sum, then apply
                # the -erf reciprocal-space compensation.
                pi = jnp.asarray(excl_pairs_np[:, 0])
                pj = jnp.asarray(excl_pairs_np[:, 1])
                de = xw_pad[pi] - xw_pad[pj]
                de = de - box_j * jnp.round(de / box_j)
                re = jnp.sqrt(jnp.maximum(jnp.sum(de * de, -1), _EPS))
                qq_p = q[pi] * q[pj]
                if include_real_space:
                    u_pair = u_pair - jnp.sum(jnp.where(
                        re < r_cutoff,
                        qq_p * erfc(alpha_v * re) / re, 0.0))
                u_pair = u_pair - jnp.sum(qq_p * erf(alpha_v * re) / re)
            return u_recip + u_pair + u_self + u_bg

        u_recip = _recip_one(x)

        xw = _wrapx(x)
        if include_real_space:
            pair_mask = np.triu(np.ones((n, n), bool), k=1)
            if excl_np is not None:
                pair_mask &= ~excl_np
            mask = jnp.asarray(pair_mask)
            d = xw[:, None, :] - xw[None, :, :]
            d = _minimg(d)
            r2 = jnp.sum(d * d, -1)
            mask = mask & (r2 < r_cutoff * r_cutoff)
            r = jnp.sqrt(jnp.maximum(jnp.where(mask, r2, 1.0), _EPS))
            u_real = jnp.sum(jnp.where(mask, qq * erfc(alpha_v * r) / r,
                                       0.0))
        else:
            u_real = 0.0

        u_self = -alpha_v / jnp.sqrt(jnp.pi) * jnp.sum(q * q)
        u_bg = -jnp.pi / (2 * vol * alpha_v * alpha_v) * jnp.sum(q) ** 2

        if excl_pairs_np is not None and excl_pairs_np.size:
            # Sparse pair-list correction (never the (n, n) grid).
            pi = jnp.asarray(excl_pairs_np[:, 0])
            pj = jnp.asarray(excl_pairs_np[:, 1])
            de = xw[pi] - xw[pj]
            de = _minimg(de)
            re = jnp.sqrt(jnp.maximum(jnp.sum(de * de, -1), _EPS))
            u_excl = -jnp.sum(q[pi] * q[pj] * erf(alpha_v * re) / re)
        else:
            u_excl = 0.0

        return u_recip + u_real + u_self + u_bg + u_excl

    energy.ewald_alpha = alpha_v
    energy.grid_shape = (gx, gy, gz)
    return energy


def com_restraint(k: float = 1.0, center=0.0) -> Callable[[Array], Array]:
    """Harmonic restraint on the center of mass,
    ``k/2 |mean_atoms(x) - center|^2`` — removes the translational zero
    mode when sampling gas-phase clusters (without it, unrestrained MC
    drifts freely and positional observables never converge)."""
    center = jnp.asarray(center, jnp.float32)

    def energy(x: Array) -> Array:
        com = jnp.mean(x, axis=-2)
        return 0.5 * k * jnp.sum((com - center) ** 2, axis=-1)

    return energy


def composite(*terms: Callable[[Array], Array]) -> Callable[[Array], Array]:
    """Sum of potential terms (a force field): each term maps
    ``(..., n_atoms, dim) -> (...,)`` and XLA fuses the whole sum into
    one program."""
    if not terms:
        raise ValueError("composite needs at least one term")

    def energy(x: Array) -> Array:
        total = terms[0](x)
        for t in terms[1:]:
            total = total + t(x)
        return total

    return energy


def minimize_energy(potential: Callable[[Array], Array], x0: Array, *,
                    steps: int = 500, lr: float = 0.01,
                    clip: float = 1.0, polish_lbfgs: int = 0) -> Array:
    """Relax configurations to a local energy minimum — the standard
    prelude to MC/MD (random initial placements overlap, and r^-12
    energies at overlap are astronomically outside every sampler's
    reach; tuners adapt to the blow-up landscape and chains never
    equilibrate).

    Two-phase per-coordinate-normalized descent (Adam), with per-atom
    displacement clipping (``clip``, in length units — the steepest
    r^-12 gradients otherwise catapult atoms): a coarse phase at ``lr``
    escapes overlaps, then a fine phase at ``lr/10`` with FRESH
    optimizer moments settles into the basin (the restart kills the
    coarse phase's accumulated momentum, which otherwise oscillates
    around steep LJ walls; measured on batched LJ7 from overlapping
    starts: single-schedule Adam leaves stragglers at +hundreds, the
    restart lands all chains within 1 eps of the funnel minima).  Both
    phases are jitted ``lax.fori_loop``s over ``steps // 2``; batched —
    every leading-axis configuration minimizes independently in the
    same compiled program.  Returns the relaxed coordinates.

    ``polish_lbfgs > 0`` appends that many L-BFGS steps (zoom
    linesearch, vmapped per configuration) — superlinear refinement to
    the basin floor once Adam has escaped the blow-up region, pinning
    minima to ~machine precision (the LJ7 funnel golden in
    tests/test_potentials.py).  Never start L-BFGS from overlapping
    configurations: the linesearch along an r^-12 wall direction is
    what the clipped-Adam phases exist to avoid.
    """
    import optax

    def phase(x0, opt, n):
        def body(_, carry):
            x, opt_state = carry
            g = jax.grad(lambda x: jnp.sum(potential(x)))(x)
            # optax updates are the signed step (already descent).
            updates, opt_state = opt.update(g, opt_state)
            d = jnp.asarray(updates)
            norm = jnp.sqrt(jnp.maximum(
                jnp.sum(d * d, axis=-1, keepdims=True), _EPS))
            d = d * jnp.minimum(1.0, clip / norm)
            return x + d, opt_state

        x, _ = jax.lax.fori_loop(0, n, body, (x0, opt.init(x0)))
        return x

    def lbfgs_polish(x0):
        opt = optax.lbfgs()
        batch = x0.shape[:-2]
        flat = x0.reshape(batch + (-1,))  # L-BFGS over flat coords

        def f_one(p):
            return potential(p.reshape(x0.shape[len(batch):]))

        def one_config(p0):
            vg = optax.value_and_grad_from_state(f_one)

            def body(_, carry):
                p, st = carry
                value, grad = vg(p, state=st)
                updates, st = opt.update(grad, st, p, value=value,
                                         grad=grad, value_fn=f_one)
                return optax.apply_updates(p, updates), st

            p, _ = jax.lax.fori_loop(0, polish_lbfgs, body,
                                     (p0, opt.init(p0)))
            return p

        fn = one_config
        for _ in range(len(batch)):
            fn = jax.vmap(fn)
        return fn(flat).reshape(x0.shape)

    @jax.jit
    def run(x0):
        x = phase(x0, optax.adam(lr), steps // 2)
        x = phase(x, optax.adam(lr / 10.0), steps - steps // 2)
        if polish_lbfgs > 0:
            x = lbfgs_polish(x)
        return x

    return run(jnp.asarray(x0))


def as_log_prob(potential: Callable[[Array], Array],
                beta: float = 1.0) -> Callable[[Array], Array]:
    """Adapt a potential to the MC engine's convention:
    ``log p~(x) = -beta U(x)`` (engine ``energy_func`` = log target
    density, mcmc/engine.py; reference sign convention
    /root/reference/vaemolsim/mcmc.py:116).  ``beta`` is the inverse
    temperature in the potential's reduced units — free-energy ladders
    over temperature are ``[as_log_prob(U, b) for b in betas]``."""

    def log_prob(x: Array) -> Array:
        return -beta * potential(x)

    return log_prob
