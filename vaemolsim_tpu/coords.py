"""Internal-coordinate (bond / angle / torsion) transforms.

The reference's workflows decode *internal* coordinates (BAT torsions in
[-pi, pi], Backmapping notebook cell 26) but delegate the Cartesian <->
internal conversion to external MD tooling (mdtraj, pulled in only by an
optional conda env — SURVEY.md §2.2).  The TPU build provides the
"torsion/angle/bond supports" of the north star as first-party, jittable,
batched functions:

- :func:`bond_lengths`, :func:`bond_angles`, :func:`dihedrals` — measure
  internal coordinates from Cartesian frames (vectorized over arbitrary
  index lists and leading batch axes).
- :func:`bat_from_cartesian` / :func:`cartesian_from_bat` — full
  Z-matrix-style decomposition and NeRF reconstruction (Parsons et al.
  2005 "natural extension reference frame"): the reconstruction scans
  atoms with ``lax.fori_loop`` (placement is inherently sequential) while
  measurement is one parallel pass.

Conventions: for Z-matrix row ``(j, k, l)`` of atom i, the internals are
``r = |x_i - x_j|``, ``theta = angle(i, j, k)`` in (0, pi), and
``phi = dihedral(l, k, j, i)`` in [-pi, pi] (praxeolitic/IUPAC sign).
Atom 0 sits at the origin, atom 1 on +x, atom 2 in the xy half-plane
with positive y — reconstruction returns this canonical frame, so
round-tripping recovers geometry up to the rigid-body frame (and exactly
recovers all internal coordinates).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

__all__ = ["bond_lengths", "bond_angles", "dihedrals", "chain_zmatrix",
           "bat_from_cartesian", "cartesian_from_bat"]

_EPS = 1e-12


def _unit(v: Array) -> Array:
    return v / jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + _EPS)


def bond_lengths(coords: Array, pairs) -> Array:
    """|x_a - x_b| for each (a, b) in pairs: (..., A, 3) -> (..., M)."""
    pairs = jnp.asarray(pairs)
    d = (jnp.take(coords, pairs[:, 0], axis=-2)
         - jnp.take(coords, pairs[:, 1], axis=-2))
    return jnp.sqrt(jnp.sum(d * d, axis=-1))


def bond_angles(coords: Array, triples) -> Array:
    """angle(a, b, c) at vertex b, in (0, pi): (..., A, 3) -> (..., M)."""
    t = jnp.asarray(triples)
    a = jnp.take(coords, t[:, 0], axis=-2)
    b = jnp.take(coords, t[:, 1], axis=-2)
    c = jnp.take(coords, t[:, 2], axis=-2)
    u = _unit(a - b)
    v = _unit(c - b)
    # atan2 form is stable near 0 and pi.
    cross = jnp.cross(u, v)
    return jnp.arctan2(jnp.sqrt(jnp.sum(cross * cross, axis=-1) + _EPS),
                       jnp.sum(u * v, axis=-1))


def dihedrals(coords: Array, quads) -> Array:
    """Signed dihedral of (p0, p1, p2, p3) about the p1-p2 axis, in
    [-pi, pi] (praxeolitic formulation)."""
    q = jnp.asarray(quads)
    p0 = jnp.take(coords, q[:, 0], axis=-2)
    p1 = jnp.take(coords, q[:, 1], axis=-2)
    p2 = jnp.take(coords, q[:, 2], axis=-2)
    p3 = jnp.take(coords, q[:, 3], axis=-2)
    b0 = p0 - p1
    b1 = _unit(p2 - p1)
    b2 = p3 - p2
    v = b0 - jnp.sum(b0 * b1, axis=-1, keepdims=True) * b1
    w = b2 - jnp.sum(b2 * b1, axis=-1, keepdims=True) * b1
    x = jnp.sum(v * w, axis=-1)
    y = jnp.sum(jnp.cross(b1, v) * w, axis=-1)
    return jnp.arctan2(y, x)


def chain_zmatrix(n_atoms: int) -> np.ndarray:
    """Simple chain topology: atom i references (i-1, i-2, i-3).

    Rows for atoms 3..n-1, shape (n_atoms - 3, 3) of (j, k, l).
    """
    i = np.arange(3, n_atoms)
    return np.stack([i - 1, i - 2, i - 3], axis=1)


def bat_from_cartesian(coords: Array, zmatrix) -> Tuple[Array, Array, Array]:
    """Cartesian -> (bonds, angles, torsions).

    coords (..., A, 3); zmatrix (A-3, 3) rows (j, k, l) for atoms 3..A-1.
    Returns bonds (..., A-1), angles (..., A-2), torsions (..., A-3):
    bonds[0] = |x1 - x0|, bonds[1] = |x2 - x1|, then per Z-matrix row;
    angles[0] = angle(2, 1, 0), then per row; torsions per row.
    """
    z = np.asarray(zmatrix)
    A = coords.shape[-2]
    i = np.arange(3, A)
    bond_pairs = np.concatenate(
        [[[1, 0], [2, 1]], np.stack([i, z[:, 0]], axis=1)])
    angle_triples = np.concatenate(
        [[[2, 1, 0]], np.stack([i, z[:, 0], z[:, 1]], axis=1)])
    quads = np.stack([z[:, 2], z[:, 1], z[:, 0], i], axis=1)
    return (bond_lengths(coords, bond_pairs),
            bond_angles(coords, angle_triples),
            dihedrals(coords, quads))


def cartesian_from_bat(bonds: Array, angles: Array, torsions: Array,
                       zmatrix) -> Array:
    """(bonds, angles, torsions) -> Cartesian coordinates in the canonical
    frame (atom 0 at origin, atom 1 on +x, atom 2 in xy, y > 0).

    Batched over leading axes; the per-atom placement is a
    ``lax.fori_loop`` (NeRF), everything inside is vectorized over the
    batch.
    """
    z = jnp.asarray(np.asarray(zmatrix))
    batch = bonds.shape[:-1]
    A = bonds.shape[-1] + 1
    coords = jnp.zeros(batch + (A, 3), bonds.dtype)

    # Atom 1: +x at bond[0].
    coords = coords.at[..., 1, 0].set(bonds[..., 0])
    # Atom 2: bonded to atom 1, angle(2,1,0) = angles[0], in xy, y > 0.
    x2 = bonds[..., 0] - bonds[..., 1] * jnp.cos(angles[..., 0])
    y2 = bonds[..., 1] * jnp.sin(angles[..., 0])
    coords = coords.at[..., 2, 0].set(x2)
    coords = coords.at[..., 2, 1].set(y2)

    def body(n, coords):
        # Atom index i = n + 3; Z-matrix row n.
        j = z[n, 0]
        k = z[n, 1]
        l = z[n, 2]
        cj = jnp.take(coords, j, axis=-2)
        ck = jnp.take(coords, k, axis=-2)
        cl = jnp.take(coords, l, axis=-2)
        r = jnp.take(bonds, n + 2, axis=-1)[..., None]
        theta = jnp.take(angles, n + 1, axis=-1)[..., None]
        phi = jnp.take(torsions, n, axis=-1)[..., None]

        u1 = _unit(cj - ck)  # k -> j
        u2 = _unit(ck - cl)  # l -> k
        nvec = _unit(jnp.cross(u2, u1))
        mvec = jnp.cross(nvec, u1)
        d = (-jnp.cos(theta) * u1
             + jnp.sin(theta) * jnp.cos(phi) * mvec
             + jnp.sin(theta) * jnp.sin(phi) * nvec)
        pos = cj + r * d
        return jax.lax.dynamic_update_index_in_dim(coords, pos, n + 3,
                                                   axis=-2)

    return jax.lax.fori_loop(0, A - 3, body, coords)
