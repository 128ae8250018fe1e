"""Triclinic Ewald electrostatics (`triclinic.ewald_coulomb_triclinic`)
— the charged completion of the sheared-cell stack (VERDICT r4 item 4).

Physics pins:
- NaCl Madelung constant reproduced in a SHEARED (unimodular
  supercell) representation of the rock-salt lattice — an absolute
  literature golden evaluated through every triclinic code path
  (dual-basis k-vectors, sequential min image, traced cell);
- orthorhombic limit: a diagonal cell matches
  ``potentials.ewald_coulomb`` exactly (same mode set, same split);
- lattice re-representation invariance: shearing the cell by a whole
  cell vector (b -> b + a, a unimodular transform of the SAME lattice)
  leaves the energy unchanged;
- alpha-invariance in a sheared cell (the real/reciprocal/self split
  must cancel exactly for ANY alpha, triclinic geometry included);
- forces and the strain-derivative virial match finite differences
  (the reciprocal-space pressure term flows through the elementwise
  dual-basis autodiff);
- excluded (bonded) pairs: orthorhombic-limit parity with the
  reference-split ``ewald_coulomb(exclude=...)`` and alpha-invariance
  with exclusions active.

Reference seam closed: vaemolsim has no periodic electrostatics at
all; this extends the repo's own ``potentials.ewald_coulomb``
(orthorhombic, reference losses.py:69-120 ``potential(samples)``
contract) to the general cells of ``triclinic.py``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu import triclinic as tc
from vaemolsim_tpu.potentials import ewald_coulomb

MADELUNG_NACL = 1.7475645946331822

# A well-sheared but valid restricted-triclinic cell.
CELL = np.array([[6.0, 0.0, 0.0],
                 [1.8, 6.5, 0.0],
                 [-1.2, 1.9, 7.0]])


def _neutral_system(n, seed, cell):
    rs = np.random.RandomState(seed)
    s = rs.uniform(0, 1, (n, 3))
    x = jnp.asarray(s @ np.asarray(cell), jnp.float32)
    q = rs.normal(size=n)
    q -= q.mean()
    return x, q


class TestTriclinicEwald:
    def test_nacl_madelung_in_sheared_supercell(self):
        # Rock salt as a sheared supercell: rows (4,0,0), (2,2,0),
        # (0,0,2) are all lattice translations of the NaCl crystal
        # (charge parity preserved), volume = 2 conventional cells =
        # 16 ions; the fundamental domain is the 4 x 2 x 2 block of
        # integer sites.  U_total = -N_ions * M / 2 at spacing 1.
        cell = np.array([[4.0, 0.0, 0.0],
                         [2.0, 2.0, 0.0],
                         [0.0, 0.0, 2.0]])
        g = np.stack(np.meshgrid(np.arange(4), np.arange(2),
                                 np.arange(2), indexing="ij"),
                     -1).reshape(-1, 3).astype(np.float64)
        qs = np.asarray([(-1.0) ** int(s.sum()) for s in g])
        u = tc.ewald_coulomb_triclinic(qs, reference_cell=cell,
                                       r_cutoff=0.99, tolerance=1e-7)
        got = float(u(jnp.asarray(g, jnp.float32), jnp.asarray(cell)))
        np.testing.assert_allclose(got, -8.0 * MADELUNG_NACL,
                                   rtol=1e-5)

    def test_orthorhombic_limit_matches_ewald_coulomb(self):
        box = [5.0, 6.0, 7.0]
        cell = np.diag(box)
        x, q = _neutral_system(20, 0, cell)
        ut = tc.ewald_coulomb_triclinic(q, reference_cell=cell,
                                        r_cutoff=2.4, tolerance=1e-6)
        uo = ewald_coulomb(q, box=box, r_cutoff=2.4, tolerance=1e-6)
        np.testing.assert_allclose(float(ut(x, jnp.asarray(cell))),
                                   float(uo(x)), rtol=2e-5)

    def test_lattice_rerepresentation_invariance(self):
        # b -> b + a is a unimodular transform: the same lattice, the
        # same physical system, so the energy must not change.  Base
        # cell chosen so both representations satisfy the tilt bounds.
        base = np.array([[6.0, 0.0, 0.0],
                         [-3.0, 6.5, 0.0],
                         [1.0, 1.5, 7.0]])
        sheared = base.copy()
        sheared[1] += base[0]                   # bx: -3 -> +3 = ax/2
        x, q = _neutral_system(24, 1, base)
        kw = dict(r_cutoff=2.4, tolerance=1e-6, alpha=1.4)
        u1 = tc.ewald_coulomb_triclinic(q, reference_cell=base, **kw)
        u2 = tc.ewald_coulomb_triclinic(q, reference_cell=sheared, **kw)
        e1 = float(u1(x, jnp.asarray(base)))
        e2 = float(u2(x, jnp.asarray(sheared)))
        np.testing.assert_allclose(e1, e2, rtol=3e-5)

    def test_alpha_invariance_sheared(self):
        x, q = _neutral_system(20, 2, CELL)
        es = [float(tc.ewald_coulomb_triclinic(
            q, reference_cell=CELL, r_cutoff=2.8, alpha=a,
            tolerance=1e-7)(x, jnp.asarray(CELL)))
            for a in (1.1, 1.4, 1.8)]
        assert max(es) - min(es) < 1e-4 * abs(es[0])

    def test_forces_match_finite_difference(self):
        x, q = _neutral_system(12, 3, CELL)
        x = np.asarray(x, np.float64)
        u = tc.ewald_coulomb_triclinic(q, reference_cell=CELL,
                                       r_cutoff=2.8, tolerance=1e-6)
        cell_j = jnp.asarray(CELL)
        g = np.asarray(jax.grad(lambda y: u(y, cell_j))(
            jnp.asarray(x, jnp.float32)))
        h = 1e-3
        for (i, a) in ((0, 0), (5, 1), (11, 2)):
            xp, xm = x.copy(), x.copy()
            xp[i, a] += h
            xm[i, a] -= h
            fd = (float(u(jnp.asarray(xp, jnp.float32), cell_j))
                  - float(u(jnp.asarray(xm, jnp.float32), cell_j))
                  ) / (2 * h)
            np.testing.assert_allclose(g[i, a], fd, rtol=2e-2,
                                       atol=2e-3)

    def test_strain_virial_matches_finite_difference(self):
        # The full (3, 3) strain derivative — including the
        # reciprocal-space term through the traced dual basis — against
        # central differences of U under x -> x(1+eps), H -> H(1+eps).
        x, q = _neutral_system(16, 4, CELL)
        u = tc.ewald_coulomb_triclinic(q, reference_cell=CELL,
                                       r_cutoff=2.8, tolerance=1e-6)
        cell_j = jnp.asarray(CELL, jnp.float32)
        eye = jnp.eye(3, dtype=jnp.float32)

        def u_of(eps):
            f = eye + eps
            return u(x @ f, cell_j @ f)

        vir = -np.asarray(jax.grad(u_of)(jnp.zeros((3, 3), jnp.float32)))
        h = 1e-3
        for (a, b) in ((0, 0), (1, 1), (2, 2), (1, 0), (2, 1)):
            ep = np.zeros((3, 3), np.float32)
            ep[a, b] = h
            fd = (float(u_of(jnp.asarray(ep)))
                  - float(u_of(jnp.asarray(-ep)))) / (2 * h)
            np.testing.assert_allclose(vir[a, b], -fd, rtol=4e-2,
                                       atol=5e-2)

    def test_exclusions_orthorhombic_parity_and_alpha_invariance(self):
        box = [6.0, 6.0, 6.0]
        cell = np.diag(box)
        x, q = _neutral_system(16, 5, cell)
        excl = np.asarray([[0, 1], [2, 3], [4, 5]])
        ut = tc.ewald_coulomb_triclinic(q, reference_cell=cell,
                                        r_cutoff=2.8, tolerance=1e-6,
                                        exclude=excl)
        uo = ewald_coulomb(q, box=box, r_cutoff=2.8, tolerance=1e-6,
                           exclude=excl)
        np.testing.assert_allclose(float(ut(x, jnp.asarray(cell))),
                                   float(uo(x)), rtol=2e-5)
        # alpha-invariance WITH exclusions in a sheared cell: a wrong
        # erf compensation would break the split cancellation.
        xs, qs = _neutral_system(16, 6, CELL)
        es = [float(tc.ewald_coulomb_triclinic(
            qs, reference_cell=CELL, r_cutoff=2.8, alpha=a,
            tolerance=1e-7, exclude=excl)(xs, jnp.asarray(CELL)))
            for a in (1.1, 1.6)]
        assert abs(es[0] - es[1]) < 1e-4 * abs(es[0])

    def test_batched_cells(self):
        x, q = _neutral_system(10, 7, CELL)
        u = tc.ewald_coulomb_triclinic(q, reference_cell=CELL,
                                       r_cutoff=2.8, tolerance=1e-6)
        cells = jnp.stack([jnp.asarray(CELL, jnp.float32),
                           1.05 * jnp.asarray(CELL, jnp.float32)])
        xs = jnp.stack([x, 1.05 * x])
        batched = u(xs, cells)
        assert batched.shape == (2,)
        np.testing.assert_allclose(
            float(batched[0]), float(u(x, jnp.asarray(CELL))),
            rtol=1e-6)
        np.testing.assert_allclose(
            float(batched[1]),
            float(u(1.05 * x, 1.05 * jnp.asarray(CELL))), rtol=1e-6)

    def test_cutoff_validation(self):
        q = np.asarray([1.0, -1.0])
        with pytest.raises(ValueError, match="perpendicular width"):
            tc.ewald_coulomb_triclinic(q, reference_cell=CELL,
                                       r_cutoff=4.0)

    def test_charge_shape_validation(self):
        with pytest.raises(ValueError, match="charges must be"):
            tc.ewald_coulomb_triclinic(np.ones((2, 2)),
                                       reference_cell=CELL,
                                       r_cutoff=2.0)
        u = tc.ewald_coulomb_triclinic(np.asarray([1.0, -1.0]),
                                       reference_cell=CELL,
                                       r_cutoff=2.0)
        with pytest.raises(ValueError, match="atoms"):
            u(jnp.zeros((3, 3)), jnp.asarray(CELL))


class TestTriclinicPME:
    """pme_coulomb(cell=...) — the O(N log N) triclinic reciprocal
    path: fractional-space B-spline spreading (the machinery is
    cell-agnostic once coordinates are fractional), dual-basis
    influence function, sequential-min-image corrections."""

    def test_matches_classic_triclinic_ewald(self):
        from vaemolsim_tpu.potentials import pme_coulomb
        x, q = _neutral_system(24, 10, CELL)
        kw = dict(r_cutoff=2.8, tolerance=1e-5)
        ue = tc.ewald_coulomb_triclinic(q, reference_cell=CELL, **kw)
        up = pme_coulomb(q, cell=CELL, **kw)
        e_ref = float(ue(x, jnp.asarray(CELL)))
        e_pme = float(up(x))
        np.testing.assert_allclose(e_pme, e_ref, rtol=2e-4)

    def test_diagonal_cell_matches_box_path(self):
        from vaemolsim_tpu.potentials import pme_coulomb
        box = [7.0, 8.0, 9.0]
        cell = np.diag(box)
        x, q = _neutral_system(20, 11, cell)
        kw = dict(r_cutoff=3.0, tolerance=1e-5)
        e_cell = float(pme_coulomb(q, cell=cell, **kw)(x))
        e_box = float(pme_coulomb(q, box=box, **kw)(x))
        np.testing.assert_allclose(e_cell, e_box, rtol=1e-6)

    def test_forces_match_finite_difference(self):
        from vaemolsim_tpu.potentials import pme_coulomb
        x, q = _neutral_system(12, 12, CELL)
        x = np.asarray(x, np.float64)
        u = pme_coulomb(q, cell=CELL, r_cutoff=2.8, tolerance=1e-5)
        g = np.asarray(jax.grad(u)(jnp.asarray(x, jnp.float32)))
        h = 1e-3
        for (i, a) in ((0, 0), (7, 1), (11, 2)):
            xp, xm = x.copy(), x.copy()
            xp[i, a] += h
            xm[i, a] -= h
            fd = (float(u(jnp.asarray(xp, jnp.float32)))
                  - float(u(jnp.asarray(xm, jnp.float32)))) / (2 * h)
            np.testing.assert_allclose(g[i, a], fd, rtol=3e-2,
                                       atol=3e-3)

    def test_spread_forms_agree_in_sheared_cell(self):
        from vaemolsim_tpu.potentials import pme_coulomb
        x, q = _neutral_system(16, 13, CELL)
        kw = dict(cell=CELL, r_cutoff=2.8, tolerance=1e-5)
        e_b = float(pme_coulomb(q, spread="binned", **kw)(x))
        e_s = float(pme_coulomb(q, spread="scatter", **kw)(x))
        np.testing.assert_allclose(e_b, e_s, rtol=2e-6)

    def test_exclusions_match_classic(self):
        from vaemolsim_tpu.potentials import pme_coulomb
        x, q = _neutral_system(16, 14, CELL)
        excl = np.asarray([[0, 1], [2, 3]])
        kw = dict(r_cutoff=2.8, tolerance=1e-5, exclude=excl)
        e_ref = float(tc.ewald_coulomb_triclinic(
            q, reference_cell=CELL, **kw)(x, jnp.asarray(CELL)))
        e_pme = float(pme_coulomb(q, cell=CELL, **kw)(x))
        np.testing.assert_allclose(e_pme, e_ref, rtol=2e-4)

    def test_validation(self):
        from vaemolsim_tpu.potentials import pme_coulomb
        q = np.asarray([1.0, -1.0])
        with pytest.raises(ValueError, match="exactly one of"):
            pme_coulomb(q, r_cutoff=1.0)
        with pytest.raises(ValueError, match="exactly one of"):
            pme_coulomb(q, box=[5.0] * 3, cell=CELL, r_cutoff=1.0)
        with pytest.raises(ValueError, match="perpendicular width"):
            pme_coulomb(q, cell=CELL, r_cutoff=4.0)
