"""Triclinic-cell stack: minimum image, dense + cell-list LJ,
strain-derivative pressure tensor, anisotropic NPT MC.

Physics pins:
- sequential minimum image == brute-force 27-image search wherever the
  true separation is below half the minimum perpendicular width (the
  validity condition validate_cell enforces bounds for);
- diagonal cell -> exact agreement with the orthorhombic
  ``potentials.lennard_jones``;
- supercell extensivity in a SHEARED cell (2x2x2 copies -> 8x energy);
- strain-derivative virial == analytic LJ pair-virial sum;
- anisotropic NPT volume statistics == direct quadrature of
  ``V^N exp(-beta P V - beta U(h))`` (diagonal moves, cell-only U);
- full NPT on an LJ fluid: mean virial pressure == set pressure.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu import triclinic as tc
from vaemolsim_tpu.potentials import lennard_jones

CELL = np.array([[6.0, 0.0, 0.0],
                 [1.8, 6.5, 0.0],
                 [-1.2, 1.9, 7.0]])


class TestGeometry:
    def test_validate_rejects_upper_triangle(self):
        with pytest.raises(ValueError, match="LOWER triangular"):
            tc.validate_cell(CELL.T)

    def test_validate_rejects_big_tilt(self):
        bad = CELL.copy()
        bad[1, 0] = 4.0  # > ax/2 = 3
        with pytest.raises(ValueError, match="tilt"):
            tc.validate_cell(bad)

    def test_orthorhombic_shorthand(self):
        h = tc.validate_cell([3.0, 4.0, 5.0])
        np.testing.assert_allclose(h, np.diag([3.0, 4.0, 5.0]))

    def test_volume_and_widths(self):
        h = jnp.asarray(CELL)
        assert float(tc.cell_volume(h)) == pytest.approx(
            float(np.linalg.det(CELL)))
        w = np.asarray(tc.perpendicular_widths(h))
        # w_k = V / |cross of the other two rows|
        v = abs(np.linalg.det(CELL))
        for k, (i, j) in enumerate([(1, 2), (0, 2), (0, 1)]):
            want = v / np.linalg.norm(np.cross(CELL[i], CELL[j]))
            assert w[k] == pytest.approx(want, rel=1e-6)

    def test_wrap_round_trip(self):
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(64, 3)) * 20.0, jnp.float32)
        xw = tc.wrap(x, jnp.asarray(CELL, jnp.float32))
        s = np.asarray(tc.to_fractional(xw, jnp.asarray(CELL,
                                                        jnp.float32)))
        assert (s > -1e-5).all() and (s < 1.0 + 1e-5).all()
        # wrap changes coords by lattice vectors only
        ds = np.asarray(tc.to_fractional(x - xw,
                                         jnp.asarray(CELL, jnp.float32)))
        np.testing.assert_allclose(ds, np.round(ds), atol=1e-4)

    def test_min_image_matches_brute_force(self):
        rng = np.random.default_rng(1)
        d = rng.normal(size=(500, 3)) * 8.0
        h = jnp.asarray(CELL, jnp.float32)
        seq = np.asarray(tc.min_image(jnp.asarray(d, dtype=jnp.float32),
                                      h))
        # brute force over 5^3 images
        shifts = np.stack(np.meshgrid(*[np.arange(-2, 3)] * 3,
                                      indexing="ij"),
                          -1).reshape(-1, 3) @ CELL
        alld = d[:, None, :] - shifts[None, :, :]
        brute = np.min(np.linalg.norm(alld, axis=-1), axis=1)
        w_half = float(np.min(np.asarray(
            tc.perpendicular_widths(h)))) / 2.0
        near = brute < w_half
        assert near.sum() > 50  # the pin actually exercises something
        np.testing.assert_allclose(np.linalg.norm(seq, axis=-1)[near],
                                   brute[near], rtol=1e-5, atol=1e-4)


class TestDenseLJ:
    def test_diagonal_cell_matches_orthorhombic(self):
        rng = np.random.default_rng(2)
        box = [7.0, 8.0, 9.0]
        x = jnp.asarray(rng.uniform(size=(40, 3)) * np.asarray(box),
                        jnp.float32)
        e_ref = lennard_jones(box=box, cutoff=2.5, shift=True)
        e_tri = tc.lennard_jones_triclinic(cutoff=2.5, shift=True)
        got = float(e_tri(x, jnp.asarray(np.diag(box), jnp.float32)))
        assert got == pytest.approx(float(e_ref(x)), rel=1e-5)

    def test_supercell_extensivity_sheared(self):
        """Same infinite crystal described by H and by 2H with 8 copies
        -> exactly 8x the energy (cutoff < half min perp width of H)."""
        h = jnp.asarray(CELL, jnp.float32)
        x = tc.lattice_in_cell(27, CELL) + 0.1  # break symmetry a bit
        e = tc.lennard_jones_triclinic(cutoff=2.2, shift=False)
        e1 = float(e(x, h))
        shifts = jnp.asarray(
            np.stack(np.meshgrid(*[[0, 1]] * 3, indexing="ij"),
                     -1).reshape(-1, 1, 3) @ CELL, jnp.float32)
        x8 = (x[None, :, :] + shifts).reshape(-1, 3)
        e8 = float(e(x8, 2.0 * h))
        assert e8 == pytest.approx(8.0 * e1, rel=1e-4)

    def test_batched_cells(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.uniform(size=(2, 30, 3)) * 5.0, jnp.float32)
        cells = jnp.stack([jnp.asarray(CELL, jnp.float32),
                           jnp.asarray(np.diag([7.0, 7.0, 7.0]),
                                       jnp.float32)])
        e = tc.lennard_jones_triclinic(cutoff=2.5)
        out = e(x, cells)
        assert out.shape == (2,)
        assert float(out[1]) == pytest.approx(
            float(e(x[1], cells[1])), rel=1e-6)


class TestCellList:
    def test_matches_dense(self):
        rng = np.random.default_rng(4)
        h3 = jnp.asarray(3.0 * CELL, jnp.float32)  # >=3 bins per axis
        n = 300
        s = rng.uniform(size=(n, 3)).astype(np.float32)
        x = jnp.asarray(s) @ h3
        build, e_cell = tc.lennard_jones_cell_triclinic(
            3.0 * CELL, cutoff=2.5, skin=0.4, capacity=32)
        e_dense = tc.lennard_jones_triclinic(cutoff=2.5)
        nl = build(x)
        got = float(jax.jit(e_cell)(nl, x))
        want = float(e_dense(x, h3))
        assert got == pytest.approx(want, rel=1e-5)
        # forces through the cell list agree with dense autodiff
        g1 = jax.jit(jax.grad(lambda xx: e_cell(build(xx), xx)))(x)
        g2 = jax.jit(jax.grad(lambda xx: e_dense(xx, h3)))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-3, atol=1e-4)

    def test_capacity_overflow_naans(self):
        h3 = 3.0 * CELL
        x = jnp.zeros((40, 3), jnp.float32) + 0.5  # all in one bin
        build, e_cell = tc.lennard_jones_cell_triclinic(
            h3, cutoff=2.5, skin=0.4, capacity=8)
        assert not np.isfinite(float(e_cell(build(x), x)))

    def test_too_small_cell_raises(self):
        with pytest.raises(ValueError, match="bins"):
            tc.lennard_jones_cell_triclinic(CELL, cutoff=2.5, skin=0.4)


class TestPressureTensor:
    def test_strain_derivative_matches_pair_virial(self):
        rng = np.random.default_rng(5)
        h = jnp.asarray(2.0 * CELL, jnp.float32)
        x = jnp.asarray(rng.uniform(size=(60, 3)), jnp.float32) @ h
        e = tc.lennard_jones_triclinic(cutoff=2.5, shift=True)
        p = tc.pressure_tensor(e, x, h, kT=1.0)
        # analytic pair virial: sum_{i<j} d (x) f_pair / V  (+ NkT I)
        d = np.asarray(x)[:, None, :] - np.asarray(x)[None, :, :]
        d = np.asarray(tc.min_image(jnp.asarray(d), h))
        r2 = (d ** 2).sum(-1)
        iu = np.triu_indices(60, k=1)
        dv, r2v = d[iu], r2[iu]
        m = r2v < 2.5 ** 2
        dv, r2v = dv[m], r2v[m]
        s6 = (1.0 / r2v) ** 3
        # f = -dU/dr * rhat; dU/dr = 4(-12 r^-13 + 6 r^-7)
        # pair virial contribution d (x) f with f on atom i
        fmag_over_r = 24.0 * (2.0 * s6 * s6 - s6) / r2v  # = -u'(r)/r
        vir = np.einsum("pa,pb->ab", dv * fmag_over_r[:, None], dv)
        want = (60 * 1.0 * np.eye(3) + vir) / float(tc.cell_volume(h))
        np.testing.assert_allclose(np.asarray(p), want, rtol=1e-3,
                                   atol=1e-4)

    def test_kinetic_part_from_velocities(self):
        h = jnp.asarray(2.0 * CELL, jnp.float32)
        x = tc.lattice_in_cell(27, 2.0 * CELL)
        v = jnp.asarray(np.random.default_rng(6).normal(
            size=(27, 3)), jnp.float32)
        e = tc.lennard_jones_triclinic(cutoff=2.5)
        p1 = tc.pressure_tensor(e, x, h, v=v)
        p2 = tc.pressure_tensor(e, x, h, kT=0.0)
        dk = np.asarray(p1 - p2) * float(tc.cell_volume(h))
        np.testing.assert_allclose(
            dk, np.asarray(tc.kinetic_tensor(v)), rtol=1e-4, atol=1e-4)


class TestNPT:
    def test_volume_statistics_match_quadrature(self):
        """Diagonal-move NPT with a cell-only harmonic energy and V^N
        Jacobian: <V> and <V^2> against direct 3-D quadrature of
        exp(N sum ln h_ii - beta P V - beta k/2 sum (h_ii - L0)^2)."""
        N, bP, k, L0 = 5, 0.8, 6.0, 2.0

        def energy(x, cell):
            diag = jnp.stack([cell[..., 0, 0], cell[..., 1, 1],
                              cell[..., 2, 2]], -1)
            return 0.5 * k * jnp.sum((diag - L0) ** 2, -1)

        x0 = jnp.zeros((512, N, 3), jnp.float32)
        st = tc.npt_triclinic_init(energy, x0, np.diag([L0] * 3),
                                   jax.random.PRNGKey(0))
        step = tc.make_npt_triclinic_step(
            energy, beta=1.0, pressure=bP, dx_scale=0.0, dh_scale=0.25,
            diagonal_only=True)
        st, _ = jax.jit(lambda s: tc.run_npt_triclinic(step, s, 500))(st)
        st, traj = jax.jit(lambda s: tc.run_npt_triclinic(
            step, s, 2000, collect_every=20))(st)
        vs = np.asarray(traj["volume"]).ravel()

        # quadrature over (h1, h2, h3)
        g = np.linspace(0.3, 5.5, 160)
        H1, H2, H3 = np.meshgrid(g, g, g, indexing="ij")
        V = H1 * H2 * H3
        logw = (N * np.log(V) - bP * V
                - 0.5 * k * ((H1 - L0) ** 2 + (H2 - L0) ** 2
                             + (H3 - L0) ** 2))
        w = np.exp(logw - logw.max())
        vbar = (w * V).sum() / w.sum()
        v2bar = (w * V ** 2).sum() / w.sum()
        assert vs.mean() == pytest.approx(vbar, rel=0.03)
        assert (vs ** 2).mean() == pytest.approx(v2bar, rel=0.06)

    def test_lj_npt_virial_matches_set_pressure(self):
        """Full anisotropic NPT (tilts included) on a small LJ fluid:
        time-averaged virial pressure == set pressure; mean
        off-diagonal stress ~ 0; cells stay legal."""
        # Gas-ish state (rho* ~ 0.23) so the min_perp validity floor
        # stays interior — measured in-session: p_iso 0.491 at P 0.5.
        n, kT, P = 48, 2.0, 0.5
        e = tc.lennard_jones_triclinic(cutoff=2.0, shift=True)
        cell0 = np.diag([5.8, 5.8, 5.8])
        x0 = jnp.broadcast_to(tc.lattice_in_cell(n, cell0),
                              (256, n, 3))
        st = tc.npt_triclinic_init(e, x0, cell0, jax.random.PRNGKey(1))
        step = tc.make_npt_triclinic_step(
            e, beta=1.0 / kT, pressure=P, dx_scale=0.02, dh_scale=0.08,
            min_perp=4.0)
        st, _ = jax.jit(lambda s: tc.run_npt_triclinic(step, s, 3000))(st)
        assert 0.05 < float(st.disp_acceptance_rate) < 0.95
        assert 0.02 < float(st.cell_acceptance_rate) < 0.98

        samples = []
        run200 = jax.jit(lambda s: tc.run_npt_triclinic(step, s, 200)[0])
        pfun = jax.jit(jax.vmap(
            lambda xx, hh: tc.pressure_tensor(e, xx, hh, kT=kT)))
        for _ in range(10):
            st = run200(st)
            samples.append(np.asarray(pfun(st.x, st.cell)))
        p = np.concatenate(samples)               # (chains*10, 3, 3)
        p_iso = np.trace(p, axis1=-2, axis2=-1).mean() / 3.0
        assert p_iso == pytest.approx(P, abs=0.06)
        off = (np.abs(p[..., 0, 1].mean()) + np.abs(p[..., 0, 2].mean())
               + np.abs(p[..., 1, 2].mean()))
        assert off < 0.05
        # every chain's cell still satisfies the restricted bounds
        for h in np.asarray(st.cell)[:8]:
            tc.validate_cell(h)
