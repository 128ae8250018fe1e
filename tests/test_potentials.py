"""Molecular potential terms against hand-computed geometries, numeric
gradients, and equilibrium statistics from the production HMC kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu import potentials
from vaemolsim_tpu.potentials import (as_log_prob, com_restraint, composite,
                                      exclusions_from_bonds, harmonic_angles,
                                      harmonic_bonds, lennard_jones,
                                      minimize_energy,
                                      periodic_torsions)


class TestBonded:

    def test_bond_energy_hand_computed(self):
        u = harmonic_bonds([[0, 1]], k=10.0, r0=1.0)
        x = jnp.asarray([[0.0, 0.0, 0.0], [1.5, 0.0, 0.0]])
        np.testing.assert_allclose(float(u(x)), 0.5 * 10.0 * 0.25, atol=1e-6)
        # Batched: leading axes broadcast.
        xb = jnp.stack([x, x * 2.0])
        assert u(xb).shape == (2,)
        np.testing.assert_allclose(float(u(xb)[1]), 0.5 * 10.0 * 4.0,
                                   atol=1e-5)

    def test_bond_per_term_constants(self):
        u = harmonic_bonds([[0, 1], [1, 2]], k=[2.0, 4.0], r0=[1.0, 2.0])
        x = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0], [1.0, 3.0, 0]])
        np.testing.assert_allclose(float(u(x)), 0.5 * 4.0 * 1.0, atol=1e-6)

    def test_angle_right_angle(self):
        u = harmonic_angles([[0, 1, 2]], k=2.0, theta0=np.pi)
        x = jnp.asarray([[1.0, 0, 0], [0.0, 0, 0], [0.0, 1.0, 0]])  # 90 deg
        np.testing.assert_allclose(float(u(x)), 0.5 * 2.0 * (np.pi / 2) ** 2,
                                   rtol=1e-5)

    def test_angle_gradient_stable_near_linear(self):
        """atan2 form: finite gradients where arccos' derivative blows
        up (the near-linear geometry every polymer passes through)."""
        u = harmonic_angles([[0, 1, 2]], k=1.0, theta0=2.0)
        x = jnp.asarray([[1.0, 1e-4, 0.0], [0.0, 0.0, 0.0],
                         [-1.0, 1e-4, 0.0]])
        g = jax.grad(lambda x: u(x))(x)
        assert np.isfinite(np.asarray(g)).all()

    def test_torsion_trans_and_cis(self):
        # Planar zig-zag: phi = pi (trans); mirrored last atom: phi = 0.
        u = periodic_torsions([[0, 1, 2, 3]], k=1.5, n=1, phase=0.0)
        trans = jnp.asarray([[0.0, 1, 0], [0, 0, 0], [1, 0, 0], [1, -1, 0]])
        cis = jnp.asarray([[0.0, 1, 0], [0, 0, 0], [1, 0, 0], [1, 1, 0]])
        # U = k (1 + cos(phi)): trans -> 0, cis -> 2k
        np.testing.assert_allclose(float(u(trans)), 0.0, atol=1e-5)
        np.testing.assert_allclose(float(u(cis)), 3.0, atol=1e-5)

    def test_torsion_matches_coords_convention(self):
        """The dihedral underlying the energy is exactly coords.dihedrals
        (one sign convention everywhere — load-bearing for phases)."""
        from vaemolsim_tpu.coords import dihedrals
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (5, 4, 3))
        phase = 0.7
        u = periodic_torsions([[0, 1, 2, 3]], k=1.0, n=1.0, phase=phase)
        phi = dihedrals(x, [[0, 1, 2, 3]])[:, 0]
        np.testing.assert_allclose(np.asarray(u(x)),
                                   np.asarray(1.0 + jnp.cos(phi - phase)),
                                   rtol=1e-4, atol=1e-5)

    def test_index_shape_validation(self):
        with pytest.raises(ValueError, match="bonds"):
            harmonic_bonds([0, 1], 1.0, 1.0)
        with pytest.raises(ValueError, match="angles"):
            harmonic_angles([[0, 1]], 1.0, 1.0)
        with pytest.raises(ValueError, match="torsions"):
            periodic_torsions([[0, 1, 2]], 1.0, 1, 0.0)


class TestLennardJones:

    def test_dimer_minimum(self):
        """Two atoms at r = 2^(1/6) sigma sit at exactly -epsilon."""
        u = lennard_jones(sigma=1.0, epsilon=2.5)
        r_min = 2.0 ** (1.0 / 6.0)
        x = jnp.asarray([[0.0, 0, 0], [r_min, 0, 0]])
        np.testing.assert_allclose(float(u(x)), -2.5, rtol=1e-6)

    def test_cutoff_shift_continuity(self):
        """Shifted truncation: energy -> 0 continuously at the cutoff."""
        u = lennard_jones(cutoff=2.5)
        just_in = jnp.asarray([[0.0, 0, 0], [2.4999, 0, 0]])
        outside = jnp.asarray([[0.0, 0, 0], [2.5001, 0, 0]])
        assert abs(float(u(just_in))) < 1e-3
        assert float(u(outside)) == 0.0

    def test_minimum_image(self):
        """Atoms across a periodic boundary interact at the wrapped
        distance (same convention as nn.mappings DistanceSelection)."""
        u = lennard_jones(sigma=1.0, epsilon=1.0, box=[10.0, 10.0, 10.0])
        r_min = 2.0 ** (1.0 / 6.0)
        x = jnp.asarray([[0.1, 0, 0], [10.1 - r_min, 0, 0]])
        np.testing.assert_allclose(float(u(x)), -1.0, rtol=1e-5)

    def test_per_atom_lorentz_berthelot(self):
        sig = jnp.asarray([1.0, 3.0])   # -> sig_ij = 2.0
        eps = jnp.asarray([1.0, 4.0])   # -> eps_ij = 2.0
        u = lennard_jones(sigma=sig, epsilon=eps)
        x = jnp.asarray([[0.0, 0, 0], [2.0 * 2 ** (1 / 6), 0, 0]])
        np.testing.assert_allclose(float(u(x)), -2.0, rtol=1e-6)

    def test_exclusions(self):
        bonds = [[0, 1], [1, 2]]
        excl = exclusions_from_bonds(3, bonds)
        # 1-2 and 1-3 all excluded in a 3-chain => no pairs left.
        u = lennard_jones(exclude=excl)
        x = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0]])
        assert float(u(x)) == 0.0
        # Without through-angle exclusion the 0-2 pair survives.
        u13 = lennard_jones(exclude=exclusions_from_bonds(
            3, bonds, through_angles=False))
        assert float(u13(x)) != 0.0

    def test_masked_pairs_do_not_poison_gradients(self):
        """Coincident EXCLUDED atoms must not NaN the force."""
        excl = exclusions_from_bonds(2, [[0, 1]])
        u = lennard_jones(exclude=excl)
        x = jnp.zeros((2, 3))  # both atoms at the origin
        g = jax.grad(lambda x: u(x))(x)
        assert np.isfinite(np.asarray(g)).all()


class TestComposition:

    def test_composite_sums_and_jits(self):
        bonds = [[0, 1], [1, 2]]
        ff = composite(
            harmonic_bonds(bonds, 100.0, 1.0),
            lennard_jones(exclude=exclusions_from_bonds(3, bonds)),
            com_restraint(5.0))
        x = jax.random.normal(jax.random.PRNGKey(0), (7, 3, 3))
        e = jax.jit(ff)(x)
        assert e.shape == (7,)
        assert np.isfinite(np.asarray(e)).all()

    def test_numeric_gradient(self):
        """Forces agree with central finite differences (the quantity
        MALA/HMC consume)."""
        ff = composite(
            harmonic_bonds([[0, 1], [1, 2]], 10.0, 1.0),
            harmonic_angles([[0, 1, 2]], 3.0, 1.9),
            lennard_jones(exclude=exclusions_from_bonds(
                3, [[0, 1], [1, 2]], through_angles=False)))
        x = np.asarray([[0.0, 0.1, 0], [1.1, 0, 0], [1.9, 0.9, 0.2]],
                       np.float64)
        g = np.asarray(jax.grad(lambda x: ff(x))(jnp.asarray(x, jnp.float32)))
        h = 1e-4
        for a in range(3):
            for d in range(3):
                xp, xm = x.copy(), x.copy()
                xp[a, d] += h
                xm[a, d] -= h
                fd = (float(ff(jnp.asarray(xp, jnp.float32)))
                      - float(ff(jnp.asarray(xm, jnp.float32)))) / (2 * h)
                np.testing.assert_allclose(g[a, d], fd, rtol=2e-2, atol=2e-3)

    def test_as_log_prob_convention_and_beta(self):
        u = harmonic_bonds([[0, 1]], 2.0, 0.0)
        lp = as_log_prob(u, beta=0.5)
        x = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0]])
        np.testing.assert_allclose(float(lp(x)), -0.5 * float(u(x)),
                                   atol=1e-6)

    def test_composite_empty_raises(self):
        with pytest.raises(ValueError, match="at least one"):
            composite()


class TestEquilibrium:

    def test_hmc_bond_distribution(self):
        """Sample a stiff harmonic dimer with the production HMC kernel:
        the bond-length distribution must match the analytic radial
        Boltzmann result (mean and width) — potentials, gradients, and
        sampler agreeing end-to-end."""
        from vaemolsim_tpu.mcmc import MCMCState, make_hmc_step, run_mcmc

        k_spring, r0 = 200.0, 1.0
        pot = composite(harmonic_bonds([[0, 1]], k_spring, r0),
                        com_restraint(10.0))
        lp = as_log_prob(pot)
        x0 = jnp.asarray([[0.0, 0, 0], [r0, 0, 0]])[None].repeat(512, 0)
        st = MCMCState.create(x0, lp(x0), jax.random.PRNGKey(0))
        step = make_hmc_step(lp, step_size=0.05, n_leapfrog=10)
        st, _ = jax.jit(lambda s: run_mcmc(step, s, 800))(st)
        assert 0.6 < float(st.acceptance_rate) <= 1.0
        r = np.asarray(jnp.linalg.norm(st.configs[:, 0] - st.configs[:, 1],
                                       axis=-1))
        # Radial density r^2 exp(-k(r-r0)^2/2): mean = r0 + 2/(k r0) + ...
        sig = 1.0 / np.sqrt(k_spring)
        assert abs(r.mean() - (r0 + 2 * sig ** 2 / r0)) < 4 * sig / np.sqrt(
            len(r) / 10) + 0.01
        assert abs(r.std() - sig) < 0.02

    def test_all_local_kernels_accept_molecular_rank(self):
        """random_walk / MALA / HMC all run on (chains, atoms, 3)
        configurations (the event axes are inferred from the energy
        rank — regression for the flat-dof-only assumption)."""
        from vaemolsim_tpu.mcmc import (MCMCState, make_hmc_step,
                                        make_mala_step,
                                        make_random_walk_step, run_mcmc)

        lp = as_log_prob(composite(harmonic_bonds([[0, 1]], 50.0, 1.0),
                                   com_restraint(5.0)))
        x0 = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0]])[None].repeat(64, 0)
        for make in (lambda f: make_random_walk_step(f, 0.1),
                     lambda f: make_mala_step(f, 0.005),
                     lambda f: make_hmc_step(f, 0.05, 5)):
            st = MCMCState.create(x0, lp(x0), jax.random.PRNGKey(0))
            st, _ = jax.jit(lambda s, step=make(lp): run_mcmc(step, s, 50))(st)
            assert st.configs.shape == (64, 2, 3)
            assert 0.0 < float(st.acceptance_rate) <= 1.0
            assert np.isfinite(np.asarray(st.energies)).all()


class TestMinimize:

    def test_dimer_relaxes_to_lj_minimum(self):
        from vaemolsim_tpu.potentials import minimize_energy

        u = lennard_jones(sigma=1.0, epsilon=1.0)
        x0 = jnp.asarray([[0.0, 0, 0], [0.8, 0, 0]])  # compressed
        x = minimize_energy(u, x0, steps=2000, lr=0.01)
        r = float(jnp.linalg.norm(x[0] - x[1]))
        np.testing.assert_allclose(r, 2.0 ** (1 / 6), rtol=1e-3)
        np.testing.assert_allclose(float(u(x)), -1.0, rtol=1e-5)

    def test_overlapping_cluster_becomes_sane_and_batched(self):
        """Random overlapping placements (astronomical r^-12 energies)
        relax to negative cluster energies — the clip keeps the first
        steps from catapulting atoms."""
        from vaemolsim_tpu.potentials import minimize_energy

        pot = composite(lennard_jones(), com_restraint(1.0))
        x0 = 0.5 * jax.random.normal(jax.random.PRNGKey(0), (16, 7, 3))
        assert float(jnp.max(pot(x0))) > 1e6  # genuinely pathological
        x = minimize_energy(pot, x0, steps=2000, lr=0.1)
        e = np.asarray(pot(x))
        assert (e < -14.0).all()  # LJ7 minima (global is -16.5)

    def test_linear_core_continuity_and_finite_forces(self):
        """The linear core continuation is value/slope-matched at
        0.3 sigma, and energies/forces stay finite even at r = 1e-4
        (where bare r^-12 gradients overflow float32)."""
        from vaemolsim_tpu.potentials import lennard_jones

        u = lennard_jones(sigma=1.0, epsilon=1.0)

        def pair(r):
            return u(jnp.asarray([[0.0, 0, 0], [r, 0, 0]]))

        # Continuity across the switch.
        below, above = float(pair(0.3 - 1e-4)), float(pair(0.3 + 1e-4))
        assert abs(below - above) / abs(above) < 1e-2
        # Slope match: the (constant) core slope equals the analytic LJ
        # derivative at the switch radius.
        h = 1e-4
        d_core = (float(pair(0.2 + h)) - float(pair(0.2 - h))) / (2 * h)
        rc = 0.3
        d_lj_rc = 24.0 / rc * ((1 / rc) ** 6 - 2.0 * (1 / rc) ** 12)
        assert abs(d_core - d_lj_rc) / abs(d_lj_rc) < 1e-3
        # Deep overlap: finite and strongly repulsive force.
        x = jnp.asarray([[0.0, 0, 0], [1e-4, 0, 0]])
        g = np.asarray(jax.grad(lambda x: u(x))(x))
        assert np.isfinite(g).all() and np.abs(g).max() > 1e6
        # Coincident unmasked atoms: zero (not NaN) force.
        g0 = np.asarray(jax.grad(lambda x: u(x))(jnp.zeros((2, 3))))
        assert np.isfinite(g0).all()


class TestReviewRegressions:

    def test_angles_2d_with_three_triples(self):
        """2-D coords with exactly 3 angle triples: the 3-D/2-D cross
        dispatch must key on the coordinate dim, not the triple count."""
        triples = [[0, 1, 2], [1, 2, 3], [2, 3, 4]]
        u = harmonic_angles(triples, k=1.0, theta0=1.0)
        x2 = jnp.asarray([[0.0, 0], [1, 0], [1, 1], [2, 1], [2, 2]])
        # Same chain embedded in 3-D must give the identical energy.
        x3 = jnp.concatenate([x2, jnp.zeros((5, 1))], axis=-1)
        np.testing.assert_allclose(float(u(x2)), float(u(x3)), rtol=1e-6)


class TestSoftCore:

    def test_lambda_one_matches_full_lj(self):
        from vaemolsim_tpu.potentials import lennard_jones_softcore

        alch = np.asarray([True, False, False])
        u_sc = lennard_jones_softcore(sigma=1.0, epsilon=1.0,
                                      alchemical=alch)
        u_lj = lennard_jones(sigma=1.0, epsilon=1.0)
        x = jnp.asarray([[0.0, 0, 0], [1.3, 0, 0], [0.5, 1.2, 0]])
        np.testing.assert_allclose(float(u_sc(x, 1.0)), float(u_lj(x)),
                                   rtol=1e-5)

    def test_lambda_zero_decouples(self):
        from vaemolsim_tpu.potentials import lennard_jones_softcore

        alch = np.asarray([True, False, False])
        u_sc = lennard_jones_softcore(alchemical=alch)
        u_lj = lennard_jones()
        x = jnp.asarray([[0.0, 0, 0], [1.3, 0, 0], [0.5, 1.2, 0]])
        # Only the environment pair (1,2) remains.
        env = u_lj(x[1:])
        np.testing.assert_allclose(float(u_sc(x, 0.0)), float(env),
                                   rtol=1e-5)

    def test_finite_at_overlap_for_intermediate_lambda(self):
        from vaemolsim_tpu.potentials import lennard_jones_softcore

        alch = np.asarray([True, False])
        u = lennard_jones_softcore(alchemical=alch)
        x = jnp.asarray([[0.0, 0, 0], [1e-6, 0, 0]])  # inserted inside
        for lam in (0.1, 0.5, 0.9):
            e = float(u(x, lam))
            g = np.asarray(jax.grad(lambda x: u(x, lam))(x))
            assert np.isfinite(e) and np.isfinite(g).all(), lam
        # Beutler value at r=0: 4 eps lam (1/(a(1-l))^2 - 1/(a(1-l))).
        a = 0.5
        lam = 0.5
        want = 4 * lam * (1 / (a * (1 - lam)) ** 2 - 1 / (a * (1 - lam)))
        np.testing.assert_allclose(float(u(jnp.zeros((2, 3)), lam)), want,
                                   rtol=1e-4)

    def test_dudl_via_autodiff_matches_finite_difference(self):
        from vaemolsim_tpu.potentials import lennard_jones_softcore

        alch = np.asarray([True, False, False, False])
        u = lennard_jones_softcore(alchemical=alch)
        x = jax.random.normal(jax.random.PRNGKey(0), (5, 4, 3)) * 1.5
        lam = 0.63
        dudl = np.asarray(jax.grad(
            lambda l: jnp.sum(u(x, l)))(jnp.float32(lam)))
        h = 1e-3
        fd = (np.asarray(jnp.sum(u(x, lam + h)))
              - np.asarray(jnp.sum(u(x, lam - h)))) / (2 * h)
        np.testing.assert_allclose(dudl, fd, rtol=1e-2)

    def test_env_pairs_lambda_independent(self):
        from vaemolsim_tpu.potentials import lennard_jones_softcore

        alch = np.asarray([True, False, False])
        u = lennard_jones_softcore(alchemical=alch)
        x = jnp.asarray([[9.0, 9, 9], [1.3, 0, 0], [0.5, 1.2, 0]])
        # Alchemical atom far away: energy is the env pair at every lam.
        vals = [float(u(x, l)) for l in (0.0, 0.3, 0.7, 1.0)]
        np.testing.assert_allclose(vals, vals[0], atol=1e-4)


class TestCellList:

    def _dense_and_cell(self, cutoff=2.5, box=(10.0, 10.0, 10.0),
                        capacity=24):
        dense = lennard_jones(sigma=1.0, epsilon=1.0, box=list(box),
                              cutoff=cutoff)
        from vaemolsim_tpu.potentials import lennard_jones_cell
        cell = lennard_jones_cell(sigma=1.0, epsilon=1.0, box=list(box),
                                  cutoff=cutoff, capacity=capacity)
        return dense, cell

    def test_matches_dense_energy_and_forces(self):
        dense, cell = self._dense_and_cell()
        x = jax.random.uniform(jax.random.PRNGKey(0), (200, 3)) * 10.0
        e_d, e_c = float(dense(x)), float(cell(x))
        np.testing.assert_allclose(e_c, e_d, rtol=1e-5)
        g_d = np.asarray(jax.grad(lambda x: dense(x))(x))
        g_c = np.asarray(jax.grad(lambda x: cell(x))(x))
        np.testing.assert_allclose(g_c, g_d, rtol=1e-4, atol=1e-5)

    def test_matches_dense_batched_and_out_of_box_coords(self):
        dense, cell = self._dense_and_cell()
        # Coordinates far outside the box (unwrapped MD output).
        x = (jax.random.uniform(jax.random.PRNGKey(1), (4, 150, 3))
             * 10.0 + 37.0)
        np.testing.assert_allclose(np.asarray(jax.jit(cell)(x)),
                                   np.asarray(dense(x)), rtol=1e-5)

    def test_overflow_returns_nan(self):
        from vaemolsim_tpu.potentials import lennard_jones_cell
        cell = lennard_jones_cell(box=[10.0] * 3, cutoff=2.5, capacity=2)
        x = jnp.ones((8, 3))  # 8 atoms in one cell > capacity 2
        assert np.isnan(float(cell(x)))

    def test_small_box_rejected(self):
        from vaemolsim_tpu.potentials import lennard_jones_cell
        with pytest.raises(ValueError, match="3 per dimension"):
            lennard_jones_cell(box=[5.0, 5.0, 5.0], cutoff=2.5)

    def test_md_energy_conservation_cell_backend(self):
        """NVE through the cell-list force path conserves energy (the
        sort/gather graph is differentiated — this pins its vjp)."""
        from vaemolsim_tpu.md import kinetic_energy, velocity_verlet
        from vaemolsim_tpu.potentials import lennard_jones_cell

        cell = lennard_jones_cell(box=[9.0] * 3, cutoff=2.5)
        # Loose lattice, thermal kick.
        g = jnp.stack(jnp.meshgrid(*[jnp.arange(4.0)] * 3,
                                   indexing="ij"), -1).reshape(-1, 3) * 2.2
        v0 = 0.2 * jax.random.normal(jax.random.PRNGKey(2), g.shape)
        e0 = float(cell(g) + kinetic_energy(v0))
        st, _ = jax.jit(lambda x, v: velocity_verlet(
            cell, x, v, dt=0.002, n_steps=500))(g, v0)
        e1 = float(cell(st.x) + kinetic_energy(st.v))
        np.testing.assert_allclose(e1, e0, rtol=5e-3)


class TestCellNeighbor:
    """Skin/Verlet neighbor-list API: (build, energy) pair, both
    backends, against the exact dense form."""

    def _dense(self, L=10.0, cutoff=2.5):
        return lennard_jones(sigma=1.0, epsilon=1.0, box=[L] * 3,
                             cutoff=cutoff)

    def _pair(self, L=10.0, cutoff=2.5, **kw):
        from vaemolsim_tpu.potentials import lennard_jones_cell_neighbor
        return lennard_jones_cell_neighbor(box=[L] * 3, cutoff=cutoff,
                                           skin=0.5, capacity=32, **kw)

    @pytest.mark.parametrize("backend", ["xla", "pallas"])
    def test_matches_dense_at_and_near_build(self, backend):
        dense = self._dense()
        kw = {"interpret": True} if backend == "pallas" else {}
        build, energy = self._pair(backend=backend, **kw)
        x = jax.random.uniform(jax.random.PRNGKey(0), (180, 3)) * 10.0
        nl = build(x)
        np.testing.assert_allclose(float(energy(nl, x)), float(dense(x)),
                                   rtol=1e-5)
        # Displaced within skin/2: frozen list still exact.
        x2 = x + 0.1 * jax.random.normal(jax.random.PRNGKey(1),
                                         x.shape) / np.sqrt(3.0)
        np.testing.assert_allclose(float(energy(nl, x2)),
                                   float(dense(x2)), rtol=1e-5)
        g_d = np.asarray(jax.grad(dense)(x2))
        g_n = np.asarray(jax.grad(lambda y: energy(nl, y))(x2))
        np.testing.assert_allclose(g_n, g_d, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("backend", ["xla", "pallas"])
    def test_drift_past_half_skin_is_nan(self, backend):
        kw = {"interpret": True} if backend == "pallas" else {}
        build, energy = self._pair(backend=backend, **kw)
        x = jax.random.uniform(jax.random.PRNGKey(2), (64, 3)) * 10.0
        nl = build(x)
        x_far = x.at[5].add(jnp.asarray([0.6, 0.0, 0.0]))  # > skin/2
        assert np.isnan(float(energy(nl, x_far)))

    def test_backends_agree_exactly_enough(self):
        build, e_x = self._pair()
        _, e_p = self._pair(backend="pallas", interpret=True)
        x = jax.random.uniform(jax.random.PRNGKey(3), (128, 3)) * 10.0
        nl = build(x)
        np.testing.assert_allclose(float(e_p(nl, x)), float(e_x(nl, x)),
                                   rtol=1e-6)
        g_x = np.asarray(jax.grad(e_x, argnums=1)(nl, x))
        g_p = np.asarray(jax.grad(e_p, argnums=1)(nl, x))
        np.testing.assert_allclose(g_p, g_x, rtol=1e-5, atol=1e-5)

    def test_bad_backend_rejected(self):
        with pytest.raises(ValueError, match="backend"):
            self._pair(backend="cuda")

    def test_overflow_is_nan_pallas(self):
        from vaemolsim_tpu.potentials import lennard_jones_cell_neighbor
        build, energy = lennard_jones_cell_neighbor(
            box=[10.0] * 3, cutoff=2.5, skin=0.0, capacity=2,
            backend="pallas", interpret=True)
        x = jnp.ones((8, 3)) * 5.0  # 8 atoms in one cell > capacity 2
        nl = build(x)
        assert bool(nl.overflow)
        assert np.isnan(float(energy(nl, x)))


class TestEwald:
    """Classic Ewald electrostatics against exactly-known lattice
    constants (the strongest possible goldens for periodic Coulomb)."""

    MADELUNG_NACL = 1.7475645946331822   # Madelung constant, NaCl
    WIGNER_CUBIC = -2.837297479          # single charge + background

    def test_nacl_madelung_constant(self):
        from vaemolsim_tpu.potentials import ewald_coulomb
        g = np.stack(np.meshgrid(*[np.arange(2)] * 3, indexing="ij"),
                     -1).reshape(-1, 3).astype(np.float64)
        qs = np.asarray([(-1.0) ** int(s.sum()) for s in g])
        u = ewald_coulomb(qs, box=[2.0] * 3, r_cutoff=0.99,
                          tolerance=1e-7)
        np.testing.assert_allclose(float(u(jnp.asarray(g))),
                                   -4.0 * self.MADELUNG_NACL, rtol=1e-6)

    def test_wigner_single_charge(self):
        from vaemolsim_tpu.potentials import ewald_coulomb
        for L in (1.0, 2.5):
            u = ewald_coulomb(np.asarray([1.0]), box=[L] * 3,
                              r_cutoff=0.45 * L, tolerance=1e-7)
            np.testing.assert_allclose(float(u(jnp.zeros((1, 3)))),
                                       self.WIGNER_CUBIC / (2 * L),
                                       rtol=1e-6)

    def test_alpha_invariance(self):
        from vaemolsim_tpu.potentials import ewald_coulomb
        x = jnp.asarray(np.random.RandomState(0).uniform(0, 5, (20, 3)),
                        jnp.float32)
        q = np.random.RandomState(1).normal(size=20)
        q -= q.mean()
        es = [float(ewald_coulomb(q, box=[5.0] * 3, r_cutoff=2.4,
                                  alpha=a, tolerance=1e-7)(x))
              for a in (1.2, 1.6, 2.0)]
        assert max(es) - min(es) < 1e-4 * abs(es[0])

    def test_forces_match_finite_difference(self):
        from vaemolsim_tpu.potentials import ewald_coulomb
        x = np.random.RandomState(2).uniform(0, 5, (12, 3))
        q = np.random.RandomState(3).normal(size=12)
        u = ewald_coulomb(q, box=[5.0] * 3, r_cutoff=2.4, tolerance=1e-6)
        g = np.asarray(jax.grad(u)(jnp.asarray(x, jnp.float32)))
        h = 1e-3
        for (i, a) in ((0, 0), (7, 2)):
            xp, xm = x.copy(), x.copy()
            xp[i, a] += h
            xm[i, a] -= h
            fd = (float(u(jnp.asarray(xp, jnp.float32)))
                  - float(u(jnp.asarray(xm, jnp.float32)))) / (2 * h)
            np.testing.assert_allclose(g[i, a], fd, rtol=2e-2, atol=2e-3)

    def test_exclusion_removes_direct_interaction(self):
        """MM convention: excluding (i, j) removes exactly
        q_i q_j / r_min_image from the total."""
        from vaemolsim_tpu.potentials import ewald_coulomb
        x = jnp.asarray([[1.0, 1.0, 1.0], [2.2, 1.0, 1.0],
                         [4.0, 3.5, 2.0]], jnp.float32)
        q = np.asarray([0.7, -0.4, -0.3])
        excl = np.zeros((3, 3), bool)
        excl[0, 1] = excl[1, 0] = True
        kw = dict(box=[6.0] * 3, r_cutoff=2.9, tolerance=1e-7)
        u_plain = ewald_coulomb(q, **kw)
        u_excl = ewald_coulomb(q, exclude=excl, **kw)
        r01 = 1.2
        np.testing.assert_allclose(
            float(u_plain(x)) - float(u_excl(x)),
            q[0] * q[1] / r01, rtol=1e-5)

    def test_batched_and_jit(self):
        from vaemolsim_tpu.potentials import ewald_coulomb
        q = np.random.RandomState(4).normal(size=8)
        u = jax.jit(ewald_coulomb(q, box=[4.0] * 3, r_cutoff=1.9))
        x = jax.random.uniform(jax.random.PRNGKey(0), (5, 2, 8, 3)) * 4.0
        out = u(x)
        assert out.shape == (5, 2)
        assert np.isfinite(np.asarray(out)).all()

    def test_traced_box_virial_pressure(self):
        """reference_box enables NPT/virial dilations: dU/ds via jvp
        must match finite differences of the dilated energy."""
        from vaemolsim_tpu import observables
        from vaemolsim_tpu.potentials import ewald_coulomb
        q = np.random.RandomState(5).normal(size=10)
        q -= q.mean()
        x = jnp.asarray(np.random.RandomState(6).uniform(0, 5, (10, 3)),
                        jnp.float32)
        box = jnp.asarray([5.0] * 3)
        fac = lambda b: ewald_coulomb(q, box=b, r_cutoff=2.4,
                                      reference_box=[5.0] * 3)
        p = float(observables.virial_pressure(fac, x, box=box))
        h = 1e-3
        us = lambda s: float(fac(s * box)(s * x))
        du_fd = (us(1.0 + h) - us(1.0 - h)) / (2 * h)
        p_fd = (10 * 1.0 - du_fd / 3.0) / 125.0
        np.testing.assert_allclose(p, p_fd, rtol=5e-3, atol=1e-4)

    def test_validation(self):
        from vaemolsim_tpu.potentials import ewald_coulomb
        with pytest.raises(ValueError, match="r_cutoff"):
            ewald_coulomb(np.ones(4), box=[4.0] * 3, r_cutoff=2.5)
        with pytest.raises(ValueError, match="charges"):
            ewald_coulomb(np.ones((2, 2)), box=[4.0] * 3, r_cutoff=1.0)
        u = ewald_coulomb(np.ones(2), box=[4.0] * 3, r_cutoff=1.9)
        with pytest.raises(ValueError, match="atoms"):
            u(jnp.zeros((3, 3)))


class TestReviewRegressions:
    """Pinned fixes from the round-3 session code review."""

    def test_skin_zero_list_reuse_is_nan(self):
        """skin=0 + any motion must NaN (the drift guard stays live at
        skin=0; silently-stale candidates would be silently wrong)."""
        from vaemolsim_tpu.potentials import lennard_jones_cell_neighbor
        build, energy = lennard_jones_cell_neighbor(
            box=[10.0] * 3, cutoff=2.5, skin=0.0, capacity=32)
        x = jax.random.uniform(jax.random.PRNGKey(0), (64, 3)) * 10.0
        nl = build(x)
        assert np.isfinite(float(energy(nl, x)))       # exact-x reuse ok
        x2 = x + 1e-3
        assert np.isnan(float(energy(nl, x2)))

    @pytest.mark.parametrize("backend", ["xla", "pallas"])
    def test_coincident_atoms_stay_finite(self, backend):
        """Exactly duplicated coordinates get the finite linear-core
        energy and zero (symmetric) force on every backend."""
        from vaemolsim_tpu.potentials import lennard_jones_cell_neighbor
        kw = {"interpret": True} if backend == "pallas" else {}
        build, energy = lennard_jones_cell_neighbor(
            box=[10.0] * 3, cutoff=2.5, skin=0.4, capacity=32,
            backend=backend, **kw)
        x = jax.random.uniform(jax.random.PRNGKey(1), (20, 3)) * 10.0
        x = x.at[7].set(x[3])                          # exact overlap
        nl = build(x)
        e = float(energy(nl, x))
        g = np.asarray(jax.grad(energy, argnums=1)(nl, x))
        assert np.isfinite(e)
        assert np.isfinite(g).all()

    def test_ewald_under_npt_box_convention(self):
        """ewald_coulomb(reference_box=...) must run under mcmc.npt's
        (..., 1, 1, 3) per-chain box convention (was a trace-time
        matmul-shape crash)."""
        from vaemolsim_tpu.mcmc import make_npt_step, npt_init, run_npt
        from vaemolsim_tpu.potentials import ewald_coulomb
        q = np.asarray([1.0, -1.0] * 4)
        fac = lambda b: ewald_coulomb(q, box=b, r_cutoff=1.4,
                                      reference_box=[4.0] * 3,
                                      tolerance=1e-4)
        x0 = jax.random.uniform(jax.random.PRNGKey(2), (6, 8, 3)) * 4.0
        st = npt_init(fac, x0, [4.0] * 3, jax.random.PRNGKey(3))
        step = make_npt_step(fac, pressure=0.3, dx_scale=0.1,
                             dlnv_scale=0.04, min_box=2.9)
        st, _ = jax.jit(lambda s: run_npt(step, s, 40))(st)
        assert np.isfinite(np.asarray(st.energy)).all()
        # Per-chain energies equal a per-chain recomputation.
        e_loop = np.asarray([float(fac(b[None, None, :])(x))
                             for x, b in zip(st.x, st.box)])
        np.testing.assert_allclose(np.asarray(st.energy), e_loop,
                                   rtol=2e-4, atol=2e-4)

    def test_npt_min_box_wall(self):
        """Volume moves never cross the min_box hard wall (minimum-image
        validity guard for truncated pair potentials)."""
        from vaemolsim_tpu.mcmc import make_npt_step, npt_init, run_npt

        def fac(b):
            del b
            return lambda x: jnp.zeros(x.shape[:-2], x.dtype)

        x0 = jax.random.uniform(jax.random.PRNGKey(4), (32, 4, 3)) * 5.2
        st = npt_init(fac, x0, [5.2] * 3, jax.random.PRNGKey(5))
        # Huge pressure pushes the ideal gas toward V -> 0; the wall
        # must stop every chain at min_box.
        step = make_npt_step(fac, pressure=50.0, dlnv_scale=0.3,
                             min_box=5.0)
        st, _ = run_npt(step, st, 300)
        assert float(jnp.min(st.box)) >= 5.0
        assert 0.0 <= float(st.vol_acceptance_rate) < 1.0


class TestCellSpecies:
    """Per-atom sigma/epsilon (Lorentz-Berthelot) on the cell paths,
    against the dense form's existing per-atom support."""

    def _params(self, n=120, seed=0):
        rs = np.random.RandomState(seed)
        sig = rs.uniform(0.8, 1.2, n)
        eps = rs.uniform(0.5, 1.5, n)
        return sig, eps

    @pytest.mark.parametrize("backend", ["xla", "pallas"])
    def test_matches_dense_mixture(self, backend):
        from vaemolsim_tpu.potentials import lennard_jones_cell_neighbor
        sig, eps = self._params()
        dense = lennard_jones(sigma=sig, epsilon=eps, box=[10.0] * 3,
                              cutoff=2.5)
        kw = {"interpret": True} if backend == "pallas" else {}
        build, energy = lennard_jones_cell_neighbor(
            sig, eps, box=[10.0] * 3, cutoff=2.5, skin=0.5,
            capacity=32, backend=backend, **kw)
        x = jax.random.uniform(jax.random.PRNGKey(0), (120, 3)) * 10.0
        nl = build(x)
        np.testing.assert_allclose(float(energy(nl, x)), float(dense(x)),
                                   rtol=1e-5)
        g_d = np.asarray(jax.grad(dense)(x))
        g_n = np.asarray(jax.grad(energy, argnums=1)(nl, x))
        np.testing.assert_allclose(g_n, g_d, rtol=1e-4, atol=1e-4)

    def test_scalar_epsilon_with_per_atom_sigma(self):
        from vaemolsim_tpu.potentials import lennard_jones_cell_neighbor
        sig, _ = self._params(n=60, seed=1)
        dense = lennard_jones(sigma=sig, epsilon=0.7, box=[10.0] * 3,
                              cutoff=2.5)
        build, energy = lennard_jones_cell_neighbor(
            sig, 0.7, box=[10.0] * 3, cutoff=2.5, skin=0.4, capacity=32)
        x = jax.random.uniform(jax.random.PRNGKey(1), (60, 3)) * 10.0
        np.testing.assert_allclose(float(energy(build(x), x)),
                                   float(dense(x)), rtol=1e-5)

    def test_atom_count_mismatch_rejected(self):
        from vaemolsim_tpu.potentials import lennard_jones_cell_neighbor
        sig, eps = self._params(n=10)
        build, energy = lennard_jones_cell_neighbor(
            sig, eps, box=[10.0] * 3, cutoff=2.5)
        x = jnp.ones((12, 3))
        nl = build(x)
        with pytest.raises(ValueError, match="per-atom"):
            energy(nl, x)

    def test_pair_matrix_rejected(self):
        from vaemolsim_tpu.potentials import lennard_jones_cell_neighbor
        with pytest.raises(ValueError, match="pair matrices"):
            lennard_jones_cell_neighbor(np.ones((4, 4)), 1.0,
                                        box=[10.0] * 3, cutoff=2.5)


class TestShardedCellForce:
    """Mesh-sharded cell grid (shard_map over the pallas kernel):
    single-system multi-device MD forces, exact vs the dense form."""

    def test_matches_dense_with_padding_and_species(self):
        from jax.sharding import Mesh

        from vaemolsim_tpu.potentials import lennard_jones_cell_neighbor
        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device CPU mesh")
        mesh = Mesh(np.array(jax.devices()).reshape(8), ("cells",))
        L = 10.0
        sig = np.where(np.random.RandomState(0).rand(150) < 0.5,
                       0.9, 1.1)
        dense = lennard_jones(sigma=sig, box=[L] * 3, cutoff=2.5)
        # 27 real cells pad to 32 over 8 devices (exercises padding).
        build, energy = lennard_jones_cell_neighbor(
            sig, 1.0, box=[L] * 3, cutoff=2.5, skin=0.5, capacity=32,
            backend="pallas", interpret=True, mesh=mesh,
            mesh_axis="cells")
        x = jax.random.uniform(jax.random.PRNGKey(0), (150, 3)) * L
        nl = build(x)
        np.testing.assert_allclose(float(jax.jit(energy)(nl, x)),
                                   float(dense(x)), rtol=1e-5)
        g = np.asarray(jax.jit(jax.grad(energy, argnums=1))(nl, x))
        np.testing.assert_allclose(g, np.asarray(jax.grad(dense)(x)),
                                   rtol=1e-4, atol=1e-4)

    def test_mesh_requires_pallas(self):
        from jax.sharding import Mesh

        from vaemolsim_tpu.potentials import lennard_jones_cell_neighbor
        mesh = Mesh(np.array(jax.devices()[:1]), ("cells",))
        with pytest.raises(ValueError, match="pallas"):
            lennard_jones_cell_neighbor(box=[10.0] * 3, cutoff=2.5,
                                        mesh=mesh, mesh_axis="cells")


class TestLargeNEwald:
    """Split Ewald for large systems: cell-list erfc real-space +
    recip-only ewald_coulomb must equal the dense exact sum."""

    @pytest.mark.parametrize("backend", ["xla", "pallas"])
    def test_split_equals_dense(self, backend):
        from vaemolsim_tpu.potentials import (composite, ewald_coulomb,
                                              lennard_jones,
                                              lennard_jones_cell_neighbor)
        rs = np.random.RandomState(0)
        n, L, rc = 128, 10.0, 2.5
        q = np.asarray([1.0, -1.0] * (n // 2)) * 0.8
        full_ew = ewald_coulomb(q, box=[L] * 3, r_cutoff=rc,
                                tolerance=1e-6)
        dense_total = composite(lennard_jones(box=[L] * 3, cutoff=rc),
                                full_ew)
        recip = ewald_coulomb(q, box=[L] * 3, r_cutoff=rc,
                              tolerance=1e-6, include_real_space=False)
        kw = {"interpret": True} if backend == "pallas" else {}
        build, cell_e = lennard_jones_cell_neighbor(
            box=[L] * 3, cutoff=rc, skin=0.5, capacity=32,
            backend=backend, charges=q,
            coulomb_alpha=full_ew.ewald_alpha, **kw)
        x = jnp.asarray(rs.uniform(0, L, (n, 3)), jnp.float32)
        nl = build(x)
        np.testing.assert_allclose(float(cell_e(nl, x) + recip(x)),
                                   float(dense_total(x)), rtol=1e-5)
        g_s = np.asarray(jax.grad(
            lambda y: cell_e(nl, y) + recip(y))(x))
        g_d = np.asarray(jax.grad(dense_total)(x))
        err = np.max(np.abs(g_s - g_d) / (1.0 + np.abs(g_d)))
        assert err < 2e-3

    def test_charges_need_alpha_and_match_count(self):
        from vaemolsim_tpu.potentials import lennard_jones_cell_neighbor
        with pytest.raises(ValueError, match="coulomb_alpha"):
            lennard_jones_cell_neighbor(box=[10.0] * 3, cutoff=2.5,
                                        charges=np.ones(4))
        build, energy = lennard_jones_cell_neighbor(
            box=[10.0] * 3, cutoff=2.5, charges=np.ones(4),
            coulomb_alpha=1.3)
        x = jnp.ones((6, 3))
        with pytest.raises(ValueError, match="charges"):
            energy(build(x), x)


class TestLBFGSPolish:

    def test_lj7_funnel_golden(self):
        # LJ7 global minimum E = -16.505384 (Hoare & Pal); a 200-step
        # Adam budget leaves stragglers several eps up the funnel, and
        # the L-BFGS polish takes every configuration to a basin floor
        # (best chain to the global minimum within float32).
        lj = lennard_jones()
        x0 = 0.9 * jax.random.normal(jax.random.PRNGKey(0), (16, 7, 3))
        e_adam = lj(minimize_energy(lj, x0, steps=200, lr=0.02))
        e_pol = lj(minimize_energy(lj, x0, steps=200, lr=0.02,
                                   polish_lbfgs=40))
        assert abs(float(e_pol.min()) + 16.505384) < 1e-3
        # polish never worsens and closes a substantial mean gap
        assert float(e_pol.mean()) < float(e_adam.mean()) - 1.0
        # gradient at the polished points is ~zero (true stationarity)
        # for the large majority of chains (a hard straggler may need
        # more than 40 L-BFGS steps)
        g = jax.grad(lambda x: jnp.sum(lj(x)))(
            minimize_energy(lj, x0, steps=200, lr=0.02,
                            polish_lbfgs=40))
        per_cfg = np.asarray(jnp.max(jnp.abs(g), axis=(1, 2)))
        assert (per_cfg < 1e-2).sum() >= 12, per_cfg


class TestMorse:

    def test_zero_at_minimum_and_dissociation(self):
        u = potentials.morse_bonds([[0, 1]], D=3.0, a=1.5, r0=1.1)
        x_min = jnp.asarray([[0.0, 0, 0], [1.1, 0, 0]])
        np.testing.assert_allclose(float(u(x_min)), 0.0, atol=1e-6)
        x_far = jnp.asarray([[0.0, 0, 0], [60.0, 0, 0]])
        np.testing.assert_allclose(float(u(x_far)), 3.0, rtol=1e-5)

    def test_curvature_matches_harmonic(self):
        # k_harm = 2 D a^2 at the minimum.
        D, a, r0 = 2.0, 1.2, 1.0
        u = potentials.morse_bonds([[0, 1]], D=D, a=a, r0=r0)
        eps = 1e-3
        vals = [float(u(jnp.asarray([[0.0, 0, 0], [r0 + s, 0, 0]])))
                for s in (-eps, 0.0, eps)]
        k_fd = (vals[0] - 2 * vals[1] + vals[2]) / eps ** 2
        np.testing.assert_allclose(k_fd, 2 * D * a * a, rtol=1e-2)

    def test_gradient_finite_difference(self):
        u = potentials.morse_bonds([[0, 1], [1, 2]], D=1.5, a=2.0,
                                   r0=0.9)
        x = jnp.asarray([[0.0, 0, 0], [1.0, 0.2, 0], [1.8, -0.1, 0.4]])
        g = jax.grad(lambda xx: u(xx))(x)
        eps = 1e-3
        for idx in [(0, 0), (1, 1), (2, 2)]:
            xp = x.at[idx].add(eps)
            xm = x.at[idx].add(-eps)
            fd = (float(u(xp)) - float(u(xm))) / (2 * eps)
            np.testing.assert_allclose(float(g[idx]), fd, atol=2e-3)


class TestImpropers:

    def test_zero_at_reference_and_quadratic(self):
        from vaemolsim_tpu.coords import dihedrals
        quad = np.array([[0, 1, 2, 3]])
        x = jnp.asarray([[1.0, 0.0, 0.3], [0.0, 0.0, 0.0],
                         [0.0, 1.0, 0.0], [0.7, 1.0, 0.9]])
        phi = float(dihedrals(x, quad)[0])
        u0 = potentials.harmonic_impropers(quad, k=4.0, phi0=phi)
        np.testing.assert_allclose(float(u0(x)), 0.0, atol=1e-6)
        u1 = potentials.harmonic_impropers(quad, k=4.0, phi0=phi - 0.3)
        np.testing.assert_allclose(float(u1(x)), 0.5 * 4.0 * 0.09,
                                   rtol=1e-4)

    def test_wrap_across_seam(self):
        from vaemolsim_tpu.coords import dihedrals
        quad = np.array([[0, 1, 2, 3]])
        x = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 0.0, 0.0],
                         [0.0, 1.0, 0.0], [-1.0, 1.0, -0.2]])
        phi = float(dihedrals(x, quad)[0])  # near +-pi
        assert abs(phi) > 2.9
        # reference on the OTHER side of the seam: deviation must wrap
        phi0 = -np.sign(phi) * (np.pi - 0.05)
        u = potentials.harmonic_impropers(quad, k=2.0, phi0=phi0)
        dev = abs(abs(phi) + np.pi - 0.05 - 2 * np.pi)
        np.testing.assert_allclose(float(u(x)), 0.5 * 2.0 * dev ** 2,
                                   rtol=1e-3)


class TestBuckingham:

    def test_hand_value_two_atoms(self):
        A, rho, C = 5.0, 0.5, 0.8
        u = potentials.buckingham(A=A, rho=rho, C=C)
        x = jnp.asarray([[0.0, 0, 0], [1.3, 0, 0]])
        expect = A * np.exp(-1.3 / rho) - C / 1.3 ** 6
        np.testing.assert_allclose(float(u(x)), expect, rtol=1e-5)

    def test_core_is_c1_continuous(self):
        u = potentials.buckingham(A=5.0, rho=0.5, C=0.8, r_core=0.6)
        eps = 1e-3
        vals = {}
        for r in (0.6 - eps, 0.6, 0.6 + eps):
            vals[r] = float(u(jnp.asarray([[0.0, 0, 0], [r, 0, 0]])))
        left = (vals[0.6] - vals[0.6 - eps]) / eps
        right = (vals[0.6 + eps] - vals[0.6]) / eps
        np.testing.assert_allclose(left, right, rtol=2e-2)
        # finite far below the core (the Buckingham catastrophe guarded)
        x_overlap = jnp.asarray([[0.0, 0, 0], [1e-4, 0, 0]])
        assert np.isfinite(float(u(x_overlap)))
        g = jax.grad(lambda xx: u(xx))(x_overlap)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_cutoff_shift_and_exclusions(self):
        u = potentials.buckingham(A=5.0, rho=0.5, C=0.8, cutoff=2.0)
        x = jnp.asarray([[0.0, 0, 0], [2.5, 0, 0]])
        np.testing.assert_allclose(float(u(x)), 0.0, atol=1e-7)
        excl = np.zeros((2, 2), bool)
        excl[0, 1] = excl[1, 0] = True
        u_ex = potentials.buckingham(A=5.0, rho=0.5, C=0.8,
                                     exclusions=excl)
        np.testing.assert_allclose(
            float(u_ex(jnp.asarray([[0.0, 0, 0], [1.0, 0, 0]]))), 0.0)

    def test_minimum_image(self):
        u = potentials.buckingham(A=5.0, rho=0.5, C=0.8,
                                  box=[4.0, 4.0, 4.0])
        xa = jnp.asarray([[0.1, 0, 0], [3.9, 0, 0]])   # 0.2 apart via pbc
        xb = jnp.asarray([[0.0, 0, 0], [0.2, 0, 0]])
        np.testing.assert_allclose(float(u(xa)), float(u(xb)), rtol=1e-5)


class TestPME:
    """Smooth particle-mesh Ewald against the exact classic sum (the
    strongest golden: same alpha, same corrections — any disagreement
    is PME interpolation error) plus the exact lattice constants,
    spline identities, and the split-total contract."""

    def _random_system(self, n=24, L=8.0, seed=0, neutral=True):
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.uniform(0, L, (n, 3)), jnp.float32)
        q = rng.uniform(-1, 1, n)
        if neutral:
            q -= q.mean()
        return x, q, L

    @pytest.mark.parametrize("order", [4, 6])
    def test_binned_spread_matches_scatter(self, order):
        """The scatter-free binned spreading (one-hot placement +
        static overlap-add) is the SAME sum as the scatter form —
        energies and forces to f32 roundoff, including wraparound
        stamps at the box faces."""
        from vaemolsim_tpu.potentials import pme_coulomb
        x, q, L = self._random_system(n=80, L=9.0, seed=3)
        # atoms pushed onto faces/corners exercise the periodic rolls
        x = jnp.concatenate([x, jnp.asarray(
            [[0.0, 0.0, 0.0], [L - 1e-4, L - 1e-4, L - 1e-4],
             [0.01, L / 2, L - 0.01]], jnp.float32)])
        q = np.concatenate([q, [0.4, -0.3, -0.1]])
        kw = dict(box=[L] * 3, r_cutoff=2.5, tolerance=1e-4,
                  order=order, include_real_space=False)
        e_s = pme_coulomb(q, spread="scatter", **kw)
        e_b = pme_coulomb(q, spread="binned", **kw)
        us, ub = float(jax.jit(e_s)(x)), float(jax.jit(e_b)(x))
        assert ub == pytest.approx(us, rel=2e-5, abs=1e-5)
        gs = jax.jit(jax.grad(e_s))(x)
        gb = jax.jit(jax.grad(e_b))(x)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gs),
                                   rtol=1e-4, atol=1e-5)

    def test_binned_spread_batched(self):
        from vaemolsim_tpu.potentials import pme_coulomb
        x, q, L = self._random_system(n=40, L=9.0, seed=4)
        kw = dict(box=[L] * 3, r_cutoff=2.5, tolerance=1e-4,
                  include_real_space=False)
        e_s = pme_coulomb(q, spread="scatter", **kw)
        e_b = pme_coulomb(q, spread="binned", **kw)
        xb = jnp.stack([x, jnp.roll(x, 7, axis=0) + 0.3])
        np.testing.assert_allclose(np.asarray(jax.jit(e_b)(xb)),
                                   np.asarray(jax.jit(e_s)(xb)),
                                   rtol=2e-5, atol=1e-5)

    def test_binned_spread_overflow_poisons(self):
        """All atoms stacked in one spreading block must NaN (the loud
        capacity contract), not silently drop charge."""
        from vaemolsim_tpu.potentials import pme_coulomb
        n, L = 512, 20.0
        q = np.ones(n, np.float32)
        q[::2] = -1.0
        e_b = pme_coulomb(q, box=[L] * 3, r_cutoff=2.5, tolerance=1e-4,
                          include_real_space=False, spread="binned")
        x = jnp.full((n, 3), 0.5 * L, jnp.float32)
        assert not np.isfinite(float(jax.jit(e_b)(x)))

    def test_spread_arg_validated(self):
        from vaemolsim_tpu.potentials import pme_coulomb
        with pytest.raises(ValueError, match="spread"):
            pme_coulomb(np.ones(4), box=[8.0] * 3, r_cutoff=2.5,
                        spread="banana")

    def test_bspline_partition_of_unity_and_direct_recursion(self):
        from vaemolsim_tpu.potentials import _bspline_weights

        def mn_direct(n, x):
            if n == 2:
                return np.where((x >= 0) & (x <= 2),
                                1.0 - np.abs(x - 1.0), 0.0)
            return (x * mn_direct(n - 1, x)
                    + (n - x) * mn_direct(n - 1, x - 1.0)) / (n - 1)

        t = np.linspace(0.0, 0.999, 9)
        for order in (3, 4, 6):
            w = np.asarray(_bspline_weights(order, jnp.asarray(t)))
            np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-6)
            direct = np.stack([mn_direct(order, t + j)
                               for j in range(order)], -1)
            np.testing.assert_allclose(w, direct, atol=1e-6)

    def test_matches_exact_ewald_energy_and_forces(self):
        from vaemolsim_tpu.potentials import ewald_coulomb, pme_coulomb
        x, q, L = self._random_system()
        e_ex = ewald_coulomb(q, box=[L] * 3, r_cutoff=3.0,
                             tolerance=1e-5)
        e_pme = pme_coulomb(q, box=[L] * 3, r_cutoff=3.0,
                            tolerance=1e-5)
        assert e_pme.ewald_alpha == e_ex.ewald_alpha
        v1, v2 = float(e_ex(x)), float(e_pme(x))
        assert abs(v2 - v1) < 2e-4 * abs(v1), (v1, v2)
        g1 = np.asarray(jax.grad(e_ex)(x))
        g2 = np.asarray(jax.grad(e_pme)(x))
        assert np.max(np.abs(g2 - g1)) < 5e-4 * np.max(np.abs(g1))

    def test_nacl_madelung_constant(self):
        from vaemolsim_tpu.potentials import pme_coulomb
        g = np.stack(np.meshgrid(*[np.arange(2)] * 3, indexing="ij"),
                     -1).reshape(-1, 3).astype(np.float64)
        qs = np.asarray([(-1.0) ** int(s.sum()) for s in g])
        u = pme_coulomb(qs, box=[2.0] * 3, r_cutoff=0.99,
                        tolerance=1e-6)
        np.testing.assert_allclose(float(u(jnp.asarray(g))),
                                   -4.0 * TestEwald.MADELUNG_NACL,
                                   rtol=2e-5)

    def test_wigner_net_charge_background(self):
        from vaemolsim_tpu.potentials import pme_coulomb
        L = 2.5
        u = pme_coulomb(np.asarray([1.0]), box=[L] * 3,
                        r_cutoff=0.45 * L, tolerance=1e-6)
        np.testing.assert_allclose(float(u(jnp.zeros((1, 3)))),
                                   TestEwald.WIGNER_CUBIC / (2 * L),
                                   rtol=2e-5)

    def test_exclusions_match_exact_ewald(self):
        from vaemolsim_tpu.potentials import ewald_coulomb, pme_coulomb
        x, q, L = self._random_system(n=12, seed=3)
        excl = np.zeros((12, 12), bool)
        excl[0, 1] = excl[1, 0] = True
        excl[2, 5] = excl[5, 2] = True
        kw = dict(box=[L] * 3, r_cutoff=3.0, tolerance=1e-5,
                  exclude=excl)
        v1 = float(ewald_coulomb(q, **kw)(x))
        v2 = float(pme_coulomb(q, **kw)(x))
        assert abs(v2 - v1) < 2e-4 * abs(v1)

    def test_split_total_with_cell_list_real_space(self):
        # O(N) contract: cell-list erfc real space + PME(recip only)
        # == exact full Ewald, same alpha.
        from vaemolsim_tpu.potentials import (ewald_coulomb,
                                              lennard_jones_cell_neighbor,
                                              pme_coulomb)
        rng = np.random.default_rng(4)
        L, cut, n_side = 12.0, 3.0, 4
        g = np.stack(np.meshgrid(*[np.arange(n_side)] * 3,
                                 indexing="ij"), -1).reshape(-1, 3)
        x = jnp.asarray(g * (L / n_side) + rng.normal(0, 0.1, g.shape),
                        jnp.float32)
        n = x.shape[0]
        q = rng.uniform(-1, 1, n)
        q -= q.mean()
        recip = pme_coulomb(q, box=[L] * 3, r_cutoff=cut,
                            tolerance=1e-5, include_real_space=False)
        build, energy = lennard_jones_cell_neighbor(
            box=[L] * 3, cutoff=cut, skin=0.4, capacity=16,
            epsilon=0.0, charges=q, coulomb_alpha=recip.ewald_alpha)
        nl = build(x)
        split = float(energy(nl, x)) + float(recip(x))
        exact = float(ewald_coulomb(q, box=[L] * 3, r_cutoff=cut,
                                    tolerance=1e-5)(x))
        assert abs(split - exact) < 3e-4 * abs(exact), (split, exact)

    def test_batched_configs(self):
        from vaemolsim_tpu.potentials import pme_coulomb
        x, q, L = self._random_system(n=10, seed=5)
        xb = jnp.stack([x, x + 0.37, x * 0.9 + 1.0])
        u = pme_coulomb(q, box=[L] * 3, r_cutoff=3.0, tolerance=1e-4)
        vb = np.asarray(u(xb))
        vs = np.asarray([float(u(xb[i])) for i in range(3)])
        np.testing.assert_allclose(vb, vs, rtol=1e-6)

    def test_translation_invariance(self):
        from vaemolsim_tpu.potentials import pme_coulomb
        x, q, L = self._random_system(n=16, seed=6)
        u = pme_coulomb(q, box=[L] * 3, r_cutoff=3.0, tolerance=1e-5)
        v0 = float(u(x))
        # Generic shift crosses grid-cell boundaries: the B-spline
        # interpolation must stay smooth through them.
        v1 = float(u(x + jnp.asarray([0.123, -4.56, 17.89])))
        assert abs(v1 - v0) < 5e-5 * abs(v0) + 1e-5

    def test_validation(self):
        from vaemolsim_tpu.potentials import pme_coulomb
        with pytest.raises(ValueError, match="half the smallest"):
            pme_coulomb(np.ones(4), box=[4.0] * 3, r_cutoff=3.0)
        with pytest.raises(ValueError, match="order"):
            pme_coulomb(np.ones(4), box=[8.0] * 3, r_cutoff=3.0,
                        order=2)
        with pytest.raises(ValueError, match="too coarse"):
            pme_coulomb(np.ones(4), box=[8.0] * 3, r_cutoff=3.0,
                        grid_shape=(8, 8, 8), order=6)
        u = pme_coulomb(np.ones(4), box=[8.0] * 3, r_cutoff=3.0)
        with pytest.raises(ValueError, match="atoms"):
            u(jnp.zeros((5, 3)))


class TestCellNeighborExclusions:
    """Bonded exclusions on the O(N) cell-list path: exact subtraction
    pinned against the dense excluded form, the full Ewald split, an
    independent numpy pair virial, and the loud-failure contracts."""

    L, CUT = 10.0, 2.5

    def _system(self, n=180, seed=0):
        x = jax.random.uniform(jax.random.PRNGKey(seed), (n, 3)) * self.L
        # Chain bonds among consecutive atom triplets: 1-2 + 1-3
        # exclusions with both near and far members.
        bonds = [[3 * k, 3 * k + 1] for k in range(n // 3)] \
            + [[3 * k + 1, 3 * k + 2] for k in range(n // 3)]
        excl = exclusions_from_bonds(n, bonds)
        return x, excl

    @pytest.mark.parametrize("backend", ["xla", "pallas"])
    def test_matches_dense_exclusions(self, backend):
        from vaemolsim_tpu.potentials import lennard_jones_cell_neighbor
        x, excl = self._system()
        kw = {"interpret": True} if backend == "pallas" else {}
        build, energy = lennard_jones_cell_neighbor(
            box=[self.L] * 3, cutoff=self.CUT, skin=0.5, capacity=32,
            backend=backend, exclude=excl, **kw)
        dense = lennard_jones(box=[self.L] * 3, cutoff=self.CUT,
                              exclude=excl)
        nl = build(x)
        np.testing.assert_allclose(float(energy(nl, x)), float(dense(x)),
                                   rtol=1e-5, atol=1e-6)
        g_n = np.asarray(jax.grad(lambda y: energy(nl, y))(x))
        g_d = np.asarray(jax.grad(dense)(x))
        # Exclusions are masked INSIDE the sum (never summed, never
        # subtracted), so only summation-order float32 noise remains.
        np.testing.assert_allclose(g_n, g_d, rtol=1e-4, atol=1e-5)

    def test_pair_list_equals_matrix(self):
        from vaemolsim_tpu.potentials import lennard_jones_cell_neighbor
        x, excl = self._system(n=60, seed=1)
        pairs = np.stack(np.nonzero(np.triu(excl, k=1)), -1)
        # Duplicates and swapped order must not double-subtract.
        pairs_dup = np.concatenate([pairs, pairs[:, ::-1]])
        b1, e1 = lennard_jones_cell_neighbor(
            box=[self.L] * 3, cutoff=self.CUT, skin=0.5, capacity=32,
            exclude=excl)
        b2, e2 = lennard_jones_cell_neighbor(
            box=[self.L] * 3, cutoff=self.CUT, skin=0.5, capacity=32,
            exclude=pairs_dup)
        nl = b1(x)
        np.testing.assert_allclose(float(e1(nl, x)), float(e2(nl, x)),
                                   rtol=1e-6)

    def test_full_ewald_split_with_exclusions(self):
        """O(N) contract for MOLECULAR systems: cell-list erfc real
        space WITH exclusions + PME(exclude, recip only) == exact full
        Ewald with the same exclusions."""
        from vaemolsim_tpu.potentials import (ewald_coulomb,
                                              lennard_jones_cell_neighbor,
                                              pme_coulomb)
        rng = np.random.default_rng(7)
        n = 48
        x = jnp.asarray(rng.uniform(0, self.L, (n, 3)), jnp.float32)
        q = rng.uniform(-1, 1, n)
        q -= q.mean()
        bonds = [[2 * k, 2 * k + 1] for k in range(n // 2)]
        excl = exclusions_from_bonds(n, bonds, through_angles=False)
        recip = pme_coulomb(q, box=[self.L] * 3, r_cutoff=self.CUT,
                            tolerance=1e-5, exclude=excl,
                            include_real_space=False)
        build, energy = lennard_jones_cell_neighbor(
            box=[self.L] * 3, cutoff=self.CUT, skin=0.4, capacity=32,
            epsilon=0.0, charges=q, coulomb_alpha=recip.ewald_alpha,
            exclude=excl)
        nl = build(x)
        split = float(energy(nl, x)) + float(recip(x))
        exact = float(ewald_coulomb(q, box=[self.L] * 3,
                                    r_cutoff=self.CUT, tolerance=1e-5,
                                    exclude=excl)(x))
        # Exclusions cancel most of the close-pair energy, so the
        # TOTAL is small; the bound is PME-interpolation absolute
        # error plus a relative term.
        assert abs(split - exact) < 3e-4 * abs(exact) + 1e-4, (split,
                                                               exact)

    def test_stress_matches_dense_pair_formula(self):
        x, excl = self._system(n=90, seed=2)
        from vaemolsim_tpu.potentials import lennard_jones_cell_neighbor
        build, energy = lennard_jones_cell_neighbor(
            box=[self.L] * 3, cutoff=self.CUT, skin=0.5, capacity=32,
            exclude=excl)
        nl = build(x)
        sig = np.asarray(energy.stress(nl, x))
        # Independent truth: numpy dense pair virial with the mask.
        xd = np.asarray(x, np.float64)
        box = np.array([self.L] * 3)
        d = xd[:, None, :] - xd[None, :, :]
        d -= box * np.round(d / box)
        r = np.sqrt((d ** 2).sum(-1))
        n = xd.shape[0]
        mask = (r < self.CUT) & ~np.eye(n, dtype=bool) & ~np.asarray(excl)
        r = np.where(mask, r, 1.0)
        sr6 = 1.0 / r ** 6
        dudr = 24.0 / r * (sr6 - 2.0 * sr6 * sr6)
        w = np.where(mask, dudr / r, 0.0)
        ref = -0.5 * np.einsum("ij,ija,ijb->ab", w, d, d) / self.L ** 3
        np.testing.assert_allclose(sig, ref, rtol=1e-4, atol=1e-6)

    def test_bonded_pair_truly_gone(self):
        """Move a bonded pair to overlap: the excluded energy must not
        change (no LJ wall between bonded atoms)."""
        from vaemolsim_tpu.potentials import lennard_jones_cell_neighbor
        n = 6
        excl = exclusions_from_bonds(n, [[0, 1]], through_angles=False)
        build, energy = lennard_jones_cell_neighbor(
            box=[self.L] * 3, cutoff=self.CUT, skin=0.5, capacity=32,
            exclude=excl)
        base = jnp.asarray([[5.0, 5.0, 5.0], [6.0, 5.0, 5.0],
                            [1.0, 1.0, 1.0], [9.0, 9.0, 9.0],
                            [1.0, 9.0, 1.0], [9.0, 1.0, 9.0]])
        moved = base.at[1].set(jnp.asarray([5.05, 5.0, 5.0]))
        e1 = float(energy(build(base), base))
        e2 = float(energy(build(moved), moved))
        np.testing.assert_allclose(e1, e2, atol=1e-5)

    def test_validation_and_loud_failures(self):
        from vaemolsim_tpu.potentials import lennard_jones_cell_neighbor
        kw = dict(box=[self.L] * 3, cutoff=self.CUT, skin=0.5,
                  capacity=32)
        with pytest.raises(ValueError, match="self pairs"):
            lennard_jones_cell_neighbor(exclude=np.asarray([[1, 1]]),
                                        **kw)
        with pytest.raises(ValueError, match="symmetric"):
            bad = np.zeros((4, 4), bool)
            bad[0, 1] = True
            lennard_jones_cell_neighbor(exclude=bad, **kw)
        build, energy = lennard_jones_cell_neighbor(
            exclude=np.asarray([[0, 50]]), **kw)
        x = jax.random.uniform(jax.random.PRNGKey(3), (20, 3)) * self.L
        with pytest.raises(ValueError, match="exclude references"):
            energy(build(x), x)
        build2, energy2 = lennard_jones_cell_neighbor(
            exclude=np.asarray([[0, 1]]), **kw)
        with pytest.raises(NotImplementedError, match="heat_flux"):
            energy2.heat_flux(build2(x), x, jnp.zeros_like(x))

    def test_nan_contract_preserved(self):
        from vaemolsim_tpu.potentials import lennard_jones_cell_neighbor
        build, energy = lennard_jones_cell_neighbor(
            box=[self.L] * 3, cutoff=self.CUT, skin=0.5, capacity=32,
            exclude=np.asarray([[0, 1]]))
        x = jax.random.uniform(jax.random.PRNGKey(4), (32, 3)) * self.L
        nl = build(x)
        x_far = x.at[5].add(jnp.asarray([0.6, 0.0, 0.0]))
        assert np.isnan(float(energy(nl, x_far)))


class TestExcludePairListForms:
    """Every dense potential's ``exclude`` accepts BOTH an (n, n) bool
    matrix and an (E, 2) pair list (normalized by _exclude_matrix) —
    form equivalence and loud validation."""

    def _x(self, n=24, seed=0, L=8.0):
        return jax.random.uniform(jax.random.PRNGKey(seed), (n, 3)) * L

    def test_dense_lj_and_coulomb_forms_agree(self):
        from vaemolsim_tpu.potentials import coulomb, lennard_jones
        n, L = 24, 8.0
        x = self._x(n)
        pairs = np.asarray([[2 * k, 2 * k + 1] for k in range(n // 2)])
        mat = exclusions_from_bonds(n, pairs, through_angles=False)
        q = np.tile([0.4, -0.4], n // 2)
        for make in (lambda e: lennard_jones(box=[L] * 3, cutoff=2.5,
                                             exclude=e),
                     lambda e: coulomb(q, exclude=e)):
            np.testing.assert_allclose(float(make(mat)(x)),
                                       float(make(pairs)(x)), rtol=1e-6)

    def test_ewald_and_pme_forms_agree(self):
        from vaemolsim_tpu.potentials import ewald_coulomb, pme_coulomb
        n, L = 16, 9.0
        x = self._x(n, seed=1, L=L)
        pairs = np.asarray([[2 * k, 2 * k + 1] for k in range(n // 2)])
        mat = exclusions_from_bonds(n, pairs, through_angles=False)
        q = np.tile([0.5, -0.5], n // 2)
        for make in (lambda e: ewald_coulomb(q, box=[L] * 3,
                                             r_cutoff=3.0, exclude=e),
                     lambda e: pme_coulomb(q, box=[L] * 3, r_cutoff=3.0,
                                           exclude=e)):
            np.testing.assert_allclose(float(make(mat)(x)),
                                       float(make(pairs)(x)), rtol=1e-6)

    def test_validation(self):
        from vaemolsim_tpu.potentials import _exclude_matrix
        with pytest.raises(ValueError, match="self pairs"):
            _exclude_matrix(np.asarray([[3, 3]]), 8)
        with pytest.raises(ValueError, match="references atom"):
            _exclude_matrix(np.asarray([[0, 9]]), 8)
        with pytest.raises(ValueError, match="symmetric"):
            bad = np.zeros((8, 8), bool)
            bad[0, 1] = True
            _exclude_matrix(bad, 8)
        with pytest.raises(ValueError, match="matrix is"):
            _exclude_matrix(np.zeros((6, 6), bool), 8)
        out = _exclude_matrix(np.asarray([[1, 0], [0, 1], [2, 3]]), 4)
        assert out.sum() == 4 and out[0, 1] and out[1, 0] and out[2, 3]


class TestPMESlotBuilders:
    """Both slot-table builders (one-hot+cumsum fast path, argsort
    fallback above _SLOT_CUMSUM_MAX) must produce identical spreading —
    the assignment rule (count of earlier same-cell atoms) is shared,
    so energies should agree bit-for-bit at f32."""

    def test_argsort_fallback_matches_cumsum(self, monkeypatch):
        import vaemolsim_tpu.potentials as pot
        rs = np.random.RandomState(0)
        n, L = 200, 9.0
        x = jnp.asarray(rs.uniform(0, L, (n, 3)), jnp.float32)
        q = rs.normal(size=n)
        q -= q.mean()

        def build():
            u = pot.pme_coulomb(q, box=[L] * 3, r_cutoff=2.5,
                                tolerance=1e-5, spread="binned")
            return float(u(x)), np.asarray(jax.grad(u)(x))

        e_cumsum, g_cumsum = build()
        monkeypatch.setattr(pot, "_SLOT_CUMSUM_MAX", 0)
        e_sort, g_sort = build()
        assert e_cumsum == e_sort, (e_cumsum, e_sort)
        np.testing.assert_array_equal(g_cumsum, g_sort)
