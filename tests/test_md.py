"""MD integrators: symplectic energy conservation, Boltzmann sampling,
and agreement with the analytic harmonic oscillator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu import md
from vaemolsim_tpu.md import (baoab, kinetic_energy, temperature,
                              velocity_verlet)
from vaemolsim_tpu.potentials import (composite, coulomb,
                                      exclusions_from_bonds,
                                      harmonic_bonds, lennard_jones)


def dimer_potential(k=100.0, r0=1.0):
    return harmonic_bonds([[0, 1]], k, r0)


class TestVelocityVerlet:

    def test_nve_energy_conservation(self):
        """Symplectic integration: total energy oscillates but does not
        drift (relative error bounded over 2000 steps)."""
        pot = dimer_potential()
        x0 = jnp.asarray([[0.0, 0, 0], [1.1, 0, 0]])[None].repeat(8, 0)
        v0 = 0.3 * jax.random.normal(jax.random.PRNGKey(0), x0.shape)
        e0 = pot(x0) + kinetic_energy(v0)
        st, _ = jax.jit(lambda x, v: velocity_verlet(
            pot, x, v, dt=0.005, n_steps=2000))(x0, v0)
        e1 = pot(st.x) + kinetic_energy(st.v)
        np.testing.assert_allclose(np.asarray(e1), np.asarray(e0),
                                   rtol=1e-3)

    def test_harmonic_period(self):
        """1-D harmonic dimer: the bond oscillates at
        omega = sqrt(k / mu), mu = m/2 — a full-period integration
        returns to the start."""
        k_spring, m = 100.0, 1.0
        pot = dimer_potential(k=k_spring)
        omega = np.sqrt(k_spring / (m / 2.0))
        period = 2 * np.pi / omega
        n_steps = 2000
        dt = period / n_steps
        x0 = jnp.asarray([[0.0, 0, 0], [1.2, 0, 0]])  # stretched
        v0 = jnp.zeros_like(x0)
        st, _ = velocity_verlet(pot, x0, v0, dt=dt, n_steps=n_steps)
        np.testing.assert_allclose(np.asarray(st.x), np.asarray(x0),
                                   atol=2e-3)

    def test_trajectory_collection_and_validation(self):
        pot = dimer_potential()
        x0 = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0]])
        st, traj = velocity_verlet(pot, x0, jnp.zeros_like(x0),
                                   dt=0.01, n_steps=100, collect_every=20)
        assert traj.shape == (5, 2, 3)
        np.testing.assert_allclose(np.asarray(traj[-1]), np.asarray(st.x))
        with pytest.raises(ValueError, match="multiple"):
            velocity_verlet(pot, x0, jnp.zeros_like(x0), dt=0.01,
                            n_steps=10, collect_every=3)

    def test_masses_change_dynamics(self):
        pot = dimer_potential()
        x0 = jnp.asarray([[0.0, 0, 0], [1.2, 0, 0]])
        v0 = jnp.zeros_like(x0)
        light, _ = velocity_verlet(pot, x0, v0, dt=0.002, n_steps=200,
                                   masses=1.0)
        heavy, _ = velocity_verlet(pot, x0, v0, dt=0.002, n_steps=200,
                                   masses=jnp.asarray([1.0, 10.0]))
        assert not np.allclose(np.asarray(light.x), np.asarray(heavy.x))
        # Energy conserved with per-atom masses too.
        m = jnp.asarray([1.0, 10.0])
        e0 = float(pot(x0) + kinetic_energy(v0, m))
        e1 = float(pot(heavy.x) + kinetic_energy(heavy.v, m))
        np.testing.assert_allclose(e1, e0, atol=1e-3)


class TestBAOAB:

    def test_harmonic_boltzmann_statistics(self):
        """BAOAB at kT samples the harmonic Boltzmann distribution:
        bond-length variance kT/k (relative coordinate) and kinetic
        temperature kT."""
        k_spring, kT = 100.0, 0.5
        pot = dimer_potential(k=k_spring)
        x0 = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0]])[None].repeat(512, 0)
        v0 = jnp.zeros_like(x0)
        st, traj = jax.jit(lambda x, v, k: baoab(
            pot, x, v, k, dt=0.02, n_steps=4000, friction=2.0, kT=kT,
            collect_every=200))(x0, v0, jax.random.PRNGKey(0))
        # Discard the first half as equilibration.
        xs = np.asarray(traj[10:])
        r = np.linalg.norm(xs[..., 0, :] - xs[..., 1, :], axis=-1)
        # Radial Boltzmann: Var(r) ~ kT/k_eff with k_eff = k (reduced
        # coordinate r has mu = m/2 but variance is set by k only).
        np.testing.assert_allclose(r.var(), kT / k_spring, rtol=0.1)
        t_inst = float(jnp.mean(temperature(st.v)))
        np.testing.assert_allclose(t_inst, kT, rtol=0.1)

    def test_zero_friction_matches_verlet(self):
        pot = dimer_potential()
        x0 = jnp.asarray([[0.0, 0, 0], [1.15, 0, 0]])
        v0 = jnp.asarray([[0.1, 0, 0], [-0.1, 0, 0]])
        nve, _ = velocity_verlet(pot, x0, v0, dt=0.01, n_steps=50)
        nvt, _ = baoab(pot, x0, v0, jax.random.PRNGKey(0), dt=0.01,
                       n_steps=50, friction=0.0)
        np.testing.assert_allclose(np.asarray(nvt.x), np.asarray(nve.x),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(nvt.v), np.asarray(nve.v),
                                   atol=1e-5)

    def test_lj_cluster_stays_bound_and_thermal(self):
        """LJ7 at low temperature: BAOAB keeps the cluster bound with
        negative potential energy and the requested temperature."""
        from vaemolsim_tpu.potentials import com_restraint, minimize_energy

        pot = composite(lennard_jones(), com_restraint(1.0))
        x0 = minimize_energy(
            pot, 0.7 * jax.random.normal(jax.random.PRNGKey(0), (16, 7, 3)),
            steps=1500, lr=0.1)
        st, _ = jax.jit(lambda x, k: baoab(
            pot, x, jnp.zeros_like(x), k, dt=0.005, n_steps=2000,
            friction=1.0, kT=0.2))(x0, jax.random.PRNGKey(1))
        assert float(jnp.max(pot(st.x))) < -10.0  # still bound
        np.testing.assert_allclose(float(jnp.mean(temperature(st.v))),
                                   0.2, rtol=0.15)


class TestCoulomb:

    def test_two_charges_hand_computed(self):
        u = coulomb(jnp.asarray([1.0, -2.0]))
        x = jnp.asarray([[0.0, 0, 0], [2.0, 0, 0]])
        np.testing.assert_allclose(float(u(x)), -1.0, rtol=1e-6)

    def test_minimum_image_and_cutoff_shift(self):
        u = coulomb(jnp.asarray([1.0, 1.0]), box=[10.0, 10.0, 10.0],
                    cutoff=4.0)
        x = jnp.asarray([[0.5, 0, 0], [9.5, 0, 0]])  # wrapped r = 1
        np.testing.assert_allclose(float(u(x)), 1.0 - 0.25, rtol=1e-5)
        far = jnp.asarray([[0.0, 0, 0], [5.0, 0, 0]])
        assert float(u(far)) == 0.0

    def test_exclusions_and_charge_count_validation(self):
        q3 = jnp.asarray([1.0, -1.0, 1.0])
        excl = exclusions_from_bonds(3, [[0, 1], [1, 2]],
                                     through_angles=False)
        u = coulomb(q3, exclude=excl)
        x = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0]])
        # Only the 0-2 pair survives: q0 q2 / 2 = 0.5.
        np.testing.assert_allclose(float(u(x)), 0.5, rtol=1e-6)
        with pytest.raises(ValueError, match="atoms"):
            u(jnp.zeros((4, 3)))
        with pytest.raises(ValueError, match="charges"):
            coulomb(jnp.zeros((2, 2)))

    def test_md_with_coulomb_conserves_energy(self):
        """Full composite (bond + LJ + Coulomb) through NVE — the force
        of every term is consistent with its energy."""
        bonds = [[0, 1]]
        pot = composite(
            harmonic_bonds(bonds, 50.0, 1.0),
            lennard_jones(sigma=0.8, epsilon=0.2,
                          exclude=exclusions_from_bonds(3, bonds,
                                                        through_angles=False)),
            coulomb(jnp.asarray([0.5, -0.5, 0.2])))
        x0 = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0], [0.5, 1.5, 0]])
        v0 = 0.1 * jax.random.normal(jax.random.PRNGKey(0), x0.shape)
        e0 = float(pot(x0) + kinetic_energy(v0))
        st, _ = velocity_verlet(pot, x0, v0, dt=0.002, n_steps=2000)
        e1 = float(pot(st.x) + kinetic_energy(st.v))
        np.testing.assert_allclose(e1, e0, rtol=2e-3)


class TestNeighborMD:
    """Chunked integrators over the reusable cell neighbor list."""

    def _sys(self, **kw):
        from vaemolsim_tpu.potentials import lennard_jones_cell_neighbor
        build, energy = lennard_jones_cell_neighbor(
            box=[9.0] * 3, cutoff=2.5, skin=0.5, capacity=32, **kw)
        g = jnp.stack(jnp.meshgrid(*[jnp.arange(4.0)] * 3,
                                   indexing="ij"), -1).reshape(-1, 3) * 2.2
        v0 = 0.2 * jax.random.normal(jax.random.PRNGKey(2), g.shape)
        return build, energy, g, v0

    def test_nve_conserves_energy(self):
        from vaemolsim_tpu.md import velocity_verlet_neighbor
        build, energy, x0, v0 = self._sys()
        e0 = float(energy(build(x0), x0) + kinetic_energy(v0))
        st, _ = jax.jit(lambda x, v: velocity_verlet_neighbor(
            build, energy, x, v, dt=0.002, n_steps=400,
            rebuild_every=10))(x0, v0)
        e1 = float(energy(build(st.x), st.x) + kinetic_energy(st.v))
        np.testing.assert_allclose(e1, e0, rtol=5e-3)

    def test_nve_pallas_backend(self):
        from vaemolsim_tpu.md import velocity_verlet_neighbor
        build, energy, x0, v0 = self._sys(backend="pallas",
                                          interpret=True)
        e0 = float(energy(build(x0), x0) + kinetic_energy(v0))
        st, _ = velocity_verlet_neighbor(build, energy, x0, v0,
                                         dt=0.002, n_steps=50,
                                         rebuild_every=10)
        e1 = float(energy(build(st.x), st.x) + kinetic_energy(st.v))
        np.testing.assert_allclose(e1, e0, rtol=5e-3)

    def test_baoab_thermalizes(self):
        from vaemolsim_tpu.md import baoab_neighbor, temperature
        build, energy, x0, v0 = self._sys()
        st, _ = jax.jit(lambda x, v, k: baoab_neighbor(
            build, energy, x, v, k, dt=0.004, n_steps=600,
            rebuild_every=10, friction=2.0, kT=0.7))(
                x0, v0, jax.random.PRNGKey(3))
        assert np.isfinite(np.asarray(st.x)).all()
        assert abs(float(temperature(st.v)) - 0.7) < 0.25

    def test_rebuild_every_validated(self):
        from vaemolsim_tpu.md import (baoab_neighbor,
                                      velocity_verlet_neighbor)
        build, energy, x0, v0 = self._sys()
        with pytest.raises(ValueError, match="rebuild_every"):
            velocity_verlet_neighbor(build, energy, x0, v0, dt=0.01,
                                     n_steps=10, rebuild_every=3)
        with pytest.raises(ValueError, match="rebuild_every"):
            baoab_neighbor(build, energy, x0, v0,
                           jax.random.PRNGKey(0), dt=0.01, n_steps=10,
                           rebuild_every=0)


class TestNPTMD:
    """BAOAB + MC barostat (md.baoab_npt): exact ideal-gas volume law,
    virial self-consistency on LJ, and thermostat health under volume
    moves."""

    @staticmethod
    def _ideal_gas_factory(b):
        del b
        return lambda x: jnp.zeros(x.shape[:-2], x.dtype)

    def test_ideal_gas_volume_gamma(self):
        """MC-barostat volume sampling of an ideal gas is exactly
        V ~ Gamma(N+1, beta P), independent of the MD in between."""
        from vaemolsim_tpu.md import baoab_npt
        n_atoms = 8
        x0 = jax.random.uniform(jax.random.PRNGKey(0),
                                (256, n_atoms, 3)) * 2.0
        v0 = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
        st, collected = jax.jit(lambda x, v, k: baoab_npt(
            self._ideal_gas_factory, x, v, [2.0] * 3, k, dt=0.01,
            n_steps=4000, pressure=1.0, kT=1.0, vol_every=2,
            dlnv_scale=0.3, collect=True))(
                x0, v0, jax.random.PRNGKey(2))
        _, boxes = collected
        vols = np.asarray(jnp.prod(boxes[400:], axis=-1)).ravel()
        mean = n_atoms + 1.0  # Gamma(N+1, 1)
        assert abs(vols.mean() - mean) < 0.15 * mean
        assert abs(vols.var() - mean) < 0.3 * mean
        assert int(st.vol_trials) == 2000 * 256

    def test_lj_virial_self_consistency_and_temperature(self):
        """<P_virial> under NPT-MD(P_set) equals P_set and the kinetic
        temperature stays at kT with the barostat active."""
        from vaemolsim_tpu import observables
        from vaemolsim_tpu.md import baoab_npt, temperature
        p_set, n_atoms, kt = 0.05, 16, 1.0
        fac = lambda b: lennard_jones(box=b, cutoff=2.5)  # noqa: E731
        # Overlap-free start: 16 of 27 simple-cubic sites (spacing ~2.7).
        grid = np.stack(np.meshgrid(*[np.linspace(0.5, 6.5, 3)] * 3,
                                    indexing="ij"), -1).reshape(-1, 3)
        grid = grid[:n_atoms]
        x0 = (jnp.asarray(grid, jnp.float32)[None]
              + 0.1 * jax.random.normal(jax.random.PRNGKey(3),
                                        (32, n_atoms, 3)))
        v0 = jax.random.normal(jax.random.PRNGKey(4), x0.shape)
        st, collected = jax.jit(lambda x, v, k: baoab_npt(
            fac, x, v, [8.0] * 3, k, dt=0.003, n_steps=3000,
            pressure=p_set, kT=kt, friction=2.0, vol_every=10,
            dlnv_scale=0.1, min_box=5.0, collect=True))(
                x0, v0, jax.random.PRNGKey(5))
        xs, boxes = collected
        xs, boxes = xs[100:], boxes[100:]
        p_fn = jax.jit(jax.vmap(jax.vmap(
            lambda x, b: observables.virial_pressure(fac, x, box=b))))
        p_vir = float(np.asarray(p_fn(xs, boxes)).mean())
        assert abs(p_vir - p_set) < 0.35 * p_set
        assert abs(float(temperature(st.v).mean()) - kt) < 0.15
        assert float(jnp.min(st.box)) >= 5.0
        assert 0.05 < float(st.vol_acceptance_rate) <= 1.0

    def test_resume_and_validation(self):
        from vaemolsim_tpu.md import baoab_npt
        x0 = jax.random.uniform(jax.random.PRNGKey(6), (4, 5, 3))
        v0 = jnp.zeros_like(x0)
        st, _ = baoab_npt(self._ideal_gas_factory, x0, v0, [1.0] * 3,
                          jax.random.PRNGKey(7), dt=0.01, n_steps=10,
                          pressure=1.0, vol_every=5)
        st2, _ = baoab_npt(self._ideal_gas_factory, None, None, None,
                           None, dt=0.01, n_steps=10, pressure=1.0,
                           vol_every=5, state=st)
        assert int(st2.vol_trials) == 2 * int(st.vol_trials)
        assert np.isfinite(np.asarray(st2.x)).all()
        with pytest.raises(ValueError, match="vol_every"):
            baoab_npt(self._ideal_gas_factory, x0, v0, [1.0] * 3,
                      jax.random.PRNGKey(8), dt=0.01, n_steps=10,
                      pressure=1.0, vol_every=3)


class TestNoseHoover:
    """Nose-Hoover chains: the deterministic NVT thermostat (MTK
    scheme).  Beyond-reference (the reference is MC-only)."""

    k_spring = 4.0

    @staticmethod
    def _pot(x):
        return 0.5 * TestNoseHoover.k_spring * jnp.sum(x * x,
                                                       axis=(-2, -1))

    def test_invariant_conserved(self):
        """The extended Hamiltonian is flat along the trajectory —
        the NVE-energy-style integration diagnostic."""
        from vaemolsim_tpu.md import nose_hoover, nose_hoover_invariant
        x0 = 0.3 * jax.random.normal(jax.random.PRNGKey(0), (8, 4, 3))
        v0 = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
        st1, _ = nose_hoover(self._pot, x0, v0, dt=0.005, n_steps=1,
                             kT=1.5, tau=0.5)
        h0 = nose_hoover_invariant(self._pot, st1, kT=1.5, tau=0.5)
        st2, _ = nose_hoover(self._pot, x0, v0, dt=0.005, n_steps=4000,
                             kT=1.5, tau=0.5)
        h1 = nose_hoover_invariant(self._pot, st2, kT=1.5, tau=0.5)
        rel = jnp.max(jnp.abs(h1 - h0)) / jnp.mean(jnp.abs(h0))
        assert float(rel) < 1e-3

    def test_canonical_sampling(self):
        """Chains (n_chain=3) make even the pure-harmonic system
        ergodic: equipartition holds for both <v^2> and <k x^2>."""
        from vaemolsim_tpu.md import nose_hoover, temperature
        kt = 1.5
        x0 = 0.3 * jax.random.normal(jax.random.PRNGKey(2), (64, 4, 3))
        v0 = jnp.sqrt(kt) * jax.random.normal(jax.random.PRNGKey(3),
                                              x0.shape)
        st, traj = nose_hoover(self._pot, x0, v0, dt=0.01,
                               n_steps=20000, kT=kt, tau=0.3,
                               collect_every=20)
        xs = traj[traj.shape[0] // 2:]
        assert abs(float(self.k_spring * jnp.mean(xs * xs)) - kt) < 0.1
        assert abs(float(jnp.mean(temperature(st.v))) - kt) < 0.2

    def test_resume_exact(self):
        """Two segments through `state` reproduce one long run
        bit-for-bit (deterministic dynamics, cached force reused)."""
        from vaemolsim_tpu.md import nose_hoover
        x0 = 0.2 * jax.random.normal(jax.random.PRNGKey(4), (3, 2, 3))
        v0 = jax.random.normal(jax.random.PRNGKey(5), x0.shape)
        full, _ = nose_hoover(self._pot, x0, v0, dt=0.01, n_steps=40,
                              kT=1.0, tau=0.2)
        half, _ = nose_hoover(self._pot, x0, v0, dt=0.01, n_steps=20,
                              kT=1.0, tau=0.2)
        resumed, _ = nose_hoover(self._pot, None, None, dt=0.01,
                                 n_steps=20, kT=1.0, tau=0.2,
                                 state=half)
        np.testing.assert_array_equal(np.asarray(full.x),
                                      np.asarray(resumed.x))
        np.testing.assert_array_equal(np.asarray(full.v_xi),
                                      np.asarray(resumed.v_xi))

    def test_single_chain_and_sy_stages(self):
        """n_chain=1 (plain Nose-Hoover) and every SY stage count
        integrate stably and conserve their invariants."""
        from vaemolsim_tpu.md import nose_hoover, nose_hoover_invariant
        x0 = 0.3 * jax.random.normal(jax.random.PRNGKey(6), (4, 3, 3))
        v0 = jax.random.normal(jax.random.PRNGKey(7), x0.shape)
        for n_chain, n_sy in [(1, 7), (2, 1), (3, 3)]:
            st1, _ = nose_hoover(self._pot, x0, v0, dt=0.005,
                                 n_steps=1, kT=1.0, tau=0.5,
                                 n_chain=n_chain, n_sy=n_sy)
            h0 = nose_hoover_invariant(self._pot, st1, kT=1.0, tau=0.5)
            st2, _ = nose_hoover(self._pot, x0, v0, dt=0.005,
                                 n_steps=500, kT=1.0, tau=0.5,
                                 n_chain=n_chain, n_sy=n_sy)
            h1 = nose_hoover_invariant(self._pot, st2, kT=1.0, tau=0.5)
            rel = jnp.max(jnp.abs(h1 - h0)) / jnp.mean(jnp.abs(h0))
            assert float(rel) < 5e-3, (n_chain, n_sy)

    def test_validation(self):
        from vaemolsim_tpu.md import (nose_hoover,
                                      nose_hoover_invariant)
        x0 = jnp.zeros((2, 2, 3))
        with pytest.raises(ValueError, match="n_sy"):
            nose_hoover(self._pot, x0, x0, dt=0.01, n_steps=4, n_sy=5)
        with pytest.raises(ValueError, match="n_chain"):
            nose_hoover(self._pot, x0, x0, dt=0.01, n_steps=4,
                        n_chain=0)
        with pytest.raises(ValueError, match="collect_every"):
            nose_hoover(self._pot, x0, x0, dt=0.01, n_steps=5,
                        collect_every=2)
        st, _ = nose_hoover(self._pot, x0, x0, dt=0.01, n_steps=4)
        with pytest.raises(ValueError, match="tau"):
            nose_hoover_invariant(self._pot, st, kT=1.0)
        # dt fills in the default tau.
        h = nose_hoover_invariant(self._pot, st, kT=1.0, dt=0.01)
        assert np.isfinite(np.asarray(h)).all()


class TestSteeredMD:
    """Nonequilibrium work + Jarzynski/Crooks, pinned on the harmonic
    stiffness switch whose free-energy difference is exact:
    dF = (kT/2) ln(k2/k1) per degree of freedom."""

    kT, k1, k2 = 1.0, 1.0, 4.0

    @classmethod
    def _pot_for(cls, lam):
        k = (1.0 - lam) * cls.k1 + lam * cls.k2
        return lambda x: 0.5 * k * jnp.sum(x * x, axis=(-2, -1))

    def _work(self, key_x, key_md, *, reverse):
        from vaemolsim_tpu.md import steered_baoab
        n_rep, n_steps = 8192, 400
        k_eq = self.k2 if reverse else self.k1
        x0 = jnp.sqrt(self.kT / k_eq) * jax.random.normal(
            jax.random.PRNGKey(key_x), (n_rep, 1, 1))
        v0 = jnp.sqrt(self.kT) * jax.random.normal(
            jax.random.PRNGKey(key_x + 100), x0.shape)
        lams = jnp.linspace(0.0, 1.0, n_steps + 1)
        if reverse:
            lams = lams[::-1]
        _, w = steered_baoab(self._pot_for, x0, v0,
                             jax.random.PRNGKey(key_md), dt=0.05,
                             n_steps=n_steps, lambdas=lams,
                             friction=2.0, kT=self.kT)
        return w

    def test_jarzynski_and_crooks(self):
        from vaemolsim_tpu.mcmc.free_energy import (bar_free_energy,
                                                    exp_free_energy)
        wf = self._work(0, 2, reverse=False)
        wr = self._work(3, 4, reverse=True)
        df_true = 0.5 * np.log(self.k2 / self.k1)
        jar, err = exp_free_energy(wf / self.kT)
        assert abs(float(jar) - df_true) < max(4 * float(err), 0.02)
        bar, berr = bar_free_energy(wf / self.kT, wr / self.kT)
        assert abs(float(bar) - df_true) < max(4 * float(berr), 0.02)
        # Second law brackets: <W_f> >= dF >= -<W_r>, strictly at
        # finite switching rate (dissipation is positive).
        assert float(jnp.mean(wf)) > df_true
        assert float(-jnp.mean(wr)) < df_true

    def test_dragged_trap_zero_df(self):
        """Dragging a harmonic trap leaves Z unchanged: dF = 0 while
        the mean work is strictly positive (pure dissipation)."""
        from vaemolsim_tpu.md import steered_baoab
        from vaemolsim_tpu.mcmc.free_energy import exp_free_energy
        kT, k_spring, L = 1.0, 4.0, 2.0

        def pot_for(lam):
            return lambda x: 0.5 * k_spring * jnp.sum(
                (x - lam * L) ** 2, axis=(-2, -1))

        n_rep, n_steps = 8192, 500
        x0 = jnp.sqrt(kT / k_spring) * jax.random.normal(
            jax.random.PRNGKey(0), (n_rep, 1, 1))
        v0 = jnp.sqrt(kT) * jax.random.normal(jax.random.PRNGKey(1),
                                              x0.shape)
        _, w = steered_baoab(pot_for, x0, v0, jax.random.PRNGKey(2),
                             dt=0.02, n_steps=n_steps,
                             lambdas=jnp.linspace(0, 1, n_steps + 1),
                             friction=2.0, kT=kT)
        jar, err = exp_free_energy(w / kT)
        assert abs(float(jar)) < max(4 * float(err), 0.03)
        assert float(jnp.mean(w)) > 0.05  # dissipated work

    def test_sudden_switch_is_fep(self):
        """A 1-step protocol reduces to free-energy perturbation:
        W = U_1(x) - U_0(x) over equilibrium samples of state 0."""
        from vaemolsim_tpu.md import steered_baoab
        x0 = jnp.sqrt(self.kT / self.k1) * jax.random.normal(
            jax.random.PRNGKey(5), (4096, 1, 1))
        v0 = jnp.zeros_like(x0)
        _, w = steered_baoab(self._pot_for, x0, v0,
                             jax.random.PRNGKey(6), dt=1e-9,
                             n_steps=1, lambdas=jnp.array([0.0, 1.0]),
                             friction=0.0, kT=self.kT)
        want = 0.5 * (self.k2 - self.k1) * np.sum(
            np.asarray(x0) ** 2, axis=(-2, -1))
        np.testing.assert_allclose(np.asarray(w), want, rtol=1e-3,
                                   atol=1e-5)

    def test_validation(self):
        from vaemolsim_tpu.md import steered_baoab
        x0 = jnp.zeros((4, 1, 1))
        with pytest.raises(ValueError, match="lambdas"):
            steered_baoab(self._pot_for, x0, x0, jax.random.PRNGKey(0),
                          dt=0.01, n_steps=5,
                          lambdas=jnp.linspace(0, 1, 5))


class TestCSVR:

    kspr = 4.0

    @staticmethod
    def pot(x):
        return 0.5 * 4.0 * jnp.sum(x[..., 0, :] ** 2, -1)

    def test_configurational_and_kinetic_ensemble(self):
        # <x^2> = kT/k; K ~ chi^2(Nf): var(K)/mean(K) = kT.
        kT = 1.5
        x0 = jnp.zeros((256, 1, 2))
        v0 = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
        st, traj = md.csvr(self.pot, x0, v0, jax.random.PRNGKey(1),
                           dt=0.02, n_steps=20_000, kT=kT, tau=0.2,
                           collect_every=10)
        xs = np.asarray(traj[500:])
        np.testing.assert_allclose(xs.var(), kT / self.kspr, rtol=0.05)
        np.testing.assert_allclose(
            float(md.temperature(st.v).mean()), kT, rtol=0.12)

    def test_kinetic_energy_is_chi_squared(self):
        # Many replicas, one snapshot: K/(kT/2) ~ chi^2 with Nf dofs
        # -> mean Nf, variance 2 Nf.
        kT, Nf = 1.0, 6
        x0 = jnp.zeros((4096, 3, 2))
        v0 = jnp.sqrt(kT) * jax.random.normal(jax.random.PRNGKey(2),
                                              x0.shape)
        st, _ = md.csvr(self.pot, x0, v0, jax.random.PRNGKey(3),
                        dt=0.01, n_steps=500, kT=kT, tau=0.05)
        z = np.asarray(2.0 * md.kinetic_energy(st.v) / kT)
        np.testing.assert_allclose(z.mean(), Nf, rtol=0.05)
        np.testing.assert_allclose(z.var(), 2 * Nf, rtol=0.15)

    def test_conserved_effective_energy(self):
        kT = 1.0
        x0 = 0.5 * jax.random.normal(jax.random.PRNGKey(4), (64, 1, 2))
        v0 = jax.random.normal(jax.random.PRNGKey(5), x0.shape)
        e0 = np.asarray(self.pot(x0) + md.kinetic_energy(v0))
        st, _ = md.csvr(self.pot, x0, v0, jax.random.PRNGKey(6),
                        dt=0.01, n_steps=5_000, kT=kT, tau=0.1)
        e_t = np.asarray(self.pot(st.x) + md.kinetic_energy(st.v))
        drift = e_t - np.asarray(st.work) - e0
        # per-replica conservation to integration error (<< kT)
        assert np.abs(drift).max() < 0.05, np.abs(drift).max()

    def test_resume_continues_exactly(self):
        x0 = jnp.zeros((8, 1, 2))
        v0 = jax.random.normal(jax.random.PRNGKey(7), x0.shape)
        k = jax.random.PRNGKey(8)
        full, _ = md.csvr(self.pot, x0, v0, k, dt=0.01, n_steps=100)
        # resume path: same state object semantics as nose_hoover
        half, _ = md.csvr(self.pot, x0, v0, k, dt=0.01, n_steps=100,
                          state=None)
        np.testing.assert_allclose(np.asarray(full.x),
                                   np.asarray(half.x))


class TestRESPA:

    # Stiff bond (omega = 400 -> plain-Verlet limit dt < 2/400 = 0.005;
    # impulse-resonance limit ~ half the fast period = pi/400 = 0.0079)
    # plus a soft confining well.  The outer step 0.006 sits in the
    # window where plain Verlet is unstable and RESPA is resonance-free.
    @staticmethod
    def fast(x):
        q = x[..., 0, :]
        return 0.5 * 1.6e5 * jnp.sum((q - 1.0) ** 2, -1)

    @staticmethod
    def slow(x):
        q = x[..., 0, :]
        return 0.5 * 1.0 * jnp.sum(q ** 2, -1)

    def total(self, x):
        return self.fast(x) + self.slow(x)

    def test_conserves_beyond_plain_verlet_limit(self):
        x0 = jnp.full((8, 1, 1), 1.002)
        v0 = 0.5 * jax.random.normal(jax.random.PRNGKey(0), x0.shape)
        e0 = np.asarray(self.total(x0) + kinetic_energy(v0))

        # plain Verlet above the stiff stability limit: blows up
        st_plain, _ = velocity_verlet(self.total, x0, v0, dt=0.006,
                                      n_steps=500)
        e_plain = np.asarray(self.total(st_plain.x)
                             + kinetic_energy(st_plain.v))
        assert (~np.isfinite(e_plain)).any() or \
            np.abs(e_plain - e0).max() > 10 * np.abs(e0).max()

        # r-RESPA at the SAME outer dt with n_inner = 8: conserved
        st, _ = md.respa_verlet(self.fast, self.slow, x0, v0, dt=0.006,
                                n_steps=500, n_inner=8)
        e = np.asarray(self.total(st.x) + kinetic_energy(st.v))
        np.testing.assert_allclose(e, e0, rtol=0.02)

    def test_matches_verlet_at_fine_steps(self):
        # With a tiny outer step both integrators follow the same
        # trajectory to discretization error.
        x0 = jnp.full((4, 1, 1), 1.001)
        v0 = jnp.zeros_like(x0)
        st_r, _ = md.respa_verlet(self.fast, self.slow, x0, v0,
                                  dt=0.002, n_steps=200, n_inner=2)
        st_v, _ = velocity_verlet(self.total, x0, v0, dt=0.001,
                                  n_steps=400)
        np.testing.assert_allclose(np.asarray(st_r.x),
                                   np.asarray(st_v.x), atol=1e-4)

    def test_validation(self):
        with pytest.raises(ValueError, match="n_inner"):
            md.respa_verlet(self.fast, self.slow, jnp.zeros((1, 1, 1)),
                            jnp.zeros((1, 1, 1)), dt=0.01, n_steps=2,
                            n_inner=0)
