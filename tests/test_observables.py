"""On-device observables against analytic results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu.observables import (mean_squared_displacement,
                                       pair_distance_histogram,
                                       radial_distribution,
                                       radius_of_gyration,
                                       velocity_autocorrelation)


class TestStructure:

    def test_rg_hand_computed(self):
        # Two atoms 2 apart: each 1 from the COM -> Rg = 1.
        x = jnp.asarray([[0.0, 0, 0], [2.0, 0, 0]])
        np.testing.assert_allclose(float(radius_of_gyration(x)), 1.0,
                                   rtol=1e-6)
        xb = jnp.stack([x, 2.0 * x])
        np.testing.assert_allclose(np.asarray(radius_of_gyration(xb)),
                                   [1.0, 2.0], rtol=1e-6)

    def test_pair_histogram_normalized_and_peaked(self):
        # Rigid dimer at r=1 in every frame: pdf concentrates in one bin
        # and integrates to 1.
        x = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0]])[None].repeat(32, 0)
        r, pdf = pair_distance_histogram(x, r_max=2.0, n_bins=40)
        dr = 2.0 / 40
        np.testing.assert_allclose(float(jnp.sum(pdf) * dr), 1.0,
                                   rtol=1e-5)
        assert float(r[int(jnp.argmax(pdf))]) == pytest.approx(1.0,
                                                               abs=dr)

    def test_ideal_gas_rdf_is_one(self):
        """Uniform random points in a periodic box: g(r) = 1 at every r
        (the normalization's defining property)."""
        box = [8.0, 8.0, 8.0]
        x = jax.random.uniform(jax.random.PRNGKey(0), (64, 64, 3)) * 8.0
        r, g = radial_distribution(x, box=box, n_bins=30)
        # Skip the first bins (few pairs, noisy).
        np.testing.assert_allclose(np.asarray(g[5:]), 1.0, atol=0.1)

    def test_rdf_rejects_2d(self):
        with pytest.raises(ValueError, match="3-D"):
            radial_distribution(jnp.zeros((4, 2)), box=[1.0, 1.0])

    def test_lj_solid_rdf_first_peak(self):
        """An fcc-like LJ arrangement peaks near r = 2^(1/6)."""
        from vaemolsim_tpu.md import baoab
        from vaemolsim_tpu.potentials import lennard_jones

        # 3x3x3 cubic lattice at the LJ minimum spacing, periodic.
        a = 2.0 ** (1.0 / 6.0)
        g0 = jnp.stack(jnp.meshgrid(*[jnp.arange(3.0)] * 3,
                                    indexing="ij"), -1).reshape(-1, 3) * a
        box = [3 * a] * 3
        pot = lennard_jones(box=box, cutoff=1.6)
        st, traj = baoab(pot, g0[None].repeat(8, 0),
                         jnp.zeros((8, 27, 3)), jax.random.PRNGKey(1),
                         dt=0.004, n_steps=500, friction=2.0, kT=0.1,
                         collect_every=100)
        r, g = radial_distribution(traj.reshape(-1, 27, 3), box=box,
                                   n_bins=40)
        peak_r = float(r[int(jnp.argmax(g))])
        assert abs(peak_r - a) < 0.15, peak_r
        assert float(jnp.max(g)) > 2.0  # strongly structured


class TestDynamics:

    def test_ballistic_msd_quadratic(self):
        """Free particles: x(t) = x0 + v t => MSD(t) = <|v|^2> t^2."""
        key = jax.random.PRNGKey(0)
        v = jax.random.normal(key, (16, 5, 3))
        t = jnp.arange(20.0)[:, None, None, None] * 0.1
        traj = jnp.zeros((16, 5, 3)) + v * t
        msd = np.asarray(mean_squared_displacement(traj))
        v2 = float(jnp.mean(jnp.sum(v * v, -1)))
        np.testing.assert_allclose(msd, v2 * np.asarray(t[:, 0, 0, 0]) ** 2,
                                   rtol=1e-5)

    def test_langevin_msd_diffusive_tail(self):
        """Overdamped Langevin free particle: MSD(t) -> 2 d D t with
        D = kT / (m gamma)."""
        from vaemolsim_tpu.md import baoab

        kT, gamma = 1.0, 5.0
        pot = lambda x: jnp.zeros(x.shape[:-2])  # noqa: E731
        x0 = jnp.zeros((4096, 1, 3))
        st, traj = baoab(pot, x0, jnp.zeros_like(x0), jax.random.PRNGKey(2),
                         dt=0.01, n_steps=4000, friction=gamma, kT=kT,
                         collect_every=200)
        msd = np.asarray(mean_squared_displacement(traj))
        times = 0.01 * 200 * (np.arange(len(msd)))
        d_coef = kT / gamma
        # Fit the slope over the diffusive tail.
        slope = np.polyfit(times[5:], msd[5:], 1)[0]
        np.testing.assert_allclose(slope, 6.0 * d_coef, rtol=0.1)

    def test_vacf_free_particles_constant(self):
        v = jax.random.normal(jax.random.PRNGKey(1), (8, 3, 3))
        vtraj = jnp.broadcast_to(v, (10, 8, 3, 3))
        c = np.asarray(velocity_autocorrelation(vtraj))
        np.testing.assert_allclose(c, 1.0, rtol=1e-6)
        c_raw = np.asarray(velocity_autocorrelation(vtraj,
                                                    normalize=False))
        np.testing.assert_allclose(
            c_raw, float(jnp.mean(jnp.sum(v * v, -1))), rtol=1e-5)
