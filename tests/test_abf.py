"""eABF + CZAR: exact harmonic free energy, double-well FES vs
quadrature, bin bookkeeping, and the periodic torsion path."""

import jax
import jax.numpy as jnp
import numpy as np

from vaemolsim_tpu import abf, colvars, potentials


def _proj_cv(x):
    return x[..., 0, 0]


class TestBookkeeping:
    def test_counts_are_exact(self):
        pot = lambda x: 0.5 * jnp.sum(x ** 2, axis=(-1, -2))  # noqa: E731
        x0 = jnp.zeros((4, 1, 3))
        g = abf.abf_grid(-3.0, 3.0, 16)
        _, _, tbl, _ = abf.eabf_baoab(
            pot, _proj_cv, x0, jnp.zeros_like(x0), jax.random.PRNGKey(0),
            dt=0.01, n_steps=25, grid=g, kappa=50.0, kT=1.0)
        assert float(jnp.sum(tbl.count)) == 25 * 4
        assert float(jnp.sum(tbl.s_count)) == 25 * 4

    def test_collect_trajectory(self):
        pot = lambda x: 0.5 * jnp.sum(x ** 2, axis=(-1, -2))  # noqa: E731
        x0 = jnp.zeros((3, 1, 3))
        g = abf.abf_grid(-3.0, 3.0, 16)
        _, _, _, traj = abf.eabf_baoab(
            pot, _proj_cv, x0, jnp.zeros_like(x0), jax.random.PRNGKey(0),
            dt=0.01, n_steps=20, grid=g, kappa=50.0, collect_every=5)
        assert traj.shape == (4, 2, 3)  # (n_collect, (s, lam), walkers)


class TestHarmonic:
    """U = k/2 x^2 along the CV: A(s) = k/2 s^2 exactly."""

    def _run(self, n_steps=30_000):
        k_s = 2.0
        pot = lambda x: 0.5 * k_s * jnp.sum(x ** 2, axis=(-1, -2))  # noqa
        x0 = jnp.zeros((16, 1, 1))
        g = abf.abf_grid(-2.2, 2.2, 33)
        _, _, tbl, _ = abf.eabf_baoab(
            jax.jit(pot), lambda x: x[..., 0, 0], x0, jnp.zeros_like(x0),
            jax.random.PRNGKey(1), dt=0.02, n_steps=n_steps, grid=g,
            kappa=100.0, kT=1.0, friction=2.0)
        return k_s, tbl

    def test_both_estimators_match_exact(self):
        k_s, tbl = self._run()
        for centers, a in (abf.abf_free_energy(tbl),
                           abf.czar_free_energy(tbl, kappa=100.0)):
            centers, a = np.asarray(centers), np.asarray(a)
            sel = np.abs(centers) < 1.5
            exact = 0.5 * k_s * centers ** 2
            err = (a - exact)[sel]
            err = err - err.mean()
            assert float(np.abs(err).max()) < 0.35, float(np.abs(err).max())


class TestDoubleWell:
    def _dw(self, x):
        s = x[..., 0, 0]
        return 6.0 * (s ** 2 - 1.0) ** 2

    def test_crosses_and_matches_quadrature(self):
        # 6 kT barrier: plain MD at kT=1 stays put on this budget; eABF
        # walks through and recovers the profile.
        x0 = -jnp.ones((16, 1, 1))
        g = abf.abf_grid(-1.6, 1.6, 33)
        st, _, tbl, _ = abf.eabf_baoab(
            jax.jit(self._dw), lambda x: x[..., 0, 0], x0,
            jnp.zeros_like(x0), jax.random.PRNGKey(2), dt=0.01,
            n_steps=40_000, grid=g, kappa=200.0, kT=1.0, friction=2.0,
            ramp_count=100.0)
        assert float(jnp.mean(st.x[..., 0, 0] > 0.5)) > 0.05
        centers, a = abf.czar_free_energy(tbl, kappa=200.0)
        centers, a = np.asarray(centers), np.asarray(a)
        sel = np.abs(centers) < 1.3
        exact = 6.0 * (centers ** 2 - 1.0) ** 2
        err = (a - exact)[sel]
        err = err - err.mean()
        assert float(np.abs(err).max()) < 1.5, float(np.abs(err).max())
        assert float(np.abs(err).mean()) < 0.6, float(np.abs(err).mean())


class TestPeriodicTorsion:
    def test_torsion_pmf_well_ordering(self):
        """4-atom chain with a 3-fold torsion: recovered PMF must put
        the wells (phi = +-pi/3, pi) below the barriers (0, +-2pi/3)."""
        bonds = jnp.asarray([[0, 1], [1, 2], [2, 3]])
        angs = jnp.asarray([[0, 1, 2], [1, 2, 3]])
        pot = potentials.composite(
            potentials.harmonic_bonds(bonds, k=300.0, r0=1.0),
            potentials.harmonic_angles(angs, k=60.0, theta0=1.9),
            potentials.periodic_torsions([[0, 1, 2, 3]], k=1.0, n=3,
                                         phase=0.0))
        cv = colvars.torsion(0, 1, 2, 3)
        x0 = jnp.asarray([[0.0, 1.0, 0.0], [0.0, 0.0, 0.0],
                          [1.0, 0.0, 0.0], [1.4, 0.4, 0.9]])
        x0 = jnp.tile(x0[None], (8, 1, 1)) + 0.01 * jax.random.normal(
            jax.random.PRNGKey(3), (8, 4, 3))
        g = abf.abf_grid(-np.pi, np.pi, 36, periodic=True)
        _, _, tbl, _ = abf.eabf_baoab(
            pot, cv, x0, jnp.zeros_like(x0), jax.random.PRNGKey(4),
            dt=2e-3, n_steps=30_000, grid=g, kappa=150.0, kT=1.0,
            friction=2.0)
        centers, a = abf.czar_free_energy(tbl, kappa=150.0)
        centers, a = np.asarray(centers), np.asarray(a)

        def mean_near(s0):
            d = np.abs(np.angle(np.exp(1j * (centers - s0))))
            return a[d < 0.3].mean()

        wells = [mean_near(s) for s in (np.pi / 3, -np.pi / 3, np.pi)]
        barriers = [mean_near(s) for s in (0.0, 2 * np.pi / 3,
                                           -2 * np.pi / 3)]
        assert max(wells) < min(barriers), (wells, barriers)
        # barrier height ~ 2k = 2.0 within a loose factor
        height = np.mean(barriers) - np.mean(wells)
        assert 1.0 < height < 3.5, height
