"""Well-tempered metadynamics (vaemolsim_tpu.metadynamics): grid/bias
machinery, barrier crossing that plain dynamics cannot achieve,
free-energy recovery against quadrature, hill-height decay, and the
periodic-CV path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vaemolsim_tpu import metadynamics as mtd


def double_well(x):
    """U(s) = 8 (s^2 - 1)^2: ~8 kT barrier at kT=1, minima at +-1."""
    s = x[..., 0, 0]
    return 8.0 * (s * s - 1.0) ** 2


def cv(x):
    return x[..., 0, 0]


class TestBiasGrid:

    def test_interp_matches_nodes(self):
        g = mtd.bias_grid(-2.0, 2.0, 41)
        pts = np.linspace(-2, 2, 41)
        g = g._replace(v=jnp.asarray(np.sin(pts)).astype(jnp.float32))
        s = jnp.asarray([-2.0, -1.0, 0.5, 2.0])
        np.testing.assert_allclose(np.asarray(mtd.bias_value(g, s)),
                                   np.sin(np.asarray(s)), atol=5e-3)

    def test_deposit_gaussian_shape(self):
        g = mtd.bias_grid(-2.0, 2.0, 201)
        g = mtd.deposit_hills(g, jnp.asarray([0.0]), height=1.0,
                              width=0.3, gamma=1e9)
        # height ~1 at center, symmetric, derivative antisymmetric
        assert abs(float(mtd.bias_value(g, jnp.asarray(0.0))) - 1.0) < 1e-2
        v = np.asarray(g.v)
        np.testing.assert_allclose(v, v[::-1], atol=1e-6)
        dv = np.asarray(g.dv)
        np.testing.assert_allclose(dv, -dv[::-1], atol=1e-6)

    def test_periodic_wraps(self):
        g = mtd.bias_grid(-np.pi, np.pi, 64, periodic=True)
        g = mtd.deposit_hills(g, jnp.asarray([np.pi - 0.05]), height=1.0,
                              width=0.3, gamma=1e9)
        # mass leaks across the seam: bias near -pi is large too
        assert float(mtd.bias_value(g, jnp.asarray(-np.pi + 0.05))) > 0.5
        # value continuous across the seam
        a = float(mtd.bias_value(g, jnp.asarray(np.pi - 1e-3)))
        b = float(mtd.bias_value(g, jnp.asarray(-np.pi + 1e-3)))
        assert abs(a - b) < 0.1


class TestWellTempered:

    def _run(self, n_steps=4000, gamma=8.0, kt=1.0):
        n_walk = 32
        x0 = jnp.full((n_walk, 1, 1), -1.0)
        x0 = x0 + 0.05 * jax.random.normal(jax.random.PRNGKey(0),
                                           x0.shape)
        g = mtd.bias_grid(-1.8, 1.8, 121)
        st, g, cvs = jax.jit(lambda x, k: mtd.metad_baoab(
            double_well, cv, x, jnp.zeros_like(x), k, dt=0.01,
            n_steps=n_steps, deposit_every=20, grid=g, hill_height=0.25,
            hill_width=0.15, kT=kt, gamma=gamma, friction=2.0))(
                x0, jax.random.PRNGKey(1))
        return st, g, np.asarray(cvs)

    def test_crosses_barrier_where_plain_md_does_not(self):
        from vaemolsim_tpu import md
        st, g, cvs = self._run()
        # every walker started in the left well; most visit the right
        visited = (cvs > 0.5).any(axis=0)
        assert visited.mean() > 0.8, visited.mean()
        # plain BAOAB at the same kT/length: essentially no crossings
        x0 = jnp.full((32, 1, 1), -1.0)
        stp, _ = jax.jit(lambda x, k: md.baoab(
            double_well, x, jnp.zeros_like(x), k, dt=0.01, n_steps=4000,
            friction=2.0, kT=1.0))(x0, jax.random.PRNGKey(2))
        frac_crossed = float(jnp.mean(stp.x[..., 0, 0] > 0.5))
        assert frac_crossed < 0.1, frac_crossed

    def test_free_energy_matches_quadrature(self):
        _, g, _ = self._run(n_steps=12_000)
        s, f = mtd.free_energy_from_bias(g, kT=1.0, gamma=8.0)
        s, f = np.asarray(s), np.asarray(f)
        u = 8.0 * (s ** 2 - 1.0) ** 2     # F(s) == U(s) for a 1-D CV
        sel = np.abs(s) < 1.3             # well + barrier region
        err = (f - u)[sel]
        err = err - err.mean()            # free energies are relative
        assert float(np.abs(err).max()) < 1.2, float(np.abs(err).max())
        assert float(np.abs(err).mean()) < 0.45

    def test_hill_heights_decay(self):
        """Well-tempering: later hills are strongly attenuated where
        bias has accumulated."""
        _, g, _ = self._run(n_steps=8000, gamma=5.0)
        w_now = float(jnp.exp(-mtd.bias_value(g, jnp.asarray(-1.0))
                              / (1.0 * (5.0 - 1.0))))
        assert w_now < 0.55  # initial scale 1.0 -> strongly tempered

    def test_jit_and_shapes(self):
        st, g, cvs = self._run(n_steps=400)
        assert cvs.shape == (400 // 20, 32)
        assert np.isfinite(np.asarray(g.v)).all()
        assert np.isfinite(np.asarray(st.x)).all()
