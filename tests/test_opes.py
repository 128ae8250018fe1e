"""OPES (vaemolsim_tpu.opes): bias-cap property, barrier crossing,
free-energy recovery against quadrature, reweighting consistency with
metadynamics, and the periodic-CV path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu import opes


def double_well(x):
    """U(s) = 8 (s^2 - 1)^2: ~8 kT barrier at kT=1, minima at +-1."""
    s = x[..., 0, 0]
    return 8.0 * (s * s - 1.0) ** 2


def cv(x):
    return x[..., 0, 0]


def _run(n_steps=4000, barrier=12.0, gamma=10.0, seed=1):
    n_walk = 32
    x0 = jnp.full((n_walk, 1, 1), -1.0)
    x0 = x0 + 0.05 * jax.random.normal(jax.random.PRNGKey(0), x0.shape)
    g = opes.opes_grid(-1.8, 1.8, 121, barrier=barrier, gamma=gamma)
    st, g, cvs = jax.jit(lambda x, k: opes.opes_baoab(
        double_well, cv, x, jnp.zeros_like(x), k, dt=0.01,
        n_steps=n_steps, deposit_every=20, grid=g, sigma=0.12,
        friction=2.0))(x0, jax.random.PRNGKey(seed))
    return st, g, np.asarray(cvs)


class TestState:

    def test_zero_bias_before_first_deposit(self):
        g = opes.opes_grid(-2.0, 2.0, 61, barrier=10.0)
        s = jnp.asarray([-1.0, 0.0, 1.5])
        np.testing.assert_array_equal(
            np.asarray(opes.opes_bias_value(g, s)), 0.0)
        np.testing.assert_array_equal(
            np.asarray(opes.opes_bias_derivative(g, s)), 0.0)

    def test_parameter_validation(self):
        with pytest.raises(ValueError, match="barrier"):
            opes.opes_grid(-1.0, 1.0, 11, barrier=0.0)
        with pytest.raises(ValueError, match="gamma"):
            opes.opes_grid(-1.0, 1.0, 11, barrier=5.0, gamma=1.0)

    def test_single_kernel_shape(self):
        g = opes.opes_grid(-2.0, 2.0, 201, barrier=10.0)
        g = opes.opes_deposit(g, jnp.asarray([0.0]), sigma=0.3)
        p = np.asarray(g.prob)
        np.testing.assert_allclose(p, p[::-1], atol=1e-6)  # symmetric
        dp = np.asarray(g.dprob)
        np.testing.assert_allclose(dp, -dp[::-1], atol=1e-5)
        # bias is maximal at the kernel center (most-probable region is
        # pushed hardest), and derivative vanishes there
        v0 = float(opes.opes_bias_value(g, jnp.asarray(0.0)))
        v1 = float(opes.opes_bias_value(g, jnp.asarray(1.0)))
        assert v0 > v1
        assert abs(float(opes.opes_bias_derivative(
            g, jnp.asarray(0.0)))) < 1e-3

    def test_periodic_kernel_wraps(self):
        g = opes.opes_grid(-np.pi, np.pi, 64, barrier=10.0,
                           periodic=True)
        g = opes.opes_deposit(g, jnp.asarray([np.pi - 0.05]), sigma=0.3)
        a = float(opes.opes_bias_value(g, jnp.asarray(np.pi - 1e-3)))
        b = float(opes.opes_bias_value(g, jnp.asarray(-np.pi + 1e-3)))
        assert abs(a - b) < 0.05 * abs(a)
        assert float(opes.opes_bias_value(
            g, jnp.asarray(-np.pi + 0.05))) > 0.5 * a


class TestOPESRun:

    def test_bias_floor_capped_at_barrier(self):
        """The eps regularizer's hard guarantee: V(s) >= -DeltaE
        EVERYWHERE (including never-visited CV values), exactly by
        construction — unexplored regions are never favored by more
        than the barrier allowance.  The range above the floor only
        carries the ln(P_max/Z) peak excess on top."""
        _, g, _ = _run(n_steps=8000, barrier=6.0)
        pts = jnp.asarray(np.linspace(-1.8, 1.8, 361))
        v = np.asarray(opes.opes_bias_value(g, pts))
        assert v.min() >= -6.0 - 1e-3
        # the floor is approached on a converged run (tails saturate)
        assert v.min() < -5.0
        # the positive part is only the KDE peak excess, far below the
        # floor allowance
        assert v.max() < 3.0
        # a barrier too small to compensate the 8 kT wells caps the
        # flattening: same run with DeltaE = 2 spans a much smaller range
        _, g2, _ = _run(n_steps=8000, barrier=2.0)
        v2 = np.asarray(opes.opes_bias_value(g2, pts))
        assert v2.min() >= -2.0 - 1e-3
        assert (v.max() - v.min()) > (v2.max() - v2.min()) + 2.0

    def test_crosses_barrier_where_plain_md_does_not(self):
        from vaemolsim_tpu import md
        _, _, cvs = _run()
        visited = (cvs > 0.5).any(axis=0)
        assert visited.mean() > 0.8, visited.mean()
        x0 = jnp.full((32, 1, 1), -1.0)
        stp, _ = jax.jit(lambda x, k: md.baoab(
            double_well, x, jnp.zeros_like(x), k, dt=0.01,
            n_steps=4000, friction=2.0, kT=1.0))(
                x0, jax.random.PRNGKey(2))
        assert float(jnp.mean(stp.x[..., 0, 0] > 0.5)) < 0.1

    def test_free_energy_matches_quadrature(self):
        _, g, _ = _run(n_steps=12_000)
        s, f = opes.free_energy_from_opes(g)
        s, f = np.asarray(s), np.asarray(f)
        u = 8.0 * (s ** 2 - 1.0) ** 2     # F(s) == U(s) for a 1-D CV
        sel = np.abs(s) < 1.3
        err = (f - u)[sel]
        err = err - err.mean()
        assert float(np.abs(err).max()) < 1.2, float(np.abs(err).max())
        assert float(np.abs(err).mean()) < 0.45

    def test_matches_metadynamics_estimate(self):
        """Two independent adaptive-bias engines agree on the same
        surface within their own tolerances."""
        from vaemolsim_tpu import metadynamics as mtd
        _, g_opes, _ = _run(n_steps=12_000)
        n_walk = 32
        x0 = jnp.full((n_walk, 1, 1), -1.0)
        gm = mtd.bias_grid(-1.8, 1.8, 121)
        _, gm, _ = jax.jit(lambda x, k: mtd.metad_baoab(
            double_well, cv, x, jnp.zeros_like(x), k, dt=0.01,
            n_steps=12_000, deposit_every=20, grid=gm,
            hill_height=0.25, hill_width=0.15, kT=1.0, gamma=8.0,
            friction=2.0))(x0, jax.random.PRNGKey(7))
        s, f_opes = map(np.asarray, opes.free_energy_from_opes(g_opes))
        _, f_mtd = map(np.asarray,
                       mtd.free_energy_from_bias(gm, kT=1.0, gamma=8.0))
        sel = np.abs(s) < 1.2
        d = (f_opes - f_mtd)[sel]
        d = d - d.mean()
        assert float(np.abs(d).mean()) < 0.6

    def test_jit_and_shapes(self):
        st, g, cvs = _run(n_steps=400)
        assert cvs.shape == (400 // 20, 32)
        assert np.isfinite(np.asarray(g.prob)).all()
        assert float(g.sum_w) > 0.0
        assert np.isfinite(np.asarray(st.x)).all()

    def test_deposit_every_validation(self):
        g = opes.opes_grid(-1.0, 1.0, 11, barrier=5.0)
        x = jnp.zeros((2, 1, 1))
        with pytest.raises(ValueError, match="divide"):
            opes.opes_baoab(double_well, cv, x, x,
                            jax.random.PRNGKey(0), dt=0.01, n_steps=7,
                            deposit_every=2, grid=g, sigma=0.1)
