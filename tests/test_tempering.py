"""Simulated tempering: exact-weight ensemble correctness, Wang-Landau
free-energy recovery against closed forms, barrier crossing, and
bookkeeping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu.mcmc import STState, make_st_step, run_st
from vaemolsim_tpu.parallel import temperature_ladder


def gaussian_l(x):
    """log target (beta = 1): standard normal up to a constant."""
    return -0.5 * jnp.sum(x * x, axis=-1)


def double_well_l(x):
    q = x[..., 0]
    return -16.0 * (q * q - 1.0) ** 2  # 16 kT: opaque to local moves


class TestExactWeights:

    def test_uniform_occupancy_and_cold_marginal(self):
        # Gaussian target: Z_beta = (2 pi / beta)^{1/2} per DOF, so the
        # exact weights are w_k = -ln Z_k = 0.5 d ln beta_k + const.
        d = 2
        betas = temperature_ladder(4, beta_min=0.25)
        w_exact = 0.5 * d * jnp.log(betas)
        x0 = jax.random.normal(jax.random.PRNGKey(0), (512, d))
        s = STState.create(x0, gaussian_l, betas, jax.random.PRNGKey(1),
                           log_weights=w_exact)
        step = make_st_step(gaussian_l, kind="random_walk", scale=0.8,
                            adapt=False)
        s, traj = run_st(jax.jit(step), s, 2000, collect_every=4)
        occ = np.asarray(s.occupancy)
        occ = occ / occ.sum()
        np.testing.assert_allclose(occ, 0.25, atol=0.03)

        # beta = 1 conditional: Var(x) = 1 exactly.
        xs, ks = traj
        xs = np.asarray(xs[100:]).reshape(-1, d)
        ks = np.asarray(ks[100:]).reshape(-1)
        cold = xs[ks == 0]
        assert cold.shape[0] > 5000
        np.testing.assert_allclose(cold.var(axis=0), 1.0, rtol=0.07)
        # hottest rung: Var = 1 / beta_min
        hot = xs[ks == 3]
        np.testing.assert_allclose(hot.var(axis=0), 4.0, rtol=0.12)

    def test_frozen_weights_do_not_change(self):
        betas = temperature_ladder(3)
        s = STState.create(jnp.zeros((32, 1)), gaussian_l, betas,
                           jax.random.PRNGKey(0))
        step = make_st_step(gaussian_l, adapt=False)
        s2, _ = run_st(jax.jit(step), s, 50)
        np.testing.assert_array_equal(np.asarray(s2.log_weights),
                                      np.asarray(s.log_weights))


class TestWangLandau:

    def test_recovers_gaussian_free_energies(self):
        # Adapted weights must converge to F_k - F_0 = ln(Z_0/Z_k)
        # = 0.5 d ln(beta_k / beta_0).
        d = 2
        betas = temperature_ladder(4, beta_min=0.25)
        truth = 0.5 * d * jnp.log(betas / betas[0])
        x0 = jax.random.normal(jax.random.PRNGKey(0), (256, d))
        s = STState.create(x0, gaussian_l, betas, jax.random.PRNGKey(1))
        step = make_st_step(gaussian_l, scale=0.8, adapt=True,
                            wl_f0=0.5, wl_tau=300.0)
        s, _ = run_st(jax.jit(step), s, 4000)
        est = np.asarray(s.free_energies)
        np.testing.assert_allclose(est, np.asarray(truth), atol=0.12)
        # adapted ensemble visits every rung substantially
        occ = np.asarray(s.occupancy)
        assert (occ / occ.sum() > 0.1).all()

    def test_hmc_move_family(self):
        betas = temperature_ladder(3, beta_min=0.5)
        s = STState.create(jnp.zeros((64, 2)), gaussian_l, betas,
                           jax.random.PRNGKey(0))
        step = make_st_step(gaussian_l, kind="hmc", scale=0.3,
                            n_leapfrog=5, adapt=True)
        s, _ = run_st(jax.jit(step), s, 300)
        assert 0.3 < float(s.acceptance_rate) <= 1.0
        assert 0.0 < float(s.temp_acceptance_rate) <= 1.0


class TestMixing:

    def test_double_well_crossing_beats_cold_chain(self):
        betas = temperature_ladder(8, beta_min=0.08)
        d = 1
        x0 = -jnp.ones((128, d))
        s = STState.create(x0, double_well_l, betas,
                           jax.random.PRNGKey(0))
        step = make_st_step(double_well_l, scale=0.25, adapt=True,
                            wl_f0=1.0, wl_tau=200.0)
        s, traj = run_st(jax.jit(step), s, 4000, collect_every=8)
        xs, ks = traj
        xs, ks = np.asarray(xs[300:]), np.asarray(ks[300:])
        cold = xs[..., 0][ks == 0]
        frac = (cold > 0).mean()
        assert 0.3 < frac < 0.7, frac

        # control: same budget of plain tempered moves at beta = 1 only
        from vaemolsim_tpu.mcmc import MCMCState, run_mcmc
        from vaemolsim_tpu.mcmc.moves import make_random_walk_step
        c = MCMCState.create(x0, double_well_l(x0),
                             jax.random.PRNGKey(1))
        cstep = make_random_walk_step(double_well_l, scale=0.25)
        c, _ = run_mcmc(cstep, c, 4000)
        frac_ctrl = float(jnp.mean(c.configs[:, 0] > 0))
        assert frac_ctrl < 0.1, frac_ctrl


class TestBookkeeping:

    def test_single_rung_never_hops(self):
        s = STState.create(jnp.zeros((16, 1)), gaussian_l,
                           jnp.array([1.0]), jax.random.PRNGKey(0))
        step = make_st_step(gaussian_l)
        s, _ = run_st(jax.jit(step), s, 20)
        assert int(s.num_temp_acc.to_float()) == 0

    def test_collect_every_validation(self):
        s = STState.create(jnp.zeros((4, 1)), gaussian_l,
                           jnp.array([1.0, 0.5]), jax.random.PRNGKey(0))
        step = make_st_step(gaussian_l)
        with pytest.raises(ValueError, match="multiple"):
            run_st(step, s, 7, collect_every=2)
