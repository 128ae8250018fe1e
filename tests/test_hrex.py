"""Hamiltonian replica exchange (parallel.hrex) + thermodynamic
integration (mcmc.free_energy.ti_free_energy): statistical correctness
against a closed-form Gaussian lambda family, estimator cross-checks
(TI vs MBAR vs analytic), quadrature exactness, and sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vaemolsim_tpu.mcmc.free_energy import (gauss_legendre_lambdas,
                                            mbar_free_energy,
                                            ti_free_energy)
from vaemolsim_tpu.parallel import (HREXState, make_hrex_step, make_mesh,
                                    run_hrex)


def gaussian_family(x, lam):
    """Unnormalized log pi(x; lam) = -x^2 / (2 sigma^2(lam)),
    sigma^2 = 1 + 4 lam: reduced dF(lam=0 -> lam) = -ln(sigma/sigma_0)
    = -(1/2) ln(1 + 4 lam) exactly."""
    s2 = 1.0 + 4.0 * lam
    return -jnp.sum(x * x, axis=-1) / (2.0 * s2)


def exact_df(lam, d=1):
    """dF(0 -> lam) = -(d/2) ln(1 + 4 lam) for a d-dimensional event."""
    return -0.5 * d * np.log(1.0 + 4.0 * np.asarray(lam))


class TestTI:

    def test_harmonic_exact_draws(self):
        # U(x; lam) = k(lam) x^2 / 2, k = 1 + 3 lam: dU/dlam = 3 x^2 / 2,
        # <x^2>_lam = 1/k, dF = (1/2) ln k(1) = (1/2) ln 4.
        nodes, weights = gauss_legendre_lambdas(8)
        keys = jax.random.split(jax.random.PRNGKey(0), len(nodes))
        dudl = jnp.stack([
            1.5 * (jax.random.normal(k, (40_000,))
                   / jnp.sqrt(1.0 + 3.0 * lam)) ** 2
            for k, lam in zip(keys, nodes)])
        df, err = ti_free_energy(dudl, weights=weights)
        assert float(df) == pytest.approx(0.5 * np.log(4.0),
                                          abs=4 * float(err))
        assert float(df) == pytest.approx(0.5 * np.log(4.0), rel=0.02)
        assert 0 < float(err) < 0.01

    def test_gauss_legendre_beats_trapezoid(self):
        # Zero-variance "samples" = the exact smooth mean curve
        # <dU/dlam> = 1.5 / (1 + 3 lam): pure quadrature error remains.
        def mean_curve(lam):
            return 1.5 / (1.0 + 3.0 * lam)

        nodes, weights = gauss_legendre_lambdas(8)
        df_gl, err_gl = ti_free_energy(
            jnp.asarray(mean_curve(nodes))[:, None], weights=weights)
        grid = np.linspace(0.0, 1.0, 8)
        df_tr, err_tr = ti_free_energy(
            jnp.asarray(mean_curve(grid))[:, None], lambdas=grid)
        exact = 0.5 * np.log(4.0)
        assert float(err_gl) == 0.0 and float(err_tr) == 0.0
        assert abs(float(df_gl) - exact) < 1e-6
        assert abs(float(df_gl) - exact) < abs(float(df_tr) - exact)
        # 8-point trapezoid on this curvature is percent-level.
        assert abs(float(df_tr) - exact) > 1e-4

    def test_trapezoid_nonuniform_grid(self):
        # Trapezoid weights from a NON-uniform grid integrate a linear
        # mean curve exactly (trapezoid is exact on degree 1).
        grid = np.array([0.0, 0.1, 0.35, 0.6, 1.0])
        dudl = jnp.asarray(2.0 * grid + 1.0)[:, None]
        df, _ = ti_free_energy(dudl, lambdas=grid)
        assert float(df) == pytest.approx(2.0, abs=1e-6)

    def test_stat_inefficiency_scales_stderr(self):
        dudl = jax.random.normal(jax.random.PRNGKey(1), (4, 1000))
        _, e1 = ti_free_energy(dudl, lambdas=np.linspace(0, 1, 4))
        _, e4 = ti_free_energy(dudl, lambdas=np.linspace(0, 1, 4),
                               statistical_inefficiency=4.0)
        assert float(e4) == pytest.approx(2.0 * float(e1), rel=1e-5)

    def test_arg_validation(self):
        dudl = jnp.zeros((3, 10))
        with pytest.raises(ValueError, match="exactly one"):
            ti_free_energy(dudl)
        with pytest.raises(ValueError, match="exactly one"):
            ti_free_energy(dudl, lambdas=np.linspace(0, 1, 3),
                           weights=np.ones(3) / 3)
        with pytest.raises(ValueError, match="lambdas must be"):
            ti_free_energy(dudl, lambdas=np.linspace(0, 1, 4))


class TestHREX:

    R, C, D = 6, 256, 2
    LAMBDAS = np.linspace(0.0, 1.0, 6)

    def _exact_init(self, key):
        s = jnp.sqrt(1.0 + 4.0 * jnp.asarray(self.LAMBDAS, jnp.float32))
        x = jax.random.normal(key, (self.R, self.C, self.D))
        return x * s[:, None, None]

    def test_exchange_preserves_exact_marginals(self):
        # Start every rung at ITS exact distribution and run a
        # swap-heavy chain: rung marginals must stay exact (the
        # Hamiltonian swap satisfies detailed balance on the product
        # distribution) while swaps genuinely happen.
        state = HREXState.create(
            self._exact_init(jax.random.PRNGKey(0)), gaussian_family,
            self.LAMBDAS, jax.random.PRNGKey(1))
        step = jax.jit(make_hrex_step(gaussian_family, scale=0.45,
                                      exchange_every=1))
        final, _ = run_hrex(step, state, 400)
        swap_rate = float(final.swap_acceptance_rate)
        assert 0.05 < swap_rate < 0.95
        m2 = np.mean(np.asarray(final.configs) ** 2, axis=(1, 2))
        expect = 1.0 + 4.0 * self.LAMBDAS
        np.testing.assert_allclose(m2, expect, rtol=0.12)
        # Energies stay consistent with configs through swaps (the
        # no-third-evaluation bookkeeping).
        e_re = gaussian_family(final.configs,
                               jnp.asarray(self.LAMBDAS,
                                           jnp.float32)[:, None])
        np.testing.assert_allclose(np.asarray(final.energies),
                                   np.asarray(e_re), rtol=1e-5,
                                   atol=1e-5)

    def test_per_replica_scales_and_counters(self):
        scales = jnp.linspace(0.3, 0.9, self.R)
        state = HREXState.create(
            self._exact_init(jax.random.PRNGKey(2)), gaussian_family,
            self.LAMBDAS, jax.random.PRNGKey(3))
        step = jax.jit(make_hrex_step(gaussian_family, scale=scales,
                                      exchange_every=2))
        n = 100
        final, _ = run_hrex(step, state, n)
        assert int(final.num_trials.to_float()) == n * self.R * self.C
        # 50 exchange phases alternating even (3 pairs for R=6) and odd
        # (2 pairs, ends unpaired) pairings x C chains each.
        assert int(final.num_swap_trials.to_float()) == (
            25 * 3 + 25 * 2) * self.C
        assert 0.0 < float(final.acceptance_rate) < 1.0

    def test_mbar_and_ti_recover_gaussian_ladder(self):
        # End-to-end estimator triangle: HREX samples -> (a) MBAR over
        # the cross-evaluated density matrix, (b) TI over the exact
        # alchemical derivative -> both match the closed form
        # dF = -(1/2) ln(1 + 4 lam).
        state = HREXState.create(
            self._exact_init(jax.random.PRNGKey(4)), gaussian_family,
            self.LAMBDAS, jax.random.PRNGKey(5))
        step = jax.jit(make_hrex_step(gaussian_family, scale=0.5,
                                      exchange_every=5))
        final, samples = run_hrex(step, state, 400, collect_every=10)
        xs = samples.reshape(-1, self.R, self.C, self.D)
        xs = jnp.moveaxis(xs, 1, 0).reshape(self.R, -1, self.D)

        lam = jnp.asarray(self.LAMBDAS, jnp.float32)
        # (K, K * n): every sample evaluated at every lambda.
        flat = xs.reshape(-1, self.D)
        log_probs = jax.vmap(
            lambda l: gaussian_family(flat, l))(lam)
        counts = np.full(self.R, xs.shape[1])
        res = mbar_free_energy(log_probs, counts)
        np.testing.assert_allclose(np.asarray(res.free_energies),
                                   exact_df(self.LAMBDAS, self.D),
                                   atol=0.05)

        def dudl_at(l, x):
            # Per-sample alchemical derivative: one jvp in the scalar
            # lambda direction (grad of the sum would pool samples).
            _, tang = jax.jvp(lambda ll: gaussian_family(x, ll),
                              (l,), (jnp.ones_like(l),))
            return -tang

        dudl = jax.vmap(dudl_at)(lam, xs)
        df_ti, err = ti_free_energy(dudl,
                                    lambdas=self.LAMBDAS)
        # Trapezoid bias on 6 points of this curvature ~ 0.05.
        assert float(df_ti) == pytest.approx(
            float(exact_df(1.0, self.D)), abs=0.12)

    def test_mixing_requires_exchange(self):
        # Bimodal cold rung (lam=0) whose barrier vanishes along the
        # ladder: with exchange the cold rung visits both modes; the
        # no-exchange control stays stuck in its starting mode.
        def family(x, lam):
            r2 = jnp.sum(x * x, axis=-1)
            barrier = 8.0 * (1.0 - lam)
            return -barrier * (r2 - 1.0) ** 2 - 0.5 * lam * r2

        lams = np.linspace(0.0, 1.0, 6)
        x0 = jnp.full((6, 64, 1), 1.0)  # all chains in the +1 mode
        key = jax.random.PRNGKey(6)

        def run(exchange):
            state = HREXState.create(x0, family, lams,
                                     jax.random.PRNGKey(7))
            step = jax.jit(make_hrex_step(
                family, scale=0.25,
                exchange_every=1 if exchange else 10 ** 9))
            final, _ = run_hrex(step, state, 600)
            cold = np.asarray(final.configs[0, :, 0])
            return np.mean(cold < 0.0)

        assert run(False) < 0.05
        assert run(True) > 0.2

    def test_replica_sharded_run_matches_unsharded(self):
        # The swap is a static permutation: sharding the replica axis
        # over the mesh must not change the chain (same keys).
        r = 8
        lams = np.linspace(0.0, 1.0, r)
        x0 = jax.random.normal(jax.random.PRNGKey(8), (r, 32, self.D))
        state = HREXState.create(x0, gaussian_family, lams,
                                 jax.random.PRNGKey(9))
        step = jax.jit(make_hrex_step(gaussian_family, scale=0.4))
        plain, _ = run_hrex(step, state, 50)

        mesh = make_mesh({"replica": 8})
        sh = NamedSharding(mesh, P("replica"))
        state_s = state.replace(
            configs=jax.device_put(state.configs, sh),
            energies=jax.device_put(state.energies, sh))
        sharded, _ = run_hrex(step, state_s, 50)
        np.testing.assert_allclose(np.asarray(plain.configs),
                                   np.asarray(sharded.configs),
                                   rtol=2e-4, atol=2e-4)

    def test_create_validation(self):
        x = jnp.zeros((4, 8, 2))
        with pytest.raises(ValueError, match="lambdas must be"):
            HREXState.create(x, gaussian_family, np.linspace(0, 1, 5),
                             jax.random.PRNGKey(0))
        with pytest.raises(ValueError, match="energy shape"):
            HREXState.create(x, lambda x, l: jnp.zeros(x.shape[0]),
                             np.linspace(0, 1, 4), jax.random.PRNGKey(0))
