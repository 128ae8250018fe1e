"""Thermodynamic extrapolation: exact Taylor-of-reweighting identity,
analytic harmonic-oscillator temperature dependence, order convergence,
and reweighting ESS behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu.extrapolation import (beta_extrapolate,
                                         beta_extrapolation_coefficients,
                                         beta_reweight)


@pytest.fixture(scope="module")
def harmonic_samples():
    # x ~ N(0, 1/(beta0 k)) with k = 2, beta0 = 1; U = x^2; A = x^2.
    # <A>(beta) = 1/(2 beta).
    k_spring, beta0 = 2.0, 1.0
    x = jax.random.normal(jax.random.PRNGKey(0), (200_000,)) \
        / jnp.sqrt(beta0 * k_spring)
    u = 0.5 * k_spring * x * x
    return x, u, beta0


class TestExactIdentities:

    def test_coefficients_are_taylor_of_reweighting(self,
                                                    harmonic_samples):
        # On the EMPIRICAL measure, reweighting is exact; the
        # extrapolation coefficients must equal its Taylor series at
        # d = 0 — an exact identity, not a statistical statement.
        x, u, beta0 = harmonic_samples
        x, u = x[:2000], u[:2000]
        a = x * x
        c = beta_extrapolation_coefficients(a, u, order=3)

        def rw(d):
            est, _ = beta_reweight(a, u, beta0, beta0 + d)
            return est

        d0 = jnp.asarray(0.0)
        derivs = [rw(d0)]
        g = rw
        for _ in range(3):
            g = jax.jacfwd(g)
            derivs.append(g(d0))
        import math
        taylor = [float(derivs[k]) / math.factorial(k)
                  for k in range(4)]
        np.testing.assert_allclose(np.asarray(c), taylor, rtol=1e-3,
                                   atol=1e-6)

    def test_c0_is_mean_c1_is_minus_cov(self, harmonic_samples):
        x, u, _ = harmonic_samples
        a = jnp.stack([x * x, jnp.cos(x)], axis=-1)  # two observables
        c = beta_extrapolation_coefficients(a, u, order=1)
        np.testing.assert_allclose(np.asarray(c[0]),
                                   np.asarray(a.mean(0)), rtol=1e-4)
        cov = np.mean(
            (np.asarray(a) - np.asarray(a.mean(0)))
            * (np.asarray(u) - np.asarray(u.mean()))[:, None], axis=0)
        np.testing.assert_allclose(np.asarray(c[1]), -cov, rtol=1e-3)

    def test_shape_validation(self):
        with pytest.raises(ValueError, match="sample axis"):
            beta_extrapolation_coefficients(jnp.ones(5), jnp.ones(6))
        with pytest.raises(ValueError, match="order"):
            beta_extrapolation_coefficients(jnp.ones(5), jnp.ones(5),
                                            order=-1)


class TestHarmonic:

    def test_matches_analytic_across_temperatures(self,
                                                  harmonic_samples):
        x, u, beta0 = harmonic_samples
        betas = jnp.array([0.7, 0.85, 1.15, 1.3])
        est = beta_extrapolate(x * x, u, beta0, betas, order=3)
        truth = 1.0 / (2.0 * betas)
        np.testing.assert_allclose(np.asarray(est), np.asarray(truth),
                                   rtol=0.03)

    def test_order_improves_range(self, harmonic_samples):
        x, u, beta0 = harmonic_samples
        beta = 1.5  # far enough that low order visibly truncates
        truth = 1.0 / (2.0 * beta)
        errs = [abs(float(beta_extrapolate(x * x, u, beta0, beta,
                                           order=o)) - truth)
                for o in (1, 3, 5)]
        assert errs[2] < errs[1] < errs[0], errs

    def test_agrees_with_reweighting_nearby(self, harmonic_samples):
        x, u, beta0 = harmonic_samples
        est_x = beta_extrapolate(x * x, u, beta0, 1.1, order=3)
        est_w, ess = beta_reweight(x * x, u, beta0, 1.1)
        assert float(ess) > 1000
        np.testing.assert_allclose(float(est_x), float(est_w),
                                   rtol=0.02)

    def test_scalar_and_batched_targets(self, harmonic_samples):
        x, u, beta0 = harmonic_samples
        s = beta_extrapolate(x * x, u, beta0, 1.2, order=2)
        v = beta_extrapolate(x * x, u, beta0, jnp.array([1.2]), order=2)
        assert s.shape == ()
        assert v.shape == (1,)
        np.testing.assert_allclose(float(s), float(v[0]))


class TestReweight:

    def test_ess_decays_with_distance(self, harmonic_samples):
        x, u, beta0 = harmonic_samples
        _, ess = beta_reweight(x * x, u, beta0,
                               jnp.array([1.01, 1.5, 3.0]))
        e = np.asarray(ess)
        assert e[0] > e[1] > e[2] > 1.0

    def test_identity_at_beta0(self, harmonic_samples):
        x, u, beta0 = harmonic_samples
        est, ess = beta_reweight(x * x, u, beta0, beta0)
        np.testing.assert_allclose(float(est), float(jnp.mean(x * x)),
                                   rtol=1e-4)
        np.testing.assert_allclose(float(ess), x.shape[0], rtol=1e-3)
