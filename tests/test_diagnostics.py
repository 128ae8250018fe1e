"""Chain diagnostics vs analytic AR(1) properties and torch
cross-validation of distribution numerics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu.mcmc import (autocorrelation, effective_sample_size,
                                potential_scale_reduction)
from vaemolsim_tpu.mcmc import diagnostics
from vaemolsim_tpu.ops import distributions as d


def ar1(key, T, C, phi):
    eps = jax.random.normal(key, (T, C))

    def body(x, e):
        x = phi * x + jnp.sqrt(1 - phi ** 2) * e
        return x, x

    _, xs = jax.lax.scan(body, jnp.zeros(C), eps)
    return xs


class TestDiagnostics:

    def test_autocorrelation_ar1(self):
        # AR(1) with coefficient phi has rho(k) = phi^k.
        x = ar1(jax.random.PRNGKey(0), 20000, 8, 0.7)
        rho = autocorrelation(x, max_lag=5)
        np.testing.assert_allclose(rho[0], 1.0, atol=1e-5)
        np.testing.assert_allclose(jnp.mean(rho[1]), 0.7, atol=0.03)
        np.testing.assert_allclose(jnp.mean(rho[3]), 0.343, atol=0.05)

    def test_ess_iid_close_to_T(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (4000, 4))
        ess = effective_sample_size(x)
        assert jnp.all(ess > 2500)

    def test_ess_correlated_much_smaller(self):
        x = ar1(jax.random.PRNGKey(2), 4000, 4, 0.95)
        ess = effective_sample_size(x)
        # tau = (1+phi)/(1-phi) = 39 -> ESS ~ 100.
        assert jnp.all(ess < 600)

    def test_rhat_converged_vs_not(self):
        x = jax.random.normal(jax.random.PRNGKey(3), (2000, 8))
        r = potential_scale_reduction(x)
        assert abs(float(r) - 1.0) < 0.02
        # Disperse chain means -> R-hat >> 1.
        x_bad = x + jnp.arange(8.0)[None, :] * 3.0
        assert float(potential_scale_reduction(x_bad)) > 1.5


class TestTorchCrossValidation:
    """Cross-check log-probs against torch.distributions (an independent
    implementation, standing in for the TF reference numerics)."""

    def test_von_mises_log_prob(self):
        torch = pytest.importorskip("torch")
        locs = np.linspace(-3, 3, 7, dtype=np.float32)
        concs = np.array([0.1, 0.5, 1.0, 4.0, 20.0, 100.0, 500.0],
                         dtype=np.float32)
        xs = np.linspace(-np.pi, np.pi, 7, dtype=np.float32)
        ours = d.VonMises(jnp.asarray(locs), jnp.asarray(concs)).log_prob(
            jnp.asarray(xs))
        theirs = torch.distributions.VonMises(
            torch.tensor(locs), torch.tensor(concs)).log_prob(
            torch.tensor(xs)).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-4,
                                   atol=2e-4)

    def test_normal_and_gamma_and_beta(self):
        torch = pytest.importorskip("torch")
        x = np.array([0.3, 1.7, 0.9], dtype=np.float32)
        ours = d.Normal(jnp.float32(0.5), jnp.float32(2.0)).log_prob(
            jnp.asarray(x))
        theirs = torch.distributions.Normal(0.5, 2.0).log_prob(
            torch.tensor(x)).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-5)

        xb = np.array([0.2, 0.5, 0.9], dtype=np.float32)
        ours_b = d.Beta(jnp.float32(2.0), jnp.float32(3.0)).log_prob(
            jnp.asarray(xb))
        theirs_b = torch.distributions.Beta(2.0, 3.0).log_prob(
            torch.tensor(xb)).numpy()
        np.testing.assert_allclose(np.asarray(ours_b), theirs_b, rtol=1e-5)

        ours_g = d.Gamma(jnp.float32(2.5), jnp.float32(1.5)).log_prob(
            jnp.asarray(x))
        theirs_g = torch.distributions.Gamma(2.5, 1.5).log_prob(
            torch.tensor(x)).numpy()
        np.testing.assert_allclose(np.asarray(ours_g), theirs_g, rtol=1e-5)


def test_ess_stuck_chain_is_nan():
    """A zero-variance (fully stuck) chain must NOT report the maximal
    ESS = T — it carries no information; NaN flags it for monitoring."""
    from vaemolsim_tpu.mcmc import effective_sample_size

    x = jnp.ones((200, 3)) * 5.0
    ess = effective_sample_size(x)
    assert bool(jnp.all(jnp.isnan(ess)))
    # Mixed case: only the stuck chain is flagged.
    x = x.at[:, 0].set(jax.random.normal(jax.random.PRNGKey(0), (200,)))
    ess = effective_sample_size(x)
    assert bool(jnp.isfinite(ess[0])) and bool(jnp.all(jnp.isnan(ess[1:])))


class TestBlocking:

    def test_iid_error_flat_and_exact(self):
        # Independent samples: every blocking level estimates the same
        # standard error sigma / sqrt(T).
        x = jax.random.normal(jax.random.PRNGKey(0), (8192, 4)) * 2.0
        errs = np.asarray(diagnostics.block_averaging_error(x))
        truth = 2.0 / np.sqrt(8192)
        np.testing.assert_allclose(errs[0], truth, rtol=0.1)
        # flat across levels (within blocking noise at high levels)
        np.testing.assert_allclose(errs[:5], truth, rtol=0.15)

    def test_ar1_plateau_matches_analytic(self):
        # AR(1) with coefficient a: true error of the mean =
        # sigma/sqrt(T) * sqrt((1+a)/(1-a)); the naive level-0 estimate
        # is too small by that same factor and the plateau recovers it.
        a, T = 0.9, 2 ** 15

        def step(s, k):
            s = a * s + jnp.sqrt(1 - a * a) * jax.random.normal(k, s.shape)
            return s, s

        _, x = jax.lax.scan(step, jnp.zeros(8),
                            jax.random.split(jax.random.PRNGKey(1), T))
        errs = np.asarray(diagnostics.block_averaging_error(x))
        truth = np.sqrt((1 + a) / (1 - a)) / np.sqrt(T)
        plateau = errs[-4:].mean()
        assert errs[0].mean() < 0.4 * truth   # naive badly underestimates
        np.testing.assert_allclose(plateau, truth, rtol=0.35)

    def test_statistical_inefficiency_ar1(self):
        # g = 1 + 2 tau_int = (1+a)/(1-a) for AR(1).
        a, T = 0.8, 2 ** 14

        def step(s, k):
            s = a * s + jnp.sqrt(1 - a * a) * jax.random.normal(k, s.shape)
            return s, s

        _, x = jax.lax.scan(step, jnp.zeros(16),
                            jax.random.split(jax.random.PRNGKey(2), T))
        g = np.asarray(diagnostics.statistical_inefficiency(x))
        truth = (1 + a) / (1 - a)
        np.testing.assert_allclose(g.mean(), truth, rtol=0.2)
