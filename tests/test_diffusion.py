"""Score-based diffusion (VP-SDE): schedule identities, exact-divergence
probability-flow densities, DSM training recovery of analytic targets,
ancestral-vs-ODE sampler agreement, and the decoder-layer contract."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu import train
from vaemolsim_tpu.flows import Diffusion, DiffusionDist, DiffusionLayer


def _randomize_head(model, key, scale=0.05):
    """Fresh models have a zero head (eps = 0 exactly, see
    Diffusion.create); give the net a small random head so identity
    tests exercise NON-trivial dynamics while staying in the stable
    regime (a full-scale random head amplified by 1/sigma integrates
    to |x| in the thousands, where float32 drowns the comparison)."""
    net = model.eps_net.net
    head = net.head.replace(kernel=scale * jax.random.normal(
        key, net.head.kernel.shape, net.head.kernel.dtype))
    return model.replace(
        eps_net=model.eps_net.replace(net=net.replace(head=head)))


class TestSchedule:

    def test_marginal_coefficients(self):
        d = Diffusion.create(jax.random.PRNGKey(0), 1, hidden_dim=(8,))
        t = jnp.linspace(d.t_min, 1.0, 33)
        alpha, sigma = d.alpha_sigma(t)
        # variance preserving: alpha^2 + sigma^2 = 1
        np.testing.assert_allclose(np.asarray(alpha ** 2 + sigma ** 2),
                                   1.0, rtol=1e-6)
        # alpha(0) = 1 and alpha decreases monotonically
        a0, _ = d.alpha_sigma(0.0)
        np.testing.assert_allclose(float(a0), 1.0, atol=1e-7)
        assert np.all(np.diff(np.asarray(alpha)) < 0)
        # terminal marginal is (nearly) the standard-normal prior
        a1, s1 = d.alpha_sigma(1.0)
        assert float(a1) < 0.01
        np.testing.assert_allclose(float(s1), 1.0, atol=1e-4)

    def test_log_alpha_matches_beta_quadrature(self):
        d = Diffusion.create(jax.random.PRNGKey(0), 1, hidden_dim=(8,))
        ts = np.linspace(0.0, 0.7, 7001)
        quad = -0.5 * np.trapezoid(np.asarray(d.beta(jnp.asarray(ts))),
                                   ts)
        np.testing.assert_allclose(float(d._log_alpha(jnp.asarray(0.7))),
                                   quad, rtol=1e-6)

    def test_score_is_minus_eps_over_sigma(self):
        d = _randomize_head(
            Diffusion.create(jax.random.PRNGKey(0), 3, hidden_dim=(8,)),
            jax.random.PRNGKey(7), scale=1.0)
        x = jax.random.normal(jax.random.PRNGKey(1), (5, 3))
        t = 0.4
        _, sigma = d.alpha_sigma(t)
        eps = d.eps_net(x, t)
        np.testing.assert_allclose(np.asarray(d.score(x, t)),
                                   np.asarray(-eps / sigma), rtol=1e-6)


class TestDensities:

    def test_sample_and_log_prob_consistent_with_log_prob(self):
        # Untrained net: the forward (data -> prior) density evaluation
        # must agree with the backward generation's accumulated density
        # — the exact change-of-variables identity, up to RK4 error.
        d = _randomize_head(
            Diffusion.create(jax.random.PRNGKey(0), 2,
                             hidden_dim=(16, 16)),
            jax.random.PRNGKey(9))
        x, lp_gen = jax.jit(
            lambda k: d.sample_and_log_prob(k, (64,), n_steps=96)
        )(jax.random.PRNGKey(1))
        lp_eval = jax.jit(lambda xs: d.log_prob(xs, n_steps=96))(x)
        np.testing.assert_allclose(np.asarray(lp_gen),
                                   np.asarray(lp_eval),
                                   rtol=1e-3, atol=2e-3)

    def test_log_prob_normalized_1d_untrained(self):
        # integral of exp(log_prob) over a wide 1-D grid ~ 1 even for an
        # UNTRAINED eps-net — exactness of the divergence accounting.
        # A near-zero eps-net means "the noise in x_t is zero", i.e. the
        # model believes the DATA has the whole marginal's scale: its
        # implied density is ~ N(0, 1/alpha(1)^2) (std ~ 152 at the
        # default schedule), so the quadrature grid must span THAT
        # spread, not O(1).
        d = _randomize_head(
            Diffusion.create(jax.random.PRNGKey(3), 1, hidden_dim=(16,)),
            jax.random.PRNGKey(8))
        a1, _ = d.alpha_sigma(1.0)
        half = 5.0 / float(a1)
        grid = jnp.linspace(-half, half, 2001)[:, None]
        lp = jax.jit(lambda g: d.log_prob(g, n_steps=96))(grid)
        z = np.trapezoid(np.exp(np.asarray(lp)), dx=2 * half / 2000)
        assert abs(z - 1.0) < 0.03, z


class TestTraining:

    def _train_gaussian(self, mu, s, key=0, epochs=80):
        data = mu + s * jax.random.normal(jax.random.PRNGKey(key),
                                          (8192, 1))
        d = Diffusion.create(jax.random.PRNGKey(key + 1), 1,
                             hidden_dim=(64, 64))
        loss_fn = lambda m, batch, k: m.loss(k, batch)
        d, hist = train.fit(d, loss_fn, data,
                            key=jax.random.PRNGKey(key + 2),
                            num_epochs=epochs, batch_size=1024,
                            learning_rate=2e-3, scan_epochs=True)
        assert hist["loss"][-1] < hist["loss"][0]
        return d

    def test_dsm_recovers_gaussian_density(self):
        mu, s = 0.8, 0.6
        d = self._train_gaussian(mu, s)
        xs = jnp.linspace(mu - 2.5 * s, mu + 2.5 * s, 64)[:, None]
        lp = jax.jit(lambda v: d.log_prob(v, n_steps=96))(xs)
        lp_true = (-0.5 * ((xs[:, 0] - mu) / s) ** 2
                   - 0.5 * math.log(2 * math.pi * s * s))
        mae = float(jnp.mean(jnp.abs(lp - lp_true)))
        assert mae < 0.12, mae

    def test_sde_and_ode_samplers_agree_on_moments(self):
        mu, s = -0.5, 0.7
        d = self._train_gaussian(mu, s, key=10)
        s_sde = d.sample(jax.random.PRNGKey(1), (8192,), n_steps=128,
                         method="sde")
        s_ode = d.sample(jax.random.PRNGKey(2), (8192,), n_steps=96,
                         method="ode")
        for smp in (s_sde, s_ode):
            assert abs(float(jnp.mean(smp)) - mu) < 0.08
            assert abs(float(jnp.std(smp)) - s) < 0.08

    def test_bimodal_mode_balance_sde(self):
        # Two well-separated modes: the stochastic sampler must land in
        # both with the right weights (0.5/0.5).
        key = jax.random.PRNGKey(0)
        comp = jax.random.bernoulli(key, 0.5, (8192, 1))
        x = jnp.where(comp, 2.0, -2.0) + 0.3 * jax.random.normal(
            jax.random.PRNGKey(1), (8192, 1))
        d = Diffusion.create(jax.random.PRNGKey(2), 1,
                             hidden_dim=(64, 64))
        loss_fn = lambda m, batch, k: m.loss(k, batch)
        d, _ = train.fit(d, loss_fn, x, key=jax.random.PRNGKey(3),
                         num_epochs=100, batch_size=1024,
                         learning_rate=2e-3, scan_epochs=True)
        smp = d.sample(jax.random.PRNGKey(4), (4096,), n_steps=128)
        frac_pos = float(jnp.mean(smp > 0))
        assert 0.4 < frac_pos < 0.6, frac_pos
        # mode centers recovered
        pos = np.asarray(smp)[np.asarray(smp) > 0]
        neg = np.asarray(smp)[np.asarray(smp) < 0]
        assert abs(pos.mean() - 2.0) < 0.25
        assert abs(neg.mean() + 2.0) < 0.25

    def test_conditional_shifts_distribution(self):
        c = jax.random.uniform(jax.random.PRNGKey(0), (8192, 1),
                               minval=-2.0, maxval=2.0)
        x = c + 0.1 * jax.random.normal(jax.random.PRNGKey(1), (8192, 1))
        d = Diffusion.create(jax.random.PRNGKey(2), 1,
                             hidden_dim=(64, 64), cond_dim=1)
        loss_fn = lambda m, batch, k: m.loss(
            k, batch[1], conditional_input=batch[0])
        d, _ = train.fit(d, loss_fn, (c, x), key=jax.random.PRNGKey(3),
                         num_epochs=60, batch_size=1024,
                         learning_rate=2e-3, scan_epochs=True)
        for target in (-2.0, 2.0):
            cond = jnp.full((512, 1), target)
            smp = d.sample(jax.random.PRNGKey(5), (512,), n_steps=64,
                           conditional_input=cond)
            assert abs(float(jnp.mean(smp)) - target) < 0.3

    def test_jit_and_grad_through_loss(self):
        d = Diffusion.create(jax.random.PRNGKey(0), 3, hidden_dim=(8,))
        x = jax.random.normal(jax.random.PRNGKey(1), (32, 3))
        g = jax.jit(jax.grad(
            lambda m: m.loss(jax.random.PRNGKey(2), x)))(d)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)


class TestDiffusionLayer:

    def test_distribution_protocol_shapes(self):
        layer = DiffusionLayer.create(jax.random.PRNGKey(0), 3, 5,
                                      hidden_dim=(16,), n_steps=8)
        assert layer.params_size() == 5
        cond = jax.random.normal(jax.random.PRNGKey(1), (7, 5))
        dist = layer(cond)
        assert isinstance(dist, DiffusionDist)
        assert dist.batch_shape == (7,)
        assert dist.event_shape == (3,)
        s = dist.sample(jax.random.PRNGKey(2))
        assert s.shape == (7, 3)
        s2 = dist.sample(jax.random.PRNGKey(2), (4,))
        assert s2.shape == (4, 7, 3)
        lp = dist.log_prob(s)
        assert lp.shape == (7,)
        x, lp_f = dist.sample_and_log_prob(jax.random.PRNGKey(3))
        assert x.shape == (7, 3) and lp_f.shape == (7,)

    def test_generation_density_identity_through_layer(self):
        layer = DiffusionLayer.create(jax.random.PRNGKey(0), 2, 3,
                                      hidden_dim=(16,), n_steps=96)
        layer = layer.replace(
            model=_randomize_head(layer.model, jax.random.PRNGKey(6)))
        cond = jax.random.normal(jax.random.PRNGKey(1), (5, 3))
        dist = layer(cond)
        x, lp_f = dist.sample_and_log_prob(jax.random.PRNGKey(2))
        np.testing.assert_allclose(np.asarray(dist.log_prob(x)),
                                   np.asarray(lp_f),
                                   rtol=1e-3, atol=3e-3)

    def test_mapping_to_distribution_integration(self):
        from vaemolsim_tpu.models import MappingToDistribution
        layer = DiffusionLayer.create(jax.random.PRNGKey(0), 2, 4,
                                      hidden_dim=(16,), n_steps=8)
        m2d = MappingToDistribution.create(jax.random.PRNGKey(1), layer,
                                           input_shape=3)
        x_in = jax.random.normal(jax.random.PRNGKey(2), (5, 3))
        dist = m2d(x_in)
        assert dist.batch_shape == (5,)
        target = jax.random.normal(jax.random.PRNGKey(3), (5, 2))

        def nll(model):
            return -jnp.mean(model(x_in).log_prob(target))

        g = jax.jit(jax.grad(nll))(m2d)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)


class TestErrors:

    def test_unknown_sampling_method(self):
        d = Diffusion.create(jax.random.PRNGKey(0), 1, hidden_dim=(8,))
        with pytest.raises(ValueError, match="method"):
            d.sample(jax.random.PRNGKey(1), (4,), method="nope")
