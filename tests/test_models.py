"""Model integration tests: build, run a few optimizer steps, evaluate,
predict — mirroring the reference's smoke-training style
(test_models.py:44-57, 161-262) with the toy workloads of SURVEY.md §6:
FlowModel on mixtures, VAE (config 1) with several decoder families and a
flow prior, deterministic-encoder VAE, dual-ELBO VAE.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vaemolsim_tpu import losses
from vaemolsim_tpu.dists import (AutoregressiveBlockwise, FlowedDistribution,
                                 IndependentBlockwise,
                                 IndependentDeterministic,
                                 IndependentVonMises,
                                 StaticFlowedDistribution)
from vaemolsim_tpu.flows import RQSSplineMAF, RQSSplineRealNVP
from vaemolsim_tpu.models import (VAE, FlowModel, MappingToDistribution,
                                  VAEDualELBO)
from vaemolsim_tpu.ops import distributions as d

SMALL_RQS = {"num_bins": 8, "hidden_dim": 16}


def fit(model, loss_fn, data, steps=30, lr=2e-3):
    opt = optax.adam(lr)
    state = opt.init(model)

    @jax.jit
    def step(m, s, batch):
        l, g = jax.value_and_grad(loss_fn)(m, batch)
        u, s = opt.update(g, s)
        return optax.apply_updates(m, u), s, l

    l0 = None
    for _ in range(steps):
        model, state, l = step(model, state, data)
        if l0 is None:
            l0 = float(l)
    return model, l0, float(l)


class TestMappingToDistribution:

    def test_auto_mapping_sized_by_params_size(self):
        dist = IndependentBlockwise.create(3, "normal")
        m2d = MappingToDistribution.create(jax.random.PRNGKey(0), dist,
                                           input_shape=5)
        out = m2d(jnp.ones((7, 5)))
        assert isinstance(out, d.Blockwise)
        assert out.log_prob(jnp.zeros((7, 3))).shape == (7,)
        assert m2d.mapping.head.out_dim == dist.params_size()

    def test_autoregressive_target_shape(self):
        dist = AutoregressiveBlockwise.create(
            jax.random.PRNGKey(1), 3, "normal",
            auto_net_params={"hidden_units": [8]})
        m2d = MappingToDistribution.create(jax.random.PRNGKey(0), dist,
                                           input_shape=4)
        out = m2d(jnp.ones((5, 4)))
        assert out.sample(jax.random.PRNGKey(2)).shape == (5, 3)


class TestFlowModel:

    @pytest.mark.parametrize("flow_cls", [RQSSplineRealNVP, RQSSplineMAF])
    def test_static_flow_trains(self, flow_cls):
        flow = flow_cls.create(jax.random.PRNGKey(0), 1, num_blocks=2,
                               rqs_params=dict(SMALL_RQS,
                                               bin_range=[-5.0, 5.0]))
        base = d.Independent(d.Normal(jnp.zeros(1), jnp.ones(1)), 1)
        model = FlowModel.create(
            jax.random.PRNGKey(1),
            StaticFlowedDistribution(flow=flow, base=base))
        assert model.mapping is None
        data = d.Normal(jnp.float32(2.0), jnp.float32(0.5)).sample(
            jax.random.PRNGKey(2), (512, 1))

        def loss_fn(m, batch):
            return -jnp.mean(m.log_prob(batch))

        model, l0, l1 = fit(model, loss_fn, data)
        assert l1 < l0
        s = model.predict(data, jax.random.PRNGKey(3))
        assert s.shape == data.shape

    def test_mapped_flow_model(self):
        # Mapping + FlowedDistribution over a blockwise base.
        flow = RQSSplineMAF.create(jax.random.PRNGKey(0), 2, num_blocks=2,
                                   rqs_params=SMALL_RQS)
        fd = FlowedDistribution(
            flow=flow, base_layer=IndependentBlockwise.create(2, "normal"))
        model = FlowModel.create(jax.random.PRNGKey(1), fd, input_shape=2)
        out = model(jnp.ones((4, 2)))
        assert out.sample(jax.random.PRNGKey(2)).shape == (4, 2)


def make_vae(key, decoder_kind="normal", prior_kind="standard",
             encoder_kind="normal", data_dim=2, latent_dim=1):
    keys = jax.random.split(key, 6)
    if encoder_kind == "normal":
        enc_dist = IndependentBlockwise.create(latent_dim, "normal")
    else:
        enc_dist = IndependentDeterministic.create(latent_dim)
    encoder = MappingToDistribution.create(keys[0], enc_dist,
                                           input_shape=data_dim,
                                           mapping_kwargs={"hidden_dim": 16})

    if decoder_kind == "normal":
        dec_dist = IndependentBlockwise.create(data_dim, "normal")
    elif decoder_kind == "von_mises":
        dec_dist = IndependentVonMises.create(data_dim)
    elif decoder_kind == "autoregressive":
        dec_dist = AutoregressiveBlockwise.create(
            keys[1], data_dim, "normal",
            auto_net_params={"hidden_units": [8]})
    elif decoder_kind == "flowed":
        flow = RQSSplineMAF.create(keys[2], data_dim, num_blocks=2,
                                   rqs_params=SMALL_RQS)
        dec_dist = FlowedDistribution(
            flow=flow,
            base_layer=IndependentBlockwise.create(data_dim, "normal"))
    decoder = MappingToDistribution.create(keys[3], dec_dist,
                                           input_shape=latent_dim,
                                           mapping_kwargs={"hidden_dim": 16})

    if prior_kind == "standard":
        prior = d.Independent(d.Normal(jnp.zeros(latent_dim),
                                       jnp.ones(latent_dim)), 1)
        reg = losses.KLDivergenceEstimate()
    elif prior_kind == "flow":
        flow = RQSSplineMAF.create(keys[4], latent_dim, num_blocks=2,
                                   rqs_params=dict(SMALL_RQS,
                                                   bin_range=[-5.0, 5.0]))
        prior = StaticFlowedDistribution(
            flow=flow, base=d.Independent(d.Normal(jnp.zeros(latent_dim),
                                                   jnp.ones(latent_dim)), 1))
        reg = losses.KLDivergenceEstimate()
    if encoder_kind == "deterministic":
        reg = losses.LogProbRegularizer()
    return VAE(encoder=encoder, decoder=decoder, prior=prior,
               regularizer=reg)


def toy_data(n=256, dim=2):
    return d.MixtureSameFamily(
        jnp.zeros(2), d.Normal(jnp.array([-2.0, 2.0]),
                               0.5 * jnp.ones(2))).sample(
        jax.random.PRNGKey(0), (n, dim))


class TestVAE:
    """Config 1: toy low-dim VAE trains end to end, with decoder-family
    and prior variations (reference test_models.py:161-262)."""

    @pytest.mark.parametrize("decoder_kind",
                             ["normal", "autoregressive", "flowed"])
    def test_vae_trains(self, decoder_kind):
        vae = make_vae(jax.random.PRNGKey(0), decoder_kind=decoder_kind)
        data = toy_data()

        def loss_fn(m, batch):
            return m.elbo_loss(batch, jax.random.PRNGKey(42))[0]

        vae, l0, l1 = fit(vae, loss_fn, data, steps=25)
        assert np.isfinite(l1) and l1 < l0

    def test_vae_flow_prior(self):
        vae = make_vae(jax.random.PRNGKey(0), prior_kind="flow")
        data = toy_data()
        loss, metrics = vae.elbo_loss(data, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))
        assert set(metrics) >= {"loss", "recon_nll", "kl_div",
                                "regularizer_loss"}

    def test_vae_von_mises_decoder(self):
        vae = make_vae(jax.random.PRNGKey(0), decoder_kind="von_mises")
        data = jnp.clip(toy_data(), -3.0, 3.0)
        data = data / 3.0 * np.pi * 0.9
        loss, _ = vae.elbo_loss(data, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))

    def test_deterministic_encoder_vae(self):
        # SURVEY.md §3.5: deterministic encoder + LogProbRegularizer only
        # trains the prior on encoded samples.
        vae = make_vae(jax.random.PRNGKey(0), encoder_kind="deterministic",
                       prior_kind="flow")
        data = toy_data()
        out = vae(data, jax.random.PRNGKey(1))
        # Deterministic encoder: sample == mapping output, reproducible.
        out2 = vae(data, jax.random.PRNGKey(2))
        np.testing.assert_allclose(out.encode_sample, out2.encode_sample,
                                   atol=1e-6)
        loss, _ = vae.elbo_loss(data, jax.random.PRNGKey(3))
        assert np.isfinite(float(loss))

    def test_generation(self):
        vae = make_vae(jax.random.PRNGKey(0))
        s = vae.sample(jax.random.PRNGKey(1), batch_shape=(17,))
        assert s.shape == (17, 2)

    def test_iwae_bound_tighter_than_elbo(self):
        vae = make_vae(jax.random.PRNGKey(0))
        data = toy_data(256)
        key = jax.random.PRNGKey(5)
        neg_elbo = float(jnp.mean(jax.vmap(
            lambda k: vae.elbo_loss(data, k, train=False)[0])(
            jax.random.split(key, 16))))
        neg_iwae = float(vae.iwae_loss(data, key, n_samples=16,
                                       train=False))
        # IWAE bound is tighter: -IWAE >= -ELBO, i.e. loss is <=.
        assert neg_iwae <= neg_elbo + 0.05

    def test_iwae_trains(self):
        vae = make_vae(jax.random.PRNGKey(0))
        data = toy_data(128)

        def loss_fn(m, batch):
            return m.iwae_loss(batch, jax.random.PRNGKey(3), n_samples=4)

        vae, l0, l1 = fit(vae, loss_fn, data, steps=20)
        assert np.isfinite(l1) and l1 < l0

    def test_output_struct(self):
        vae = make_vae(jax.random.PRNGKey(0))
        out = vae(toy_data(8), jax.random.PRNGKey(1))
        assert out.encode_sample.shape == (8, 1)
        assert np.isfinite(float(out.regularizer_loss))
        assert np.isfinite(float(out.kl_div))


class TestVAEDualELBO:

    def test_dual_elbo_trains(self):
        base = make_vae(jax.random.PRNGKey(0))
        dual = VAEDualELBO(encoder=base.encoder, decoder=base.decoder,
                           prior=base.prior)
        data = toy_data(64)
        pot = lambda x: 0.5 * jnp.sum(x ** 2, axis=-1)

        def loss_fn(m, batch):
            return m.dual_elbo_loss(batch, jax.random.PRNGKey(7), pot)[0]

        dual, l0, l1 = fit(dual, loss_fn, data, steps=15, lr=1e-3)
        assert np.isfinite(l1)

    def test_dual_output_metrics(self):
        base = make_vae(jax.random.PRNGKey(0))
        dual = VAEDualELBO(encoder=base.encoder, decoder=base.decoder,
                           prior=base.prior)
        out = dual(toy_data(8), jax.random.PRNGKey(1))
        assert out.decode_sample.shape == (8, 2)
        assert np.isfinite(float(out.regularizer_loss_forward))
        assert np.isfinite(float(out.regularizer_loss_reverse))


class TestHVAE:
    """Hamiltonian-refined ELBO (hvae_elbo_loss, arXiv:1805.11328)."""

    def test_zero_leapfrog_is_exact_one_sample_elbo(self):
        """K=0: the momentum terms cancel pointwise and the bound is the
        one-sample ELBO computed by hand with the same keys."""
        vae = make_vae(jax.random.PRNGKey(0))
        x = toy_data(64)
        key = jax.random.PRNGKey(1)
        loss, _ = vae.hvae_elbo_loss(x, key, n_leapfrog=0, train=False)

        k_enc, _ = jax.random.split(key)
        enc = vae.encoder(x, train=False)
        z0 = enc.sample(k_enc)
        prior = d.Independent(d.Normal(jnp.zeros(1), jnp.ones(1)), 1)
        manual = -(vae.decoder(z0, train=False).log_prob(x)
                   + prior.log_prob(z0) - enc.log_prob(z0))
        np.testing.assert_allclose(float(loss), float(jnp.mean(manual)),
                                   rtol=2e-5)

    def test_leapfrog_tightens_bound_for_bad_encoder(self):
        """With a deliberately mis-trained encoder, Hamiltonian
        refinement toward the true posterior must RAISE the bound
        (averaged over many draws) — the point of the HVAE."""
        vae = make_vae(jax.random.PRNGKey(0))
        x = toy_data(512)
        # Train decoder+prior a little so the joint is meaningful.
        vae, _, _ = fit(vae, lambda m, b: m.elbo_loss(b,
                        jax.random.PRNGKey(9))[0], x, steps=60)

        def mean_bound(n_leap):
            vals = []
            for s in range(8):
                loss, _ = vae.hvae_elbo_loss(
                    x, jax.random.PRNGKey(100 + s), n_leapfrog=n_leap,
                    step_size=0.05, train=False)
                vals.append(-float(loss))
            return np.mean(vals)

        b0, b5 = mean_bound(0), mean_bound(5)
        assert b5 > b0 - 1e-3, (b0, b5)

    def test_trains_and_gradients_finite(self):
        vae = make_vae(jax.random.PRNGKey(2))
        x = toy_data(128)

        def loss_fn(m, b):
            return m.hvae_elbo_loss(b, jax.random.PRNGKey(3),
                                    n_leapfrog=3, step_size=0.05)[0]

        vae2, l0, l1 = fit(vae, loss_fn, x, steps=40)
        assert np.isfinite(l0) and np.isfinite(l1)
        assert l1 < l0
        g = jax.grad(loss_fn)(vae, x)
        finite = jax.tree_util.tree_map(
            lambda a: bool(jnp.isfinite(a).all()), g)
        assert all(jax.tree_util.tree_leaves(finite))

    def test_metrics_and_jit(self):
        vae = make_vae(jax.random.PRNGKey(4))
        x = toy_data(32)
        loss, metrics = jax.jit(
            lambda m, b, k: m.hvae_elbo_loss(b, k, n_leapfrog=2))(
            vae, x, jax.random.PRNGKey(5))
        assert set(metrics) >= {"loss", "recon_nll", "hvae_bound"}
        np.testing.assert_allclose(float(metrics["hvae_bound"]),
                                   -float(loss), rtol=1e-6)
