"""Flow matching (continuous normalizing flow): exact-divergence
change-of-variables, CFM training recovery of analytic targets, and
conditional velocity fields."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu import train
from vaemolsim_tpu.flows import FlowMatching, VelocityField
from vaemolsim_tpu.flows.flow_matching import _divergence


class TestVelocityField:

    def test_shapes_and_broadcast_time(self):
        vf = VelocityField.create(jax.random.PRNGKey(0), 3,
                                  hidden_dim=(16,), n_freqs=2)
        x = jnp.ones((7, 3))
        # scalar t broadcasts over the batch
        v = vf(x, 0.3)
        assert v.shape == (7, 3)
        # per-sample t
        v2 = vf(x, jnp.linspace(0.0, 1.0, 7))
        assert v2.shape == (7, 3)
        assert not np.allclose(np.asarray(v2[0]), np.asarray(v2[-1]))

    def test_conditional_required(self):
        vf = VelocityField.create(jax.random.PRNGKey(0), 2,
                                  hidden_dim=(8,), cond_dim=4)
        with pytest.raises(ValueError, match="conditional_input"):
            vf(jnp.ones((3, 2)), 0.5)

    def test_divergence_matches_jacobian_trace(self):
        vf = VelocityField.create(jax.random.PRNGKey(1), 4,
                                  hidden_dim=(16, 16))
        x = jax.random.normal(jax.random.PRNGKey(2), (5, 4))
        fn = lambda xs: vf(xs, 0.7)
        _, div = _divergence(fn, x)
        jac = jax.vmap(jax.jacfwd(lambda xi: vf(xi, 0.7)))(x)  # (5,4,4)
        trace = jnp.trace(jac, axis1=-2, axis2=-1)
        np.testing.assert_allclose(np.asarray(div), np.asarray(trace),
                                   rtol=1e-5, atol=1e-5)


class TestFlowMatching:

    def test_sample_and_log_prob_consistent_with_log_prob(self):
        # Untrained (random) velocity field: forward integration with
        # divergence accumulation must agree with the backward density
        # evaluation at the generated points — the exact
        # change-of-variables identity, up to RK4 discretization.
        fm = FlowMatching.create(jax.random.PRNGKey(0), 2,
                                 hidden_dim=(16, 16))
        x, lp_fwd = jax.jit(
            lambda k: fm.sample_and_log_prob(k, (64,), n_steps=64)
        )(jax.random.PRNGKey(1))
        lp_back = jax.jit(
            lambda xs: fm.log_prob(xs, n_steps=64))(x)
        np.testing.assert_allclose(np.asarray(lp_fwd),
                                   np.asarray(lp_back),
                                   rtol=1e-4, atol=2e-4)

    def test_log_prob_normalized_1d(self):
        # integral of exp(log_prob) over a wide 1-D grid ~ 1 even for an
        # UNTRAINED field — exactness of the divergence accounting, not
        # of training.
        fm = FlowMatching.create(jax.random.PRNGKey(3), 1,
                                 hidden_dim=(16,))
        grid = jnp.linspace(-8.0, 8.0, 801)[:, None]
        lp = jax.jit(lambda g: fm.log_prob(g, n_steps=64))(grid)
        z = np.trapezoid(np.exp(np.asarray(lp)), dx=16.0 / 800)
        assert abs(z - 1.0) < 0.02, z

    def test_cfm_training_recovers_correlated_gaussian(self):
        # Target: zero-mean 2-D Gaussian with correlation 0.8.
        cov = jnp.array([[1.0, 0.8], [0.8, 1.0]])
        chol = jnp.linalg.cholesky(cov)
        data = jax.random.normal(jax.random.PRNGKey(0), (4096, 2)) @ chol.T

        fm = FlowMatching.create(jax.random.PRNGKey(1), 2,
                                 hidden_dim=(64, 64))
        loss_fn = lambda m, batch, key: m.loss(key, batch)
        fm, hist = train.fit(fm, loss_fn, data,
                             key=jax.random.PRNGKey(2),
                             num_epochs=60, batch_size=512,
                             learning_rate=2e-3, scan_epochs=True)
        assert hist["loss"][-1] < hist["loss"][0]

        # Density parity against the analytic target on test points.
        xs = jax.random.normal(jax.random.PRNGKey(3), (256, 2)) @ chol.T
        lp = jax.jit(lambda v: fm.log_prob(v, n_steps=64))(xs)
        inv = jnp.linalg.inv(cov)
        quad = jnp.einsum("ni,ij,nj->n", xs, inv, xs)
        lp_true = (-0.5 * quad - 0.5 * jnp.log(
            (2 * math.pi) ** 2 * jnp.linalg.det(cov)))
        mae = float(jnp.mean(jnp.abs(lp - lp_true)))
        assert mae < 0.15, mae

        # Sample moments match.
        s = jax.jit(lambda k: fm.sample(k, (8192,), n_steps=64))(
            jax.random.PRNGKey(4))
        emp = np.cov(np.asarray(s).T)
        np.testing.assert_allclose(emp, np.asarray(cov), atol=0.15)

    def test_conditional_shifts_distribution(self):
        # Train v(x, t | c) on data whose mean IS the 1-D condition;
        # sampling at c=±2 must land near ±2.
        key = jax.random.PRNGKey(0)
        c = jax.random.uniform(key, (4096, 1), minval=-2.0, maxval=2.0)
        x = c + 0.1 * jax.random.normal(jax.random.PRNGKey(1), (4096, 1))

        fm = FlowMatching.create(jax.random.PRNGKey(2), 1,
                                 hidden_dim=(32, 32), cond_dim=1)
        loss_fn = lambda m, batch, k: m.loss(
            k, batch[1], conditional_input=batch[0])
        fm, _ = train.fit(fm, loss_fn, (c, x), key=jax.random.PRNGKey(3),
                          num_epochs=40, batch_size=512,
                          learning_rate=2e-3, scan_epochs=True)
        for target in (-2.0, 2.0):
            cond = jnp.full((512, 1), target)
            s = fm.sample(jax.random.PRNGKey(5), (512,), n_steps=32,
                          conditional_input=cond)
            assert abs(float(jnp.mean(s)) - target) < 0.25

    def test_jit_and_grad_through_loss(self):
        fm = FlowMatching.create(jax.random.PRNGKey(0), 3,
                                 hidden_dim=(8,))
        x = jax.random.normal(jax.random.PRNGKey(1), (32, 3))
        g = jax.jit(jax.grad(
            lambda m: m.loss(jax.random.PRNGKey(2), x)))(fm)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)


class TestFlowMatchingLayer:

    def test_distribution_protocol_shapes(self):
        from vaemolsim_tpu.flows import FlowMatchingDist, FlowMatchingLayer
        layer = FlowMatchingLayer.create(jax.random.PRNGKey(0), 3, 5,
                                         hidden_dim=(16,), n_steps=8)
        assert layer.params_size() == 5
        cond = jax.random.normal(jax.random.PRNGKey(1), (7, 5))
        dist = layer(cond)
        assert isinstance(dist, FlowMatchingDist)
        assert dist.batch_shape == (7,)
        assert dist.event_shape == (3,)
        s = dist.sample(jax.random.PRNGKey(2))
        assert s.shape == (7, 3)
        s2 = dist.sample(jax.random.PRNGKey(2), (4,))
        assert s2.shape == (4, 7, 3)
        lp = dist.log_prob(s)
        assert lp.shape == (7,)
        # forward and backward integration agree (n_steps=8 is coarse;
        # the 64-step identity is pinned tightly above)
        x, lp_f = dist.sample_and_log_prob(jax.random.PRNGKey(3))
        np.testing.assert_allclose(np.asarray(dist.log_prob(x)),
                                   np.asarray(lp_f), atol=1e-2)

    def test_mapping_to_distribution_integration(self):
        from vaemolsim_tpu.flows import FlowMatchingLayer
        from vaemolsim_tpu.models import MappingToDistribution
        layer = FlowMatchingLayer.create(jax.random.PRNGKey(0), 2, 4,
                                         hidden_dim=(16,), n_steps=8)
        m2d = MappingToDistribution.create(jax.random.PRNGKey(1), layer,
                                           input_shape=3)
        x_in = jax.random.normal(jax.random.PRNGKey(2), (5, 3))
        dist = m2d(x_in)
        assert dist.batch_shape == (5,)
        target = jax.random.normal(jax.random.PRNGKey(3), (5, 2))

        # gradient of the exact CNF log-prob flows through BOTH the
        # mapping and the velocity net
        def nll(model):
            return -jnp.mean(model(x_in).log_prob(target))

        g = jax.jit(jax.grad(nll))(m2d)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)

    def test_cfm_training_of_conditional_decoder(self):
        # Train the LAYER's CNF by simulation-free CFM on (cond, x)
        # pairs where x ~ N(cond_mean, 0.1); the resulting decoder
        # distribution must track its conditioning.
        from vaemolsim_tpu.flows import FlowMatchingLayer
        layer = FlowMatchingLayer.create(jax.random.PRNGKey(0), 1, 1,
                                         hidden_dim=(32, 32), n_steps=24)
        c = jax.random.uniform(jax.random.PRNGKey(1), (4096, 1),
                               minval=-2.0, maxval=2.0)
        x = c + 0.1 * jax.random.normal(jax.random.PRNGKey(2),
                                        (4096, 1))
        from vaemolsim_tpu import train
        loss_fn = lambda m, batch, k: m.model.loss(
            k, batch[1], conditional_input=batch[0])
        layer, _ = train.fit(layer, loss_fn, (c, x),
                             key=jax.random.PRNGKey(3), num_epochs=40,
                             batch_size=512, learning_rate=2e-3,
                             scan_epochs=True)
        dist = layer(jnp.array([[1.5], [-1.5]]))
        s = dist.sample(jax.random.PRNGKey(4), (256,))  # (256, 2, 1)
        means = np.asarray(jnp.mean(s, axis=0))[:, 0]
        np.testing.assert_allclose(means, [1.5, -1.5], atol=0.25)
