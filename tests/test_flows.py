"""Flow tests: construction, round trips, polymorphic calls, conditional
contracts, BN train-flag behavior, and the minimum end-to-end training
slice (flow learns a multimodal 1-D target — the Using_Normalizing_Flows
workload, SURVEY.md §7 milestone config 2).

Mirrors the reference's inheritance-parametrized suites
(test_flows.py:104-116, 244-246) via pytest parametrization.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vaemolsim_tpu.flows import (MAFLayer, MaskedSplineConditioner,
                                 RQSSplineMAF, RQSSplineRealNVP,
                                 SplineConditioner, make_domain_transform)
from vaemolsim_tpu.ops import distributions as d
from vaemolsim_tpu.ops.bijectors import Block


def make_flow(kind, data_dim, key=None, **kw):
    key = key if key is not None else jax.random.PRNGKey(0)
    rqs = dict(kw.pop("rqs_params", {}))
    rqs.setdefault("num_bins", 8)
    rqs.setdefault("hidden_dim", 16)
    if kind == "realnvp":
        return RQSSplineRealNVP.create(key, data_dim, rqs_params=rqs, **kw)
    return RQSSplineMAF.create(key, data_dim, rqs_params=rqs, **kw)


@pytest.mark.parametrize("kind", ["realnvp", "maf"])
@pytest.mark.parametrize("data_dim", [1, 2, 5])
class TestFlowRoundTrip:

    def test_tensor_call_and_roundtrip(self, kind, data_dim):
        flow = make_flow(kind, data_dim)
        x = jax.random.normal(jax.random.PRNGKey(1), (7, data_dim)) * 2.0
        y = flow(x)
        assert y.shape == x.shape
        chain = flow.as_bijector()
        x2, ildj = chain.inverse_and_log_det(y)
        np.testing.assert_allclose(x2, x, atol=1e-4)
        _, fldj = chain.forward_and_log_det(x)
        np.testing.assert_allclose(fldj, -ildj, atol=1e-4)

    def test_distribution_call(self, kind, data_dim):
        flow = make_flow(kind, data_dim)
        base = d.Independent(d.Normal(jnp.zeros(data_dim),
                                      jnp.ones(data_dim)), 1)
        td = flow(base)
        assert isinstance(td, d.TransformedDistribution)
        s, lp = td.sample_and_log_prob(jax.random.PRNGKey(2), (11,))
        assert s.shape == (11, data_dim)
        assert lp.shape == (11,)
        np.testing.assert_allclose(lp, td.log_prob(s), atol=5e-3)


@pytest.mark.parametrize("kind", ["realnvp", "maf"])
class TestFlowBehavior:

    def test_batch_norm_flag_changes_density(self, kind):
        # Reference test_flows.py:178-196 analog.
        flow = make_flow(kind, 3, batch_norm=True, num_blocks=2)
        x = jax.random.normal(jax.random.PRNGKey(3), (32, 3)) * 2.0 + 1.0
        base = d.Independent(d.Normal(jnp.zeros(3), jnp.ones(3)), 1)
        lp_train = flow(base, train=True).log_prob(x)
        lp_eval = flow(base, train=False).log_prob(x)
        assert not np.allclose(lp_train, lp_eval)

    def test_update_batch_stats(self, kind):
        flow = make_flow(kind, 3, batch_norm=True, num_blocks=2)
        x = jax.random.normal(jax.random.PRNGKey(3), (64, 3)) * 2.0 + 1.0
        flow2 = flow.update_batch_stats(x)
        assert not np.allclose(flow2.bn_params[0].mean, flow.bn_params[0].mean)

    def test_before_after_transforms(self, kind):
        dom = Block(make_domain_transform([(-np.pi, np.pi)] * 2,
                                          target=(-1.0, 1.0)), 1)
        flow = make_flow(kind, 2, before_flow_transform=dom,
                         rqs_params={"bin_range": [-1.0, 1.0]})
        x = jax.random.uniform(jax.random.PRNGKey(0), (5, 2),
                               minval=-np.pi, maxval=np.pi)
        y = flow(x)
        assert jnp.all(jnp.isfinite(y))
        chain = flow.as_bijector()
        np.testing.assert_allclose(chain.inverse(y), x, atol=1e-4)

    def test_trainable_pytree(self, kind):
        flow = make_flow(kind, 2)
        base = d.Independent(d.Normal(jnp.zeros(2), jnp.ones(2)), 1)
        x = jax.random.normal(jax.random.PRNGKey(5), (16, 2))

        def loss(f):
            return -jnp.mean(f(base).log_prob(x))

        g = jax.grad(loss)(flow)
        leaves = jax.tree_util.tree_leaves(g)
        assert any(float(jnp.sum(jnp.abs(l))) > 0 for l in leaves)


class TestConditionalMAF:

    def test_conditional_changes_density(self):
        flow = RQSSplineMAF.create(
            jax.random.PRNGKey(0), 3, num_blocks=2,
            rqs_params={"num_bins": 8, "hidden_dim": 16, "conditional": True,
                        "conditional_event_shape": 4})
        assert flow.conditional
        base = d.Independent(d.Normal(jnp.zeros(3), jnp.ones(3)), 1)
        x = jax.random.normal(jax.random.PRNGKey(1), (6, 3))
        c1 = jnp.zeros((6, 4))
        c2 = jnp.ones((6, 4))
        lp1 = flow(base, conditional_input=c1).log_prob(x)
        lp2 = flow(base, conditional_input=c2).log_prob(x)
        assert not np.allclose(lp1, lp2)

    def test_conditional_required_raises(self):
        # Reference test_flows.py:248-253 analog.
        flow = RQSSplineMAF.create(
            jax.random.PRNGKey(0), 3,
            rqs_params={"num_bins": 8, "hidden_dim": 16, "conditional": True,
                        "conditional_event_shape": 4})
        with pytest.raises(ValueError):
            flow(jnp.zeros((2, 3)))

    def test_order_seed_reproducible(self):
        kw = dict(num_blocks=4, order_seed=17,
                  rqs_params={"num_bins": 8, "hidden_dim": 16})
        f1 = RQSSplineMAF.create(jax.random.PRNGKey(0), 5, **kw)
        f2 = RQSSplineMAF.create(jax.random.PRNGKey(0), 5, **kw)
        for b1, b2 in zip(f1.blocks, f2.blocks):
            assert (b1.conditioner.w_net.input_order_static
                    == b2.conditioner.w_net.input_order_static)
        # First block right-to-left, last left-to-right.
        assert f1.blocks[0].conditioner.w_net.input_order_static == (5, 4, 3, 2, 1)
        assert f1.blocks[-1].conditioner.w_net.input_order_static == (1, 2, 3, 4, 5)


class TestMAFAutoregressive:

    def test_inverse_is_autoregressive(self):
        cond = MaskedSplineConditioner.create(
            jax.random.PRNGKey(0), 4, num_bins=8, hidden_dim=16)
        maf = MAFLayer(cond)
        y = jax.random.normal(jax.random.PRNGKey(1), (4,))
        jac = jax.jacfwd(lambda t: maf.inverse_and_log_det(t)[0])(y)
        # x_j depends on y_j and on y_i with lower degree only.
        degrees = np.asarray(cond.w_net.input_order_static)
        for j in range(4):
            for i in range(4):
                if i != j and degrees[i] >= degrees[j]:
                    np.testing.assert_allclose(jac[j, i], 0.0, atol=1e-7)

    def test_forward_inverse_consistency(self):
        cond = MaskedSplineConditioner.create(
            jax.random.PRNGKey(0), 4, num_bins=8, hidden_dim=16)
        maf = MAFLayer(cond)
        x = jax.random.normal(jax.random.PRNGKey(2), (5, 4))
        y, fldj = maf.forward_and_log_det(x)
        x2, ildj = maf.inverse_and_log_det(y)
        np.testing.assert_allclose(x2, x, atol=1e-4)
        np.testing.assert_allclose(fldj, -ildj, atol=1e-4)


class TestFlowLearnsMixture:
    """The minimum end-to-end slice: a 1-D RQS flow fits a 4-mode mixture
    by max-likelihood (Using_Normalizing_Flows workload)."""

    @pytest.mark.parametrize("kind", ["realnvp", "maf"])
    def test_nll_decreases(self, kind):
        target = d.MixtureSameFamily(
            jnp.zeros(4),
            d.Normal(jnp.array([-4.0, -1.5, 1.5, 4.0]), 0.4 * jnp.ones(4)))
        data = target.sample(jax.random.PRNGKey(0), (2048, 1))[..., 0][..., None]
        flow = make_flow(kind, 1, num_blocks=2,
                         rqs_params={"num_bins": 16, "hidden_dim": 32,
                                     "bin_range": [-6.0, 6.0]})
        base = d.Independent(d.Normal(jnp.zeros(1), jnp.ones(1)), 1)

        @jax.jit
        def loss_fn(f, batch):
            return -jnp.mean(f(base).log_prob(batch))

        opt = optax.adam(1e-3)
        opt_state = opt.init(flow)

        @jax.jit
        def step(f, s, batch):
            l, g = jax.value_and_grad(loss_fn)(f, batch)
            updates, s = opt.update(g, s)
            return optax.apply_updates(f, updates), s, l

        l0 = float(loss_fn(flow, data))
        for i in range(60):
            flow, opt_state, l = step(flow, opt_state, data)
        l1 = float(l)
        assert np.isfinite(l0) and np.isfinite(l1)
        assert l1 < l0 - 0.1, f"NLL did not decrease: {l0} -> {l1}"
        # Samples should spread beyond one mode.
        s = flow(base).sample(jax.random.PRNGKey(9), (2000,))
        assert float(jnp.std(s)) > 1.0


class TestConstantSplineOptimization:
    """For 1-D events the conditioner output is input-independent (all
    MADE masks zero; RealNVP's zero-width conditioner sees constant
    ones), so both layers evaluate one dummy row and broadcast.  These
    tests pin that the optimized path equals a full-batch conditioner
    evaluation exactly."""

    def test_maf_1d_matches_full_batch_eval(self):
        from vaemolsim_tpu.flows.spline_flows import (MAFLayer,
                                                      MaskedSplineConditioner)
        cond = MaskedSplineConditioner.create(
            jax.random.PRNGKey(0), 1, num_bins=8, hidden_dim=16,
            bin_range=(-4.0, 4.0))
        layer = MAFLayer(cond)
        y = jax.random.normal(jax.random.PRNGKey(1), (37, 1)) * 2.0
        # Optimized layer path vs explicitly feeding the whole batch.
        x_opt, ildj_opt = layer.inverse_and_log_det(y)
        spline_full = cond(y)
        x_full, ildj_full = spline_full.inverse_and_log_det(y)
        np.testing.assert_allclose(np.asarray(x_opt), np.asarray(x_full),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ildj_opt),
                                   np.asarray(jnp.sum(ildj_full, -1)),
                                   rtol=1e-6, atol=1e-6)
        yf_opt, fldj_opt = layer.forward_and_log_det(y)
        yf_full, fldj_full = spline_full.forward_and_log_det(y)
        np.testing.assert_allclose(np.asarray(yf_opt), np.asarray(yf_full),
                                   rtol=1e-6, atol=1e-6)

    def test_maf_1d_shortcut_still_validates_context(self):
        """The shortcut must not silently drop a context passed to a
        non-conditional conditioner (regression: it skipped
        _check_conditional)."""
        import pytest
        from vaemolsim_tpu.flows.spline_flows import (MAFLayer,
                                                      MaskedSplineConditioner)
        cond = MaskedSplineConditioner.create(
            jax.random.PRNGKey(0), 1, num_bins=8, hidden_dim=16,
            bin_range=(-4.0, 4.0))
        layer = MAFLayer(cond)
        y = jnp.zeros((3, 1))
        with pytest.raises(ValueError, match="non-conditional"):
            layer.inverse_and_log_det(y, context=jnp.ones((3, 5)))

    def test_realnvp_1d_matches_full_batch_eval(self):
        from vaemolsim_tpu.flows.spline_flows import (CouplingLayer,
                                                      SplineConditioner)
        cond = SplineConditioner.create(jax.random.PRNGKey(2), 0, 1,
                                        num_bins=8, hidden_dim=16,
                                        bin_range=(-4.0, 4.0))
        layer = CouplingLayer(cond, num_masked=0)
        x = jax.random.normal(jax.random.PRNGKey(3), (29, 1)) * 2.0
        y_opt, ldj_opt = layer.forward_and_log_det(x)
        spline_full = cond(jnp.zeros((29, 0)))
        y_full, ldj_full = spline_full.forward_and_log_det(x)
        np.testing.assert_allclose(np.asarray(y_opt), np.asarray(y_full),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ldj_opt),
                                   np.asarray(jnp.sum(ldj_full, -1)),
                                   rtol=1e-6, atol=1e-6)

    def test_gradients_flow_through_constant_spline(self):
        from vaemolsim_tpu.flows import RQSSplineMAF
        from vaemolsim_tpu.ops import distributions as d
        flow = RQSSplineMAF.create(jax.random.PRNGKey(4), 1, num_blocks=2,
                                   rqs_params={"num_bins": 8,
                                               "hidden_dim": 16,
                                               "bin_range": [-4.0, 4.0]})
        base = d.Independent(d.Normal(jnp.zeros(1), jnp.ones(1)), 1)
        data = jax.random.normal(jax.random.PRNGKey(5), (64, 1))

        def nll(f):
            return -jnp.mean(f(base).log_prob(data))

        grads = jax.grad(nll)(flow)
        norms = [float(jnp.sum(jnp.abs(g)))
                 for g in jax.tree_util.tree_leaves(grads)]
        # Second-layer kernels and all biases must receive gradient.
        assert sum(n > 0 for n in norms) >= 8


class TestEventTransformProbe:
    """before/after transforms are wrapped by PROBING their log-det
    shape (an isinstance allowlist silently mishandled unlisted scalar
    bijectors and already-Blocked chains)."""

    def test_unlisted_scalar_bijector_reduces(self):
        from vaemolsim_tpu.flows import RQSSplineMAF
        from vaemolsim_tpu.ops import bijectors as bj
        from vaemolsim_tpu.ops import distributions as d

        flow = RQSSplineMAF.create(
            jax.random.PRNGKey(0), 3, num_blocks=2,
            rqs_params={"num_bins": 4, "hidden_dim": 8},
            before_flow_transform=bj.BatchNormBijector(
                mean=jnp.zeros(3), var=jnp.ones(3),
                log_gamma=jnp.zeros(3), beta=jnp.zeros(3)))
        base = d.Independent(d.Normal(jnp.zeros(3), jnp.ones(3)), 1)
        lp = flow(base).log_prob(jnp.ones((7, 3)))
        assert lp.shape == (7,)

    def test_already_blocked_chain_not_double_reduced(self):
        from vaemolsim_tpu.flows import RQSSplineMAF
        from vaemolsim_tpu.ops import bijectors as bj
        from vaemolsim_tpu.ops import distributions as d

        pre = bj.Chain((bj.Block(bj.Tanh(), 1),))
        flow = RQSSplineMAF.create(
            jax.random.PRNGKey(0), 2, num_blocks=2,
            rqs_params={"num_bins": 4, "hidden_dim": 8},
            before_flow_transform=pre)
        base = d.Independent(d.Normal(jnp.zeros(2), jnp.ones(2)), 1)
        lp = flow(base).log_prob(0.3 * jnp.ones((5, 2)))
        assert lp.shape == (5,)
        assert bool(jnp.all(jnp.isfinite(lp)))


def test_merged_made_requires_tanh():
    """The merged fast path hardcodes tanh; a custom-activation MADE
    must fall back to per-net evaluation (same results either way)."""
    from vaemolsim_tpu.flows.spline_flows import MaskedSplineConditioner
    from vaemolsim_tpu.nn.core import MADE

    cond = MaskedSplineConditioner.create(
        jax.random.PRNGKey(0), 3, num_bins=4, hidden_dim=8,
        bin_range=(-4.0, 4.0))
    relu_net = MADE.create(jax.random.PRNGKey(1), 3, 4, hidden_units=[8],
                           activation="relu")
    cond2 = cond.replace(w_net=relu_net)
    assert cond.mergeable and not cond2.mergeable
    # The non-mergeable path still evaluates (three separate nets).
    spline = cond2(jnp.ones((2, 3)))
    assert spline.bin_widths.shape[-1] == 4
