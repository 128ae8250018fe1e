"""Dist-layer tests: param transforms, blockwise, autoregressive, flowed
(mirrors reference test_dists.py style: construction, semantics,
conditional contracts, BN flag behavior)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu.dists import (AutoregressiveBlockwise, FlowedDistribution,
                                 IndependentBlockwise,
                                 IndependentDeterministic,
                                 IndependentVonMises,
                                 StaticFlowedDistribution,
                                 family_param_count, register_family)
from vaemolsim_tpu.flows import RQSSplineMAF
from vaemolsim_tpu.ops import distributions as d


class TestParamTransforms:

    def test_param_counts(self):
        assert family_param_count("normal") == 2
        assert family_param_count("von_mises") == 3  # +1 rule
        assert family_param_count("deterministic") == 1
        assert family_param_count(d.Normal) == 2

    def test_von_mises_loc_wraps(self):
        # Reference test_dists.py:26-30: loc from atan2 lands in [-pi, pi].
        layer = IndependentBlockwise.create(1, "von_mises")
        raw = jnp.array([[-0.5, -1.0, 2.0]])  # sin<0, cos<0 -> 3rd quadrant
        dist = layer(raw)
        loc = dist.families[0].loc
        assert -math.pi <= float(loc[0, 0]) <= math.pi
        np.testing.assert_allclose(loc[0, 0], np.arctan2(-0.5, -1.0),
                                   rtol=1e-6)

    def test_von_mises_loc_grad_finite_at_zero_params(self):
        """Raw (sin, cos) = (0, 0) — the output of any zero conditioning
        context through zero-bias heads (e.g. a fully-masked empty
        neighborhood) — must have a finite log_prob gradient: plain
        atan2's gradient is NaN there and one such sample poisons the
        whole batch (regression for the _safe_atan2_loc guard; the
        reference inherits TF's NaN, vaemolsim/dists.py:59-72)."""
        layer = IndependentBlockwise.create(2, "von_mises")
        raw = jnp.zeros((3, 6)).at[0].set(
            jnp.array([0.3, 0.7, 0.1, -0.2, 0.5, 0.0]))
        x = jnp.array([[0.3, -1.0], [0.0, 0.5], [1.2, 2.0]])

        def f(r):
            return jnp.sum(layer(r).log_prob(x))

        g = jax.grad(f)(raw)
        assert jnp.isfinite(g).all()
        # Non-degenerate rows keep plain-atan2 values bit-for-bit
        # (same-backend comparison; numpy's atan2 differs by 1 ulp).
        dist = layer(raw)
        np.testing.assert_array_equal(
            np.asarray(dist.families[0].loc[0]),
            np.asarray(jnp.arctan2(raw[0, ::3], raw[0, 1::3])))

    def test_von_mises_concentration_bounded(self):
        layer = IndependentBlockwise.create(1, "von_mises")
        raw = jnp.array([[0.0, 1.0, 1e30]])
        conc = layer(raw).families[0].concentration
        assert float(conc[0, 0]) <= np.sqrt(np.finfo(np.float32).max) / 2.0
        assert np.isfinite(float(layer(raw).log_prob(jnp.zeros((1, 1)))[0]))

    def test_von_mises_mixture_family(self):
        from vaemolsim_tpu.dists import register_von_mises_mixture
        fam = register_von_mises_mixture(3)
        layer = IndependentBlockwise.create(2, [fam, "normal"])
        assert layer.params_size() == 4 * 3 + 2
        raw = jax.random.normal(jax.random.PRNGKey(0), (6, 14))
        dist = layer(raw)
        x = dist.sample(jax.random.PRNGKey(1))
        assert x.shape == (6, 2)
        assert jnp.all(jnp.abs(x[:, 0]) <= math.pi)
        assert jnp.isfinite(dist.log_prob(x)).all()
        # Mixture normalizes over [-pi, pi].
        grid = jnp.linspace(-math.pi, math.pi, 4001)
        from vaemolsim_tpu.dists import build_family_dist
        single = build_family_dist(fam, raw[:1, None, :12])
        p = jnp.exp(single.log_prob(grid[:, None, None]))[:, 0, 0]
        np.testing.assert_allclose(jnp.trapezoid(p, grid), 1.0, rtol=1e-3)

    def test_register_family_extension(self):
        register_family("unit_uniform", 0,
                        lambda r: d.Uniform(low=jnp.zeros(r.shape[:-1]),
                                            high=jnp.ones(r.shape[:-1])))
        assert family_param_count("unit_uniform") == 0


class TestIndependentBlockwise:

    def test_single_class_all_dofs(self):
        layer = IndependentBlockwise.create(3, "normal")
        assert layer.params_size() == 6
        dist = layer(jnp.zeros((4, 6)))
        lp = dist.log_prob(jnp.zeros((4, 3)))
        assert lp.shape == (4,)

    def test_mixed_families(self):
        layer = IndependentBlockwise.create(
            4, ["normal", "von_mises", "normal", "deterministic"])
        assert layer.param_nums == (2, 3, 2, 1)
        assert layer.params_size() == 8
        raw = jax.random.normal(jax.random.PRNGKey(0), (5, 8))
        dist = layer(raw)
        x = dist.sample(jax.random.PRNGKey(1), ())
        assert x.shape == (5, 4)
        assert jnp.all(jnp.abs(x[:, 1]) <= math.pi)  # von Mises DOF
        assert jnp.isfinite(dist.log_prob(x)).all()

    def test_wrong_family_count_raises(self):
        with pytest.raises(ValueError):
            IndependentBlockwise.create(3, ["normal", "normal"])

    def test_wrong_param_width_raises(self):
        layer = IndependentBlockwise.create(2, "normal")
        with pytest.raises(ValueError):
            layer(jnp.zeros((4, 5)))

    def test_log_prob_matches_manual_split(self):
        layer = IndependentBlockwise.create(2, ["normal", "von_mises"])
        raw = jnp.array([[0.5, 0.1, 0.3, -0.2, 0.8]])
        x = jnp.array([[0.7, 1.2]])
        dist = layer(raw)
        n = d.Normal(0.5, jax.nn.softplus(0.1) + np.finfo(np.float32).eps)
        want_n = n.log_prob(0.7)
        loc = np.arctan2(0.3, -0.2)
        from vaemolsim_tpu.dists.layers import _vm_softclip
        conc = _vm_softclip.forward(jnp.asarray(0.8))
        want_v = d.VonMises(loc, conc).log_prob(1.2)
        np.testing.assert_allclose(dist.log_prob(x)[0], want_n + want_v,
                                   rtol=1e-5)


class TestAutoregressiveBlockwise:
    """Subclass-style coverage of the reference's inheritance suite
    (test_dists.py:77-79)."""

    def _layer(self, conditional=False):
        return AutoregressiveBlockwise.create(
            jax.random.PRNGKey(0), 3, ["normal", "von_mises", "normal"],
            conditional=conditional, conditional_event_shape=4,
            auto_net_params={"hidden_units": [16]})

    def test_params_size_tuple(self):
        layer = self._layer()
        assert layer.params_size() == (3, 3)  # max(param_nums) = 3

    def test_shape_check(self):
        layer = self._layer()
        with pytest.raises(ValueError):
            layer(jnp.zeros((5, 2, 3)))

    def test_sample_and_log_prob(self):
        layer = self._layer()
        raw = jax.random.normal(jax.random.PRNGKey(1), (6, 3, 3))
        dist = layer(raw)
        x = dist.sample(jax.random.PRNGKey(2))
        assert x.shape == (6, 3)
        lp = dist.log_prob(x)
        assert lp.shape == (6,)
        assert jnp.isfinite(lp).all()

    def test_samples_respect_own_conditionals(self):
        # The returned joint must satisfy the model's own autoregressive
        # conditionals (regression for the fresh-key-per-pass bug where
        # DOF j was conditioned on STALE parent draws).  Implant weights
        # so the child DOF's loc depends strongly on its parent:
        # loc(child) = 5 * tanh(2 * parent).
        layer = AutoregressiveBlockwise.create(
            jax.random.PRNGKey(3), 2, "normal",
            auto_net_params={"hidden_units": [1]})
        made = layer.made
        deg = np.asarray(made.input_order_static)
        parent = int(np.argmin(deg))
        child = int(np.argmax(deg))
        k0 = jnp.zeros_like(made.kernels[0]).at[parent, 0].set(2.0)
        # Output layout: (D * params_per_dim); child's loc column:
        loc_col = child * made.params_per_dim + 0
        k1 = jnp.zeros_like(made.kernels[1]).at[0, loc_col].set(5.0)
        made = made.replace(kernels=(k0, k1),
                            biases=(jnp.zeros_like(made.biases[0]),
                                    jnp.zeros_like(made.biases[1])))
        layer = layer.replace(made=made)

        raw = jnp.zeros((4000, 2, 2))
        dist = layer(raw)
        s = dist.sample(jax.random.PRNGKey(5))
        target = 5.0 * jnp.tanh(2.0 * s[:, parent])
        corr = float(jnp.corrcoef(s[:, child], target)[0, 1])
        assert corr > 0.9, f"child does not track its conditional: {corr}"
        # And the joint's own log-prob of its samples stays sane.
        assert float(jnp.mean(dist.log_prob(s))) > -6.0

    def test_autoregressive_shift_matters(self):
        layer = self._layer()
        raw = jnp.zeros((1, 3, 3))
        dist = layer(raw)
        x1 = jnp.array([[0.1, 0.2, 0.3]])
        x2 = jnp.array([[5.0, 0.2, 0.3]])
        # Changing DOF 0 changes the conditional params of later DOFs, so
        # per-DOF log-probs beyond DOF 0 must differ.
        lp1 = dist._dist_at(x1).log_prob_per_dof(x1)
        lp2 = dist._dist_at(x2).log_prob_per_dof(x2)
        assert not np.allclose(lp1[0, 1:], lp2[0, 1:])

    def test_conditional(self):
        layer = self._layer(conditional=True)
        raw = jnp.zeros((2, 3, 3))
        c1, c2 = jnp.zeros((2, 4)), jnp.ones((2, 4))
        x = jnp.full((2, 3), 0.3)
        lp1 = layer(raw, conditional_input=c1).log_prob(x)
        lp2 = layer(raw, conditional_input=c2).log_prob(x)
        assert not np.allclose(lp1, lp2)
        with pytest.raises(ValueError):
            layer(raw)


class TestFlowedDistribution:

    def _flowed(self, conditional=False, batch_norm=False):
        rqs = {"num_bins": 8, "hidden_dim": 16}
        if conditional:
            rqs.update(conditional=True, conditional_event_shape=4)
        flow = RQSSplineMAF.create(jax.random.PRNGKey(0), 2, num_blocks=2,
                                   rqs_params=rqs, batch_norm=batch_norm)
        base = IndependentBlockwise.create(2, "normal")
        return FlowedDistribution(flow=flow, base_layer=base)

    def test_params_size_delegates(self):
        assert self._flowed().params_size() == 4

    def test_emits_transformed_distribution(self):
        fd = self._flowed()
        raw = jax.random.normal(jax.random.PRNGKey(1), (5, 4))
        dist = fd(raw)
        assert isinstance(dist, d.TransformedDistribution)
        s, lp = dist.sample_and_log_prob(jax.random.PRNGKey(2))
        assert s.shape == (5, 2)
        np.testing.assert_allclose(lp, dist.log_prob(s), atol=5e-3)

    def test_conditional_mirrors_flow(self):
        # Reference dists.py:412.
        assert not self._flowed().conditional
        fd = self._flowed(conditional=True)
        assert fd.conditional
        raw = jnp.zeros((2, 4))
        lp1 = fd(raw, conditional_input=jnp.zeros((2, 4))).log_prob(
            jnp.zeros((2, 2)))
        lp2 = fd(raw, conditional_input=jnp.ones((2, 4))).log_prob(
            jnp.zeros((2, 2)))
        assert not np.allclose(lp1, lp2)

    def test_train_flag_with_batch_norm(self):
        # Reference test_dists.py:171-190 analog.
        fd = self._flowed(batch_norm=True)
        raw = jax.random.normal(jax.random.PRNGKey(1), (16, 4))
        x = jax.random.normal(jax.random.PRNGKey(2), (16, 2)) * 2.0
        lp_t = fd(raw, train=True).log_prob(x)
        lp_e = fd(raw, train=False).log_prob(x)
        assert not np.allclose(lp_t, lp_e)


class TestStaticFlowedDistribution:

    def test_inputs_ignored(self):
        flow = RQSSplineMAF.create(jax.random.PRNGKey(0), 2, num_blocks=2,
                                   rqs_params={"num_bins": 8,
                                               "hidden_dim": 16})
        base = d.Independent(d.Normal(jnp.zeros(2), jnp.ones(2)), 1)
        sfd = StaticFlowedDistribution(flow=flow, base=base)
        d1 = sfd(jnp.zeros((3, 7)))
        d2 = sfd(None)
        x = jnp.array([[0.3, -0.4]])
        np.testing.assert_allclose(d1.log_prob(x), d2.log_prob(x), rtol=1e-6)


class TestIndependentVonMisesLayer:

    def test_params_size_and_shapes(self):
        layer = IndependentVonMises.create(4)
        assert layer.params_size() == 12
        dist = layer(jax.random.normal(jax.random.PRNGKey(0), (6, 12)))
        s = dist.sample(jax.random.PRNGKey(1))
        assert s.shape == (6, 4)
        assert jnp.all(jnp.abs(s) <= math.pi)
        assert dist.log_prob(s).shape == (6,)


class TestIndependentDeterministicLayer:

    def test_reproduces_inputs(self):
        # Reference test_dists.py:239-250.
        layer = IndependentDeterministic.create(3)
        raw = jnp.array([[1.0, -2.0, 3.0]])
        s = layer(raw).sample(jax.random.PRNGKey(0))
        np.testing.assert_array_equal(s, raw)

    def test_wrong_width_raises(self):
        with pytest.raises(ValueError):
            IndependentDeterministic.create(3)(jnp.zeros((1, 4)))
