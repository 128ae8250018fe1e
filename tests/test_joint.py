"""JointBackmapping tests: causality across residues, log_prob/sample
consistency, training — the working realization of the reference's WIP
system-level decoder (vaemolsim/dists.py:755-858)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vaemolsim_tpu.dists import (IndependentBlockwise, JointBackmapping)


@pytest.fixture(scope="module")
def joint_layer():
    decoder_dist = IndependentBlockwise.create(2, "normal")
    return JointBackmapping.create(jax.random.PRNGKey(0),
                                   dofs_per_residue=2, cg_info_dim=1,
                                   decoder_dist=decoder_dist,
                                   embed_dim=8, prefix_dim=4,
                                   mapping_hidden=16)


@pytest.fixture
def system():
    B, R = 3, 5
    cg = jax.random.normal(jax.random.PRNGKey(1), (B, R, 3)) * 2.0
    info = jax.random.normal(jax.random.PRNGKey(2), (B, R, 1))
    x = jax.random.normal(jax.random.PRNGKey(3), (B, R, 2))
    return cg, info, x


class TestJointBackmapping:

    def test_log_prob_shape(self, joint_layer, system):
        cg, info, x = system
        dist = joint_layer(cg, info)
        lp = dist.log_prob(x)
        assert lp.shape == (3,)
        assert jnp.isfinite(lp).all()

    def test_causality(self, joint_layer, system):
        # Residue r's contribution may depend only on residues < r:
        # perturbing residue 3 must not change per-residue densities 0-3.
        cg, info, x = system
        dist = joint_layer(cg, info)
        ctx1 = dist._contexts(x)
        x2 = x.at[:, 3].set(99.0)
        ctx2 = dist._contexts(x2)
        np.testing.assert_allclose(ctx1[:, :4], ctx2[:, :4], atol=1e-6)
        assert not np.allclose(ctx1[:, 4], ctx2[:, 4])

    def test_sample_shape_and_finite(self, joint_layer, system):
        cg, info, _ = system
        dist = joint_layer(cg, info)
        s = dist.sample(jax.random.PRNGKey(4))
        assert s.shape == (3, 5, 2)
        assert jnp.isfinite(s).all()
        lp = dist.log_prob(s)
        assert jnp.isfinite(lp).all()

    def test_sample_is_jittable(self, joint_layer, system):
        cg, info, _ = system
        f = jax.jit(lambda k: joint_layer(cg, info).sample(k))
        s = f(jax.random.PRNGKey(5))
        assert s.shape == (3, 5, 2)

    def test_trains(self, joint_layer, system):
        cg, info, _ = system
        # Target: residue r's coords centered at r (tests that context
        # carries residue identity through the CG environment).
        target = jnp.broadcast_to(
            jnp.arange(5.0)[None, :, None] * 0.5, (3, 5, 2))
        target = target + 0.1 * jax.random.normal(jax.random.PRNGKey(6),
                                                  (3, 5, 2))

        layer = joint_layer
        def loss_fn(l):
            return -jnp.mean(l(cg, info).log_prob(target))

        opt = optax.adam(5e-3)
        st = opt.init(layer)

        @jax.jit
        def step(l, s):
            v, g = jax.value_and_grad(loss_fn)(l)
            u, s = opt.update(g, s)
            return optax.apply_updates(l, u), s, v

        l0 = float(loss_fn(layer))
        for _ in range(30):
            layer, st, v = step(layer, st)
        assert float(v) < l0


class TestSchNetVariant:

    def test_schnet_embedding_log_prob_sample_grad(self, system):
        """embedding="schnet" (the reference's cgschnet intent,
        vaemolsim/dists.py:805) composes with the joint decoder."""
        cg, info, x = system
        layer = JointBackmapping.create(
            jax.random.PRNGKey(4), dofs_per_residue=2, cg_info_dim=1,
            decoder_dist=IndependentBlockwise.create(2, "normal"),
            embed_dim=8, prefix_dim=4, mapping_hidden=16,
            embedding="schnet")
        lp = layer(cg, info).log_prob(x)
        assert lp.shape == (3,) and jnp.isfinite(lp).all()
        s = jax.jit(lambda k: layer(cg, info).sample(k))(
            jax.random.PRNGKey(5))
        assert s.shape == x.shape and jnp.isfinite(s).all()
        g = jax.grad(lambda l: -jnp.mean(l(cg, info).log_prob(x)))(layer)
        assert all(jnp.isfinite(leaf).all()
                   for leaf in jax.tree_util.tree_leaves(g))

    def test_unknown_embedding_raises(self):
        with pytest.raises(ValueError, match="embedding"):
            JointBackmapping.create(
                jax.random.PRNGKey(0), dofs_per_residue=2, cg_info_dim=1,
                decoder_dist=IndependentBlockwise.create(2, "normal"),
                embedding="nope")
