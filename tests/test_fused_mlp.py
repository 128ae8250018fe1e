"""Fused dense-stack kernel vs the XLA path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu.nn import MADE, FCDeepNN
from vaemolsim_tpu.ops.fused_mlp import dense_stack_xla, fused_dense_stack


def make_stack(key, dims, cond_dim=None):
    keys = jax.random.split(key, 2 * len(dims))
    kernels = [jax.random.normal(keys[i], (dims[i], dims[i + 1])) * 0.3
               for i in range(len(dims) - 1)]
    biases = [jax.random.normal(keys[len(dims) + i], (dims[i + 1],)) * 0.1
              for i in range(len(dims) - 1)]
    cond_kernels = None
    if cond_dim:
        cond_kernels = [jax.random.normal(jax.random.fold_in(key, 100 + i),
                                          (cond_dim, dims[i + 1])) * 0.2
                        for i in range(len(dims) - 1)]
    return kernels, biases, cond_kernels


class TestFusedStack:

    def test_matches_xla(self):
        dims = [3, 64, 5]
        kernels, biases, _ = make_stack(jax.random.PRNGKey(0), dims)
        x = jax.random.normal(jax.random.PRNGKey(1), (200, 3))
        acts = ["tanh", None]
        got = fused_dense_stack(x, kernels, biases, acts, interpret=True)
        want = dense_stack_xla(x, kernels, biases, acts)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_three_layers_relu(self):
        dims = [4, 32, 16, 2]
        kernels, biases, _ = make_stack(jax.random.PRNGKey(2), dims)
        x = jax.random.normal(jax.random.PRNGKey(3), (77, 4))  # pad path
        acts = ["relu", "relu", None]
        got = fused_dense_stack(x, kernels, biases, acts, interpret=True)
        want = dense_stack_xla(x, kernels, biases, acts)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_conditional(self):
        dims = [3, 32, 4]
        kernels, biases, cks = make_stack(jax.random.PRNGKey(4), dims,
                                          cond_dim=6)
        x = jax.random.normal(jax.random.PRNGKey(5), (50, 3))
        c = jax.random.normal(jax.random.PRNGKey(6), (50, 6))
        acts = ["tanh", None]
        got = fused_dense_stack(x, kernels, biases, acts, cond=c,
                                cond_kernels=cks, interpret=True)
        want = dense_stack_xla(x, kernels, biases, acts, cond=c,
                               cond_kernels=cks)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_gradients_match(self):
        dims = [3, 16, 2]
        kernels, biases, _ = make_stack(jax.random.PRNGKey(7), dims)
        x = jax.random.normal(jax.random.PRNGKey(8), (40, 3))
        acts = ["tanh", None]

        def loss_f(x, kernels, biases):
            return jnp.sum(fused_dense_stack(x, kernels, biases, acts,
                                             interpret=True) ** 2)

        def loss_x(x, kernels, biases):
            return jnp.sum(dense_stack_xla(x, kernels, biases, acts) ** 2)

        g1 = jax.grad(loss_f, argnums=(0, 1, 2))(x, tuple(kernels),
                                                 tuple(biases))
        g2 = jax.grad(loss_x, argnums=(0, 1, 2))(x, tuple(kernels),
                                                 tuple(biases))
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)

    def test_leading_batch_dims(self):
        dims = [3, 16, 2]
        kernels, biases, _ = make_stack(jax.random.PRNGKey(9), dims)
        x = jax.random.normal(jax.random.PRNGKey(10), (4, 7, 3))
        got = fused_dense_stack(x, kernels, biases, ["tanh", None],
                                interpret=True)
        assert got.shape == (4, 7, 2)


class TestConsumersUnchanged:
    """The wiring through MADE/FCDeepNN/SplineConditioner must be
    numerically identical on the default (XLA) path."""

    def test_made_same_outputs(self):
        net = MADE.create(jax.random.PRNGKey(0), 4, 3, hidden_units=[16],
                          conditional=True, conditional_event_size=2)
        x = jax.random.normal(jax.random.PRNGKey(1), (5, 4))
        c = jax.random.normal(jax.random.PRNGKey(2), (5, 2))
        out = net(x, c)
        # Manual computation.
        h = jnp.tanh(x @ (net.kernels[0] * net.masks[0]) + net.biases[0]
                     + c @ net.cond_kernels[0])
        want = (h @ (net.kernels[1] * net.masks[1]) + net.biases[1]
                + c @ net.cond_kernels[1]).reshape(5, 4, 3)
        np.testing.assert_allclose(out, want, atol=1e-5)

    def test_fcdeepnn_same_outputs(self):
        net = FCDeepNN.create(jax.random.PRNGKey(0), 4, 3, hidden_dim=[8, 8])
        x = jax.random.normal(jax.random.PRNGKey(1), (6, 4))
        h = x
        for l in net.layers:
            h = jnp.maximum(h @ l.kernel + l.bias, 0.0)
        want = h @ net.head.kernel + net.head.bias
        np.testing.assert_allclose(net(x), want, atol=1e-5)
