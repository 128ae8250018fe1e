"""RQS spline golden tests: round trip, identity tails, autodiff log-det,
monotonicity, and the reference's activation semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu.ops import rqs
from vaemolsim_tpu.ops.rqs import RationalQuadraticSpline


def make_params(key, batch_shape, num_bins=8, bin_min=-2.0, bin_max=2.0):
    """Spline params via the reference's activations
    (vaemolsim/flows.py:86-101): softmax*(range - K*1e-2) + 1e-2 bins,
    softplus + 1e-2 slopes."""
    k1, k2, k3 = jax.random.split(key, 3)
    raw_w = jax.random.normal(k1, batch_shape + (num_bins,))
    raw_h = jax.random.normal(k2, batch_shape + (num_bins,))
    raw_s = jax.random.normal(k3, batch_shape + (num_bins - 1,))
    total = bin_max - bin_min
    w = jax.nn.softmax(raw_w, axis=-1) * (total - num_bins * 1e-2) + 1e-2
    h = jax.nn.softmax(raw_h, axis=-1) * (total - num_bins * 1e-2) + 1e-2
    s = jax.nn.softplus(raw_s) + 1e-2
    return w, h, s


class TestRQS:

    def test_roundtrip(self):
        w, h, s = make_params(jax.random.PRNGKey(0), (64,))
        x = jnp.linspace(-1.9, 1.9, 64)
        y, fldj = rqs.rqs_forward(x, w, h, s, -2.0)
        x2, ildj = rqs.rqs_inverse(y, w, h, s, -2.0)
        np.testing.assert_allclose(x2, x, atol=1e-5)
        np.testing.assert_allclose(fldj, -ildj, atol=1e-4)

    def test_identity_outside_range(self):
        w, h, s = make_params(jax.random.PRNGKey(1), ())
        x = jnp.array([-5.0, -2.01, 2.01, 7.0])
        y, ldj = rqs.rqs_forward(x, w, h, s, -2.0)
        np.testing.assert_allclose(y, x)
        np.testing.assert_allclose(ldj, 0.0)
        x2, ildj = rqs.rqs_inverse(x, w, h, s, -2.0)
        np.testing.assert_allclose(x2, x)
        np.testing.assert_allclose(ildj, 0.0)

    def test_boundary_continuity(self):
        # Identity-tail continuity: boundary derivative is 1 so the spline
        # meets the identity smoothly at both ends.
        w, h, s = make_params(jax.random.PRNGKey(2), ())
        eps = 1e-4
        y_in, _ = rqs.rqs_forward(jnp.float32(-2.0 + eps), w, h, s, -2.0)
        y_out, _ = rqs.rqs_forward(jnp.float32(-2.0 - eps), w, h, s, -2.0)
        assert abs(float(y_in - y_out)) < 1e-3

    def test_log_det_vs_autodiff(self):
        w, h, s = make_params(jax.random.PRNGKey(3), ())
        xs = jnp.linspace(-1.95, 1.95, 41)

        def f(x):
            return rqs.rqs_forward(x, w, h, s, -2.0)[0]

        grads = jax.vmap(jax.grad(f))(xs)
        _, fldj = rqs.rqs_forward(xs, w, h, s, -2.0)
        np.testing.assert_allclose(fldj, jnp.log(grads), atol=1e-4, rtol=1e-4)

    def test_monotone(self):
        w, h, s = make_params(jax.random.PRNGKey(4), ())
        xs = jnp.linspace(-2.5, 2.5, 301)
        ys, _ = rqs.rqs_forward(xs, w, h, s, -2.0)
        assert jnp.all(jnp.diff(ys) > 0)

    def test_maps_range_to_range(self):
        w, h, s = make_params(jax.random.PRNGKey(5), ())
        y_lo, _ = rqs.rqs_forward(jnp.float32(-2.0), w, h, s, -2.0)
        y_hi, _ = rqs.rqs_forward(jnp.float32(2.0), w, h, s, -2.0)
        np.testing.assert_allclose(y_lo, -2.0, atol=1e-5)
        np.testing.assert_allclose(y_hi, 2.0, atol=1e-5)

    def test_batched_params_per_element(self):
        # Each element can have its own spline (the MAF/coupling use case).
        w, h, s = make_params(jax.random.PRNGKey(6), (16, 3))
        x = jax.random.uniform(jax.random.PRNGKey(7), (16, 3),
                               minval=-1.9, maxval=1.9)
        y, fldj = rqs.rqs_forward(x, w, h, s, -2.0)
        assert y.shape == (16, 3) and fldj.shape == (16, 3)
        x2, _ = rqs.rqs_inverse(y, w, h, s, -2.0)
        np.testing.assert_allclose(x2, x, atol=1e-5)

    def test_bijector_struct_is_pytree(self):
        w, h, s = make_params(jax.random.PRNGKey(8), (4,))
        bij = RationalQuadraticSpline(w, h, s, range_min=-2.0)
        leaves = jax.tree_util.tree_leaves(bij)
        assert len(leaves) == 3

        @jax.jit
        def apply(bij, x):
            return bij.forward_and_log_det(x)

        y, ldj = apply(bij, jnp.zeros(4))
        assert y.shape == (4,)

    def test_gradients_wrt_params_finite(self):
        def loss(raw):
            total = 4.0
            w = jax.nn.softmax(raw[:8]) * (total - 8 * 1e-2) + 1e-2
            h = jax.nn.softmax(raw[8:16]) * (total - 8 * 1e-2) + 1e-2
            s = jax.nn.softplus(raw[16:]) + 1e-2
            x = jnp.linspace(-1.5, 1.5, 11)
            y, ldj = rqs.rqs_forward(x, w, h, s, -2.0)
            return jnp.sum(y) + jnp.sum(ldj)

        g = jax.grad(loss)(jnp.linspace(-1, 1, 23))
        assert jnp.all(jnp.isfinite(g))
