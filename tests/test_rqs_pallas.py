"""Pallas RQS kernel vs the XLA reference path (interpret mode on CPU;
the same kernel compiles for TPU via Mosaic)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu.ops import rqs as rqs_xla
from vaemolsim_tpu.ops.rqs_pallas import (rqs_forward_pallas,
                                          rqs_inverse_pallas)
from tests.test_rqs import make_params


@pytest.mark.parametrize("inverse", [False, True])
def test_matches_xla_path(inverse):
    w, h, s = make_params(jax.random.PRNGKey(0), (1000,), num_bins=16)
    x = jnp.linspace(-2.5, 2.5, 1000)  # includes out-of-range tails
    if inverse:
        got = rqs_inverse_pallas(x, w, h, s, -2.0, True)
        want = rqs_xla.rqs_inverse(x, w, h, s, -2.0)
    else:
        got = rqs_forward_pallas(x, w, h, s, -2.0, True)
        want = rqs_xla.rqs_forward(x, w, h, s, -2.0)
    # Knot positions come from a matmul prefix-sum in the kernel vs
    # cumsum in XLA: float32 rounding can flip a bin assignment exactly
    # at a knot, where the spline is continuous — tolerance reflects that.
    np.testing.assert_allclose(got[0], want[0], atol=5e-4)
    np.testing.assert_allclose(got[1], want[1], atol=5e-3)


def test_multi_dof_shape():
    w, h, s = make_params(jax.random.PRNGKey(1), (300, 3), num_bins=8)
    x = jax.random.uniform(jax.random.PRNGKey(2), (300, 3), minval=-1.9,
                           maxval=1.9)
    y, ldj = rqs_forward_pallas(x, w, h, s, -2.0, True)
    assert y.shape == (300, 3) and ldj.shape == (300, 3)
    want_y, want_l = rqs_xla.rqs_forward(x, w, h, s, -2.0)
    np.testing.assert_allclose(y, want_y, atol=1e-5)
    np.testing.assert_allclose(ldj, want_l, atol=1e-4)


def test_non_tile_multiple_padding():
    # N=77 is far from the 512 tile; padding must not corrupt results.
    w, h, s = make_params(jax.random.PRNGKey(3), (77,), num_bins=8)
    x = jnp.linspace(-1.5, 1.5, 77)
    y, _ = rqs_forward_pallas(x, w, h, s, -2.0, True)
    want, _ = rqs_xla.rqs_forward(x, w, h, s, -2.0)
    np.testing.assert_allclose(y, want, atol=1e-5)


def test_gradients_match_xla():
    w, h, s = make_params(jax.random.PRNGKey(4), (128,), num_bins=8)
    x = jnp.linspace(-1.8, 1.8, 128)

    def loss_pallas(x, w, h, s):
        y, l = rqs_forward_pallas(x, w, h, s, -2.0, True)
        return jnp.sum(y * y) + jnp.sum(l)

    def loss_xla(x, w, h, s):
        y, l = rqs_xla.rqs_forward(x, w, h, s, -2.0)
        return jnp.sum(y * y) + jnp.sum(l)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(x, w, h, s)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(x, w, h, s)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


def test_grad_with_pallas_dispatch_active(monkeypatch):
    """The custom-vjp backward must call the PRIVATE XLA spline, not the
    dispatcher: with the pallas backend selected, dispatching inside the
    backward re-entered the pallas op's own vjp without bound."""
    from vaemolsim_tpu.ops import rqs
    from vaemolsim_tpu.ops.rqs_pallas import rqs_forward_pallas

    # Simulate the on-TPU dispatch state (interpret mode runs on CPU).
    monkeypatch.setattr(rqs, "_use_pallas", lambda: True)
    w, h, s = make_params(jax.random.PRNGKey(0), (8,))

    def loss(x):
        y, ldj = rqs_forward_pallas(x, w, h, s, -2.0, True)
        return jnp.sum(y) + jnp.sum(ldj)

    g = jax.grad(loss)(jnp.linspace(-1.0, 1.0, 8))
    assert bool(jnp.all(jnp.isfinite(g)))


def test_param_leading_batch_axes():
    """Parameters may carry MORE leading axes than x (public contract:
    score one configuration under a batch of parameter sets)."""
    from vaemolsim_tpu.ops import rqs
    from vaemolsim_tpu.ops.rqs_pallas import rqs_forward_pallas

    B, D = 3, 4
    w, h, s = make_params(jax.random.PRNGKey(0), (B, D))
    x = jnp.linspace(-1.0, 1.0, D)
    y_p, ldj_p = rqs_forward_pallas(x, w, h, s, -2.0, True)
    y_x, ldj_x = rqs._rqs_forward_xla(x, w, h, s, -2.0)
    assert y_p.shape == (B, D)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ldj_p), np.asarray(ldj_x),
                               rtol=1e-4, atol=1e-5)
