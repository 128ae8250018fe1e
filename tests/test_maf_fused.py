"""Fused MAF-block Pallas kernel: exactness vs the XLA path.

The kernel (ops/maf_fused.py) must be golden-exact against the default
implementation — same merged weights, same activations, same RQS math —
for density (inverse), sampling (forward fixed point), conditional
context, gradients, and non-tile-aligned batch sizes.  Runs in Pallas
interpret mode on the CPU mesh; the compiled path is exercised on TPU by
bench.py with `flows.set_maf_fused(True)`.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu.flows import spline_flows as sf
from vaemolsim_tpu.ops import maf_fused


def make_layer(key, D, K=8, hidden=32, conditional=False, cond_dim=None,
               bin_range=(-4.0, 4.0)):
    cond = sf.MaskedSplineConditioner.create(
        key, D, bin_range=bin_range, num_bins=K, hidden_dim=hidden,
        conditional=conditional, conditional_event_shape=cond_dim,
        input_order="left-to-right")
    return sf.MAFLayer(cond)


def fused_args(layer, ctx):
    k1, b1, k2, b2, c1, c2 = layer.conditioner.merged_params()
    if ctx is not None:
        return (k1, b1, k2, b2, c1, c2)
    return (k1, b1, k2, b2)


def run_fused(layer, y, ctx, inverse):
    cond = layer.conditioner
    fn = (maf_fused.maf_block_inverse_fused if inverse
          else maf_fused.maf_block_forward_fused)
    return fn(y, fused_args(layer, ctx), ctx, cond.w_net.event_size,
              cond.num_bins, cond.bin_min, cond.bin_max, jnp.float32,
              True)  # interpret mode on CPU


@pytest.mark.parametrize("D", [1, 3])
def test_inverse_matches_xla(D):
    layer = make_layer(jax.random.PRNGKey(0), D)
    y = jax.random.normal(jax.random.PRNGKey(1), (64, D)) * 2.5
    want_x, want_ldj = layer.inverse_and_log_det(y)
    got_x, got_ldj = run_fused(layer, y, None, inverse=True)
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(want_x),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_ldj), np.asarray(want_ldj),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("D", [1, 3])
def test_forward_matches_xla(D):
    layer = make_layer(jax.random.PRNGKey(2), D)
    x = jax.random.normal(jax.random.PRNGKey(3), (48, D)) * 2.0
    want_y, want_ldj = layer.forward_and_log_det(x)
    got_y, got_ldj = run_fused(layer, x, None, inverse=False)
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_ldj), np.asarray(want_ldj),
                               atol=1e-5, rtol=1e-5)


def test_forward_inverse_roundtrip():
    layer = make_layer(jax.random.PRNGKey(4), 2)
    x = jax.random.normal(jax.random.PRNGKey(5), (32, 2))
    y, ldj = run_fused(layer, x, None, inverse=False)
    x2, ildj = run_fused(layer, y, None, inverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ldj + ildj),
                               np.zeros(32), atol=1e-4)


def test_conditional_matches_xla():
    layer = make_layer(jax.random.PRNGKey(6), 3, conditional=True,
                       cond_dim=5)
    y = jax.random.normal(jax.random.PRNGKey(7), (40, 3)) * 2.0
    ctx = jax.random.normal(jax.random.PRNGKey(8), (40, 5))
    want_x, want_ldj = layer.inverse_and_log_det(y, context=ctx)
    got_x, got_ldj = run_fused(layer, y, ctx, inverse=True)
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(want_x),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_ldj), np.asarray(want_ldj),
                               atol=1e-5, rtol=1e-5)


def test_identity_tails():
    """Out-of-range inputs pass through with zero log-det (the RQS
    identity-tail contract)."""
    layer = make_layer(jax.random.PRNGKey(9), 1, bin_range=(-2.0, 2.0))
    y = jnp.asarray([[-9.0], [9.0], [50.0]])
    x, ldj = run_fused(layer, y, None, inverse=True)
    np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ldj), np.zeros(3), atol=1e-6)


def test_non_tile_aligned_batch():
    layer = make_layer(jax.random.PRNGKey(10), 2)
    y = jax.random.normal(jax.random.PRNGKey(11), (777, 2)) * 2.0
    want_x, want_ldj = layer.inverse_and_log_det(y)
    got_x, got_ldj = run_fused(layer, y, None, inverse=True)
    assert got_x.shape == (777, 2) and got_ldj.shape == (777,)
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(want_x),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_ldj), np.asarray(want_ldj),
                               atol=1e-5, rtol=1e-5)


def test_gradients_match_xla_path():
    """custom_vjp backward (recompute through XLA) equals the default
    path's gradients for both the input and the merged weights."""
    layer = make_layer(jax.random.PRNGKey(12), 2)
    y = jax.random.normal(jax.random.PRNGKey(13), (16, 2)) * 1.5
    params = fused_args(layer, None)

    def loss_fused(y, params):
        x, ldj = maf_fused.maf_block_inverse_fused(
            y, params, None, 2, 8, -4.0, 4.0, jnp.float32, True)
        return jnp.sum(x ** 2) + jnp.sum(ldj)

    def loss_ref(y, params):
        x, ldj = maf_fused._xla_reference(
            y, params, None, 2, 8, -4.0, 4.0, True, jnp.float32)
        return jnp.sum(x ** 2) + jnp.sum(ldj)

    gy1, gp1 = jax.grad(loss_fused, argnums=(0, 1))(y, params)
    gy2, gp2 = jax.grad(loss_ref, argnums=(0, 1))(y, params)
    np.testing.assert_allclose(np.asarray(gy1), np.asarray(gy2),
                               atol=1e-5, rtol=1e-5)
    for a, b in zip(gp1, gp2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_flag_off_by_default_and_cpu_fallback():
    assert not sf.maf_fused_enabled()
    sf.set_maf_fused(True)
    try:
        layer = make_layer(jax.random.PRNGKey(14), 2)
        y = jax.random.normal(jax.random.PRNGKey(15), (8, 2))
        # On the CPU mesh the layer must silently take the XLA path.
        x, ldj = layer.inverse_and_log_det(y)
        assert x.shape == (8, 2) and ldj.shape == (8,)
    finally:
        sf.set_maf_fused(False)
