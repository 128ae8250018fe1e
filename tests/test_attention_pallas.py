"""Fused pair-grid attention kernel (ops/attention_pallas.py) vs the
XLA path — interpret-mode parity on CPU (the compiled kernel is
golden-checked on chip by the perf study in docs/performance.md; it
measured SLOWER and stays an optional backend, so these tests guard
the algorithm, not the default path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu.nn.attention import VectorAttention, _va_fused_impl
from vaemolsim_tpu.ops import attention_pallas as ap


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.normal(size=(4, 6, 3)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(4, 6, 5)), jnp.float32)
    mask = jnp.asarray(rng.random((4, 6)) > 0.3)
    return c, v, mask


@pytest.mark.parametrize("reduce", [False, True])
@pytest.mark.parametrize("masked", [True, False])
def test_interpret_parity(cloud, reduce, masked):
    c, v, mask = cloud
    attn = VectorAttention.create(jax.random.PRNGKey(1), 5, 7,
                                  hidden_dim=16, reduce=reduce)
    m = mask if masked else None
    want = attn._xla_call(c, v, m)
    mf = (mask.astype(jnp.float32) if masked
          else jnp.ones((4, 6), jnp.float32))
    got = _va_fused_impl(attn, c, v, mf, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_fully_masked_row_and_cloud(cloud):
    c, v, _ = cloud
    attn = VectorAttention.create(jax.random.PRNGKey(2), 5, 7,
                                  hidden_dim=16)
    mask = jnp.asarray([[1, 1, 0, 0, 0, 0]] * 3
                       + [[0, 0, 0, 0, 0, 0]], bool)
    want = attn._xla_call(c, v, mask)
    got = _va_fused_impl(attn, c, v, mask.astype(jnp.float32),
                         interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    # the all-masked cloud emits exact zeros on both paths
    assert float(jnp.max(jnp.abs(got[3]))) == 0.0


def test_toggle_is_tpu_only_and_default_off():
    assert not ap.use_attention_pallas()
    ap.set_attention_pallas(True)
    try:
        # CPU backend in tests -> still routes XLA
        assert not ap.use_attention_pallas()
    finally:
        ap.set_attention_pallas(False)


def test_gradients_route_through_xla_recompute(cloud):
    """custom_vjp: gradient of the fused call == gradient of the XLA
    path (recomputation), in interpret mode via the impl directly."""
    c, v, mask = cloud
    attn = VectorAttention.create(jax.random.PRNGKey(3), 5, 7,
                                  hidden_dim=16)
    mf = mask.astype(jnp.float32)
    from vaemolsim_tpu.nn.attention import _va_fused

    g1 = jax.grad(lambda vv: jnp.sum(
        _va_fused(attn, c, vv, mf) ** 2))(v)
    g2 = jax.grad(lambda vv: jnp.sum(
        attn._xla_call(c, vv, mask) ** 2))(v)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)
