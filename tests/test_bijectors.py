"""Bijector round trips, log-det correctness (vs autodiff), domain
transform semantics (mirrors reference test_flows.py:15-31)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu.ops import bijectors as b
from vaemolsim_tpu.ops import distributions as d


def _check_scalar_bijector(bij, x, atol=1e-4):
    """Round trip + elementwise log-det against autodiff."""
    y, fldj = bij.forward_and_log_det(x)
    x2, ildj = bij.inverse_and_log_det(y)
    np.testing.assert_allclose(x2, x, atol=atol, rtol=1e-4)
    np.testing.assert_allclose(fldj, -ildj, atol=atol, rtol=1e-4)
    # Autodiff check of forward log-det (scalar bijectors are elementwise).
    grad = jax.vmap(jax.grad(lambda t: bij.forward(t.reshape(())).reshape(())))(
        x.reshape(-1))
    np.testing.assert_allclose(fldj.reshape(-1), jnp.log(jnp.abs(grad)),
                               atol=atol, rtol=1e-4)


@pytest.mark.parametrize("bij,x", [
    (b.Shift(jnp.float32(1.5)), jnp.linspace(-2, 2, 9)),
    (b.Scale(jnp.float32(-2.5)), jnp.linspace(-2, 2, 9)),
    (b.Sigmoid(), jnp.linspace(-3, 3, 9)),
    (b.Tanh(), jnp.linspace(-2, 2, 9)),
    (b.Softplus(), jnp.linspace(-2, 3, 9)),
    (b.SoftClip(low=0.5, high=4.0), jnp.linspace(-3, 3, 9)),
])
def test_scalar_bijectors(bij, x):
    _check_scalar_bijector(bij, x)


def test_softclip_bounds():
    bij = b.SoftClip(low=1e-7, high=100.0)
    y = bij.forward(jnp.linspace(-50, 50, 101))
    # Float32 sigmoid saturates at the extremes, so bounds are closed.
    assert jnp.all(y >= 1e-7) and jnp.all(y <= 100.0)


def test_chain_order():
    # tfp.Chain applies last bijector first.
    chain = b.Chain((b.Shift(jnp.float32(1.0)), b.Scale(jnp.float32(2.0))))
    np.testing.assert_allclose(chain.forward(jnp.float32(3.0)), 7.0)
    np.testing.assert_allclose(chain.inverse(jnp.float32(7.0)), 3.0)


def test_domain_transform_roundtrip():
    # Reference semantics (vaemolsim/flows.py:15-60): map per-DOF domains
    # onto a common target interval.
    domains = [(-np.pi, np.pi), (0.0, 5.0), (-1.0, 3.0)]
    bij = b.make_domain_transform(domains, target=(-1.0, 1.0))
    x = jnp.array([[-np.pi, 0.0, -1.0], [np.pi, 5.0, 3.0], [0.0, 2.5, 1.0]],
                  dtype=jnp.float32)
    y = bij.forward(x)
    np.testing.assert_allclose(y[0], [-1.0, -1.0, -1.0], atol=1e-6)
    np.testing.assert_allclose(y[1], [1.0, 1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(y[2], [0.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(bij.inverse(y), x, atol=1e-5)


def test_block_sums_event_axis():
    bij = b.Block(b.Scale(jnp.float32(2.0)), 1)
    x = jnp.ones((3, 4))
    y, ldj = bij.forward_and_log_det(x)
    assert ldj.shape == (3,)
    np.testing.assert_allclose(ldj, 4 * np.log(2.0), rtol=1e-6)


class TestBatchNormBijector:

    def _bij(self, use_batch_stats):
        return b.BatchNormBijector(
            mean=jnp.array([1.0, -1.0]),
            var=jnp.array([4.0, 0.25]),
            log_gamma=jnp.array([0.1, -0.2]),
            beta=jnp.array([0.3, 0.0]),
            use_batch_stats=use_batch_stats,
        )

    def test_eval_roundtrip(self):
        bij = self._bij(False)
        y = jnp.array([[0.5, 1.5], [-2.0, 0.1], [3.0, -1.0]])
        x, ildj = bij.inverse_and_log_det(y)
        y2, fldj = bij.forward_and_log_det(x)
        np.testing.assert_allclose(y2, y, atol=1e-5)
        np.testing.assert_allclose(fldj, -ildj, atol=1e-5)

    def test_training_flag_changes_output(self):
        # Mirrors reference test_flows.py:178-196: the training flag must
        # actually change behavior.
        y = jax.random.normal(jax.random.PRNGKey(0), (32, 2)) * 3.0 + 1.0
        x_eval, _ = self._bij(False).inverse_and_log_det(y)
        x_train, _ = self._bij(True).inverse_and_log_det(y)
        assert not np.allclose(x_eval, x_train)

    def test_batch_stats_normalize(self):
        y = jax.random.normal(jax.random.PRNGKey(0), (4096, 2)) * 3.0 + 1.0
        bij = self._bij(True)
        x, _, m, v = bij.inverse_and_log_det_and_moments(y)
        np.testing.assert_allclose(m, jnp.mean(y, 0), rtol=1e-5)
        # Normalized output has mean beta, std exp(log_gamma).
        np.testing.assert_allclose(jnp.mean(x, 0), bij.beta, atol=1e-5)
        np.testing.assert_allclose(jnp.std(x, 0), jnp.exp(bij.log_gamma),
                                   rtol=1e-3)


def test_transformed_distribution_log_prob_change_of_variables():
    base = d.Independent(d.Normal(jnp.zeros(3), jnp.ones(3)), 1)
    bij = b.Block(b.Chain((b.Shift(jnp.float32(2.0)), b.Scale(jnp.float32(3.0)))), 1)
    td = d.TransformedDistribution(base, bij)
    y = jnp.array([[2.0, 5.0, -1.0]])
    x = (y - 2.0) / 3.0
    want = base.log_prob(x) - 3 * np.log(3.0)
    np.testing.assert_allclose(td.log_prob(y), want, rtol=1e-6)
    s, lp = td.sample_and_log_prob(jax.random.PRNGKey(0), (100,))
    np.testing.assert_allclose(lp, td.log_prob(s), rtol=1e-4, atol=1e-5)


def test_softclip_inverse_out_of_domain_is_nan():
    """The codomain is (low, high); inverting an impossible y must
    return NaN, not a silently wrong value."""
    from vaemolsim_tpu.ops.bijectors import SoftClip

    sc = SoftClip(low=0.0, high=5.0)
    x, _ = sc.inverse_and_log_det(jnp.asarray([2.5, 20.0, -3.0, 5.0]))
    assert bool(jnp.isfinite(x[0]))
    assert bool(jnp.all(jnp.isnan(x[1:])))
