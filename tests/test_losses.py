"""Loss tests vs analytic values (mirrors reference test_losses.py:
offset Gaussians with known KL=1, weight scaling, reverse==forward
with swapped args)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu import losses
from vaemolsim_tpu.ops import distributions as d


@pytest.fixture
def gaussian_pair():
    # KL(a||b) = 1 for unit scales and sqrt(2) offset.
    a = d.Independent(d.Normal(jnp.zeros(2), jnp.ones(2)), 1)
    b = d.Independent(d.Normal(jnp.full(2, jnp.sqrt(1.0)), jnp.ones(2)), 1)
    return a, b


def test_log_prob_loss(normal_dist, normal_sample):
    loss = losses.LogProbLoss()
    want = -jnp.mean(normal_dist.log_prob(normal_sample))
    np.testing.assert_allclose(loss(normal_sample, normal_dist), want,
                               rtol=1e-6)


def test_potential_energy_log_prob_loss():
    dist = d.Independent(d.Normal(jnp.zeros((8, 2)), jnp.ones((8, 2))), 1)
    pot = lambda x: jnp.sum(x ** 2, axis=-1)
    loss = losses.PotentialEnergyLogProbLoss(pot)
    s = dist.sample(jax.random.PRNGKey(0))
    want = jnp.mean(pot(s) - dist.log_prob(s))
    np.testing.assert_allclose(loss(dist, samples=s), want, rtol=1e-6)
    # Sampling path with a key.
    val = loss(dist, key=jax.random.PRNGKey(1))
    assert np.isfinite(float(val))


def test_non_regularizer(gaussian_pair):
    a, b = gaussian_pair
    assert float(losses.NonRegularizer()(a, b)) == 0.0


def test_kl_estimate_matches_analytic():
    # Offset sqrt(2), unit scales -> KL = 1 per event (reference
    # test_losses.py:55-70 uses the same construction).
    a = d.Independent(d.Normal(jnp.zeros((4096, 1)), jnp.ones((4096, 1))), 1)
    b = d.Independent(d.Normal(jnp.full((4096, 1), np.sqrt(2.0)),
                               jnp.ones((4096, 1))), 1)
    reg = losses.KLDivergenceEstimate()
    val = reg(a, b, key=jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(val), 1.0, atol=0.1)


def test_weight_scaling(gaussian_pair):
    a, b = gaussian_pair
    s = a.sample(jax.random.PRNGKey(0), (64,))
    r1 = losses.KLDivergenceEstimate(weight=1.0)(a, b, samples=s)
    r5 = losses.KLDivergenceEstimate(weight=5.0)(a, b, samples=s)
    np.testing.assert_allclose(5.0 * r1, r5, rtol=1e-6)


def test_log_prob_regularizer(gaussian_pair):
    a, b = gaussian_pair
    s = a.sample(jax.random.PRNGKey(0), (64,))
    val = losses.LogProbRegularizer()(a, b, samples=s)
    np.testing.assert_allclose(val, -jnp.mean(b.log_prob(s)), rtol=1e-6)


def test_reverse_kl_equals_forward_with_swapped_args():
    # Reference test_losses.py:87-95.
    a = d.Independent(d.Normal(jnp.zeros((512, 1)), jnp.ones((512, 1))), 1)
    b = d.Independent(d.Normal(jnp.full((512, 1), 0.7),
                               0.5 * jnp.ones((512, 1))), 1)
    key = jax.random.PRNGKey(0)
    rev = losses.ReverseKLDivergenceEstimate()(a, b, key=key)
    fwd_swapped = losses.KLDivergenceEstimate()(b, a, key=key)
    np.testing.assert_allclose(float(rev), float(fwd_swapped), rtol=1e-5)


def test_sample_dist_validation():
    with pytest.raises(ValueError):
        losses.KLDivergenceEstimate(sample_dist="nope")


def test_missing_key_raises(gaussian_pair):
    a, b = gaussian_pair
    with pytest.raises(ValueError):
        losses.KLDivergenceEstimate()(a, b)
