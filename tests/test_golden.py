"""Golden regression values: seeded end-to-end numbers pinned across
refactors (the cross-round stability net — catches silent numerics
drift the way the reference's "ELBO within 1e-3" target demands).

Values were produced by this framework on CPU float32 at the commit that
introduced them; tolerances allow cross-platform float32 variation.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vaemolsim_tpu.dists import IndependentBlockwise
from vaemolsim_tpu.flows import RQSSplineMAF, RQSSplineRealNVP
from vaemolsim_tpu.ops import distributions as d
from vaemolsim_tpu.ops import rqs


class TestGolden:

    def test_rqs_point_values(self):
        # Fixed spline: 4 equal bins on [-2, 2], slopes [0.5, 1.0, 2.0].
        w = jnp.full((4,), 1.0)
        h = jnp.full((4,), 1.0)
        s = jnp.array([0.5, 1.0, 2.0])
        y, ldj = rqs.rqs_forward(jnp.float32(0.5), w, h, s, -2.0)
        # Bin 2 (x in [0,1]), xi=0.5, d_k=1, d_k1=2, s=1:
        # y = 0 + (0.25 + 0.25)/(1 + 1*0.25) = 0.4
        np.testing.assert_allclose(float(y), 0.4, rtol=1e-6)
        # deriv = (2*0.25 + 2*0.25 + 1*0.25)/1.25^2 = 1.25/1.5625 = 0.8
        np.testing.assert_allclose(float(jnp.exp(ldj)), 0.8, rtol=1e-6)
        x_back, ildj = rqs.rqs_inverse(y, w, h, s, -2.0)
        np.testing.assert_allclose(float(x_back), 0.5, atol=1e-6)

    def test_seeded_maf_log_prob(self):
        flow = RQSSplineMAF.create(
            jax.random.PRNGKey(1234), 3, num_blocks=2,
            rqs_params={"num_bins": 8, "hidden_dim": 16,
                        "bin_range": [-4.0, 4.0]})
        base = d.Independent(d.Normal(jnp.zeros(3), jnp.ones(3)), 1)
        x = jnp.array([[0.5, -1.0, 1.5], [0.0, 0.0, 0.0]])
        lp = flow(base).log_prob(x)
        # Golden values from the introducing commit (CPU float32).
        np.testing.assert_allclose(
            np.asarray(lp), [-4.502405, -0.6436813], rtol=2e-4)

    def test_seeded_realnvp_log_prob(self):
        flow = RQSSplineRealNVP.create(
            jax.random.PRNGKey(99), 2, num_blocks=2,
            rqs_params={"num_bins": 8, "hidden_dim": 16,
                        "bin_range": [-4.0, 4.0]})
        base = d.Independent(d.Normal(jnp.zeros(2), jnp.ones(2)), 1)
        lp = flow(base).log_prob(jnp.array([[0.3, -0.7]]))
        np.testing.assert_allclose(np.asarray(lp), [-2.3424587], rtol=2e-4)

    def test_seeded_blockwise_log_prob(self):
        layer = IndependentBlockwise.create(
            3, ["normal", "von_mises", "normal"])
        raw = jnp.arange(7.0).reshape(1, 7) * 0.1
        lp = layer(raw).log_prob(jnp.array([[0.2, 1.0, -0.5]]))
        np.testing.assert_allclose(np.asarray(lp), [-3.2798212], rtol=2e-4)
