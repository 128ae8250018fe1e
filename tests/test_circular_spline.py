"""Circular (periodic) rational-quadratic splines: exact circle
diffeomorphism identities, seam-continuous densities, and torsion-flow
training where the linear spline's identity tails structurally fail."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu import train
from vaemolsim_tpu.flows import RQSSplineMAF, RQSSplineRealNVP
from vaemolsim_tpu.ops import distributions as d
from vaemolsim_tpu.ops.rqs import (RationalQuadraticSpline,
                                   rqs_forward_circular,
                                   rqs_inverse_circular)

PI = math.pi


def random_circular_params(key, K=8, batch=()):
    kw, kh, ks = jax.random.split(key, 3)
    P = 2 * PI
    w = jax.nn.softmax(jax.random.normal(kw, batch + (K,))) \
        * (P - K * 1e-2) + 1e-2
    h = jax.nn.softmax(jax.random.normal(kh, batch + (K,))) \
        * (P - K * 1e-2) + 1e-2
    s = jax.nn.softplus(jax.random.normal(ks, batch + (K,))) + 1e-2
    return w, h, s


class TestCircularKernel:

    def test_shift_equivariance(self):
        # f(x + 2 pi n) = f(x) + 2 pi n exactly (lifted circle map).
        w, h, s = random_circular_params(jax.random.PRNGKey(0))
        x = jnp.linspace(-PI, PI, 501)
        y0, l0 = rqs_forward_circular(x, w, h, s, -PI)
        for n in (-2, 1, 3):
            yn, ln = rqs_forward_circular(x + 2 * PI * n, w, h, s, -PI)
            np.testing.assert_allclose(np.asarray(yn - 2 * PI * n),
                                       np.asarray(y0), atol=1e-4)
            np.testing.assert_allclose(np.asarray(ln), np.asarray(l0),
                                       atol=1e-3)

    def test_round_trip_and_logdet(self):
        w, h, s = random_circular_params(jax.random.PRNGKey(1))
        x = jnp.linspace(-PI + 1e-4, PI - 1e-4, 1001)
        y, lf = rqs_forward_circular(x, w, h, s, -PI)
        xr, li = rqs_inverse_circular(y, w, h, s, -PI)
        np.testing.assert_allclose(np.asarray(xr), np.asarray(x),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(lf + li),
                                   np.zeros(1001), atol=1e-4)

    def test_logdet_matches_autodiff(self):
        w, h, s = random_circular_params(jax.random.PRNGKey(2))
        xs = jnp.linspace(-2.9, 2.9, 41)
        g = jax.vmap(jax.grad(
            lambda xx: rqs_forward_circular(xx, w, h, s, -PI)[0]))(xs)
        _, ldj = rqs_forward_circular(xs, w, h, s, -PI)
        np.testing.assert_allclose(np.asarray(jnp.log(g)),
                                   np.asarray(ldj), atol=1e-4)

    def test_pushforward_of_uniform_normalizes_and_is_periodic(self):
        w, h, s = random_circular_params(jax.random.PRNGKey(3))
        ygrid = jnp.linspace(-PI, PI, 4001)
        _, li = rqs_inverse_circular(ygrid, w, h, s, -PI)
        dens = np.exp(np.asarray(li)) / (2 * PI)
        z = np.trapezoid(dens, np.asarray(ygrid))
        assert abs(z - 1.0) < 1e-3
        # the density is continuous across the seam
        np.testing.assert_allclose(dens[0], dens[-1], rtol=1e-3)

    def test_bijector_class_dispatch(self):
        w, h, s = random_circular_params(jax.random.PRNGKey(4))
        bij = RationalQuadraticSpline(w, h, s, range_min=-PI,
                                      circular=True)
        x = jnp.array([-3.0, 0.1, 2.8])
        y, lf = bij.forward_and_log_det(x)
        xr, li = bij.inverse_and_log_det(y)
        np.testing.assert_allclose(np.asarray(xr), np.asarray(x),
                                   atol=1e-5)


class TestCircularFlows:

    @staticmethod
    def torsion_data(n=8192, key=0):
        # Bimodal torsion ensemble with a mode PINNED AT the seam +-pi —
        # the case where identity-tailed linear splines structurally
        # fail (their density need not match at -pi and pi).
        k1, k2 = jax.random.split(jax.random.PRNGKey(key))
        comp = jax.random.bernoulli(k1, 0.5, (n,))
        vm_seam = d.VonMises(loc=jnp.asarray(PI), concentration=4.0)
        vm_zero = d.VonMises(loc=jnp.asarray(-1.0), concentration=6.0)
        xs = jnp.where(comp, vm_seam.sample(k2, (n,)),
                       vm_zero.sample(jax.random.fold_in(k2, 1), (n,)))
        return xs[:, None]

    def _train(self, flow_kind, circular, key=0):
        data = self.torsion_data()
        base = d.Independent(
            d.Uniform(low=jnp.full((1,), -PI), high=jnp.full((1,), PI)),
            1)
        rqs_params = dict(bin_range=(-PI, PI), num_bins=16,
                          hidden_dim=32, circular=circular)
        if flow_kind == "realnvp":
            flow = RQSSplineRealNVP.create(jax.random.PRNGKey(key), 1,
                                           num_blocks=2,
                                           rqs_params=rqs_params)
        else:
            flow = RQSSplineMAF.create(jax.random.PRNGKey(key), 1,
                                       num_blocks=2,
                                       rqs_params=rqs_params)

        def loss(f, batch, k):
            return -jnp.mean(f(base, train=True).log_prob(batch))

        flow, hist = train.fit(flow, loss, data,
                               key=jax.random.PRNGKey(key + 1),
                               num_epochs=40, batch_size=1024,
                               learning_rate=3e-3, scan_epochs=True)
        dist = flow(base)
        return flow, dist, hist

    @pytest.mark.parametrize("kind", ["realnvp", "maf"])
    def test_circular_flow_learns_seam_mode(self, kind):
        flow, dist, hist = self._train(kind, circular=True)
        assert hist["loss"][-1] < hist["loss"][0]
        # density continuous across the seam (circular guarantee)
        eps = 1e-3
        lp = dist.log_prob(jnp.array([[-PI + eps], [PI - eps]]))
        np.testing.assert_allclose(float(lp[0]), float(lp[1]),
                                   atol=0.05)
        # the seam mode is SEEN: density at +-pi well above the trough
        lp_seam = float(dist.log_prob(jnp.array([[PI - 1e-3]]))[0])
        lp_trough = float(dist.log_prob(jnp.array([[2.0]]))[0])
        assert lp_seam > lp_trough + 0.5

    def test_circular_beats_linear_at_the_seam(self):
        # The linear spline's boundary derivatives are pinned to 1, so
        # over a uniform base its density at +-pi is FROZEN at
        # 1/(2 pi) — it cannot represent the seam mode's elevated
        # density there.  The circular spline's free seam derivative
        # can.  True mixture density at pi: 0.5 * vm(pi | pi, 4).
        import scipy.special as sp
        _, dist_c, _ = self._train("maf", circular=True)
        _, dist_l, _ = self._train("maf", circular=False)
        eps = 1e-3
        lp_c = float(dist_c.log_prob(jnp.array([[PI - eps]]))[0])
        lp_l = float(dist_l.log_prob(jnp.array([[PI - eps]]))[0])
        lp_true = float(np.log(
            0.5 * np.exp(4.0) / (2 * np.pi * sp.i0(4.0))))
        uniform_level = float(np.log(1.0 / (2 * np.pi)))
        # linear is pinched toward the uniform level at the boundary;
        # circular tracks the true seam density
        assert abs(lp_c - lp_true) < 0.25, (lp_c, lp_true)
        assert lp_c > lp_l + 0.3, (lp_c, lp_l)
        assert abs(lp_l - uniform_level) < 0.5, (lp_l, uniform_level)

    def test_sampling_round_trip(self):
        _, dist, _ = self._train("maf", circular=True, key=3)
        xs, lp = dist.sample_and_log_prob(jax.random.PRNGKey(9), (512,))
        assert np.all(np.isfinite(np.asarray(lp)))
        lp2 = dist.log_prob(xs)
        np.testing.assert_allclose(np.asarray(lp2), np.asarray(lp),
                                   atol=2e-3)
        # samples live on the circle
        assert float(jnp.max(jnp.abs(xs))) <= PI + 1e-4
