"""DiffTRe (difftre.py): exactness of the reweighted estimator and its
gradient (the fluctuation identity), ESS semantics, and the end-to-end
claim — potential parameters recovered from ensemble observables
without differentiating through the sampler.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vaemolsim_tpu import extrapolation
from vaemolsim_tpu.difftre import (difftre_fit, difftre_loss,
                                   reweighted_observables,
                                   static_observable)

BETA = 1.0


def harmonic(params, x):
    """U = 0.5 k sum x^2 over the event axis; params = log k."""
    return 0.5 * jnp.exp(params) * jnp.sum(x ** 2, axis=-1)


def gaussian_frames(k, key, n=4096, d=1):
    return jnp.sqrt(1.0 / (BETA * k)) * jax.random.normal(key, (n, d))


class TestReweightedObservables:

    def test_uniform_weights_at_reference(self):
        x = gaussian_frames(1.0, jax.random.PRNGKey(0))
        u_ref = harmonic(0.0, x)
        obs = {"x2": lambda p, f: jnp.sum(f ** 2, axis=-1)}
        est, ess = reweighted_observables(harmonic, 0.0, x, u_ref,
                                          BETA, obs)
        np.testing.assert_allclose(float(est["x2"]),
                                   float(jnp.mean(jnp.sum(x**2, -1))),
                                   rtol=1e-6)
        np.testing.assert_allclose(float(ess), x.shape[0], rtol=1e-5)

    def test_matches_beta_reweight(self):
        """U_theta = theta * u0: reweighting in theta IS reweighting in
        beta — cross-check against extrapolation.beta_reweight."""
        x = gaussian_frames(1.0, jax.random.PRNGKey(1))
        u0 = jnp.sum(x ** 2, axis=-1)

        def pot(theta, f):
            return theta * jnp.sum(f ** 2, axis=-1)

        theta0, theta1 = 0.5, 0.65
        a = jnp.sum(x ** 2, axis=-1)
        est, ess = reweighted_observables(
            pot, theta1, x, pot(theta0, x), BETA,
            (lambda p, f: jnp.sum(f ** 2, axis=-1),))
        want, want_ess = extrapolation.beta_reweight(
            a, u0, BETA * theta0, BETA * theta1)
        np.testing.assert_allclose(float(est[0]), float(want),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(ess), float(want_ess),
                                   rtol=1e-5)

    def test_gradient_is_the_fluctuation_identity(self):
        """At params = params_ref,
        d<O>/dtheta = <dO/dtheta> - beta Cov(O, dU/dtheta) EXACTLY on
        the finite sample — including the explicit dO/dtheta term."""
        x = gaussian_frames(1.3, jax.random.PRNGKey(2), n=512)
        th0 = jnp.asarray(0.26)  # log k
        u_ref = harmonic(th0, x)

        # O depends on theta explicitly: O = exp(theta) * x^2.
        def obs(p, f):
            return jnp.exp(p) * jnp.sum(f ** 2, axis=-1)

        def estimate(p):
            est, _ = reweighted_observables(harmonic, p, x, u_ref,
                                            BETA, (obs,))
            return est[0]

        got = jax.grad(estimate)(th0)
        o = obs(th0, x)
        du = jax.vmap(jax.grad(harmonic), in_axes=(None, 0))(th0, x)
        do = jax.vmap(jax.grad(obs), in_axes=(None, 0))(th0, x)
        want = (jnp.mean(do)
                - BETA * (jnp.mean(o * du) - jnp.mean(o) * jnp.mean(du)))
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    def test_ess_decays_away_from_reference(self):
        x = gaussian_frames(1.0, jax.random.PRNGKey(3))
        u_ref = harmonic(0.0, x)
        obs = (lambda p, f: jnp.sum(f ** 2, axis=-1),)
        _, ess0 = reweighted_observables(harmonic, 0.0, x, u_ref,
                                         BETA, obs)
        _, ess1 = reweighted_observables(harmonic, 0.4, x, u_ref,
                                         BETA, obs)
        _, ess2 = reweighted_observables(harmonic, 0.8, x, u_ref,
                                         BETA, obs)
        assert float(ess0) > float(ess1) > float(ess2)

    def test_loss_weights_scale_terms(self):
        x = gaussian_frames(1.0, jax.random.PRNGKey(4))
        u_ref = harmonic(0.0, x)
        obs = {"a": lambda p, f: jnp.sum(f ** 2, axis=-1),
               "b": lambda p, f: f[:, 0]}
        tgt = {"a": 2.0, "b": 1.0}
        l1, _ = difftre_loss(harmonic, 0.0, x, u_ref, BETA, obs, tgt,
                             weights={"a": 1.0, "b": 0.0})
        l2, _ = difftre_loss(harmonic, 0.0, x, u_ref, BETA, obs, tgt,
                             weights={"a": 2.0, "b": 0.0})
        np.testing.assert_allclose(2 * float(l1), float(l2), rtol=1e-6)


class TestDiffTReFit:

    def test_recovers_harmonic_stiffness(self):
        """Fit log k so that <x^2> matches the analytic value at
        k* = 2.5; the sampler is an exact Gaussian draw at the CURRENT
        k (stands in for MD — fresh every outer round)."""
        k_star = 2.5
        target = 1.0 / (BETA * k_star)

        def sample_fn(params, key, state):
            return gaussian_frames(jnp.exp(params), key, n=4096), None

        res = difftre_fit(
            harmonic, jnp.asarray(0.0),
            sample_fn=sample_fn,
            observable_fns={"x2": lambda p, f: jnp.sum(f ** 2, -1)},
            targets={"x2": target},
            beta=BETA, key=jax.random.PRNGKey(5),
            n_outer=8, inner_steps=40, learning_rate=0.05)
        k_fit = float(jnp.exp(res.params))
        assert abs(k_fit - k_star) / k_star < 0.05, k_fit
        # Fresh-trajectory losses decrease over the run.
        assert res.history["loss"][-1] < 0.05 * res.history["loss"][0]

    def test_ess_floor_stops_the_inner_loop(self):
        """A large learning rate drives the params away from the
        reference fast: the ESS floor must cut the inner phase short
        of the step cap, and the recorded ESS must sit at/below the
        floor it tripped."""
        def sample_fn(params, key, state):
            return gaussian_frames(jnp.exp(params), key, n=256), None

        res = difftre_fit(
            harmonic, jnp.asarray(0.0),
            sample_fn=sample_fn,
            observable_fns=(lambda p, f: jnp.sum(f ** 2, -1),),
            targets=(0.05,),   # far target => big sustained gradients
            beta=BETA, key=jax.random.PRNGKey(6),
            n_outer=2, inner_steps=500, ess_frac=0.9,
            learning_rate=0.3)
        assert res.history["inner_steps"][0] < 500
        assert res.history["ess_end"][0] < 0.9 * 256 + 1.0

    def test_warm_start_state_threads_through(self):
        seen = []

        def sample_fn(params, key, state):
            seen.append(state)
            return gaussian_frames(jnp.exp(params), key, n=128), (
                0 if state is None else state + 1)

        difftre_fit(
            harmonic, jnp.asarray(0.0), sample_fn=sample_fn,
            observable_fns=(lambda p, f: jnp.sum(f ** 2, -1),),
            targets=(1.0,), beta=BETA, key=jax.random.PRNGKey(7),
            n_outer=3, inner_steps=2)
        assert seen == [None, 0, 1]

    def test_static_observable_matches_dynamic(self):
        """A parameter-independent observable marked static (cached per
        trajectory) must give the same fit as the plain dynamic form,
        and the wrapper must compose with reweighted_observables."""
        def sample_fn(params, key, state):
            return gaussian_frames(jnp.exp(params), key, n=1024), None

        def run(obs):
            return difftre_fit(
                harmonic, jnp.asarray(0.0), sample_fn=sample_fn,
                observable_fns={"x2": obs}, targets={"x2": 0.5},
                beta=BETA, key=jax.random.PRNGKey(9),
                n_outer=3, inner_steps=10, learning_rate=0.05)

        dyn = run(lambda p, f: jnp.sum(f ** 2, -1))
        sta = run(static_observable(lambda f: jnp.sum(f ** 2, -1)))
        np.testing.assert_allclose(float(sta.params), float(dyn.params),
                                   rtol=1e-6)
        x = gaussian_frames(1.0, jax.random.PRNGKey(10), n=64)
        est, _ = reweighted_observables(
            harmonic, 0.0, x, harmonic(0.0, x), BETA,
            (static_observable(lambda f: jnp.sum(f ** 2, -1)),))
        np.testing.assert_allclose(float(est[0]),
                                   float(jnp.mean(jnp.sum(x**2, -1))),
                                   rtol=1e-6)

    def test_vector_observable_and_pytree_params(self):
        """2-D anisotropic harmonic well, params = per-axis log k as a
        dict, observable = the per-axis second-moment VECTOR."""
        k_star = jnp.array([2.0, 0.5])

        def pot(params, f):
            k = jnp.exp(params["logk"])
            return 0.5 * jnp.sum(k * f ** 2, axis=-1)

        def sample_fn(params, key, state):
            k = jnp.exp(params["logk"])
            return (jax.random.normal(key, (4096, 2))
                    / jnp.sqrt(BETA * k)), None

        res = difftre_fit(
            pot, {"logk": jnp.zeros(2)}, sample_fn=sample_fn,
            observable_fns=(lambda p, f: f ** 2,),
            targets=(1.0 / (BETA * k_star),),
            beta=BETA, key=jax.random.PRNGKey(8),
            n_outer=8, inner_steps=40, learning_rate=0.05)
        k_fit = np.asarray(jnp.exp(res.params["logk"]))
        np.testing.assert_allclose(k_fit, np.asarray(k_star), rtol=0.07)
