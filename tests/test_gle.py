"""GLE colored-noise thermostat: fluctuation-dissipation exactness of
the OU propagator pair, white-noise reduction, equipartition under
strong memory, and custom stationary covariances."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu import gle


def harmonic(kspring=1.0):
    def pot(x):
        return 0.5 * kspring * jnp.sum(x * x, axis=(-2, -1))

    return pot


def zero_pot(x):
    return jnp.zeros(x.shape[:-2])


class TestMatrices:

    def test_propagator_pair_solves_fdt(self):
        """For an arbitrary stable A: T = expm(-A dt) and
        S S^T = C - T C T^T exactly (the discrete FDT)."""
        rng = np.random.default_rng(0)
        a = rng.normal(size=(3, 3))
        a = a @ a.T + 3 * np.eye(3)          # SPD -> stable
        kT, dt = 0.7, 0.13
        t, s = gle.gle_matrices(a, dt, kT)
        from scipy.linalg import expm
        np.testing.assert_allclose(t, expm(-a * dt), atol=1e-12)
        c = kT * np.eye(3)
        np.testing.assert_allclose(s @ s.T, c - t @ c @ t.T, atol=1e-12)

    def test_unstable_matrix_raises(self):
        with pytest.raises(ValueError, match="stable"):
            gle.gle_matrices(np.array([[-1.0]]), 0.1, 1.0)

    def test_shape_checks(self):
        with pytest.raises(ValueError, match="square"):
            gle.gle_matrices(np.zeros((2, 3)), 0.1, 1.0)
        with pytest.raises(ValueError, match="c_matrix"):
            gle.gle_matrices(np.eye(2), 0.1, 1.0,
                             c_matrix=np.eye(3))

    def test_exp_memory_total_friction(self):
        """integral K dt = gamma: A's memory channel carries exactly
        the requested total friction (a^2 tau = gamma)."""
        a = gle.exp_memory_matrix(2.5, 0.4)
        np.testing.assert_allclose(a[0, 1] ** 2 * 0.4, 2.5, rtol=1e-12)
        np.testing.assert_allclose(a[1, 0], -a[0, 1], rtol=1e-12)
        assert a[0, 0] == 0.0


class TestStationaryStatistics:

    def test_free_particle_joint_covariance_is_c(self):
        """The (p, s) stationary covariance equals C for a generic
        stable A — the sharpest end-to-end check of the exact O-step
        construction."""
        rng = np.random.default_rng(1)
        a = rng.normal(size=(3, 3))
        a = a @ a.T + 2 * np.eye(3)
        kT = 0.6
        x0 = jnp.zeros((2048, 1, 1))
        v0 = jnp.sqrt(kT) * jax.random.normal(jax.random.PRNGKey(0),
                                              x0.shape)
        out, traj = gle.gle_baoab(zero_pot, x0, v0,
                                  jax.random.PRNGKey(1), dt=0.05,
                                  n_steps=800, kT=kT, a_matrix=a,
                                  collect_every=80, collect_v=True)
        # Joint second moments at the final state (v mass-scaled with
        # m = 1; stationary from step 0 thanks to exact s0 draw).
        vec = np.concatenate([np.asarray(out.v)[..., None],
                              np.asarray(out.s)], axis=-1).reshape(-1, 3)
        cov = vec.T @ vec / vec.shape[0]
        np.testing.assert_allclose(cov, kT * np.eye(3), atol=0.06)

    def test_white_noise_reduction(self):
        """A = [[gamma]] samples the same harmonic statistics as plain
        BAOAB: <x^2> = kT/k, <v^2> = kT/m."""
        kT, ks = 0.5, 2.0
        x0 = jnp.zeros((1024, 1, 2))
        v0 = jnp.zeros_like(x0)
        out, traj = gle.gle_baoab(harmonic(ks), x0, v0,
                                  jax.random.PRNGKey(2), dt=0.05,
                                  n_steps=2000, kT=kT,
                                  a_matrix=gle.white_noise_matrix(1.0),
                                  collect_every=20)
        x2 = float(jnp.mean(traj[20:] ** 2))
        np.testing.assert_allclose(x2, kT / ks, rtol=0.05)
        v2 = float(jnp.mean(out.v ** 2))
        np.testing.assert_allclose(v2, kT, rtol=0.08)
        assert out.s.shape[-1] == 0               # no auxiliaries

    def test_memory_preserves_ensemble(self):
        """Strong exponential memory (tau ~ the oscillation period)
        changes DYNAMICS but still samples exp(-U/kT): equipartition
        holds in a harmonic well, with per-atom masses."""
        kT, ks = 0.4, 1.0
        masses = np.array([1.0, 4.0])
        x0 = jnp.zeros((512, 2, 2))
        v0 = jnp.zeros_like(x0)
        out, traj = jax.jit(lambda x, v, k: gle.gle_baoab(
            harmonic(ks), x, v, k, dt=0.05, n_steps=4000, kT=kT,
            a_matrix=gle.exp_memory_matrix(2.0, 3.0), masses=masses,
            collect_every=40))(x0, v0, jax.random.PRNGKey(3))
        x2 = np.asarray(jnp.mean(traj[25:] ** 2, axis=(0, 1, -1)))
        np.testing.assert_allclose(x2, kT / ks, rtol=0.08)
        v2 = np.asarray(jnp.mean(out.v ** 2, axis=(0, -1)))
        np.testing.assert_allclose(v2, kT / masses, rtol=0.12)

    def test_invalid_a_c_pair_refused(self):
        """An (A, C) pair with indefinite A C + C A^T has no noise
        matrix — must raise, not silently thermostat elsewhere."""
        with pytest.raises(ValueError, match="stationary OU pair"):
            gle.gle_matrices(gle.exp_memory_matrix(1.5, 0.5), 0.05,
                             1.0, c_matrix=np.diag([0.9, 0.3]))

    def test_custom_c_sets_stationary_covariance(self):
        """A non-classical C (the quantum-thermostat hook): the free
        particle's momentum variance lands on C_pp, not kT.  Valid
        pair: A = [[0, a], [-b, g]] with a C_ss = b C_pp makes
        A C + C A^T = diag(0, 2 g C_ss) >= 0."""
        a = np.array([[0.0, 3.0], [-1.0, 2.0]])
        c = np.diag([0.9, 0.3])                   # C_pp != C_ss
        x0 = jnp.zeros((4096, 1, 1))
        v0 = np.sqrt(0.9) * jax.random.normal(jax.random.PRNGKey(4),
                                              x0.shape)
        out, _ = gle.gle_baoab(zero_pot, x0, v0, jax.random.PRNGKey(5),
                               dt=0.05, n_steps=600, kT=1.0,
                               a_matrix=a, c_matrix=c)
        v2 = float(jnp.mean(out.v ** 2))
        s2 = float(jnp.mean(out.s ** 2))
        np.testing.assert_allclose(v2, 0.9, rtol=0.08)
        np.testing.assert_allclose(s2, 0.3, rtol=0.08)

    def test_memory_changes_dynamics(self):
        """Same total friction, same well: the long-memory VACF must
        differ measurably from white noise at intermediate lag — the
        non-Markovian signature."""
        kT, ks = 0.5, 1.0
        x0 = jnp.zeros((512, 1, 1))
        v0 = jnp.sqrt(kT) * jax.random.normal(jax.random.PRNGKey(6),
                                              x0.shape)

        def vacf(a_matrix, key):
            _, (xt, vt) = gle.gle_baoab(
                harmonic(ks), x0, v0, key, dt=0.05, n_steps=1200,
                kT=kT, a_matrix=a_matrix, collect_every=4,
                collect_v=True)
            v = np.asarray(vt)[50:, :, 0, 0]       # (T, R)
            c0 = np.mean(v * v)
            lag = 10                               # 2.0 time units
            cl = np.mean(v[:-lag] * v[lag:])
            return cl / c0

        c_white = vacf(gle.white_noise_matrix(2.0),
                       jax.random.PRNGKey(7))
        c_mem = vacf(gle.exp_memory_matrix(2.0, 5.0),
                     jax.random.PRNGKey(8))
        assert abs(c_mem - c_white) > 0.1, (c_mem, c_white)


class TestPlumbing:

    def test_collect_resume_and_validation(self):
        pot = harmonic(1.0)
        x0 = jnp.zeros((3, 1, 2))
        a = gle.exp_memory_matrix(1.0, 1.0)
        out, traj = gle.gle_baoab(pot, x0, jnp.zeros_like(x0),
                                  jax.random.PRNGKey(9), dt=0.01,
                                  n_steps=40, kT=1.0, a_matrix=a,
                                  collect_every=20)
        assert traj.shape == (2, 3, 1, 2)
        out2, _ = gle.gle_baoab(pot, out.x, out.v,
                                jax.random.PRNGKey(10), dt=0.01,
                                n_steps=10, kT=1.0, a_matrix=a,
                                s0=out.s)
        assert np.isfinite(np.asarray(out2.x)).all()
        assert out2.s.shape == out.s.shape
        with pytest.raises(ValueError, match="multiple"):
            gle.gle_baoab(pot, x0, jnp.zeros_like(x0),
                          jax.random.PRNGKey(11), dt=0.01, n_steps=41,
                          kT=1.0, a_matrix=a, collect_every=20)


class TestExpmFallback:
    """Regression: the scipy-free expm fallback was a raw 40-term
    Taylor series — catastrophically wrong at moderate ``||A dt||``
    (gamma*dt = 40 gave T ~ -7.5e15 instead of 4.2e-18, so valid
    (A, C) pairs were rejected and milder ones silently thermostatted
    at the wrong covariance).  Now scaling-and-squaring."""

    def test_scaled_taylor_exact_cases(self):
        import math
        from vaemolsim_tpu.gle import _expm_scaled
        assert _expm_scaled(np.array([[-40.0]]))[0, 0] == pytest.approx(
            math.exp(-40.0), rel=1e-10)
        th = 1.3
        rot = _expm_scaled(np.array([[0.0, th], [-th, 0.0]]))
        expect = np.array([[math.cos(th), math.sin(th)],
                           [-math.sin(th), math.cos(th)]])
        np.testing.assert_allclose(rot, expect, atol=1e-12)

    def test_matches_scipy_on_stiff_memory_matrix(self):
        from vaemolsim_tpu.gle import _expm_scaled
        try:
            from scipy.linalg import expm as ref
        except Exception:
            pytest.skip("scipy not available")
        m = -gle.exp_memory_matrix(50.0, 0.016) * 0.8
        np.testing.assert_allclose(_expm_scaled(m), ref(m),
                                   rtol=1e-9, atol=1e-12)

    def test_scipy_free_gle_matrices_valid_pair_accepted(self, monkeypatch):
        import math
        import sys
        # Force `from scipy.linalg import expm` to fail inside
        # gle_matrices so the fallback path is the one under test.
        monkeypatch.setitem(sys.modules, "scipy.linalg", None)
        t, s = gle.gle_matrices(gle.white_noise_matrix(50.0), 0.8, 2.0)
        assert t[0, 0] == pytest.approx(math.exp(-40.0), abs=1e-12)
        cov = s @ s.T
        assert cov[0, 0] == pytest.approx(2.0 * (1 - math.exp(-80.0)),
                                          rel=1e-10)
