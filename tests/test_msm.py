"""Markov state models: estimation recovers exact chains, spectral
quantities match closed forms, committors/MFPTs match analytic
birth-death results, and the MD pipeline end-to-end is Markovian."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu import md, msm

# An exactly-known reversible 3-state chain.
T_TRUE = jnp.array([[0.90, 0.08, 0.02],
                    [0.16, 0.80, 0.04],
                    [0.08, 0.08, 0.84]])


def sample_chain(T, n_steps, n_trajs=8, key=0):
    """Exact trajectories from a discrete chain, one scanned categorical
    draw per step."""
    logp = jnp.log(T)

    def step(s, k):
        nxt = jax.random.categorical(k, logp[s], axis=-1)
        return nxt, nxt

    s0 = jnp.zeros(n_trajs, jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(key), n_steps)
    _, traj = jax.lax.scan(step, s0, keys)
    return traj.T  # (n_trajs, n_steps)


@pytest.fixture(scope="module")
def dtraj():
    return sample_chain(T_TRUE, 40_000)


class TestCounting:

    def test_count_matrix_exact_small(self):
        d = jnp.array([0, 1, 1, 2, 0, 0])
        C = msm.count_matrix(d, 3, lag=1)
        expected = np.array([[1, 1, 0], [0, 1, 1], [1, 0, 0]], float)
        np.testing.assert_array_equal(np.asarray(C), expected)

    def test_sliding_vs_strided(self):
        d = jnp.array([0, 1, 0, 1, 0, 1, 0, 1])
        C_slide = msm.count_matrix(d, 2, lag=2, sliding=True)
        C_stride = msm.count_matrix(d, 2, lag=2, sliding=False)
        assert float(C_slide.sum()) == 6  # T - lag windows
        assert float(C_stride.sum()) == 3
        # strided pairs are (s0,s2),(s2,s4),(s4,s6) — all 0 -> 0
        np.testing.assert_array_equal(
            np.asarray(C_stride), np.diag([3.0, 0.0]))

    def test_bad_lag_raises(self):
        with pytest.raises(ValueError, match="lag"):
            msm.count_matrix(jnp.zeros(5, jnp.int32), 2, lag=5)

    def test_batched_trajectories_pool(self):
        d = jnp.array([[0, 1], [1, 0]])
        C = msm.count_matrix(d, 2, lag=1)
        np.testing.assert_array_equal(np.asarray(C),
                                      [[0.0, 1.0], [1.0, 0.0]])


class TestEstimation:

    def test_recovers_true_chain(self, dtraj):
        C = msm.count_matrix(dtraj, 3, lag=1)
        for rev in (True, False):
            T = msm.transition_matrix(C, reversible=rev)
            np.testing.assert_allclose(np.asarray(T), np.asarray(T_TRUE),
                                       atol=0.01)
            np.testing.assert_allclose(np.asarray(T.sum(axis=1)),
                                       np.ones(3), atol=1e-5)

    def test_reversible_satisfies_detailed_balance(self, dtraj):
        C = msm.count_matrix(dtraj, 3, lag=1)
        T = msm.transition_matrix(C, reversible=True)
        pi = msm.stationary_distribution(T)
        flux = np.asarray(pi[:, None] * T)
        np.testing.assert_allclose(flux, flux.T, atol=1e-6)

    def test_stationary_distribution_exact(self):
        pi = msm.stationary_distribution(T_TRUE)
        np.testing.assert_allclose(np.asarray(pi @ T_TRUE),
                                   np.asarray(pi), atol=1e-6)
        assert abs(float(pi.sum()) - 1.0) < 1e-6

    def test_implied_timescales_match_numpy_eig(self):
        # T_TRUE is reversible w.r.t. its stationary dist? Not exactly —
        # use the reversible MLE of counts from it instead.
        d = sample_chain(T_TRUE, 40_000, key=3)
        T = msm.transition_matrix(msm.count_matrix(d, 3, lag=1))
        ts = msm.implied_timescales(T, lag=1.0)
        lam = np.sort(np.abs(np.linalg.eigvals(np.asarray(T))))[::-1]
        expected = -1.0 / np.log(lam[1:])
        np.testing.assert_allclose(np.asarray(ts), expected, rtol=1e-4)

    def test_implied_timescales_lag_consistent(self, dtraj):
        # Markovian data: t_2 estimated at lag 1 and lag 4 agree.
        out = []
        for lag in (1, 4):
            T = msm.transition_matrix(
                msm.count_matrix(dtraj, 3, lag=lag))
            out.append(float(msm.implied_timescales(T, lag=lag)[0]))
        assert abs(out[0] - out[1]) / out[0] < 0.1, out

    def test_chapman_kolmogorov_markovian(self, dtraj):
        pred, est = msm.chapman_kolmogorov(dtraj, 3, lag=2,
                                           factors=(1, 2, 4))
        np.testing.assert_allclose(np.asarray(pred), np.asarray(est),
                                   atol=0.02)


class TestKinetics:

    def test_committor_symmetric_random_walk_is_linear(self):
        # Unbiased birth-death chain on n states: committor from state 0
        # to state n-1 is exactly linear in the state index.
        n = 9
        T = np.zeros((n, n))
        for i in range(1, n - 1):
            T[i, i - 1] = T[i, i + 1] = 0.5
        T[0, 0] = T[-1, -1] = 1.0
        q = msm.committor(jnp.asarray(T), jnp.array([0]),
                          jnp.array([n - 1]))
        np.testing.assert_allclose(np.asarray(q),
                                   np.arange(n) / (n - 1), atol=1e-5)

    def test_committor_boolean_masks(self):
        T = jnp.array([[0.5, 0.5, 0.0], [0.25, 0.5, 0.25],
                       [0.0, 0.5, 0.5]])
        src = jnp.array([True, False, False])
        snk = jnp.array([False, False, True])
        q = msm.committor(T, src, snk)
        assert float(q[0]) == 0.0 and float(q[2]) == 1.0
        assert 0.0 < float(q[1]) < 1.0

    def test_mfpt_two_state_analytic(self):
        # From state 0, hop to 1 with prob p per step: MFPT = 1/p.
        p = 0.2
        T = jnp.array([[1 - p, p], [0.3, 0.7]])
        m = msm.mean_first_passage_time(T, jnp.array([1]))
        np.testing.assert_allclose(float(m[0]), 1.0 / p, rtol=1e-5)
        assert float(m[1]) == 0.0

    def test_mfpt_lag_scales_time(self):
        T = jnp.array([[0.9, 0.1], [0.2, 0.8]])
        m1 = msm.mean_first_passage_time(T, jnp.array([1]), lag=1.0)
        m5 = msm.mean_first_passage_time(T, jnp.array([1]), lag=5.0)
        np.testing.assert_allclose(np.asarray(m5), 5 * np.asarray(m1),
                                   rtol=1e-6)


class TestPipeline:

    def test_assign_states(self):
        centers = jnp.array([-1.0, 1.0])
        x = jnp.array([-2.0, -0.1, 0.1, 3.0])
        np.testing.assert_array_equal(
            np.asarray(msm.assign_states(x, centers)), [0, 0, 1, 1])
        # 2-D events
        c2 = jnp.array([[0.0, 0.0], [2.0, 2.0]])
        x2 = jnp.array([[0.1, -0.2], [1.9, 2.2]])
        np.testing.assert_array_equal(
            np.asarray(msm.assign_states(x2, c2)), [0, 1])

    def test_double_well_md_msm(self):
        # Langevin in a shallow double well -> 2-state MSM: stationary
        # distribution must match Boltzmann well weights, and the
        # relaxation timescale must be lag-consistent (Markovian at
        # coarse lags).
        h, tilt = 2.0, 0.4

        def pot(x):
            q = x[..., 0, 0]
            return h * (q * q - 1) ** 2 + tilt * q

        x0 = jnp.sign(jnp.linspace(-1, 1, 64))[:, None, None] * 1.0
        _, traj = md.baoab(pot, x0, jnp.zeros_like(x0),
                           jax.random.PRNGKey(0), dt=0.02,
                           n_steps=60_000, friction=1.0, kT=1.0,
                           collect_every=20)
        d = msm.assign_states(traj[..., 0, 0].T, jnp.array([-1.0, 1.0]))
        C = msm.count_matrix(d, 2, lag=5)
        T = msm.transition_matrix(C)
        pi = msm.stationary_distribution(T)

        xs = np.linspace(-3, 3, 4001)
        w = np.exp(-(h * (xs ** 2 - 1) ** 2 + tilt * xs))
        p_left = w[xs < 0].sum() / w.sum()
        np.testing.assert_allclose(float(pi[0]), p_left, atol=0.07)

        t5 = float(msm.implied_timescales(T, lag=5)[0])
        T10 = msm.transition_matrix(msm.count_matrix(d, 2, lag=10))
        t10 = float(msm.implied_timescales(T10, lag=10)[0])
        assert abs(t5 - t10) / t5 < 0.25, (t5, t10)


class TestTICA:

    @staticmethod
    def _ou_mixture(key=0, T=30_000, n_traj=4):
        # Two independent OU processes with very different relaxation
        # times, observed through a known linear mixing.
        dt = 0.1
        taus = jnp.array([20.0, 1.0])  # slow, fast
        a = jnp.exp(-dt / taus)
        sig = jnp.sqrt(1.0 - a * a)

        def step(s, k):
            s = a * s + sig * jax.random.normal(k, s.shape)
            return s, s

        s0 = jnp.zeros((n_traj, 2))
        keys = jax.random.split(jax.random.PRNGKey(key), T)
        _, z = jax.lax.scan(step, s0, keys)      # (T, n_traj, 2)
        z = jnp.moveaxis(z, 0, 1)                # (n_traj, T, 2)
        mix = jnp.array([[0.8, 0.6], [-0.6, 0.8]])
        return z @ mix.T, mix, taus, dt

    def test_recovers_slow_direction_and_timescale(self):
        x, mix, taus, dt = self._ou_mixture()
        lag = 5
        ts, comps, lam = msm.tica(x, lag=lag)
        # eigenvalue of the slow mode = exp(-lag dt / tau_slow)
        np.testing.assert_allclose(float(lam[0]),
                                   float(jnp.exp(-lag * dt / taus[0])),
                                   atol=0.02)
        # implied timescale in units of frames: tau_slow / dt
        np.testing.assert_allclose(float(ts[0]), float(taus[0] / dt),
                                   rtol=0.15)
        # leading component inverts the mixing: projecting must
        # recover the SLOW latent up to scale.
        proj = (x.reshape(-1, 2) - x.reshape(-1, 2).mean(0)) @ comps[:, 0]
        slow = (x.reshape(-1, 2) @ jnp.linalg.inv(mix.T))[:, 0]
        corr = np.corrcoef(np.asarray(proj), np.asarray(slow))[0, 1]
        assert abs(corr) > 0.99, corr

    def test_whitening_normalizes_components(self):
        x, *_ = self._ou_mixture(key=1, T=10_000)
        ts, comps, lam = msm.tica(x, lag=3)
        # components are C0-orthonormal: v^T C0 v = 1
        a = x.reshape(-1, 2) - x.reshape(-1, 2).mean(0)
        c0 = np.asarray(a.T @ a / a.shape[0])
        g = np.asarray(comps).T @ c0 @ np.asarray(comps)
        np.testing.assert_allclose(g, np.eye(2), atol=0.05)

    def test_bad_lag_raises(self):
        with pytest.raises(ValueError, match="lag"):
            msm.tica(jnp.zeros((10, 2)), lag=10)

    def test_k_truncation(self):
        x, *_ = self._ou_mixture(key=2, T=5_000)
        ts, comps, lam = msm.tica(x, lag=3, k=1)
        assert ts.shape == (1,) and comps.shape == (2, 1)


class TestTPT:

    def test_two_state_rate_is_hop_probability(self):
        p, r = 0.1, 0.3
        T = jnp.array([[1 - p, p], [r, 1 - r]])
        k = msm.tpt_rate(T, jnp.array([0]), jnp.array([1]))
        np.testing.assert_allclose(float(k), p, rtol=1e-5)

    def test_flux_conservation_across_cuts(self):
        # Net flux through every cut of a birth-death chain equals the
        # total reactive flux (flux conservation).
        n = 6
        Tm = np.zeros((n, n))
        probs = [0.2, 0.3, 0.25, 0.35, 0.15]
        for i in range(n - 1):
            Tm[i, i + 1] = probs[i]
            Tm[i + 1, i] = 0.1
        Tm += np.diag(1.0 - Tm.sum(axis=1))
        T = jnp.asarray(Tm)
        f, fnet = msm.reactive_flux(T, jnp.array([0]),
                                    jnp.array([n - 1]))
        cuts = [float(np.asarray(fnet)[:c, c:].sum())
                for c in range(1, n)]
        np.testing.assert_allclose(cuts, cuts[0], rtol=1e-5)
        # gross flux out of the source equals flux into the sink
        np.testing.assert_allclose(float(f[0].sum()),
                                   float(f[:, n - 1].sum()), rtol=1e-5)

    def test_no_flux_into_source_or_out_of_sink(self):
        d = sample_chain(T_TRUE, 20_000, key=7)
        T = msm.transition_matrix(msm.count_matrix(d, 3, lag=1))
        f, _ = msm.reactive_flux(T, jnp.array([0]), jnp.array([2]))
        assert float(jnp.abs(f[:, 0]).max()) < 1e-12  # into source
        assert float(jnp.abs(f[2]).max()) < 1e-12     # out of sink

    def test_rate_lag_scaling(self):
        d = sample_chain(T_TRUE, 20_000, key=8)
        T = msm.transition_matrix(msm.count_matrix(d, 3, lag=1))
        k1 = msm.tpt_rate(T, jnp.array([0]), jnp.array([2]), lag=1.0)
        k2 = msm.tpt_rate(T, jnp.array([0]), jnp.array([2]), lag=2.0)
        np.testing.assert_allclose(float(k1), 2 * float(k2), rtol=1e-6)


class TestKMeans:

    def test_recovers_separated_blobs(self):
        mus = jnp.array([[-5.0, 0.0], [0.0, 5.0], [5.0, 0.0]])
        key = jax.random.PRNGKey(0)
        pts = (mus[jax.random.randint(key, (3000,), 0, 3)]
               + 0.3 * jax.random.normal(jax.random.PRNGKey(1),
                                         (3000, 2)))
        centers, inertia = msm.kmeans(jax.random.PRNGKey(2), pts, 3)
        got = np.asarray(centers)[np.argsort(np.asarray(centers)[:, 0])]
        np.testing.assert_allclose(got, np.asarray(mus), atol=0.15)
        # inertia ~ n * d * sigma^2
        assert float(inertia) < 3000 * 2 * 0.3 ** 2 * 1.5

    def test_k1_is_mean(self):
        pts = jax.random.normal(jax.random.PRNGKey(0), (500, 3)) + 2.0
        centers, _ = msm.kmeans(jax.random.PRNGKey(1), pts, 1)
        np.testing.assert_allclose(np.asarray(centers[0]),
                                   np.asarray(pts.mean(0)), atol=1e-4)

    def test_bad_k_raises(self):
        with pytest.raises(ValueError, match="k must"):
            msm.kmeans(jax.random.PRNGKey(0), jnp.zeros((5, 2)), 9)

    def test_feeds_assign_states(self):
        pts = jnp.concatenate([
            jax.random.normal(jax.random.PRNGKey(0), (200, 1)) * 0.2 - 2,
            jax.random.normal(jax.random.PRNGKey(1), (200, 1)) * 0.2 + 2])
        centers, _ = msm.kmeans(jax.random.PRNGKey(2), pts, 2)
        lbl = msm.assign_states(pts, centers)
        # the two halves land in different states
        a = np.asarray(lbl[:200])
        b = np.asarray(lbl[200:])
        assert (a == a[0]).all() and (b == b[0]).all() and a[0] != b[0]
