"""VAMPnets (vamp.py): VAMP-2 scores pinned against the exact spectra
of analytic Markov chains and AR(1) processes, invariance properties of
the score, and end-to-end VAMPnet training recovering metastable states
from nonlinearly embedded dynamics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu import msm
from vaemolsim_tpu.vamp import (VAMPNet, koopman_singular_values,
                                lagged_pairs, vamp_score, vamp_timescales)

# Reversible 3-state chain with well-separated spectrum.
T3 = np.array([[0.90, 0.08, 0.02],
               [0.16, 0.80, 0.04],
               [0.08, 0.08, 0.84]])


def _chain_eigs(T):
    w = np.linalg.eigvals(T)
    return np.sort(np.abs(w))[::-1]  # 1 = lambda_1 > |lambda_2| >= ...


def _sample_chain(key, T, n_steps, x0=0):
    """dtraj of a Markov chain via one scan of categorical draws."""
    logp = jnp.log(jnp.asarray(T))

    def step(s, k):
        s2 = jax.random.categorical(k, logp[s])
        return s2, s2

    keys = jax.random.split(key, n_steps)
    _, traj = jax.lax.scan(step, jnp.asarray(x0), keys)
    return traj


class TestScoreAnalytic:

    def test_ar1_vamp2_is_one_plus_lambda_sq(self):
        """x_{t+1} = l x_t + sqrt(1-l^2) xi: the Koopman operator on
        the single linear feature has sigma = l, so VAMP-2 = 1 + l^2."""
        lam = 0.7
        key = jax.random.PRNGKey(0)
        xi = jax.random.normal(key, (200_000,))

        def step(x, e):
            x2 = lam * x + np.sqrt(1 - lam * lam) * e
            return x2, x2

        _, x = jax.lax.scan(step, jnp.asarray(0.0), xi)
        chi0, chit = x[:-1, None], x[1:, None]
        s = float(vamp_score(chi0, chit))
        assert s == pytest.approx(1 + lam * lam, abs=0.02)

    def test_one_hot_chain_scores_full_spectrum(self):
        """One-hot features of the exact discretization are complete:
        VAMP-2 = 1 + |l2|^2 + |l3|^2, and the whitened singular values
        match the chain's eigenvalue magnitudes."""
        eigs = _chain_eigs(T3)
        dtraj = _sample_chain(jax.random.PRNGKey(1), T3, 150_000)
        chi = jax.nn.one_hot(dtraj, 3)
        chi0, chit = chi[:-1], chi[1:]
        s = float(vamp_score(chi0, chit))
        assert s == pytest.approx(1 + eigs[1] ** 2 + eigs[2] ** 2,
                                  abs=0.03)
        sv = np.asarray(koopman_singular_values(chi0, chit))
        # Mean removal projects the constant function out: the leading
        # singular values ARE the nontrivial eigenvalue magnitudes.
        np.testing.assert_allclose(sv[:2], eigs[1:3], atol=0.02)

    def test_vamp1_nuclear_norm(self):
        eigs = _chain_eigs(T3)
        dtraj = _sample_chain(jax.random.PRNGKey(2), T3, 120_000)
        chi = jax.nn.one_hot(dtraj, 3)
        s = float(vamp_score(chi[:-1], chi[1:], method="vamp1"))
        assert s == pytest.approx(1 + eigs[1] + eigs[2], abs=0.03)

    def test_score_invariant_under_affine_feature_maps(self):
        """The VAMP score is a property of the spanned subspace:
        chi -> chi A + b (A invertible) leaves it unchanged."""
        dtraj = _sample_chain(jax.random.PRNGKey(3), T3, 40_000)
        chi = jax.nn.one_hot(dtraj, 3)
        A = jnp.asarray([[2.0, 0.3, 0.0], [-0.5, 1.0, 0.2],
                         [0.1, 0.0, 0.7]])
        b = jnp.asarray([1.0, -2.0, 0.5])
        s1 = float(vamp_score(chi[:-1], chi[1:]))
        s2 = float(vamp_score(chi[:-1] @ A + b, chi[1:] @ A + b))
        assert s1 == pytest.approx(s2, abs=2e-3)

    def test_dropping_a_state_lowers_the_score(self):
        """A 2-output featurization can capture at most 1 + sigma_2^2:
        strictly less than the full 3-state score (variational
        principle)."""
        eigs = _chain_eigs(T3)
        dtraj = _sample_chain(jax.random.PRNGKey(4), T3, 120_000)
        chi = jax.nn.one_hot(dtraj, 3)
        # Merge states 1 and 2: a rank-2 featurization.
        merge = jnp.asarray([[1.0, 0.0], [0.0, 1.0], [0.0, 1.0]])
        chi2 = chi @ merge
        s2 = float(vamp_score(chi2[:-1], chi2[1:]))
        s3 = float(vamp_score(chi[:-1], chi[1:]))
        assert s2 < s3
        assert s2 <= 1 + eigs[1] ** 2 + 0.03


class TestTimescales:

    def test_mapping_and_saturation(self):
        sv = jnp.asarray([1.2, 1.0, np.exp(-0.1), np.exp(-2.0)])
        ts = np.asarray(vamp_timescales(sv, lag_time=5.0))
        assert np.isinf(ts[0]) and np.isinf(ts[1])
        assert ts[2] == pytest.approx(50.0, rel=1e-5)
        assert ts[3] == pytest.approx(2.5, rel=1e-5)


class TestLaggedPairs:

    def test_matches_manual_slices_and_pools(self):
        x = jnp.arange(2 * 7 * 3, dtype=jnp.float32).reshape(2, 7, 3)
        a, b = lagged_pairs(x, lag=2)
        assert a.shape == (10, 3) and b.shape == (10, 3)
        np.testing.assert_array_equal(np.asarray(a[:5]),
                                      np.asarray(x[0, :-2]))
        np.testing.assert_array_equal(np.asarray(b[5:]),
                                      np.asarray(x[1, 2:]))

    def test_bad_lag_raises(self):
        with pytest.raises(ValueError, match="lag"):
            lagged_pairs(jnp.zeros((5, 2)), lag=5)


class TestVAMPNet:

    def _embedded_chain(self, key, n=60_000):
        """3-state chain emitted through a NONLINEAR 2-D observation
        map (states on a warped circle + noise): linear methods on the
        raw observable cannot separate the states; a VAMPnet must."""
        k1, k2 = jax.random.split(key)
        dtraj = _sample_chain(k1, T3, n)
        angles = jnp.asarray([0.3, 2.4, 4.4])[dtraj]
        r = 1.0 + 0.3 * jnp.sin(3.0 * angles)
        y = jnp.stack([r * jnp.cos(angles), r * jnp.sin(angles)], -1)
        y = y + 0.15 * jax.random.normal(k2, y.shape)
        return dtraj, y

    def test_training_recovers_spectrum_and_states(self):
        eigs = _chain_eigs(T3)
        dtraj, y = self._embedded_chain(jax.random.PRNGKey(5), n=40_000)
        x0, xt = y[:-1], y[1:]

        net = VAMPNet.create(jax.random.PRNGKey(6), in_dim=2, k=3,
                             hidden_dims=(32, 32))
        import optax
        opt = optax.adam(optax.cosine_decay_schedule(5e-3, 400))
        state = opt.init(net)

        @jax.jit
        def step(m, s, a, b):
            l, g = jax.value_and_grad(lambda mm: mm.loss(a, b))(m)
            up, s = opt.update(g, s)
            return optax.apply_updates(m, up), s, l

        s0 = -float(net.loss(x0, xt))
        for _ in range(400):
            net, state, l = step(net, state, x0, xt)
        s1 = -float(l)
        assert s1 > s0 + 0.1  # training moved the score

        # Spectrum: learned features reach the chain's true singular
        # values (variational bound makes >= impossible beyond noise).
        sv = np.asarray(net.singular_values(x0, xt))
        np.testing.assert_allclose(sv[:2], eigs[1:3], atol=0.05)

        # The learned features separate the true states.  VAMP fixes
        # memberships only up to an invertible linear mix (the score is
        # affine-invariant), so the correct test is a LINEAR probe:
        # least-squares map chi -> one-hot(state), then classify.
        chi = np.asarray(net(y))
        chi_aug = np.concatenate([chi, np.ones((len(chi), 1))], -1)
        onehot = np.eye(3)[np.asarray(dtraj)]
        W, *_ = np.linalg.lstsq(chi_aug, onehot, rcond=None)
        acc = np.mean((chi_aug @ W).argmax(-1) == np.asarray(dtraj))
        assert acc > 0.95, acc

        # Whitened Galerkin Koopman matrix -> timescales consistent with the
        # exact chain through the package's MSM analysis.
        # (mean-freeing removes the constant: the top magnitudes ARE
        # |lambda_2|, |lambda_3|)
        K = np.asarray(net.koopman_matrix(x0, xt))
        lam = np.sort(np.abs(np.linalg.eigvals(K)))[::-1]
        ts_net = -1.0 / np.log(np.clip(lam[0:2], 1e-9, 1 - 1e-9))
        ts_true = -1.0 / np.log(eigs[1:3])
        np.testing.assert_allclose(ts_net, ts_true, rtol=0.25)

    def test_unconstrained_lobe_and_fit_integration(self):
        """softmax=False CVs train through train.fit on pytree batches."""
        from vaemolsim_tpu.train import fit
        dtraj, y = self._embedded_chain(jax.random.PRNGKey(7), n=20_000)
        x0, xt = y[:-1], y[1:]
        net = VAMPNet.create(jax.random.PRNGKey(8), in_dim=2, k=2,
                             hidden_dims=(16,), softmax=False)
        net2, hist = fit(net, lambda m, b, k: m.loss(*b), (x0, xt),
                         key=jax.random.PRNGKey(9), num_epochs=3,
                         batch_size=5000, learning_rate=3e-3)
        assert hist["loss"][-1] < hist["loss"][0]
        sv = net2.singular_values(x0, xt)
        assert jnp.all(jnp.isfinite(sv))
