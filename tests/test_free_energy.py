"""Free-energy estimators (EXP / BAR / AIS) against analytic targets.

All truths are closed-form Gaussian/mixture normalizing constants; the
estimators are statistical, so tolerances are several standard errors
wide but tight enough to catch sign/convention errors (the classic
failure mode of FEP code) and broken weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu.mcmc import (ais, bar_free_energy, exp_free_energy,
                                work_values)

# --- analytic pair of 1-D states -------------------------------------
# p~_0 = exp(-x^2/2)                 -> Z_0 = sqrt(2 pi)
# p~_1 = exp(-(x-1)^2 / (2 s^2))     -> Z_1 = sqrt(2 pi) s,  s = 0.5
# dF(0->1) = -ln(Z_1/Z_0) = -ln s = ln 2
S1 = 0.5
TRUE_DF = -float(np.log(S1))


def lp0(x):
    return -0.5 * jnp.sum(x ** 2, axis=-1)


def lp1(x):
    return -0.5 * jnp.sum((x - 1.0) ** 2, axis=-1) / S1 ** 2


@pytest.fixture(scope="module")
def gaussian_work():
    k0, k1 = jax.random.split(jax.random.PRNGKey(0))
    x_a = jax.random.normal(k0, (20_000, 1))            # ~ p_0
    x_b = 1.0 + S1 * jax.random.normal(k1, (20_000, 1))  # ~ p_1
    w_f = work_values(lp0, lp1, x_a)
    w_r = work_values(lp1, lp0, x_b)
    return w_f, w_r


class TestExpBar:

    def test_exp_forward(self, gaussian_work):
        w_f, _ = gaussian_work
        df, se = exp_free_energy(w_f)
        assert float(se) > 0.0
        assert abs(float(df) - TRUE_DF) < max(5 * float(se), 0.05)

    def test_exp_reverse_negates(self, gaussian_work):
        _, w_r = gaussian_work
        df, se = exp_free_energy(w_r)
        assert abs(float(df) + TRUE_DF) < max(5 * float(se), 0.05)

    def test_bar(self, gaussian_work):
        w_f, w_r = gaussian_work
        df, se = bar_free_energy(w_f, w_r)
        assert 0.0 < float(se) < 0.05
        assert abs(float(df) - TRUE_DF) < 5 * float(se)

    def test_bar_solves_degenerate_exactly(self):
        # Constant work c both ways has the exact solution dF = ... the
        # BAR equation with w_F = c, w_R = -c and n_F = n_R reduces to
        # sigmoid(c - dF) = sigmoid(-c + dF)  =>  dF = c.
        c = 1.7
        df, se = bar_free_energy(jnp.full((100,), c), jnp.full((100,), -c))
        np.testing.assert_allclose(float(df), c, atol=1e-5)
        np.testing.assert_allclose(float(se), 0.0, atol=1e-6)

    def test_bar_beats_exp_variance(self, gaussian_work):
        """Bidirectional BAR must report no worse error than one-sided
        EXP on the same data (it is the minimum-variance combination)."""
        w_f, w_r = gaussian_work
        _, se_exp = exp_free_energy(w_f)
        _, se_bar = bar_free_energy(w_f, w_r)
        assert float(se_bar) <= float(se_exp) * 1.05

    def test_jit_and_large_work_no_overflow(self):
        w = jnp.asarray([1e4, 2e4, -50.0])
        df, se = jax.jit(exp_free_energy)(w)
        assert np.isfinite(float(df)) and np.isfinite(float(se))
        df2, se2 = jax.jit(bar_free_energy)(w, -w)
        assert np.isfinite(float(df2)) and np.isfinite(float(se2))


class TestAIS:

    def test_log_z_gaussian(self):
        """N(0,1) -> unnormalized scaled Gaussian: ln Z known exactly."""
        A = 3.7  # p~_1 = A * N(1, 0.5) density  =>  Z_1 = A
        lp_t = lambda x: jnp.log(A) + lp1(x) - jnp.log(
            jnp.sqrt(2 * jnp.pi) * S1)
        res = jax.jit(lambda k, x: ais(
            lp0_norm, lp_t, x, k, n_stages=48, scale=0.5,
            sweeps_per_stage=2))(jax.random.PRNGKey(1),
                                 jax.random.normal(jax.random.PRNGKey(2),
                                                   (4096, 1)))
        assert abs(float(res.log_z) - np.log(A)) < 0.05
        assert 0.2 < float(res.acceptance) < 0.98
        assert float(res.ess) > 4096 * 0.2
        assert res.samples.shape == (4096, 1)
        # Final samples concentrate near the target mode.
        assert abs(float(jnp.mean(res.samples)) - 1.0) < 0.1

    def test_bimodal_target_log_z(self):
        """Two-mode target with unequal weights — the case one-sided EXP
        from a unimodal start badly underestimates; AIS must not."""
        A = 2.0

        def lp_t(x):
            x = x[..., 0]
            comps = jnp.stack([
                jnp.log(0.3) - 0.5 * (x + 2.0) ** 2 / 0.25,
                jnp.log(0.7) - 0.5 * (x - 2.0) ** 2 / 0.25,
            ])
            norm = jnp.log(jnp.sqrt(2 * jnp.pi) * 0.5)
            return jnp.log(A) + jax.scipy.special.logsumexp(
                comps, axis=0) - norm

        res = ais(lp0_norm, lp_t,
                  jax.random.normal(jax.random.PRNGKey(3), (4096, 1)),
                  jax.random.PRNGKey(4), n_stages=96, scale=0.4,
                  sweeps_per_stage=2)
        assert abs(float(res.log_z) - np.log(A)) < 0.08
        # Both modes populated roughly per their weights.
        frac_right = float(jnp.mean(res.samples[:, 0] > 0))
        assert 0.55 < frac_right < 0.85

    def test_mala_transitions(self):
        res = ais(lp0_norm, lambda x: jnp.log(2.0) + lp0_norm(x),
                  jax.random.normal(jax.random.PRNGKey(5), (1024, 2)),
                  jax.random.PRNGKey(6), n_stages=8, kind="mala",
                  scale=0.2)
        # Identical shapes => every weight increment is exactly ln 2.
        np.testing.assert_allclose(float(res.log_z), np.log(2.0),
                                   atol=1e-5)
        assert float(res.acceptance) > 0.3

    def test_custom_betas(self):
        betas = jnp.concatenate([jnp.zeros(1), jnp.geomspace(0.01, 1.0, 20)])
        res = ais(lp0_norm, lambda x: lp0_norm(x),
                  jax.random.normal(jax.random.PRNGKey(7), (256, 1)),
                  jax.random.PRNGKey(8), betas=betas)
        np.testing.assert_allclose(float(res.log_z), 0.0, atol=1e-5)


class TestSMC:

    def test_systematic_resample_degenerate(self):
        from vaemolsim_tpu.mcmc.free_energy import _systematic_resample
        logw = jnp.log(jnp.asarray([1e-30, 1.0, 1e-30, 1e-30]))
        log_norm = logw - jax.scipy.special.logsumexp(logw)
        idx = _systematic_resample(log_norm, jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(idx), np.ones(4))

    def test_systematic_resample_uniform_keeps_all(self):
        from vaemolsim_tpu.mcmc.free_energy import _systematic_resample
        n = 64
        log_norm = jnp.full((n,), -jnp.log(n))
        idx = np.asarray(_systematic_resample(log_norm,
                                              jax.random.PRNGKey(1)))
        # Uniform weights: systematic resampling is a permutation-free
        # identity (each stratum contains exactly its own index).
        np.testing.assert_array_equal(idx, np.arange(n))

    def test_smc_log_z_matches_ais(self):
        """Aggressive resampling must not bias log Z (Gaussian case with
        known ln Z)."""
        A = 3.7
        lp_t = lambda x: jnp.log(A) + lp1(x) - jnp.log(
            jnp.sqrt(2 * jnp.pi) * S1)
        res = jax.jit(lambda k, x: ais(
            lp0_norm, lp_t, x, k, n_stages=48, scale=0.5,
            sweeps_per_stage=2, resample_threshold=0.9))(
                jax.random.PRNGKey(11),
                jax.random.normal(jax.random.PRNGKey(12), (4096, 1)))
        assert abs(float(res.log_z) - np.log(A)) < 0.05

    def test_smc_survives_weight_collapse(self):
        """Far-shifted narrow target over few stages: plain AIS weight
        ESS collapses to a handful of chains; SMC resampling keeps the
        population alive and the estimate usable."""
        lp_t = lambda x: -0.5 * jnp.sum((x - 6.0) ** 2, -1) / 0.25 \
            - 0.5 * jnp.log(2 * jnp.pi * 0.25)  # normalized: ln Z = 0
        x0 = jax.random.normal(jax.random.PRNGKey(13), (2048, 1))
        kw = dict(n_stages=40, scale=0.6, sweeps_per_stage=2)
        plain = ais(lp0_norm, lp_t, x0, jax.random.PRNGKey(14), **kw)
        smc = ais(lp0_norm, lp_t, x0, jax.random.PRNGKey(14),
                  resample_threshold=0.5, **kw)
        assert float(smc.ess) > 10 * float(plain.ess)
        # log of the estimator is biased down; 40 stages on this hard
        # path leaves ~0.15 — the point is the population stays alive
        # (ESS two orders up) while the estimate remains usable.
        assert abs(float(smc.log_z)) < 0.25
        # SMC's final population actually reached the target basin.
        assert abs(float(jnp.mean(smc.samples)) - 6.0) < 0.3


def lp0_norm(x):
    """Normalized standard-normal log density (AIS init must be
    normalized for log_z to mean ln Z_target)."""
    d = x.shape[-1]
    return lp0(x) - 0.5 * d * jnp.log(2 * jnp.pi)

class TestMBAR:
    """MBAR against analytic Gaussian ladders (and BAR, to which it
    reduces exactly at K=2)."""

    # K=4 ladder: p~_k = exp(-(x-mu_k)^2/(2 s_k^2)), Z_k = sqrt(2pi) s_k
    # dF(0->k) = -ln(s_k / s_0)
    MUS = np.array([0.0, 0.5, 1.0, 1.5])
    SIGS = np.array([1.0, 0.8, 0.6, 0.5])
    TRUE_F = -np.log(SIGS / SIGS[0])

    @classmethod
    def _ladder_result(cls, n_per_state=6000, seed=0):
        from vaemolsim_tpu.mcmc import mbar_from_samples

        keys = jax.random.split(jax.random.PRNGKey(seed), len(cls.MUS))
        samples = [m + s * jax.random.normal(k, (n_per_state, 1))
                   for m, s, k in zip(cls.MUS, cls.SIGS, keys)]
        fns = [
            (lambda x, m=m, s=s:
             -0.5 * jnp.sum((x - m) ** 2, axis=-1) / s ** 2)
            for m, s in zip(cls.MUS, cls.SIGS)]
        return fns, samples, mbar_from_samples(fns, samples)

    def test_gaussian_ladder_free_energies(self):
        _, _, res = self._ladder_result()
        f = np.asarray(res.free_energies)
        se = np.asarray(res.stderrs)
        assert f[0] == 0.0 and se[0] == pytest.approx(0.0, abs=1e-4)
        for k in range(1, 4):
            assert se[k] > 0.0
            assert abs(f[k] - self.TRUE_F[k]) < max(5 * se[k], 0.02)

    def test_reduces_to_bar_at_two_states(self):
        """Two-state MBAR IS the BAR estimator: point estimate and
        asymptotic error must both match bar_free_energy."""
        from vaemolsim_tpu.mcmc import mbar_from_samples

        k0, k1 = jax.random.split(jax.random.PRNGKey(3))
        x0 = jax.random.normal(k0, (8000, 1))
        x1 = 1.0 + S1 * jax.random.normal(k1, (8000, 1))
        res = mbar_from_samples([lp0, lp1], [x0, x1])
        df_bar, se_bar = bar_free_energy(work_values(lp0, lp1, x0),
                                         work_values(lp1, lp0, x1))
        np.testing.assert_allclose(float(res.free_energies[1]),
                                   float(df_bar), atol=2e-4)
        np.testing.assert_allclose(float(res.stderrs[1]), float(se_bar),
                                   rtol=0.1)

    def test_self_consistency_of_weights(self):
        """At the solution the weight matrix's sampled columns each sum
        to one (the defining MBAR stationarity condition)."""
        _, _, res = self._ladder_result(n_per_state=2000)
        w = np.exp(np.asarray(res.free_energies)[None, :]
                   + np.asarray(res.log_probs).T
                   - np.asarray(res.log_denominator)[:, None])
        np.testing.assert_allclose(w.sum(axis=0), np.ones(4), rtol=1e-4)

    def test_perturbed_state_and_zero_count_agree(self):
        """An unsampled state evaluated two ways — zero-count column in
        the solve vs post-hoc perturbation — must agree, and match the
        analytic answer."""
        from vaemolsim_tpu.mcmc import (mbar_free_energy,
                                        mbar_perturbed_free_energy)

        fns, samples, res = self._ladder_result(n_per_state=4000)
        s_new, mu_new = 0.7, 0.75
        true_f_new = -np.log(s_new / self.SIGS[0])
        pooled = jnp.concatenate(samples, axis=0)
        lnew = -0.5 * jnp.sum((pooled - mu_new) ** 2, axis=-1) / s_new ** 2

        f_p, se_p = mbar_perturbed_free_energy(res, lnew)
        assert abs(float(f_p) - true_f_new) < max(5 * float(se_p), 0.02)

        L_aug = jnp.concatenate([res.log_probs, lnew[None, :]], axis=0)
        counts_aug = [len(s) for s in samples] + [0]
        res_aug = mbar_free_energy(L_aug, counts_aug)
        np.testing.assert_allclose(float(res_aug.free_energies[-1]),
                                   float(f_p), atol=1e-4)
        np.testing.assert_allclose(float(res_aug.stderrs[-1]), float(se_p),
                                   rtol=0.05)

    def test_expectation_recovers_state_means(self):
        from vaemolsim_tpu.mcmc import mbar_expectation

        fns, samples, res = self._ladder_result(n_per_state=6000)
        pooled = np.concatenate([np.asarray(s) for s in samples])[:, 0]
        for k in (0, 2, 3):
            mean, se = mbar_expectation(res, pooled, state=k)
            assert float(se) > 0.0
            assert abs(float(mean) - self.MUS[k]) < max(6 * float(se), 0.03)
        # Array-state form: expectation in an unsampled state.
        lnew = -0.5 * (jnp.asarray(pooled) - 0.25) ** 2 / 0.9 ** 2
        mean, se = mbar_expectation(res, pooled, state=lnew)
        assert abs(float(mean) - 0.25) < max(6 * float(se), 0.03)

    def test_input_validation(self):
        from vaemolsim_tpu.mcmc import mbar_free_energy

        with pytest.raises(ValueError, match="pooled"):
            mbar_free_energy(jnp.zeros((2, 10)), [4, 4])
        with pytest.raises(ValueError, match="counts"):
            mbar_free_energy(jnp.zeros((2, 10)), [10])
        with pytest.raises(ValueError, match="at least one"):
            mbar_free_energy(jnp.zeros((2, 0)), [0, 0])

    def test_jit_composes(self):
        """The solve jits with static counts closed over."""
        from vaemolsim_tpu.mcmc import mbar_free_energy

        L = jnp.stack([lp0(jnp.linspace(-2, 2, 64)[:, None]),
                       lp1(jnp.linspace(-2, 2, 64)[:, None])])

        @jax.jit
        def solve(L):
            return mbar_free_energy(L, [32, 32]).free_energies

        assert np.isfinite(np.asarray(solve(L))).all()

def test_ais_hmc_transitions():
    """AIS rides the HMC kernel: N(0,1) -> scaled unnormalized Gaussian
    with known ln Z, shorter ladder than random walk needs."""
    from vaemolsim_tpu.mcmc import ais

    s = 0.6
    lp_t = lambda x: -0.5 * jnp.sum(x ** 2, -1) / s ** 2  # noqa: E731
    # ln Z_t = ln(sqrt(2 pi) s); init normalized => log_z = ln Z_t
    true = float(np.log(np.sqrt(2 * np.pi) * s))
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2048, 1))
    res = jax.jit(lambda x, k: ais(lp0_norm, lp_t, x, k, n_stages=24,
                                   kind="hmc", scale=0.15, n_leapfrog=5))(
        x0, jax.random.PRNGKey(1))
    assert 0.3 < float(res.acceptance) <= 1.0
    assert abs(float(res.log_z) - true) < 0.05

def test_mbar_expectation_jax_integer_index_and_bad_shape():
    """A 0-d jax/numpy integer is a state INDEX (regression: it used to
    fall into the log-density-array branch and silently return a wrong
    expectation); a wrong-shaped array state raises."""
    from vaemolsim_tpu.mcmc import mbar_expectation, mbar_from_samples

    k0, k1 = jax.random.split(jax.random.PRNGKey(0))
    x0 = jax.random.normal(k0, (2000, 1))
    x1 = 1.0 + S1 * jax.random.normal(k1, (2000, 1))
    res = mbar_from_samples([lp0, lp1], [x0, x1])
    vals = jnp.concatenate([x0, x1])[:, 0]
    m_int, _ = mbar_expectation(res, vals, state=1)
    m_jax, _ = mbar_expectation(res, vals, state=jnp.asarray(1))
    m_np, _ = mbar_expectation(res, vals, state=np.int64(1))
    np.testing.assert_allclose(float(m_jax), float(m_int), atol=1e-6)
    np.testing.assert_allclose(float(m_np), float(m_int), atol=1e-6)
    with pytest.raises(ValueError, match="log-density"):
        mbar_expectation(res, vals, state=jnp.zeros(7))


class TestTargetedFEP:
    """Targeted (flow-mapped) FEP — Wirnsberger et al. 2020 protocol.

    Same Gaussian pair as above: the EXACT map p_0 -> p_1 is the affine
    x -> 1 + S1 * x, under which every mapped work value equals the true
    dF (zero-variance estimator)."""

    def _exact_bijector(self):
        from vaemolsim_tpu.ops import bijectors as bij
        return bij.Block(
            bij.Chain((bij.Shift(shift=jnp.asarray(1.0)),
                       bij.Scale(scale=jnp.asarray(S1)))), ndims=1)

    def test_exact_map_zero_variance(self, gaussian_work):
        from vaemolsim_tpu.mcmc import targeted_work_values
        x_a = jax.random.normal(jax.random.PRNGKey(3), (64, 1))
        w = targeted_work_values(lp0, lp1, x_a,
                                 bijector=self._exact_bijector())
        assert w.shape == (64,)
        np.testing.assert_allclose(np.asarray(w), TRUE_DF, atol=1e-5)
        assert float(jnp.std(w)) < 1e-5

    def test_identity_map_recovers_plain_work(self):
        from vaemolsim_tpu.mcmc import targeted_work_values
        from vaemolsim_tpu.ops import bijectors as bij
        x = jax.random.normal(jax.random.PRNGKey(4), (128, 1))
        w_plain = work_values(lp0, lp1, x)
        w_tgt = targeted_work_values(
            lp0, lp1, x, bijector=bij.Block(bij.Identity(), ndims=1))
        np.testing.assert_allclose(np.asarray(w_tgt), np.asarray(w_plain),
                                   rtol=1e-6)

    def test_targeted_bar_exact_map(self):
        from vaemolsim_tpu.mcmc import targeted_bar
        k0, k1 = jax.random.split(jax.random.PRNGKey(5))
        x_a = jax.random.normal(k0, (256, 1))
        x_b = 1.0 + S1 * jax.random.normal(k1, (256, 1))
        df, se = targeted_bar(lp0, lp1, x_a, x_b,
                              bijector=self._exact_bijector())
        assert abs(float(df) - TRUE_DF) < 1e-4
        assert float(se) < 1e-4

    def test_inverse_flag_gives_reverse_leg(self):
        from vaemolsim_tpu.mcmc import targeted_work_values
        x_b = 1.0 + S1 * jax.random.normal(jax.random.PRNGKey(6), (64, 1))
        w_r = targeted_work_values(lp1, lp0, x_b,
                                   bijector=self._exact_bijector(),
                                   inverse=True)
        np.testing.assert_allclose(np.asarray(w_r), -TRUE_DF, atol=1e-5)

    def test_unreduced_log_det_raises(self):
        from vaemolsim_tpu.mcmc import targeted_work_values
        from vaemolsim_tpu.ops import bijectors as bij
        x = jnp.ones((8, 2))

        def lp(z):
            return -0.5 * jnp.sum(z ** 2, axis=-1)

        with pytest.raises(ValueError, match="Block"):
            targeted_work_values(lp, lp, x, bijector=bij.Identity())

    def test_map_spec_validation(self):
        from vaemolsim_tpu.mcmc import targeted_bar, targeted_work_values
        from vaemolsim_tpu.ops import bijectors as bij
        x = jnp.ones((4, 1))
        with pytest.raises(ValueError, match="exactly one"):
            targeted_work_values(lp0, lp1, x)
        b = bij.Block(bij.Identity(), ndims=1)
        with pytest.raises(ValueError, match="exactly one"):
            targeted_work_values(lp0, lp1, x, bijector=b,
                                 map_and_log_det=b.forward_and_log_det)
        with pytest.raises(ValueError, match="not both"):
            targeted_bar(lp0, lp1, x, x, bijector=b,
                         map_and_log_det=b.forward_and_log_det)
        with pytest.raises(ValueError, match="both"):
            targeted_bar(lp0, lp1, x, x,
                         map_and_log_det=b.forward_and_log_det)

    def test_training_shrinks_variance_to_exact(self):
        """tfep_loss gradient descent on an affine map recovers the exact
        (shift, log-scale) and collapses the work variance by orders of
        magnitude relative to plain FEP — the whole point of TFEP."""
        from vaemolsim_tpu.mcmc import tfep_loss, targeted_work_values

        x = jax.random.normal(jax.random.PRNGKey(7), (4096, 1))

        def mald_of(params):
            shift, log_scale = params

            def mald(z):
                y = shift + jnp.exp(log_scale) * z
                ldj = jnp.broadcast_to(log_scale, (z.shape[0],))
                return y, ldj
            return mald

        def loss(params):
            return tfep_loss(lp0, lp1, x, map_and_log_det=mald_of(params))

        params = (jnp.asarray(0.0), jnp.asarray(0.0))
        g = jax.jit(jax.grad(loss))
        for _ in range(400):
            grads = g(params)
            params = jax.tree_util.tree_map(
                lambda p, d: p - 0.05 * d, params, grads)
        shift, log_scale = params
        assert abs(float(shift) - 1.0) < 1e-2
        assert abs(float(jnp.exp(log_scale)) - S1) < 1e-2

        w = targeted_work_values(lp0, lp1, x, map_and_log_det=mald_of(params))
        w_plain = work_values(lp0, lp1, x)
        assert float(jnp.std(w)) < 1e-2 * float(jnp.std(w_plain))
        # Gibbs bound is tight at the trained optimum (finite-sample mean
        # may sit a hair below the population bound).
        assert abs(float(jnp.mean(w)) - TRUE_DF) < 1e-3
