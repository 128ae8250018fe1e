"""MCMC engine tests: bookkeeping (reference test_mcmc.py style) plus the
statistical-correctness coverage the reference lacks (SURVEY.md §4): an
analytically-solvable Metropolized independence sampler must reproduce
the target distribution's moments.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu import losses
from vaemolsim_tpu.dists import IndependentBlockwise
from vaemolsim_tpu.mcmc import MCMC, MCMCState, make_mcmc_step, run_mcmc
from vaemolsim_tpu.models import VAE, MappingToDistribution
from vaemolsim_tpu.ops import distributions as d


def _independence_sampler_fns(proposal_loc=0.0, proposal_scale=2.0):
    """Hand-built 'VAE' whose encoder == prior (both ignore their input)
    and whose decoder ignores z: the z-terms cancel in the acceptance and
    the chain is an exact Metropolized independence sampler with proposal
    N(proposal_loc, proposal_scale) — analytically correct stationary
    distribution for any target."""

    def encoder_fn(x):
        zeros = jnp.zeros(x.shape[:-1] + (1,))
        return d.Independent(d.Normal(zeros, jnp.ones_like(zeros)), 1)

    prior_fn = encoder_fn

    def decoder_fn(z):
        loc = jnp.full(z.shape[:-1] + (1,), proposal_loc)
        return d.Independent(d.Normal(loc, proposal_scale *
                                      jnp.ones_like(loc)), 1)

    return encoder_fn, prior_fn, decoder_fn


class TestEngineStatistics:

    def test_independence_sampler_recovers_target(self):
        # Target: N(1, 0.75); proposal N(0, 2) via the fake VAE.
        target = d.Independent(d.Normal(jnp.full(1, 1.0),
                                        jnp.full(1, 0.75)), 1)
        enc, pri, dec = _independence_sampler_fns()
        step = make_mcmc_step(enc, pri, dec, target.log_prob)
        configs = jnp.zeros((512, 1))
        state = MCMCState.create(configs, target.log_prob(configs),
                                 jax.random.PRNGKey(0))
        state, _ = jax.jit(lambda s: run_mcmc(step, s, 400))(state)
        samples = state.configs[:, 0]
        np.testing.assert_allclose(float(jnp.mean(samples)), 1.0, atol=0.05)
        np.testing.assert_allclose(float(jnp.std(samples)), 0.75, atol=0.05)
        acc = float(state.acceptance_rate)
        assert 0.05 < acc < 0.95

    def test_periodic_independence_sampler_von_mises(self):
        """MC on the circle: a von Mises proposal (decoder) against a
        von Mises target recovers the target's circular statistics —
        pins the periodic-DOF path (the reference's core use case:
        torsion sampling) through the engine."""
        target = d.Independent(
            d.VonMises(jnp.full(1, 1.0), jnp.full(1, 2.0)), 1)

        def encoder_fn(x):
            zeros = jnp.zeros(x.shape[:-1] + (1,))
            return d.Independent(d.Normal(zeros, jnp.ones_like(zeros)), 1)

        def decoder_fn(z):
            loc = jnp.zeros(z.shape[:-1] + (1,))
            # Broad proposal (kappa=0.5) so moves cross the circle.
            return d.Independent(
                d.VonMises(loc, 0.5 * jnp.ones_like(loc)), 1)

        step = make_mcmc_step(encoder_fn, encoder_fn, decoder_fn,
                              target.log_prob)
        configs = jnp.zeros((512, 1))
        state = MCMCState.create(configs, target.log_prob(configs),
                                 jax.random.PRNGKey(0))
        state, _ = jax.jit(lambda s: run_mcmc(step, s, 400))(state)
        theta = state.configs[:, 0]
        ref = target.sample(jax.random.PRNGKey(1), (4000,))[:, 0]
        # Circular mean and mean resultant length within MC tolerance.
        circ_mean = jnp.angle(jnp.mean(jnp.exp(1j * theta)))
        ref_mean = jnp.angle(jnp.mean(jnp.exp(1j * ref)))
        np.testing.assert_allclose(float(circ_mean), float(ref_mean),
                                   atol=0.12)
        r = float(jnp.abs(jnp.mean(jnp.exp(1j * theta))))
        r_ref = float(jnp.abs(jnp.mean(jnp.exp(1j * ref))))
        np.testing.assert_allclose(r, r_ref, atol=0.08)
        # Samples stay on the principal circle.
        assert bool(jnp.all(jnp.abs(theta) <= np.pi + 1e-5))

    def test_independence_sampler_rbg_prng(self):
        """Same statistical check under the rbg PRNG (the hardware-RNG
        fast path bench.py uses on TPU: +20% props/s there) — MH is
        exact for any sound uniform source, and the engine must accept
        typed rbg keys threaded through the scan."""
        target = d.Independent(d.Normal(jnp.full(1, 1.0),
                                        jnp.full(1, 0.75)), 1)
        enc, pri, dec = _independence_sampler_fns()
        step = make_mcmc_step(enc, pri, dec, target.log_prob)
        configs = jnp.zeros((512, 1))
        state = MCMCState.create(configs, target.log_prob(configs),
                                 jax.random.key(0, impl="rbg"))
        state, _ = jax.jit(lambda s: run_mcmc(step, s, 400))(state)
        samples = state.configs[:, 0]
        np.testing.assert_allclose(float(jnp.mean(samples)), 1.0, atol=0.05)
        np.testing.assert_allclose(float(jnp.std(samples)), 0.75, atol=0.05)
        assert 0.05 < float(state.acceptance_rate) < 0.95

    def test_energies_track_log_target(self):
        target = d.Independent(d.Normal(jnp.zeros(1), jnp.ones(1)), 1)
        enc, pri, dec = _independence_sampler_fns()
        step = make_mcmc_step(enc, pri, dec, target.log_prob)
        configs = jnp.linspace(-1, 1, 8)[:, None]
        state = MCMCState.create(configs, target.log_prob(configs),
                                 jax.random.PRNGKey(0))
        state, _ = run_mcmc(step, state, 5)
        np.testing.assert_allclose(state.energies,
                                   target.log_prob(state.configs), atol=1e-5)

    def test_trajectory_collection(self):
        target = d.Independent(d.Normal(jnp.zeros(1), jnp.ones(1)), 1)
        enc, pri, dec = _independence_sampler_fns()
        step = make_mcmc_step(enc, pri, dec, target.log_prob)
        configs = jnp.zeros((16, 1))
        state = MCMCState.create(configs, target.log_prob(configs),
                                 jax.random.PRNGKey(0))
        state, traj = run_mcmc(step, state, 20, collect_every=5)
        assert traj.shape == (4, 16, 1)

    def test_collect_every_divisibility(self):
        with pytest.raises(ValueError):
            run_mcmc(lambda s: s, MCMCState.create(
                jnp.zeros((2, 1)), jnp.zeros(2), jax.random.PRNGKey(0)),
                10, collect_every=3)

    def test_rejected_moves_keep_state(self):
        # An impossible target for proposals: log density -inf off the
        # current point would reject everything; use a huge energy gap.
        def log_target(x):
            return jnp.where(jnp.abs(x[..., 0]) < 1e-6, 0.0, -1e10)

        enc, pri, dec = _independence_sampler_fns()
        step = make_mcmc_step(enc, pri, dec, log_target)
        configs = jnp.zeros((32, 1))
        state = MCMCState.create(configs, log_target(configs),
                                 jax.random.PRNGKey(0))
        state, _ = run_mcmc(step, state, 10)
        np.testing.assert_allclose(state.configs, configs)
        assert float(state.acceptance_rate) == 0.0


class TestFullPipelineStatistics:
    """End-to-end: train a VAE on target samples, use it as the MC
    proposal, and check the chains reproduce the target's moments — the
    statistical-correctness coverage SURVEY.md §4 calls out as missing
    in the reference."""

    def test_trained_vae_mc_recovers_target(self):
        import optax
        from vaemolsim_tpu.dists import StaticFlowedDistribution
        from vaemolsim_tpu.flows import RQSSplineMAF

        target = d.MixtureSameFamily(
            jnp.zeros(2), d.Normal(jnp.array([-1.5, 1.5]),
                                   0.6 * jnp.ones(2)))

        def log_target(x):
            return target.log_prob(x[..., 0])

        data = target.sample(jax.random.PRNGKey(0), (2048,))[:, None]
        keys = jax.random.split(jax.random.PRNGKey(1), 3)
        enc = MappingToDistribution.create(
            keys[0], IndependentBlockwise.create(1, "normal"),
            input_shape=1, mapping_kwargs={"hidden_dim": 32})
        dec = MappingToDistribution.create(
            keys[1], IndependentBlockwise.create(1, "normal"),
            input_shape=1, mapping_kwargs={"hidden_dim": 32})
        prior = StaticFlowedDistribution(
            flow=RQSSplineMAF.create(
                keys[2], 1, num_blocks=2,
                rqs_params={"num_bins": 16, "hidden_dim": 32,
                            "bin_range": [-4.0, 4.0]}),
            base=d.Independent(d.Normal(jnp.zeros(1), jnp.ones(1)), 1))
        vae = VAE(encoder=enc, decoder=dec, prior=prior,
                  regularizer=losses.KLDivergenceEstimate())

        opt = optax.adam(2e-3)
        st = opt.init(vae)

        @jax.jit
        def step(m, s, k):
            l, g = jax.value_and_grad(
                lambda mm: mm.elbo_loss(data, k)[0])(m)
            u, s = opt.update(g, s)
            return optax.apply_updates(m, u), s

        key = jax.random.PRNGKey(2)
        for _ in range(150):
            key, sub = jax.random.split(key)
            vae, st = step(vae, st, sub)

        from vaemolsim_tpu.mcmc import vae_proposal_fns
        enc_fn, pri_fn, dec_fn = vae_proposal_fns(vae)
        mcstep = make_mcmc_step(enc_fn, pri_fn, dec_fn, log_target)
        # Start chains at data samples (the reference MC notebook's
        # workflow) and check equilibrium is *preserved*.
        configs = data[:512]
        state = MCMCState.create(configs, log_target(configs),
                                 jax.random.PRNGKey(3))
        state, _ = jax.jit(lambda s: run_mcmc(mcstep, s, 300))(state)
        chains = state.configs[:, 0]
        # Target: mean 0, std = sqrt(1.5^2 + 0.6^2) ~ 1.616.
        acc = float(state.acceptance_rate)
        assert 0.05 < acc < 0.98
        np.testing.assert_allclose(float(jnp.mean(chains)), 0.0, atol=0.25)
        np.testing.assert_allclose(float(jnp.std(chains)), 1.616, atol=0.25)
        # Both modes stay populated.
        frac = float(jnp.mean(chains > 0))
        assert 0.3 < frac < 0.7

        # Same check with bfloat16 proposal nets (the bench's fast mode):
        # MH remains exact because fwd/rev densities share the bf16 nets.
        from vaemolsim_tpu.nn.core import set_compute_dtype
        try:
            set_compute_dtype(jnp.bfloat16)
            state_bf = MCMCState.create(configs, log_target(configs),
                                        jax.random.PRNGKey(7))
            mcstep_bf = make_mcmc_step(enc_fn, pri_fn, dec_fn, log_target)
            state_bf, _ = jax.jit(
                lambda s: run_mcmc(mcstep_bf, s, 300))(state_bf)
        finally:
            set_compute_dtype(None)
        chains_bf = state_bf.configs[:, 0]
        np.testing.assert_allclose(float(jnp.mean(chains_bf)), 0.0,
                                   atol=0.25)
        np.testing.assert_allclose(float(jnp.std(chains_bf)), 1.616,
                                   atol=0.25)


class TestMCMCDriver:
    """Reference-style bookkeeping tests (test_mcmc.py:39-59) with a tiny
    trained VAE."""

    @pytest.fixture(scope="class")
    def tiny_vae(self):
        import optax
        keys = jax.random.split(jax.random.PRNGKey(0), 2)
        enc = MappingToDistribution.create(
            keys[0], IndependentBlockwise.create(1, "normal"),
            input_shape=2, mapping_kwargs={"hidden_dim": 8})
        dec = MappingToDistribution.create(
            keys[1], IndependentBlockwise.create(2, "normal"),
            input_shape=1, mapping_kwargs={"hidden_dim": 8})
        prior = d.Independent(d.Normal(jnp.zeros(1), jnp.ones(1)), 1)
        vae = VAE(encoder=enc, decoder=dec, prior=prior,
                  regularizer=losses.KLDivergenceEstimate())
        data = jax.random.normal(jax.random.PRNGKey(1), (256, 2))
        opt = optax.adam(1e-3)
        st = opt.init(vae)

        @jax.jit
        def step(m, s, k):
            l, g = jax.value_and_grad(
                lambda mm: mm.elbo_loss(data, k)[0])(m)
            u, s = opt.update(g, s)
            return optax.apply_updates(m, u), s

        key = jax.random.PRNGKey(2)
        for _ in range(20):
            key, sub = jax.random.split(key)
            vae, st = step(vae, st, sub)
        return vae

    def quad_log_target(self, x):
        # Quadratic test energy as log density (reference
        # test_mcmc.py:29-32 sign-adjusted).
        return -0.5 * jnp.sum(x ** 2, axis=-1)

    def test_single_step_bookkeeping(self, tiny_vae):
        mc = MCMC(tiny_vae, self.quad_log_target, random_seed=3)
        configs = jax.random.normal(jax.random.PRNGKey(4), (20, 2))
        new_c, new_e = mc.single_step(configs)
        assert new_c.shape == (20, 2)
        assert new_e.shape == (20,)
        assert mc._num_trials == 20
        assert 0.0 <= mc.acceptance_rate <= 1.0

    def test_run_accumulates_trials(self, tiny_vae):
        mc = MCMC(tiny_vae, self.quad_log_target, random_seed=3)
        configs = jax.random.normal(jax.random.PRNGKey(4), (10, 2))
        mc.run(configs, n_steps=7)
        assert mc._num_trials == 70
        assert 0.0 <= mc.acceptance_rate <= 1.0

    def test_reset(self, tiny_vae):
        mc = MCMC(tiny_vae, self.quad_log_target, random_seed=3)
        mc.run(jnp.zeros((4, 2)), n_steps=2)
        mc.reset(random_seed=5)
        assert mc._num_trials == 0.0

    def test_energies_passthrough(self, tiny_vae):
        mc = MCMC(tiny_vae, self.quad_log_target, random_seed=3)
        configs = jnp.zeros((6, 2))
        energies = self.quad_log_target(configs)
        new_c, new_e = mc.run(configs, energies=energies, n_steps=3)
        np.testing.assert_allclose(new_e, self.quad_log_target(new_c),
                                   atol=1e-5)


class TestMoveComposition:
    """Mixed/cycled move kernels must preserve the target (new capability
    beyond the reference's pure-VAE moves)."""

    def _target(self):
        return d.Independent(d.Normal(jnp.full(1, 1.0),
                                      jnp.full(1, 0.75)), 1)

    def test_random_walk_recovers_target(self):
        from vaemolsim_tpu.mcmc import make_random_walk_step
        target = self._target()
        step = make_random_walk_step(target.log_prob, scale=0.8)
        st = MCMCState.create(jnp.zeros((512, 1)),
                              target.log_prob(jnp.zeros((512, 1))),
                              jax.random.PRNGKey(0))
        st, _ = jax.jit(lambda s: run_mcmc(step, s, 500))(st)
        np.testing.assert_allclose(float(jnp.mean(st.configs)), 1.0,
                                   atol=0.08)
        np.testing.assert_allclose(float(jnp.std(st.configs)), 0.75,
                                   atol=0.08)

    def test_mala_recovers_target(self):
        """MALA with the exact asymmetric-proposal correction preserves
        the target (2-D anisotropic Gaussian — the asymmetry term is
        load-bearing: plain Langevin without it is biased)."""
        from vaemolsim_tpu.mcmc import make_mala_step
        scales = jnp.asarray([0.6, 1.4])
        target = d.Independent(d.Normal(jnp.asarray([1.0, -1.0]), scales), 1)
        step = make_mala_step(target.log_prob, step_size=0.3)
        st = MCMCState.create(jnp.zeros((1024, 2)),
                              target.log_prob(jnp.zeros((1024, 2))),
                              jax.random.PRNGKey(0))
        st, _ = jax.jit(lambda s: run_mcmc(step, s, 1500))(st)
        np.testing.assert_allclose(
            np.asarray(jnp.mean(st.configs, 0)), [1.0, -1.0], atol=0.12)
        np.testing.assert_allclose(
            np.asarray(jnp.std(st.configs, 0)), np.asarray(scales),
            atol=0.12)
        assert 0.3 < float(st.acceptance_rate) < 1.0

    def test_mala_cycles_with_vae_moves(self):
        """MALA composes with the VAE jump kernel through cycle_moves."""
        from vaemolsim_tpu.mcmc import cycle_moves, make_mala_step
        target = self._target()
        enc, pri, dec = _independence_sampler_fns()
        vae_step = make_mcmc_step(enc, pri, dec, target.log_prob)
        step = cycle_moves([vae_step,
                            make_mala_step(target.log_prob, 0.1)])
        st = MCMCState.create(jnp.zeros((256, 1)),
                              target.log_prob(jnp.zeros((256, 1))),
                              jax.random.PRNGKey(0))
        st, _ = jax.jit(lambda s: run_mcmc(step, s, 300))(st)
        np.testing.assert_allclose(float(jnp.mean(st.configs)), 1.0,
                                   atol=0.08)
        assert float(st.num_trials) == 2 * 300 * 256

    def test_hmc_recovers_target(self):
        """HMC (leapfrog + Hamiltonian MH correction) preserves an
        anisotropic Gaussian target — both the trajectory integrator
        and the kinetic-energy bookkeeping are load-bearing."""
        from vaemolsim_tpu.mcmc import make_hmc_step
        scales = jnp.asarray([0.6, 1.4])
        target = d.Independent(d.Normal(jnp.asarray([1.0, -1.0]), scales), 1)
        step = make_hmc_step(target.log_prob, step_size=0.25, n_leapfrog=8)
        st = MCMCState.create(jnp.zeros((1024, 2)),
                              target.log_prob(jnp.zeros((1024, 2))),
                              jax.random.PRNGKey(0))
        st, _ = jax.jit(lambda s: run_mcmc(step, s, 400))(st)
        np.testing.assert_allclose(
            np.asarray(jnp.mean(st.configs, 0)), [1.0, -1.0], atol=0.12)
        np.testing.assert_allclose(
            np.asarray(jnp.std(st.configs, 0)), np.asarray(scales),
            atol=0.12)
        assert 0.5 < float(st.acceptance_rate) <= 1.0

    def test_hmc_small_step_near_exact_energy(self):
        """Leapfrog is symplectic: at a small step size the Hamiltonian
        error is tiny, so acceptance is ~1 while chains still travel
        (the signature HMC property; a broken integrator fails this)."""
        from vaemolsim_tpu.mcmc import make_hmc_step
        target = d.Independent(d.Normal(jnp.zeros(4), jnp.ones(4)), 1)
        step = make_hmc_step(target.log_prob, step_size=0.01, n_leapfrog=20)
        x0 = jnp.zeros((256, 4))
        st = MCMCState.create(x0, target.log_prob(x0), jax.random.PRNGKey(1))
        st, _ = jax.jit(lambda s: run_mcmc(step, s, 50))(st)
        assert float(st.acceptance_rate) > 0.99
        assert float(jnp.mean(jnp.abs(st.configs))) > 0.01  # moved

    def test_hmc_cycles_and_counts(self):
        from vaemolsim_tpu.mcmc import (cycle_moves, make_hmc_step,
                                        make_random_walk_step)
        target = self._target()
        step = cycle_moves([make_hmc_step(target.log_prob, 0.2, 5),
                            make_random_walk_step(target.log_prob, 0.5)])
        st = MCMCState.create(jnp.zeros((256, 1)),
                              target.log_prob(jnp.zeros((256, 1))),
                              jax.random.PRNGKey(0))
        st, _ = jax.jit(lambda s: run_mcmc(step, s, 300))(st)
        np.testing.assert_allclose(float(jnp.mean(st.configs)), 1.0,
                                   atol=0.08)
        assert float(st.num_trials) == 2 * 300 * 256

    def test_tune_scale_hmc(self):
        from vaemolsim_tpu.mcmc import make_hmc_step, tune_scale
        target = d.Independent(d.Normal(jnp.zeros(2), jnp.ones(2)), 1)
        st = MCMCState.create(jnp.zeros((256, 2)),
                              target.log_prob(jnp.zeros((256, 2))),
                              jax.random.PRNGKey(0))
        eps, st = tune_scale(target.log_prob, st, kind="hmc",
                             init_scale=0.02, n_leapfrog=5)
        step = make_hmc_step(target.log_prob, step_size=eps, n_leapfrog=5)
        st, _ = jax.jit(lambda s: run_mcmc(step, s, 200))(st)
        assert 0.5 < float(st.acceptance_rate) < 0.85

    def test_hmc_validates_n_leapfrog(self):
        from vaemolsim_tpu.mcmc import make_hmc_step
        with pytest.raises(ValueError, match="n_leapfrog"):
            make_hmc_step(lambda x: -jnp.sum(x ** 2, -1), 0.1, 0)

    def test_tune_scale_random_walk_hits_target_acceptance(self):
        """Robbins-Monro warmup lands within a band of the 0.234 target;
        the tuned fixed-scale production kernel stays there."""
        from vaemolsim_tpu.mcmc import make_random_walk_step, tune_scale
        target = d.Independent(d.Normal(jnp.zeros(3), jnp.ones(3)), 1)
        st = MCMCState.create(jnp.zeros((256, 3)),
                              target.log_prob(jnp.zeros((256, 3))),
                              jax.random.PRNGKey(0))
        scale, st = tune_scale(target.log_prob, st, kind="random_walk")
        assert scale > 0.0
        assert float(st.num_trials) == 0  # warmup not counted
        step = make_random_walk_step(target.log_prob, scale=scale)
        st, _ = jax.jit(lambda s: run_mcmc(step, s, 200))(st)
        assert 0.15 < float(st.acceptance_rate) < 0.35

    def test_tune_scale_mala(self):
        from vaemolsim_tpu.mcmc import make_mala_step, tune_scale
        target = d.Independent(d.Normal(jnp.zeros(2), jnp.ones(2)), 1)
        st = MCMCState.create(jnp.zeros((256, 2)),
                              target.log_prob(jnp.zeros((256, 2))),
                              jax.random.PRNGKey(0))
        eps, st = tune_scale(target.log_prob, st, kind="mala",
                             init_scale=0.01)
        step = make_mala_step(target.log_prob, step_size=eps)
        st, _ = jax.jit(lambda s: run_mcmc(step, s, 200))(st)
        assert 0.45 < float(st.acceptance_rate) < 0.72

    def test_tune_scale_bf16_configs(self):
        """The tuner works with bf16 chain state (the repo's standard
        compute dtype) — the log-scale carry stays float32."""
        from vaemolsim_tpu.mcmc import tune_scale
        lt = lambda x: -0.5 * jnp.sum(  # noqa: E731
            x.astype(jnp.float32) ** 2, axis=-1)
        x0 = jnp.zeros((64, 2), jnp.bfloat16)
        st = MCMCState.create(x0, lt(x0), jax.random.PRNGKey(0))
        scale, st2 = tune_scale(lt, st, kind="random_walk", rounds=10)
        assert scale > 0.0
        assert st2.configs.dtype == jnp.bfloat16

    def test_tune_scale_bad_kind_raises(self):
        import pytest
        from vaemolsim_tpu.mcmc import tune_scale
        st = MCMCState.create(jnp.zeros((8, 1)), jnp.zeros((8,)),
                              jax.random.PRNGKey(0))
        with pytest.raises(ValueError, match="unknown move kind"):
            tune_scale(lambda x: -jnp.sum(x * x, -1), st, kind="nuts")

    def test_mixture_recovers_target(self):
        from vaemolsim_tpu.mcmc import make_random_walk_step, mix_moves
        target = self._target()
        enc, pri, dec = _independence_sampler_fns()
        vae_step = make_mcmc_step(enc, pri, dec, target.log_prob)
        rw_step = make_random_walk_step(target.log_prob, scale=0.5)
        step = mix_moves([vae_step, rw_step], [0.5, 0.5])
        st = MCMCState.create(jnp.zeros((512, 1)),
                              target.log_prob(jnp.zeros((512, 1))),
                              jax.random.PRNGKey(1))
        st, _ = jax.jit(lambda s: run_mcmc(step, s, 400))(st)
        np.testing.assert_allclose(float(jnp.mean(st.configs)), 1.0,
                                   atol=0.08)
        np.testing.assert_allclose(float(jnp.std(st.configs)), 0.75,
                                   atol=0.08)

    def test_cycle_counts_both_trials(self):
        from vaemolsim_tpu.mcmc import cycle_moves, make_random_walk_step
        target = self._target()
        rw = make_random_walk_step(target.log_prob, scale=0.5)
        step = cycle_moves([rw, rw])
        st = MCMCState.create(jnp.zeros((16, 1)),
                              target.log_prob(jnp.zeros((16, 1))),
                              jax.random.PRNGKey(2))
        st, _ = run_mcmc(step, st, 3)
        assert float(st.num_trials) == 16 * 3 * 2

    def test_mix_validation(self):
        from vaemolsim_tpu.mcmc import mix_moves
        with pytest.raises(ValueError):
            mix_moves([lambda s: s], [0.5, 0.5])


def test_counters_are_exact_integers():
    """Acceptance counters are exact wide integers: float32 loses
    exactness past 2^24 and a single int32 wraps at 2.1e9 trials (~20 s
    at the benched 100M props/s, e.g. 50k chains x 43k steps in one
    scan); the two-word Counter stays exact to 2^61."""
    from vaemolsim_tpu.mcmc import Counter
    st = MCMCState.create(jnp.zeros((4, 1)), jnp.zeros((4,)),
                          jax.random.PRNGKey(0))
    assert st.num_trials.lo.dtype == jnp.int32
    assert st.num_trials.hi.dtype == jnp.int32
    # Exact past the float32 mantissa.
    big = st.replace(num_trials=Counter.of(2 ** 24 + 7))
    assert int(big.num_trials.add(4)) == 2 ** 24 + 11
    # Exact past the int32 range: the 50k x 43k scenario and beyond.
    c = Counter.of(2 ** 31 - 5)
    for _ in range(3):
        c = c.add(50_000)
    assert int(c) == 2 ** 31 - 5 + 3 * 50_000  # a single int32 wrapped here
    # Traced accumulation (the scan path) carries identically.
    def body(cc, _):
        return cc.add(jnp.asarray(50_000, jnp.int32)), None
    c2, _ = jax.lax.scan(body, Counter.of(2 ** 31 - 5), None, length=3)
    assert int(c2) == int(c)
    # Round-trip of a huge count and float32 rate sanity.
    assert int(Counter.of(3 * 10 ** 12)) == 3 * 10 ** 12
    rate = Counter.of(10 ** 10).to_float() / Counter.of(4 * 10 ** 10).to_float()
    np.testing.assert_allclose(float(rate), 0.25, rtol=1e-6)


def test_hmc_zero_leapfrog_rejected_everywhere():
    """n_leapfrog < 1 is the identity kernel (acceptance 1, no motion,
    diverging tuner) — every HMC entry point must reject it."""
    import pytest
    from vaemolsim_tpu.mcmc import ais, make_hmc_step, tune_scale
    lt = lambda x: -0.5 * jnp.sum(x * x, -1)  # noqa: E731
    st = MCMCState.create(jnp.zeros((8, 1)), jnp.zeros((8,)),
                          jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="n_leapfrog"):
        make_hmc_step(lt, 0.1, 0)
    with pytest.raises(ValueError, match="n_leapfrog"):
        tune_scale(lt, st, kind="hmc", n_leapfrog=0)
    with pytest.raises(ValueError, match="n_leapfrog"):
        ais(lt, lt, jnp.zeros((8, 1)), jax.random.PRNGKey(0),
            n_stages=2, kind="hmc", n_leapfrog=0)
