"""Mesh sharding + replica exchange tests on the 8-device virtual CPU
mesh (the driver's dryrun environment)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vaemolsim_tpu.mcmc import MCMCState, make_mcmc_step, run_mcmc
from vaemolsim_tpu.ops import distributions as d
from vaemolsim_tpu.parallel import (REMCState, chain_sharding, make_mesh,
                                    make_remc_step, run_remc,
                                    shard_chain_state, temperature_ladder)


def independence_fns(scale=2.0):
    def encoder_fn(x):
        zeros = jnp.zeros(x.shape[:-1] + (1,))
        return d.Independent(d.Normal(zeros, jnp.ones_like(zeros)), 1)

    def decoder_fn(z):
        loc = jnp.zeros(z.shape[:-1] + (1,))
        return d.Independent(d.Normal(loc, scale * jnp.ones_like(loc)), 1)

    return encoder_fn, encoder_fn, decoder_fn


class TestMesh:

    def test_make_mesh_default(self):
        mesh = make_mesh()
        assert mesh.devices.size == 8
        assert mesh.axis_names == ("chain",)

    def test_make_mesh_2d(self):
        mesh = make_mesh({"replica": 4, "chain": -1})
        assert mesh.devices.shape == (4, 2)

    def test_bad_mesh_raises(self):
        with pytest.raises(ValueError):
            make_mesh({"chain": 3})

    def test_sharded_mcmc_run(self):
        # Chain-parallel MC over the mesh: correctness must be unaffected
        # and the output must stay chain-sharded.
        target = d.Independent(d.Normal(jnp.full(1, 1.0),
                                        jnp.full(1, 0.75)), 1)
        enc, pri, dec = independence_fns()
        step = make_mcmc_step(enc, pri, dec, target.log_prob)
        mesh = make_mesh()
        configs = jnp.zeros((1024, 1))
        state = MCMCState.create(configs, target.log_prob(configs),
                                 jax.random.PRNGKey(0))
        state = shard_chain_state(state, mesh)
        assert state.configs.sharding.spec == P("chain", None)

        final, _ = jax.jit(lambda s: run_mcmc(step, s, 300))(state)
        samples = final.configs[:, 0]
        np.testing.assert_allclose(float(jnp.mean(samples)), 1.0, atol=0.06)
        np.testing.assert_allclose(float(jnp.std(samples)), 0.75, atol=0.06)
        # Output sharding preserved through the scan.
        assert "chain" in str(final.configs.sharding)


class TestReplicaExchange:

    def _setup(self, R=4, C=128, key=0):
        target = d.Independent(d.Normal(jnp.full(1, 1.0),
                                        jnp.full(1, 0.75)), 1)
        enc, pri, dec = independence_fns()
        step = make_remc_step(enc, pri, dec, target.log_prob,
                              exchange_every=2)
        betas = temperature_ladder(R)
        configs = jnp.zeros((R, C, 1))
        state = REMCState.create(configs, target.log_prob, betas,
                                 jax.random.PRNGKey(key))
        return target, step, state

    def test_ladder(self):
        betas = temperature_ladder(4, beta_min=0.25)
        np.testing.assert_allclose(betas[0], 1.0)
        np.testing.assert_allclose(betas[-1], 0.25)
        assert jnp.all(jnp.diff(betas) < 0)

    def test_cold_replica_recovers_target(self):
        target, step, state = self._setup()
        final = jax.jit(lambda s: run_remc(step, s, 400))(state)
        cold = final.configs[0, :, 0]  # beta = 1 replica
        np.testing.assert_allclose(float(jnp.mean(cold)), 1.0, atol=0.1)
        np.testing.assert_allclose(float(jnp.std(cold)), 0.75, atol=0.1)
        assert 0.0 < float(final.acceptance_rate) < 1.0

    def test_swaps_happen(self):
        _, step, state = self._setup()
        final = run_remc(step, state, 50)
        assert float(final.num_swap_trials) > 0
        assert 0.0 < float(final.swap_acceptance_rate) <= 1.0

    def test_hot_replica_broader(self):
        target, step, state = self._setup()
        final = jax.jit(lambda s: run_remc(step, s, 400))(state)
        # With an independence proposal the stationary spread of each
        # tempered replica grows as beta shrinks.
        cold_std = float(jnp.std(final.configs[0, :, 0]))
        hot_std = float(jnp.std(final.configs[-1, :, 0]))
        assert hot_std > cold_std

    def test_each_replica_targets_tempered_density(self):
        # With a Gaussian target N(mu, s), replica r's stationary
        # distribution is pi^beta = N(mu, s/sqrt(beta_r)) exactly; check
        # the measured per-replica std against the analytic value.
        target = d.Independent(d.Normal(jnp.full(1, 1.0),
                                        jnp.full(1, 0.75)), 1)
        enc, pri, dec = independence_fns(scale=3.0)
        betas = temperature_ladder(3, beta_min=0.25)
        step = make_remc_step(enc, pri, dec, target.log_prob,
                              exchange_every=1_000_000)  # no swaps
        configs = jnp.ones((3, 2048, 1))
        state = REMCState.create(configs, target.log_prob, betas,
                                 jax.random.PRNGKey(11))
        final = jax.jit(lambda s: run_remc(step, s, 400))(state)
        for r in range(3):
            want = 0.75 / float(jnp.sqrt(betas[r]))
            got = float(jnp.std(final.configs[r, :, 0]))
            np.testing.assert_allclose(got, want, rtol=0.12,
                                       err_msg=f"replica {r}")
            np.testing.assert_allclose(
                float(jnp.mean(final.configs[r, :, 0])), 1.0, atol=0.1)

    def test_energies_stay_consistent(self):
        target, step, state = self._setup()
        final = run_remc(step, state, 21)
        np.testing.assert_allclose(final.energies,
                                   target.log_prob(final.configs),
                                   atol=1e-4)

    def test_sharded_over_replica_and_chain(self):
        target, step, state = self._setup(R=4, C=64)
        mesh = make_mesh({"replica": 4, "chain": -1})
        spec3 = NamedSharding(mesh, P("replica", "chain", None))
        spec2 = NamedSharding(mesh, P("replica", "chain"))
        state = state.replace(
            configs=jax.device_put(state.configs, spec3),
            energies=jax.device_put(state.energies, spec2),
            betas=jax.device_put(state.betas,
                                 NamedSharding(mesh, P("replica"))))
        final = jax.jit(lambda s: run_remc(step, s, 40))(state)
        assert jnp.all(jnp.isfinite(final.energies))
        assert float(final.num_swap_trials) > 0


class TestHybridMesh:
    """SURVEY.md §2.4: ICI within a slice, DCN across slices.  On the
    virtual CPU mesh the slice structure is emulated (no slice_index on
    CPU devices); the logical layout — DCN axes outermost — is what the
    multi-slice compile path consumes."""

    def test_hybrid_mesh_axes(self):
        from vaemolsim_tpu.parallel import make_hybrid_mesh
        mesh = make_hybrid_mesh({"replica": 2}, {"chain": -1})
        assert mesh.axis_names == ("replica", "chain")
        assert mesh.devices.shape == (2, 4)

    def test_hybrid_mesh_bad_sizes_raise(self):
        from vaemolsim_tpu.parallel import make_hybrid_mesh
        with pytest.raises(ValueError, match="does not use all|divide"):
            make_hybrid_mesh({"replica": 3}, {"chain": 2})

    def test_hybrid_mesh_dcn_wildcard(self):
        """A -1 DCN axis resolves against the remainder over the
        explicit ICI axes (not the whole device count) on the emulated
        single-slice path — matching multi-slice hardware."""
        from vaemolsim_tpu.parallel import make_hybrid_mesh
        mesh = make_hybrid_mesh({"replica": -1}, {"chain": 4})
        assert mesh.axis_names == ("replica", "chain")
        assert mesh.devices.shape == (2, 4)

    def test_remc_on_hybrid_mesh(self):
        """Replica-exchange ladder with the replica axis across the
        (emulated) DCN dimension and chains over ICI — the config-5
        multi-slice layout compiles and runs SPMD."""
        from vaemolsim_tpu.parallel import make_hybrid_mesh
        target, step, state = TestReplicaExchange._setup(
            TestReplicaExchange(), R=2, C=32)
        mesh = make_hybrid_mesh({"replica": 2}, {"chain": -1})
        spec3 = NamedSharding(mesh, P("replica", "chain", None))
        spec2 = NamedSharding(mesh, P("replica", "chain"))
        state = state.replace(
            configs=jax.device_put(state.configs, spec3),
            energies=jax.device_put(state.energies, spec2),
            betas=jax.device_put(state.betas,
                                 NamedSharding(mesh, P("replica"))))
        final = jax.jit(lambda s: run_remc(step, s, 20))(state)
        assert jnp.all(jnp.isfinite(final.energies))
        assert float(final.num_swap_trials) > 0


class TestShardingUtils:

    def test_replicate_params(self):
        from vaemolsim_tpu.parallel import make_mesh, replicate
        mesh = make_mesh()
        tree = {"w": jnp.ones((4, 4)), "b": jnp.zeros(4)}
        rep = jax.tree_util.tree_map(lambda x: x, replicate(tree, mesh))
        for leaf in jax.tree_util.tree_leaves(rep):
            assert leaf.sharding.is_fully_replicated

    def test_chain_sharding_2d(self):
        from vaemolsim_tpu.parallel import chain_sharding, make_mesh
        mesh = make_mesh({"replica": 4, "chain": -1})
        s = chain_sharding(mesh, ndim=3, chain_axis=1, mesh_axis="chain")
        assert s.spec == P(None, "chain", None)
