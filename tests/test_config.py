"""Typed config round trips + checkpointed MC runs (fault tolerance)."""

import jax
import jax.numpy as jnp
import numpy as np

from vaemolsim_tpu import config as cfg
from vaemolsim_tpu.mcmc import (MCMCState, make_mcmc_step,
                                run_mcmc_checkpointed)
from vaemolsim_tpu.ops import distributions as d
from vaemolsim_tpu.train import CheckpointManager


class TestConfigs:

    def test_maf_config_builds_and_roundtrips(self):
        c = cfg.MAFConfig(data_dim=3, num_blocks=2, order_seed=7,
                          rqs=cfg.RQSParams(num_bins=8, hidden_dim=16))
        flow = c.build(jax.random.PRNGKey(0))
        assert flow.data_dim == 3
        d2 = cfg.to_dict(c)
        c2 = cfg.from_dict(cfg.MAFConfig, d2)
        assert c2.order_seed == 7
        # Same config + same key -> identical parameters.
        flow2 = cfg.MAFConfig(**{**d2, "rqs": cfg.RQSParams(**d2["rqs"])}
                              ).build(jax.random.PRNGKey(0))
        for a, b in zip(jax.tree_util.tree_leaves(flow),
                        jax.tree_util.tree_leaves(flow2)):
            np.testing.assert_array_equal(a, b)

    def test_conditional_rqs_params(self):
        p = cfg.RQSParams(conditional=True, conditional_event_shape=5,
                          num_bins=8, hidden_dim=16)
        c = cfg.MAFConfig(data_dim=2, rqs=p)
        flow = c.build(jax.random.PRNGKey(0))
        assert flow.conditional

    def test_mapping_and_embedding_configs(self):
        m = cfg.MappingConfig(input_shape=4, target_shape=6,
                              hidden_dim=[8, 8]).build(jax.random.PRNGKey(0))
        assert m(jnp.ones((2, 4))).shape == (2, 6)
        e = cfg.ParticleEmbeddingConfig(info_dim=2, embedding_dim=6,
                                        num_blocks=1).build(
            jax.random.PRNGKey(1))
        out = e(jnp.ones((2, 3, 3)), jnp.ones((2, 3, 2)))
        assert out.shape == (2, 6)


class TestCheckpointedRun:

    def test_segments_and_resume(self, tmp_path):
        target = d.Independent(d.Normal(jnp.zeros(1), jnp.ones(1)), 1)

        def enc(x):
            z = jnp.zeros(x.shape[:-1] + (1,))
            return d.Independent(d.Normal(z, jnp.ones_like(z)), 1)

        def dec(z):
            l = jnp.zeros(z.shape[:-1] + (1,))
            return d.Independent(d.Normal(l, 2.0 * jnp.ones_like(l)), 1)

        step = make_mcmc_step(enc, enc, dec, target.log_prob)
        state = MCMCState.create(jnp.zeros((16, 1)),
                                 target.log_prob(jnp.zeros((16, 1))),
                                 jax.random.PRNGKey(0))
        mgr = CheckpointManager(str(tmp_path / "mc"), max_to_keep=5)
        final = run_mcmc_checkpointed(step, state, n_steps=10,
                                      checkpoint_every=4, manager=mgr)
        assert float(final.num_trials) == 160.0
        assert mgr.latest_step() == 10
        # Restore the middle checkpoint and continue: must reach the same
        # trial count (deterministic given the stored key).
        mid = mgr.restore(state, step=8)
        assert float(mid.num_trials) == 128.0
        resumed = run_mcmc_checkpointed(step, mid, n_steps=2,
                                        checkpoint_every=2, manager=mgr)
        np.testing.assert_allclose(resumed.configs, final.configs, atol=1e-6)
        mgr.close()


def test_distance_selection_config_builds():
    sel = cfg.DistanceSelectionConfig(cutoff=2.5, max_included=4,
                                      box_lengths=[10.0, 10.0, 10.0]).build()
    coords = jnp.array([[[9.5, 0, 0], [1.0, 0, 0]]])
    out, mask, _ = sel(coords, jnp.zeros((1, 3)))
    np.testing.assert_allclose(out[0, 0], [-0.5, 0, 0], atol=1e-6)


def test_realnvp_config_builds():
    c = cfg.RealNVPConfig(data_dim=2, num_blocks=2,
                          rqs=cfg.RQSParams(num_bins=8, hidden_dim=16))
    flow = c.build(jax.random.PRNGKey(0))
    x = jnp.ones((3, 2))
    y = flow(x)
    assert y.shape == (3, 2)


def test_realnvp_config_rejects_conditional():
    c = cfg.RealNVPConfig(rqs=cfg.RQSParams(conditional=True,
                                            conditional_event_shape=4))
    import pytest as _pytest
    with _pytest.raises(ValueError):
        c.build(jax.random.PRNGKey(0))
