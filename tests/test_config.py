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


class TestUntaggedDicts:
    """from_dict on untagged dicts must resolve Union-annotated fields
    by key coverage (never silently build the first member with
    defaults) and reject unknown keys."""

    def test_union_resolves_by_keys(self):
        import dataclasses
        c = cfg.ExperimentConfig(
            model=cfg.FlowModelConfig(
                input_shape=1,
                flowed_dist=cfg.FlowedDistConfig(
                    flow=cfg.MAFConfig(data_dim=1,
                                       rqs=cfg.RQSParams(num_bins=4,
                                                         hidden_dim=8)),
                    static_base_dim=1)))
        back = cfg.from_dict(cfg.ExperimentConfig, dataclasses.asdict(c))
        assert isinstance(back.model, cfg.FlowModelConfig)
        assert back.model.flowed_dist.flow.rqs.num_bins == 4

    def test_unknown_keys_raise(self):
        import pytest
        with pytest.raises(ValueError, match="no fields"):
            cfg.from_dict(cfg.VAEConfig, {"not_a_field": 1})

    def test_unmatchable_union_raises(self):
        import pytest
        with pytest.raises(ValueError, match="matches none"):
            cfg.from_dict(cfg.ExperimentConfig,
                          {"model": {"definitely_not": 1}})

    def test_ambiguous_partial_union_raises(self):
        """A partial dict whose keys fit several Union members (e.g.
        RealNVPConfig's fields are a subset of MAFConfig's) must demand a
        tag, never silently build the first member."""
        import pytest
        with pytest.raises(ValueError, match="ambiguous"):
            cfg.from_dict(cfg.FlowedDistConfig,
                          {"flow": {"data_dim": 2, "num_blocks": 4}})


class TestModelConfigs:
    """VERDICT item 5: typed configs for dist layers, losses, models, and
    a one-JSON experiment (reference get_config analog,
    vaemolsim/models.py:141-148)."""

    def test_dist_layer_config_kinds(self):
        for kind, needs_key in [("independent_blockwise", False),
                                ("autoregressive_blockwise", True),
                                ("independent_von_mises", False),
                                ("independent_deterministic", False)]:
            c = cfg.DistLayerConfig(kind=kind, num_dofs=3,
                                    auto_net_params={"hidden_units": [8]})
            layer = c.build(jax.random.PRNGKey(0) if needs_key else None)
            assert layer is not None

    def test_regularizer_config_kinds(self):
        from vaemolsim_tpu import losses
        assert isinstance(cfg.RegularizerConfig(kind="none").build(),
                          losses.NonRegularizer)
        r = cfg.RegularizerConfig(kind="kl", weight=0.5).build()
        assert isinstance(r, losses.KLDivergenceEstimate)
        assert r.weight == 0.5
        assert isinstance(cfg.RegularizerConfig(kind="reverse_kl").build(),
                          losses.ReverseKLDivergenceEstimate)

    def test_flagship_experiment_roundtrip_and_train(self, tmp_path):
        """JSON -> build -> one train step -> checkpoint -> restore; the
        restored model must reproduce the original's loss exactly."""
        from vaemolsim_tpu.train import (make_train_step, restore_checkpoint,
                                         save_checkpoint)
        import optax

        exp = cfg.flagship_experiment_config()
        # Shrink for test speed but keep the full structure.
        exp.model.encoder.mapping_kwargs = {"hidden_dim": 16}
        exp.model.decoder.mapping_kwargs = {"hidden_dim": 16}
        exp.model.prior.flow.rqs.hidden_dim = 16
        exp.model.prior.flow.rqs.num_bins = 8

        path = str(tmp_path / "exp.json")
        cfg.save_json(exp, path)
        exp2 = cfg.load_json(path)
        assert isinstance(exp2, cfg.ExperimentConfig)
        assert exp2.model.prior.flow.rqs.num_bins == 8

        model = exp2.build()
        x = jax.random.normal(jax.random.PRNGKey(1), (32, 2))

        def loss_fn(m, batch, key):
            return m.elbo_loss(batch, key, train=False)[0]

        step = make_train_step(loss_fn, exp2.optimizer.build())
        opt_state = exp2.optimizer.build().init(model)
        model, _, loss, _ = step(model, opt_state, x,
                                 jax.random.PRNGKey(2))
        assert jnp.isfinite(loss)

        ckpt = str(tmp_path / "weights")
        save_checkpoint(ckpt, model)
        template = cfg.load_json(path).build()  # config-only rebuild
        restored = restore_checkpoint(ckpt, template)
        l1 = loss_fn(model, x, jax.random.PRNGKey(3))
        l2 = loss_fn(restored, x, jax.random.PRNGKey(3))
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2))

    def test_fresh_process_restore(self, tmp_path):
        """The 'checkpoint = config + weights + seeds' contract holds
        across processes (SURVEY.md §5.4)."""
        import subprocess
        import sys
        import os

        exp = cfg.flagship_experiment_config()
        exp.model.encoder.mapping_kwargs = {"hidden_dim": 8}
        exp.model.decoder.mapping_kwargs = {"hidden_dim": 8}
        exp.model.prior.flow.rqs.hidden_dim = 8
        exp.model.prior.flow.rqs.num_bins = 4
        path = str(tmp_path / "exp.json")
        cfg.save_json(exp, path)
        model = exp.build()
        ref = float(model.elbo_loss(jnp.ones((4, 2)),
                                    jax.random.PRNGKey(7))[0])

        code = (
            "import os\n"
            "os.environ['JAX_PLATFORMS']='cpu'\n"
            "import jax, jax.numpy as jnp\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "from vaemolsim_tpu import config as cfg\n"
            f"exp = cfg.load_json({path!r})\n"
            "m = exp.build()\n"
            "print(float(m.elbo_loss(jnp.ones((4, 2)), "
            "jax.random.PRNGKey(7))[0]))\n")
        env = dict(os.environ)
        env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True, timeout=300)
        assert out.returncode == 0, out.stderr
        np.testing.assert_allclose(float(out.stdout.strip().split()[-1]),
                                   ref, rtol=1e-5)

    def test_backmapping_config_builds_example04_model(self):
        """BackmappingConfig rebuilds the example-04 architecture
        (Molecular_Backmapping workload, SURVEY.md §3.4)."""
        c = cfg.BackmappingConfig(
            selection=cfg.DistanceSelectionConfig(cutoff=3.0,
                                                  max_included=10),
            embedding=cfg.ParticleEmbeddingConfig(info_dim=2,
                                                  embedding_dim=20,
                                                  num_blocks=1),
            decoder=cfg.MappingToDistConfig(
                input_shape=20,
                dist=cfg.FlowedDistConfig(
                    flow=cfg.MAFConfig(
                        data_dim=3, num_blocks=2,
                        rqs=cfg.RQSParams(
                            num_bins=8, hidden_dim=16,
                            bin_range=(-np.pi, np.pi),
                            conditional=True,
                            conditional_event_shape=20)),
                    base=cfg.DistLayerConfig(
                        kind="independent_blockwise", num_dofs=3,
                        families="von_mises")),
                mapping_kwargs={"hidden_dim": 16}))
        c2 = cfg.from_dict(None, cfg.to_tagged_dict(c))
        model = c2.build(jax.random.PRNGKey(0))
        dist = model(jnp.zeros((2, 3)), jnp.ones((2, 8, 3)),
                     jnp.ones((2, 8, 2)))
        lp = dist.log_prob(jnp.zeros((2, 3)))
        assert lp.shape == (2,) and bool(jnp.all(jnp.isfinite(lp)))

    def test_dual_elbo_config(self):
        c = cfg.VAEConfig(
            encoder=cfg.MappingToDistConfig(
                input_shape=2,
                dist=cfg.DistLayerConfig(num_dofs=1),
                mapping_kwargs={"hidden_dim": 8}),
            decoder=cfg.MappingToDistConfig(
                input_shape=1,
                dist=cfg.DistLayerConfig(num_dofs=2),
                mapping_kwargs={"hidden_dim": 8}),
            latent_dim=1, dual_elbo=True)
        from vaemolsim_tpu.models import VAEDualELBO
        model = c.build(jax.random.PRNGKey(0))
        assert isinstance(model, VAEDualELBO)


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
        # Resumed saves continue the step numbering past the manager's
        # latest (orbax drops saves to existing steps silently, and
        # latest-step selection would otherwise return stale state).
        assert mgr.latest_step() == 12
        latest = mgr.restore(state)
        np.testing.assert_allclose(latest.configs, resumed.configs,
                                   atol=1e-6)
        assert int(latest.num_trials) == int(resumed.num_trials)
        mgr.close()

    def test_restore_empty_directory_raises(self, tmp_path):
        import pytest
        mgr = CheckpointManager(str(tmp_path / "empty"))
        with pytest.raises(ValueError, match="no checkpoints"):
            mgr.restore({"a": jnp.zeros(1)})
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


def test_conditional_independent_kind_raises():
    import pytest
    with pytest.raises(ValueError, match="no conditional machinery"):
        cfg.DistLayerConfig(kind="independent_blockwise",
                            conditional=True).build()


def test_weight_decay_requires_adamw():
    import pytest
    with pytest.raises(ValueError, match="adamw"):
        cfg.OptimizerConfig(name="adam", weight_decay=1e-2).build()
    cfg.OptimizerConfig(name="adamw", weight_decay=1e-2).build()


def test_json_roundtrip_preserves_tuples():
    import json
    c = cfg.flagship_experiment_config()
    back = cfg.from_dict(None, json.loads(json.dumps(cfg.to_tagged_dict(c))))
    assert back == c  # incl. bin_range staying a tuple


def test_json_roundtrip_preserves_union_tuples():
    """Tuple fields wrapped in Union/Optional (MappingConfig.input_shape:
    Union[int, Tuple[int, ...]]) must also load back as tuples, and
    Union[..., List[...]] fields must stay lists (ADVICE round 2)."""
    import json
    c = cfg.MappingConfig(input_shape=(2, 3), target_shape=(4,),
                          hidden_dim=[16, 8], periodic_dofs=[True, False])
    back = cfg.from_dict(None, json.loads(json.dumps(cfg.to_tagged_dict(c))))
    assert back == c
    assert isinstance(back.input_shape, tuple)
    assert isinstance(back.target_shape, tuple)
    assert isinstance(back.hidden_dim, list)  # List-typed Union untouched
    assert isinstance(back.periodic_dofs, list)


def test_container_of_tuples_keeps_outer_list():
    """List[Tuple[...]]-style annotations must NOT have their outer
    list coerced to a tuple just because a tuple appears in the type
    args (only Union/Optional wrappers are looked through)."""
    import dataclasses
    import json
    from typing import List, Tuple

    @dataclasses.dataclass
    class _Shapes:
        shapes: List[Tuple[int, int]] = dataclasses.field(
            default_factory=list)

    c = _Shapes(shapes=[(1, 2), (3, 4)])
    back = cfg.from_dict(_Shapes,
                         json.loads(json.dumps(dataclasses.asdict(c))))
    assert isinstance(back.shapes, list)
    back.shapes.append((5, 6))  # must still be mutable


def test_static_dist_autosize_clear_error():
    import pytest
    from vaemolsim_tpu.dists import StaticFlowedDistribution
    from vaemolsim_tpu.flows import RQSSplineMAF
    from vaemolsim_tpu.models import MappingToDistribution
    from vaemolsim_tpu.ops import distributions as d

    static = StaticFlowedDistribution(
        flow=RQSSplineMAF.create(jax.random.PRNGKey(0), 1,
                                 rqs_params={"num_bins": 4,
                                             "hidden_dim": 8}),
        base=d.Independent(d.Normal(jnp.zeros(1), jnp.ones(1)), 1))
    with pytest.raises(TypeError, match="params_size"):
        MappingToDistribution.create(jax.random.PRNGKey(1), static,
                                     input_shape=2)
