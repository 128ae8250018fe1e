"""Training-loop and checkpoint/resume tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu.dists import IndependentBlockwise
from vaemolsim_tpu.flows import RQSSplineMAF
from vaemolsim_tpu.mcmc import MCMCState
from vaemolsim_tpu.models import VAE, MappingToDistribution
from vaemolsim_tpu import losses
from vaemolsim_tpu.ops import distributions as d
from vaemolsim_tpu.train import (CheckpointManager, fit, restore_checkpoint,
                                 save_checkpoint)
from vaemolsim_tpu.utils import StepTimer, benchmark_fn


def make_flow():
    return RQSSplineMAF.create(
        jax.random.PRNGKey(0), 1, num_blocks=2,
        rqs_params={"num_bins": 8, "hidden_dim": 16,
                    "bin_range": [-5.0, 5.0]})


class TestFit:

    def test_fit_decreases_loss_and_history(self):
        flow = make_flow()
        base = d.Independent(d.Normal(jnp.zeros(1), jnp.ones(1)), 1)
        data = d.Normal(jnp.float32(1.5), jnp.float32(0.5)).sample(
            jax.random.PRNGKey(1), (512, 1))

        def loss_fn(f, batch, key):
            del key
            nll = -jnp.mean(f(base).log_prob(batch))
            return nll, {"nll": nll}

        flow, hist = fit(flow, loss_fn, data, key=jax.random.PRNGKey(2),
                         num_epochs=5, batch_size=128)
        assert len(hist["loss"]) == 5
        assert hist["loss"][-1] < hist["loss"][0]
        assert "nll" in hist and "epoch_time_s" in hist

    def test_fit_pytree_batches(self):
        """Multi-input models train on tuple data sliced along the sample
        axis (reference trains BackmappingOnly on a 3-input list,
        vaemolsim/models.py:510-542, tests/test_models.py:265-308)."""
        flow = make_flow()
        base = d.Independent(d.Normal(jnp.zeros(1), jnp.ones(1)), 1)
        x = jnp.linspace(-1, 1, 96)[:, None]
        w = jnp.ones((96,))
        seen = []

        def loss_fn(f, batch, key):
            del key
            bx, bw = batch["x"], batch["w"]
            seen.append((bx.shape, bw.shape))
            return -jnp.mean(bw * f(base).log_prob(bx))

        flow, hist = fit(flow, loss_fn, {"x": x, "w": w},
                         key=jax.random.PRNGKey(0), num_epochs=2,
                         batch_size=32)
        assert len(hist["loss"]) == 2
        assert seen[0] == ((32, 1), (32,))

    def test_fit_pytree_mismatched_leading_axis_raises(self):
        flow = make_flow()
        with pytest.raises(ValueError, match="leading"):
            fit(flow, lambda f, b, k: 0.0,
                (jnp.ones((8, 1)), jnp.ones((7,))),
                key=jax.random.PRNGKey(0))

    def test_fit_scan_epochs_matches_host_loop(self):
        """scan_epochs=True compiles the epoch to one lax.scan and gives
        the same training trajectory as the host-driven loop (same PRNG
        stream, same batch order)."""
        base = d.Independent(d.Normal(jnp.zeros(1), jnp.ones(1)), 1)
        data = d.Normal(jnp.float32(1.5), jnp.float32(0.5)).sample(
            jax.random.PRNGKey(1), (256, 1))

        def loss_fn(f, batch, key):
            del key
            nll = -jnp.mean(f(base).log_prob(batch))
            return nll, {"nll": nll}

        out = {}
        for scan in (False, True):
            flow, hist = fit(make_flow(), loss_fn, data,
                             key=jax.random.PRNGKey(2), num_epochs=3,
                             batch_size=64, shuffle=False,
                             scan_epochs=scan)
            out[scan] = (flow, hist)
        np.testing.assert_allclose(out[True][1]["loss"],
                                   out[False][1]["loss"], rtol=1e-5)
        assert "nll" in out[True][1]
        for a, b in zip(jax.tree_util.tree_leaves(out[True][0]),
                        jax.tree_util.tree_leaves(out[False][0])):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    def test_fit_scan_epochs_shuffled_trains(self):
        base = d.Independent(d.Normal(jnp.zeros(1), jnp.ones(1)), 1)
        data = d.Normal(jnp.float32(1.0), jnp.float32(0.5)).sample(
            jax.random.PRNGKey(1), (256, 1))
        flow, hist = fit(make_flow(),
                         lambda f, b, k: -jnp.mean(f(base).log_prob(b)),
                         data, key=jax.random.PRNGKey(2), num_epochs=5,
                         batch_size=64, scan_epochs=True)
        assert hist["loss"][-1] < hist["loss"][0]

    def test_fit_streamed_data(self):
        """fit accepts a callable data stream (out-of-core path via
        data.epoch_stream) in place of in-memory arrays."""
        from vaemolsim_tpu.data import epoch_stream

        base = d.Independent(d.Normal(jnp.zeros(1), jnp.ones(1)), 1)
        raw = np.random.default_rng(0).normal(
            1.5, 0.5, size=(512, 1)).astype(np.float32)
        loss_fn = lambda f, b, k: -jnp.mean(f(base).log_prob(b))  # noqa: E731

        def stream(epoch_key):
            return epoch_stream(lambda s, c: raw[s:s + c], 512, 64,
                                key=epoch_key)

        flow, hist = fit(make_flow(), loss_fn, stream,
                         key=jax.random.PRNGKey(1), num_epochs=4)
        assert len(hist["loss"]) == 4
        assert hist["loss"][-1] < hist["loss"][0]

    def test_fit_streamed_with_mesh(self):
        """Streamed data composes with the data-parallel mesh path
        (regression: the stream callable was clobbered by the mesh
        placement step)."""
        from vaemolsim_tpu.data import epoch_stream
        from vaemolsim_tpu.parallel import make_mesh

        base = d.Independent(d.Normal(jnp.zeros(1), jnp.ones(1)), 1)
        raw = np.random.default_rng(0).normal(
            1.5, 0.5, size=(256, 1)).astype(np.float32)
        loss_fn = lambda f, b, k: -jnp.mean(f(base).log_prob(b))  # noqa: E731
        stream = lambda k: epoch_stream(  # noqa: E731
            lambda s, c: raw[s:s + c], 256, 64, key=k)
        flow, hist = fit(make_flow(), loss_fn, stream,
                         key=jax.random.PRNGKey(1), num_epochs=2,
                         mesh=make_mesh({"batch": len(jax.devices())}))
        assert len(hist["loss"]) == 2
        for leaf in jax.tree_util.tree_leaves(flow):
            assert leaf.sharding.is_fully_replicated

    def test_fit_streamed_rejects_scan_epochs(self):
        with pytest.raises(ValueError, match="scan_epochs"):
            fit(make_flow(), lambda f, b, k: 0.0,
                lambda k: iter([jnp.ones((4, 1))]),
                key=jax.random.PRNGKey(0), scan_epochs=True)

    def test_fit_empty_stream_raises(self):
        with pytest.raises(ValueError, match="no batches"):
            fit(make_flow(), lambda f, b, k: 0.0, lambda k: iter([]),
                key=jax.random.PRNGKey(0))

    def test_fit_batch_size_larger_than_data(self):
        """batch_size > n clamps to one full batch in BOTH paths (the
        scanned path's reshape used to crash)."""
        base = d.Independent(d.Normal(jnp.zeros(1), jnp.ones(1)), 1)
        data = jnp.ones((100, 1))
        loss_fn = lambda f, b, k: -jnp.mean(f(base).log_prob(b))  # noqa: E731
        for scan in (False, True):
            flow, hist = fit(make_flow(), loss_fn, data,
                             key=jax.random.PRNGKey(0), num_epochs=2,
                             batch_size=128, scan_epochs=scan)
            assert len(hist["loss"]) == 2

    def test_fit_scalar_loss_fn(self):
        flow = make_flow()
        base = d.Independent(d.Normal(jnp.zeros(1), jnp.ones(1)), 1)
        data = jnp.ones((64, 1))
        flow, hist = fit(flow,
                         lambda f, b, k: -jnp.mean(f(base).log_prob(b)),
                         data, key=jax.random.PRNGKey(0), num_epochs=2)
        assert len(hist["loss"]) == 2


class TestFitEMA:
    """Exponential-moving-average parameter tracking in fit."""

    @staticmethod
    def _quad_loss(m, batch, key):
        del key
        return jnp.mean((m["w"] - batch) ** 2)

    def test_ema_matches_hand_shadow(self):
        """Deterministic SGD, one batch/epoch: the returned model is
        exactly the hand-iterated shadow ema_0 = p_0,
        ema_{t+1} = d ema_t + (1-d) p_{t+1}."""
        import optax
        lr, decay, steps = 0.1, 0.8, 6
        data = jnp.full((8,), 3.0)
        model = {"w": jnp.array(0.0)}
        out, _ = fit(model, self._quad_loss, data,
                     key=jax.random.PRNGKey(0), num_epochs=steps,
                     batch_size=8, optimizer=optax.sgd(lr),
                     shuffle=False, ema_decay=decay)
        p, e = 0.0, 0.0
        for _ in range(steps):
            p = p - lr * 2.0 * (p - 3.0)
            e = decay * e + (1 - decay) * p
        np.testing.assert_allclose(float(out["w"]), e, rtol=1e-6)

    def test_ema_host_and_scanned_paths_agree(self):
        import optax
        data = jnp.linspace(-1.0, 1.0, 64)
        outs = []
        for scan in (False, True):
            model = {"w": jnp.array(5.0)}
            out, _ = fit(model, self._quad_loss, data,
                         key=jax.random.PRNGKey(0), num_epochs=3,
                         batch_size=16, optimizer=optax.sgd(0.05),
                         shuffle=True, scan_epochs=scan, ema_decay=0.95)
            outs.append(float(out["w"]))
        np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6)

    def test_ema_zero_decay_is_raw_weights(self):
        data = jnp.full((8,), 1.0)
        kwargs = dict(key=jax.random.PRNGKey(0), num_epochs=4,
                      batch_size=8, learning_rate=0.1, shuffle=False)
        raw, _ = fit({"w": jnp.array(0.0)}, self._quad_loss, data, **kwargs)
        ema, _ = fit({"w": jnp.array(0.0)}, self._quad_loss, data,
                     ema_decay=0.0, **kwargs)
        np.testing.assert_allclose(float(ema["w"]), float(raw["w"]),
                                   rtol=1e-7)

    def test_ema_invalid_decay_raises(self):
        with pytest.raises(ValueError, match="ema_decay"):
            fit({"w": jnp.array(0.0)}, self._quad_loss, jnp.ones((4,)),
                key=jax.random.PRNGKey(0), ema_decay=1.0)

    def test_ema_with_restore_best_returns_ema_snapshot(self):
        """With a huge LR the raw weights diverge epoch over epoch; the
        restored best-epoch snapshot must be the EMA state at the best
        epoch, which equals the hand shadow at that step."""
        import optax
        lr, decay = 1.2, 0.5  # |1 - 2 lr| = 1.4 > 1: divergent SGD
        data = jnp.full((4,), 1.0)
        out, hist = fit({"w": jnp.array(0.5)}, self._quad_loss, data,
                        key=jax.random.PRNGKey(0), num_epochs=5,
                        batch_size=4, optimizer=optax.sgd(lr),
                        shuffle=False, ema_decay=decay, restore_best=True)
        best_epoch = int(np.argmin(hist["loss"]))
        p, e = 0.5, 0.5
        shadows = []
        for _ in range(5):
            p = p - lr * 2.0 * (p - 1.0)
            e = decay * e + (1 - decay) * p
            shadows.append(e)
        np.testing.assert_allclose(float(out["w"]), shadows[best_epoch],
                                   rtol=1e-6)


class TestFitValidation:
    """Held-out evaluation, early stopping, and best-epoch restore."""

    @staticmethod
    def _mse_loss(m, batch, key):
        del key
        return jnp.mean((m - batch) ** 2)

    def test_val_loss_early_stop_and_restore_best(self):
        """A scalar 'model' driven toward 2.0 passes the validation
        target 0.5 on the way: val_loss dips then rises, early stopping
        fires, and restore_best returns the dip-epoch parameters."""
        import optax

        model = jnp.float32(0.0)
        train = 2.0 * jnp.ones((8, 1))
        val = 0.5 * jnp.ones((4, 1))
        model, hist = fit(model, self._mse_loss, train,
                          key=jax.random.PRNGKey(0), num_epochs=50,
                          optimizer=optax.sgd(0.05),
                          validation_data=val,
                          early_stopping_patience=2,
                          restore_best=True)
        vl = hist["val_loss"]
        assert len(vl) == len(hist["loss"]) < 50  # stopped early
        best = int(np.argmin(vl))
        assert 0 < best < len(vl) - 1  # a genuine interior dip
        # Two non-improving epochs after the dip, then stop.
        assert len(vl) == best + 3
        # Restored model reproduces the best epoch's val loss exactly.
        assert np.isclose(float(jnp.mean((model - 0.5) ** 2)), vl[best])

    def test_patience_monitors_train_loss_without_validation(self):
        import optax

        model, hist = fit(jnp.float32(1.0), self._mse_loss,
                          2.0 * jnp.ones((8, 1)),
                          key=jax.random.PRNGKey(0), num_epochs=10,
                          optimizer=optax.sgd(0.0),  # loss never improves
                          early_stopping_patience=1)
        assert "val_loss" not in hist
        assert len(hist["loss"]) == 2  # epoch 0 sets best, epoch 1 stops

    def test_min_delta_requires_meaningful_improvement(self):
        import optax

        # Improvements exist every epoch but are smaller than min_delta,
        # so patience still runs out.
        model, hist = fit(jnp.float32(0.0), self._mse_loss,
                          2.0 * jnp.ones((8, 1)),
                          key=jax.random.PRNGKey(0), num_epochs=20,
                          optimizer=optax.sgd(1e-5),
                          early_stopping_patience=3, min_delta=1.0)
        assert len(hist["loss"]) == 4

    def test_validation_works_with_scan_epochs_and_pytrees(self):
        flow = make_flow()
        base = d.Independent(d.Normal(jnp.zeros(1), jnp.ones(1)), 1)
        data = d.Normal(jnp.float32(1.5), jnp.float32(0.5)).sample(
            jax.random.PRNGKey(1), (256, 1))

        def loss_fn(f, batch, key):
            del key
            return -jnp.mean(f(base).log_prob(batch))

        flow, hist = fit(flow, loss_fn, data[:192],
                         key=jax.random.PRNGKey(2), num_epochs=3,
                         batch_size=64, scan_epochs=True,
                         validation_data=data[192:])
        assert len(hist["val_loss"]) == 3
        assert hist["val_loss"][-1] < hist["val_loss"][0]

    def test_validation_rejects_process_local_data(self):
        with pytest.raises(ValueError,
                           match="not supported with process_local_data"):
            fit(jnp.float32(0.0), self._mse_loss, jnp.ones((8, 1)),
                key=jax.random.PRNGKey(0),
                validation_data=jnp.ones((4, 1)),
                process_local_data=True)


class TestFitEnsemble:
    """vmap-parallel multi-seed training (train.fit_ensemble)."""

    def test_ensemble_trains_all_members(self):
        from vaemolsim_tpu.train import (fit_ensemble, stack_models,
                                         unstack_model)

        base = d.Independent(d.Normal(jnp.zeros(1), jnp.ones(1)), 1)
        data = d.Normal(jnp.float32(1.5), jnp.float32(0.5)).sample(
            jax.random.PRNGKey(1), (512, 1))
        K = 4
        stack = stack_models([
            type(make_flow()).create(
                jax.random.PRNGKey(100 + i), 1, num_blocks=2,
                rqs_params={"num_bins": 8, "hidden_dim": 16,
                            "bin_range": [-5.0, 5.0]})
            for i in range(K)])

        def loss_fn(f, batch, key):
            del key
            return -jnp.mean(f(base).log_prob(batch))

        stack, hist = fit_ensemble(stack, loss_fn, data,
                                   key=jax.random.PRNGKey(2),
                                   num_epochs=5, batch_size=128)
        assert hist["loss"][0].shape == (K,)
        # Every member's loss decreased.
        assert np.all(hist["loss"][-1] < hist["loss"][0])
        # Members differ (different inits): single-member extraction
        # gives a usable model whose log-prob differs across members.
        m0 = unstack_model(stack, 0)
        m1 = unstack_model(stack, 1)
        x = jnp.asarray([[1.0]])
        lp0 = float(m0(base).log_prob(x)[0])
        lp1 = float(m1(base).log_prob(x)[0])
        assert lp0 != lp1
        # Each trained member is a sensible density for the data.
        assert lp0 > float(base.log_prob(x)[0]) - 2.0

    def test_ensemble_records_metrics_and_rejects_streams(self):
        from vaemolsim_tpu.train import fit_ensemble, stack_models

        base = d.Independent(d.Normal(jnp.zeros(1), jnp.ones(1)), 1)
        data = jnp.ones((64, 1))

        def loss_fn(f, batch, key):
            del key
            nll = -jnp.mean(f(base).log_prob(batch))
            return nll, {"nll": nll}

        stack = stack_models([make_flow(), make_flow()])
        stack, hist = fit_ensemble(stack, loss_fn, data,
                                   key=jax.random.PRNGKey(0), num_epochs=2)
        assert "nll" in hist and hist["nll"][0].shape == (2,)
        with pytest.raises(ValueError, match="in-memory"):
            fit_ensemble(stack, loss_fn, lambda k: iter([]),
                         key=jax.random.PRNGKey(0))

    def test_ensemble_matches_sequential_shapes(self):
        from vaemolsim_tpu.train import fit_ensemble, stack_models

        base = d.Independent(d.Normal(jnp.zeros(1), jnp.ones(1)), 1)
        data = jnp.ones((64, 1))
        stack = stack_models([make_flow(), make_flow()])
        stack, hist = fit_ensemble(
            stack, lambda f, b, k: -jnp.mean(f(base).log_prob(b)),
            data, key=jax.random.PRNGKey(0), num_epochs=2)
        assert len(hist["loss"]) == 2
        for leaf in jax.tree_util.tree_leaves(stack):
            assert leaf.shape[0] == 2


class TestFitMesh:
    """Data-parallel fit over a device mesh (SURVEY.md §2.4 — the
    reference has no distributed training; batch sharded over the mesh,
    model replicated, XLA-inserted gradient all-reduce)."""

    def _loss_fn(self, base):
        def loss_fn(f, batch, key):
            del key
            return -jnp.mean(f(base).log_prob(batch))
        return loss_fn

    def test_mesh_matches_single_device(self):
        from vaemolsim_tpu.parallel import make_mesh

        base = d.Independent(d.Normal(jnp.zeros(1), jnp.ones(1)), 1)
        data = d.Normal(jnp.float32(1.5), jnp.float32(0.5)).sample(
            jax.random.PRNGKey(1), (256, 1))
        mesh = make_mesh({"batch": len(jax.devices())})

        out = {}
        for m in (None, mesh):
            flow, hist = fit(make_flow(), self._loss_fn(base), data,
                             key=jax.random.PRNGKey(2), num_epochs=3,
                             batch_size=64, shuffle=False, mesh=m)
            out[m is None] = (flow, hist)
        # Same PRNG stream and batch order; differences only from float
        # reduction order across the 8-way sharded mean.
        np.testing.assert_allclose(out[True][1]["loss"],
                                   out[False][1]["loss"], rtol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(out[True][0]),
                        jax.tree_util.tree_leaves(out[False][0])):
            np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)

    def test_mesh_scan_epochs_trains_and_stays_replicated(self):
        from vaemolsim_tpu.parallel import make_mesh

        base = d.Independent(d.Normal(jnp.zeros(1), jnp.ones(1)), 1)
        data = d.Normal(jnp.float32(1.0), jnp.float32(0.5)).sample(
            jax.random.PRNGKey(1), (256, 1))
        mesh = make_mesh({"batch": len(jax.devices())})
        flow, hist = fit(make_flow(), self._loss_fn(base), data,
                         key=jax.random.PRNGKey(2), num_epochs=4,
                         batch_size=64, scan_epochs=True, mesh=mesh)
        assert hist["loss"][-1] < hist["loss"][0]
        for leaf in jax.tree_util.tree_leaves(flow):
            assert leaf.sharding.is_fully_replicated, leaf.sharding

    def test_mesh_wrong_axis_name_raises(self):
        from vaemolsim_tpu.parallel import make_mesh

        mesh = make_mesh({"chain": len(jax.devices())})
        with pytest.raises(ValueError, match="mesh has axes"):
            fit(make_flow(), lambda f, b, k: 0.0, jnp.ones((64, 1)),
                key=jax.random.PRNGKey(0), mesh=mesh)

    def test_mesh_indivisible_dataset_drops_remainder(self):
        """Only the BATCH must divide the mesh; an indivisible dataset
        trains with drop-remainder semantics instead of erroring."""
        from vaemolsim_tpu.parallel import make_mesh

        base = d.Independent(d.Normal(jnp.zeros(1), jnp.ones(1)), 1)
        data = d.Normal(jnp.float32(1.0), jnp.float32(0.5)).sample(
            jax.random.PRNGKey(1), (157, 1))  # 157 % 8 != 0
        mesh = make_mesh({"batch": len(jax.devices())})
        flow, hist = fit(make_flow(), self._loss_fn(base), data,
                         key=jax.random.PRNGKey(2), num_epochs=2,
                         batch_size=64, mesh=mesh)
        assert len(hist["loss"]) == 2

    def test_mesh_indivisible_batch_raises(self):
        from vaemolsim_tpu.parallel import make_mesh

        mesh = make_mesh({"batch": len(jax.devices())})
        with pytest.raises(ValueError, match="divide evenly"):
            fit(make_flow(), lambda f, b, k: 0.0, jnp.ones((60, 1)),
                key=jax.random.PRNGKey(0), mesh=mesh)


class TestCheckpoint:

    def test_roundtrip_model(self, tmp_path):
        flow = make_flow()
        path = str(tmp_path / "ckpt1")
        save_checkpoint(path, flow)
        template = make_flow()
        restored = restore_checkpoint(path, template)
        for a, b in zip(jax.tree_util.tree_leaves(flow),
                        jax.tree_util.tree_leaves(restored)):
            np.testing.assert_array_equal(a, b)

    def test_mcmc_state_roundtrip(self, tmp_path):
        state = MCMCState.create(jnp.ones((8, 2)), jnp.zeros(8),
                                 jax.random.PRNGKey(3))
        from vaemolsim_tpu.mcmc import Counter
        state = state.replace(num_trials=Counter.of(40),
                              num_acc=Counter.of(13))
        path = str(tmp_path / "mc")
        save_checkpoint(path, state)
        template = MCMCState.create(jnp.zeros((8, 2)), jnp.zeros(8),
                                    jax.random.PRNGKey(0))
        restored = restore_checkpoint(path, template)
        np.testing.assert_array_equal(restored.configs, state.configs)
        assert float(restored.num_acc) == 13.0
        np.testing.assert_array_equal(restored.key, state.key)

    def test_legacy_int_counter_checkpoint_migrates(self, tmp_path):
        """Checkpoints written before the two-word Counter stored the
        acceptance counters as single int32 scalars; restoring one into
        a current-template MCMCState must transparently widen them."""
        from vaemolsim_tpu.mcmc import Counter
        from vaemolsim_tpu.train.checkpoint import _legacy_counter_template

        state = MCMCState.create(jnp.ones((8, 2)), jnp.zeros(8),
                                 jax.random.PRNGKey(3))
        # Write what the OLD code wrote: int32 scalars in place of the
        # Counter sub-pytrees.
        legacy = _legacy_counter_template(state)
        legacy = legacy.replace(num_trials=jnp.asarray(40, jnp.int32),
                                num_acc=jnp.asarray(13, jnp.int32))
        path = str(tmp_path / "legacy_mc")
        save_checkpoint(path, legacy)
        template = MCMCState.create(jnp.zeros((8, 2)), jnp.zeros(8),
                                    jax.random.PRNGKey(0))
        restored = restore_checkpoint(path, template)
        assert isinstance(restored.num_trials, Counter)
        assert int(restored.num_trials) == 40
        assert int(restored.num_acc) == 13
        np.testing.assert_array_equal(restored.configs, state.configs)

    def test_manager_retention_and_resume(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "mgr"), max_to_keep=2)
        flow = make_flow()
        for step in range(3):
            mgr.save(step, flow)
        assert mgr.latest_step() == 2
        restored = mgr.restore(make_flow())
        for a, b in zip(jax.tree_util.tree_leaves(flow),
                        jax.tree_util.tree_leaves(restored)):
            np.testing.assert_array_equal(a, b)
        mgr.close()


class TestProfiling:

    def test_step_timer(self):
        t = StepTimer()
        x = jnp.ones((128, 128))
        with t.phase("matmul") as ph:
            ph.result = x @ x
        with t.phase("matmul") as ph:
            ph.result = x @ x
        assert len(t.times["matmul"]) == 2
        assert t.summary()["matmul"] > 0

    def test_benchmark_fn(self):
        f = jax.jit(lambda x: x * 2.0)
        dt = benchmark_fn(f, jnp.ones(16), warmup=1, iters=3)
        assert dt > 0


class TestSanitizers:

    def test_checked_passes_clean_fn(self):
        from vaemolsim_tpu.utils import checked
        f = checked(lambda x: jnp.log(x) + 1.0)
        out = f(jnp.array([1.0, 2.0]))
        assert jnp.all(jnp.isfinite(out))

    def test_checked_catches_nan(self):
        from jax.experimental import checkify
        from vaemolsim_tpu.utils import checked
        f = checked(lambda x: jnp.log(x))  # log(-1) -> NaN
        with pytest.raises(checkify.JaxRuntimeError):
            f(jnp.array([-1.0]))

    def test_checked_mcmc_step(self):
        # The full MC step passes the NaN/Inf sanitizer.
        from vaemolsim_tpu.mcmc import MCMCState, make_mcmc_step
        from vaemolsim_tpu.ops import distributions as d
        from vaemolsim_tpu.utils import checked

        def enc(x):
            z = jnp.zeros(x.shape[:-1] + (1,))
            return d.Independent(d.Normal(z, jnp.ones_like(z)), 1)

        def dec(z):
            l = jnp.zeros(z.shape[:-1] + (2,))
            return d.Independent(d.Normal(l, jnp.ones_like(l)), 1)

        target = lambda x: -0.5 * jnp.sum(x ** 2, -1)
        step = make_mcmc_step(enc, enc, dec, target)
        st = MCMCState.create(jnp.zeros((8, 2)), target(jnp.zeros((8, 2))),
                              jax.random.PRNGKey(0))
        out = checked(step)(st)
        assert jnp.all(jnp.isfinite(out.energies))


class TestTraceSmoke:

    def test_profiler_trace_writes(self, tmp_path):
        from vaemolsim_tpu.utils import trace
        logdir = str(tmp_path / "prof")
        with trace(logdir):
            x = jnp.ones((64, 64))
            jax.block_until_ready(x @ x)
        import os
        assert any(os.scandir(logdir))


class TestReviewRegressions:

    def test_fit_with_adamw(self):
        # optimizer.update must receive params (adamw requires them).
        import optax
        from tests.test_train import make_flow as _mk  # self-import ok
        flow = make_flow()
        from vaemolsim_tpu.ops import distributions as d
        base = d.Independent(d.Normal(jnp.zeros(1), jnp.ones(1)), 1)
        data = jnp.ones((64, 1))
        flow, hist = fit(flow,
                         lambda f, b, k: -jnp.mean(f(base).log_prob(b)),
                         data, key=jax.random.PRNGKey(0), num_epochs=2,
                         optimizer=optax.adamw(1e-3))
        assert len(hist["loss"]) == 2

    def test_fit_reserved_metric_keys(self):
        # A 'loss' metric (as VAE.elbo_loss returns) must not double up
        # the per-epoch history.
        flow = make_flow()
        from vaemolsim_tpu.ops import distributions as d
        base = d.Independent(d.Normal(jnp.zeros(1), jnp.ones(1)), 1)
        data = jnp.ones((64, 1))

        def loss_fn(f, b, k):
            nll = -jnp.mean(f(base).log_prob(b))
            return nll, {"loss": nll, "nll": nll}

        flow, hist = fit(flow, loss_fn, data, key=jax.random.PRNGKey(0),
                         num_epochs=3)
        assert len(hist["loss"]) == 3
        assert len(hist["nll"]) == 3

    def test_config_from_dict_roundtrip_builds(self):
        from vaemolsim_tpu import config as cfg
        c = cfg.MAFConfig(data_dim=2, rqs=cfg.RQSParams(num_bins=8,
                                                        hidden_dim=16))
        c2 = cfg.from_dict(cfg.MAFConfig, cfg.to_dict(c))
        flow = c2.build(jax.random.PRNGKey(0))
        assert flow.data_dim == 2

    def test_benchmark_fn_warmup_zero(self):
        from vaemolsim_tpu.utils import benchmark_fn
        f = jax.jit(lambda x: x + 1)
        assert benchmark_fn(f, jnp.ones(4), warmup=0, iters=2) > 0

    def test_assert_finite_noop_under_jit(self):
        from vaemolsim_tpu.utils import assert_finite

        @jax.jit
        def f(x):
            assert_finite(x, "x")
            return x * 2

        out = f(jnp.ones(3))
        np.testing.assert_allclose(out, 2.0)
        # Eager path still catches non-finite values.
        with pytest.raises(AssertionError):
            assert_finite(jnp.array([jnp.nan]), "bad")


def test_checked_fires_user_checks():
    """checkify.check assertions inside a checked() fn must fire (the
    wrapper previously dropped user_checks, silently discharging them)."""
    from jax.experimental import checkify
    from vaemolsim_tpu.utils import checked

    def fn(x):
        checkify.check(jnp.all(x > 0), "x must be positive")
        return jnp.sqrt(x)

    safe = checked(fn)
    safe(jnp.asarray([1.0, 4.0]))  # passes
    with pytest.raises(Exception, match="positive"):
        safe(jnp.asarray([-1.0, 4.0]))


def test_validation_smaller_than_mesh_axis_raises():
    """A validation set smaller than the mesh axis would trim to zero
    samples and make val_loss NaN — must raise instead."""
    import optax
    from vaemolsim_tpu.parallel import make_mesh

    mesh = make_mesh({"batch": -1})
    with pytest.raises(ValueError, match="validation_data"):
        fit(jnp.float32(0.0), lambda m, b, k: jnp.mean((m - b) ** 2),
            jnp.ones((16, 1)), key=jax.random.PRNGKey(0),
            optimizer=optax.sgd(0.1), mesh=mesh, batch_size=16,
            validation_data=jnp.ones((4, 1)))
