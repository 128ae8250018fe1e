"""Replica-exchange MD: exact-ensemble preservation under swaps,
barrier crossing the cold replica cannot do alone, per-replica
equipartition, and bookkeeping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu import md
from vaemolsim_tpu.parallel import (REMDState, make_remd_step, run_remd,
                                    temperature_ladder)
from vaemolsim_tpu.parallel.sharding import make_mesh

from jax.sharding import NamedSharding, PartitionSpec as P


def harmonic(x):
    q = x[..., 0, 0]
    return 0.5 * 4.0 * q * q  # k = 4


def double_well(x):
    q = x[..., 0, 0]
    return 8.0 * (q * q - 1.0) ** 2  # 8 kT barrier at beta=1


class TestREMDState:

    def test_create_draws_mb_velocities_per_replica(self):
        betas = jnp.array([1.0, 0.25])
        x = jnp.zeros((2, 4096, 1, 1))
        s = REMDState.create(harmonic, x, betas, jax.random.PRNGKey(0))
        v2 = jnp.mean(s.v ** 2, axis=(1, 2, 3))
        np.testing.assert_allclose(np.asarray(v2), [1.0, 4.0], rtol=0.1)
        np.testing.assert_allclose(np.asarray(s.energies),
                                   np.zeros((2, 4096)))

    def test_bad_betas_shape_raises(self):
        with pytest.raises(ValueError, match="betas"):
            REMDState.create(harmonic, jnp.zeros((3, 1, 1)),
                             jnp.array([1.0, 0.5]), jax.random.PRNGKey(0))

    def test_single_replica_never_swaps(self):
        s = REMDState.create(harmonic, jnp.zeros((1, 8, 1, 1)),
                             jnp.array([1.0]), jax.random.PRNGKey(0))
        step = make_remd_step(harmonic, dt=0.05,
                              md_steps_per_exchange=2)
        s, _ = run_remd(jax.jit(step), s, 10)
        assert int(s.num_swap_trials.to_float()) == 0


class TestREMDStatistics:

    def test_harmonic_cold_replica_exact_variance(self):
        # Swaps must leave each replica in ITS canonical ensemble:
        # cold-replica Var(q) = kT/k = 0.25 for the k=4 oscillator.
        betas = temperature_ladder(4, beta_min=0.25)
        x0 = jnp.zeros((4, 512, 1, 1))
        s = REMDState.create(harmonic, x0, betas, jax.random.PRNGKey(1))
        step = make_remd_step(harmonic, dt=0.02, friction=1.0,
                              md_steps_per_exchange=10)
        s, traj = run_remd(jax.jit(step), s, 400, collect_every=4)
        assert float(s.swap_acceptance_rate) > 0.2
        # discard first half as burn-in
        q = np.asarray(traj)[50:, 0, :, 0, 0].ravel()
        assert abs(q.mean()) < 0.05
        np.testing.assert_allclose(q.var(), 0.25, rtol=0.08)
        # hottest replica variance = kT_hot / k = 1.0
        qh = np.asarray(traj)[50:, 3, :, 0, 0].ravel()
        np.testing.assert_allclose(qh.var(), 1.0 / 0.25 / 4.0, rtol=0.1)

    def test_double_well_crossing_beats_plain_md(self):
        betas = temperature_ladder(6, beta_min=0.15)
        x0 = -jnp.ones((6, 64, 1, 1))  # everyone in the left well
        s = REMDState.create(double_well, x0, betas,
                             jax.random.PRNGKey(0))
        step = make_remd_step(double_well, dt=0.01, friction=2.0,
                              md_steps_per_exchange=20)
        s, _ = run_remd(jax.jit(step), s, 800)
        frac_remd = float(jnp.mean(s.x[0, :, 0, 0] > 0))

        ctrl, _ = md.baoab(double_well, x0[0], jnp.zeros_like(x0[0]),
                           jax.random.PRNGKey(1), dt=0.01,
                           n_steps=16000, friction=2.0, kT=1.0)
        frac_ctrl = float(jnp.mean(ctrl.x[:, 0, 0] > 0))
        assert frac_remd > 0.3, frac_remd       # mixed toward 0.5
        assert frac_ctrl < 0.15, frac_ctrl      # stuck behind 8 kT
        assert float(s.swap_acceptance_rate) > 0.3

    def test_velocity_rescale_preserves_equipartition(self):
        # After many accepted swaps, <v^2> on every rung must still be
        # its own kT — the sqrt(beta_from/beta_to) carry is what makes
        # this hold.
        betas = temperature_ladder(4, beta_min=0.2)
        x0 = jnp.zeros((4, 512, 1, 1))
        s = REMDState.create(harmonic, x0, betas, jax.random.PRNGKey(2))
        step = make_remd_step(harmonic, dt=0.02, friction=1.0,
                              md_steps_per_exchange=5)
        s, _ = run_remd(jax.jit(step), s, 400)
        assert float(s.swap_acceptance_rate) > 0.2
        v2 = np.asarray(jnp.mean(s.v ** 2, axis=(1, 2, 3)))
        np.testing.assert_allclose(v2, 1.0 / np.asarray(betas),
                                   rtol=0.15)


class TestREMDSharding:

    def test_replica_axis_sharded_matches_unsharded(self):
        betas = temperature_ladder(8, beta_min=0.2)
        x0 = jnp.zeros((8, 16, 1, 1))
        s = REMDState.create(harmonic, x0, betas, jax.random.PRNGKey(3))
        step = make_remd_step(harmonic, dt=0.02,
                              md_steps_per_exchange=4)
        ref, _ = run_remd(jax.jit(step), s, 20)

        mesh = make_mesh({"replica": -1})
        sh = NamedSharding(mesh, P("replica"))
        s_sh = s.replace(
            x=jax.device_put(s.x, sh), v=jax.device_put(s.v, sh),
            force=jax.device_put(s.force, sh),
            energies=jax.device_put(s.energies, sh))
        out, _ = jax.jit(lambda st: run_remd(step, st, 20))(s_sh)
        np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            float(out.swap_acceptance_rate),
            float(ref.swap_acceptance_rate), rtol=1e-6)
