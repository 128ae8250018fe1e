"""Forward flux sampling: the flux stage against Rice's exact Gaussian
up-crossing formula, the full ladder against a brute-force double-well
rate, and interface-placement invariance."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu import md
from vaemolsim_tpu.mcmc import basin_flux, ffs_stage, run_ffs


def well_1d(w=1.0):
    def pot(x):
        return 0.5 * w * w * jnp.sum(x * x, axis=(-2, -1))

    return pot


def double_well(h):
    def pot(x):
        q = x[..., 0, 0]
        return h * (q * q - 1.0) ** 2

    return pot


def lam_x(x):
    return x[..., 0, 0]


class TestBasinFlux:

    def test_rice_formula(self):
        """Up-crossing flux of level a in a harmonic well is Rice's
        ``(w / 2 pi) exp(-beta m w^2 a^2 / 2)`` — exact for the
        continuous process; dt and the armed-crossing rule only add
        discretization error."""
        w, kT, a = 1.0, 1.0, 1.0
        pot = well_1d(w)
        key = jax.random.PRNGKey(0)
        r = 512
        x0 = jnp.sqrt(kT) / w * jax.random.normal(key, (r, 1, 1))
        v0 = jnp.sqrt(kT) * jax.random.normal(
            jax.random.PRNGKey(1), (r, 1, 1))
        fr = jax.jit(lambda x, v, k: basin_flux(
            pot, lam_x, x, v, k, lambda0=a, dt=0.005, n_steps=8000,
            kT=kT, friction=0.5))(x0, v0, jax.random.PRNGKey(2))
        rice = (w / (2 * math.pi)) * math.exp(-w * w * a * a / (2 * kT))
        assert abs(float(fr.flux) - rice) / rice < 0.12
        # Stored crossing points sit essentially at the interface.
        lams = np.asarray(lam_x(fr.x))[np.asarray(fr.stored)]
        assert lams.size > 50
        assert np.all(lams >= a - 1e-5) and np.all(lams < a + 0.2)

    def test_armed_rule_blocks_recrossing_inflation(self):
        """With lambda_a far below lambda0, rapid jitter around the
        interface counts once per genuine excursion from A — the
        armed count must not exceed the unarmed (plain up-crossing)
        count."""
        pot = well_1d(1.0)
        r = 128
        x0 = jnp.zeros((r, 1, 1))
        v0 = jnp.sqrt(1.0) * jax.random.normal(
            jax.random.PRNGKey(3), (r, 1, 1))
        common = dict(lambda0=0.5, dt=0.01, n_steps=2000, kT=1.0,
                      friction=1.0)
        plain = basin_flux(pot, lam_x, x0, v0, jax.random.PRNGKey(4),
                           **common)
        armed = basin_flux(pot, lam_x, x0, v0, jax.random.PRNGKey(4),
                           lambda_a=-0.5, **common)
        assert int(armed.n_crossings) <= int(plain.n_crossings)
        assert int(armed.n_crossings) > 0

    def test_slot_ring_overwrites(self):
        """More crossings than slots: every slot filled, count exact."""
        pot = well_1d(1.0)
        x0 = jnp.zeros((256, 1, 1))
        v0 = jax.random.normal(jax.random.PRNGKey(5), (256, 1, 1))
        fr = basin_flux(pot, lam_x, x0, v0, jax.random.PRNGKey(6),
                        lambda0=0.2, dt=0.01, n_steps=2000, kT=1.0,
                        n_store=16)
        assert int(fr.n_crossings) > 16
        assert bool(jnp.all(fr.stored))


class TestStage:

    def test_free_particle_stage_probability(self):
        """Friction-0 free particles keep their seed velocity: success
        iff v > 0 (they drift monotonically), so p equals the positive
        fraction of the resampled seeds."""
        zero = lambda x: jnp.zeros(x.shape[:-2])  # noqa: E731
        n_seed = 64
        v_sign = jnp.where(jnp.arange(n_seed) % 4 == 0, 1.0, -1.0)
        x = jnp.zeros((n_seed, 1, 1))
        v = (0.5 * v_sign)[:, None, None]
        res = ffs_stage(zero, lam_x, x, v, jnp.ones(n_seed, bool),
                        jax.random.PRNGKey(7), lambda_next=0.4,
                        lambda_fail=-0.4, dt=0.01, max_steps=200,
                        kT=1.0, friction=0.0, n_trials=2048)
        assert int(res.n_unresolved) == 0
        assert abs(float(res.p) - 0.25) < 0.04
        # Successes frozen at (just past) the target interface.
        lam_fin = np.asarray(lam_x(res.x))
        assert np.all(lam_fin[np.asarray(res.success)] >= 0.4)
        assert np.all(lam_fin[~np.asarray(res.success)] <= -0.4)

    def test_unresolved_counted_conservatively(self):
        """A wall before the next interface: nothing succeeds, nothing
        fails within max_steps -> p = 0 with everything unresolved."""
        pot = well_1d(20.0)                      # stiff well traps at 0
        x = jnp.zeros((8, 1, 1))
        v = jnp.zeros_like(x)
        res = ffs_stage(pot, lam_x, x, v, jnp.ones(8, bool),
                        jax.random.PRNGKey(8), lambda_next=5.0,
                        lambda_fail=-5.0, dt=0.005, max_steps=50,
                        kT=0.1, friction=1.0, n_trials=64)
        assert float(res.p) == 0.0
        assert int(res.n_unresolved) == 64


class TestRunFFS:

    def _brute_force_rate(self, h, kT, n_steps=40000, r=512):
        """Mean first-passage rate from the left well to x >= 1 by
        direct simulation: fraction of replicas arriving per time."""
        pot = double_well(h)
        x0 = -jnp.ones((r, 1, 1))
        v0 = jnp.sqrt(kT) * jax.random.normal(jax.random.PRNGKey(9),
                                              (r, 1, 1))
        _, traj = jax.jit(lambda x, v, k: md.baoab(
            pot, x, v, k, dt=0.01, n_steps=n_steps, friction=1.0,
            kT=kT, collect_every=10))(x0, v0, jax.random.PRNGKey(10))
        lam = np.asarray(traj[..., 0, 0])        # (T, R)
        hit = (lam >= 1.0).any(axis=0)
        first = np.where(hit, (lam >= 1.0).argmax(axis=0), lam.shape[0])
        # Exponential first-passage: rate = n_events / total survival
        # time (censored replicas contribute their full run).
        total_time = float(first.sum() * 10 * 0.01)
        assert hit.sum() >= 30, "brute force saw too few events"
        return hit.sum() / total_time

    def test_rate_matches_brute_force(self):
        """Moderate 4 kT double well: the FFS ladder rate agrees with
        direct MFPT simulation."""
        h, kT = 2.0, 0.5
        pot = double_well(h)
        r = 256
        x0 = -1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(11),
                                            (r, 1, 1))
        v0 = jnp.sqrt(kT) * jax.random.normal(jax.random.PRNGKey(12),
                                              (r, 1, 1))
        res = run_ffs(pot, lam_x, x0, v0, jax.random.PRNGKey(13),
                      interfaces=[-0.6, -0.2, 0.2, 0.6, 1.0], dt=0.01,
                      kT=kT, flux_steps=4000, max_steps=3000,
                      friction=1.0, n_trials=1024)
        brute = self._brute_force_rate(h, kT)
        assert int(res.n_unresolved.sum()) < 20
        ratio = float(res.rate) / brute
        assert 0.45 < ratio < 2.2, (float(res.rate), brute)

    def test_interface_placement_invariance(self):
        """The factorized rate is a property of the dynamics, not the
        ladder: two different interface placements agree."""
        h, kT = 1.5, 0.5
        pot = double_well(h)
        r = 256
        x0 = -1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(14),
                                            (r, 1, 1))
        v0 = jnp.sqrt(kT) * jax.random.normal(jax.random.PRNGKey(15),
                                              (r, 1, 1))
        common = dict(dt=0.01, kT=kT, flux_steps=3000, max_steps=2500,
                      friction=1.0, n_trials=1024)
        ra = run_ffs(pot, lam_x, x0, v0, jax.random.PRNGKey(16),
                     interfaces=[-0.6, 0.0, 1.0], **common)
        rb = run_ffs(pot, lam_x, x0, v0, jax.random.PRNGKey(17),
                     interfaces=[-0.5, -0.1, 0.3, 0.7, 1.0], **common)
        ratio = float(ra.rate) / float(rb.rate)
        assert 0.5 < ratio < 2.0, (float(ra.rate), float(rb.rate))

    def test_dead_ladder_short_circuits(self):
        """Unreachable top interface: rate exactly 0, later stages
        skipped with p = 0, and no NaNs anywhere."""
        pot = well_1d(4.0)
        x0 = jnp.zeros((32, 1, 1))
        v0 = 0.5 * jax.random.normal(jax.random.PRNGKey(18),
                                     (32, 1, 1))
        res = run_ffs(pot, lam_x, x0, v0, jax.random.PRNGKey(19),
                      interfaces=[0.3, 50.0, 100.0], dt=0.01, kT=0.5,
                      flux_steps=500, max_steps=100, n_trials=32)
        assert float(res.rate) == 0.0
        assert float(res.p_stages[1]) == 0.0
        assert np.isfinite(np.asarray(res.p_stages)).all()

    def test_bad_ladder_raises(self):
        pot = well_1d(1.0)
        x0 = jnp.zeros((4, 1, 1))
        with pytest.raises(ValueError, match="increasing"):
            run_ffs(pot, lam_x, x0, x0, jax.random.PRNGKey(0),
                    interfaces=[0.5, 0.2], dt=0.01, kT=1.0,
                    flux_steps=10, max_steps=10)


class TestEmptySeeds:

    def test_empty_seed_mask_poisons_stage(self):
        """Regression: categorical over all -inf logits returns index
        0, so an all-False seed_mask silently shot every trial from the
        zero-initialized slot 0 and reported a physically meaningless
        nonzero p.  The public stage now returns p = NaN with success
        all-False instead."""
        n_store = 8
        x = jnp.zeros((n_store, 1, 1))
        v = jnp.zeros_like(x)
        mask = jnp.zeros((n_store,), bool)
        res = ffs_stage(well_1d(), lam_x, x, v, mask,
                        jax.random.PRNGKey(0), lambda_next=1.0,
                        lambda_fail=-1.0, dt=0.05, max_steps=10,
                        kT=1.0, n_trials=16)
        assert np.isnan(float(res.p))
        assert int(res.n_success) == 0
        assert not bool(np.asarray(res.success).any())
