"""Gibbs-ensemble MC (vaemolsim_tpu.mcmc.gibbs): exact ideal-gas
Binomial partitioning at fixed volumes, density equalization under
volume exchange, conservation laws, and bookkeeping.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vaemolsim_tpu.mcmc import (gibbs_init, lj_pair_u, make_gibbs_step,
                                run_gibbs)
from vaemolsim_tpu.mcmc.gibbs import _box_energy


def _init(n_chains, n_max, n_a, n_b, box_a, box_b, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    x_a = box_a * jax.random.uniform(ks[0], (n_chains, n_max, 3))
    x_b = box_b * jax.random.uniform(ks[1], (n_chains, n_max, 3))
    act_a = jnp.broadcast_to(jnp.arange(n_max)[None, :] < n_a,
                             (n_chains, n_max))
    act_b = jnp.broadcast_to(jnp.arange(n_max)[None, :] < n_b,
                             (n_chains, n_max))
    return gibbs_init(x_a, act_a, x_b, act_b, box_a, box_b, ks[2])


IDEAL = lambda r2: jnp.zeros_like(r2)  # noqa: E731


class TestIdealGas:

    def test_binomial_partitioning_fixed_volumes(self):
        """Transfers only (dlnv_scale=0 never accepted... use tiny scale
        and ignore): with V_A = 2 V_B and N = 12 ideal particles,
        N_A ~ Binomial(12, 2/3) exactly."""
        st = _init(512, 24, 6, 6, box_a=2.0 ** (1 / 3) * 2.0, box_b=2.0,
                   seed=1)
        # volume moves disabled by a zero step (r_new == r, always
        # accepted but a no-op)
        step = make_gibbs_step(IDEAL, beta=1.0, dlnv_scale=0.0, n_disp=0)
        st, rhos = jax.jit(lambda s: run_gibbs(step, s, 600,
                                               collect_every=6))(st)
        v_a = float(st.box_a[0] ** 3)
        v_b = float(st.box_b[0] ** 3)
        np.testing.assert_allclose(v_a, 2 * v_b, rtol=1e-5)
        n_a = np.asarray(rhos[0][30:]) * v_a  # (T, C)
        p = v_a / (v_a + v_b)
        mean, var = n_a.mean(), n_a.var()
        assert abs(mean - 12 * p) < 0.15, mean
        assert abs(var - 12 * p * (1 - p)) < 0.5, var

    def test_volume_moves_equalize_density(self):
        """Ideal gas with volume + transfer moves: mean densities of the
        two boxes agree (single fluid phase)."""
        st = _init(256, 32, 16, 4, box_a=3.0, box_b=3.0, seed=2)
        step = make_gibbs_step(IDEAL, beta=1.0, dlnv_scale=0.08, n_disp=0)
        st, rhos = jax.jit(lambda s: run_gibbs(step, s, 800,
                                               collect_every=8))(st)
        r_a = float(np.asarray(rhos[0][50:]).mean())
        r_b = float(np.asarray(rhos[1][50:]).mean())
        assert abs(r_a - r_b) / max(r_a, r_b) < 0.12, (r_a, r_b)
        assert 0.0 < float(st.vol_acceptance_rate) <= 1.0

    def test_conservation_laws(self):
        """Total N and total V are invariants of every move."""
        st = _init(64, 16, 7, 3, box_a=2.5, box_b=2.0, seed=3)
        v_tot0 = np.asarray(st.box_a ** 3 + st.box_b ** 3)
        step = make_gibbs_step(lj_pair_u(cutoff=1.0), beta=1.0,
                               dx_scale=0.2, dlnv_scale=0.1, n_disp=1)
        st, _ = jax.jit(lambda s: run_gibbs(step, s, 150))(st)
        n_tot = np.asarray(st.n_a + st.n_b)
        np.testing.assert_array_equal(n_tot, 10)
        np.testing.assert_allclose(np.asarray(st.box_a ** 3
                                              + st.box_b ** 3),
                                   v_tot0, rtol=1e-4)


class TestInteracting:

    def test_energy_bookkeeping_and_counters(self):
        u = lj_pair_u(cutoff=1.5)
        st = _init(32, 20, 8, 8, box_a=4.0, box_b=4.0, seed=4)
        step = make_gibbs_step(u, beta=0.5, dx_scale=0.2,
                               dlnv_scale=0.03, n_disp=2, min_box=3.0)
        st, _ = jax.jit(lambda s: run_gibbs(step, s, 120))(st)
        assert int(st.vol_trials) == 120 * 32
        assert int(st.xfer_trials) == 120 * 32
        e_a = _box_energy(u, st.x_a, st.act_a, st.box_a)
        e_b = _box_energy(u, st.x_b, st.act_b, st.box_b)
        assert jnp.isfinite(e_a).all() and jnp.isfinite(e_b).all()
        # min_box wall respected
        assert float(jnp.min(st.box_a)) >= 3.0 - 1e-5
        assert float(jnp.min(st.box_b)) >= 3.0 - 1e-5

    def test_subcritical_lj_phase_separates(self):
        """At T* = 0.75 (well below Tc of truncated-shifted LJ), boxes
        started at the same mid density specialize: the densest box per
        chain ends far denser than the most dilute."""
        n_max = 48
        st = _init(48, n_max, 24, 24, box_a=4.3, box_b=4.3, seed=5)
        u = lj_pair_u(cutoff=2.0)
        step = make_gibbs_step(u, beta=1.0 / 0.75, dx_scale=0.25,
                               dlnv_scale=0.04, n_disp=4, min_box=2.4)
        st, rhos = jax.jit(lambda s: run_gibbs(step, s, 1200,
                                               collect_every=12))(st)
        r_a = np.asarray(rhos[0][-20:]).mean(axis=0)   # (C,)
        r_b = np.asarray(rhos[1][-20:]).mean(axis=0)
        hi = np.maximum(r_a, r_b)
        lo = np.minimum(r_a, r_b)
        # phase separation in the median chain
        assert float(np.median(hi / np.maximum(lo, 1e-4))) > 3.0, (
            float(np.median(hi)), float(np.median(lo)))
        assert float(np.median(hi)) > 0.35
