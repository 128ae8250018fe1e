"""Grand-canonical MC (vaemolsim_tpu.mcmc.gcmc): exact ideal-gas
Poisson N-statistics, pair-energy parity with the dense LJ factory,
chemical-potential consistency with Widom insertion, and masked-slot
bookkeeping.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu import observables, potentials
from vaemolsim_tpu.mcmc import (GCMCState, gcmc_init, lj_pair_u,
                                make_gcmc_step, run_gcmc)
from vaemolsim_tpu.mcmc.gcmc import total_energy


def _init(n_chains, n_max, n0, box_l, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    x = box_l * jax.random.uniform(k1, (n_chains, n_max, 3))
    active = jnp.arange(n_max)[None, :] < n0
    active = jnp.broadcast_to(active, (n_chains, n_max))
    return gcmc_init(x, active, k2)


class TestEnergyParity:

    def test_total_energy_matches_dense_lj(self):
        """Masked pair sums == the dense factory on the active subset
        (same cutoff/shift/linear-core conventions)."""
        box_l = 6.0
        st = _init(4, 12, 7, box_l, seed=3)
        u = lj_pair_u(cutoff=2.5)
        e = total_energy(st, u, jnp.full((3,), box_l))
        dense = potentials.lennard_jones(box=[box_l] * 3, cutoff=2.5)
        e_ref = dense(st.x[:, :7])
        np.testing.assert_allclose(np.asarray(e), np.asarray(e_ref),
                                   rtol=2e-5, atol=2e-5)

    def test_pair_u_no_cutoff_and_unshifted(self):
        u_plain = lj_pair_u()
        r2 = jnp.asarray([1.0, 2 ** (1 / 3)])  # r=1 and the minimum
        np.testing.assert_allclose(np.asarray(u_plain(r2)),
                                   [0.0, -1.0], atol=1e-6)
        u_trunc = lj_pair_u(cutoff=2.5, shift=False)
        assert float(u_trunc(jnp.asarray(6.26))) == 0.0  # past cutoff


class TestIdealGas:
    """pair_u = 0: N is exactly Poisson(zV) in the muVT ensemble."""

    def test_poisson_statistics(self):
        box_l = 4.0
        vol = box_l ** 3
        mu = float(np.log(8.0 / vol))  # z V = 8 mean particles
        st = _init(512, 40, 8, box_l, seed=1)
        step = make_gcmc_step(lambda r2: jnp.zeros_like(r2), box=box_l,
                              mu=mu, beta=1.0, n_disp=0)
        st, ns = jax.jit(lambda s: run_gcmc(step, s, 800,
                                            collect_every=8))(st)
        samp = np.asarray(ns[50:]).ravel()  # burn-in discarded
        mean, var = samp.mean(), samp.var()
        # Poisson: mean = var = zV = 8; wide tolerance for correlation
        assert abs(mean - 8.0) < 0.35, mean
        assert abs(var - 8.0) < 1.2, var
        assert samp.max() < 40  # capacity never binds

    def test_capacity_wall_blocks_insertion(self):
        box_l = 2.0
        st = _init(8, 5, 5, box_l, seed=2)  # full
        step = make_gcmc_step(lambda r2: jnp.zeros_like(r2), box=box_l,
                              mu=50.0, beta=1.0, n_disp=0)
        st2 = jax.jit(step)(st)
        # enormous activity, but no slot: N stays at capacity or drops
        assert int(jnp.max(st2.n)) <= 5


class TestInteracting:

    def test_widom_mu_round_trip(self):
        """Run muVT LJ at given mu; the measured density must satisfy
        mu = ln(rho) + mu_excess(rho) with mu_excess from Widom
        insertion on the SAME configurations (both sides through the
        framework's own estimators)."""
        box_l = 5.0
        vol = box_l ** 3
        kt = 2.0
        mu = kt * float(np.log(0.15))  # targets a moderate-density gas
        u = lj_pair_u(cutoff=2.5)
        st = _init(256, 64, 18, box_l, seed=4)
        step = make_gcmc_step(u, box=box_l, mu=mu, beta=1.0 / kt,
                              dx_scale=0.3, n_disp=2)
        st, ns = jax.jit(lambda s: run_gcmc(step, s, 1500,
                                            collect_every=15))(st)
        n_mean = float(np.asarray(ns[40:]).mean())
        rho = n_mean / vol
        assert 0.01 < rho < 0.2, rho

        # Widom on the final configurations (fixed-N estimator needs a
        # uniform N; use chains at the modal N)
        n_final = np.asarray(st.n)
        n_star = int(np.bincount(n_final).argmax())
        sel = np.nonzero(n_final == n_star)[0][:64]
        assert len(sel) >= 16
        # compact the active particles to the front for the dense call
        xs = []
        for c in sel:
            act = np.asarray(st.active[c])
            xs.append(np.asarray(st.x[c])[act][:n_star])
        xs = jnp.asarray(np.stack(xs))
        dense = potentials.lennard_jones(box=[box_l] * 3, cutoff=2.5)
        mu_ex, stderr = observables.widom_insertion(
            dense, xs, box=[box_l] * 3, key=jax.random.PRNGKey(9),
            n_insertions=2000, kT=kt)
        mu_pred = kt * np.log(n_star / vol) + float(mu_ex)
        tol = max(3.0 * float(stderr), 0.25)
        assert abs(mu_pred - mu) < tol, (mu_pred, mu, float(stderr))

    def test_acceptance_and_counters(self):
        box_l = 5.0
        u = lj_pair_u(cutoff=2.0)
        st = _init(32, 24, 10, box_l, seed=5)
        step = make_gcmc_step(u, box=box_l, mu=-1.0, beta=1.0,
                              dx_scale=0.25, n_disp=2)
        st, _ = jax.jit(lambda s: run_gcmc(step, s, 200))(st)
        assert 0.0 < float(st.disp_acceptance_rate) <= 1.0
        assert 0.0 <= float(st.exchange_acceptance_rate) < 1.0
        assert int(st.ins_trials) + int(st.del_trials) == 200 * 32
        assert int(st.disp_trials) <= 2 * 200 * 32
        assert jnp.isfinite(total_energy(st, u, box_l)).all()

    def test_per_chain_mu_isotherm(self):
        """mu as a per-chain array: dilute chains and dense chains in
        ONE program, each obeying its own ideal-gas law."""
        box_l = 4.0
        vol = box_l ** 3
        targets = np.array([2.0, 16.0])
        mu = jnp.repeat(jnp.asarray(np.log(targets / vol), jnp.float32), 64)
        st = _init(128, 48, 4, box_l, seed=7)
        step = make_gcmc_step(lambda r2: jnp.zeros_like(r2), box=box_l,
                              mu=mu, beta=1.0, n_disp=0)
        st, ns = jax.jit(lambda s: run_gcmc(step, s, 600,
                                            collect_every=6))(st)
        samp = np.asarray(ns[40:]).reshape(-1, 2, 64)
        means = samp.mean(axis=(0, 2))
        np.testing.assert_allclose(means, targets, rtol=0.12)

    def test_zero_particles_recoverable(self):
        """Chains emptied to N=0 must keep sampling (deletions rejected,
        insertions revive them)."""
        box_l = 3.0
        st = _init(16, 8, 0, box_l, seed=6)
        step = make_gcmc_step(lambda r2: jnp.zeros_like(r2), box=box_l,
                              mu=float(np.log(3.0 / box_l ** 3)),
                              beta=1.0, n_disp=1)
        st, _ = jax.jit(lambda s: run_gcmc(step, s, 300))(st)
        assert float(jnp.mean(st.n)) > 1.0
