"""Weighted-ensemble sampling: exact resampler unbiasedness, exact
weight conservation, Boltzmann-correct equilibrium estimates, and the
Hill-relation rate against an exactly solvable recycled Markov chain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu import md, we
from vaemolsim_tpu.we import _systematic_resample


class TestResampler:

    def test_multiplicities_and_weights_unbiased(self):
        x = jnp.arange(8.0)[:, None]
        w = jnp.array([0.5, 0.25, 0.125, 0.0625, 0.03125, 0.03125,
                       0.0, 0.0])
        bins = jnp.zeros(8, jnp.int32)
        counts = np.zeros(8)
        wtot = np.zeros(8)
        N = 4000
        for i in range(N):
            nx, nw = _systematic_resample(x, w, bins, 2, 4,
                                          jax.random.PRNGKey(i))
            ids = np.asarray(nx[:4, 0]).astype(int)
            for j, idx in enumerate(ids):
                counts[idx] += 1
                wtot[idx] += float(nw[j])
        exp_mult = 4 * np.asarray(w) / float(w.sum())
        np.testing.assert_allclose(counts / N, exp_mult, atol=0.05)
        np.testing.assert_allclose(wtot / N, np.asarray(w), atol=0.01)

    def test_bin_weight_exactly_conserved(self):
        key = jax.random.PRNGKey(0)
        w = jax.random.uniform(key, (40,))
        w = w / w.sum()
        bins = jax.random.randint(jax.random.PRNGKey(1), (40,), 0, 5)
        x = jnp.arange(40.0)[:, None]
        nx, nw = _systematic_resample(x, w, bins, 5, 8,
                                      jax.random.PRNGKey(2))
        for b in range(5):
            w_in = float(jnp.where(bins == b, w, 0.0).sum())
            w_out = float(nw[8 * b: 8 * (b + 1)].sum())
            np.testing.assert_allclose(w_out, w_in, rtol=1e-5)

    def test_tiny_weight_new_bin_survives(self):
        # a lone 1e-9-weight walker in its own bin must keep its bin
        # populated after resampling (the mechanism WE exists for)
        w = jnp.zeros(16).at[0].set(0.999).at[1].set(1e-9)
        bins = jnp.zeros(16, jnp.int32).at[1].set(1)
        x = jnp.arange(16.0)[:, None]
        nx, nw = _systematic_resample(x, w, bins, 2, 8,
                                      jax.random.PRNGKey(0))
        np.testing.assert_allclose(float(nw[8:].sum()), 1e-9, rtol=1e-4)
        assert (np.asarray(nx[8:, 0]) == 1).all()


class TestDiscreteHillRate:

    def test_rate_matches_exact_recycled_chain(self):
        # Birth-death chain with a strong leftward bias: rare
        # right-edge arrivals.  The recycled chain's stationary flux is
        # exactly computable; WE must reproduce it.
        n = 8
        p_up, p_dn = 0.15, 0.45
        T = np.zeros((n, n))
        for i in range(n):
            if i + 1 < n:
                T[i, i + 1] = p_up
            if i - 1 >= 0:
                T[i, i - 1] = p_dn
        T += np.diag(1.0 - T.sum(axis=1))

        # exact: reroute arrivals at n-1 to 0, take the stationary dist
        Tr = T.copy()
        Tr[:, 0] += Tr[:, n - 1]
        Tr[:, n - 1] = 0.0
        evals, evecs = np.linalg.eig(Tr.T)
        pi = np.real(evecs[:, np.argmax(np.real(evals))])
        pi = pi / pi.sum()
        exact_flux = float(pi @ T[:, n - 1])

        logT = jnp.log(jnp.asarray(T) + 1e-30)

        def propagate(s, key):
            return jax.random.categorical(key, logT[s], axis=-1)

        step = we.make_we_step(propagate, lambda s: s, n_bins=n,
                               m_per_bin=16, target_bin=n - 1,
                               recycle_fn=lambda s: jnp.zeros_like(s))
        st = we_state = we.we_init(jnp.zeros(16, jnp.int32), n, 16,
                                   jax.random.PRNGKey(0))
        st, _ = we.run_we(jax.jit(step), st, 500)     # burn in
        f0, n0 = float(st.flux), int(st.n_iters)
        st, _ = we.run_we(jax.jit(step), st, 3000)
        rate = (float(st.flux) - f0) / (int(st.n_iters) - n0)
        np.testing.assert_allclose(rate, exact_flux, rtol=0.15)
        np.testing.assert_allclose(float(st.w.sum()), 1.0, atol=1e-4)


class TestEquilibrium:

    def test_boltzmann_bin_populations_without_recycling(self):
        # moderate double well, no recycling: WE weighted bin
        # populations must match Boltzmann quadrature.
        h = 2.0

        def pot(x):
            q = x[..., 0, 0]
            return h * (q * q - 1) ** 2

        def propagate(walk, k):
            x, v = walk
            st, _ = md.baoab(pot, x, v, k, dt=0.01, n_steps=20,
                             friction=1.0, kT=1.0)
            return (st.x, st.v)

        edges = jnp.linspace(-1.6, 1.6, 7)  # 8 bins

        def bin_fn(walk):
            return jnp.searchsorted(edges,
                                    walk[0][..., 0, 0]).astype(jnp.int32)

        x0 = -jnp.ones((8, 1, 1))
        v0 = jax.random.normal(jax.random.PRNGKey(1), (8, 1, 1))
        st = we.we_init((x0, v0), 8, 16, jax.random.PRNGKey(0))
        step = we.make_we_step(propagate, bin_fn, n_bins=8,
                               m_per_bin=16)
        st, traj = we.run_we(jax.jit(step), st, 1500, collect_every=5)
        (xs, _vs), ws = traj  # walker pytree snapshots + weights
        xs = np.asarray(xs[100:])[..., 0, 0].reshape(-1)
        ws = np.asarray(ws[100:]).reshape(-1)
        bins_t = np.searchsorted(np.asarray(edges), xs)
        pop = np.bincount(bins_t, weights=ws, minlength=8)
        pop = pop / pop.sum()

        qs = np.linspace(-4, 4, 8001)
        bolt = np.exp(-h * (qs ** 2 - 1) ** 2)
        lbl = np.searchsorted(np.asarray(edges), qs)
        truth = np.bincount(lbl, weights=bolt, minlength=8)
        truth = truth / truth.sum()
        np.testing.assert_allclose(pop, truth, atol=0.05)
        np.testing.assert_allclose(float(st.w.sum()), 1.0, atol=1e-4)


class TestAPI:

    def test_recycle_requires_fn(self):
        with pytest.raises(ValueError, match="recycle_fn"):
            we.make_we_step(lambda x, k: x, lambda x: x, n_bins=2,
                            m_per_bin=2, target_bin=1)

    def test_too_many_seeds_raises(self):
        with pytest.raises(ValueError, match="seeds"):
            we.we_init(jnp.zeros((5, 1)), 2, 2, jax.random.PRNGKey(0))
