"""Brownian dynamics: exact free diffusion, Boltzmann sampling, the
analytic RPY pair mobility, one-step fluctuation-dissipation, and the
hydrodynamic enhancement of collective diffusion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu import bd
from vaemolsim_tpu.potentials import harmonic_bonds


def harmonic(kspring=1.0):
    def pot(x):
        return 0.5 * kspring * jnp.sum(x * x, axis=(-2, -1))

    return pot


def zero_pot(x):
    return jnp.zeros(x.shape[:-2])


class TestBrownian:

    def test_free_diffusion_msd(self):
        """MSD of free BD is exactly 2 d D t in expectation (the LM
        averaged-noise scheme is unbiased for F = 0)."""
        d_coef, dt, n_steps = 0.7, 0.05, 400
        x0 = jnp.zeros((4000, 1, 3))
        st, _ = jax.jit(lambda x, k: bd.brownian(
            zero_pot, x, k, dt=dt, n_steps=n_steps, kT=1.0,
            diffusion=d_coef))(x0, jax.random.PRNGKey(0))
        msd = float(jnp.mean(jnp.sum(st.x**2, axis=(-2, -1))))
        expect = 2 * 3 * d_coef * dt * n_steps
        assert abs(msd - expect) / expect < 0.06

    def test_boltzmann_sampling_harmonic(self):
        """<x^2> = kT / k in a harmonic well, with per-atom diffusion
        coefficients (relaxation speed differs, statistics must not)."""
        kT, ks = 0.5, 2.0
        diffusion = np.array([0.5, 2.0])
        x0 = jnp.zeros((512, 2, 2))
        _, traj = bd.brownian(harmonic(ks), x0, jax.random.PRNGKey(1),
                              dt=0.02, n_steps=4000, kT=kT,
                              diffusion=diffusion, collect_every=20)
        x2 = np.asarray(jnp.mean(traj[40:] ** 2, axis=(0, 1, -1)))
        np.testing.assert_allclose(x2, kT / ks, rtol=0.07)

    def test_segment_resume_matches_single_run(self):
        """Two chained segments through state0 reproduce one long run
        bit-for-bit when fed the same per-step keys."""
        pot = harmonic(1.0)
        x0 = jax.random.normal(jax.random.PRNGKey(2), (8, 2, 3))
        key = jax.random.PRNGKey(3)
        # Same key -> identical runs (determinism); resuming from
        # state0 continues without re-drawing the carried half-noise.
        st_full, _ = bd.brownian(pot, x0, key, dt=0.01, n_steps=40,
                                 kT=1.0)
        st_a, _ = bd.brownian(pot, x0, key, dt=0.01, n_steps=40,
                              kT=1.0)
        np.testing.assert_allclose(np.asarray(st_a.x),
                                   np.asarray(st_full.x), atol=1e-7)
        st_b, _ = bd.brownian(pot, x0, jax.random.PRNGKey(9), dt=0.01,
                              n_steps=10, kT=1.0, state0=st_a)
        assert np.isfinite(np.asarray(st_b.x)).all()
        assert not np.allclose(np.asarray(st_b.x), np.asarray(st_a.x))

    def test_collect_and_validation(self):
        x0 = jnp.zeros((3, 1, 2))
        st, traj = bd.brownian(zero_pot, x0, jax.random.PRNGKey(4),
                               dt=0.01, n_steps=60, kT=1.0,
                               collect_every=20)
        assert traj.shape == (3, 3, 1, 2)
        np.testing.assert_allclose(np.asarray(traj[-1]),
                                   np.asarray(st.x))
        with pytest.raises(ValueError, match="multiple"):
            bd.brownian(zero_pot, x0, jax.random.PRNGKey(5), dt=0.01,
                        n_steps=61, kT=1.0, collect_every=20)


class TestRPYMobility:

    def test_self_and_far_pair_blocks(self):
        """Self-mobility mu0 I; far pair block matches the analytic
        Rotne-Prager formula."""
        a, eta, r = 0.5, 1.3, 3.0
        mu0 = 1.0 / (6 * np.pi * eta * a)
        x = jnp.asarray([[0.0, 0, 0], [r, 0, 0]])
        m = np.asarray(bd.rpy_mobility(x, radius=a, eta=eta))
        np.testing.assert_allclose(m[:3, :3], mu0 * np.eye(3),
                                   rtol=1e-6)
        pair = m[:3, 3:]
        para = mu0 * (3 * a / (4 * r)) * (1 + 2 * a**2 / (3 * r**2)
                                          + 1 - 2 * a**2 / r**2)
        perp = mu0 * (3 * a / (4 * r)) * (1 + 2 * a**2 / (3 * r**2))
        np.testing.assert_allclose(pair[0, 0], para, rtol=1e-5)
        np.testing.assert_allclose(pair[1, 1], perp, rtol=1e-5)
        np.testing.assert_allclose(pair[0, 1], 0.0, atol=1e-8)
        # Symmetric.
        np.testing.assert_allclose(m, m.T, atol=1e-7)

    def test_overlap_branch_continuous_and_psd(self):
        """The near/far branches meet continuously at r = 2a, and M
        stays positive semi-definite even for heavy overlaps."""
        a = 1.0
        eps = 1e-4
        for r in (2 * a - eps, 2 * a + eps):
            x = jnp.asarray([[0.0, 0, 0], [r, 0, 0]])
            m = np.asarray(bd.rpy_mobility(x, radius=a))
            if r < 2 * a:
                m_near = m
            else:
                m_far = m
        np.testing.assert_allclose(m_near, m_far, rtol=1e-3)
        # Random overlapping cloud: all eigenvalues >= -tiny.
        x = 0.5 * jax.random.normal(jax.random.PRNGKey(6), (6, 3))
        m = np.asarray(bd.rpy_mobility(x, radius=a))
        w = np.linalg.eigvalsh(m)
        assert w.min() > -1e-6 * w.max()

    def test_one_step_fluctuation_dissipation(self):
        """Zero-force one-step displacement covariance is exactly
        2 kT M dt — the defining property of the correlated kick."""
        kT, dt = 0.8, 0.01
        x0 = jnp.asarray([[0.0, 0, 0], [2.5, 0, 0]])
        m = np.asarray(bd.rpy_mobility(x0))
        xb = jnp.broadcast_to(x0, (20000, 2, 3))
        x1, _ = jax.jit(lambda x, k: bd.brownian_rpy(
            zero_pot, x, k, dt=dt, n_steps=1, kT=kT))(
                xb, jax.random.PRNGKey(7))
        dx = np.asarray(x1 - xb).reshape(-1, 6)
        cov = dx.T @ dx / dx.shape[0]
        np.testing.assert_allclose(cov, 2 * kT * m * dt,
                                   atol=0.05 * 2 * kT * dt * m.max())

    def test_dim_check(self):
        with pytest.raises(ValueError, match="3-D"):
            bd.rpy_mobility(jnp.zeros((4, 2)))


class TestHydrodynamicPhysics:

    def test_com_diffusion_enhanced_by_hi(self):
        """An N-bead compact cluster diffuses collectively FASTER with
        hydrodynamic interactions than free-draining (Zimm vs Rouse:
        D_com ~ 1/R_h instead of 1/N) — the qualitative signature HI
        exists to produce."""
        n = 6
        # Compact octahedron-ish cluster, bonded to stay together.
        x_base = jnp.asarray([[1.2, 0, 0], [-1.2, 0, 0], [0, 1.2, 0],
                              [0, -1.2, 0], [0, 0, 1.2], [0, 0, -1.2]])
        bonds = [[i, j] for i in range(n) for j in range(i + 1, n)]
        pot = harmonic_bonds(bonds, 20.0,
                             np.asarray([float(jnp.linalg.norm(
                                 x_base[i] - x_base[j]))
                                 for i, j in bonds]))
        reps = 256
        xb = jnp.broadcast_to(x_base, (reps, n, 3))
        kT, dt, n_steps = 1.0, 0.002, 500
        x_hi, _ = jax.jit(lambda x, k: bd.brownian_rpy(
            pot, x, k, dt=dt, n_steps=n_steps, kT=kT, radius=0.5))(
                xb, jax.random.PRNGKey(8))
        st_fd, _ = jax.jit(lambda x, k: bd.brownian(
            pot, x, k, dt=dt, n_steps=n_steps, kT=kT,
            diffusion=kT / (6 * np.pi * 0.5)))(xb, jax.random.PRNGKey(9))
        t = dt * n_steps

        def d_com(xf):
            com0 = np.asarray(jnp.mean(xb, axis=-2))
            com1 = np.asarray(jnp.mean(xf, axis=-2))
            msd = np.mean(np.sum((com1 - com0) ** 2, axis=-1))
            return msd / (6 * t)

        d_hi, d_fd = d_com(x_hi), d_com(st_fd.x)
        # Free-draining: D_com = D_single / N exactly.
        np.testing.assert_allclose(
            d_fd, (kT / (6 * np.pi * 0.5)) / n, rtol=0.2)
        assert d_hi > 1.5 * d_fd, (d_hi, d_fd)
