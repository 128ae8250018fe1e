"""Dissipative particle dynamics (vaemolsim_tpu.dpd): exact momentum
conservation, fluctuation-dissipation temperature, VV reduction, and
the conservative-force/energy consistency identity.

Standard DPD reduced units throughout: r_c = 1, kT = 1, rho = 3,
a = 25, gamma = 4.5 (Groot & Warren 1997 water-like parametrization).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu import dpd, md


def _lattice(n_side, box_l, jitter_key=None, scale=0.05):
    g = jnp.linspace(0.0, box_l, n_side, endpoint=False)
    x = jnp.stack(jnp.meshgrid(g, g, g, indexing="ij"),
                  axis=-1).reshape(-1, 3)
    if jitter_key is not None:
        x = x + scale * jax.random.normal(jitter_key, x.shape)
    return x


N_SIDE = 5                      # 125 particles
BOX_L = (N_SIDE ** 3 / 3.0) ** (1.0 / 3.0)   # rho = 3
BOX = (BOX_L, BOX_L, BOX_L)


@pytest.fixture(scope="module")
def equilibrated():
    """A short GW-VV run from a jittered lattice with zeroed COM
    momentum; returns the final state and a production trajectory."""
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(0), 3)
    x0 = _lattice(N_SIDE, BOX_L, k0)
    v0 = jax.random.normal(k1, x0.shape)
    v0 = v0 - jnp.mean(v0, axis=0, keepdims=True)
    state, _ = dpd.dpd_vv(x0, v0, k2, n_steps=500, dt=0.01, box=BOX)
    state, traj = dpd.dpd_vv(state.x, state.v, jax.random.PRNGKey(3),
                             n_steps=2000, dt=0.01, box=BOX,
                             collect_every=50, collect_v=True)
    return state, traj


class TestConservation:

    def test_instantaneous_force_sums_to_zero(self):
        k0, k1, k2 = jax.random.split(jax.random.PRNGKey(4), 3)
        x = BOX_L * jax.random.uniform(k0, (64, 3))
        v = jax.random.normal(k1, x.shape)
        theta_raw = jax.random.normal(k2, (64, 64))
        theta = (theta_raw + theta_raw.T) / np.sqrt(2.0)
        f = dpd.dpd_forces(x, v, theta, a=25.0, gamma=4.5, kT=1.0,
                           dt=0.01, box=BOX)
        total = jnp.sum(f, axis=0)
        scale = jnp.mean(jnp.abs(f))
        assert float(jnp.max(jnp.abs(total))) < 1e-3 * float(scale) + 1e-4

    def test_momentum_conserved_over_run(self, equilibrated):
        state, _ = equilibrated
        p_total = jnp.sum(state.v, axis=0)          # unit masses
        # per-particle velocities are O(1); total drift stays at
        # float32 summation roundoff after 2500 steps
        assert float(jnp.max(jnp.abs(p_total))) < 5e-3

    def test_asymmetric_theta_rejected_by_physics(self):
        """With an UNsymmetrized noise matrix the random force no longer
        sums to zero — guards the symmetrization contract."""
        k0, k1 = jax.random.split(jax.random.PRNGKey(5))
        x = BOX_L * jax.random.uniform(k0, (64, 3))
        theta = jax.random.normal(k1, (64, 64))      # not symmetric
        f = dpd.dpd_forces(x, jnp.zeros_like(x), theta, a=0.0,
                           gamma=4.5, kT=1.0, dt=0.01, box=BOX)
        assert float(jnp.max(jnp.abs(jnp.sum(f, axis=0)))) > 1e-2


class TestThermostat:

    def test_kinetic_temperature(self, equilibrated):
        _, (x_traj, v_traj) = equilibrated
        temps = jax.vmap(md.temperature)(v_traj)
        t_mean = float(jnp.mean(temps[10:]))
        # GW overshoot at gamma dt = 0.045 is sub-percent; allow MC noise
        assert abs(t_mean - 1.0) < 0.05

    def test_maxwellian_velocities(self, equilibrated):
        _, (_, v_traj) = equilibrated
        v = np.asarray(v_traj[10:]).reshape(-1)
        kurt = np.mean(v ** 4) / np.mean(v ** 2) ** 2
        assert abs(kurt - 3.0) < 0.15

    def test_ideal_fluid_fdt(self):
        """a = 0: only dissipative + random forces; temperature must
        still equilibrate to kT (pure fluctuation-dissipation)."""
        k0, k1, k2 = jax.random.split(jax.random.PRNGKey(6), 3)
        x0 = BOX_L * jax.random.uniform(k0, (125, 3))
        v0 = 0.1 * jax.random.normal(k1, x0.shape)   # cold start
        v0 = v0 - jnp.mean(v0, axis=0, keepdims=True)
        state, traj = dpd.dpd_vv(x0, v0, k2, n_steps=3000, dt=0.01,
                                 a=0.0, gamma=4.5, kT=0.7, box=BOX,
                                 collect_every=100, collect_v=True)
        temps = jax.vmap(md.temperature)(traj[1][15:])
        assert abs(float(jnp.mean(temps)) - 0.7) < 0.05


class TestConservativeLimit:

    def test_force_is_gradient_of_soft_energy(self):
        x = BOX_L * jax.random.uniform(jax.random.PRNGKey(7), (48, 3))
        energy = dpd.soft_pair_energy(a=25.0, box=BOX)
        f_grad = -jax.grad(energy)(x)
        f_dpd = dpd.dpd_forces(x, jnp.zeros_like(x),
                               jnp.zeros((48, 48)), a=25.0, gamma=0.0,
                               kT=1.0, dt=0.01, box=BOX)
        np.testing.assert_allclose(np.asarray(f_dpd),
                                   np.asarray(f_grad),
                                   rtol=2e-4, atol=2e-4)

    def test_nve_energy_conservation(self):
        """gamma = kT = 0 reduces GW-VV to velocity Verlet: the soft-pair
        total energy drifts only at the O(dt^2) shadow level."""
        k0, k1 = jax.random.split(jax.random.PRNGKey(8))
        x0 = _lattice(4, (64 / 3.0) ** (1 / 3) * 1.0,
                      jitter_key=k0, scale=0.02)
        box = ((64 / 3.0) ** (1 / 3),) * 3
        v0 = 0.5 * jax.random.normal(k1, x0.shape)
        energy = dpd.soft_pair_energy(a=25.0, box=box)

        def total_e(s):
            return float(energy(s.x) + md.kinetic_energy(s.v))

        s0, _ = dpd.dpd_vv(x0, v0, jax.random.PRNGKey(9), n_steps=1,
                           dt=1e-4, a=25.0, gamma=0.0, kT=0.0, box=box)
        s1, _ = dpd.dpd_vv(s0.x, s0.v, jax.random.PRNGKey(10),
                           n_steps=2000, dt=0.005, a=25.0, gamma=0.0,
                           kT=0.0, box=box)
        e0, e1 = total_e(s0), total_e(s1)
        assert abs(e1 - e0) / abs(e0) < 2e-3


class TestSpecies:

    def test_pair_matrix_repulsion(self):
        """(n, n) a_ij: the A-B force uses the cross term, not the
        diagonal ones."""
        x = jnp.asarray([[0.0, 0.0, 0.0], [0.5, 0.0, 0.0]])
        a = jnp.asarray([[25.0, 80.0], [80.0, 25.0]])
        f = dpd.dpd_forces(x, jnp.zeros_like(x), jnp.zeros((2, 2)),
                           a=a, gamma=0.0, kT=1.0, dt=0.01)
        # w = 0.5, so |F| = a_AB * 0.5 = 40 along -x on particle 0
        np.testing.assert_allclose(float(f[0, 0]), -40.0, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(f[0]), -np.asarray(f[1]),
                                   rtol=1e-6)

    def test_jit_and_shapes(self):
        k = jax.random.PRNGKey(11)
        x0 = BOX_L * jax.random.uniform(k, (27, 3))
        run = jax.jit(lambda x, v, kk: dpd.dpd_vv(
            x, v, kk, n_steps=10, dt=0.01, box=BOX)[0])
        s = run(x0, jnp.zeros_like(x0), jax.random.PRNGKey(12))
        assert s.x.shape == (27, 3) and bool(jnp.all(jnp.isfinite(s.x)))

    def test_collect_every_validation(self):
        x = jnp.zeros((4, 3))
        with pytest.raises(ValueError, match="multiple"):
            dpd.dpd_vv(x, x, jax.random.PRNGKey(0), n_steps=7, dt=0.01,
                       collect_every=2)
