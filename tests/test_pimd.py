"""Path-integral MD: normal-mode exactness, ring-Hamiltonian
conservation, and quantum statistics against closed-form finite-P
harmonic values and the P -> inf coth limit."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu import pimd


def harmonic(w=1.0, m=1.0):
    def pot(x):
        return 0.5 * m * w * w * jnp.sum(x * x, axis=(-2, -1))

    return pot


def quartic(x):
    return jnp.sum(0.5 * x * x + 0.1 * x ** 4, axis=(-2, -1))


def harmonic_mode_vars(n_beads, kT, w, m=1.0, hbar=1.0):
    """Closed-form ring-ensemble normal-mode variances
    ``<q_k^2> = P kT / (m (omega_k^2 + w^2))`` for a harmonic
    potential (the ring canonical ensemble is at P kT)."""
    _, wk = pimd.ring_frequencies(n_beads, kT, hbar)
    return n_beads * kT / (m * (wk ** 2 + w ** 2))


class TestNormalModes:

    @pytest.mark.parametrize("p", [1, 2, 3, 4, 5, 8, 16])
    def test_orthonormal(self, p):
        c = pimd.normal_mode_matrix(p)
        np.testing.assert_allclose(c @ c.T, np.eye(p), atol=1e-12)

    @pytest.mark.parametrize("p", [2, 3, 4, 7, 16])
    def test_spring_energy_equals_mode_sum(self, p):
        """The roll-difference spring energy must equal the sum of
        independent mode energies at the row-indexed frequencies — the
        identity the exact free-ring propagator rests on."""
        kT, hbar = 0.7, 1.3
        masses = np.array([1.0, 2.0, 0.5])
        rng = np.random.default_rng(0)
        x = rng.normal(size=(p, 3, 2))
        c = pimd.normal_mode_matrix(p)
        _, wk = pimd.ring_frequencies(p, kT, hbar)
        q = np.einsum("kj,jnd->knd", c, x)
        expected = 0.5 * np.sum(
            wk[:, None, None] ** 2 * masses[:, None] * q * q)
        got = pimd.spring_energy(jnp.asarray(x), kT=kT, hbar=hbar,
                                 masses=masses)
        np.testing.assert_allclose(float(got), expected, rtol=1e-5)

    def test_free_ring_evolution_is_exact(self):
        """With U = 0, one NVE step of ANY dt conserves the free-ring
        Hamiltonian to float32 roundoff — the propagator is analytic,
        not discretized."""
        zero = lambda x: jnp.zeros(x.shape[:-2])  # noqa: E731
        key = jax.random.PRNGKey(0)
        xb, vb = pimd.init_thermal_ring(key, jnp.zeros((4, 2, 3)),
                                        n_beads=8, kT=0.5)
        h0 = pimd.ring_hamiltonian(zero, xb, vb, kT=0.5)
        out, _ = pimd.rpmd_nve(zero, xb, vb, dt=0.7, n_steps=3, kT=0.5)
        h1 = pimd.ring_hamiltonian(zero, out.x, out.v, kT=0.5)
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h0),
                                   rtol=2e-5)


class TestRPMDNVE:

    def test_conserves_ring_hamiltonian(self):
        xb, vb = pimd.init_thermal_ring(
            jax.random.PRNGKey(1),
            jax.random.normal(jax.random.PRNGKey(0), (6, 2, 1)),
            n_beads=16, kT=0.5)
        h0 = pimd.ring_hamiltonian(quartic, xb, vb, kT=0.5)
        out, _ = jax.jit(lambda x, v: pimd.rpmd_nve(
            quartic, x, v, dt=5e-4, n_steps=2000, kT=0.5))(xb, vb)
        h1 = pimd.ring_hamiltonian(quartic, out.x, out.v, kT=0.5)
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h0),
                                   rtol=1e-3)

    def test_centroid_frequency_harmonic(self):
        """In a harmonic well the centroid mode decouples exactly and
        oscillates at the PHYSICAL frequency w (the RPMD exactness
        property for harmonic correlation functions): starting from a
        displaced collapsed ring, a full period returns the centroid."""
        w = 2.0
        pot = harmonic(w=w)
        p = 8
        x0 = jnp.ones((p, 1, 1)) * 1.3         # collapsed, displaced
        v0 = jnp.zeros_like(x0)
        period = 2 * math.pi / w
        out, _ = pimd.rpmd_nve(pot, x0, v0, dt=period / 1000,
                               n_steps=1000, kT=0.5)
        centroid = jnp.mean(out.x, axis=-3)
        np.testing.assert_allclose(float(centroid[0, 0]), 1.3, atol=5e-3)

    def test_collect_shapes(self):
        xb, vb = pimd.init_thermal_ring(jax.random.PRNGKey(2),
                                        jnp.zeros((3, 2, 2)),
                                        n_beads=4, kT=1.0)
        out, traj = pimd.rpmd_nve(quartic, xb, vb, dt=1e-3, n_steps=40,
                                  kT=1.0, collect_every=10)
        assert traj.shape == (4, 3, 4, 2, 2)
        np.testing.assert_allclose(np.asarray(traj[-1]),
                                   np.asarray(out.x))
        out, (xt, vt) = pimd.rpmd_nve(quartic, xb, vb, dt=1e-3,
                                      n_steps=40, kT=1.0,
                                      collect_every=20, collect_v=True)
        assert xt.shape == vt.shape == (2, 3, 4, 2, 2)
        with pytest.raises(ValueError, match="multiple"):
            pimd.rpmd_nve(quartic, xb, vb, dt=1e-3, n_steps=41, kT=1.0,
                          collect_every=10)


class TestEstimators:

    def test_free_particle_virial_identity(self):
        """For U = 0 the centroid-virial estimator is IDENTICALLY
        d n kT / 2 — deterministic, configuration-independent."""
        x = jax.random.normal(jax.random.PRNGKey(3), (7, 8, 3, 2))
        zero = lambda x: jnp.zeros(x.shape[:-2])  # noqa: E731
        ev = pimd.energy_virial(zero, x, kT=0.3)
        np.testing.assert_allclose(np.asarray(ev), 0.5 * 3 * 2 * 0.3,
                                   atol=1e-6)

    def test_p1_reduces_to_classical(self):
        """At P = 1 both estimators are the classical
        d n kT / 2 + U(x) and the spring energy vanishes."""
        x = jax.random.normal(jax.random.PRNGKey(4), (5, 1, 2, 3))
        pot = harmonic(w=1.7)
        for est in (pimd.energy_primitive, pimd.energy_virial):
            kwargs = {"hbar": 1.0} if est is pimd.energy_primitive else {}
            np.testing.assert_allclose(
                np.asarray(est(pot, x, kT=0.4, **kwargs)),
                np.asarray(0.5 * 2 * 3 * 0.4 + pot(x[:, 0])), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(pimd.spring_energy(x, kT=0.4)), 0.0, atol=1e-6)

    def test_estimators_exact_on_harmonic_gaussian(self):
        """Sample the EXACT harmonic ring-polymer Gaussian in normal
        modes, transform through the module's matrix, and check both
        energy estimators and <x^2> against (a) the closed-form
        finite-P values and (b) the P -> inf quantum limit
        ``(w/2) coth(beta w / 2)`` — no MD involved, so this pins the
        estimator formulas and the convention wiring sharply."""
        p, kT, w = 64, 0.25, 1.0
        n_samp = 4000
        qk2 = harmonic_mode_vars(p, kT, w)
        c = jnp.asarray(pimd.normal_mode_matrix(p), jnp.float32)
        q = (jnp.sqrt(jnp.asarray(qk2, jnp.float32))[:, None, None]
             * jax.random.normal(jax.random.PRNGKey(5),
                                 (n_samp, p, 1, 1)))
        x = jnp.einsum("jk,...jnd->...knd", c, q)
        pot = harmonic(w=w)
        x2_exact = qk2.sum() / p
        evir_exact = (0.5 * kT
                      + (w * w / (2 * p)) * (2 * qk2[1:].sum() + qk2[0]))
        e_quantum = 0.5 * w / math.tanh(0.5 * w / kT)
        ev = float(jnp.mean(pimd.energy_virial(pot, x, kT=kT)))
        ep = float(jnp.mean(pimd.energy_primitive(pot, x, kT=kT)))
        x2 = float(jnp.mean(x ** 2))
        assert abs(x2 - x2_exact) / x2_exact < 0.05
        assert abs(ev - evir_exact) / evir_exact < 0.03
        # Primitive variance grows with P; same mean, looser tolerance.
        assert abs(ep - evir_exact) / evir_exact < 0.25
        # Finite-P bias at P = 64, beta hbar w = 4 is well under 1%.
        assert abs(evir_exact - e_quantum) / e_quantum < 0.01
        # And the quantum value is far from classical: zero-point energy.
        assert evir_exact > 2.0 * kT

    def test_radius_of_gyration(self):
        """Collapsed ring -> 0; free-ring thermal init matches the
        analytic ``d sum_{k>=1} kT / (m omega_k^2)``."""
        x = jnp.ones((3, 8, 2, 3)) * 2.0
        np.testing.assert_allclose(
            np.asarray(pimd.radius_of_gyration2(x)), 0.0, atol=1e-10)
        p, kT = 16, 0.5
        xb, _ = pimd.init_thermal_ring(jax.random.PRNGKey(6),
                                       jnp.zeros((2000, 1, 3)),
                                       n_beads=p, kT=kT)
        _, wk = pimd.ring_frequencies(p, kT, 1.0)
        expect = 3 * kT * np.sum(1.0 / wk[1:] ** 2)
        got = float(jnp.mean(pimd.radius_of_gyration2(xb)))
        assert abs(got - expect) / expect < 0.05


class TestPILE:

    def test_harmonic_finite_p_statistics(self):
        """PILE sampling reproduces the closed-form finite-P harmonic
        <x^2> and the virial energy — quantum delocalization well above
        the classical values (x2_classical = kT, E_classical = kT)."""
        p, kT, w = 16, 0.25, 1.0
        qk2 = harmonic_mode_vars(p, kT, w)
        x2_exact = qk2.sum() / p
        evir_exact = (0.5 * kT
                      + (w * w / (2 * p)) * (2 * qk2[1:].sum() + qk2[0]))
        xb, vb = pimd.init_thermal_ring(jax.random.PRNGKey(7),
                                        jnp.zeros((256, 1, 1)),
                                        n_beads=p, kT=kT)
        pot = harmonic(w=w)
        out, traj = jax.jit(lambda x, v, k: pimd.pimd_pile(
            pot, x, v, k, dt=0.02, n_steps=4000, kT=kT, tau0=2.0,
            collect_every=20))(xb, vb, jax.random.PRNGKey(8))
        burn = traj[50:]
        x2 = float(jnp.mean(burn ** 2))
        ev = float(jnp.mean(jax.vmap(
            lambda xs: pimd.energy_virial(pot, xs, kT=kT))(burn)))
        assert abs(x2 - x2_exact) / x2_exact < 0.08
        assert abs(ev - evir_exact) / evir_exact < 0.06
        assert x2 > 1.5 * kT and ev > 1.5 * kT   # far from classical

    def test_p1_is_classical_langevin(self):
        """P = 1 PILE is plain Langevin at the physical kT: classical
        harmonic <x^2> = kT / (m w^2)."""
        kT, w = 0.5, 1.0
        xb = jnp.zeros((512, 1, 1, 1))
        vb = jnp.zeros_like(xb)
        _, traj = pimd.pimd_pile(harmonic(w=w), xb, vb,
                                 jax.random.PRNGKey(9), dt=0.05,
                                 n_steps=3000, kT=kT, tau0=1.0,
                                 collect_every=10)
        x2 = float(jnp.mean(traj[50:] ** 2))
        assert abs(x2 - kT / w ** 2) / (kT / w ** 2) < 0.08

    def test_trpmd_internal_modes_and_free_centroid(self):
        """TRPMD thermostats internal modes only: free-particle
        internal-mode variances hit P kT / (m omega_k^2) while the
        centroid velocity stays EXACTLY constant (Hamiltonian, and the
        physical force is zero)."""
        p, kT = 8, 0.5
        masses = np.array([1.0, 4.0])
        zero = lambda x: jnp.zeros(x.shape[:-2])  # noqa: E731
        xb, vb = pimd.init_thermal_ring(jax.random.PRNGKey(10),
                                        jnp.zeros((1024, 2, 1)),
                                        n_beads=p, kT=kT, masses=masses)
        c = jnp.asarray(pimd.normal_mode_matrix(p), jnp.float32)
        v_cent0 = jnp.mean(vb, axis=-3)
        out, traj = pimd.trpmd(zero, xb, vb, jax.random.PRNGKey(11),
                               dt=0.02, n_steps=1500, kT=kT,
                               masses=masses, collect_every=30)
        # Exactly conserved up to float32 roundoff through 2 normal-mode
        # matmuls per step x 1500 steps (~2e-4 observed drift).
        np.testing.assert_allclose(np.asarray(jnp.mean(out.v, axis=-3)),
                                   np.asarray(v_cent0), atol=1e-3)
        q = jnp.einsum("kj,...jnd->...knd", c, traj[20:])
        _, wk = pimd.ring_frequencies(p, kT, 1.0)
        got = np.asarray(jnp.mean(q ** 2, axis=(0, 1, -1)))  # (p, atoms)
        expect = (p * kT / (masses[None, :]
                            * wk[:, None] ** 2 + (wk[:, None] == 0)))
        np.testing.assert_allclose(got[1:], expect[1:], rtol=0.12)


class TestInitThermalRing:

    def test_shapes_and_centroid(self):
        x = jax.random.normal(jax.random.PRNGKey(12), (5, 3, 2))
        xb, vb = pimd.init_thermal_ring(jax.random.PRNGKey(13), x,
                                        n_beads=8, kT=0.7)
        assert xb.shape == vb.shape == (5, 8, 3, 2)
        np.testing.assert_allclose(np.asarray(jnp.mean(xb, axis=-3)),
                                   np.asarray(x), atol=1e-5)

    def test_velocity_temperature_is_ring_ensemble(self):
        """Bead velocities are Maxwellian at P kT with per-atom
        masses."""
        p, kT = 4, 0.5
        masses = np.array([1.0, 2.0, 8.0])
        _, vb = pimd.init_thermal_ring(jax.random.PRNGKey(14),
                                       jnp.zeros((4000, 3, 2)),
                                       n_beads=p, kT=kT, masses=masses)
        got = np.asarray(jnp.mean(vb ** 2, axis=(0, 1, -1)))
        np.testing.assert_allclose(got, p * kT / masses, rtol=0.07)

    def test_p1_collapses(self):
        x = jax.random.normal(jax.random.PRNGKey(15), (3, 2, 2))
        xb, _ = pimd.init_thermal_ring(jax.random.PRNGKey(16), x,
                                       n_beads=1, kT=1.0)
        np.testing.assert_allclose(np.asarray(xb[:, 0]), np.asarray(x),
                                   atol=1e-6)
