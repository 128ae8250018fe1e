"""Minimum-energy paths: climbing-image NEB + string method, pinned by
the Muller-Brown surface's literature saddle points and an exact
quartic double-well barrier."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu import paths
from vaemolsim_tpu.potentials import minimize_energy

# Muller-Brown constants (Muller & Brown 1979) — configurations are
# (..., 1, 2) single "atoms" in 2-D.
_A = jnp.array([-200.0, -100.0, -170.0, 15.0])
_a = jnp.array([-1.0, -1.0, -6.5, 0.7])
_b = jnp.array([0.0, 0.0, 11.0, 0.6])
_c = jnp.array([-10.0, -10.0, -6.5, 0.7])
_X0 = jnp.array([1.0, 0.0, -0.5, -1.0])
_Y0 = jnp.array([0.0, 0.5, 1.5, 1.0])

# Literature values.
MB_SADDLE_1 = (-0.822001, 0.624313)      # E = -40.664844 (highest)
MB_E_SADDLE_1 = -40.664844
MB_E_MIN_A = -146.699487                 # (-0.558, 1.442) basin
MB_E_MIN_C = -108.166724                 # (0.623, 0.028) basin


def muller_brown(x):
    px, py = x[..., 0, 0], x[..., 0, 1]
    dx = px[..., None] - _X0
    dy = py[..., None] - _Y0
    return jnp.sum(_A * jnp.exp(_a * dx * dx + _b * dx * dy
                                + _c * dy * dy), axis=-1)


@pytest.fixture(scope="module")
def mb_minima():
    ma = minimize_energy(muller_brown, jnp.array([[[-0.558, 1.442]]]),
                         steps=2000, lr=0.005)[0]
    mc = minimize_energy(muller_brown, jnp.array([[[0.623, 0.028]]]),
                         steps=2000, lr=0.005)[0]
    return ma, mc


class TestClimbingNEB:

    def test_muller_brown_saddle(self, mb_minima):
        """The climbing image converges to the exact highest saddle of
        the A->C MEP: energy AND position to ~1e-4."""
        ma, mc = mb_minima
        assert abs(float(muller_brown(ma)) - MB_E_MIN_A) < 1e-3
        assert abs(float(muller_brown(mc)) - MB_E_MIN_C) < 1e-3
        p0 = paths.interpolate_path(ma, mc, 24)
        res = paths.climbing_neb(muller_brown, p0, n_steps=3000,
                                 k_spring=50.0, dt=0.002,
                                 climb_after=500)
        e = np.asarray(res.energies)
        assert abs(e.max() - MB_E_SADDLE_1) < 1e-3
        np.testing.assert_allclose(np.asarray(res.saddle).ravel(),
                                   MB_SADDLE_1, atol=2e-4)
        # barrier property = max - reactant energy
        assert abs(float(res.barrier)
                   - (MB_E_SADDLE_1 - MB_E_MIN_A)) < 2e-3
        assert float(res.f_max) < 0.01
        # endpoints never move
        np.testing.assert_array_equal(np.asarray(res.path[0]),
                                      np.asarray(ma))
        np.testing.assert_array_equal(np.asarray(res.path[-1]),
                                      np.asarray(mc))

    def test_quartic_double_well_exact_barrier(self):
        """V = (1 - x^2)^2 + 2 y^2: minima (+-1, 0) at 0, saddle at
        the origin with barrier exactly 1."""
        pot = lambda x: jnp.sum((1.0 - x[..., 0] ** 2) ** 2
                                + 2.0 * x[..., 1] ** 2, axis=-1)
        p0 = paths.interpolate_path(jnp.array([[-1.0, 0.3]]),
                                    jnp.array([[1.0, 0.3]]), 12)
        # endpoints slightly off-minimum in y on purpose: relax first
        a = minimize_energy(pot, p0[:1], steps=1000, lr=0.01)[0]
        b = minimize_energy(pot, p0[-1:], steps=1000, lr=0.01)[0]
        res = paths.climbing_neb(pot, paths.interpolate_path(a, b, 12),
                                 n_steps=2000, k_spring=5.0, dt=0.01)
        assert abs(float(res.barrier) - 1.0) < 1e-4
        np.testing.assert_allclose(np.asarray(res.saddle).ravel(),
                                   [0.0, 0.0], atol=1e-3)

    def test_validation(self):
        pot = lambda x: jnp.sum(x ** 2, axis=(-2, -1))
        with pytest.raises(ValueError, match="n_images"):
            paths.climbing_neb(pot, jnp.zeros((2, 1, 2)), n_steps=5)
        with pytest.raises(ValueError, match="n_images"):
            paths.string_method(pot, jnp.zeros((3, 2)), n_steps=5)


class TestStringMethod:

    def test_muller_brown_mep(self, mb_minima):
        """No climbing image, so the max-energy image sits just below
        the saddle — within the inter-image spacing's resolution."""
        ma, mc = mb_minima
        p0 = paths.interpolate_path(ma, mc, 32)
        res = paths.string_method(muller_brown, p0, n_steps=4000,
                                  step_size=2e-4)
        e = np.asarray(res.energies)
        assert MB_E_SADDLE_1 - 1.0 < e.max() < MB_E_SADDLE_1 + 0.2
        # images stay equally spaced along arc length
        flat = np.asarray(res.path).reshape(32, -1)
        seg = np.linalg.norm(np.diff(flat, axis=0), axis=-1)
        assert seg.std() / seg.mean() < 0.05
        # the MEP passes through the intermediate minimum's basin
        assert e.min() <= max(MB_E_MIN_A, MB_E_MIN_C)

    def test_jit_and_vmap_compose(self):
        """Paths are plain arrays: the optimizers jit and vmap."""
        pot = lambda x: jnp.sum((1.0 - x[..., 0] ** 2) ** 2
                                + 2.0 * x[..., 1] ** 2, axis=-1)
        p0 = paths.interpolate_path(jnp.array([[-1.0, 0.0]]),
                                    jnp.array([[1.0, 0.0]]), 8)
        run = jax.jit(lambda p: paths.climbing_neb(
            pot, p, n_steps=300, k_spring=5.0, dt=0.01).path)
        batch = jnp.stack([p0, p0 + 1e-3])
        out = jax.vmap(run)(batch)
        assert out.shape == (2, 8, 1, 2)
        assert np.isfinite(np.asarray(out)).all()


class TestHarmonicTST:

    def test_1d_double_well_matches_exact_tst_quadrature(self):
        """U = h (x^2 - 1)^2, high barrier: harmonic TST must match the
        exact flux-over-population TST rate
        k = sqrt(kT / 2 pi m) e^{-beta U(0)} / Int_well e^{-beta U}."""
        h, kt, m = 4.0, 0.5, 1.0
        pot = lambda x: jnp.reshape(h * (x[0, 0] ** 2 - 1.0) ** 2, ())
        x_min = jnp.array([[1.0]])
        x_sad = jnp.array([[0.0]])
        k_h = float(paths.harmonic_tst_rate(pot, x_min, x_sad, kt=kt,
                                            masses=m))
        xs = np.linspace(0.0, 3.0, 20001)
        u = h * (xs ** 2 - 1.0) ** 2
        z_well = np.trapezoid(np.exp(-u / kt), xs)
        k_exact = (np.sqrt(kt / (2 * np.pi * m))
                   * np.exp(-h / kt) / z_well)
        np.testing.assert_allclose(k_h, k_exact, rtol=0.05)

    def test_transverse_modes_cancel(self):
        """Adding identical harmonic transverse dimensions must not
        change the rate (their frequencies cancel min/saddle)."""
        h, kt = 4.0, 0.5
        pot1 = lambda x: jnp.reshape(h * (x[0, 0] ** 2 - 1) ** 2, ())
        pot3 = lambda x: jnp.reshape(
            h * (x[0, 0] ** 2 - 1) ** 2
            + 0.5 * 7.0 * x[0, 1] ** 2 + 0.5 * 2.5 * x[0, 2] ** 2, ())
        k1 = float(paths.harmonic_tst_rate(
            pot1, jnp.array([[1.0]]), jnp.array([[0.0]]), kt=kt))
        k3 = float(paths.harmonic_tst_rate(
            pot3, jnp.array([[1.0, 0.0, 0.0]]),
            jnp.array([[0.0, 0.0, 0.0]]), kt=kt))
        np.testing.assert_allclose(k3, k1, rtol=1e-4)

    def test_misidentified_stationary_points_are_loud(self):
        h = 4.0
        pot = lambda x: jnp.reshape(h * (x[0, 0] ** 2 - 1) ** 2, ())
        # Swapped min/saddle -> NaN, not a garbage number.
        k = paths.harmonic_tst_rate(pot, jnp.array([[0.0]]),
                                    jnp.array([[1.0]]), kt=0.5)
        assert np.isnan(float(k))

    def test_composes_with_climbing_neb_on_muller_brown(self, mb_minima):
        """End-to-end: NEB saddle + quadrature-free rate on the
        Muller-Brown surface — finite, and Arrhenius-consistent
        between two temperatures (ratio pinned by the exact barrier)."""
        ma, mc = mb_minima
        res = paths.climbing_neb(muller_brown, paths.interpolate_path(
            ma, mc, 24), n_steps=3000, k_spring=50.0, dt=0.002,
            climb_after=500)
        x_sad = res.saddle
        kt1, kt2 = 5.0, 10.0
        k1 = float(paths.harmonic_tst_rate(muller_brown, ma, x_sad,
                                           kt=kt1))
        k2 = float(paths.harmonic_tst_rate(muller_brown, ma, x_sad,
                                           kt=kt2))
        assert np.isfinite(k1) and np.isfinite(k2) and 0 < k1 < k2
        de = float(muller_brown(x_sad) - muller_brown(ma))
        np.testing.assert_allclose(np.log(k2 / k1),
                                   de * (1 / kt1 - 1 / kt2), rtol=1e-3)
