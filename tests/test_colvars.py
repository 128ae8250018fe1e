"""Collective-variable library: closed-form geometry, invariances,
switching-function limits, and gradient correctness (the bias engines
consume exactly ``jax.vjp(cv_fn, x)``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu import colvars


def _fd_grad(f, x, eps=1e-4):
    x = np.asarray(x, np.float64)
    g = np.zeros_like(x)
    it = np.nditer(x, flags=["multi_index"])
    while not it.finished:
        idx = it.multi_index
        xp = x.copy(); xp[idx] += eps
        xm = x.copy(); xm[idx] -= eps
        g[idx] = (float(f(jnp.asarray(xp))) - float(f(jnp.asarray(xm)))) \
            / (2 * eps)
        it.iternext()
    return g


class TestGeometry:
    def test_distance_atoms(self):
        x = jnp.asarray([[0.0, 0, 0], [3.0, 4.0, 0]])
        assert np.isclose(float(colvars.distance(0, 1)(x)), 5.0, atol=1e-6)

    def test_distance_minimum_image(self):
        x = jnp.asarray([[0.1, 0, 0], [9.9, 0, 0]])
        cv = colvars.distance(0, 1, box=(10.0, 10.0, 10.0))
        assert np.isclose(float(cv(x)), 0.2, atol=1e-5)

    def test_distance_group_centroids_weighted(self):
        x = jnp.asarray([[0.0, 0, 0], [2.0, 0, 0], [5.0, 0, 0]])
        # weighted centroid of (0,1) with weights (1,3) is at x=1.5
        cv = colvars.distance([0, 1], 2, weights_i=(1.0, 3.0))
        assert np.isclose(float(cv(x)), 3.5, atol=1e-6)

    def test_angle(self):
        x = jnp.asarray([[1.0, 0, 0], [0.0, 0, 0], [0.0, 1.0, 0]])
        assert np.isclose(float(colvars.angle(0, 1, 2)(x)), np.pi / 2,
                          atol=1e-6)

    def test_torsion_signed(self):
        # +90 degree dihedral
        x = jnp.asarray([[0.0, 1.0, 0], [0.0, 0, 0],
                         [1.0, 0, 0], [1.0, 0, 1.0]])
        t = float(colvars.torsion(0, 1, 2, 3)(x))
        assert np.isclose(abs(t), np.pi / 2, atol=1e-6)
        # mirror flips the sign
        xm = x * jnp.asarray([1.0, 1.0, -1.0])
        tm = float(colvars.torsion(0, 1, 2, 3)(xm))
        assert np.isclose(tm, -t, atol=1e-6)

    def test_projection(self):
        x = jnp.asarray([[0.0, 0, 2.0], [0.0, 0, 4.0]])
        cv = colvars.projection([0, 1], axis=(0, 0, 2.0))  # normalized
        assert np.isclose(float(cv(x)), 3.0, atol=1e-6)

    def test_gyration_two_atoms(self):
        x = jnp.asarray([[0.0, 0, 0], [2.0, 0, 0]])
        assert np.isclose(float(colvars.gyration_radius()(x)), 1.0,
                          atol=1e-5)

    def test_gyration_rotation_translation_invariant(self):
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (6, 3))
        cv = colvars.gyration_radius(weights=np.arange(1.0, 7.0))
        th = 0.7
        rot = jnp.asarray([[np.cos(th), -np.sin(th), 0],
                           [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
        x2 = x @ rot.T + jnp.asarray([1.0, -2.0, 3.0])
        assert np.isclose(float(cv(x)), float(cv(x2)), atol=1e-5)

    def test_batched(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 5, 5, 3))
        for cv in (colvars.distance(0, 3), colvars.angle(0, 1, 2),
                   colvars.torsion(0, 1, 2, 3), colvars.gyration_radius(),
                   colvars.projection(2)):
            assert cv(x).shape == (4, 5)


class TestCoordination:
    def test_counting_limits(self):
        # 2 B atoms well inside r0, 1 far outside -> count ~ 2
        x = jnp.asarray([[0.0, 0, 0],
                         [0.1, 0, 0], [0.0, 0.1, 0], [5.0, 0, 0]])
        cv = colvars.coordination_number([0], [1, 2, 3], r0=1.0)
        assert np.isclose(float(cv(x)), 2.0, atol=1e-2)

    def test_value_and_limit_at_r0(self):
        cv = colvars.coordination_number([0], [1], r0=1.0, n=6)
        x = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0]])
        assert np.isclose(float(cv(x)), 0.5, atol=1e-4)  # n/m = 6/12

    def test_gradient_smooth_through_r0(self):
        cv = colvars.coordination_number([0], [1], r0=1.0, n=6)
        for r in (0.999999, 1.0, 1.000001, 0.8, 1.3):
            x = jnp.asarray([[0.0, 0, 0], [r, 0, 0]], jnp.float64) \
                if jax.config.jax_enable_x64 else \
                jnp.asarray([[0.0, 0, 0], [r, 0, 0]])
            g = jax.grad(lambda y: cv(y).sum())(x)
            assert np.all(np.isfinite(np.asarray(g)))
        # fd check just off the seam
        x = jnp.asarray([[0.0, 0, 0], [1.01, 0, 0]])
        g = np.asarray(jax.grad(lambda y: cv(y).sum())(x))
        fd = _fd_grad(lambda y: cv(y).sum(), x, eps=1e-3)
        assert np.allclose(g, fd, atol=2e-3)

    def test_self_pairs_excluded(self):
        x = jnp.asarray([[0.0, 0, 0], [0.1, 0, 0]])
        cv = colvars.coordination_number([0, 1], [0, 1], r0=1.0)
        # only the 0-1 and 1-0 cross pairs count (each ~1)
        assert np.isclose(float(cv(x)), 2.0, atol=1e-2)

    def test_minimum_image(self):
        x = jnp.asarray([[0.1, 0, 0], [9.9, 0, 0]])
        cv = colvars.coordination_number([0], [1], r0=1.0,
                                         box=(10.0, 10.0, 10.0))
        assert float(cv(x)) > 0.9


class TestRMSD:
    def test_zero_at_rigid_motion_of_reference(self):
        ref = jax.random.normal(jax.random.PRNGKey(2), (5, 3))
        th = 0.5
        rot = jnp.asarray([[np.cos(th), -np.sin(th), 0],
                           [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
        x = ref @ rot.T + jnp.asarray([0.3, -0.7, 1.1])
        cv = colvars.rmsd_to(ref)
        assert float(cv(x)) < 1e-4

    def test_known_value_isotropic_scale(self):
        ref = jnp.asarray([[1.0, 0, 0], [-1.0, 0, 0],
                           [0, 1.0, 0], [0, -1.0, 0]])
        x = 1.5 * ref
        # optimal rotation is identity; rmsd = 0.5 * rms(|ref|) = 0.5
        assert np.isclose(float(colvars.rmsd_to(ref)(x)), 0.5, atol=1e-5)

    def test_gradient_finite(self):
        ref = jax.random.normal(jax.random.PRNGKey(3), (5, 3))
        x = ref + 0.1 * jax.random.normal(jax.random.PRNGKey(4), (5, 3))
        g = jax.grad(lambda y: colvars.rmsd_to(ref)(y))(x)
        assert np.all(np.isfinite(np.asarray(g)))


class TestComposition:
    def test_linear_combination(self):
        x = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0], [1.0, 1.0, 0]])
        cv = colvars.linear_combination(
            [colvars.distance(0, 1), colvars.distance(1, 2)], [1.0, -1.0])
        assert np.isclose(float(cv(x)), 0.0, atol=1e-6)

    def test_length_mismatch_raises(self):
        with pytest.raises(ValueError):
            colvars.linear_combination([colvars.distance(0, 1)], [1.0, 2.0])

    def test_cv_gradient_matches_grad(self):
        x = jax.random.normal(jax.random.PRNGKey(5), (3, 4, 3))
        cv = colvars.gyration_radius()
        s, gs = colvars.cv_gradient(cv)(x)
        g_ref = jax.grad(lambda y: cv(y).sum())(x)
        assert np.allclose(np.asarray(gs), np.asarray(g_ref), atol=1e-6)
        assert s.shape == (3,)


class TestBiasEngineIntegration:
    def test_metadynamics_accepts_library_cv(self):
        """A library torsion drives metad_baoab end to end (tiny run)."""
        from vaemolsim_tpu import metadynamics as metad
        from vaemolsim_tpu import potentials

        bonds = jnp.asarray([[0, 1], [1, 2], [2, 3]])
        pot = potentials.composite(
            potentials.harmonic_bonds(bonds, k=100.0, r0=1.0),
            potentials.periodic_torsions([[0, 1, 2, 3]], k=2.0, n=3,
                                         phase=0.0),
        )
        x0 = jnp.asarray([[0.0, 1.0, 0], [0.0, 0, 0],
                          [1.0, 0, 0], [1.3, 0.3, 0.9]])[None]
        v0 = jnp.zeros_like(x0)
        grid = metad.bias_grid(-np.pi, np.pi, 32, periodic=True)
        st, g, cvs = metad.metad_baoab(
            pot, colvars.torsion(0, 1, 2, 3), x0, v0,
            jax.random.PRNGKey(0), dt=5e-3, n_steps=40, deposit_every=10,
            grid=grid, hill_height=0.2, hill_width=0.4, kT=1.0)
        assert np.all(np.isfinite(np.asarray(st.x)))
        assert float(jnp.max(g.v)) > 0.0
        assert cvs.shape == (4, 1)
