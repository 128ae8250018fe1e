"""Internal-coordinate transform tests: analytic values, BAT round trips,
rotation invariance, jit/batch support."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu.coords import (bat_from_cartesian, bond_angles,
                                  bond_lengths, cartesian_from_bat,
                                  chain_zmatrix, dihedrals)


def random_rotation(key):
    A = jax.random.normal(key, (3, 3))
    Q, R = jnp.linalg.qr(A)
    return Q * jnp.sign(jnp.diag(R))


class TestMeasures:

    def test_bond_lengths(self):
        coords = jnp.array([[[0., 0, 0], [3., 4, 0], [3., 4, 12]]])
        out = bond_lengths(coords, [[0, 1], [1, 2], [0, 2]])
        np.testing.assert_allclose(out[0], [5.0, 12.0, 13.0], rtol=1e-6)

    def test_bond_angles(self):
        coords = jnp.array([[[1., 0, 0], [0., 0, 0], [0., 1, 0],
                             [-1., 0, 0]]])
        out = bond_angles(coords, [[0, 1, 2], [0, 1, 3], [0, 1, 0]])
        np.testing.assert_allclose(out[0, 0], np.pi / 2, rtol=1e-5)
        np.testing.assert_allclose(out[0, 1], np.pi, rtol=1e-5)
        np.testing.assert_allclose(out[0, 2], 0.0, atol=1e-3)

    def test_dihedral_quadrants(self):
        # Butane-like: vary the last atom around the 1-2 axis.
        base = jnp.array([[0., 1, 0], [0., 0, 0], [1., 0, 0]])

        def make(phi):
            # Atom 3 rotated by phi about the x-axis from the +y direction.
            p3 = jnp.array([1.0, jnp.cos(phi), jnp.sin(phi)])
            return jnp.concatenate([base, p3[None]], axis=0)[None]

        for phi in [0.0, 0.5, np.pi / 2, -2.0, 3.0]:
            out = dihedrals(make(jnp.float32(phi)), [[0, 1, 2, 3]])
            np.testing.assert_allclose(float(out[0, 0]), phi, atol=1e-5,
                                       err_msg=f"phi={phi}")

    def test_rotation_translation_invariance(self):
        coords = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 3))
        z = chain_zmatrix(6)
        b1, a1, t1 = bat_from_cartesian(coords, z)
        Q = random_rotation(jax.random.PRNGKey(1))
        moved = coords @ Q.T + jnp.array([5.0, -3.0, 2.0])
        b2, a2, t2 = bat_from_cartesian(moved, z)
        np.testing.assert_allclose(b1, b2, atol=1e-4)
        np.testing.assert_allclose(a1, a2, atol=1e-4)
        np.testing.assert_allclose(t1, t2, atol=1e-4)


class TestBATRoundTrip:

    def test_internal_coords_roundtrip(self):
        # Reconstruct from BAT, re-measure: internals must match exactly.
        key = jax.random.PRNGKey(2)
        coords = jax.random.normal(key, (3, 8, 3)) * 2.0
        z = chain_zmatrix(8)
        b, a, t = bat_from_cartesian(coords, z)
        rebuilt = cartesian_from_bat(b, a, t, z)
        b2, a2, t2 = bat_from_cartesian(rebuilt, z)
        np.testing.assert_allclose(b2, b, atol=1e-4)
        np.testing.assert_allclose(a2, a, atol=1e-4)
        # Compare torsions circularly.
        dphi = jnp.arctan2(jnp.sin(t2 - t), jnp.cos(t2 - t))
        np.testing.assert_allclose(dphi, 0.0, atol=1e-4)

    def test_canonical_frame(self):
        b = jnp.array([[1.5, 1.2, 1.1]])
        a = jnp.array([[2.0, 1.9]])
        t = jnp.array([[0.7]])
        out = cartesian_from_bat(b, a, t, chain_zmatrix(4))
        np.testing.assert_allclose(out[0, 0], [0, 0, 0], atol=1e-6)
        np.testing.assert_allclose(out[0, 1], [1.5, 0, 0], atol=1e-6)
        assert abs(float(out[0, 2, 2])) < 1e-6  # xy plane
        assert float(out[0, 2, 1]) > 0  # y > 0

    def test_cartesian_roundtrip_in_canonical_frame(self):
        # Build from BAT, measure, rebuild: Cartesian fixed point.
        b = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (2, 7))) + 0.8
        a = jax.random.uniform(jax.random.PRNGKey(4), (2, 6),
                               minval=0.5, maxval=2.6)
        t = jax.random.uniform(jax.random.PRNGKey(5), (2, 5),
                               minval=-np.pi, maxval=np.pi)
        z = chain_zmatrix(8)
        x = cartesian_from_bat(b, a, t, z)
        b2, a2, t2 = bat_from_cartesian(x, z)
        x2 = cartesian_from_bat(b2, a2, t2, z)
        np.testing.assert_allclose(x2, x, atol=1e-4)

    def test_jit_and_grad(self):
        z = chain_zmatrix(6)

        @jax.jit
        def f(t):
            b = jnp.ones((5,)) * 1.5
            a = jnp.ones((4,)) * 1.9
            x = cartesian_from_bat(b, a, t, z)
            return jnp.sum(x[-1] ** 2)

        t0 = jnp.array([0.3, -0.8, 2.0])
        g = jax.grad(f)(t0)
        assert jnp.all(jnp.isfinite(g))
        # Finite-difference check on the first torsion.
        eps = 1e-3
        fd = (f(t0.at[0].add(eps)) - f(t0.at[0].add(-eps))) / (2 * eps)
        np.testing.assert_allclose(float(g[0]), float(fd), rtol=2e-2)
