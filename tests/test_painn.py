"""PaiNNPotential: E(3)-equivariant ML force field (nn/painn.py) —
exact invariance of the energy, exact rotation EQUIVARIANCE of forces
and of the internal vector features, the SchNetPotential contract
(masking, periodic/NPT, AD forces), and angular-resolving training a
distance-only readout cannot express per pair.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vaemolsim_tpu import md, observables, potentials
from vaemolsim_tpu.nn.painn import PaiNNPotential
from vaemolsim_tpu.nn.schnet import energy_force_loss


def _model(key=0, species_dim=2, **kw):
    kw.setdefault("features", 16)
    kw.setdefault("num_blocks", 2)
    kw.setdefault("n_rbf", 8)
    kw.setdefault("cutoff", 2.5)
    return PaiNNPotential.create(jax.random.PRNGKey(key), species_dim, **kw)


def _system(n=8, batch=3, scale=1.2, seed=1, species_dim=2):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    x = scale * jax.random.normal(k1, (batch, n, 3))
    species = jax.nn.one_hot(
        jax.random.randint(k2, (n,), 0, species_dim), species_dim)
    return x, species


def _rotation(seed=3):
    q = jax.random.normal(jax.random.PRNGKey(seed), (3, 3))
    r, _ = jnp.linalg.qr(q)
    return r


class TestInvariances:

    def test_shape_and_finite(self):
        x, sp = _system()
        m = _model()
        e = m(x, sp)
        assert e.shape == (3,) and jnp.isfinite(e).all()
        ea = m.atom_energies(x, sp)
        assert ea.shape == (3, 8)
        np.testing.assert_allclose(np.asarray(jnp.sum(ea, -1)),
                                   np.asarray(e), rtol=1e-6)

    def test_translation_and_rotation_invariant(self):
        x, sp = _system()
        m = _model()
        e = m(x, sp)
        np.testing.assert_allclose(np.asarray(m(x + 7.3, sp)),
                                   np.asarray(e), rtol=0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(m(x @ _rotation(), sp)),
                                   np.asarray(e), rtol=0, atol=1e-4)

    def test_reflection_invariant(self):
        """PaiNN vector features are l=1 Cartesian (parity-odd), read
        out through even contractions — the energy is O(3)-invariant,
        not just SO(3)."""
        x, sp = _system()
        m = _model()
        np.testing.assert_allclose(np.asarray(m(x.at[..., 0].mul(-1.0), sp)),
                                   np.asarray(m(x, sp)), rtol=0, atol=1e-4)

    def test_permutation_covariant(self):
        x, sp = _system()
        m = _model()
        perm = np.random.default_rng(0).permutation(x.shape[-2])
        np.testing.assert_allclose(np.asarray(m(x[:, perm], sp[perm])),
                                   np.asarray(m(x, sp)), rtol=0, atol=1e-4)

    def test_size_extensive(self):
        x, sp = _system(n=5, batch=2)
        m = _model()
        far = jnp.concatenate([x, x + 100.0], axis=-2)
        sp2 = jnp.concatenate([sp, sp], axis=0)
        np.testing.assert_allclose(np.asarray(m(far, sp2)),
                                   2 * np.asarray(m(x, sp)),
                                   rtol=2e-5, atol=2e-5)

    def test_mask_rows_are_inert(self):
        x, sp = _system(n=6)
        m = _model()
        mask = jnp.array([True] * 4 + [False] * 2)
        e_masked = m(x, sp, mask=mask)
        e_small = m(x[:, :4], sp[:4])
        np.testing.assert_allclose(np.asarray(e_masked),
                                   np.asarray(e_small), rtol=0, atol=1e-5)
        x2 = x.at[:, 4:].add(3.0)
        np.testing.assert_allclose(np.asarray(m(x2, sp, mask=mask)),
                                   np.asarray(e_masked), rtol=0, atol=1e-5)


class TestEquivariance:

    def test_forces_rotate_with_the_frame(self):
        """F(x R) = F(x) R exactly (to float32): the AD force field is
        rotation-equivariant because the energy is invariant AND the
        architecture propagates directions covariantly."""
        x, sp = _system(n=6, batch=2, seed=7)
        m = _model()
        R = _rotation(11)

        def forces(c):
            return -jax.grad(lambda cc: jnp.sum(m(cc, sp)))(c)

        f_rot = forces(x @ R)
        np.testing.assert_allclose(np.asarray(f_rot),
                                   np.asarray(forces(x) @ R),
                                   rtol=0, atol=2e-4)

    def test_vector_features_nonzero_in_anisotropic_environment(self):
        """The equivariant channel is actually live: a bent trimer's
        energy differs from a linear one at EQUAL nearest-neighbor
        distances (pure angular signal within one block's cutoff)."""
        m = _model(species_dim=1, num_blocks=2, cutoff=2.5)
        sp = jnp.ones((3, 1))

        def trimer(theta):
            # Central atom at origin; two neighbors at distance 1.
            a = jnp.array([jnp.cos(theta / 2), jnp.sin(theta / 2), 0.0])
            b = jnp.array([jnp.cos(theta / 2), -jnp.sin(theta / 2), 0.0])
            return jnp.stack([jnp.zeros(3), a, b])[None]

        e_lin = float(m(trimer(jnp.pi), sp)[0])
        e_bent = float(m(trimer(jnp.pi / 2), sp)[0])
        # d(0,1) = d(0,2) = 1 in both; only d(1,2) and ANGLES differ.
        assert abs(e_lin - e_bent) > 1e-4


class TestPeriodic:

    def test_minimum_image_wrap_invariance(self):
        box = jnp.array([4.0, 4.0, 4.0])
        x, sp = _system(scale=1.0)
        m = _model(cutoff=1.8)
        shift = jnp.array([4.0, -8.0, 4.0])
        x2 = x.at[:, 0].add(shift)
        np.testing.assert_allclose(np.asarray(m(x2, sp, box=box)),
                                   np.asarray(m(x, sp, box=box)),
                                   rtol=0, atol=1e-4)

    def test_npt_contracts(self):
        box = jnp.array([5.0, 5.0, 5.0])
        x, sp = _system(n=6, batch=2, scale=1.4)
        m = _model(cutoff=2.0)
        for_box = m.as_potential_for_box(sp)
        p = observables.virial_pressure(for_box, x, box=box, kt=1.0)
        assert p.shape == (2,) and jnp.isfinite(p).all()
        combo = potentials.composite(m.as_potential(sp, box=box),
                                     potentials.lennard_jones(box=box,
                                                              cutoff=2.0))
        assert jnp.isfinite(combo(x)).all()


class TestForces:

    def test_forces_match_finite_differences(self):
        x, sp = _system(n=5, batch=1, scale=0.9, seed=4)
        m = _model()
        pot = m.as_potential(sp)
        f = -jax.grad(lambda c: jnp.sum(pot(c)))(x)
        eps = 1e-3
        for idx in [(0, 1, 0), (0, 3, 2)]:
            xp = x.at[idx].add(eps)
            xm = x.at[idx].add(-eps)
            fd = -(pot(xp) - pot(xm))[0] / (2 * eps)
            assert abs(float(f[idx]) - float(fd)) < 5e-3

    def test_energy_smooth_across_cutoff(self):
        m = _model(species_dim=1, cutoff=2.0)
        sp = jnp.ones((2, 1))

        def e_of_r(r):
            x = jnp.stack([jnp.zeros(3),
                           jnp.array([1.0, 0.0, 0.0]) * r])[None]
            return m(x, sp)[0]

        eps = 1e-3
        for r in [1.9995, 2.0, 2.0005]:
            g = jax.grad(e_of_r)(jnp.asarray(r))
            fd = (e_of_r(r + eps) - e_of_r(r - eps)) / (2 * eps)
            assert abs(float(g) - float(fd)) < 5e-4
        assert abs(float(jax.grad(e_of_r)(jnp.asarray(2.0)))) < 1e-6
        assert float(e_of_r(2.3)) == pytest.approx(float(e_of_r(5.0)),
                                                   abs=1e-7)

    def test_nve_energy_conservation(self):
        x, sp = _system(n=6, batch=1, scale=1.5, seed=5)
        m = _model()
        pot = m.as_potential(sp)
        v0 = 0.3 * jax.random.normal(jax.random.PRNGKey(6), x.shape)
        st, _ = md.velocity_verlet(pot, x, v0, dt=2e-3, n_steps=200)
        e0 = float(pot(x)[0] + md.kinetic_energy(v0)[0])
        e1 = float(pot(st.x)[0] + md.kinetic_energy(st.v)[0])
        assert abs(e1 - e0) < 5e-3 * max(1.0, abs(e0))


class TestTraining:

    def test_learns_angular_three_body_target(self):
        """Fit a pure three-body angular energy — Stillinger-Weber-like
        ``E = sum (cos(theta) + 1/3)^2`` over trimer bends at equal bond
        lengths — from energies+forces.  The angular dependence is the
        regime PaiNN's directional messages exist for."""

        def target(x):
            # x (..., 3, 3): atoms (center, a, b); angle at the center.
            ra = x[..., 1, :] - x[..., 0, :]
            rb = x[..., 2, :] - x[..., 0, :]
            cos = (jnp.sum(ra * rb, -1)
                   / jnp.sqrt(jnp.sum(ra * ra, -1) * jnp.sum(rb * rb, -1)))
            return 3.0 * (cos + 1.0 / 3.0) ** 2

        thetas = jnp.linspace(0.6, 2.9, 48)

        def conf(theta):
            a = jnp.stack([jnp.cos(theta / 2), jnp.sin(theta / 2), 0.0 * theta])
            b = jnp.stack([jnp.cos(theta / 2), -jnp.sin(theta / 2), 0.0 * theta])
            return jnp.stack([jnp.zeros_like(a), a, b])

        x_train = jax.vmap(conf)(thetas)  # (48, 3 atoms, 3)
        # Orientation variety: rotate each frame with a distinct rotation
        # (the equivariant model must fit the angle, not the lab frame).
        keys = jax.random.split(jax.random.PRNGKey(9), 48)
        Rs = jax.vmap(lambda k: jnp.linalg.qr(
            jax.random.normal(k, (3, 3)))[0])(keys)
        x_train = jnp.einsum("bnd,bde->bne", x_train, Rs)
        e_ref = target(x_train)
        f_ref = -jax.vmap(jax.grad(lambda c: target(c[None])[0]))(x_train)

        sp = jnp.ones((3, 1))
        model = _model(key=2, species_dim=1, features=24, num_blocks=2,
                       n_rbf=12, cutoff=2.5)
        opt = optax.adam(optax.cosine_decay_schedule(5e-3, 800))
        state = opt.init(model)

        def loss(mdl):
            return energy_force_loss(mdl, x_train, sp, e_ref, f_ref,
                                     w_energy=1.0, w_force=0.3)

        @jax.jit
        def step(mdl, s):
            l, g = jax.value_and_grad(loss)(mdl)
            up, s = opt.update(g, s)
            return optax.apply_updates(mdl, up), s, l

        l0 = float(loss(model))
        for _ in range(800):
            model, state, l = step(model, state)
        assert float(l) < 0.05 * l0
        # Held-out bends reproduced.
        t_test = jnp.linspace(0.8, 2.7, 11)
        x_test = jax.vmap(conf)(t_test)
        err = jnp.max(jnp.abs(model(x_test, sp) - target(x_test)))
        assert float(err) < 0.25 * float(jnp.max(e_ref) - jnp.min(e_ref))

    def test_loss_with_mask_ignores_padding(self):
        x, sp = _system(n=6, batch=2)
        m = _model()
        mask = jnp.array([True] * 4 + [False] * 2)
        e = m(x, sp, mask=mask)
        f = -jax.grad(lambda c: jnp.sum(m(c, sp, mask=mask)))(x)
        l_masked = energy_force_loss(m, x, sp, e, f, mask=mask)
        assert float(l_masked) == pytest.approx(0.0, abs=1e-10)
