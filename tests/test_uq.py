"""Deep-ensemble UQ for ML potentials (nn/uq.py): committee math
exactness, mask semantics, duck-typing over SchNet/PaiNN, and the core
claim — committee force disagreement is large out-of-distribution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vaemolsim_tpu import potentials
from vaemolsim_tpu.nn import (PaiNNPotential, SchNetPotential,
                              energy_force_loss, ensemble_energy_forces,
                              max_force_uncertainty)
from vaemolsim_tpu.train import stack_models


def _members(n=3, cls=SchNetPotential, species_dim=1, **kw):
    kw.setdefault("features", 12)
    kw.setdefault("num_blocks", 1)
    kw.setdefault("n_rbf", 8)
    kw.setdefault("cutoff", 2.5)
    return [cls.create(jax.random.PRNGKey(i), species_dim, **kw)
            for i in range(n)]


def _frames(n_atoms=4, batch=5, seed=0):
    x = 1.1 * jax.random.normal(jax.random.PRNGKey(seed),
                                (batch, n_atoms, 3))
    sp = jnp.ones((n_atoms, 1))
    return x, sp


class TestCommitteeMath:

    def test_identical_members_zero_std(self):
        m = _members(1)[0]
        stack = stack_models([m, m, m])
        x, sp = _frames()
        pred = ensemble_energy_forces(stack, x, sp)
        np.testing.assert_allclose(np.asarray(pred.energy_std), 0.0,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(pred.force_std), 0.0,
                                   atol=1e-6)
        # Mean equals the single model.
        np.testing.assert_allclose(np.asarray(pred.energy),
                                   np.asarray(m(x, sp)), rtol=1e-6)
        f = -jax.grad(lambda c: jnp.sum(m(c, sp)))(x)
        np.testing.assert_allclose(np.asarray(pred.forces),
                                   np.asarray(f), rtol=1e-5, atol=1e-6)

    def test_distinct_members_match_manual_stats(self):
        ms = _members(3)
        stack = stack_models(ms)
        x, sp = _frames(batch=2)
        pred = ensemble_energy_forces(stack, x, sp)
        es = jnp.stack([m(x, sp) for m in ms])
        fs = jnp.stack([-jax.grad(lambda c, mm=m: jnp.sum(mm(c, sp)))(x)
                        for m in ms])
        np.testing.assert_allclose(np.asarray(pred.energy),
                                   np.asarray(jnp.mean(es, 0)), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(pred.energy_std),
                                   np.asarray(jnp.std(es, 0)), rtol=1e-5,
                                   atol=1e-7)
        want = jnp.sqrt(jnp.mean(jnp.var(fs, 0), axis=(-2, -1)))
        np.testing.assert_allclose(np.asarray(pred.force_std),
                                   np.asarray(want), rtol=1e-5,
                                   atol=1e-7)

    def test_mask_excludes_padding(self):
        ms = _members(3)
        stack = stack_models(ms)
        x, sp = _frames(n_atoms=6, batch=3)
        mask = jnp.array([True] * 4 + [False] * 2)
        pred = ensemble_energy_forces(stack, x, sp, mask=mask)
        pred_small = ensemble_energy_forces(stack, x[:, :4], sp[:4])
        np.testing.assert_allclose(np.asarray(pred.force_std),
                                   np.asarray(pred_small.force_std),
                                   rtol=1e-5, atol=1e-6)
        mu = max_force_uncertainty(stack, x, sp, mask=mask)
        mu_small = max_force_uncertainty(stack, x[:, :4], sp[:4])
        np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_small),
                                   rtol=1e-5, atol=1e-6)

    def test_painn_stack_duck_types(self):
        ms = _members(2, cls=PaiNNPotential)
        stack = stack_models(ms)
        x, sp = _frames(batch=2)
        pred = ensemble_energy_forces(stack, x, sp)
        assert pred.energy.shape == (2,)
        assert jnp.isfinite(pred.force_std).all()
        mu = max_force_uncertainty(stack, x, sp)
        assert mu.shape == (2,) and jnp.isfinite(mu).all()
        # max-over-atoms dominates the frame RMS.
        assert np.all(np.asarray(mu) >= np.asarray(pred.force_std) - 1e-6)


class TestOutOfDistribution:

    def test_committee_disagrees_off_the_training_manifold(self):
        """Train 3 members on LJ-dimer separations r in [1.05, 1.35]
        only; the committee must disagree far more at r = 0.85 / 2.0
        (unseen) than inside the training window."""
        lj = potentials.lennard_jones()
        sp = jnp.ones((2, 1))

        def dimer(r):
            z = jnp.zeros_like(r)
            return jnp.stack([jnp.stack([z, z, z], -1),
                              jnp.stack([r, z, z], -1)], axis=-2)

        r_train = jnp.linspace(1.05, 1.35, 32)
        x_train = dimer(r_train)
        e_ref = lj(x_train)
        f_ref = -jax.vmap(jax.grad(lambda c: lj(c[None])[0]))(x_train)

        members = []
        for i in range(3):
            m = SchNetPotential.create(jax.random.PRNGKey(10 + i), 1,
                                       features=16, num_blocks=2,
                                       n_rbf=12, cutoff=2.5)
            opt = optax.adam(5e-3)
            st = opt.init(m)

            @jax.jit
            def step(mdl, s):
                l, g = jax.value_and_grad(
                    lambda mm: energy_force_loss(mm, x_train, sp, e_ref,
                                                 f_ref))(mdl)
                up, s = opt.update(g, s)
                return optax.apply_updates(mdl, up), s, l

            for _ in range(250):
                m, st, _ = step(m, st)
            members.append(m)

        stack = stack_models(members)
        r_in = jnp.linspace(1.1, 1.3, 8)
        r_out = jnp.array([0.85, 0.9, 1.8, 2.0])
        u_in = float(jnp.mean(ensemble_energy_forces(
            stack, dimer(r_in), sp).force_std))
        u_out = float(jnp.mean(ensemble_energy_forces(
            stack, dimer(r_out), sp).force_std))
        assert u_out > 3.0 * u_in, (u_in, u_out)
