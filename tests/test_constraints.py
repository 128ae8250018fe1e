"""Holonomic bond constraints (md.bond_constraints + SHAKE/RATTLE
integrators): length maintenance on bonded chains, constrained NVE
energy conservation, and constrained-BAOAB equipartition with the
correct (3N - B) degree-of-freedom count.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vaemolsim_tpu import md, potentials


def _bond_lengths(con, x):
    r = jnp.einsum("ba,...ad->...bd", con.inc, x)
    return jnp.sqrt(jnp.sum(r * r, axis=-1))


class TestShakeRattle:

    def test_shake_projects_onto_manifold(self):
        """A perturbed chain trimer is restored to its bond lengths."""
        con = md.bond_constraints([[0, 1], [1, 2]], 1.0, n_atoms=3,
                                  masses=[1.0, 2.0, 3.0])
        x_ref = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0]])
        x = x_ref + 0.1 * jax.random.normal(jax.random.PRNGKey(0), (3, 3))
        x_c = con.shake(x_ref, x)
        np.testing.assert_allclose(np.asarray(_bond_lengths(con, x_c)),
                                   1.0, atol=2e-5)

    def test_rattle_zeroes_stretch_rate(self):
        con = md.bond_constraints([[0, 1], [1, 2]], 1.0, n_atoms=3)
        x = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0], [1.0, 1.0, 0]])
        v = jax.random.normal(jax.random.PRNGKey(1), (3, 3))
        v_c = con.rattle(x, v)
        r = jnp.einsum("ba,ad->bd", con.inc, x)
        rv = jnp.sum(r * jnp.einsum("ba,ad->bd", con.inc, v_c), axis=-1)
        np.testing.assert_allclose(np.asarray(rv), 0.0, atol=1e-5)

    def test_lengths_maintained_through_md(self):
        """Batched LJ trimers with rigid bonds: every bond stays at its
        target length through 400 RATTLE steps under real forces."""
        bonds = [[0, 1], [1, 2]]
        con = md.bond_constraints(bonds, 0.9, n_atoms=3,
                                  masses=[1.0, 1.5, 1.0])
        pot = potentials.lennard_jones()
        x0 = jnp.asarray([[0.0, 0, 0], [0.9, 0, 0], [1.8, 0, 0]])
        x0 = x0[None] + 0.02 * jax.random.normal(jax.random.PRNGKey(2),
                                                 (16, 3, 3))
        v0 = 0.5 * jax.random.normal(jax.random.PRNGKey(3), x0.shape)
        st, _ = jax.jit(lambda x, v: md.velocity_verlet_constrained(
            pot, x, v, dt=2e-3, n_steps=400, constraints=con,
            masses=jnp.asarray([1.0, 1.5, 1.0])[:, None]))(x0, v0)
        lens = np.asarray(_bond_lengths(con, st.x))
        np.testing.assert_allclose(lens, 0.9, atol=5e-4)
        assert np.isfinite(np.asarray(st.v)).all()

    def test_free_rigid_rotor_conserves_kinetic_energy(self):
        """A force-free rigid triangle must keep its kinetic energy.
        Regression: reconstructing the constraint-impulse velocity as
        (x_new - x)/dt in float32 bled ~3e-5 of the energy PER STEP
        (roundoff amplified by 1/dt, worse at smaller dt); the
        integrators now use shake_delta's separately-accumulated
        correction."""
        d, ang = 0.4, 1.9106
        d_hh = float(2 * d * np.sin(ang / 2))
        con = md.bond_constraints([[0, 1], [0, 2], [1, 2]],
                                  np.array([d, d, d_hh], np.float32),
                                  n_atoms=3, masses=[16.0, 1.0, 1.0])
        x0 = jnp.asarray([[0.0, 0, 0],
                          [d * np.sin(ang / 2), 0, d * np.cos(ang / 2)],
                          [-d * np.sin(ang / 2), 0,
                           d * np.cos(ang / 2)]])[None]
        v0 = con.rattle(x0, 0.8 * jax.random.normal(jax.random.PRNGKey(0),
                                                    x0.shape))
        zero = lambda x: jnp.zeros(x.shape[:-2])  # noqa: E731
        m = jnp.asarray([16.0, 1.0, 1.0])[:, None]
        st, _ = jax.jit(lambda x, v: md.velocity_verlet_constrained(
            zero, x, v, dt=5e-4, n_steps=2000, constraints=con,
            masses=m))(x0, v0)
        ke0 = float(md.kinetic_energy(v0, [16.0, 1.0, 1.0])[0])
        ke1 = float(md.kinetic_energy(st.v, [16.0, 1.0, 1.0])[0])
        assert abs(ke1 - ke0) / ke0 < 2e-3, (ke0, ke1)

    def test_constrained_nve_conserves_energy(self):
        con = md.bond_constraints([[0, 1]], 1.1, n_atoms=4)
        pot = potentials.lennard_jones()
        x0 = jnp.asarray([[0.0, 0, 0], [1.1, 0, 0],
                          [0.3, 1.4, 0], [1.0, 1.3, 1.1]])[None]
        v0 = 0.4 * jax.random.normal(jax.random.PRNGKey(4), x0.shape)
        con_v0 = con.rattle(x0, v0)
        e0 = float(pot(x0)[0] + md.kinetic_energy(con_v0)[0])
        st, _ = jax.jit(lambda x, v: md.velocity_verlet_constrained(
            pot, x, v, dt=1e-3, n_steps=1000, constraints=con))(x0, v0)
        e1 = float(pot(st.x)[0] + md.kinetic_energy(st.v)[0])
        assert abs(e1 - e0) < 2e-3 * max(1.0, abs(e0)), (e0, e1)

    def test_baoab_constrained_equipartition(self):
        """Constrained Langevin trimers: <KE> = (3N - B)/2 kT — the
        constraints genuinely remove kinetic DOFs."""
        n_rep, kt = 256, 0.8
        bonds = [[0, 1], [1, 2]]
        con = md.bond_constraints(bonds, 1.0, n_atoms=3)
        pot = potentials.composite(potentials.lennard_jones(),
                                   potentials.com_restraint(2.0))
        base = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0]])
        x0 = base[None] + 0.01 * jax.random.normal(
            jax.random.PRNGKey(5), (n_rep, 3, 3))
        st, _ = jax.jit(lambda x, k: md.baoab_constrained(
            pot, x, jnp.zeros_like(x), k, dt=3e-3, n_steps=3000,
            friction=2.0, kT=kt, constraints=con))(
                x0, jax.random.PRNGKey(6))
        lens = np.asarray(_bond_lengths(con, st.x))
        np.testing.assert_allclose(lens, 1.0, atol=2e-3)
        ke = float(jnp.mean(md.kinetic_energy(st.v)))
        dof = 3 * 3 - len(bonds)                      # 7
        expect = 0.5 * dof * kt
        assert abs(ke - expect) / expect < 0.08, (ke, expect)
        # sanity: the UNconstrained count (4.5 kT/2 per... 9/2 kt) would
        # be well outside that band
        assert abs(ke - 0.5 * 9 * kt) / (0.5 * 9 * kt) > 0.15

    def test_rigid_triatomic(self):
        """Three constraints (two bonds + the closing distance) make a
        rigid water-like molecule: all three lengths pinned through
        thermostatted dynamics."""
        d_oh, ang = 1.0, 1.9106  # ~109.5 deg
        d_hh = float(2 * d_oh * np.sin(ang / 2))
        bonds = [[0, 1], [0, 2], [1, 2]]
        lengths = np.array([d_oh, d_oh, d_hh], np.float32)
        con = md.bond_constraints(bonds, lengths, n_atoms=3,
                                  masses=[16.0, 1.0, 1.0])
        x0 = jnp.asarray([
            [0.0, 0, 0],
            [d_oh, 0, 0],
            [d_oh * np.cos(ang), d_oh * np.sin(ang), 0.0]])[None]
        x0 = jnp.repeat(x0, 8, axis=0)
        pot = potentials.com_restraint(1.0)
        st, _ = jax.jit(lambda x, k: md.baoab_constrained(
            pot, x, jnp.zeros_like(x), k, dt=2e-3, n_steps=1500,
            friction=1.0, kT=1.0, constraints=con,
            masses=jnp.asarray([16.0, 1.0, 1.0])[:, None]))(
                x0, jax.random.PRNGKey(7))
        lens = np.asarray(_bond_lengths(con, st.x))
        np.testing.assert_allclose(
            lens, np.broadcast_to(lengths, lens.shape), rtol=2e-3)
