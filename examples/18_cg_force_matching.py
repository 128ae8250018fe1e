"""Coarse-grained force matching: learn a CG potential from atomistic
forces, then simulate at CG resolution.

The reference library coarse-grains and backmaps configurations
(CGCentroid/CGCenterOfMass, vaemolsim/mappings.py:169-305) but gives
the CG representation no physics.  This workflow closes that loop with
the multiscale coarse-graining (MS-CG) variational principle (Izvekov &
Voth 2005; Noid et al. 2008) — regressing summed atomistic forces at
mapped coordinates yields the mean force of the many-body PMF:

1. ATOMISTIC ensemble: bonded trimer molecules in a periodic box
   (harmonic bonds + intermolecular LJ), sampled by BAOAB MD with
   forces recorded per frame,
2. MAP to one COM site per molecule (`nn.CGCenterOfMass` for
   coordinates, `cg.force_aggregation_matrix` for forces — the
   weights-sum-to-1 force map),
3. TRAIN a CG `SchNetPotential` with `cg.force_matching_loss`
   (residual floor = mean-force fluctuations, so validation loss
   plateaus well above zero — that is correct, not underfitting),
4. SIMULATE at CG resolution on the learned potential and validate:
   the CG-MD site-site g(r) must reproduce the g(r) of the *mapped
   atomistic* ensemble (the thermodynamic-consistency check).

Run:  python examples/18_cg_force_matching.py [--full]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vaemolsim_tpu import cg, md, observables, potentials
from vaemolsim_tpu.nn import SchNetPotential
from vaemolsim_tpu.nn.mappings import CGCenterOfMass

FULL = "--full" in sys.argv
M = 12                    # molecules (one CG site each)
APM = 3                   # atoms per molecule
N = M * APM
RHO_SITE = 0.25           # site number density
KT = 1.0
N_REP = 48 if FULL else 24
FG_STEPS = 12_000 if FULL else 5000
CG_STEPS = 12_000 if FULL else 5000
TRAIN_STEPS = 1500 if FULL else 800
BOX = (M / RHO_SITE) ** (1.0 / 3.0)


def build_fg_potential(box):
    bonds = np.concatenate([
        np.array([[0, 1], [1, 2]]) + APM * m for m in range(M)])
    excl = potentials.exclusions_from_bonds(N, bonds, through_angles=True)
    return potentials.composite(
        potentials.harmonic_bonds(bonds, k=200.0, r0=0.5),
        potentials.lennard_jones(box=box, cutoff=2.5, exclude=excl))


def main():
    box = jnp.full((3,), BOX)
    fg_pot = build_fg_potential(box)
    print(f"FG system: {M} trimers ({N} atoms), box {BOX:.2f}, kT {KT}")

    # --- 1. atomistic ensemble with forces ---
    key = jax.random.PRNGKey(0)
    com0 = BOX * jax.random.uniform(key, (N_REP, M, 1, 3))
    offs = 0.4 * jax.random.normal(jax.random.PRNGKey(1),
                                   (N_REP, M, APM, 3))
    x0 = (com0 + offs).reshape(N_REP, N, 3)
    x0 = potentials.minimize_energy(fg_pot, x0, steps=500, lr=0.02)
    st, traj = jax.jit(lambda x, k: md.baoab(
        fg_pot, x, jnp.zeros_like(x), k, dt=0.002, n_steps=FG_STEPS,
        friction=2.0, kT=KT, collect_every=100))(x0, jax.random.PRNGKey(2))
    half = traj.shape[0] // 2
    frames = traj[half:].reshape(-1, N, 3)     # (F, N, 3)
    forces = -jax.grad(lambda c: jnp.sum(fg_pot(c)))(frames)
    print(f"  {frames.shape[0]} frames, "
          f"U/molecule {float(jnp.mean(fg_pot(frames)))/M:.3f}")

    # --- 2. map to CG ---
    com = CGCenterOfMass.create([APM] * M, np.ones(N))
    agg = cg.force_aggregation_matrix([APM] * M)
    R = com(frames)                            # (F, M, 3)
    F_cg = cg.map_forces(agg, forces)          # (F, M, 3)
    r_grid, g_fg = observables.radial_distribution(R, box=box, n_bins=36)

    # --- 3. train the CG potential by force matching ---
    sp = jnp.ones((M, 1))
    model = SchNetPotential.create(jax.random.PRNGKey(3), species_dim=1,
                                   features=32, num_blocks=2, n_rbf=24,
                                   cutoff=2.5)
    n_train = int(0.9 * R.shape[0])
    opt = optax.adam(optax.cosine_decay_schedule(3e-3, TRAIN_STEPS))
    state = opt.init(model)

    @jax.jit
    def step(mdl, s, k):
        idx = jax.random.choice(k, n_train, (48,), replace=False)
        l, g = jax.value_and_grad(lambda mm: cg.force_matching_loss(
            mm, R[idx], sp, F_cg[idx], box=box))(mdl)
        up, s = opt.update(g, s)
        return optax.apply_updates(mdl, up), s, l

    val = jax.jit(lambda mm: cg.force_matching_loss(
        mm, R[n_train:], sp, F_cg[n_train:], box=box))
    print("force-matching training (loss floor = mean-force variance):")
    v0 = float(val(model))
    keys = jax.random.split(jax.random.PRNGKey(4), TRAIN_STEPS)
    for i in range(TRAIN_STEPS):
        model, state, l = step(model, state, keys[i])
        if i % max(TRAIN_STEPS // 5, 1) == 0:
            print(f"  step {i:5d}  train {float(l):8.3f}  "
                  f"val {float(val(model)):8.3f}")
    v1 = float(val(model))
    # Scale-free skill metric: correlation between predicted and mapped
    # forces on held-out frames (the MSE itself sits on the mean-force
    # fluctuation floor, so its absolute value is not informative).
    f_pred = -jax.grad(lambda x: jnp.sum(model(x, sp, box)))(R[n_train:])
    a = np.asarray(f_pred).ravel()
    b = np.asarray(F_cg[n_train:]).ravel()
    corr = float(np.corrcoef(a, b)[0, 1])
    print(f"validation force residual: {v0:.3f} -> {v1:.3f}  "
          f"(floor = mean-force variance); force correlation {corr:.3f}")

    # --- 4. CG MD on the learned potential ---
    cg_pot = model.as_potential(sp, box=box)
    R0 = R[jnp.arange(N_REP) % R.shape[0]]
    _, cg_traj = jax.jit(lambda x, k: md.baoab(
        cg_pot, x, jnp.zeros_like(x), k, dt=0.004, n_steps=CG_STEPS,
        friction=1.0, kT=KT, collect_every=100))(R0, jax.random.PRNGKey(5))
    _, g_cg = observables.radial_distribution(
        cg_traj[cg_traj.shape[0] // 2:], box=box, n_bins=36)

    sel = np.asarray(r_grid) > 0.7
    gr_err = float(np.max(np.abs(np.asarray(g_cg)[sel]
                                 - np.asarray(g_fg)[sel])))
    i_pk = int(np.argmax(np.asarray(g_fg)))
    print(f"CG site g(r): mapped-FG peak {float(g_fg[i_pk]):.3f} at "
          f"r={float(r_grid[i_pk]):.3f}, CG-MD {float(g_cg[i_pk]):.3f}; "
          f"max |dg| = {gr_err:.3f}")

    assert v1 < 0.9 * v0, "force matching must reduce the val residual"
    # the mean force is ~20% of the instantaneous mapped-force
    # variance at this dense-liquid state point, so corr ~ 0.45 at
    # convergence; the thermodynamic test is the g(r) match below
    assert corr > 0.3, "predicted CG forces must track the mean force"
    assert gr_err < 0.4, "CG-MD must reproduce the mapped-FG structure"
    print("OK")


if __name__ == "__main__":
    main()
