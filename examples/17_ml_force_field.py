"""Machine-learned force field: train SchNet on energies/forces, then
run MD on the learned potential and validate the structure it produces.

The reference names an ``atomschnet`` network over atomistic
configurations in its unfinished whole-system decoder
(vaemolsim/dists.py:850) but never implements it.
:class:`vaemolsim_tpu.nn.SchNetPotential` is that capability as a
production workflow — the standard ML-force-field loop:

1. generate reference data with the ground-truth potential (periodic
   LJ fluid; BAOAB at kT): decorrelated frames with energies and forces,
2. train the SchNet potential by joint energy/force matching
   (:func:`vaemolsim_tpu.nn.energy_force_loss` — forces carry 3N
   constraints per frame, so they dominate the loss),
3. validate held-out force/energy errors,
4. run NEW molecular dynamics ON the learned potential (same
   ``md.baoab`` call — it satisfies the framework's potential contract)
   and check the fluid structure it generates: g(r) must match the
   ground-truth ensemble, i.e. the model is good enough to *simulate*
   with, not just to regress energies.

Run:  python examples/17_ml_force_field.py [--full]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vaemolsim_tpu import md, observables, potentials
from vaemolsim_tpu.nn import SchNetPotential, energy_force_loss

FULL = "--full" in sys.argv
N = 16                                   # atoms
RHO = 0.5                                # number density
KT = 1.2                                 # supercritical LJ fluid
N_FRAMES = 512 if FULL else 192          # training frames
STEPS = 1500 if FULL else 500            # optimizer steps
MD_STEPS = 8000 if FULL else 3000        # validation MD length
BOX = (N / RHO) ** (1.0 / 3.0)


def generate_data(key, pot, n_frames):
    """Decorrelated equilibrium frames + energies + forces: many short
    independent BAOAB chains (one batched scan), then one force pass."""
    k1, k2, k3 = jax.random.split(key, 3)
    x0 = BOX * jax.random.uniform(k1, (n_frames, N, 3))
    x0 = potentials.minimize_energy(pot, x0, steps=400, lr=0.05)
    st, _ = jax.jit(lambda x, k: md.baoab(
        pot, x, jnp.zeros_like(x), k, dt=0.004, n_steps=2000,
        friction=1.0, kT=KT))(x0, k2)
    x = st.x - BOX * jnp.floor(st.x / BOX)    # wrap into the box
    e = pot(x)
    f = -jax.grad(lambda c: jnp.sum(pot(c)))(x)
    del k3
    return x, e, f


def main():
    box = jnp.full((3,), BOX)
    true_pot = potentials.lennard_jones(box=box, cutoff=2.5)

    print(f"generating reference data: N={N}, box={BOX:.3f}, kT={KT}")
    x, e, f = generate_data(jax.random.PRNGKey(0), true_pot,
                            N_FRAMES + 64)
    x_tr, e_tr, f_tr = x[:N_FRAMES], e[:N_FRAMES], f[:N_FRAMES]
    x_te, e_te, f_te = x[N_FRAMES:], e[N_FRAMES:], f[N_FRAMES:]
    print(f"  U/N in [{float(e.min())/N:.3f}, {float(e.max())/N:.3f}], "
          f"|F| rms {float(jnp.sqrt(jnp.mean(f**2))):.3f}")

    species = jnp.ones((N, 1))               # one species
    model = SchNetPotential.create(jax.random.PRNGKey(1), species_dim=1,
                                   features=32, num_blocks=2, n_rbf=24,
                                   cutoff=2.5)

    opt = optax.adam(optax.cosine_decay_schedule(3e-3, STEPS))
    state = opt.init(model)

    def loss(m, xb, eb, fb):
        return energy_force_loss(m, xb, species, eb, fb, box=box,
                                 w_energy=0.1, w_force=1.0)

    @jax.jit
    def step(m, s, k):
        idx = jax.random.choice(k, N_FRAMES, (64,), replace=False)
        l, g = jax.value_and_grad(loss)(m, x_tr[idx], e_tr[idx], f_tr[idx])
        up, s = opt.update(g, s)
        return optax.apply_updates(m, up), s, l

    print("training by energy/force matching:")
    keys = jax.random.split(jax.random.PRNGKey(2), STEPS)
    for i in range(STEPS):
        model, state, l = step(model, state, keys[i])
        if i % max(STEPS // 6, 1) == 0:
            print(f"  step {i:5d}  loss {float(l):.4f}")

    # --- held-out accuracy ---
    ml_pot = model.as_potential(species, box=box)
    e_pred = ml_pot(x_te)
    f_pred = -jax.grad(lambda c: jnp.sum(ml_pot(c)))(x_te)
    e_rmse = float(jnp.sqrt(jnp.mean((e_pred - e_te) ** 2))) / N
    f_rmse = float(jnp.sqrt(jnp.mean((f_pred - f_te) ** 2)))
    f_rms = float(jnp.sqrt(jnp.mean(f_te ** 2)))
    print(f"held-out: energy RMSE/atom {e_rmse:.4f}  "
          f"force RMSE {f_rmse:.4f} ({100 * f_rmse / f_rms:.1f}% of rms)")

    # --- simulate ON the learned potential ---
    print("running MD on the LEARNED potential:")
    n_rep = 64 if FULL else 32
    x0 = x_te[jnp.arange(n_rep) % x_te.shape[0]]
    st_ml, traj_ml = jax.jit(lambda xx, k: md.baoab(
        ml_pot, xx, jnp.zeros_like(xx), k, dt=0.004, n_steps=MD_STEPS,
        friction=1.0, kT=KT, collect_every=100))(x0, jax.random.PRNGKey(3))
    st_ref, traj_ref = jax.jit(lambda xx, k: md.baoab(
        true_pot, xx, jnp.zeros_like(xx), k, dt=0.004, n_steps=MD_STEPS,
        friction=1.0, kT=KT, collect_every=100))(x0, jax.random.PRNGKey(4))

    half = traj_ml.shape[0] // 2  # discard the first half as burn-in
    r, g_ml = observables.radial_distribution(traj_ml[half:], box=box,
                                              n_bins=40)
    _, g_ref = observables.radial_distribution(traj_ref[half:], box=box,
                                               n_bins=40)
    sel = np.asarray(r) > 0.8                # below first peak: no pairs
    gr_err = float(np.max(np.abs(np.asarray(g_ml)[sel]
                                 - np.asarray(g_ref)[sel])))
    i_peak = int(np.argmax(np.asarray(g_ref)))
    print(f"g(r) first peak: ref {float(g_ref[i_peak]):.3f} at "
          f"r={float(r[i_peak]):.3f}, ML {float(g_ml[i_peak]):.3f}; "
          f"max |dg| = {gr_err:.3f}")

    u_ml = float(jnp.mean(true_pot(traj_ml[half:]))) / N
    u_ref = float(jnp.mean(true_pot(traj_ref[half:]))) / N
    print(f"true-potential energy of generated ensembles: "
          f"ML-MD {u_ml:.3f}/atom vs ref-MD {u_ref:.3f}/atom")

    assert f_rmse / f_rms < 0.25, "force matching must reach <25% rel. RMSE"
    assert gr_err < 0.3, "ML-MD structure must track the reference g(r)"
    assert abs(u_ml - u_ref) < 0.25, "ML-MD ensemble energy must match"
    print("OK")


if __name__ == "__main__":
    main()
