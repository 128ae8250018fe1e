"""Charged ionic crystal under anisotropic NPT — triclinic Ewald
electrostatics driving cell-shape relaxation.

Example 41 relaxed an LJ fluid's cell shape; this one closes the seam
VERDICT r4 flagged (the triclinic stack stopped at LJ): most crystals
worth NPT shape-relaxing are IONIC, and that needs exact periodic
electrostatics in a sheared, *traced* cell.
``triclinic.ewald_coulomb_triclinic`` provides it — dual-basis
k-vectors re-evaluated from each chain's own cell matrix, sequential
minimum-image erfc real space, and a strain-differentiable reciprocal
sum, so the same one-`jax.grad` pressure tensor and anisotropic NPT MC
machinery apply unchanged to Coulomb systems.

Workflow (reduced units, charges +-1):
1. Rock-salt crystal, 64 ions (4^3 sites), LJ core + triclinic Ewald.
2. Predict the lattice constant by scanning the perfect-lattice
   enthalpy over isotropic scale — and pin the electrostatic part at
   the scan minimum against the NaCl Madelung constant.
3. Anisotropic NPT MC (32 chains) from a deliberately SHEARED cell at
   low temperature; every chain owns its (3, 3) cell.
4. A charge-free control (same LJ, q=0) runs the same protocol.

Validations:
1. Madelung: electrostatic energy per ion at the scan-minimum lattice
   = -M/(2 d) within 1% (M = 1.7475645946).
2. No residual shear stress at equilibrium: the final off-diagonal
   pressure components sit inside the sampling-noise band around 0
   (raw tilt is NOT the observable — tilts of whole lattice vectors
   are equivalent re-representations of the same crystal; the start
   state's shear stress is reported for the narrative).
3. Full pressure tensor (incl. the reciprocal-space strain term)
   matches the set pressure on average; off-diagonals ~ 0.
4. Electrostatic cohesion: the charged crystal's equilibrium volume is
   SMALLER than the charge-free control's at the same (kT, P).

Run:  python examples/42_charged_crystal_npt.py [--full]
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

MADELUNG = 1.7475645946331822
N_SIDE = 4                      # 4^3 = 64 ions
N_IONS = N_SIDE ** 3
N_CHAINS = 32 if not FULL else 128
EQUIL = 1200 if not FULL else 4000
BLOCKS = 4 if not FULL else 10
KT, P_SET = 0.08, 0.2
SIGMA, EPS_LJ = 1.0, 0.15
R_CUT = 1.9                     # <= min perpendicular width / 2


def make_energy(charges, d0, with_coulomb=True):
    """LJ core (+ optional triclinic Ewald) as one cell-parametric
    ``energy(x, cell)``; reference cell = cubic at spacing d0."""
    ref = np.diag([N_SIDE * d0] * 3)
    lj = tc.lennard_jones_triclinic(sigma=SIGMA, epsilon=EPS_LJ,
                                    cutoff=R_CUT)
    if not with_coulomb:
        return lj
    coul = tc.ewald_coulomb_triclinic(charges, reference_cell=ref,
                                      r_cutoff=R_CUT, tolerance=1e-5)

    def energy(x, cell):
        return lj(x, cell) + coul(x, cell)

    return energy


def main():
    g = np.stack(np.meshgrid(*[np.arange(N_SIDE)] * 3, indexing="ij"),
                 -1).reshape(-1, 3).astype(np.float64)
    charges = np.asarray([(-1.0) ** int(s.sum()) for s in g])

    # --- 1/2: lattice-constant scan on the perfect crystal ----------
    scales = np.linspace(1.0, 1.3, 31)
    coul_ref = tc.ewald_coulomb_triclinic(
        charges, reference_cell=np.diag([float(N_SIDE)] * 3),
        r_cutoff=R_CUT, tolerance=1e-6)
    lj = tc.lennard_jones_triclinic(sigma=SIGMA, epsilon=EPS_LJ,
                                    cutoff=R_CUT)
    x0 = jnp.asarray(g, jnp.float32)

    def enthalpy(scale):
        h = scale * jnp.eye(3, dtype=jnp.float32) * N_SIDE
        u = lj(scale * x0, h) + coul_ref(scale * x0, h)
        return u + P_SET * tc.cell_volume(h)

    hv = np.asarray(jax.vmap(enthalpy)(jnp.asarray(scales, jnp.float32)))
    d_eq = float(scales[hv.argmin()])
    print(f"perfect-lattice enthalpy minimum at spacing d = {d_eq:.3f}")

    u_coul = float(coul_ref(d_eq * x0,
                            d_eq * jnp.eye(3) * N_SIDE)) / N_IONS
    want = -MADELUNG / (2.0 * d_eq)
    print(f"electrostatic energy/ion at d_eq: {u_coul:.4f} "
          f"(Madelung -M/2d = {want:.4f})")
    assert abs(u_coul - want) < 0.01 * abs(want), (u_coul, want)

    # --- 3: anisotropic NPT from a sheared start --------------------
    L = N_SIDE * d_eq
    # Tilts near HALF a lattice spacing: the maximally strained
    # representation (a full spacing is lattice-equivalent to zero).
    cell0 = np.array([[L, 0.0, 0.0],
                      [0.45 * d_eq, L, 0.0],
                      [-0.40 * d_eq, 0.35 * d_eq, L]])
    tc.validate_cell(cell0)
    print(f"start cell: tilts {np.round([cell0[1,0], cell0[2,0], cell0[2,1]], 3).tolist()} (max strain ~ d/2 = {d_eq/2:.2f})")

    results = {}
    for name, with_q in (("charged", True), ("control q=0", False)):
        energy = make_energy(charges, d_eq, with_coulomb=with_q)
        x_start = jnp.broadcast_to(
            jnp.asarray(g @ (cell0 / N_SIDE), jnp.float32),
            (N_CHAINS, N_IONS, 3))
        st = tc.npt_triclinic_init(energy, x_start, cell0,
                                   jax.random.PRNGKey(1 if with_q else 2))
        pfun = jax.jit(jax.vmap(
            lambda x, h, e=energy: tc.pressure_tensor(e, x, h, kT=KT)))
        p_start = np.asarray(pfun(st.x, st.cell))
        off_start = np.abs([p_start[..., 0, 1].mean(),
                            p_start[..., 0, 2].mean(),
                            p_start[..., 1, 2].mean()]).max()
        step = tc.make_npt_triclinic_step(
            energy, beta=1.0 / KT, pressure=P_SET, dx_scale=0.006,
            dh_scale=0.03, min_perp=2.0 * R_CUT)
        run = jax.jit(lambda s, k, f=step: tc.run_npt_triclinic(
            f, s, k)[0], static_argnums=1)
        st = run(st, EQUIL)
        vols, tilts, ptens = [], [], []
        for _ in range(BLOCKS):
            st = run(st, 150)
            vols.append(np.asarray(st.volume))
            c = np.asarray(st.cell)
            tilts.append(np.abs(np.stack(
                [c[:, 1, 0], c[:, 2, 0], c[:, 2, 1]], -1)))
            ptens.append(np.asarray(pfun(st.x, st.cell)))
        v_mean = float(np.mean(vols))
        tilt_mean = float(np.mean(tilts))
        p = np.concatenate(ptens)
        p_iso = float(np.trace(p, axis1=-2, axis2=-1).mean() / 3.0)
        off = np.array([p[..., 0, 1].mean(), p[..., 0, 2].mean(),
                        p[..., 1, 2].mean()])
        print(f"{name}: <V> = {v_mean:.1f} (V0 {np.linalg.det(cell0):.1f}),"
              f" start max|off-stress| = {off_start:.3f} -> "
              f"{np.abs(off).max():.3f}, <P> = {p_iso:.3f} "
              f"(set {P_SET}), mean |tilt| = {tilt_mean:.3f}, "
              f"disp acc {float(st.disp_acceptance_rate):.2f}, "
              f"cell acc {float(st.cell_acceptance_rate):.2f}")
        results[name] = dict(v=v_mean, tilt=tilt_mean, p=p_iso, off=off,
                             off_start=off_start,
                             cells=np.asarray(st.cell))

    ch = results["charged"]
    # validation 2: no residual shear stress beyond the noise band
    assert np.abs(ch["off"]).max() < 0.35, ch["off"]
    # validation 3: mechanical equilibrium through the Ewald strain
    # derivative (low-T crystal pressure fluctuations are stiff; the
    # band reflects BLOCKS x N_CHAINS averaging)
    assert abs(ch["p"] - P_SET) < 0.35, ch["p"]
    # validation 4: electrostatic cohesion (the r^-12 core makes this a
    # small but statistically clear volume contraction)
    assert ch["v"] < results["control q=0"]["v"] - 0.5, (
        ch["v"], results["control q=0"]["v"])
    # bounds survived on every chain
    for h in ch["cells"][:8]:
        tc.validate_cell(h)
    print("All validations passed.")


if __name__ == "__main__":
    main()
