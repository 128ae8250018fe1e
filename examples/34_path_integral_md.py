"""Nuclear quantum effects: a light particle in a double well, via
path-integral MD — validated against an EXACT quantum reference.

Beyond-reference capability (the reference is classical-only): a
proton-like particle (m = 1, hbar = 1) in the quartic double well
``V(x) = V0 ((x/a)^2 - 1)^2`` at low temperature, where the well
zero-point energy ``hbar w / 2 = 2`` is comparable to the barrier
``V0 = 2`` — the regime where classical statistics fails badly:

1. **Exact quantum reference by DVR**: diagonalize the 1-D Hamiltonian
   on a grid (sine-basis finite differences + ``eigh`` — one symmetric
   eigensolve, the TPU-friendly way to get exact eigenpairs), then
   thermal-average ``<E>`` and the position density over Boltzmann
   weights.  At 400 grid points this is exact to far beyond float32.
2. **PIMD sampling** (:func:`vaemolsim_tpu.pimd.pimd_pile`, P = 32
   beads, hundreds of replicas as one scanned program): the bead
   histogram estimates the quantum position density; the
   centroid-virial estimator measures the quantum energy.
3. **Classical control**: the SAME code at P = 1 is plain Langevin —
   compared against exact classical quadrature.

Expected physics: the quantum energy sits near the zero-point plateau
(far above classical ~kT), and the quantum density fills the
classically forbidden barrier region (tunneling + zero-point
delocalization) by a large factor.

Run:  python examples/34_path_integral_md.py [--full]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vaemolsim_tpu import pimd

FULL = "--full" in sys.argv
V0, A = 2.0, 1.0
KT = 0.3
P_BEADS = 32
N_REPLICAS = 512 if FULL else 256
N_STEPS = 8000 if FULL else 4000
DT = 0.01
BURN = 40  # collected frames to discard


def potential(x):
    """Quartic double well, (..., n_atoms, dim) -> (...,)."""
    r2 = jnp.sum(x * x, axis=(-2, -1))
    return V0 * (r2 / A**2 - 1.0) ** 2


def v_np(x):
    return V0 * ((x / A) ** 2 - 1.0) ** 2


def dvr_reference(n_grid=400, x_max=3.0):
    """Exact 1-D quantum thermal averages by grid diagonalization."""
    x = np.linspace(-x_max, x_max, n_grid)
    dx = x[1] - x[0]
    # Second-derivative stencil (Dirichlet walls far in the forbidden
    # region); -hbar^2/2m d2/dx2 with m = hbar = 1.
    t = (np.diag(np.full(n_grid, 1.0 / dx**2))
         - 0.5 * np.diag(np.full(n_grid - 1, 1.0 / dx**2), 1)
         - 0.5 * np.diag(np.full(n_grid - 1, 1.0 / dx**2), -1))
    e, psi = np.linalg.eigh(t + np.diag(v_np(x)))
    w = np.exp(-(e - e[0]) / KT)
    w /= w.sum()
    energy = float(np.sum(w * e))
    rho = (psi**2 * w).sum(axis=1) / dx      # normalized density on x
    return x, rho, energy, e


def classical_reference(x_max=3.0):
    x = np.linspace(-x_max, x_max, 4001)
    b = np.exp(-v_np(x) / KT)
    z = np.trapezoid(b, x)
    e_conf = np.trapezoid(v_np(x) * b, x) / z
    return x, b / z, e_conf + 0.5 * KT        # + kinetic kT/2


def barrier_weight(xs, dens):
    m = np.abs(xs) < 0.3 * A
    return np.trapezoid(np.where(m, dens, 0.0), xs)


def run_pimd(n_beads, key, tag):
    kx, kv, kr = jax.random.split(key, 3)
    # Start replicas split between the wells.
    x0 = jnp.where(jax.random.bernoulli(kx, 0.5, (N_REPLICAS, 1, 1)),
                   A, -A).astype(jnp.float32)
    xb, vb = pimd.init_thermal_ring(kv, x0, n_beads=n_beads, kT=KT)
    out, traj = jax.jit(lambda x, v, k: pimd.pimd_pile(
        potential, x, v, k, dt=DT, n_steps=N_STEPS, kT=KT, tau0=1.0,
        collect_every=20))(xb, vb, kr)
    frames = traj[BURN:]
    e_vir = float(jnp.mean(jax.vmap(
        lambda xs: pimd.energy_virial(potential, xs, kT=KT))(frames)))
    rg2 = float(jnp.mean(jax.vmap(pimd.radius_of_gyration2)(frames)))
    beads = np.asarray(frames).reshape(-1)
    hist, edges = np.histogram(beads, bins=80, range=(-3, 3),
                               density=True)
    centers = 0.5 * (edges[1:] + edges[:-1])
    print(f"[{tag}] P={n_beads}: <E>_virial = {e_vir:.4f}, "
          f"sqrt(<r_g^2>) = {np.sqrt(max(rg2, 0.0)):.3f}")
    return centers, hist, e_vir


def main():
    print(f"double well V0={V0}, kT={KT}, beta V0 = {V0 / KT:.1f}, "
          f"well hbar w / 2 = {np.sqrt(8 * V0 / A**2) / 2:.2f}")
    xg, rho_q, e_quantum, levels = dvr_reference()
    xc, rho_c, e_classical = classical_reference()
    print(f"DVR exact: <E> = {e_quantum:.4f} "
          f"(E0 = {levels[0]:.4f}, splitting E1-E0 = "
          f"{levels[1] - levels[0]:.4f}); classical <E> = "
          f"{e_classical:.4f}")

    cq, hq, eq = run_pimd(P_BEADS, jax.random.PRNGKey(0), "quantum")
    cc, hc, ec = run_pimd(1, jax.random.PRNGKey(1), "classical")

    err_q = abs(eq - e_quantum) / abs(e_quantum)
    err_c = abs(ec - e_classical) / abs(e_classical)
    print(f"quantum energy error vs DVR: {100 * err_q:.1f}%  "
          f"(PIMD {eq:.4f} vs exact {e_quantum:.4f})")
    print(f"classical energy error vs quadrature: {100 * err_c:.1f}%  "
          f"(P=1 {ec:.4f} vs exact {e_classical:.4f})")

    wq_sim, wq_exact = barrier_weight(cq, hq), barrier_weight(xg, rho_q)
    wc_sim, wc_exact = barrier_weight(cc, hc), barrier_weight(xc, rho_c)
    print(f"barrier-region weight |x| < {0.3 * A}: quantum "
          f"{wq_sim:.4f} (exact {wq_exact:.4f}), classical "
          f"{wc_sim:.4f} (exact {wc_exact:.4f})")
    ratio = wq_sim / max(wc_sim, 1e-12)
    print(f"tunneling enhancement of barrier density: {ratio:.1f}x")

    assert err_q < 0.05, "quantum energy off DVR by >5%"
    assert err_c < 0.08, "classical energy off quadrature by >8%"
    assert eq > 1.5 * ec, "no zero-point energy visible"
    assert ratio > 1.5, "no quantum barrier filling visible"
    print("OK: PIMD reproduces exact quantum statistics; classical "
          "control reproduces classical statistics.")


if __name__ == "__main__":
    main()
