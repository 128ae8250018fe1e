"""Alchemical free energy: decouple a particle via soft-core LJ windows.

The production FEP workflow (solvation / binding free energies): turn
one atom's interactions off along a soft-core lambda path, sample every
window, and estimate the decoupling free energy TWO independent ways —

1. MBAR over all windows (statistically optimal, asymptotic errors),
2. thermodynamic integration with EXACT dU/dlambda from autodiff
   (``jax.jvp`` through the Beutler soft core — no finite differences),

whose agreement cross-validates the estimators, the soft-core path,
and the sampler in one shot.  All windows share ONE compiled BAOAB
sampler (lambda is a traced argument, not a rebuild).

System: LJ7 cluster at kT = 0.2 with a COM restraint and a weak
distance restraint keeping the decoupled particle near the cluster
(kept identical in every window, so both estimators target the same
restrained ensemble).

Run:  python examples/13_alchemical_decoupling.py [--full]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vaemolsim_tpu.md import baoab
from vaemolsim_tpu.mcmc import mbar_free_energy
from vaemolsim_tpu.potentials import (com_restraint, composite,
                                      harmonic_bonds, lennard_jones,
                                      lennard_jones_softcore,
                                      minimize_energy)

FULL = "--full" in sys.argv
N_REPLICAS = 1024 if FULL else 256
N_STEPS = 8000 if FULL else 2500
N_WINDOWS = 11 if FULL else 9
KT = 0.2
BETA = 1.0 / KT

N = 7
ALCH = np.asarray([True] + [False] * (N - 1))


def build_potential():
    u_sc = lennard_jones_softcore(sigma=1.0, epsilon=1.0, alchemical=ALCH)
    # Restraints: COM pin + keep atom 0 within reach of atom 1 so the
    # decoupled end state stays sampleable (identical in all windows).
    u_rest = composite(com_restraint(2.0),
                       harmonic_bonds([[0, 1]], k=2.0, r0=1.2))

    def u_total(x, lam):
        return u_sc(x, lam) + u_rest(x)

    return u_sc, u_rest, u_total


def main():
    u_sc, u_rest, u_total = build_potential()
    lams = np.linspace(1.0, 0.0, N_WINDOWS)  # state 0 = fully coupled

    # Equilibrated coupled start, shared by all windows.
    full = composite(lennard_jones(), com_restraint(2.0))
    x0 = 0.7 * jax.random.normal(jax.random.PRNGKey(0), (N_REPLICAS, N, 3))
    x0 = minimize_energy(full, x0, steps=1500, lr=0.1)

    @jax.jit
    def sample_window(x0, key, lam):
        pot = lambda x: u_total(x, lam)  # noqa: E731
        st, _ = baoab(pot, x0, jnp.zeros_like(x0), key, dt=0.004,
                      n_steps=N_STEPS, friction=1.0, kT=KT)
        return st.x

    @jax.jit
    def dudl(x, lam):
        # Exact per-replica dU/dlambda: one jvp with a unit lambda
        # tangent (the soft-core path derivative, no finite differences).
        _, d = jax.jvp(lambda l: u_sc(x, l), (lam,), (jnp.ones_like(lam),))
        return d

    samples, dudl_means = [], []
    for i, lam in enumerate(lams):
        xs = sample_window(x0, jax.random.PRNGKey(i + 1),
                           jnp.float32(lam))
        samples.append(xs)
        d = dudl(xs, jnp.float32(lam))
        dudl_means.append(float(jnp.mean(d)))
        print(f"lam={lam:.2f}: <U_sc> = "
              f"{float(jnp.mean(u_sc(xs, jnp.float32(lam)))):+8.3f}  "
              f"<dU/dl> = {dudl_means[-1]:+8.3f}")

    # --- MBAR over all windows (reduced log densities) ---
    pooled = jnp.concatenate(samples)
    L = jnp.stack([-BETA * u_total(pooled, jnp.float32(lam))
                   for lam in lams])
    res = mbar_free_energy(L, [N_REPLICAS] * N_WINDOWS)
    df_mbar = float(res.free_energies[-1])       # f(lam=0) - f(lam=1)
    se_mbar = float(res.stderrs[-1])

    # --- TI (dimensionless): f(0) - f(1) = beta * int_{1}^{0} <dU/dl> dl,
    # and np.trapezoid over the DESCENDING lams array is exactly that
    # oriented integral.
    df_ti = BETA * float(np.trapezoid(dudl_means, lams))

    print(f"\ndecoupling dF (dimensionless, state lam=1 -> lam=0):")
    print(f"  MBAR: {df_mbar:+.3f} +- {se_mbar:.3f}")
    print(f"  TI:   {df_ti:+.3f}  (exact autodiff dU/dl, trapezoid)")
    diff = abs(df_mbar - df_ti)
    tol = max(6 * se_mbar, 0.35 if FULL else 0.8)
    assert diff < tol, (df_mbar, df_ti)
    # Decoupling a bound LJ particle must COST free energy.
    assert df_mbar > 1.0
    print("alchemical workflow OK")


if __name__ == "__main__":
    main()
