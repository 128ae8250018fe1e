"""MD and MC on the same force field — cross-validated ensembles.

The framework's two samplers must agree: Langevin (BAOAB) molecular
dynamics and tuned-HMC Monte Carlo target the same Boltzmann
distribution of the same first-party potential, so their equilibrium
observables coincide.  This is the standard production sanity loop
(and a genuine two-implementation statistical test: integrator +
thermostat vs Metropolis kernel share only the potential).

Workflow (everything one compiled scan per stage, replicas batched):

1. LJ7 cluster + COM restraint; overlapping random starts relaxed by
   ``potentials.minimize_energy``,
2. NVT sampling twice: ``md.baoab`` at kT and ``mcmc`` tuned HMC at
   beta = 1/kT,
3. compare mean potential energy and the radius-of-gyration
   distribution,
4. NVE continuation from the thermalized state: velocity-Verlet energy
   conservation as a force-field/integrator consistency check.

Run:  python examples/12_md_and_mc.py [--full]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vaemolsim_tpu.md import baoab, kinetic_energy, temperature, \
    velocity_verlet
from vaemolsim_tpu.mcmc import MCMCState, make_hmc_step, run_mcmc, tune_scale
from vaemolsim_tpu.potentials import (as_log_prob, com_restraint, composite,
                                      lennard_jones, minimize_energy)

FULL = "--full" in sys.argv
N_REPLICAS = 2048 if FULL else 512
MD_STEPS = 20_000 if FULL else 4000
MC_STEPS = 2000 if FULL else 500
KT = 0.2  # solid-like LJ7: bound cluster, meaningful fluctuations


def radius_of_gyration(x):
    com = jnp.mean(x, axis=-2, keepdims=True)
    return jnp.sqrt(jnp.mean(jnp.sum((x - com) ** 2, axis=-1), axis=-1))


def main():
    pot = composite(lennard_jones(), com_restraint(1.0))
    x0 = 0.7 * jax.random.normal(jax.random.PRNGKey(0), (N_REPLICAS, 7, 3))
    x0 = minimize_energy(pot, x0, steps=1500, lr=0.1)
    print(f"minimized: U in [{float(jnp.min(pot(x0))):.2f}, "
          f"{float(jnp.max(pot(x0))):.2f}]")

    # --- MD: BAOAB Langevin at kT ---
    st_md, _ = jax.jit(lambda x, k: baoab(
        pot, x, jnp.zeros_like(x), k, dt=0.004, n_steps=MD_STEPS,
        friction=1.0, kT=KT))(x0, jax.random.PRNGKey(1))
    u_md = float(jnp.mean(pot(st_md.x)))
    t_md = float(jnp.mean(temperature(st_md.v)))
    rg_md = np.asarray(radius_of_gyration(st_md.x))
    print(f"MD  (BAOAB): <U> = {u_md:.3f}, kinetic T = {t_md:.3f}, "
          f"<Rg> = {rg_md.mean():.4f}")

    # --- MC: tuned HMC at beta = 1/kT ---
    lp = as_log_prob(pot, beta=1.0 / KT)
    st = MCMCState.create(x0, lp(x0), jax.random.PRNGKey(2))
    eps, st = tune_scale(lp, st, kind="hmc", init_scale=0.01, rounds=15,
                         n_leapfrog=10)
    step = make_hmc_step(lp, step_size=eps, n_leapfrog=10)
    st, _ = jax.jit(lambda s: run_mcmc(step, s, MC_STEPS))(st)
    u_mc = float(jnp.mean(pot(st.configs)))
    rg_mc = np.asarray(radius_of_gyration(st.configs))
    print(f"MC  (HMC):   <U> = {u_mc:.3f}, acceptance "
          f"{float(st.acceptance_rate):.2f}, <Rg> = {rg_mc.mean():.4f}")

    # --- ensembles agree ---
    assert abs(u_md - u_mc) < 0.6, (u_md, u_mc)
    assert abs(rg_md.mean() - rg_mc.mean()) < 0.03, (rg_md.mean(),
                                                     rg_mc.mean())
    assert abs(t_md - KT) / KT < 0.1

    # --- NVE continuation: energy conservation ---
    e0 = pot(st_md.x) + kinetic_energy(st_md.v)
    st_nve, _ = jax.jit(lambda s: velocity_verlet(
        pot, s.x, s.v, dt=0.002, n_steps=2000))(st_md)
    e1 = pot(st_nve.x) + kinetic_energy(st_nve.v)
    drift = float(jnp.max(jnp.abs((e1 - e0) / e0)))
    print(f"NVE continuation: max relative energy drift {drift:.2e}")
    assert drift < 5e-3
    print("MD/MC cross-validation OK")


if __name__ == "__main__":
    main()
