"""One simulation, the whole temperature curve: REMD + extrapolation.

The thermodynamic-extrapolation workflow of the reference's author
(the thermoextrap methodology) on this framework's engines: a single
replica-exchange MD run over a Lennard-Jones cluster gives samples at
R temperature rungs, and fluctuation-based Taylor extrapolation
(`vaemolsim_tpu.extrapolation`) + exact reweighting reconstruct the
potential-energy curve <U>(T) BETWEEN and BEYOND the simulated rungs —
cross-validated against the direct rung averages the ladder already
measured.

System: the LJ7 cluster (a COM restraint replaces a box — evaporation
is suppressed, the classic setup for its solid-liquid-like transition
around kT* ~ 0.15-0.25, where Cv from energy fluctuations peaks).

Validations:
1. Direct rung averages <U>(T_r) increase monotonically with T.
2. Two-sided midpoint consistency: independent order-3 Taylor models
   from the rungs below and above each inter-rung midpoint agree, and
   their mean lies between the bracketing direct averages.
3. Exact reweighting agrees with extrapolation where its effective
   sample size is healthy, and its ESS decays with temperature
   distance (the diagnostic that motivates extrapolation).
4. The fluctuation heat capacity is positive and largest in the
   transition region (the melting signature).

Run:  python examples/26_temperature_extrapolation.py [--full]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vaemolsim_tpu.extrapolation import beta_extrapolate, beta_reweight
from vaemolsim_tpu.parallel import REMDState, make_remd_step, run_remd
from vaemolsim_tpu.potentials import (com_restraint, composite,
                                      lennard_jones, minimize_energy)

FULL = "--full" in sys.argv
N_WALK = 64 if FULL else 24
N_ROUNDS = 3000 if FULL else 900
BURN = N_ROUNDS // 3
R = 8
TEMPS = np.geomspace(0.12, 0.45, R)  # through the LJ7 transition


def main():
    lj7 = composite(lennard_jones(),
                    com_restraint(k=2.0))  # hold the cluster together
    betas = jnp.asarray(1.0 / TEMPS)  # TEMPS ascending -> betas desc

    # One minimized seed, replicated
    x_min = minimize_energy(
        lj7, 0.8 * jax.random.normal(jax.random.PRNGKey(0), (7, 3)),
        steps=400, lr=0.02, polish_lbfgs=30)
    x0 = jnp.broadcast_to(x_min, (R, N_WALK, 7, 3))

    state = REMDState.create(lj7, x0, betas, jax.random.PRNGKey(1))
    step = make_remd_step(lj7, dt=0.004, friction=2.0,
                          md_steps_per_exchange=10)
    state, traj = run_remd(jax.jit(step), state, N_ROUNDS,
                           collect_every=3)
    print(f"REMD: swap acceptance {float(state.swap_acceptance_rate):.2f}")

    frames = traj[BURN // 3:]                 # (T, R, W, 7, 3)
    u = jax.jit(lj7)(frames)                  # (T, R, W)
    u_flat = jnp.moveaxis(u, 1, 0).reshape(R, -1)   # (R, samples)
    u_mean = np.asarray(u_flat.mean(axis=1))
    print("direct <U>(T):")
    for t, m in zip(TEMPS, u_mean):
        print(f"  T*={t:.3f}  <U> = {m:+.3f}")

    # --- 1. monotone in T ---
    assert (np.diff(u_mean) > 0).all(), u_mean

    # --- 2. two-sided midpoint consistency: extrapolating from the
    #     rung BELOW and the rung ABOVE each inter-rung midpoint must
    #     agree (each is an independent order-3 Taylor model; agreement
    #     localizes the curve between measured points) ---
    scale = u_mean.max() - u_mean.min()
    worst = 0.0
    for r in range(R - 1):
        b_mid = 0.5 * (float(betas[r]) + float(betas[r + 1]))
        lo = float(beta_extrapolate(u_flat[r], u_flat[r],
                                    float(betas[r]), b_mid, order=3))
        hi = float(beta_extrapolate(u_flat[r + 1], u_flat[r + 1],
                                    float(betas[r + 1]), b_mid,
                                    order=3))
        worst = max(worst, abs(lo - hi) / scale)
        # and the midpoint sits between the rung averages
        assert min(u_mean[r], u_mean[r + 1]) - 0.05 * scale \
            <= 0.5 * (lo + hi) \
            <= max(u_mean[r], u_mean[r + 1]) + 0.05 * scale
    print(f"two-sided midpoint disagreement (worst): "
          f"{100 * worst:.2f}% of the energy range")
    assert worst < (0.04 if FULL else 0.08), worst

    # --- 3. reweighting agrees nearby; ESS decays with distance ---
    mid = R // 2
    est_rw, ess = beta_reweight(u_flat[mid], u_flat[mid],
                                float(betas[mid]), betas)
    ess = np.asarray(ess)
    print("reweighting ESS from the middle rung:",
          np.array2string(ess, precision=0))
    near = abs(float(est_rw[mid + 1]) - u_mean[mid + 1]) / scale
    assert near < 0.02, near
    assert ess[mid] > ess[0] and ess[mid] > ess[-1]

    # --- 4. fluctuation heat capacity peaks in the transition region ---
    cv = np.asarray(jnp.var(u_flat, axis=1)) / TEMPS ** 2
    print("configurational Cv(T):", np.array2string(cv, precision=2))
    assert (cv > 0).all()
    peak_t = TEMPS[int(cv.argmax())]
    print(f"Cv peak at T* = {peak_t:.3f} (LJ7 transition region)")
    assert 0.1 < peak_t < 0.4
    print("OK")


if __name__ == "__main__":
    main()
