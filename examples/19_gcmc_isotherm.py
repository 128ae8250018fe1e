"""Grand-canonical Monte Carlo: a mu-rho isotherm in ONE compiled program.

Open-system sampling (particle insertions/deletions at fixed chemical
potential) is the ensemble behind adsorption isotherms and phase
equilibria; the reference's engine is fixed-N only
(vaemolsim/mcmc.py).  `vaemolsim_tpu.mcmc.gcmc` makes it TPU-native:
variable N lives in a fixed-capacity slot array with an active mask
(static shapes), every move costs one masked (n_max,) pair-energy row,
and `mu` may be a PER-CHAIN array — so this example runs the whole
isotherm (5 chemical potentials x 128 replicas each) as one scanned,
vmapped program.

Validation at each isotherm point:
* ideal-gas limit: the most dilute point must approach rho = z,
* thermodynamic consistency: mu = kT ln(rho) + mu_ex(rho) with mu_ex
  re-measured by Widom insertion (an independent estimator) on the
  sampled configurations,
* monotonicity: rho(mu) strictly increasing (supercritical fluid).

Run:  python examples/19_gcmc_isotherm.py [--full]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vaemolsim_tpu import observables, potentials
from vaemolsim_tpu.mcmc import gcmc_init, lj_pair_u, make_gcmc_step, run_gcmc

FULL = "--full" in sys.argv
KT = 2.0                      # supercritical (T* = 2 > Tc ~ 1.31)
BOX_L = 6.0
VOL = BOX_L ** 3
N_MAX = 128
N_REP = 256 if FULL else 128  # replicas per isotherm point
SWEEPS = 4000 if FULL else 1500
MUS = KT * np.log(np.array([0.002, 0.01, 0.04, 0.1, 0.2]))  # activities z


def main():
    n_mu = len(MUS)
    pair = lj_pair_u(cutoff=2.5)

    # one chain axis of n_mu * N_REP, mu varying along it
    mu_grid = jnp.repeat(jnp.asarray(MUS, jnp.float32), N_REP)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x0 = BOX_L * jax.random.uniform(k1, (n_mu * N_REP, N_MAX, 3))
    n0 = jnp.clip((jnp.exp(mu_grid / KT) * VOL).astype(jnp.int32), 1,
                  N_MAX // 2)
    active0 = jnp.arange(N_MAX)[None, :] < n0[:, None]
    state = gcmc_init(x0, active0, k2)

    step = make_gcmc_step(pair, box=BOX_L, mu=mu_grid, beta=1.0 / KT,
                          dx_scale=0.35, n_disp=2)
    print(f"muVT LJ isotherm: {n_mu} chemical potentials x {N_REP} "
          f"replicas, {SWEEPS} sweeps, one jitted scan")
    state, ns = jax.jit(lambda s: run_gcmc(step, s, SWEEPS,
                                           collect_every=10))(state)
    burn = ns.shape[0] // 3
    ns = np.asarray(ns[burn:]).reshape(-1, n_mu, N_REP)
    n_high = int(np.asarray(state.n).max())
    print(f"exchange acceptance {float(state.exchange_acceptance_rate):.3f},"
          f" displacement {float(state.disp_acceptance_rate):.3f},"
          f" high-water N = {n_high}/{N_MAX}")
    assert n_high < N_MAX, "capacity bound must never bind"

    rho = ns.mean(axis=(0, 2)) / VOL
    print(f"{'z':>8} {'mu':>8} {'rho':>9} {'rho_ideal':>10}")
    for mu, r in zip(MUS, rho):
        z = np.exp(mu / KT)
        print(f"{z:8.4f} {mu:8.3f} {r:9.5f} {z:10.4f}")

    # --- ideal-gas limit at the dilute end ---
    z0 = np.exp(MUS[0] / KT)
    assert abs(rho[0] / z0 - 1.0) < 0.15, (rho[0], z0)

    # --- monotone isotherm ---
    assert np.all(np.diff(rho) > 0), rho

    # --- Widom cross-check at the middle point ---
    i_mid = n_mu // 2
    n_final = np.asarray(state.n).reshape(n_mu, N_REP)[i_mid]
    n_star = int(np.bincount(n_final).argmax())
    sel = np.nonzero(n_final == n_star)[0]
    x_mid = np.asarray(state.x).reshape(n_mu, N_REP, N_MAX, 3)[i_mid]
    a_mid = np.asarray(state.active).reshape(n_mu, N_REP, N_MAX)[i_mid]
    xs = np.stack([x_mid[c][a_mid[c]][:n_star] for c in sel])
    dense = potentials.lennard_jones(box=[BOX_L] * 3, cutoff=2.5)
    mu_ex, stderr = observables.widom_insertion(
        dense, jnp.asarray(xs), box=[BOX_L] * 3,
        key=jax.random.PRNGKey(7), n_insertions=4000, kT=KT)
    # reconstruct from the TIME-AVERAGED density (the ensemble average;
    # the modal final N is a single-snapshot statistic and biases rho)
    mu_pred = KT * np.log(rho[i_mid]) + float(mu_ex)
    print(f"Widom cross-check at z={np.exp(MUS[i_mid]/KT):.3f}: "
          f"mu_ex = {float(mu_ex):.4f} +- {float(stderr):.4f}, "
          f"mu_reconstructed = {mu_pred:.3f} vs set {MUS[i_mid]:.3f}")
    tol = max(4.0 * float(stderr), 0.3)
    assert abs(mu_pred - MUS[i_mid]) < tol
    print("isotherm thermodynamically consistent: OK")


if __name__ == "__main__":
    main()
