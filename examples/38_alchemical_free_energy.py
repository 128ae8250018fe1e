"""Absolute decoupling free energy of one LJ particle — the alchemical
stack end to end: soft-core ladder, Hamiltonian replica exchange, and
THREE independent estimators that must agree.

Workflow:
1. One "solute" atom in a small LJ fluid; the Beutler soft core
   (``potentials.lennard_jones_softcore``) scales its interactions with
   the environment from fully coupled (lam=1) to ideal (lam=0), finite
   at overlap for every intermediate lam.
2. Hamiltonian replica exchange (``parallel.hrex``) runs the whole
   Gauss-Legendre lambda ladder as ONE compiled program — R replicas x
   C chains of molecular-rank random-walk MC with pair-symmetric
   Hamiltonian swaps (the swap costs exactly one extra batched energy
   evaluation).
3. Estimator triangle on the SAME samples:
   - TI:   ``ti_free_energy`` over per-sample ``dU/dlam`` (one jvp in
     the lambda direction per frame) with the GL weights,
   - MBAR: every sample cross-evaluated at every lambda (one vmap),
   - Widom: an INDEPENDENT environment-only simulation + test-particle
     insertions (``observables.widom_insertion``) gives the same
     coupling free energy mu_ex/kT with zero shared machinery.

Validations:
1. HREX swap acceptance is healthy (ladder overlaps).
2. TI and MBAR agree within combined statistical error bars.
3. Both match the independent Widom route (and all three are negative:
   at this supercritical gas-phase state point, attraction wins).

Run:  python examples/38_alchemical_free_energy.py [--full]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vaemolsim_tpu import observables, potentials
from vaemolsim_tpu.mcmc.free_energy import (gauss_legendre_lambdas,
                                            mbar_free_energy,
                                            ti_free_energy)
from vaemolsim_tpu.parallel import HREXState, make_hrex_step, run_hrex

FULL = "--full" in sys.argv
jax.config.update("jax_platforms", os.environ.get("JAX_PLATFORMS", "cpu"))

KT = 2.0               # supercritical: one fluid phase, fast statistics
N_ENV = 15             # environment atoms
N = N_ENV + 1          # + 1 alchemical solute (atom index 0)
L = 4.0                # rho* = 0.25 gas-like density
R_LADDER = 8
CHAINS = 16 if FULL else 8
EQUIL = 12_000 if FULL else 5_000
PROD = 40_000 if FULL else 14_000
COLLECT_EVERY = 10
# All-atom collective random walk: optimal displacement shrinks like
# 1/sqrt(3N) — 0.05 lands near the ~30% acceptance sweet spot here.
SCALE = 0.05
BETA = 1.0 / KT

key = jax.random.PRNGKey(0)

# ----- 1. soft-core alchemical potential -----------------------------
alchemical = np.zeros(N, bool)
alchemical[0] = True
u_soft = potentials.lennard_jones_softcore(
    alchemical=alchemical, box=[L] * 3)

lambdas, gl_weights = gauss_legendre_lambdas(R_LADDER)
print(f"N={N} (1 alchemical), L={L}, T*={KT}, "
      f"GL-{R_LADDER} ladder: {np.round(lambdas, 3)}")


def log_prob(x, lam):
    """Reduced log density -beta U(x; lam), vectorized over leading
    axes (lam broadcasts against the energy shape)."""
    return -BETA * u_soft(x, lam)


# ----- 2. HREX over the ladder ---------------------------------------
key, k_init = jax.random.split(key)
x0 = jax.random.uniform(k_init, (R_LADDER, CHAINS, N, 3), maxval=L)
# Push initial overlaps apart at the COUPLED end so the ladder starts
# from sane configurations everywhere (soft core keeps lam<1 finite
# anyway; minimization is one batched call).
x0_flat = x0.reshape(-1, N, 3)
x0_min = potentials.minimize_energy(lambda x: u_soft(x, 1.0), x0_flat,
                                    steps=150)
x0 = x0_min.reshape(R_LADDER, CHAINS, N, 3)

state = HREXState.create(x0, log_prob, lambdas, jax.random.PRNGKey(1))
step = jax.jit(make_hrex_step(log_prob, scale=SCALE, exchange_every=4))
state, _ = run_hrex(step, state, EQUIL)
state, samples = run_hrex(step, state, PROD,
                          collect_every=COLLECT_EVERY)
print(f"HREX: local acceptance {float(state.acceptance_rate):.3f}, "
      f"swap acceptance {float(state.swap_acceptance_rate):.3f}")
assert 0.10 < float(state.swap_acceptance_rate) < 0.98

# samples: (T, R, C, N, 3) -> per-state (R, T*C, N, 3)
xs = jnp.moveaxis(samples, 1, 0).reshape(R_LADDER, -1, N, 3)
lam_arr = jnp.asarray(lambdas, jnp.float32)

# ----- 3a. TI ---------------------------------------------------------
def dudl_at(lam, x):
    # Reduced dU/dlam per sample: one jvp in the lambda direction.
    _, tang = jax.jvp(lambda ll: BETA * u_soft(x, ll),
                      (lam,), (jnp.ones_like(lam),))
    return tang


# Per-rung evaluation keeps the peak pair-matrix footprint at one
# rung's worth of frames (the cross-evaluations below chunk the same
# way): memory scales with chunk size, not ladder x samples.
dudl = jnp.stack([dudl_at(l, x) for l, x in zip(lam_arr, xs)])
df_ti, err_ti = ti_free_energy(dudl, weights=gl_weights)
# TI integrates decoupled->coupled; report coupling dF = mu_ex / kT.
print(f"TI:    dF_couple = {float(df_ti):+.3f} +- {float(err_ti):.3f}")

# ----- 3b. MBAR -------------------------------------------------------
flat = xs.reshape(-1, N, 3)                    # (R*T*C, N, 3)
chunks = jnp.split(flat, 8)
log_probs = jnp.concatenate(
    [jax.vmap(lambda l, c=c: log_prob(c, l))(lam_arr) for c in chunks],
    axis=1)
res = mbar_free_energy(log_probs, np.full(R_LADDER, xs.shape[1]))
# Ladder endpoints are GL nodes (not exactly 0/1): perturb to the true
# endpoints with the same weights — MBAR reweights to UNSAMPLED states.
from vaemolsim_tpu.mcmc.free_energy import mbar_perturbed_free_energy

lp0 = jnp.concatenate([log_prob(c, 0.0) for c in chunks])
lp1 = jnp.concatenate([log_prob(c, 1.0) for c in chunks])
df0, e0 = mbar_perturbed_free_energy(res, lp0)
df1, e1 = mbar_perturbed_free_energy(res, lp1)
df_mbar = float(df1 - df0)
err_mbar = float(jnp.sqrt(e0 ** 2 + e1 ** 2))
print(f"MBAR:  dF_couple = {df_mbar:+.3f} +- {err_mbar:.3f}")

# ----- 3c. independent Widom route ------------------------------------
# Environment-only fluid (no solute), plain dense LJ, then test-particle
# insertions: mu_ex/kT = -ln <exp(-beta dU)> = dF_couple. Zero shared
# machinery with the HREX/soft-core path above.
u_env = potentials.lennard_jones(box=[L] * 3)
log_prob_env = potentials.as_log_prob(u_env, beta=BETA)

from vaemolsim_tpu.mcmc.moves import make_random_walk_step
from vaemolsim_tpu.mcmc.engine import MCMCState, run_mcmc

key, k_env, k_w = jax.random.split(key, 3)
xe0 = jax.random.uniform(k_env, (CHAINS * R_LADDER, N_ENV, 3), maxval=L)
xe0 = potentials.minimize_energy(u_env, xe0, steps=150)
env_state = MCMCState.create(xe0, log_prob_env(xe0), jax.random.PRNGKey(2))
env_step = make_random_walk_step(log_prob_env, scale=SCALE)
env_state, _ = run_mcmc(env_step, env_state, EQUIL)
env_state, env_xs = run_mcmc(env_step, env_state, PROD,
                             collect_every=COLLECT_EVERY * 4)
# Cap the frame count: widom_insertion batches (insertions x frames)
# pair matrices, so subsampling frames bounds memory (the estimator
# only needs a few thousand decorrelated frames at this density).
env_flat = env_xs.reshape(-1, N_ENV, 3)
stride = max(1, env_flat.shape[0] // 3000)
mu_ex, err_w = observables.widom_insertion(
    u_env, env_flat[::stride], box=[L] * 3, key=k_w,
    n_insertions=128, kT=KT)
df_widom = float(mu_ex) / KT
print(f"Widom: dF_couple = {df_widom:+.3f} +- {float(err_w) / KT:.3f} "
      f"(independent simulation + estimator)")

# ----- 4. the triangle must close -------------------------------------
tol_ti_mbar = 4.0 * float(jnp.sqrt(err_ti ** 2 + err_mbar ** 2)) + 0.05
assert abs(float(df_ti) - df_mbar) < tol_ti_mbar, (df_ti, df_mbar)
tol_w = 5.0 * (float(err_ti) + float(err_w) / KT) + (0.10 if FULL else 0.30)
assert abs(float(df_ti) - df_widom) < tol_w, (df_ti, df_widom)
assert float(df_ti) < 0.0 and df_widom < 0.0  # attraction-dominated
print("OK")
