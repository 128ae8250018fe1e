"""Free-energy differences with MC, BAR, and flow-assisted estimators.

The quantity molecular simulation runs MC for: the dimensionless free
energy difference between two states (e.g. two torsion-potential
couplings).  Beyond-reference workflow (the reference stops at sampling,
vaemolsim/mcmc.py) combining four estimators on one toy alchemical pair:

1. one-sided EXP (Zwanzig) from state-A samples,
2. bidirectional BAR from both states' MC samples,
3. AIS from the analytic prior along a 48-stage ladder,
4. learned free-energy perturbation: a normalizing flow trained on
   state-B samples as the importance distribution — one-shot ln Z with
   no ladder at all (targeted-FEP style, Wirnsberger et al. 2020),
5. MBAR over a 5-state lambda ladder interpolating A->B, each state
   sampled with a tuned HMC kernel — the statistically-optimal
   multistate estimate with asymptotic error bars (pymbar workflow).

Ground truth comes from 1-D quadrature.  Everything device-side: MC via
the scanned engine, AIS as one compiled scan, training via fit().

Run:  python examples/10_free_energy.py [--full]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vaemolsim_tpu.dists import StaticFlowedDistribution
from vaemolsim_tpu.flows import RQSSplineRealNVP
from vaemolsim_tpu.mcmc import (MCMCState, ais, bar_free_energy,
                                exp_free_energy, make_random_walk_step,
                                run_mcmc, work_values)
from vaemolsim_tpu.models import FlowModel
from vaemolsim_tpu.ops import distributions as d
from vaemolsim_tpu.train import fit

FULL = "--full" in sys.argv
N_CHAINS = 4096 if FULL else 1024
N_STEPS = 400 if FULL else 150
AIS_STAGES = 96 if FULL else 48
EPOCHS = 20 if FULL else 6


# --- the two states: double-well torsion potentials, different coupling
def log_p_a(x):
    """State A: soft double well."""
    x = x[..., 0]
    return -1.0 * (x ** 2 - 1.5 ** 2) ** 2 / 2.0


def log_p_b(x):
    """State B: stiffer, tilted double well (the 'perturbed' coupling)."""
    x = x[..., 0]
    return -2.2 * (x ** 2 - 1.2 ** 2) ** 2 / 2.0 - 0.6 * x


def quadrature_ln_z(log_p, lo=-6.0, hi=6.0, n=20_001):
    g = np.linspace(lo, hi, n)
    lp = np.asarray(log_p(jnp.asarray(g)[:, None]))
    m = lp.max()
    return m + np.log(np.trapezoid(np.exp(lp - m), g))


def sample_state(log_p, key, scale=0.6):
    cfgs = jax.random.normal(key, (N_CHAINS, 1))
    st = MCMCState.create(cfgs, log_p(cfgs), jax.random.split(key)[0])
    step = make_random_walk_step(log_p, scale=scale)
    st, _ = jax.jit(lambda s: run_mcmc(step, s, N_STEPS))(st)
    return st.configs, float(st.acceptance_rate)


def main():
    ln_z_a = quadrature_ln_z(log_p_a)
    ln_z_b = quadrature_ln_z(log_p_b)
    true_df = -(ln_z_b - ln_z_a)
    print(f"quadrature truth: ln Z_A={ln_z_a:.4f}  ln Z_B={ln_z_b:.4f}  "
          f"dF(A->B)={true_df:.4f}")

    # --- MC sampling of both states (scanned engine) ---
    x_a, acc_a = sample_state(log_p_a, jax.random.PRNGKey(0))
    x_b, acc_b = sample_state(log_p_b, jax.random.PRNGKey(1))
    print(f"MC acceptance: A {acc_a:.2f}, B {acc_b:.2f}")

    # --- 1. one-sided EXP ---
    w_f = work_values(log_p_a, log_p_b, x_a)
    df_exp, se_exp = exp_free_energy(w_f)
    print(f"EXP  (A->B): dF = {float(df_exp):+.4f} +- {float(se_exp):.4f} "
          f"(err {float(df_exp) - true_df:+.4f})")

    # --- 2. bidirectional BAR ---
    w_r = work_values(log_p_b, log_p_a, x_b)
    df_bar, se_bar = bar_free_energy(w_f, w_r)
    print(f"BAR         : dF = {float(df_bar):+.4f} +- {float(se_bar):.4f} "
          f"(err {float(df_bar) - true_df:+.4f})")

    # --- 3. AIS ln Z for each state from the analytic N(0, 1.5) prior ---
    def prior_lp(x):
        s = 1.5
        return (-0.5 * jnp.sum((x / s) ** 2, axis=-1)
                - 0.5 * jnp.log(2 * jnp.pi * s * s))

    x0 = 1.5 * jax.random.normal(jax.random.PRNGKey(2), (N_CHAINS, 1))
    run = jax.jit(lambda lp, x, k: ais(prior_lp, lp, x, k,
                                       n_stages=AIS_STAGES, scale=0.5,
                                       sweeps_per_stage=2),
                  static_argnums=0)
    res_a = run(log_p_a, x0, jax.random.PRNGKey(3))
    res_b = run(log_p_b, x0, jax.random.PRNGKey(4))
    df_ais = -(float(res_b.log_z) - float(res_a.log_z))
    print(f"AIS         : dF = {df_ais:+.4f} "
          f"(err {df_ais - true_df:+.4f}; "
          f"ESS {float(res_a.ess):.0f}/{float(res_b.ess):.0f} "
          f"of {N_CHAINS})")

    # --- 4. learned FEP: flow trained on state-B samples as the
    #        importance distribution (one-shot, no ladder) ---
    flow = RQSSplineRealNVP.create(
        jax.random.PRNGKey(5), data_dim=1, num_blocks=2,
        rqs_params={"num_bins": 16, "hidden_dim": 64,
                    "bin_range": [-4.0, 4.0]})
    base = d.Independent(d.Normal(jnp.zeros(1), jnp.ones(1)), 1)
    model = FlowModel.create(jax.random.PRNGKey(6),
                             StaticFlowedDistribution(flow=flow, base=base))
    model, hist = fit(model, lambda m, b, k: -jnp.mean(m.log_prob(b)),
                      np.asarray(x_b), key=jax.random.PRNGKey(7),
                      num_epochs=EPOCHS, batch_size=256, scan_epochs=True)
    q = model(jnp.zeros((1, 1)))  # static flowed dist (inputs shape-only)
    xs, lq = q.sample_and_log_prob(jax.random.PRNGKey(8), (N_CHAINS * 4,))
    ln_z_b_flow = float(exp_free_energy(lq - log_p_b(xs))[0] * -1.0)
    df_flow = -(ln_z_b_flow - ln_z_a)
    print(f"flow-FEP    : ln Z_B = {ln_z_b_flow:+.4f} -> dF = "
          f"{df_flow:+.4f} (err {df_flow - true_df:+.4f}; flow NLL "
          f"{hist['loss'][-1]:.3f})")

    # --- 5. MBAR over a lambda ladder, sampled with tuned HMC ---
    from vaemolsim_tpu.mcmc import (make_hmc_step, mbar_from_samples,
                                    tune_scale)

    lams = np.linspace(0.0, 1.0, 5)

    def make_state(lam):
        return lambda x: (1.0 - lam) * log_p_a(x) + lam * log_p_b(x)

    fns = [make_state(lam) for lam in lams]
    ladder_samples = []
    for i, fn in enumerate(fns):
        cfgs = 1.5 * jax.random.normal(jax.random.PRNGKey(20 + i),
                                       (N_CHAINS, 1))
        st = MCMCState.create(cfgs, fn(cfgs), jax.random.PRNGKey(40 + i))
        eps, st = tune_scale(fn, st, kind="hmc", init_scale=0.1,
                             rounds=15, n_leapfrog=5)
        step = make_hmc_step(fn, step_size=eps, n_leapfrog=5)
        st, _ = jax.jit(lambda s, step=step: run_mcmc(step, s, N_STEPS))(st)
        ladder_samples.append(st.configs)
    res = mbar_from_samples(fns, ladder_samples)
    df_mbar = float(res.free_energies[-1])      # state 0 = A, last = B
    se_mbar = float(res.stderrs[-1])
    print(f"MBAR (5-state HMC ladder): dF = {df_mbar:+.4f} +- "
          f"{se_mbar:.4f} (err {df_mbar - true_df:+.4f})")

    worst = max(abs(float(df_bar) - true_df), abs(df_ais - true_df),
                abs(df_mbar - true_df))
    assert worst < 0.15, f"estimators disagree with quadrature: {worst}"
    print("free-energy workflow OK")


if __name__ == "__main__":
    main()
