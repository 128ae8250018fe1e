"""Production-scale statistical validation on the chip: 10k chains x
5000 steps of mixed VAE/MALA/random-walk moves (scales tuned on device)
against an analytic bimodal target, with ESS/R-hat diagnostics.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python tools/validate_statistics.py
Prints one JSON line; see docs/performance.md for recorded results."""
import json

import jax

jax.config.update("jax_default_prng_impl", "rbg")
import jax.numpy as jnp
from vaemolsim_tpu.mcmc import (MCMCState, cycle_moves, make_mala_step,
                                make_mcmc_step, make_random_walk_step,
                                run_mcmc, tune_scale, vae_proposal_fns,
                                effective_sample_size,
                                potential_scale_reduction)
from vaemolsim_tpu.ops import distributions as d
from __graft_entry__ import _build_flagship
from vaemolsim_tpu.nn.core import set_compute_dtype

set_compute_dtype(jnp.bfloat16)
# Bimodal 2-D target: mixture at x0 = +-2, unit elsewhere.
mix = d.MixtureSameFamily(jnp.zeros(2), d.Normal(jnp.asarray([-2.0, 2.0]), 0.7 * jnp.ones(2)))
def log_target(x):
    return mix.log_prob(x[..., 0]) - 0.5 * x[..., 1] ** 2

vae = _build_flagship(jax.random.PRNGKey(0))
enc, pri, dec = vae_proposal_fns(vae)
vae_step = make_mcmc_step(enc, pri, dec, log_target)
cfgs = jax.random.normal(jax.random.PRNGKey(1), (10_000, 2))
st = MCMCState.create(cfgs, log_target(cfgs), jax.random.PRNGKey(2))
# Tune local moves on device, then compose.
s_rw, st = tune_scale(log_target, st, kind="random_walk")
s_mala, st = tune_scale(log_target, st, kind="mala", init_scale=0.05)
step = cycle_moves([vae_step, make_mala_step(log_target, s_mala),
                    make_random_walk_step(log_target, s_rw)])
st, traj = jax.jit(lambda s: run_mcmc(step, s, 5000, collect_every=50))(st)
jax.block_until_ready(st.configs)
x0 = st.configs[:, 0]
frac_right = float(jnp.mean(x0 > 0))
m2 = float(jnp.mean(x0 ** 2))
want_m2 = float(jnp.mean(mix.sample(jax.random.PRNGKey(3), (200_000,)) ** 2))
ess = effective_sample_size(traj[..., 0].T)
rhat = potential_scale_reduction(traj[..., 0].T)
print(json.dumps({
    "acceptance": round(float(st.acceptance_rate), 4),
    "tuned_rw_scale": round(s_rw, 4), "tuned_mala_eps": round(s_mala, 4),
    "mode_balance": round(frac_right, 4),
    "second_moment": round(m2, 4), "want_second_moment": round(want_m2, 4),
    "mean_ess_per_100_kept": round(float(jnp.mean(ess)), 2),
    "rhat": round(float(rhat), 5)}))
