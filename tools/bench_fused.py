"""On-chip A/B: generic XLA MC step vs the fused whole-proposal Pallas
kernel (mcmc/fused.py) on the flagship model at the reference 10k-chain
workload (SURVEY.md §6, config 4/5).

Run on the TPU:  PYTHONPATH=/root/repo python tools/bench_fused.py
Prints one JSON line per (path, n_chains) with proposals/sec
(best + median of 3 reps over an N-step jitted scan).
"""

import json

from bench import _time_reps  # shared timing methodology


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_flagship
    from vaemolsim_tpu.mcmc import (MCMCState, make_fused_vae_step,
                                    make_mcmc_step, run_mcmc,
                                    vae_proposal_fns)
    from vaemolsim_tpu.nn.core import set_compute_dtype

    n_steps = int(__import__("os").environ.get("FUSED_BENCH_STEPS", 1000))
    set_compute_dtype(jnp.bfloat16)
    vae = _build_flagship(jax.random.PRNGKey(0))

    def log_target(x):
        return -0.5 * jnp.sum(x ** 2, axis=-1)

    enc, pri, dec = vae_proposal_fns(vae)
    steps = {
        "generic_xla": make_mcmc_step(enc, pri, dec, log_target),
        "fused_pallas": make_fused_vae_step(vae, log_target),
    }

    for n_chains in (10_000, 50_000):
        configs = jax.random.normal(jax.random.PRNGKey(1), (n_chains, 2))
        for name, step in steps.items():
            state = MCMCState.create(configs, log_target(configs),
                                     jax.random.PRNGKey(2))
            run = jax.jit(lambda s, st=step: run_mcmc(st, s, n_steps)[0])
            out = run(state)
            jax.block_until_ready(out.configs)
            rate = float(out.acceptance_rate)

            def rep():
                jax.block_until_ready(run(state).configs)

            best, median, _ = _time_reps(rep)
            print(json.dumps({
                "path": name, "n_chains": n_chains, "n_steps": n_steps,
                "best_props_per_s": round(n_chains * n_steps / best, 1),
                "median_props_per_s": round(n_chains * n_steps / median, 1),
                "acceptance": round(rate, 4),
            }), flush=True)


if __name__ == "__main__":
    main()
