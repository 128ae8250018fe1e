"""Headline benchmark: VAE-proposed MC moves/sec on one chip.

Workload (BASELINE.md / SURVEY.md §6): the MC_Moves_with_VAEs scale —
10,000 parallel chains of VAE-proposed Metropolis moves (encoder -> flow
prior -> decoder -> accept/reject), run as one jitted lax.scan that never
leaves the device.  The reference runs the same logical workload as an
un-jitted NumPy-driven loop (vaemolsim/mcmc.py:133-159).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "proposals/sec/chip",
   "vs_baseline": N}
vs_baseline is measured against the north-star target of 1e6
VAE-proposed moves/sec (BASELINE.json): vs_baseline = value / 1e6.
"""

import json
import time

N_CHAINS = 10_000
N_STEPS = 100


def _probe_tpu_alive(timeout_s: int = 240) -> bool:
    """The environment's TPU tunnel occasionally wedges (a trivial matmul
    never returns).  Probe it in a subprocess so a hang can't take down
    the bench; fall back to CPU when dead."""
    import subprocess
    import sys
    code = ("import jax, jax.numpy as jnp;"
            "print(float(jnp.sum(jax.jit(lambda a: a@a)(jnp.ones((64,64))))))")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    import os
    import sys
    if not _probe_tpu_alive():
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        print("TPU tunnel unresponsive; benching on CPU", file=sys.stderr,
              flush=True)
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_flagship
    from vaemolsim_tpu.mcmc import (MCMCState, make_mcmc_step, run_mcmc,
                                    vae_proposal_fns)
    from vaemolsim_tpu.nn.core import set_compute_dtype

    # Proposal networks in bfloat16 (native MXU dtype): MH stays exact —
    # forward and reverse densities use the same bf16-net-defined
    # proposal — and acceptance arithmetic stays float32.  Equilibrium
    # preservation under this mode is covered by
    # tests/test_mcmc.py::TestFullPipelineStatistics.
    set_compute_dtype(jnp.bfloat16)

    vae = _build_flagship(jax.random.PRNGKey(0))
    enc, pri, dec = vae_proposal_fns(vae)

    def log_target(x):
        return -0.5 * jnp.sum(x ** 2, axis=-1)

    step = make_mcmc_step(enc, pri, dec, log_target)
    configs = jax.random.normal(jax.random.PRNGKey(1), (N_CHAINS, 2))
    state = MCMCState.create(configs, log_target(configs),
                             jax.random.PRNGKey(2))

    run = jax.jit(lambda s, n: run_mcmc(step, s, n)[0], static_argnums=1)

    # Warmup/compile with the same static step count as the timed run.
    warm = run(state, N_STEPS)
    jax.block_until_ready(warm.configs)

    # Best of 3: the environment's TPU tunnel occasionally stalls a run
    # by orders of magnitude; the fastest repetition reflects the chip.
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        final = run(state, N_STEPS)
        jax.block_until_ready(final.configs)
        best_dt = min(best_dt, time.perf_counter() - t0)

    proposals = N_CHAINS * N_STEPS
    rate = proposals / best_dt
    result = {
        "metric": "vae_mc_proposals_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": "proposals/sec/chip",
        "vs_baseline": round(rate / 1.0e6, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
