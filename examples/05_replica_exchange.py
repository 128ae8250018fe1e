"""Replica-exchange (parallel tempering) VAE-proposal MC over a device
mesh — the multi-chip workload (BASELINE config 5: parallel chains +
replica exchange over ICI).

A rough multimodal target defeats plain Metropolis at beta=1; a ladder of
tempered replicas with adjacent swaps mixes across modes, and the cold
replica recovers the full target.  The replica and chain axes are
sharded over the mesh (single-chip here -> one-device mesh; the same
code sharded over a pod rides ICI collectives).

Run:  python examples/05_replica_exchange.py [--full]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

from vaemolsim_tpu.mcmc import effective_sample_size
from vaemolsim_tpu.ops import distributions as d
from vaemolsim_tpu.parallel import (REMCState, make_mesh, make_remc_step,
                                    run_remc, shard_chain_state,
                                    temperature_ladder)

FULL = "--full" in sys.argv
R = 6  # temperature replicas
C = 2_000 if FULL else 256  # chains per replica
STEPS = 400 if FULL else 150


def main():
    # Rough 1-D target: far-separated narrow modes.
    target = d.MixtureSameFamily(
        jnp.zeros(2), d.Normal(jnp.array([-6.0, 6.0]), 0.4 * jnp.ones(2)))

    def log_target(x):
        return target.log_prob(x[..., 0])

    # Independence proposal via a hand-built "VAE" (encoder == prior,
    # decoder broad) — replace with a trained VAE in production.
    def enc(x):
        z = jnp.zeros(x.shape[:-1] + (1,))
        return d.Independent(d.Normal(z, jnp.ones_like(z)), 1)

    def dec(z):
        loc = jnp.zeros(z.shape[:-1] + (1,))
        return d.Independent(d.Normal(loc, 3.0 * jnp.ones_like(loc)), 1)

    betas = temperature_ladder(R, beta_min=0.05)
    step = make_remc_step(enc, enc, dec, log_target, exchange_every=2)
    configs = jnp.full((R, C, 1), -6.0)  # all chains start in ONE mode
    state = REMCState.create(configs, log_target, betas,
                             jax.random.PRNGKey(0))

    mesh = make_mesh({"chain": len(jax.devices())})
    # Shard the chain axis (axis 1 of (R, C, D)) over the mesh.
    from jax.sharding import NamedSharding, PartitionSpec as P
    state = state.replace(
        configs=jax.device_put(state.configs,
                               NamedSharding(mesh, P(None, "chain", None))),
        energies=jax.device_put(state.energies,
                                NamedSharding(mesh, P(None, "chain"))))

    run = jax.jit(lambda s: run_remc(step, s, STEPS))
    t0 = time.perf_counter()
    final = run(state)
    jax.block_until_ready(final.configs)
    dt = time.perf_counter() - t0

    cold = final.configs[0, :, 0]
    frac_right = float(jnp.mean(cold > 0))
    print(f"{R} replicas x {C} chains x {STEPS} steps in {dt:.2f}s "
          f"({R * C * STEPS / dt:,.0f} tempered proposals/sec)")
    print(f"MC acceptance {float(final.acceptance_rate):.3f}, "
          f"swap acceptance {float(final.swap_acceptance_rate):.3f}")
    print(f"cold replica right-mode fraction: {frac_right:.3f} "
          f"(started 0.0, target 0.5) — tempering crossed the barrier")


if __name__ == "__main__":
    main()
