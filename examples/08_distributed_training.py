"""Distributed end-to-end workflow: data-parallel VAE training over a
device mesh, then chain-parallel VAE-proposal MC on the trained model.

The reference is strictly single-device (SURVEY.md §2.4 — its only
concurrency is batching); here the SAME user code scales over a TPU pod
slice: ``fit(..., mesh=...)`` shards the batch axis (XLA inserts the
gradient all-reduce over ICI), and ``shard_chain_state`` lays the MC
chains out over the mesh so the jitted scan runs SPMD with only the
scalar acceptance statistics crossing devices.

On a CPU host this demonstrates with an 8-device virtual mesh; on TPU
hardware the identical code uses the real chips (and
``parallel.make_hybrid_mesh`` extends it across pod slices, replica
axis over DCN).

Run:  python examples/08_distributed_training.py [--full]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax

# Demonstrate on an 8-device virtual mesh when running on CPU hosts
# (on TPU hardware the mesh is whatever chips are attached).
if jax.default_backend() == "cpu" and len(jax.devices()) < 8:
    try:
        from jax.extend.backend import clear_backends
        clear_backends()
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass

import jax.numpy as jnp

from vaemolsim_tpu.config import flagship_experiment_config
from vaemolsim_tpu.mcmc import (MCMCState, make_mcmc_step, run_mcmc,
                                vae_proposal_fns)
from vaemolsim_tpu.ops import distributions as d
from vaemolsim_tpu.parallel import make_mesh, replicate, shard_chain_state
from vaemolsim_tpu.train import fit

FULL = "--full" in sys.argv
N_SAMPLES = 20_000 if FULL else 4_096
N_CHAINS = 10_000 if FULL else 1_024
N_STEPS = 200 if FULL else 50
EPOCHS = 10 if FULL else 3


def main():
    n_dev = len(jax.devices())
    print(f"devices: {n_dev} x {jax.devices()[0].platform}")

    # 2-D correlated-Gaussian data (the MC_Moves_with_VAEs workload
    # family): train the flagship VAE on it, batch sharded over the mesh.
    key = jax.random.PRNGKey(0)
    cov_half = jnp.asarray([[1.0, 0.0], [0.8, 0.6]])
    data = jax.random.normal(key, (N_SAMPLES, 2)) @ cov_half.T

    vae = flagship_experiment_config().build()
    mesh = make_mesh({"batch": n_dev})

    def loss_fn(model, batch, k):
        loss, metrics = model.elbo_loss(batch, k, train=True)
        return loss, metrics

    t0 = time.perf_counter()
    vae, hist = fit(vae, loss_fn, data, key=jax.random.PRNGKey(1),
                    num_epochs=EPOCHS, batch_size=max(N_SAMPLES // 8, n_dev),
                    scan_epochs=True, mesh=mesh)
    print(f"trained {EPOCHS} epochs on {n_dev}-way data-parallel mesh in "
          f"{time.perf_counter() - t0:.1f}s; "
          f"loss {hist['loss'][0]:.3f} -> {hist['loss'][-1]:.3f}")

    # Chain-parallel MC with the trained VAE as proposal, sharded over
    # the same devices (axis renamed: chains now ride the mesh).
    chain_mesh = make_mesh({"chain": n_dev})

    def log_target(x):
        # Log-density of the data-generating Gaussian (up to a constant).
        y = jnp.linalg.solve(cov_half, x.T).T
        return -0.5 * jnp.sum(y * y, axis=-1)

    vae = replicate(vae, chain_mesh)
    enc, pri, dec = vae_proposal_fns(vae)
    step = make_mcmc_step(enc, pri, dec, log_target)
    configs = jax.random.normal(jax.random.PRNGKey(2), (N_CHAINS, 2))
    state = MCMCState.create(configs, log_target(configs),
                             jax.random.PRNGKey(3))
    state = shard_chain_state(state, chain_mesh)

    t0 = time.perf_counter()
    state, _ = jax.jit(lambda s: run_mcmc(step, s, N_STEPS))(state)
    jax.block_until_ready(state.configs)
    dt = time.perf_counter() - t0
    rate = float(state.acceptance_rate)
    print(f"{N_CHAINS} sharded chains x {N_STEPS} steps in {dt:.1f}s "
          f"({N_CHAINS * N_STEPS / dt:,.0f} proposals/s); "
          f"acceptance {rate:.3f}")
    assert 0.0 < rate < 1.0

    # The chains should sample the target: check second moments.
    cov = jnp.cov(state.configs.T)
    want = cov_half @ cov_half.T
    print("sampled covariance:\n", jnp.round(cov, 2))
    print("target covariance:\n", jnp.round(want, 2))


if __name__ == "__main__":
    main()
