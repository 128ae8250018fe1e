"""VAE-proposed Metropolis Monte Carlo: train a VAE on samples of a
2-D density, then run thousands of parallel MC chains with it as the
proposal — entirely on device.

Mirrors `examples/MC_Moves_with_VAEs.ipynb` (10,000 parallel chains x
100 steps; SURVEY.md §3.3, §6) on the TPU-native stack.  Note the
energy-function convention inherited from the reference: it returns the
LOG target density (-beta*U), see vaemolsim_tpu/mcmc/engine.py.

Run:  python examples/03_mc_moves.py [--full]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

from vaemolsim_tpu import losses
from vaemolsim_tpu.dists import IndependentBlockwise, StaticFlowedDistribution
from vaemolsim_tpu.flows import RQSSplineMAF
from vaemolsim_tpu.mcmc import MCMC
from vaemolsim_tpu.models import VAE, MappingToDistribution
from vaemolsim_tpu.ops import distributions as d
from vaemolsim_tpu.train import fit

FULL = "--full" in sys.argv
N_CHAINS = 10_000 if FULL else 2_000
N_STEPS = 100
TRAIN_N = 10_000 if FULL else 4_096
EPOCHS = 25 if FULL else 6


def main():
    # Target: 2-D two-mode mixture; data for VAE training are its samples.
    target = d.MixtureSameFamily(
        jnp.zeros(2), d.Normal(jnp.array([-2.0, 2.0]),
                               0.6 * jnp.ones(2)))

    def log_target(x):
        return target.log_prob(x[..., 0]) + target.log_prob(x[..., 1])

    data = jnp.stack([target.sample(jax.random.PRNGKey(0), (TRAIN_N,)),
                      target.sample(jax.random.PRNGKey(1), (TRAIN_N,))],
                     axis=-1)

    keys = jax.random.split(jax.random.PRNGKey(2), 3)
    encoder = MappingToDistribution.create(
        keys[0], IndependentBlockwise.create(1, "normal"), input_shape=2,
        mapping_kwargs={"hidden_dim": 50})
    decoder = MappingToDistribution.create(
        keys[1], IndependentBlockwise.create(2, "normal"), input_shape=1,
        mapping_kwargs={"hidden_dim": 50})
    prior = StaticFlowedDistribution(
        flow=RQSSplineMAF.create(keys[2], 1, num_blocks=2,
                                 rqs_params={"num_bins": 32,
                                             "hidden_dim": 50,
                                             "bin_range": [-5.0, 5.0]}),
        base=d.Independent(d.Normal(jnp.zeros(1), jnp.ones(1)), 1))
    vae = VAE(encoder=encoder, decoder=decoder, prior=prior,
              regularizer=losses.KLDivergenceEstimate())

    vae, hist = fit(vae, lambda m, b, k: m.elbo_loss(b, k), data,
                    key=jax.random.PRNGKey(3), num_epochs=EPOCHS,
                    batch_size=512, verbose=True)
    print(f"trained VAE, final -ELBO {hist['loss'][-1]:.4f}")

    # MC with the trained VAE as move generator.
    mc = MCMC(vae, log_target, random_seed=4)
    configs = jax.random.normal(jax.random.PRNGKey(5), (N_CHAINS, 2))
    t0 = time.perf_counter()
    configs, energies = mc.run(configs, n_steps=N_STEPS)
    jax.block_until_ready(configs)
    dt = time.perf_counter() - t0
    print(f"{N_CHAINS} chains x {N_STEPS} steps in {dt:.2f}s "
          f"({N_CHAINS * N_STEPS / dt:,.0f} proposals/sec), "
          f"acceptance {mc.acceptance_rate:.3f}")
    frac = float(jnp.mean(configs[:, 0] < 0))
    print(f"chain mode balance {frac:.3f} (target ~0.5); "
          f"mean energy {float(jnp.mean(energies)):.3f}")


if __name__ == "__main__":
    main()
