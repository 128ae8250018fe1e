"""Train a VAE with a spline-flow prior; also the deterministic-encoder
variant trained with a prior-only regularizer.

Mirrors `examples/Training_VAEs_and_Decoders.ipynb` (10k samples, 2-D
data -> 1-D latent; SURVEY.md §3.5) on the TPU-native stack.

Run:  python examples/02_train_vae.py [--full]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vaemolsim_tpu import losses
from vaemolsim_tpu.dists import (IndependentBlockwise,
                                 IndependentDeterministic,
                                 StaticFlowedDistribution)
from vaemolsim_tpu.flows import RQSSplineMAF
from vaemolsim_tpu.models import VAE, MappingToDistribution
from vaemolsim_tpu.ops import distributions as d
from vaemolsim_tpu.train import fit

FULL = "--full" in sys.argv
N = 10_000 if FULL else 4_096
EPOCHS = 20 if FULL else 5


def build_vae(key, deterministic_encoder=False):
    keys = jax.random.split(key, 3)
    latent, data_dim = 1, 2
    enc_dist = (IndependentDeterministic.create(latent)
                if deterministic_encoder
                else IndependentBlockwise.create(latent, "normal"))
    encoder = MappingToDistribution.create(
        keys[0], enc_dist, input_shape=data_dim,
        mapping_kwargs={"hidden_dim": 50})
    decoder = MappingToDistribution.create(
        keys[1], IndependentBlockwise.create(data_dim, "normal"),
        input_shape=latent, mapping_kwargs={"hidden_dim": 50})
    prior = StaticFlowedDistribution(
        flow=RQSSplineMAF.create(keys[2], latent, num_blocks=2,
                                 rqs_params={"num_bins": 32,
                                             "hidden_dim": 50,
                                             "bin_range": [-5.0, 5.0]}),
        base=d.Independent(d.Normal(jnp.zeros(latent), jnp.ones(latent)), 1))
    reg = (losses.LogProbRegularizer() if deterministic_encoder
           else losses.KLDivergenceEstimate())
    return VAE(encoder=encoder, decoder=decoder, prior=prior,
               regularizer=reg)


def main():
    data = d.MixtureSameFamily(
        jnp.zeros(2), d.Normal(jnp.array([-2.0, 2.0]),
                               0.5 * jnp.ones(2))).sample(
        jax.random.PRNGKey(0), (N, 2))

    for det in (False, True):
        vae = build_vae(jax.random.PRNGKey(1), deterministic_encoder=det)

        def loss_fn(m, batch, k):
            return m.elbo_loss(batch, k)

        vae, hist = fit(vae, loss_fn, data, key=jax.random.PRNGKey(2),
                        num_epochs=EPOCHS, batch_size=512, verbose=True)
        gen = vae.sample(jax.random.PRNGKey(3), batch_shape=(4000,))
        frac = float(jnp.mean(gen[:, 0] < 0))
        name = "deterministic-encoder" if det else "stochastic-encoder"
        print(f"[{name}] final -ELBO {hist['loss'][-1]:.4f}, "
              f"kl_div {hist['kl_div'][-1]:.4f}, "
              f"generated mode balance {frac:.3f} (expect ~0.5)\n")


if __name__ == "__main__":
    main()
