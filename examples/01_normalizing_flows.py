"""Fit a 1-D rational-quadratic-spline flow to a 4-mode mixture.

Mirrors the reference workflow `examples/Using_Normalizing_Flows.ipynb`
(100k samples, RQS-RealNVP, SURVEY.md §6 row 2) on the TPU-native stack.

Run:  python examples/01_normalizing_flows.py [--full]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vaemolsim_tpu.flows import RQSSplineRealNVP
from vaemolsim_tpu.models import FlowModel
from vaemolsim_tpu.dists import StaticFlowedDistribution
from vaemolsim_tpu.ops import distributions as d
from vaemolsim_tpu.train import fit

FULL = "--full" in sys.argv
N_SAMPLES = 100_000 if FULL else 8_192
EPOCHS = 10 if FULL else 3


def main():
    key = jax.random.PRNGKey(0)

    # Target: 4-mode 1-D Gaussian mixture (the notebook's toy density).
    target = d.MixtureSameFamily(
        jnp.zeros(4),
        d.Normal(jnp.array([-5.0, -1.5, 1.5, 5.0]), 0.5 * jnp.ones(4)))
    data = target.sample(key, (N_SAMPLES,))[:, None]

    flow = RQSSplineRealNVP.create(
        jax.random.PRNGKey(1), data_dim=1, num_blocks=4,
        rqs_params={"num_bins": 32, "hidden_dim": 100,
                    "bin_range": [-8.0, 8.0]})
    base = d.Independent(d.Normal(jnp.zeros(1), jnp.ones(1)), 1)
    model = FlowModel.create(jax.random.PRNGKey(2),
                             StaticFlowedDistribution(flow=flow, base=base))

    def loss_fn(m, batch, k):
        del k
        return -jnp.mean(m.log_prob(batch))

    model, hist = fit(model, loss_fn, data, key=jax.random.PRNGKey(3),
                      num_epochs=EPOCHS, batch_size=512, verbose=True)

    # Compare learned density to the target on a grid.
    grid = jnp.linspace(-8, 8, 321)[:, None]
    err = jnp.mean(jnp.abs(jnp.exp(model.log_prob(grid))
                           - jnp.exp(target.log_prob(grid[:, 0]))))
    print(f"final NLL {hist['loss'][-1]:.4f} "
          f"(target entropy ~{-float(jnp.mean(target.log_prob(data[:, 0]))):.4f}); "
          f"mean |p_model - p_target| = {float(err):.4f}")
    samples = model.predict(data[:5000], jax.random.PRNGKey(4))
    print("sample std:", float(jnp.std(samples)))


if __name__ == "__main__":
    main()
