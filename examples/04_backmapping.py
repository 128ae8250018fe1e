"""CG -> atomistic backmapping: decode torsions around a CG site from a
rotation-invariant embedding of its local environment.

Mirrors `examples/Molecular_Backmapping.ipynb` (cutoff 3.0,
max_included 10, embedding 20, 3-DOF von Mises base + 3-block
conditional MAF; SURVEY.md §3.4) on the TPU-native stack, with synthetic
geometry standing in for the notebook's MD trajectory (the real data
pipeline needs openmm/mdtraj, which the reference also only pulls in via
an optional conda env).

Run:  python examples/04_backmapping.py [--full]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vaemolsim_tpu.dists import FlowedDistribution, IndependentBlockwise
from vaemolsim_tpu.flows import RQSSplineMAF
from vaemolsim_tpu.models import BackmappingOnly, MappingToDistribution
from vaemolsim_tpu.nn import (DistanceSelection, LocalParticleDescriptors,
                              ParticleEmbedding)
from vaemolsim_tpu.train import fit

FULL = "--full" in sys.argv
N_FRAMES = 2_000 if FULL else 512
EPOCHS = 30 if FULL else 10


def synthetic_frames(key, n):
    """Frames whose torsion targets depend on the local particle count —
    a backmapping-like learnable signal with periodic outputs."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    coords = jax.random.normal(k1, (n, 30, 3)) * 1.5
    info = jax.random.normal(k2, (n, 30, 2))
    cg_ref = jax.random.normal(k3, (n, 3)) * 0.3
    count = jnp.sum(jnp.linalg.norm(coords - cg_ref[:, None], axis=-1) < 3.0,
                    axis=-1)
    mu = (count % 5 - 2.0) * 0.8
    tors = mu[:, None] + 0.3 * jax.random.normal(k4, (n, 3))
    tors = tors - 2 * np.pi * jnp.round(tors / (2 * np.pi))
    return cg_ref, coords, info, tors


def main():
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    lpd = LocalParticleDescriptors(
        select=DistanceSelection.create(cutoff=3.0, max_included=10),
        embed=ParticleEmbedding.create(keys[0], info_dim=2,
                                       embedding_dim=20))
    flow = RQSSplineMAF.create(
        keys[1], 3, num_blocks=3,
        rqs_params={"num_bins": 20, "hidden_dim": 40,
                    "bin_range": [-np.pi, np.pi], "conditional": True,
                    "conditional_event_shape": 20})
    decoder = MappingToDistribution.create(
        keys[2],
        FlowedDistribution(flow=flow,
                           base_layer=IndependentBlockwise.create(
                               3, "von_mises")),
        input_shape=20, mapping_kwargs={"hidden_dim": 40})
    model = BackmappingOnly(mask_and_embed=lpd, decoder=decoder)

    cg, coords, info, tors = synthetic_frames(jax.random.PRNGKey(1),
                                              N_FRAMES)

    # fit() slices pytree batches along the sample axis — the model's
    # multi-input call signature is used directly (reference trains
    # BackmappingOnly on a 3-input list, vaemolsim/models.py:510-542).
    def loss_fn(m, batch, k):
        del k
        b_cg, b_coords, b_info, b_tors = batch
        return -jnp.mean(m(b_cg, b_coords, b_info).log_prob(b_tors))

    model, hist = fit(model, loss_fn, (cg, coords, info, tors),
                      key=jax.random.PRNGKey(2),
                      num_epochs=EPOCHS, batch_size=128, verbose=True)
    print(f"backmapping NLL {hist['loss'][0]:.3f} -> {hist['loss'][-1]:.3f}")
    samples = model.predict(cg[:200], coords[:200], info[:200],
                            jax.random.PRNGKey(3))
    err = jnp.mean(jnp.abs(jnp.arctan2(
        jnp.sin(samples - tors[:200]), jnp.cos(samples - tors[:200]))))
    print(f"sampled torsions in [-pi, pi]: "
          f"{bool(jnp.all(jnp.abs(samples) <= np.pi + 1e-4))}; "
          f"mean circular error vs target {float(err):.3f} rad")


if __name__ == "__main__":
    main()
