"""Complete molecular workflow: trajectory IO -> internal coordinates ->
density model -> generation -> trajectory export.

Chains the framework's subsystems end to end the way a production
coarse-graining study would (the reference needs mdtraj/openmm for the
IO/coordinate steps; here everything is first-party):

1. read a trajectory (native C++ DCD reader),
2. extract BAT internal coordinates (coords.bat_from_cartesian),
3. fit a conditional RQS-spline MAF over the torsions (periodic DOFs)
   with bonds/angles modeled by blockwise normals,
4. sample new internal coordinates, rebuild Cartesian frames
   (coords.cartesian_from_bat), and write them back out as DCD.

Run:  python examples/06_full_molecular_workflow.py [--full]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from vaemolsim_tpu.coords import (bat_from_cartesian, cartesian_from_bat,
                                  chain_zmatrix)
from vaemolsim_tpu.data import DCDReader, write_dcd
from vaemolsim_tpu.dists import FlowedDistribution, IndependentBlockwise
from vaemolsim_tpu.flows import RQSSplineMAF
from vaemolsim_tpu.models import FlowModel
from vaemolsim_tpu.train import fit

FULL = "--full" in sys.argv
N_FRAMES = 4000 if FULL else 800
EPOCHS = 40 if FULL else 12
N_ATOMS = 8


def synthesize_trajectory(path: str, n_frames: int) -> None:
    """Stand-in MD data: a butane-like chain with two preferred torsion
    states, written as a real DCD file."""
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bonds = 1.53 + 0.03 * jax.random.normal(k1, (n_frames, N_ATOMS - 1))
    angles = 1.91 + 0.05 * jax.random.normal(k2, (n_frames, N_ATOMS - 2))
    # Torsions hop between trans (pi) and gauche (pi/3) states.
    state = (jax.random.uniform(k3, (n_frames, N_ATOMS - 3)) < 0.7)
    mu = jnp.where(state, jnp.pi, jnp.pi / 3.0)
    tors = mu + 0.15 * jax.random.normal(k4, (n_frames, N_ATOMS - 3))
    tors = tors - 2 * np.pi * jnp.round(tors / (2 * np.pi))
    frames = cartesian_from_bat(bonds, angles, tors, chain_zmatrix(N_ATOMS))
    write_dcd(path, np.asarray(frames))


def main():
    workdir = tempfile.mkdtemp(prefix="vms_workflow_")
    traj_path = os.path.join(workdir, "input.dcd")
    synthesize_trajectory(traj_path, N_FRAMES)

    # 1. Load with the native reader.
    reader = DCDReader(traj_path)
    coords, _ = reader.read()
    print(f"loaded {reader.n_frames} frames x {reader.n_atoms} atoms "
          f"({reader.backend} backend)")

    # 2. Internal coordinates.
    z = chain_zmatrix(N_ATOMS)
    bonds, angles, tors = bat_from_cartesian(jnp.asarray(coords), z)
    n_t = tors.shape[-1]
    print(f"BAT: {bonds.shape[-1]} bonds, {angles.shape[-1]} angles, "
          f"{n_t} torsions")

    # 3. Periodic flow over torsions: trainable von Mises base (its locs
    # must be able to reach the trans mode at the +-pi wrap) + MAF spline
    # on [-pi, pi].  The FlowModel's auto-built mapping turns a constant
    # input into trainable base parameters (FlowedDistribution pattern).
    flow = RQSSplineMAF.create(
        jax.random.PRNGKey(1), n_t, num_blocks=3,
        rqs_params={"num_bins": 16, "hidden_dim": 64,
                    "bin_range": [-np.pi, np.pi]})
    flowed = FlowedDistribution(
        flow=flow, base_layer=IndependentBlockwise.create(n_t, "von_mises"))
    model = FlowModel.create(jax.random.PRNGKey(2), flowed, input_shape=1,
                             mapping_kwargs={"hidden_dim": 16})

    def loss_fn(m, batch, k):
        del k
        return -jnp.mean(m(batch[:, :1] * 0 + 1.0).log_prob(batch))

    model, hist = fit(model, loss_fn, tors, key=jax.random.PRNGKey(3),
                      num_epochs=EPOCHS, batch_size=256, verbose=False,
                      learning_rate=3e-3)
    print(f"torsion flow NLL: {hist['loss'][0]:.3f} -> {hist['loss'][-1]:.3f}")

    # 4. Generate new frames and export.
    n_gen = 500
    gen_tors = model.predict(jnp.ones((n_gen, 1)), jax.random.PRNGKey(4))
    mean_b = jnp.mean(bonds, axis=0)
    mean_a = jnp.mean(angles, axis=0)
    gen_frames = cartesian_from_bat(
        jnp.broadcast_to(mean_b, (n_gen,) + mean_b.shape),
        jnp.broadcast_to(mean_a, (n_gen,) + mean_a.shape),
        gen_tors, z)
    out_path = os.path.join(workdir, "generated.dcd")
    write_dcd(out_path, np.asarray(gen_frames))

    # Validation: the generated torsion distribution matches the data's
    # trans/gauche populations.
    data_trans = float(jnp.mean(jnp.abs(tors) > 2.0))
    gen_trans = float(jnp.mean(jnp.abs(gen_tors) > 2.0))
    print(f"trans population: data {data_trans:.3f}, "
          f"generated {gen_trans:.3f}")
    back = DCDReader(out_path)
    print(f"exported {back.n_frames} generated frames -> {out_path}")


if __name__ == "__main__":
    main()
