"""Deep kinetics: a VAMPnet on Muller-Brown dynamics.

The learned-featurization counterpart of example 25: the same batched
Langevin trajectories on the Muller-Brown surface, but instead of
hand-building the analysis chain (TICA projection -> Voronoi grid ->
MSM), a `vaemolsim_tpu.vamp.VAMPNet` learns fuzzy metastable
memberships end-to-end by maximizing the VAMP-2 score — covariance
matmuls and two (k, k) `eigh`, no SVD in the gradient graph.

Validations:
1. Variational ordering: the trained lobe's VAMP-2 score beats the
   best LINEAR featurization (TICA projections of the same data) —
   the whole point of going deep.
2. The VAMPnet's slowest implied timescale agrees with the
   grid-MSM estimate from the package's classical pipeline (two
   completely different estimators, one ground truth).
3. The learned memberships separate the two metastable basins
   (linear probe against energy-basin labels).

Run:  python examples/29_vampnet_kinetics.py [--full]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vaemolsim_tpu import md, msm, vamp
from vaemolsim_tpu.train import fit

FULL = "--full" in sys.argv
N_WALK = 128 if FULL else 48
N_STEPS = 200_000 if FULL else 80_000
COLLECT = 20
KT = 15.0
LAG = 10
EPOCHS = 30 if FULL else 12

_A = jnp.array([-200.0, -100.0, -170.0, 15.0])
_a = jnp.array([-1.0, -1.0, -6.5, 0.7])
_b = jnp.array([0.0, 0.0, 11.0, 0.6])
_c = jnp.array([-10.0, -10.0, -6.5, 0.7])
_X0 = jnp.array([1.0, 0.0, -0.5, -1.0])
_Y0 = jnp.array([0.0, 0.5, 1.5, 1.0])

MIN_A = jnp.array([-0.558, 1.442])
MIN_C = jnp.array([0.623, 0.028])


def mb_energy(p):
    dx = p[..., 0, None] - _X0
    dy = p[..., 1, None] - _Y0
    return jnp.sum(_A * jnp.exp(_a * dx * dx + _b * dx * dy
                                + _c * dy * dy), axis=-1)


def potential(conf):
    return mb_energy(conf[..., 0, :])


def main():
    # ---- 1. batched Langevin sampling (as in example 25) ----
    half = N_WALK // 2
    x0 = jnp.concatenate([jnp.tile(MIN_A, (half, 1, 1)),
                          jnp.tile(MIN_C, (N_WALK - half, 1, 1))])
    _, traj = md.baoab(potential, x0, jnp.zeros_like(x0),
                       jax.random.PRNGKey(0), dt=0.004,
                       n_steps=N_STEPS, friction=5.0, kT=KT,
                       collect_every=COLLECT)
    frames = jnp.moveaxis(traj[..., 0, :], 0, 1)  # (walkers, T, 2)
    print(f"trajectory: {frames.shape[0]} walkers x "
          f"{frames.shape[1]} frames")

    # Normalize inputs for the net (pure reparametrization).
    flat = frames.reshape(-1, 2)
    mu, sd = flat.mean(0), flat.std(0)
    z = (frames - mu) / sd
    x0p, xtp = vamp.lagged_pairs(z, lag=LAG)

    # ---- 2. train the VAMPnet ----
    net = vamp.VAMPNet.create(jax.random.PRNGKey(1), in_dim=2, k=3,
                              hidden_dims=(64, 64))
    net, hist = fit(net, lambda m, b, k: m.loss(*b), (x0p, xtp),
                    key=jax.random.PRNGKey(2), num_epochs=EPOCHS,
                    batch_size=65_536, learning_rate=3e-3,
                    scan_epochs=True)
    score_net = -hist["loss"][-1]

    # ---- 3a. beat the best linear featurization (TICA) ----
    _, comps, _ = msm.tica(frames, lag=LAG)
    tproj = (flat - flat.mean(0)) @ comps
    tproj = tproj.reshape(frames.shape[0], -1, comps.shape[1])
    t0, tt = vamp.lagged_pairs(tproj, lag=LAG)
    score_tica = float(vamp.vamp_score(t0, tt))
    print(f"VAMP-2: net {score_net:.4f} vs linear (TICA) "
          f"{score_tica:.4f}")
    assert score_net > score_tica - 0.01, (score_net, score_tica)

    # ---- 3b. timescale agreement with the classical grid MSM ----
    sv = net.singular_values(x0p, xtp)
    ts_net = float(vamp.vamp_timescales(sv, LAG)[0])

    gx, gy = jnp.meshgrid(jnp.linspace(-1.4, 1.0, 7),
                          jnp.linspace(-0.3, 1.9, 7))
    grid = jnp.stack([gx.ravel(), gy.ravel()], axis=-1)
    centers = grid[np.asarray(mb_energy(grid) < 150.0)]
    d = msm.assign_states(frames, centers)
    T = msm.transition_matrix(
        msm.count_matrix(d, centers.shape[0], lag=LAG))
    ts_msm = float(msm.implied_timescales(T, lag=LAG)[0])
    print(f"slowest timescale: VAMPnet {ts_net:.0f} frames vs "
          f"grid MSM {ts_msm:.0f} frames")
    assert abs(ts_net - ts_msm) / ts_msm < 0.35, (ts_net, ts_msm)

    # ---- 3c. memberships separate the basins (linear probe) ----
    # Basin labels: nearer end minimum (energy-landscape truth).
    d2a = jnp.sum((flat - MIN_A) ** 2, -1)
    d2c = jnp.sum((flat - MIN_C) ** 2, -1)
    label = np.asarray(d2c < d2a).astype(int)
    chi = np.asarray(net((flat - mu) / sd))
    chi_aug = np.concatenate([chi, np.ones((len(chi), 1))], -1)
    onehot = np.eye(2)[label]
    W, *_ = np.linalg.lstsq(chi_aug, onehot, rcond=None)
    acc = np.mean((chi_aug @ W).argmax(-1) == label)
    print(f"basin separation (linear probe on memberships): "
          f"accuracy {acc:.3f}")
    assert acc > 0.9, acc
    print("OK")


if __name__ == "__main__":
    main()
