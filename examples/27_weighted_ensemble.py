"""Weighted-ensemble rare-event rate vs brute force.

The WESTPA-style workflow on compiled scans: a 5.5 kT double-well
barrier gives a slow left->right transition; weighted-ensemble
sampling (`vaemolsim_tpu.we`) keeps all 20 progress-coordinate bins
populated with UNBIASED Langevin walkers (velocities persist in the
walker pytree) and reads the steady-state rate off the recycled
probability flux (Hill relation).  Brute force measures the same rate
as a mean first-passage time over many parallel trajectories.

Validations:
1. Total walker weight stays exactly 1.
2. The steady-state weight profile spans the barrier (populated bins
   down to ~1e-5 weight — what plain sampling cannot hold).
3. WE rate within 2.5x of the brute-force 1/MFPT (smoke scale; --full
   tightens sampling).

Run:  python examples/27_weighted_ensemble.py [--full]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vaemolsim_tpu import md, we

FULL = "--full" in sys.argv
N_ITERS = 4000 if FULL else 1500
BURN = N_ITERS // 3
N_BF = 1024 if FULL else 384
BF_STEPS = 200_000 if FULL else 120_000

H = 5.5
DT, SEG, GAMMA = 0.01, 10, 2.0
TAU = DT * SEG
N_BINS, M = 20, 8
EDGES = jnp.linspace(-1.3, 1.05, N_BINS - 1)
TARGET = N_BINS - 1  # q > 1.05


def pot(x):
    q = x[..., 0, 0]
    return H * (q * q - 1.0) ** 2


def propagate(walk, key):
    x, v = walk
    st, _ = md.baoab(pot, x, v, key, dt=DT, n_steps=SEG,
                     friction=GAMMA, kT=1.0)
    return (st.x, st.v)


def bin_fn(walk):
    return jnp.searchsorted(EDGES, walk[0][..., 0, 0]).astype(jnp.int32)


def recycle(walk):
    x, v = walk
    return (jnp.full_like(x, -1.0), jnp.zeros_like(v))


def main():
    x0 = -jnp.ones((M, 1, 1))
    v0 = jax.random.normal(jax.random.PRNGKey(1), (M, 1, 1))
    st = we.we_init((x0, v0), N_BINS, M, jax.random.PRNGKey(0))
    step = we.make_we_step(propagate, bin_fn, n_bins=N_BINS,
                           m_per_bin=M, target_bin=TARGET,
                           recycle_fn=recycle)
    st, _ = we.run_we(jax.jit(step), st, BURN)       # reach steady state
    f0, n0 = float(st.flux), int(st.n_iters)
    st, _ = we.run_we(jax.jit(step), st, N_ITERS - BURN)
    rate_we = (float(st.flux) - f0) / ((int(st.n_iters) - n0) * TAU)
    print(f"WE: weight sum {float(st.w.sum()):.6f}, "
          f"rate = {rate_we:.2e} per unit time "
          f"({N_BINS} bins x {M} walkers)")
    assert abs(float(st.w.sum()) - 1.0) < 1e-3

    b = np.asarray(bin_fn(st.x))
    w = np.asarray(st.w)
    prof = np.array([w[b == i].sum() for i in range(N_BINS)])
    populated = (prof > 1e-8).sum()
    print(f"bins populated above 1e-8 weight: {populated}/{N_BINS}")
    assert populated >= 12

    # brute force MFPT over many parallel walkers
    xb = -jnp.ones((N_BF, 1, 1))
    _, traj = md.baoab(pot, xb, jnp.zeros_like(xb),
                       jax.random.PRNGKey(2), dt=DT, n_steps=BF_STEPS,
                       friction=GAMMA, kT=1.0, collect_every=50)
    q = np.asarray(traj[..., 0, 0])
    hit = q > 1.05
    first = np.where(hit.any(0), hit.argmax(0), -1)
    crossed = first >= 0
    times = first[crossed] * 50 * DT
    T_tot = BF_STEPS * DT
    mfpt = (times.sum() + (~crossed).sum() * T_tot) / max(crossed.sum(), 1)
    rate_bf = 1.0 / mfpt
    print(f"brute force: {crossed.mean():.2f} of {N_BF} walkers crossed, "
          f"MFPT = {mfpt:.0f}, rate = {rate_bf:.2e}")

    ratio = rate_we / rate_bf
    print(f"WE / brute-force rate ratio: {ratio:.2f}")
    assert 1 / 2.5 < ratio < 2.5, ratio
    print("OK")


if __name__ == "__main__":
    main()
