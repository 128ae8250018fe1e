"""One rare event, four independent rate estimates.

The sharpest validation of rare-event machinery is agreement between
methods with completely different failure modes.  This example
measures the SAME escape rate — a Langevin particle leaving the left
well of the double well ``V(x) = h (x^2 - 1)^2`` over a 5 kT barrier —
four ways:

1. **Brute force**: direct BAOAB, first-passage counting.  The ground
   truth here (the barrier is just low enough), impossibly expensive
   for real barriers.
2. **Forward flux sampling** (:mod:`vaemolsim_tpu.mcmc.ffs`): flux
   through the first interface x the ladder of conditional
   probabilities — hundreds of times fewer barrier crossings needed.
3. **Weighted ensemble** (:mod:`vaemolsim_tpu.we`): recycling
   steady-state + the Hill relation — no reaction coordinate ladder,
   just bins.
4. **Kramers-corrected harmonic TST**
   (:func:`vaemolsim_tpu.paths.harmonic_tst_rate`): the analytic
   no-simulation estimate from curvatures alone, times the
   intermediate-friction Kramers transmission factor
   ``sqrt(1 + (gamma / 2 w_b)^2) - gamma / 2 w_b``.

All four land within a factor of ~2, which is exactly what they
promise (TST is an upper bound corrected by an approximate
transmission coefficient; FFS/WE are statistically exact).

Run:  python examples/35_rare_event_rates.py [--full]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vaemolsim_tpu import md, paths, we
from vaemolsim_tpu.mcmc import run_ffs

FULL = "--full" in sys.argv
H, KT, FRICTION, DT = 2.0, 0.4, 1.0, 0.01
BARRIER_KT = H / KT


def potential(x):
    q = x[..., 0, 0]
    return H * (q * q - 1.0) ** 2


def lam(x):
    return x[..., 0, 0]


def equilibrated_left_well(key, r):
    kx, kv = jax.random.split(key)
    x0 = -1.0 + 0.1 * jax.random.normal(kx, (r, 1, 1))
    v0 = jnp.sqrt(KT) * jax.random.normal(kv, (r, 1, 1))
    st, _ = md.baoab(potential, x0, v0, jax.random.fold_in(key, 7),
                     dt=DT, n_steps=500, friction=FRICTION, kT=KT)
    return st.x, st.v


def brute_force(key):
    r = 1024 if FULL else 512
    n_steps = 60000 if FULL else 40000
    x0, v0 = equilibrated_left_well(key, r)
    _, traj = jax.jit(lambda x, v, k: md.baoab(
        potential, x, v, k, dt=DT, n_steps=n_steps,
        friction=FRICTION, kT=KT, collect_every=10))(
            x0, v0, jax.random.fold_in(key, 1))
    q = np.asarray(traj[..., 0, 0])              # (T, R)
    arrived = q >= 1.0
    hit = arrived.any(axis=0)
    first = np.where(hit, arrived.argmax(axis=0), q.shape[0])
    total_time = float(first.sum()) * 10 * DT    # censored: full run
    n_events = int(hit.sum())
    return n_events / total_time, n_events


def ffs_rate(key):
    x0, v0 = equilibrated_left_well(key, 256)
    res = run_ffs(potential, lam, x0, v0, jax.random.fold_in(key, 2),
                  interfaces=[-0.6, -0.2, 0.2, 0.6, 1.0], dt=DT,
                  kT=KT, flux_steps=6000 if FULL else 4000,
                  max_steps=4000, friction=FRICTION,
                  n_trials=2048 if FULL else 1024)
    return float(res.rate), res


def we_rate(key):
    n_bins, m = 10, 24
    seg_steps = 20
    n_iters = 3000 if FULL else 1500
    edges = jnp.linspace(-1.4, 1.0, n_bins - 1)  # last bin: x >= 1.0

    def bin_fn(walk):
        return jnp.searchsorted(edges, lam(walk[0])).astype(jnp.int32)

    def propagate(walk, k):
        st, _ = md.baoab(potential, walk[0], walk[1], k, dt=DT,
                         n_steps=seg_steps, friction=FRICTION, kT=KT)
        return (st.x, st.v)

    def recycle(walk):
        return (jnp.full_like(walk[0], -1.0), jnp.zeros_like(walk[1]))

    x0, v0 = equilibrated_left_well(key, 64)
    step = we.make_we_step(propagate, bin_fn, n_bins=n_bins,
                           m_per_bin=m, target_bin=n_bins - 1,
                           recycle_fn=recycle)
    st = we.we_init((x0, v0), n_bins, m, jax.random.fold_in(key, 3))
    st, _ = we.run_we(jax.jit(step), st, n_iters // 3)   # relax
    f0, n0 = float(st.flux), int(st.n_iters)
    st, _ = we.run_we(jax.jit(step), st, n_iters)
    per_iter = (float(st.flux) - f0) / (int(st.n_iters) - n0)
    return per_iter / (seg_steps * DT)


def kramers_tst():
    x_min = jnp.asarray([[-1.0]])
    x_sad = jnp.asarray([[0.0]])
    k_tst = float(paths.harmonic_tst_rate(potential, x_min, x_sad,
                                          kt=KT))
    w_b = float(jnp.sqrt(4.0 * H))               # |V''(0)| = 4h, m = 1
    g = FRICTION / (2.0 * w_b)
    kappa = float(np.sqrt(1.0 + g * g) - g)      # Kramers, interm. friction
    return kappa * k_tst, k_tst, kappa


def main():
    print(f"double well h={H}, kT={KT}: barrier {BARRIER_KT:.1f} kT, "
          f"friction {FRICTION}")
    k_bf, n_events = brute_force(jax.random.PRNGKey(0))
    print(f"[brute force]  k = {k_bf:.3e}  ({n_events} events)")
    k_ffs, res = ffs_rate(jax.random.PRNGKey(1))
    print(f"[FFS]          k = {k_ffs:.3e}  (flux {float(res.flux):.3f}, "
          f"p = {np.round(np.asarray(res.p_stages), 3)})")
    k_we = we_rate(jax.random.PRNGKey(2))
    print(f"[WE/Hill]      k = {k_we:.3e}")
    k_kr, k_tst, kappa = kramers_tst()
    print(f"[Kramers-TST]  k = {k_kr:.3e}  (harmonic TST {k_tst:.3e} "
          f"x transmission {kappa:.3f})")

    for name, k in [("FFS", k_ffs), ("WE", k_we), ("Kramers-TST", k_kr)]:
        ratio = k / k_bf
        print(f"  {name}/brute = {ratio:.2f}")
        assert 0.35 < ratio < 2.8, f"{name} rate off brute force: {ratio}"
    assert k_tst >= k_bf * 0.8, "TST should upper-bound the true rate"
    print("OK: four independent estimators agree on the escape rate.")


if __name__ == "__main__":
    main()
