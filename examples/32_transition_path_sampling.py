"""Transition path sampling of the Muller-Brown A -> C transition.

At kT = 7 the A -> C barrier is ~15 kT: direct MD would wait ~e^15
mean first passages per crossing, so the reactive ensemble is
unreachable by brute force — exactly the regime TPS
(:mod:`vaemolsim_tpu.mcmc.tps`) was built for, and no reaction
coordinate is needed.  The workflow composes three of the framework's
rare-event tools:

1. :func:`paths.climbing_neb` finds the zero-temperature MEP and its
   exact saddle (E = -40.6648 at (-0.822, 0.624) — the literature
   values pinned in tests/test_paths.py),
2. the NEB path, interpolated to ``n_frames`` and tiled over walkers,
   seeds the path ensemble; one-way shooting sweeps harvest unbiased
   finite-temperature transition paths,
3. the harvested DYNAMICS is validated against the harvested
   GEOMETRY: each path's maximum-energy frame (its dynamical
   bottleneck) must cluster at the NEB saddle, with the mean peak
   energy a few kT above it (thermal crossing), and
   :func:`paths.harmonic_tst_rate` turns the same saddle into the
   static rate estimate the ensemble's transit times contextualize.

Run:  python examples/32_transition_path_sampling.py [--full]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vaemolsim_tpu import paths
from vaemolsim_tpu.mcmc import make_tps_step, run_tps, tps_init
from vaemolsim_tpu.potentials import minimize_energy

FULL = "--full" in sys.argv
KT = 7.0
DT = 0.004
FRICTION = 2.0
N_FRAMES = 401                 # duration 1.6
N_WALKERS = 48 if FULL else 32
BURN = 250 if FULL else 150
HARVEST = 400 if FULL else 250
THIN = 10

# Muller-Brown constants (Muller & Brown 1979).
_A = jnp.array([-200.0, -100.0, -170.0, 15.0])
_a = jnp.array([-1.0, -1.0, -6.5, 0.7])
_b = jnp.array([0.0, 0.0, 11.0, 0.6])
_c = jnp.array([-10.0, -10.0, -6.5, 0.7])
_X0 = jnp.array([1.0, 0.0, -0.5, -1.0])
_Y0 = jnp.array([0.0, 0.5, 1.5, 1.0])

SADDLE = jnp.array([-0.822001, 0.624313])
E_SADDLE = -40.664844


def potential(conf):
    """(..., 1, 2) -> (...,)."""
    px, py = conf[..., 0, 0], conf[..., 0, 1]
    dx = px[..., None] - _X0
    dy = py[..., None] - _Y0
    return jnp.sum(_A * jnp.exp(_a * dx * dx + _b * dx * dy
                                + _c * dy * dy), axis=-1)


def main():
    # --- 1. minima + MEP + saddle (zero-temperature geometry) ---
    ma = minimize_energy(potential, jnp.array([[[-0.558, 1.442]]]),
                         steps=2000, lr=0.005)[0]
    mc = minimize_energy(potential, jnp.array([[[0.623, 0.028]]]),
                         steps=2000, lr=0.005)[0]
    res = paths.climbing_neb(potential, paths.interpolate_path(
        ma, mc, 24), n_steps=3000, k_spring=50.0, dt=0.002,
        climb_after=500)
    saddle = res.saddle
    e_saddle = float(potential(saddle))
    print(f"NEB saddle: ({float(saddle[0, 0]):+.4f}, "
          f"{float(saddle[0, 1]):+.4f}), E = {e_saddle:.4f} "
          f"(literature {E_SADDLE:.4f})")
    k_tst = float(paths.harmonic_tst_rate(potential, ma, saddle, kt=KT))
    print(f"harmonic TST rate at kT={KT}: {k_tst:.3e} "
          f"(mean waiting time {1.0 / k_tst:.2e} — hopeless for "
          f"direct MD)")

    in_a = lambda x: jnp.sum((x[..., 0, :] - ma[0]) ** 2, -1) < 0.35 ** 2
    in_b = lambda x: jnp.sum((x[..., 0, :] - mc[0]) ** 2, -1) < 0.35 ** 2

    # --- 2. seed paths: NEB MEP resampled to n_frames ---
    t_img = jnp.linspace(0.0, 1.0, res.path.shape[0])
    t_frm = jnp.linspace(0.0, 1.0, N_FRAMES)
    seed_xy = jnp.stack([jnp.interp(t_frm, t_img, res.path[:, 0, k])
                         for k in range(2)], axis=-1)   # (F, 2)
    seed = jnp.tile(seed_xy[None, :, None, :], (N_WALKERS, 1, 1, 1))
    state = tps_init(seed, key=jax.random.PRNGKey(0), kt=KT)
    assert bool(jnp.all(in_a(state.path[:, 0])))
    assert bool(jnp.all(in_b(state.path[:, -1])))

    # --- 3. shoot ---
    step = make_tps_step(potential, in_a=in_a, in_b=in_b, dt=DT,
                         kt=KT, friction=FRICTION)
    state, _ = run_tps(step, state, jax.random.PRNGKey(1), BURN)
    state, coll = run_tps(step, state, jax.random.PRNGKey(2), HARVEST,
                          collect_every=THIN)
    acc = float(jnp.mean(state.acceptance_rate))
    paths_xy = coll.reshape(-1, N_FRAMES, 2)            # (P, F, 2)
    n_paths = paths_xy.shape[0]
    print(f"harvested {n_paths} paths, one-way shooting acceptance "
          f"{acc:.3f}")

    # --- 4. the dynamical bottleneck vs the static saddle ---
    e = potential(paths_xy[:, :, None, :])              # (P, F)
    i_peak = jnp.argmax(e, axis=1)
    peak_xy = jnp.take_along_axis(
        paths_xy, i_peak[:, None, None], axis=1)[:, 0]  # (P, 2)
    e_peak = jnp.max(e, axis=1)
    mean_peak = np.asarray(jnp.mean(peak_xy, axis=0))
    dist = float(jnp.linalg.norm(jnp.mean(peak_xy, 0) - saddle[0]))
    print(f"crossing cloud: mean ({mean_peak[0]:+.3f}, "
          f"{mean_peak[1]:+.3f}), |mean - saddle| = {dist:.3f}, "
          f"spread {float(jnp.std(peak_xy)):.3f}")
    de = float(jnp.mean(e_peak)) - e_saddle
    print(f"mean peak energy {float(jnp.mean(e_peak)):.2f} = saddle + "
          f"{de / KT:.2f} kT")

    # --- 5. transit times (the dynamics TST cannot see) ---
    f_idx = jnp.arange(N_FRAMES)
    a_mask = in_a(paths_xy[:, :, None, :])
    b_mask = in_b(paths_xy[:, :, None, :])
    t_enter_b = jnp.argmax(b_mask, axis=1)
    before_b = f_idx[None, :] < t_enter_b[:, None]
    t_leave_a = jnp.max(jnp.where(a_mask & before_b, f_idx[None, :],
                                  -1), axis=1)
    transit = (t_enter_b - t_leave_a) * DT
    print(f"transit time: mean {float(jnp.mean(transit)):.3f}, "
          f"median {float(jnp.median(transit)):.3f} (path duration "
          f"{(N_FRAMES - 1) * DT:.2f})")

    assert abs(e_saddle - E_SADDLE) < 1e-2
    assert acc > 0.1, acc
    assert dist < 0.25, dist                 # bottleneck AT the saddle
    assert 0.5 < de / KT < 4.0, de           # thermal, not athermal
    assert float(jnp.mean(transit)) < (N_FRAMES - 1) * DT
    print("OK")


if __name__ == "__main__":
    main()
