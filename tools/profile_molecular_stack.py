"""Per-op device-time breakdown of the full molecular-stack MD step
(bonds + exclusions + cell-list LJ/erfc + PME reciprocal), plus
component traces — the measured answer to "where does the 18x cost vs
LJ-only go?" (VERDICT r4 weak #2).

Runs the bench workload (bench.bench_molecular_stack_md shapes —
defaults here track the bench stage: 8,192 atoms as charged dimers,
rho 0.6, tuned r_cutoff 3.5 / capacity 72, PME tolerance 1e-4; the
sweep/order modes override the split per row) and reports:

1. roofline_report on the full jitted MD scan (per-step device budget);
2. separate traces of grad(cell LJ/erfc), grad(PME reciprocal), the
   forward binned spreading alone, and the rfftn alone, so each stack
   layer gets a measured share;
3. the same full step at alternative Ewald splits (alpha down,
   r_cutoff up -> smaller grid, more work in the 5.5x-faster Pallas
   real-space kernel) — the classic accuracy-neutral trade.

Usage (on the TPU):
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_molecular_stack.py [sweep]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def build_stack(jax, jnp, n_atoms=8192, rho=0.6, cutoff=3.5,
                skin=0.4, capacity=72, rebuild_every=5, n_steps=50,
                tolerance=1e-4, alpha=None, coul_cutoff=None,
                order=6, grid_shape=None):
    """The bench_molecular_stack_md system, with the Ewald split
    exposed (alpha / coulomb cutoff / spline order / grid)."""
    from vaemolsim_tpu.md import baoab_neighbor
    from vaemolsim_tpu.potentials import (harmonic_bonds,
                                          lennard_jones_cell_neighbor,
                                          pme_coulomb)

    L = float((n_atoms / rho) ** (1.0 / 3.0))
    coul_cutoff = cutoff if coul_cutoff is None else coul_cutoff
    mz = 2 * max(int(np.ceil(n_atoms ** (1.0 / 3.0) / 2.0)), 1)
    mxy = int(np.ceil(np.sqrt(n_atoms / mz)))
    g = np.stack(np.meshgrid(np.arange(mxy), np.arange(mxy),
                             np.arange(mz), indexing="ij"),
                 -1).reshape(-1, 3)[:n_atoms].astype(np.float64)
    g *= L / np.array([mxy, mxy, mz])
    bonds = [[2 * k, 2 * k + 1] for k in range(n_atoms // 2)]
    charges = np.tile([0.5, -0.5], n_atoms // 2)
    excl = np.asarray(bonds)
    recip = pme_coulomb(charges, box=[L] * 3, r_cutoff=coul_cutoff,
                        tolerance=tolerance, exclude=excl, alpha=alpha,
                        order=order, grid_shape=grid_shape,
                        include_real_space=False)
    build, cell_e = lennard_jones_cell_neighbor(
        box=[L] * 3, cutoff=coul_cutoff, skin=skin, capacity=capacity,
        charges=charges, coulomb_alpha=recip.ewald_alpha,
        exclude=excl,
        backend="pallas" if jax.default_backend() == "tpu" else "xla")
    bonded = harmonic_bonds(bonds, k=200.0, r0=1.0)

    def energy(nl, x):
        return cell_e(nl, x) + recip(x) + bonded(x)

    x0 = jnp.asarray(g, jnp.float32)
    v0 = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
    run = jax.jit(lambda x, v, k: baoab_neighbor(
        build, energy, x, v, k, dt=0.002, friction=1.0, kT=1.0,
        n_steps=n_steps, rebuild_every=rebuild_every)[0])
    st = run(x0, v0, jax.random.PRNGKey(1))
    for i in range(6):   # thermalize off the strained lattice
        st = run(st.x, st.v, jax.random.PRNGKey(100 + i))
    float(st.x[0, 0])    # true barrier through the tunnel
    return {"run": run, "st": st, "recip": recip, "cell_e": cell_e,
            "build": build, "bonded": bonded, "L": L, "x": st.x,
            "n_steps": n_steps, "n_atoms": n_atoms,
            "grid": recip.grid_shape, "alpha": recip.ewald_alpha,
            "coul_cutoff": coul_cutoff}


def time_rate(jax, jnp, run, st, n_steps, n_atoms, reps=3):
    import time
    out = run(st.x, st.v, jax.random.PRNGKey(7))
    float(out.x[0, 0])
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        out = run(st.x, st.v, jax.random.PRNGKey(8 + r))
        jax.block_until_ready(out.x)
        best = min(best, time.perf_counter() - t0)
    return n_atoms * n_steps / best


def main():
    import jax
    import jax.numpy as jnp

    from tools.hbm_profile import roofline_report, trace_workload

    mode = sys.argv[1] if len(sys.argv) > 1 else "profile"
    print(f"backend: {jax.default_backend()}")

    if mode == "sweep":
        # Ewald-split sweep: move work between the Pallas real-space
        # kernel (cutoff up) and the FFT grid (alpha down -> coarser).
        # Capacity must scale with the cell volume (edge >= cutoff +
        # skin) or larger cutoffs silently NaN on overflow; validity is
        # asserted on the final state, not assumed.
        print("split sweep (8192 atoms, tolerance 1e-4, order 6):")
        rho, skin = 0.6, 0.4
        L = float((8192 / rho) ** (1.0 / 3.0))
        for cc in (2.5, 3.0, 3.5, 4.0, 4.5, 5.0):
            edge = L / max(int(L // (cc + skin)), 1)
            cap = int(np.ceil(1.8 * rho * edge ** 3))
            s = build_stack(jax, jnp, coul_cutoff=cc, capacity=cap)
            rate = time_rate(jax, jnp, s["run"], s["st"], s["n_steps"],
                             s["n_atoms"])
            out = s["run"](s["st"].x, s["st"].v, jax.random.PRNGKey(9))
            nl = s["build"](out.x)
            e = float(s["cell_e"](nl, out.x) + s["recip"](out.x)
                      + s["bonded"](out.x))
            kt = float(jnp.mean(jnp.sum(out.v ** 2, -1)) / 3.0)
            ok = np.isfinite(e) and 0.8 < kt < 1.2
            print(f"  r_c={cc:4.1f} alpha={s['alpha']:.3f} "
                  f"grid={s['grid']} cap={cap} -> {rate:,.0f} "
                  f"atom-steps/s  (U/N={e / 8192:.4f} kT={kt:.3f} "
                  f"{'OK' if ok else 'INVALID'})", flush=True)
        return

    if mode == "order":
        # Spline-order trade at the tuned split: order 4 halves the
        # spread stamp but needs a finer grid for the same accuracy.
        rho, skin, cc = 0.6, 0.4, 3.5
        L = float((8192 / rho) ** (1.0 / 3.0))
        edge = L / max(int(L // (cc + skin)), 1)
        cap = int(np.ceil(1.8 * rho * edge ** 3))
        for order, grid in ((6, None), (6, (60, 60, 60)),
                            (4, (72, 72, 72)), (4, (80, 80, 80)),
                            (5, None)):
            s = build_stack(jax, jnp, coul_cutoff=cc, capacity=cap,
                            order=order, grid_shape=grid)
            rate = time_rate(jax, jnp, s["run"], s["st"], s["n_steps"],
                             s["n_atoms"])
            print(f"  order={order} grid={s['grid']} -> {rate:,.0f} "
                  f"atom-steps/s", flush=True)
        return

    s = build_stack(jax, jnp)
    print(f"grid {s['grid']}, alpha {s['alpha']:.3f}, "
          f"coulomb cutoff {s['coul_cutoff']}")
    rate = time_rate(jax, jnp, s["run"], s["st"], s["n_steps"],
                     s["n_atoms"])
    print(f"wall-clock rate: {rate:,.0f} atom-steps/s")

    print("\n=== full MD scan (per-step budget) ===")
    st = s["st"]
    roofline_report(jax, jnp,
                    lambda x, v: s["run"](x, v, jax.random.PRNGKey(2)),
                    st.x, st.v, n_calls=3, unit_count=s["n_steps"])

    x = st.x
    nl = s["build"](x)
    recip, cell_e = s["recip"], s["cell_e"]

    print("\n=== grad(PME reciprocal) alone ===")
    roofline_report(jax, jnp, jax.grad(recip), x, n_calls=10,
                    unit_count=1, unit_name="eval")

    print("\n=== grad(cell-list LJ/erfc) alone (fixed nl) ===")
    roofline_report(jax, jnp,
                    jax.jit(lambda y: jax.grad(
                        lambda z: cell_e(nl, z))(y)),
                    x, n_calls=10, unit_count=1, unit_name="eval")

    print("\n=== PME reciprocal FORWARD only ===")
    roofline_report(jax, jnp, recip, x, n_calls=10, unit_count=1,
                    unit_name="eval")

    gx, gy, gz = s["grid"]
    rho_grid = jax.random.normal(jax.random.PRNGKey(3), (gx, gy, gz))
    print("\n=== rfftn of the charge grid alone ===")
    roofline_report(jax, jnp, lambda r: jnp.fft.rfftn(r), rho_grid,
                    n_calls=10, unit_count=1, unit_name="eval")


if __name__ == "__main__":
    main()
