"""Thermal conductivity of the Lennard-Jones fluid by Green-Kubo —
the heat-flux observable end to end on NVE dynamics.

Workflow:
1. Bulk LJ liquid at the classic Meier state point (rho* = 0.8442,
   T* = 0.722), NVT-equilibrated with BAOAB on the cell-list path.
2. Center-of-mass drift removed (the energy flux equals the heat flux
   only at zero total momentum), then NVE production with velocity
   Verlet in neighbor-rebuild chunks — Green-Kubo transport wants
   unthermostatted dynamics.
3. ``energy.heat_flux`` evaluates the Irving-Kirkwood pair energy flux
   per sampled frame (same analytic per-pair derivatives as the force).
4. ``observables.green_kubo_thermal_conductivity`` integrates the
   multi-origin flux autocorrelation.

Validations:
1. NVE energy conservation over the whole production run (the
   trajectory actually samples the microcanonical ensemble).
2. The flux ACF decays (correlated at t=0, <10% by t* = 1.0).
3. lambda* in a window around the literature value (~6.9 for LJ near
   this state point, e.g. Vogelsang/Hoheisel and later recomputations;
   smoke-scale statistics are granted a wide factor).

Run:  python examples/37_thermal_conductivity.py [--full]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vaemolsim_tpu import md, observables, potentials

FULL = "--full" in sys.argv
jax.config.update("jax_platforms", os.environ.get("JAX_PLATFORMS", "cpu"))

KT = 0.722
RHO = 0.8442
CUT = 2.5
DT = 0.004
REBUILD = 5
EQUIL = 4_000 if FULL else 1_500
PROD = 80_000 if FULL else 15_000

# ----- 1. bulk liquid, NVT equilibration -----------------------------
n_side = 9
N = n_side ** 3
L = float((N / RHO) ** (1.0 / 3.0))
print(f"bulk: N={N}, L={L:.3f}, rho*={N / L**3:.4f}, T*={KT}")

build, energy = potentials.lennard_jones_cell_neighbor(
    box=[L] * 3, cutoff=CUT, skin=0.5, capacity=48)

lattice = jnp.stack(jnp.meshgrid(*[jnp.arange(float(n_side))] * 3,
                                 indexing="ij"), -1).reshape(-1, 3)
x0 = (lattice + 0.5) * (L / n_side)
v0 = jnp.sqrt(KT) * jax.random.normal(jax.random.PRNGKey(0), x0.shape)

st, _ = md.baoab_neighbor(build, energy, x0, v0, jax.random.PRNGKey(1),
                          dt=DT, n_steps=EQUIL, rebuild_every=REBUILD,
                          friction=2.0, kT=KT)

# ----- 2. NVE production (zero total momentum) ------------------------
v_nve = st.v - jnp.mean(st.v, axis=0, keepdims=True)


@jax.jit
def prod_chunk(carry, _):
    """One rebuild chunk of NVE; samples (x, v) at the chunk end."""
    x, v = carry
    nl = build(x)
    out, _ = md.velocity_verlet(lambda xx: energy(nl, xx), x, v,
                                dt=DT, n_steps=REBUILD)
    return (out.x, out.v), (out.x, out.v)


n_chunks = PROD // REBUILD
(xf, vf), (txs, tvs) = jax.lax.scan(prod_chunk, (st.x, v_nve), None,
                                    length=n_chunks)
n_frames = txs.shape[0]
dt_sample = REBUILD * DT
print(f"production: {PROD} NVE steps, {n_frames} sampled frames "
      f"(every {dt_sample:.3f} tau)")

# Validation 1: NVE energy conservation start -> end.
nl0 = build(txs[0])
nlf = build(xf)
e_start = float(energy(nl0, txs[0])) + float(md.kinetic_energy(tvs[0]))
e_end = float(energy(nlf, xf)) + float(md.kinetic_energy(vf))
drift = abs(e_end - e_start) / abs(e_start)
print(f"NVE total-energy drift over the run: {drift:.2e} relative")
assert drift < 5e-3, drift

# ----- 3. heat flux per frame -----------------------------------------


@jax.jit
def frame_flux(x, v):
    return energy.heat_flux(build(x), x, v)


jflux = jax.lax.map(lambda xv: frame_flux(*xv), (txs, tvs),
                    batch_size=64)
assert np.isfinite(np.asarray(jflux)).all()

# ----- 4. Green-Kubo integral -----------------------------------------
lam, jacf = observables.green_kubo_thermal_conductivity(
    jflux, dt=dt_sample, volume=L ** 3, kt=KT, t_max=1.0)
lam = float(lam)

# Validation 2: the flux ACF decays.
c0 = float(jacf[0])
c_late = float(jacf[int(round(1.0 / dt_sample))])
print(f"heat-flux ACF: C(0) = {c0:.4g}, C(1.0)/C(0) = {c_late / c0:.3f}")
assert c0 > 0 and abs(c_late / c0) < 0.10

# Validation 3: lambda* near the literature value.
print(f"Green-Kubo thermal conductivity lambda* = {lam:.2f} "
      "(literature for LJ near this state point ~6.9)")
lo, hi = (4.5, 10.0) if FULL else (3.0, 13.0)
assert lo < lam < hi, lam

print("OK")
