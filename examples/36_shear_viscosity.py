"""Shear viscosity of the Lennard-Jones fluid by Green-Kubo, plus a
slab surface tension — the pressure-tensor observable stack end to end.

Workflow:
1. Bulk LJ liquid near the classic Meier state point (rho* = 0.8442,
   T* = 0.722), integrated with BAOAB on the cell-list neighbor path.
2. A second pass over the sampled frames evaluates the FULL
   instantaneous pressure tensor: analytic pair virial from the
   cell-list potential (``energy.stress`` — shear components included,
   same gathers as the force) plus the kinetic part
   (``observables.kinetic_stress``).
3. ``observables.green_kubo_viscosity`` integrates the multi-origin
   shear-stress autocorrelation (five traceless components averaged).
4. A liquid slab in an elongated box demonstrates the DIAGONAL
   pressure-tensor route (``pressure_tensor_diag`` works for any
   box-parametric dense potential) feeding the Kirkwood-Buff
   ``surface_tension``.

Validations:
1. Per-frame exact identity: trace of the full cell-list tensor equals
   the dense dilation-jvp ``virial_pressure`` (two independent
   implementations of the virial).
2. The shear-stress ACF decays (correlated at t=0, <10% by t* = 1.5).
3. eta* in a window around the literature value for the
   truncated-shifted rc* = 2.5 LJ fluid (full-LJ reference ~3.2;
   smoke-scale statistics are granted a wide factor).
4. Slab surface tension is positive and the BULK control is ~0 —
   the anisotropy signal is interfacial, not an estimator artifact.

Run:  python examples/36_shear_viscosity.py [--full]
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
GAMMA = 1.0            # weak thermostat: stress dynamics stay physical
REBUILD = 10
SAMPLE_EVERY = 2
EQUIL = 4_000 if FULL else 1_500
PROD = 60_000 if FULL else 12_000

# ----- 1. bulk liquid, cell-list neighbor MD -------------------------
n_side = 9
N = n_side ** 3
L = float((N / RHO) ** (1.0 / 3.0))
print(f"bulk: N={N}, L={L:.3f}, rho*={N / L**3:.4f}, T*={KT}")

build, energy = potentials.lennard_jones_cell_neighbor(
    box=[L] * 3, cutoff=CUT, skin=0.5, capacity=48)

lattice = jnp.stack(jnp.meshgrid(*[jnp.arange(float(n_side))] * 3,
                                 indexing="ij"), -1).reshape(-1, 3)
# Half-spacing offset: the cell edge is exactly 3 lattice spacings, so
# an unshifted lattice puts whole atom planes ON cell boundaries and
# float rounding piles 4 planes (64 atoms) into one cell.
x0 = (lattice + 0.5) * (L / n_side)
v0 = jnp.sqrt(KT) * jax.random.normal(jax.random.PRNGKey(0), x0.shape)

st, _ = md.baoab_neighbor(build, energy, x0, v0, jax.random.PRNGKey(1),
                          dt=DT, n_steps=EQUIL, rebuild_every=REBUILD,
                          friction=GAMMA, kT=KT)


@jax.jit
def prod_chunk(state, key):
    """One rebuild chunk that also collects (x, v) every SAMPLE_EVERY."""
    nl = build(state.x)
    out, (tx, tv) = md.baoab(lambda x: energy(nl, x), state.x, state.v,
                             key, dt=DT, n_steps=REBUILD,
                             friction=GAMMA, kT=KT,
                             collect_every=SAMPLE_EVERY, collect_v=True)
    return out, (tx, tv)


n_chunks = PROD // REBUILD
keys = jax.random.split(jax.random.PRNGKey(2), n_chunks)
st, (txs, tvs) = jax.lax.scan(lambda s, k: prod_chunk(s, k), st, keys)
frames_x = txs.reshape(-1, N, 3)
frames_v = tvs.reshape(-1, N, 3)
n_frames = frames_x.shape[0]
print(f"production: {PROD} steps, {n_frames} sampled frames")

# ----- 2. full pressure tensors: analytic pair virial + kinetic ------


@jax.jit
def frame_pressure(x, v):
    nl = build(x)
    return (energy.stress(nl, x)
            + observables.kinetic_stress(v, box=[L] * 3))


ptensor = jax.lax.map(lambda xv: frame_pressure(*xv),
                      (frames_x, frames_v), batch_size=64)

# Validation 1: trace identity vs the independent dense dilation jvp.
pfb = lambda b: potentials.lennard_jones(box=b, cutoff=CUT)
idx = jnp.arange(0, n_frames, max(n_frames // 16, 1))
tr3 = jnp.trace(ptensor[idx], axis1=-2, axis2=-1) / 3.0
p_dense = jax.vmap(lambda x, v: observables.pressure_tensor_diag(
    pfb, x, box=[L] * 3, v=v).mean())(frames_x[idx], frames_v[idx])
err = float(jnp.max(jnp.abs(tr3 - p_dense) / jnp.abs(p_dense)))
print(f"trace identity vs dense jvp on {idx.size} frames: "
      f"max rel err {err:.2e}")
assert err < 5e-3, err
print(f"mean pressure P* = {float(jnp.mean(tr3)):.3f}")

# ----- 3. Green-Kubo integral ---------------------------------------
dt_sample = DT * SAMPLE_EVERY
eta, sacf = observables.green_kubo_viscosity(
    ptensor, dt=dt_sample, volume=L ** 3, kt=KT, t_max=1.5)
sacf = np.asarray(sacf)
k15 = int(round(1.5 / dt_sample))
decay = sacf[k15] / sacf[0]
print(f"shear-stress ACF: C(0) = {sacf[0]:.4f}, "
      f"C(1.5)/C(0) = {decay:.3f}")
assert sacf[0] > 0 and abs(decay) < 0.10, decay
eta = float(eta)
print(f"Green-Kubo shear viscosity eta* = {eta:.2f} "
      f"(literature full-LJ at this state point ~3.2)")
lo, hi = (1.6, 6.0) if FULL else (1.0, 8.0)
assert lo < eta < hi, eta

# ----- 4. slab surface tension via the diagonal (jvp) route ---------
# Liquid block centered in an elongated box: two interfaces normal to
# z.  Dense LJ (the slab box is too thin for a cell grid) +
# pressure_tensor_diag + surface_tension.  A bulk control from the
# SAME estimator pins that the anisotropy is interfacial.
ns = 6
NS = ns ** 3
LS = float((NS / RHO) ** (1.0 / 3.0))
BOX_S = [LS, LS, 3.0 * LS]
slab0 = (jnp.stack(jnp.meshgrid(*[jnp.arange(float(ns))] * 3,
                                indexing="ij"), -1).reshape(-1, 3)
         * (LS / ns) + jnp.asarray([0.0, 0.0, LS]))
dense_slab = potentials.lennard_jones(box=BOX_S, cutoff=CUT)
KT_S = 0.7
vs0 = jnp.sqrt(KT_S) * jax.random.normal(jax.random.PRNGKey(3),
                                         slab0.shape)
EQ_S = 12_000 if FULL else 5_000
PR_S = 20_000 if FULL else 6_000
sst, _ = md.baoab(dense_slab, slab0, vs0, jax.random.PRNGKey(4), dt=DT,
                  n_steps=EQ_S, friction=GAMMA, kT=KT_S)
sst, (sx, sv) = md.baoab(dense_slab, sst.x, sst.v, jax.random.PRNGKey(5),
                         dt=DT, n_steps=PR_S, friction=GAMMA, kT=KT_S,
                         collect_every=10, collect_v=True)
slab_diag = jax.lax.map(
    lambda xv: observables.pressure_tensor_diag(
        lambda b: potentials.lennard_jones(box=b, cutoff=CUT),
        xv[0], box=BOX_S, v=xv[1]),
    (sx, sv), batch_size=64)
gamma_slab = float(observables.surface_tension(slab_diag, box=BOX_S))

idx_b = jnp.arange(0, n_frames, max(n_frames // 384, 1))
bulk_diag = jax.lax.map(
    lambda xv: observables.pressure_tensor_diag(
        pfb, xv[0], box=[L] * 3, v=xv[1]),
    (frames_x[idx_b], frames_v[idx_b]), batch_size=64)
gamma_bulk = float(observables.surface_tension(bulk_diag, box=[L] * 3))
print(f"surface tension: slab gamma* = {gamma_slab:.3f}, "
      f"bulk control = {gamma_bulk:.3f}")
assert gamma_slab > 0.25, gamma_slab
assert abs(gamma_bulk) < 0.5 * gamma_slab, (gamma_bulk, gamma_slab)

print("OK")
