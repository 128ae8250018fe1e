"""Molten salt with EXACT electrostatics — the large-N Ewald split.

Beyond-reference capability: a charged ionic fluid (a restricted
primitive/NaCl-like model) simulated with the framework's exact Ewald
electrostatics, decomposed for scale:

- the erfc REAL-SPACE pair term rides the O(N * capacity) cell-list
  path (fused Pallas kernel on TPU) together with the LJ core,
- the reciprocal sum is recip-only ``ewald_coulomb``
  (``include_real_space=False``) — one matmul of structure factors,
- the split total is the exact Ewald sum (pinned in tests; asserted
  here against the dense reference at the CI scale).

Workflow: build the split potential -> BAOAB Langevin MD -> validate
charge ordering via the opposite- vs like-charge pair distributions
(in a molten salt the nearest-neighbor shell of an ion is ALWAYS
counter-charged).

Run:  python examples/15_molten_salt.py [--full]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vaemolsim_tpu.md import baoab_neighbor, temperature
from vaemolsim_tpu.potentials import (composite, ewald_coulomb,
                                      lennard_jones,
                                      lennard_jones_cell_neighbor)

FULL = "--full" in sys.argv
M_LAT = 12 if FULL else 8               # even rock-salt lattice edge
N_IONS = M_LAT ** 3                     # half +q, half -q exactly
RHO = 0.35
Q = 1.5
KT = 1.0  # coupling Gamma = Q^2/(kT a) ~ 2: clear charge ordering
CUTOFF, SKIN = 2.5, 0.4
MD_STEPS = 20_000 if FULL else 600
EW_TOL = 1e-5 if FULL else 1e-4
BACKEND = "pallas" if jax.default_backend() == "tpu" else "xla"


def main():
    L = float((N_IONS / RHO) ** (1.0 / 3.0))
    # Rock-salt seed: charge = site parity (even lattice edge -> exactly
    # neutral), positions scaled to the target density.
    g = np.stack(np.meshgrid(*[np.arange(M_LAT)] * 3, indexing="ij"),
                 -1).reshape(-1, 3)
    q = np.where(g.sum(-1) % 2 == 0, Q, -Q)
    x0 = jnp.asarray(g * (L / M_LAT), jnp.float32)

    recip = ewald_coulomb(q, box=[L] * 3, r_cutoff=CUTOFF,
                          tolerance=EW_TOL, include_real_space=False)
    build, cell_e = lennard_jones_cell_neighbor(
        box=[L] * 3, cutoff=CUTOFF, skin=SKIN, capacity=32,
        backend=BACKEND, charges=q, coulomb_alpha=recip.ewald_alpha)

    # Split-exactness sanity at the start configuration.
    dense_total = composite(
        lennard_jones(box=[L] * 3, cutoff=CUTOFF),
        ewald_coulomb(q, box=[L] * 3, r_cutoff=CUTOFF,
                      tolerance=EW_TOL))
    e_split = float(cell_e(build(x0), x0) + recip(x0))
    e_dense = float(dense_total(x0))
    assert abs(e_split - e_dense) <= 1e-4 * abs(e_dense) + 1e-3
    print(f"split Ewald == dense Ewald at t=0: {e_split:.3f}")

    # Run MD with the neighbor-aware integrator: energy(nl, x) + recip
    # (the reciprocal part is neighbor-list-free).
    def energy_nl(nl, x):
        return cell_e(nl, x) + recip(x)

    v0 = jnp.sqrt(KT) * jax.random.normal(jax.random.PRNGKey(0), x0.shape)
    st, _ = jax.jit(lambda x, v, k: baoab_neighbor(
        build, energy_nl, x, v, k, dt=0.002, n_steps=MD_STEPS,
        rebuild_every=8, friction=2.0, kT=KT))(x0, v0,
                                               jax.random.PRNGKey(1))
    assert bool(jnp.isfinite(st.x).all()), "MD blew up"
    print(f"after {MD_STEPS} BAOAB steps: kT = {float(temperature(st.v)):.3f}")

    # Charge ordering: nearest-image neighbor shells.
    xw = st.x - L * jnp.floor(st.x / L)
    d = xw[:, None, :] - xw[None, :, :]
    d = d - L * jnp.round(d / L)
    r = np.array(jnp.sqrt(jnp.maximum(jnp.sum(d * d, -1), 1e-12)))
    same = (q[:, None] * q[None, :]) > 0
    np.fill_diagonal(r, np.inf)
    shell = r < 1.6                                # first shell
    n_opp = int((shell & ~same).sum())
    n_same = int((shell & same).sum())
    print(f"first-shell contacts: opposite-charge {n_opp}, "
          f"like-charge {n_same}")
    assert n_opp > 1.5 * max(n_same, 1), "no charge ordering — wrong physics"
    print("molten-salt charge ordering confirmed: OK")


if __name__ == "__main__":
    main()
