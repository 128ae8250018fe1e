"""Gibbs-ensemble MC: vapor-liquid coexistence of the LJ fluid.

Two coupled boxes exchange volume and particles at fixed total N, V, T
(Panagiotopoulos 1987) — below the critical point they spontaneously
specialize into vapor and liquid WITHOUT ever building an interface,
and their densities are the coexistence curve.  `mcmc.gibbs` runs
hundreds of independent coexistence estimates as one compiled scan
(capacity-masked slot arrays, O(n_max) transfers).

Validation — all through independent framework estimators:
1. the boxes phase-separate (liquid/vapor density ratio >> 1) across
   the chain ensemble,
2. thermodynamic consistency: the chemical potential measured by Widom
   insertion (per-chain boxes, via the capacity-masked single-particle
   energy primitive) must AGREE between the vapor and liquid boxes —
   mu_vap = mu_liq is the defining coexistence condition, and neither
   value was an input to the simulation.

Run:  python examples/21_gibbs_coexistence.py [--full]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vaemolsim_tpu.mcmc import (gibbs_init, lj_pair_u, make_gibbs_step,
                                run_gibbs)

FULL = "--full" in sys.argv
KT = 0.95                   # subcritical (truncated-shifted rc=2.5 LJ)
CUTOFF = 2.5
N_TOT = 96                  # particles shared by the two boxes
N_MAX = 88                  # per-box capacity
L0 = 6.2                    # initial edge of each (equal) box
N_CHAINS = 96 if FULL else 48
SWEEPS = 8000 if FULL else 3000


def main():
    pair = lj_pair_u(cutoff=CUTOFF)
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    half = N_TOT // 2
    x_a = L0 * jax.random.uniform(ks[0], (N_CHAINS, N_MAX, 3))
    x_b = L0 * jax.random.uniform(ks[1], (N_CHAINS, N_MAX, 3))
    act = jnp.broadcast_to(jnp.arange(N_MAX)[None, :] < half,
                           (N_CHAINS, N_MAX))
    st = gibbs_init(x_a, act, x_b, act, L0, L0, ks[2])

    step = make_gibbs_step(pair, beta=1.0 / KT, dx_scale=0.25,
                           dlnv_scale=0.03, n_disp=6, min_box=2 * CUTOFF)
    print(f"Gibbs ensemble: N={N_TOT}, T*={KT}, {N_CHAINS} chains x "
          f"{SWEEPS} sweeps (one compiled scan)")
    st, rhos = jax.jit(lambda s: run_gibbs(step, s, SWEEPS,
                                           collect_every=20))(st)
    print(f"acceptance: transfer {float(st.xfer_acceptance_rate):.3f}, "
          f"volume {float(st.vol_acceptance_rate):.3f}, "
          f"displacement {float(st.disp_acceptance_rate):.3f}")

    tail = rhos[0].shape[0] // 3
    r_a = np.asarray(rhos[0][-tail:]).mean(axis=0)    # (C,)
    r_b = np.asarray(rhos[1][-tail:]).mean(axis=0)
    rho_liq = np.maximum(r_a, r_b)
    rho_vap = np.minimum(r_a, r_b)
    # median across chains: robust to stragglers still demixing
    rl, rv = float(np.median(rho_liq)), float(np.median(rho_vap))
    print(f"coexistence densities: rho_liq = {rl:.3f}, "
          f"rho_vap = {rv:.4f} (ratio {rl / max(rv, 1e-6):.1f})")
    assert rl / max(rv, 1e-6) > 5.0, "boxes must phase-separate"
    assert rl > 0.45 and rv < 0.2

    # --- equal chemical potential across the phases (Widom) ---
    # pick chains whose liquid box is A (relabel so A=liquid), take the
    # modal particle counts for fixed-N dense evaluation
    a_is_liq = r_a >= r_b
    x_liq = np.where(a_is_liq[:, None, None], np.asarray(st.x_a),
                     np.asarray(st.x_b))
    x_vap = np.where(a_is_liq[:, None, None], np.asarray(st.x_b),
                     np.asarray(st.x_a))
    act_liq = np.where(a_is_liq[:, None], np.asarray(st.act_a),
                       np.asarray(st.act_b))
    act_vap = np.where(a_is_liq[:, None], np.asarray(st.act_b),
                       np.asarray(st.act_a))
    box_liq = np.where(a_is_liq, np.asarray(st.box_a),
                       np.asarray(st.box_b))
    box_vap = np.where(a_is_liq, np.asarray(st.box_b),
                       np.asarray(st.box_a))

    def mu_of_phase(x, act, box, label, seed):
        """Widom insertion with per-chain boxes via the capacity-masked
        single-particle energy primitive (exact for every chain's own
        geometry — no common-box rescaling)."""
        from vaemolsim_tpu.mcmc.gcmc import _one_particle_energy

        x, act = jnp.asarray(x), jnp.asarray(act)
        box_j = jnp.asarray(box, x.dtype)
        n_ins = 4000 // N_CHAINS
        kpos = jax.random.uniform(jax.random.PRNGKey(seed),
                                  (n_ins, N_CHAINS, 3))
        pos = kpos * box_j[None, :, None]
        no_excl = jnp.full((n_ins, N_CHAINS), N_MAX, jnp.int32)
        du = _one_particle_energy(
            pair, x[None], act[None], pos,
            box_j[None, :, None, None], no_excl)          # (n_ins, C)
        w = np.asarray(jnp.exp(-du / KT)).ravel()
        mu_ex = -KT * np.log(w.mean())
        err = KT * w.std() / (w.mean() * np.sqrt(len(w)))
        rho = float((act.sum(axis=1) / box_j ** 3).mean())
        mu = KT * np.log(rho) + mu_ex
        print(f"  {label}: rho {rho:.4f}, mu_ex {mu_ex:+.3f} "
              f"+- {err:.3f}, mu {mu:+.3f}")
        return mu, err

    print("Widom chemical potentials per phase:")
    mu_l, e_l = mu_of_phase(x_liq, act_liq, box_liq, "liquid", 11)
    mu_v, e_v = mu_of_phase(x_vap, act_vap, box_vap, "vapor ", 12)
    tol = max(4.0 * (e_l ** 2 + e_v ** 2) ** 0.5, 0.4)
    print(f"mu_liq - mu_vap = {mu_l - mu_v:+.3f} (tol {tol:.2f})")
    assert abs(mu_l - mu_v) < tol, "coexisting phases must share mu"
    print("vapor-liquid coexistence established: OK")


if __name__ == "__main__":
    main()
