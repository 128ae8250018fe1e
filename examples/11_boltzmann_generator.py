"""Boltzmann generator: train a flow against the POTENTIAL (reverse KL),
no simulation data needed — then validate against HMC and use the flow
as an MC independence proposal.

The modern flagship molecular-ML workflow (Noe et al., Science 2019)
assembled purely from framework parts, all as compiled XLA programs:

1. first-party force field (potentials: bonds + angles + a BIMODAL
   n=2 torsion + LJ),
2. ground truth by tuned HMC in Cartesian coordinates (mcmc.moves),
3. a RQS-spline MAF over BAT internal coordinates (flows + coords),
   trained the canonical two-stage way: maximum likelihood on the HMC
   trajectory (density estimation — MAF's fast direction), then
   REVERSE-KL fine-tuning straight against the potential: minimize
   E_q[log q(bat) + beta U(x(bat)) - log |J_bat->cart|] — gradients
   flow through sampling, the NeRF reconstruction, and the potential
   in one jitted step (train.fit),
4. validation: reweighted observables vs HMC, and the trained flow as
   a Metropolized independence proposal whose acceptance measures
   distribution overlap.

The BAT volume element is log|J| = log b_1 + sum_{i>=3} (2 log r_i +
log sin theta_i) (canonical frame: atom 1 contributes 1, atom 2
contributes b_1, placed atoms r^2 sin theta).

Run:  python examples/11_boltzmann_generator.py [--full]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vaemolsim_tpu.coords import (bat_from_cartesian, cartesian_from_bat,
                                  chain_zmatrix)
from vaemolsim_tpu.flows import RQSSplineMAF
from vaemolsim_tpu.mcmc import MCMCState, make_hmc_step, run_mcmc, tune_scale
from vaemolsim_tpu.ops import bijectors as b
from vaemolsim_tpu.ops import distributions as d
from vaemolsim_tpu.potentials import (as_log_prob, composite,
                                      exclusions_from_bonds, harmonic_angles,
                                      harmonic_bonds, lennard_jones,
                                      minimize_energy, periodic_torsions)
from vaemolsim_tpu.train import fit

FULL = "--full" in sys.argv
N_CHAINS = 2048 if FULL else 512
HMC_STEPS = 1500 if FULL else 500
MLE_EPOCHS = 30 if FULL else 10
RKL_EPOCHS = 20 if FULL else 5
STEPS_PER_EPOCH = 50 if FULL else 15
BATCH = 1024 if FULL else 512

A = 5                                   # atoms in the chain
N_BONDS, N_ANGLES, N_TORS = A - 1, A - 2, A - 3
ZMAT = chain_zmatrix(A)
BONDS = [[i, i + 1] for i in range(A - 1)]
ANGLES = [[i, i + 1, i + 2] for i in range(A - 2)]
TORSIONS = [[i, i + 1, i + 2, i + 3] for i in range(A - 3)]


def make_force_field():
    return composite(
        harmonic_bonds(BONDS, k=200.0, r0=1.0),
        harmonic_angles(ANGLES, k=20.0, theta0=1.9),
        # Bimodal torsion: U = k (1 + cos 2 phi), minima at +- pi/2 —
        # the two-well landscape generators exist to handle.
        periodic_torsions(TORSIONS, k=1.5, n=2, phase=0.0),
        lennard_jones(sigma=0.8, epsilon=0.3,
                      exclude=exclusions_from_bonds(A, BONDS)),
    )


def log_jac_bat(bonds, angles):
    """log |d cart / d bat| in the canonical frame."""
    return (jnp.log(bonds[..., 1])
            + jnp.sum(2.0 * jnp.log(bonds[..., 2:]), axis=-1)
            + jnp.sum(jnp.log(jnp.sin(angles[..., 1:])), axis=-1))


def split_bat(bat):
    return (bat[..., :N_BONDS],
            bat[..., N_BONDS:N_BONDS + N_ANGLES],
            bat[..., N_BONDS + N_ANGLES:])


def make_q(flow):
    """Physical-space distribution: Uniform(-1,1)^9 base -> spline MAF
    (bin range [-1,1] keeps samples in the box) -> per-DOF affine map to
    the physical intervals."""
    base = d.Independent(
        d.Uniform(jnp.full(N_BONDS + N_ANGLES + N_TORS, -1.0),
                  jnp.full(N_BONDS + N_ANGLES + N_TORS, 1.0)), 1)
    # Wide domains (~7 thermal sigmas for bonds/angles): MLE data must
    # never fall outside, or the Uniform base log_prob is -inf.
    domains = ([(0.5, 1.5)] * N_BONDS
               + [(0.8, 3.0)] * N_ANGLES
               + [(-np.pi, np.pi)] * N_TORS)
    to_phys = b.Block(
        b.make_domain_transform(domains, from_target=True), 1)
    return d.TransformedDistribution(flow(base), to_phys)


def main():
    ff = make_force_field()
    lp_cart = as_log_prob(ff)

    # --- ground truth: tuned HMC in Cartesian ---
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (N_CHAINS, A, 3))
    x0 = x0.at[:, :, 0].add(jnp.arange(A) * 1.0)  # rough chain layout
    x0 = minimize_energy(ff, x0, steps=1000, lr=0.05)
    st = MCMCState.create(x0, lp_cart(x0), jax.random.PRNGKey(1))
    eps, st = tune_scale(lp_cart, st, kind="hmc", init_scale=0.02,
                         n_leapfrog=8)
    step = make_hmc_step(lp_cart, step_size=eps, n_leapfrog=8)
    st, traj = jax.jit(lambda s: run_mcmc(step, s, HMC_STEPS,
                                          collect_every=10))(st)
    _, _, tors_md = bat_from_cartesian(st.configs, ZMAT)
    obs_md = float(jnp.mean(jnp.cos(2.0 * tors_md)))
    print(f"HMC: acc {float(st.acceptance_rate):.2f}, "
          f"<cos 2phi> = {obs_md:+.4f}")

    # --- stage 1: maximum likelihood on the HMC trajectory ---
    b_md, a_md, t_md = bat_from_cartesian(
        traj.reshape(-1, A, 3), ZMAT)
    bat_data = jnp.concatenate([b_md, a_md, t_md], axis=-1)
    # Clip the (rare) >7-sigma excursions inside the transform domains.
    lo = jnp.asarray([0.5] * N_BONDS + [0.8] * N_ANGLES
                     + [-np.pi] * N_TORS)
    hi = jnp.asarray([1.5] * N_BONDS + [3.0] * N_ANGLES
                     + [np.pi] * N_TORS)
    bat_data = jnp.clip(bat_data, lo + 1e-3, hi - 1e-3)

    flow = RQSSplineMAF.create(
        jax.random.PRNGKey(2), N_BONDS + N_ANGLES + N_TORS, num_blocks=3,
        rqs_params={"num_bins": 12, "hidden_dim": 64,
                    "bin_range": [-1.0, 1.0]})

    def mle_loss(flow, batch, key):
        del key
        return -jnp.mean(make_q(flow).log_prob(batch))

    flow, hist = fit(flow, mle_loss, bat_data, key=jax.random.PRNGKey(3),
                     num_epochs=MLE_EPOCHS, batch_size=1024,
                     scan_epochs=True)
    print(f"MLE pretrain on {bat_data.shape[0]} HMC frames: NLL "
          f"{hist['loss'][0]:.3f} -> {hist['loss'][-1]:.3f}")

    # --- stage 2: reverse-KL fine-tuning against the potential ---
    def rev_kl_loss(flow, batch, key):
        del batch
        q = make_q(flow)
        bat, lq = q.sample_and_log_prob(key, (BATCH,))
        bonds, angles, tors = split_bat(bat)
        x = cartesian_from_bat(bonds, angles, tors, ZMAT)
        log_target = -ff(x) + log_jac_bat(bonds, angles)
        return jnp.mean(lq - log_target)

    dummy = jnp.zeros((STEPS_PER_EPOCH, 1))  # 1 train step per "sample"
    flow, hist = fit(flow, rev_kl_loss, dummy, key=jax.random.PRNGKey(13),
                     num_epochs=RKL_EPOCHS, batch_size=1, shuffle=False,
                     learning_rate=2e-4, scan_epochs=True)
    print(f"reverse-KL fine-tune: {hist['loss'][0]:.3f} -> "
          f"{hist['loss'][-1]:.3f} (per-sample KL up to ln Z)")

    # --- validation 1: importance-reweighted observable vs HMC ---
    q = make_q(flow)
    bat, lq = q.sample_and_log_prob(jax.random.PRNGKey(4), (8192,))
    bonds, angles, tors = split_bat(bat)
    x = cartesian_from_bat(bonds, angles, tors, ZMAT)
    logw = (-ff(x) + log_jac_bat(bonds, angles)) - lq
    logw = logw - jax.scipy.special.logsumexp(logw)
    w = jnp.exp(logw)
    ess = float(1.0 / jnp.sum(w ** 2))
    obs_q = float(jnp.sum(w * jnp.mean(jnp.cos(2.0 * tors), axis=-1)))
    print(f"flow (reweighted): <cos 2phi> = {obs_q:+.4f} "
          f"(HMC {obs_md:+.4f}); IS ESS {ess:.0f} of 8192")

    # --- validation 2: the flow as a Metropolized independence
    #     proposal in BAT space (acceptance == overlap quality) ---
    def lp_bat(bat):
        bonds, angles, tors = split_bat(bat)
        x = cartesian_from_bat(bonds, angles, tors, ZMAT)
        return -ff(x) + log_jac_bat(bonds, angles)

    n_prop = 2000 if FULL else 500
    cur, lq_cur = q.sample_and_log_prob(jax.random.PRNGKey(5), (1024,))
    e_cur = lp_bat(cur)

    @jax.jit
    def flow_mcmc(cur, lq_cur, e_cur, key):
        def one(carry, k):
            cur, lq_cur, e_cur, acc = carry
            k1, k2 = jax.random.split(k)
            prop, lq_prop = q.sample_and_log_prob(k1, (1024,))
            e_prop = lp_bat(prop)
            log_a = (e_prop - e_cur) + (lq_cur - lq_prop)
            u = jnp.log(jax.random.uniform(k2, (1024,), minval=1e-38))
            take = log_a >= u
            cur = jnp.where(take[:, None], prop, cur)
            lq_cur = jnp.where(take, lq_prop, lq_cur)
            e_cur = jnp.where(take, e_prop, e_cur)
            return (cur, lq_cur, e_cur, acc + jnp.mean(take)), None

        (cur, lq_cur, e_cur, acc), _ = jax.lax.scan(
            one, (cur, lq_cur, e_cur, 0.0),
            jax.random.split(key, n_prop))
        return cur, acc / n_prop

    cur, acc = flow_mcmc(cur, lq_cur, e_cur, jax.random.PRNGKey(6))
    _, _, tors_f = split_bat(cur)
    obs_f = float(jnp.mean(jnp.cos(2.0 * tors_f)))
    # Both torsion wells must be populated (the point of a generator).
    frac_pos = float(jnp.mean(tors_f > 0))
    print(f"flow-MCMC: acceptance {float(acc):.2f}, "
          f"<cos 2phi> = {obs_f:+.4f}, well balance {frac_pos:.2f}")

    assert float(acc) > 0.2, "flow proposal overlaps poorly"
    assert 0.2 < frac_pos < 0.8, "generator collapsed to one well"
    assert abs(obs_q - obs_md) < 0.08, (obs_q, obs_md)
    assert abs(obs_f - obs_md) < 0.08, (obs_f, obs_md)
    print("Boltzmann-generator workflow OK")


if __name__ == "__main__":
    main()
