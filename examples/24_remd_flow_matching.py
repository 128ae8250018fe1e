"""REMD + flow matching: a continuous-time Boltzmann generator.

Composes this round's two newest capabilities into the library's core
workflow (trainable generative models for molecular sampling, the
reference's purpose — /root/reference/vaemolsim/mcmc.py pairs its VAE
with Metropolis MC the same way):

1. **Replica-exchange MD** (`vaemolsim_tpu.parallel.remd`) equilibrates
   a tilted double well whose 8 kT barrier traps plain Langevin
   dynamics — the temperature ladder, not the cold dynamics, carries
   walkers between wells.
2. **Flow matching** (`vaemolsim_tpu.flows.FlowMatching`) trains a
   continuous normalizing flow on the cold-rung samples by
   simulation-free CFM regression — one MLP evaluation per sample, no
   ODE solves during training.
3. The trained CNF is validated as a *Boltzmann generator*: its sample
   well populations match the exact quadrature Boltzmann weights, and
   as a Metropolized independence proposal against the true potential
   it mixes with high acceptance — including proposing well-to-well
   jumps the local dynamics cannot make.

Validations (all against analytic/quadrature ground truth):
- REMD cold rung populates both wells; a plain-MD control stays stuck.
- CNF sample right-well fraction matches the quadrature p_R.
- Flow-MCMC acceptance > 0.3 and the refined <x> matches quadrature.

Run:  python examples/24_remd_flow_matching.py [--full]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vaemolsim_tpu import md, train
from vaemolsim_tpu.flows import FlowMatching
from vaemolsim_tpu.parallel import (REMDState, make_remd_step, run_remd,
                                    temperature_ladder)

FULL = "--full" in sys.argv
N_WALK = 128 if FULL else 48
N_ROUNDS = 1200 if FULL else 500
N_EPOCHS = 600 if FULL else 300
HIDDEN = (128, 128) if FULL else (96, 96)

H, TILT = 8.0, 0.5  # barrier height, left/right asymmetry (kT units)


def energy_xy(q):
    """U(x, y) = H (x^2-1)^2 + TILT x + 2 y^2 on flat (..., 2) events."""
    x, y = q[..., 0], q[..., 1]
    return H * (x * x - 1.0) ** 2 + TILT * x + 2.0 * y * y


def potential(conf):
    """potentials-contract wrapper: (..., 1, 2) -> (...)."""
    return energy_xy(conf[..., 0, :])


def quadrature_truth():
    """Exact p(right well) and <x> by 1-D quadrature (y separates)."""
    xs = np.linspace(-3.0, 3.0, 20001)
    w = np.exp(-(H * (xs * xs - 1.0) ** 2 + TILT * xs))
    w /= w.sum()
    return float(w[xs > 0].sum()), float((w * xs).sum())


def main():
    p_right_true, mean_x_true = quadrature_truth()
    print(f"quadrature truth: p_right = {p_right_true:.4f}, "
          f"<x> = {mean_x_true:+.4f}")

    # ---- 1. REMD sampling (vs a stuck plain-MD control) ----
    betas = temperature_ladder(6, beta_min=0.15)
    x0 = -jnp.ones((6, N_WALK, 1, 2)) * jnp.array([1.0, 0.0])
    state = REMDState.create(potential, x0, betas, jax.random.PRNGKey(0))
    step = make_remd_step(potential, dt=0.01, friction=2.0,
                          md_steps_per_exchange=20)
    state, traj = run_remd(jax.jit(step), state, N_ROUNDS,
                           collect_every=5)
    burn = traj.shape[0] // 4
    cold = traj[burn:, 0].reshape(-1, 2)          # cold-rung samples
    frac_remd = float(jnp.mean(cold[:, 0] > 0))
    print(f"REMD: swap acc {float(state.swap_acceptance_rate):.2f}, "
          f"cold-rung p_right = {frac_remd:.3f} "
          f"({cold.shape[0]} samples)")

    ctrl, _ = md.baoab(potential, x0[0], jnp.zeros_like(x0[0]),
                       jax.random.PRNGKey(1), dt=0.01,
                       n_steps=20 * N_ROUNDS, friction=2.0, kT=1.0)
    frac_ctrl = float(jnp.mean(ctrl.x[:, 0, 0] > 0))
    print(f"plain-MD control: p_right = {frac_ctrl:.3f} (stuck)")
    assert abs(frac_remd - p_right_true) < 0.12
    assert frac_ctrl < 0.1

    # ---- 2. CFM training on the REMD data ----
    fm = FlowMatching.create(jax.random.PRNGKey(2), 2, hidden_dim=HIDDEN)
    loss_fn = lambda m, batch, key: m.loss(key, batch)
    fm, hist = train.fit(fm, loss_fn, cold, key=jax.random.PRNGKey(3),
                         num_epochs=N_EPOCHS, batch_size=1024,
                         learning_rate=2e-3, scan_epochs=True)
    print(f"CFM loss: {hist['loss'][0]:.3f} -> {hist['loss'][-1]:.3f}")

    # ---- 3a. generator statistics vs quadrature ----
    s = jax.jit(lambda k: fm.sample(k, (8192,), n_steps=64))(
        jax.random.PRNGKey(4))
    p_right_gen = float(jnp.mean(s[:, 0] > 0))
    print(f"CNF generator: p_right = {p_right_gen:.3f} "
          f"(truth {p_right_true:.3f})")
    assert abs(p_right_gen - p_right_true) < 0.1

    # ---- 3b. the CNF as a Metropolized independence proposal ----
    n_chains, n_prop = 1024, 60

    @jax.jit
    def flow_mcmc(key):
        k0, key = jax.random.split(key)
        cur, lq_cur = fm.sample_and_log_prob(k0, (n_chains,), n_steps=48)
        e_cur = -energy_xy(cur)

        def one(carry, k):
            cur, lq_cur, e_cur, acc = carry
            k1, k2 = jax.random.split(k)
            prop, lq_prop = fm.sample_and_log_prob(k1, (n_chains,),
                                                   n_steps=48)
            e_prop = -energy_xy(prop)
            log_a = (e_prop - e_cur) + (lq_cur - lq_prop)
            u = jnp.log(jax.random.uniform(k2, (n_chains,),
                                           minval=1e-38))
            take = log_a >= u
            cur = jnp.where(take[:, None], prop, cur)
            lq_cur = jnp.where(take, lq_prop, lq_cur)
            e_cur = jnp.where(take, e_prop, e_cur)
            return (cur, lq_cur, e_cur, acc + jnp.mean(take)), None

        (cur, *_, acc), _ = jax.lax.scan(
            one, (cur, lq_cur, e_cur, 0.0), jax.random.split(key, n_prop))
        return cur, acc / n_prop

    cur, acc = flow_mcmc(jax.random.PRNGKey(5))
    mean_x = float(jnp.mean(cur[:, 0]))
    print(f"flow-MCMC: acceptance {float(acc):.2f}, "
          f"<x> = {mean_x:+.4f} (truth {mean_x_true:+.4f})")
    assert float(acc) > 0.3, "CNF proposal overlaps poorly"
    assert abs(mean_x - mean_x_true) < 0.15
    print("OK")


if __name__ == "__main__":
    main()
