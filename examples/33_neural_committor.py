"""Learning the reaction coordinate: a neural committor from shooting
outcomes.

The committor ``q(x) = P(reach B before A | x)`` IS the reaction
coordinate — every rate theory and every good CV is an approximation
to it.  Following the likelihood-maximization idea of Peters & Trout
(2006), this example LEARNS it for the Muller-Brown A -> C transition,
where no closed form exists:

1. :mod:`vaemolsim_tpu.mcmc.tps` harvests unbiased reactive paths
   (example 32's machinery) — the only known way to get training
   configurations concentrated in the transition tube of a 15 kT
   barrier without a reaction coordinate,
2. :func:`mcmc.first_hitting_committor` labels pooled path frames with
   Monte Carlo committor estimates (fleeting-trajectory shooting, all
   configs x shots as ONE batched BAOAB scan),
3. a small MLP trains on the per-shot binomial likelihood
   (cross-entropy against the MC label, weighted by resolved shots),
4. validation: held-out MC labels (MAE + rank correlation), the
   physics anchor — the NEB saddle must sit on the learned q = 1/2
   isosurface — and the learned coordinate must order basin-A, saddle,
   basin-C configs monotonically.

Run:  python examples/33_neural_committor.py [--full]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vaemolsim_tpu import paths
from vaemolsim_tpu.mcmc import (first_hitting_committor, make_tps_step,
                                run_tps, tps_init)
from vaemolsim_tpu.nn.core import MLP
from vaemolsim_tpu.potentials import minimize_energy

FULL = "--full" in sys.argv
KT = 7.0
DT = 0.004
FRICTION = 2.0
N_FRAMES = 401
N_WALKERS = 24
N_CONFIGS = 768 if FULL else 512
N_SHOTS = 16 if FULL else 12
MAX_STEPS = 1000
TRAIN_STEPS = 1500 if FULL else 900

# Muller-Brown constants (Muller & Brown 1979).
_A = jnp.array([-200.0, -100.0, -170.0, 15.0])
_a = jnp.array([-1.0, -1.0, -6.5, 0.7])
_b = jnp.array([0.0, 0.0, 11.0, 0.6])
_c = jnp.array([-10.0, -10.0, -6.5, 0.7])
_X0 = jnp.array([1.0, 0.0, -0.5, -1.0])
_Y0 = jnp.array([0.0, 0.5, 1.5, 1.0])


def potential(conf):
    px, py = conf[..., 0, 0], conf[..., 0, 1]
    dx = px[..., None] - _X0
    dy = py[..., None] - _Y0
    return jnp.sum(_A * jnp.exp(_a * dx * dx + _b * dx * dy
                                + _c * dy * dy), axis=-1)


def main():
    ma = minimize_energy(potential, jnp.array([[[-0.558, 1.442]]]),
                         steps=2000, lr=0.005)[0]
    mc = minimize_energy(potential, jnp.array([[[0.623, 0.028]]]),
                         steps=2000, lr=0.005)[0]
    res = paths.climbing_neb(potential, paths.interpolate_path(
        ma, mc, 24), n_steps=3000, k_spring=50.0, dt=0.002,
        climb_after=500)
    saddle = res.saddle
    in_a = lambda x: jnp.sum((x[..., 0, :] - ma[0]) ** 2, -1) < 0.35 ** 2
    in_b = lambda x: jnp.sum((x[..., 0, :] - mc[0]) ** 2, -1) < 0.35 ** 2

    # --- 1. transition-tube configurations from TPS ---
    t_img = jnp.linspace(0.0, 1.0, res.path.shape[0])
    t_frm = jnp.linspace(0.0, 1.0, N_FRAMES)
    seed_xy = jnp.stack([jnp.interp(t_frm, t_img, res.path[:, 0, k])
                         for k in range(2)], axis=-1)
    state = tps_init(jnp.tile(seed_xy[None, :, None, :],
                              (N_WALKERS, 1, 1, 1)),
                     key=jax.random.PRNGKey(0), kt=KT)
    step = make_tps_step(potential, in_a=in_a, in_b=in_b, dt=DT,
                         kt=KT, friction=FRICTION)
    state, _ = run_tps(step, state, jax.random.PRNGKey(1), 100)
    _, coll = run_tps(step, state, jax.random.PRNGKey(2), 100,
                      collect_every=10)
    frames = coll.reshape(-1, 1, 2)
    pick = jax.random.choice(jax.random.PRNGKey(3), frames.shape[0],
                             (N_CONFIGS,), replace=False)
    configs = frames[pick]
    print(f"pooled {N_CONFIGS} configs from "
          f"{coll.shape[0] * coll.shape[1]} TPS paths "
          f"(acceptance {float(jnp.mean(state.acceptance_rate)):.3f})")

    # --- 2. MC committor labels by fleeting shooting ---
    q_mc, unres = first_hitting_committor(
        potential, configs, in_a=in_a, in_b=in_b,
        key=jax.random.PRNGKey(4), n_shots=N_SHOTS,
        max_steps=MAX_STEPS, dt=DT, kt=KT, friction=FRICTION)
    n_eff = N_SHOTS * (1.0 - unres)
    print(f"labels: mean q {float(jnp.mean(q_mc)):.3f}, unresolved "
          f"{float(jnp.mean(unres)):.3f}")

    n_tr = int(0.8 * N_CONFIGS)
    xy = configs[:, 0, :]
    x_tr, q_tr, w_tr = xy[:n_tr], q_mc[:n_tr], n_eff[:n_tr]
    x_te, q_te, w_te = xy[n_tr:], q_mc[n_tr:], n_eff[n_tr:]

    # --- 3. train the committor net on the binomial likelihood ---
    net = MLP.create(jax.random.PRNGKey(5), 2, [64, 64], 1,
                     activation="tanh")
    opt = optax.adam(3e-3)
    ostate = opt.init(net)

    def loss_fn(m, x, q, w):
        logit = m(x)[:, 0]
        # per-shot binomial cross-entropy, resolved-shot weighted
        ce = (optax.sigmoid_binary_cross_entropy(logit, q) * w)
        return jnp.sum(ce) / jnp.sum(w)

    @jax.jit
    def train_step(m, s):
        l, g = jax.value_and_grad(loss_fn)(m, x_tr, q_tr, w_tr)
        up, s = opt.update(g, s)
        return optax.apply_updates(m, up), s, l

    for i in range(TRAIN_STEPS):
        net, ostate, l = train_step(net, ostate)
        if i % max(TRAIN_STEPS // 5, 1) == 0:
            print(f"  step {i:5d}  loss {float(l):.4f}")

    predict = lambda x: jax.nn.sigmoid(net(x)[:, 0])

    # --- 4. validation ---
    p_te = predict(x_te)
    mae = float(jnp.mean(jnp.abs(p_te - q_te)))
    corr = float(jnp.corrcoef(jnp.stack([p_te, q_te]))[0, 1])
    print(f"held-out: MAE {mae:.3f} (MC label noise "
          f"~{float(jnp.mean(jnp.sqrt(q_te * (1 - q_te) / w_te))):.3f}),"
          f" correlation {corr:.3f}")

    trio = jnp.stack([ma[0], saddle[0], mc[0]])
    p_trio = np.asarray(predict(trio))
    q_saddle_mc, _ = first_hitting_committor(
        potential, saddle[None], in_a=in_a, in_b=in_b,
        key=jax.random.PRNGKey(6), n_shots=256, max_steps=MAX_STEPS,
        dt=DT, kt=KT, friction=FRICTION)
    print(f"q at [min A, saddle, min C] = {np.round(p_trio, 3)}; "
          f"MC at saddle = {float(q_saddle_mc[0]):.3f}")

    assert corr > 0.85, corr
    assert mae < 0.15, mae
    assert p_trio[0] < 0.2 and p_trio[2] > 0.8        # basins anchored
    # The saddle sits on the learned dividing surface, and the net
    # agrees with a high-precision MC estimate there.
    assert 0.25 < p_trio[1] < 0.75, p_trio
    assert abs(p_trio[1] - float(q_saddle_mc[0])) < 0.2
    print("OK")


if __name__ == "__main__":
    main()
