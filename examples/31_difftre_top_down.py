"""Top-down potential fitting with differentiable trajectory
reweighting (DiffTRe).

The inverse problem bottom-up force matching (example 18) cannot
touch: given only ENSEMBLE observables of a reference system — its
radial distribution function and virial pressure, the kind of targets
experiments provide — fit the parameters of an interaction potential
so that simulations OF THE FITTED POTENTIAL reproduce them.

:func:`vaemolsim_tpu.difftre.difftre_fit` (Thaler & Zavadlav 2021)
makes this a gradient problem without ever differentiating through the
MD integrator: each outer round samples a fresh trajectory at the
current parameters (plain ``md.baoab``, warm-started), then takes
reweighted gradient steps until the effective sample size decays.  The
gradient at the sampling point carries the full fluctuation term
``-beta Cov(O, dU/dtheta)`` (pinned exactly in tests/test_difftre.py).

Here the "experiment" is an LJ fluid at (epsilon*, sigma*) = (1, 1);
the model starts at epsilon = 0.6, sigma = 1.12 and must recover both
from the RDF bins (a parameter-INdependent vector observable — marked
``static_observable``, cached per trajectory) plus the virial pressure
(parameter-DEPENDENT: its gradient exercises the explicit dO/dtheta
path through :func:`observables.virial_pressure`).

Run:  python examples/31_difftre_top_down.py [--full]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vaemolsim_tpu import difftre, md, observables, potentials

FULL = "--full" in sys.argv
N = 16
RHO = 0.65
KT = 0.85                        # liquid-like: attraction shapes g(r)
BETA = 1.0 / KT
CUT = 2.2
N_OUTER = 14 if FULL else 10
INNER = 25 if FULL else 20
CHAINS = 24
COLLECT = 25                     # frames every 25 MD steps
MD_STEPS = 1000 if FULL else 600
BOX = (N / RHO) ** (1.0 / 3.0)
N_BINS = 24
R_MAX = BOX / 2.0


def make_pot(params):
    return potentials.lennard_jones(
        sigma=jnp.exp(params["log_sigma"]),
        epsilon=jnp.exp(params["log_eps"]),
        box=jnp.full((3,), BOX), cutoff=CUT)


def potential(params, frames):
    return make_pot(params)(frames)


_edges = jnp.linspace(0.0, R_MAX, N_BINS + 1)
_shell = (4.0 / 3.0) * jnp.pi * (_edges[1:] ** 3 - _edges[:-1] ** 3)
_rho_pairs = N * (N - 1) / 2.0 / BOX ** 3


def frame_rdf(frames):
    """Per-frame g(r) bins (n, N_BINS): minimum-image pair distances
    binned by broadcast comparison (one boolean contraction, no
    scatter), normalized by the ideal-shell expectation."""
    d = frames[..., :, None, :] - frames[..., None, :, :]
    d = d - BOX * jnp.round(d / BOX)
    r = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 1e-12))
    triu = jnp.triu(jnp.ones((N, N), bool), k=1)
    ind = ((r[..., None] >= _edges[:-1]) & (r[..., None] < _edges[1:])
           & triu[..., None])
    counts = jnp.sum(ind, axis=(-3, -2)).astype(jnp.float32)
    return counts / (_rho_pairs * _shell)


def frame_pressure(params, frames):
    pfb = lambda b: potentials.lennard_jones(
        sigma=jnp.exp(params["log_sigma"]),
        epsilon=jnp.exp(params["log_eps"]), box=b, cutoff=CUT)
    return observables.virial_pressure(pfb, frames, box=jnp.full((3,), BOX),
                                       kt=KT)


def main():
    box = jnp.full((3,), BOX)
    true_params = {"log_eps": jnp.asarray(0.0),
                   "log_sigma": jnp.asarray(0.0)}
    true_pot = make_pot(true_params)

    # --- the "experiment": long reference run at the true potential ---
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x0 = BOX * jax.random.uniform(k1, (32, N, 3))
    x0 = potentials.minimize_energy(true_pot, x0, steps=300, lr=0.05)
    _, traj = jax.jit(lambda x, k: md.baoab(
        true_pot, x, jnp.zeros_like(x), k, dt=0.003,
        n_steps=3000, friction=1.0, kT=KT, collect_every=100))(x0, k2)
    ref = traj[10:].reshape(-1, N, 3)           # discard burn-in
    g_target = jnp.mean(frame_rdf(ref), axis=0)
    p_target = float(jnp.mean(frame_pressure(true_params, ref)))
    print(f"reference ensemble: {ref.shape[0]} frames, P = "
          f"{p_target:.3f}, g(r) peak {float(jnp.max(g_target)):.2f}")

    # --- DiffTRe fit from deliberately wrong parameters ---
    params = {"log_eps": jnp.log(jnp.asarray(0.6)),
              "log_sigma": jnp.log(jnp.asarray(1.12))}

    x_warm = potentials.minimize_energy(
        make_pot(params),
        BOX * jax.random.uniform(jax.random.PRNGKey(3), (CHAINS, N, 3)),
        steps=300, lr=0.05)

    @jax.jit
    def run_md(params, x0, key):
        st, traj = md.baoab(make_pot(params), x0, jnp.zeros_like(x0),
                            key, dt=0.003, n_steps=MD_STEPS,
                            friction=1.0, kT=KT,
                            collect_every=COLLECT)
        traj = traj[traj.shape[0] // 3:]   # re-equilibration discard
        return traj.reshape(-1, N, 3), st.x

    def sample_fn(params, key, state):
        x0 = state if state is not None else x_warm
        return run_md(params, x0, key)

    res = difftre.difftre_fit(
        potential, params,
        sample_fn=sample_fn,
        observable_fns={"rdf": difftre.static_observable(frame_rdf),
                        "pressure": frame_pressure},
        targets={"rdf": g_target, "pressure": p_target},
        # The RDF pins sigma hard but is famously soft along epsilon at
        # fixed structure (representability); the pressure target is
        # what identifies epsilon — weight it accordingly.
        weights={"rdf": 1.0, "pressure": 1.0},
        beta=BETA, key=jax.random.PRNGKey(4),
        n_outer=N_OUTER, inner_steps=INNER, ess_frac=0.4,
        learning_rate=0.05)

    eps = float(jnp.exp(res.params["log_eps"]))
    sig = float(jnp.exp(res.params["log_sigma"]))
    for i, (l, s, e) in enumerate(zip(res.history["loss"],
                                      res.history["inner_steps"],
                                      res.history["ess_end"])):
        print(f"  outer {i}: fresh loss {l:.4f}, inner steps {s}, "
              f"ESS at stop {e:.0f}")
    print(f"fitted epsilon {eps:.3f} (true 1.0), sigma {sig:.3f} "
          f"(true 1.0)")

    # --- validate: simulate the FITTED potential, compare structure ---
    frames_fit, _ = run_md(res.params, x_warm, jax.random.PRNGKey(5))
    g_fit = jnp.mean(frame_rdf(frames_fit), axis=0)
    p_fit = float(jnp.mean(frame_pressure(res.params, frames_fit)))
    sel = np.asarray(0.5 * (_edges[:-1] + _edges[1:])) > 0.85
    g_err = float(jnp.max(jnp.abs(g_fit - g_target)[sel]))
    print(f"fitted-potential ensemble: P = {p_fit:.3f} (target "
          f"{p_target:.3f}), max |dg| = {g_err:.3f}")

    assert abs(eps - 1.0) < 0.2, eps
    assert abs(sig - 1.0) < 0.05, sig
    assert res.history["loss"][-1] < 0.1 * res.history["loss"][0]
    assert g_err < 0.35, g_err
    print("OK")


if __name__ == "__main__":
    main()
