"""Composable MC move sets: mix VAE proposals with local moves.

Production MC rarely runs a single move type: large nonlocal VAE jumps
(vaemolsim_tpu.mcmc.engine) mix best when alternated with cheap local
random-walk moves that relax within a basin (the reference only offers
pure VAE moves; this extends the capability).  All moves share the
``step(MCMCState) -> MCMCState`` contract, so mixtures drop into
``run_mcmc`` / checkpointing / sharding unchanged.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from vaemolsim_tpu.mcmc.engine import MCMCState, log_uniform

Array = jax.Array

__all__ = ["make_random_walk_step", "make_mala_step", "make_hmc_step",
           "mix_moves", "cycle_moves", "tune_scale"]


def _scaled_trial(kind: str, log_target_fn, x1, e1, scale, key,
                  n_leapfrog: int = 10):
    """One MH trial of a local-move family.  ``scale`` may be a Python
    float (production kernels — baked into the compiled step) or a
    traced value (the tuner adapts it inside one compiled scan).  The
    SINGLE implementation both paths share, so the tuned kernel is
    exactly the production kernel.

    Returns ``(x_new, e_new, accept)`` with per-chain accept decisions.

    Configurations may have ANY event rank — ``(chains, dof)`` flat or
    ``(chains, atoms, 3)`` molecular; the event axes are the trailing
    axes beyond the energy's shape.
    """
    k1, k2 = jax.random.split(key)
    xi = jax.random.normal(k1, x1.shape, x1.dtype)
    scale = jnp.asarray(scale, x1.dtype)
    event_axes = tuple(range(e1.ndim, x1.ndim))
    ev = (None,) * len(event_axes)
    if kind == "hmc" and n_leapfrog < 1:
        raise ValueError("n_leapfrog must be >= 1 (0 leapfrog steps is "
                         "the identity kernel: acceptance 1.0, no "
                         "movement, and a diverging tuner)")

    def lp_and_grad(x):
        # vjp gives per-chain energies AND gradients in one
        # forward+backward per proposal point (chains are independent,
        # so the ones-seeded cotangent IS the per-chain gradient).
        e, vjp = jax.vjp(log_target_fn, x)
        (g,) = vjp(jnp.ones_like(e))
        return e, g

    if kind == "random_walk":
        x2 = x1 + scale * xi
        e2 = log_target_fn(x2)
        log_acc = e2 - e1
    elif kind == "mala":
        _, g1 = lp_and_grad(x1)  # log pi(x1) already in state.energies
        x2 = x1 + scale * g1 + jnp.sqrt(2.0 * scale) * xi
        e2, g2 = lp_and_grad(x2)

        def log_q(x_to, x_from, g_from):
            mean = x_from + scale * g_from
            return -jnp.sum((x_to - mean) ** 2,
                            axis=event_axes) / (4.0 * scale)

        log_acc = (e2 - e1) + log_q(x1, x2, g2) - log_q(x2, x1, g1)
    elif kind == "hmc":
        # Leapfrog with identity mass: initial half kick, n_leapfrog
        # full (drift, kick) pairs, then back off the surplus half kick
        # — n_leapfrog + 1 grads total, fixed trip count (fori_loop).
        p1 = xi                                       # momenta ~ N(0, I)
        _, g1 = lp_and_grad(x1)

        def leap(_, carry):
            x, p, _, __ = carry
            x = x + scale * p
            e, g = lp_and_grad(x)
            return x, p + scale * g, e, g

        x2, p, e2, g2 = jax.lax.fori_loop(
            0, n_leapfrog, leap, (x1, p1 + 0.5 * scale * g1, e1, g1))
        p = p - 0.5 * scale * g2

        def kinetic(p):
            return 0.5 * jnp.sum(p.astype(e1.dtype) ** 2, axis=event_axes)

        # H = -log pi(x) + |p|^2/2; accept on -dH.
        log_acc = (e2 - e1) + kinetic(p1) - kinetic(p)
    else:
        raise ValueError(f"unknown move kind {kind!r}")
    accept = log_acc >= log_uniform(k2, e1.shape, e1.dtype)
    return (jnp.where(accept[(..., *ev)], x2, x1),
            jnp.where(accept, e2, e1), accept)


def _make_local_step(kind: str, log_target_fn, scale, n_leapfrog: int = 10
                     ) -> Callable[[MCMCState], MCMCState]:
    def step(state: MCMCState) -> MCMCState:
        key, sub = jax.random.split(state.key)
        x, e, accept = _scaled_trial(kind, log_target_fn, state.configs,
                                     state.energies, scale, sub,
                                     n_leapfrog=n_leapfrog)
        # _scaled_trial already applied the accept/reject select.
        return state.replace(
            configs=x, energies=e, key=key,
            num_trials=state.num_trials.add(accept.size),
            num_acc=state.num_acc.add(jnp.sum(accept, dtype=jnp.int32)))

    return step


def make_random_walk_step(log_target_fn: Callable[[Array], Array],
                          scale: float = 0.1
                          ) -> Callable[[MCMCState], MCMCState]:
    """Symmetric Gaussian random-walk Metropolis move (local relaxation).

    ``log_target_fn`` uses the same convention as the engine (log target
    density); the proposal is symmetric so only the target ratio enters.
    """
    return _make_local_step("random_walk", log_target_fn, float(scale))


def make_mala_step(log_target_fn: Callable[[Array], Array],
                   step_size: float = 0.05
                   ) -> Callable[[MCMCState], MCMCState]:
    """Metropolis-adjusted Langevin (MALA) move: gradient-informed local
    proposals with the exact asymmetric-proposal MH correction.

    Proposal ``x' = x + eps * grad(log pi)(x) + sqrt(2 eps) * xi`` with
    ``q(x'|x) = N(x + eps grad(x), 2 eps I)``;
    ``log_acc = [l(x') - l(x)] + [log q(x|x') - log q(x'|x)]``.
    Gradients come from ``jax.grad`` of the user's log-target — free on
    TPU where the target is a compiled function (the reference's NumPy
    energy callbacks cannot support this; extension beyond parity).
    Composable with the VAE/jump/random-walk kernels via ``cycle_moves``
    / ``mix_moves``; tune ``step_size`` with :func:`tune_scale`.

    Cost: two gradient evaluations of the log-target per step (x1 and
    the proposal).  A grad-caching variant (carrying grad(x) in the
    chain state) would halve that but breaks the shared
    ``step(MCMCState) -> MCMCState`` contract every composition utility
    relies on; revisit if an expensive molecular target dominates.
    """
    return _make_local_step("mala", log_target_fn, float(step_size))


def make_hmc_step(log_target_fn: Callable[[Array], Array],
                  step_size: float = 0.1,
                  n_leapfrog: int = 10
                  ) -> Callable[[MCMCState], MCMCState]:
    """Hamiltonian Monte Carlo move: ``n_leapfrog`` leapfrog steps of
    size ``step_size`` with identity mass, Metropolis-corrected on the
    Hamiltonian error (Duane et al. 1987; Neal 2011).

    Long coherent trajectories suppress random-walk diffusion — the
    strongest local kernel for smooth high-dimensional targets, at
    ``n_leapfrog + 1`` gradient evaluations per step.  Gradients use the
    same one-vjp-per-point trick as MALA; the trajectory is a
    fixed-trip-count ``fori_loop``, so the whole move stays one compiled
    XLA program (no data-dependent trajectory lengths — for NUTS-style
    adaptivity, tune ``step_size`` with :func:`tune_scale` (kind
    ``"hmc"``, optimal acceptance 0.651) and jitter trajectory lengths
    by composing kernels with different ``n_leapfrog`` via
    :func:`mix_moves`, which is XLA-friendly where a per-chain dynamic
    U-turn criterion is not).  Composes with VAE jumps / random walk /
    MALA through :func:`cycle_moves` / :func:`mix_moves`; drops into
    ``run_mcmc`` / checkpointing / sharding unchanged.
    """
    if n_leapfrog < 1:
        raise ValueError("n_leapfrog must be >= 1")
    return _make_local_step("hmc", log_target_fn, float(step_size),
                            n_leapfrog=int(n_leapfrog))


def tune_scale(log_target_fn: Callable[[Array], Array],
               state: MCMCState, *,
               kind: str = "random_walk",
               target_accept: Optional[float] = None,
               init_scale: float = 0.1,
               rounds: int = 30,
               steps_per_round: int = 20,
               n_leapfrog: int = 10) -> Tuple[float, MCMCState]:
    """Adapt a local move's step size to a target acceptance rate —
    Robbins-Monro on the log-scale, the whole warmup as ONE jitted
    ``lax.scan`` (no per-round host round trips or recompiles).

    Defaults target the theoretical optima (0.234 random walk, 0.574
    MALA, 0.651 HMC; ``n_leapfrog`` applies to HMC only).  Returns
    ``(scale, warmed_state)``; build the production kernel with
    :func:`make_random_walk_step` / :func:`make_mala_step` /
    :func:`make_hmc_step` at the returned scale (adaptation stops
    there, so the production chain is exactly Markovian).
    """
    if target_accept is None:
        target_accept = {"mala": 0.574, "hmc": 0.651}.get(kind, 0.234)
    if kind not in ("random_walk", "mala", "hmc"):
        raise ValueError(f"unknown move kind {kind!r}")

    def one_round(carry, r):
        x, e, key, log_s = carry

        def inner(c, _):
            x, e, key, acc_sum = c
            key, sub = jax.random.split(key)
            x, e, accept = _scaled_trial(kind, log_target_fn, x, e,
                                         jnp.exp(log_s), sub,
                                         n_leapfrog=n_leapfrog)
            return (x, e, key,
                    acc_sum + jnp.mean(accept.astype(jnp.float32))), None

        (x, e, key, acc_sum), _ = jax.lax.scan(
            inner, (x, e, key, jnp.float32(0.0)), None,
            length=steps_per_round)
        acc_rate = acc_sum / steps_per_round
        # Decaying Robbins-Monro step keeps late rounds stable; gain 2
        # lets the tuner travel several decades of scale from a poor
        # init within the default 30 rounds.
        log_s = log_s + 2.0 * (acc_rate - target_accept) / jnp.sqrt(1.0 + r)
        return (x, e, key, log_s), acc_rate

    @jax.jit
    def run(x, e, key):
        # log_s rides in float32 regardless of the chains' compute dtype
        # (bf16 configs are supported; a bf16 carry would both violate
        # the scan-carry type invariant against the f32 acceptance mean
        # and quantize the adaptation).
        carry = (x, e, key, jnp.log(jnp.float32(init_scale)))
        (x, e, key, log_s), acc = jax.lax.scan(
            one_round, carry, jnp.arange(rounds, dtype=jnp.float32))
        return x, e, key, jnp.exp(log_s), acc

    x, e, key, scale, acc = run(state.configs, state.energies, state.key)
    # Warmup trials are not counted in the production statistics.
    warmed = MCMCState(configs=x, energies=e, key=key,
                       num_trials=state.num_trials, num_acc=state.num_acc)
    return float(scale), warmed


def mix_moves(steps: Sequence[Callable[[MCMCState], MCMCState]],
              probs: Sequence[float]
              ) -> Callable[[MCMCState], MCMCState]:
    """Random mixture of move kernels: each step, one move type is chosen
    with the given probabilities (a valid MCMC kernel — a probabilistic
    mixture of detailed-balance kernels preserves the target).

    Uses ``lax.switch``, so only the chosen branch's FLOPs... are
    *scheduled*; all branches compile once.
    """
    if len(steps) != len(probs):
        raise ValueError("one probability per move")
    p = jnp.asarray(probs, jnp.float32)
    p = p / jnp.sum(p)
    logits = jnp.log(p)

    def step(state: MCMCState) -> MCMCState:
        key, k_choice = jax.random.split(state.key)
        state = state.replace(key=key)
        idx = jax.random.categorical(k_choice, logits)
        return jax.lax.switch(idx, list(steps), state)

    return step


def cycle_moves(steps: Sequence[Callable[[MCMCState], MCMCState]]
                ) -> Callable[[MCMCState], MCMCState]:
    """Deterministic cycle of move kernels applied in sequence each step
    (a composition of detailed-balance kernels also preserves the
    target; e.g. one VAE jump followed by k local relaxations)."""

    def step(state: MCMCState) -> MCMCState:
        for s in steps:
            state = s(state)
        return state

    return step
