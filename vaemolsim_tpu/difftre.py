"""Differentiable trajectory reweighting (DiffTRe): top-down training
of potential parameters on ensemble observables.

Thaler & Zavadlav, Nat. Commun. 12, 6884 (2021): to fit a potential
``U_theta`` so that ensemble averages ``<O>_theta`` match experimental
targets, one does NOT need to backpropagate through the MD integrator
(exploding gradients, O(steps) memory).  Reweight a reference
trajectory sampled at the CURRENT parameters ``theta_hat`` instead:

    <O>_theta = sum_i w_i(theta) O(theta, x_i),
    w_i ~ exp(-beta (U_theta(x_i) - U_theta_hat(x_i))),

which is exact in expectation for any ``theta`` and — evaluated at
``theta = theta_hat`` where the weights are uniform — differentiating
through the weights reproduces the full statistical-mechanics gradient

    d<O>/dtheta = <dO/dtheta> - beta Cov(O, dU/dtheta),

including the entropic fluctuation term a naive "differentiate the
frame average" misses.  Training alternates cheap reweighted gradient
steps with trajectory regeneration whenever the effective sample size
decays (the weights concentrate as ``theta`` leaves ``theta_hat``).

This is the top-down complement of bottom-up force matching
(:mod:`vaemolsim_tpu.cg`): same coarse-graining problem, matched to
structure/thermodynamics instead of forces.  Beyond-reference
capability in the reference's ecosystem (the reference author's
thermoextrap reweighting methodology, here made differentiable).

TPU-first: the inner optimization is ONE compiled ``lax.while_loop``
(gradient steps until the ESS floor or the step cap), the reweighted
estimate is one log-sum-exp + one matmul over frames, and the sampler
is whatever scanned engine the caller provides (``md.baoab``,
``mcmc.run_mcmc``, ...) — frames stay on device end to end.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

Array = jax.Array

__all__ = ["reweighted_observables", "difftre_loss", "difftre_fit",
           "static_observable", "DiffTReResult"]


def static_observable(fn: Callable) -> Callable:
    """Mark a parameter-INdependent observable ``fn(frames) -> (n, ...)``
    (structure factors, RDF bins, order parameters — anything that reads
    only coordinates).  :func:`difftre_fit` evaluates it ONCE per
    trajectory and feeds the cached per-frame values to every inner
    gradient step, instead of recomputing inside the ``while_loop``;
    the returned callable still has the ``(params, frames)`` signature
    so it composes with :func:`reweighted_observables` directly."""

    def wrapped(params, frames):
        return fn(frames)

    wrapped._difftre_static = True
    return wrapped


def _normalized_log_weights(potential: Callable, params: Any,
                            frames: Array, u_ref: Array,
                            beta: float) -> Array:
    u = potential(params, frames)
    logw = -beta * (u - u_ref)
    return logw - jax.scipy.special.logsumexp(logw)


def reweighted_observables(potential: Callable, params: Any,
                           frames: Array, u_ref: Array, beta: float,
                           observable_fns: Any) -> Tuple[Any, Array]:
    """Reweighted ensemble estimates ``<O>_params`` from reference
    frames, differentiable in ``params`` through BOTH the weights and
    any explicit parameter dependence of the observables.

    ``potential(params, frames) -> (n,)`` batched energies;
    ``u_ref``: energies of ``frames`` under the parameters that
    GENERATED them (uniform weights and ``ess = n`` when
    ``params == params_ref``); ``observable_fns``: pytree of callables
    ``obs(params, frames) -> (n, ...)`` per-frame values.  Returns
    ``(estimates, ess)`` with ``estimates`` matching the pytree
    structure and ``ess`` the effective sample size
    ``1 / sum_i w_i^2``.
    """
    logw = _normalized_log_weights(potential, params, frames, u_ref,
                                   beta)
    w = jnp.exp(logw)
    ess = 1.0 / jnp.sum(w * w)

    def one(fn):
        vals = fn(params, frames)                    # (n, ...)
        return jnp.tensordot(w, vals, axes=[[0], [0]])

    is_leaf = callable
    est = jax.tree_util.tree_map(one, observable_fns, is_leaf=is_leaf)
    return est, ess


def difftre_loss(potential: Callable, params: Any, frames: Array,
                 u_ref: Array, beta: float, observable_fns: Any,
                 targets: Any, weights: Any = None
                 ) -> Tuple[Array, Tuple[Any, Array]]:
    """Weighted mean-squared mismatch of the reweighted estimates to
    their targets: ``sum_k w_k mean((<O_k>_params - target_k)^2)``
    (mean over the components of vector observables).  Returns
    ``(loss, (estimates, ess))`` — the ``has_aux`` shape
    ``jax.value_and_grad`` wants."""
    est, ess = reweighted_observables(potential, params, frames, u_ref,
                                      beta, observable_fns)
    is_leaf_fn = callable
    if weights is None:
        weights = jax.tree_util.tree_map(lambda _: 1.0, observable_fns,
                                         is_leaf=is_leaf_fn)

    def one(e, t, w):
        return w * jnp.mean((e - jnp.asarray(t)) ** 2)

    terms = jax.tree_util.tree_map(one, est, targets, weights)
    loss = jax.tree_util.tree_reduce(
        lambda a, b: a + b, terms, jnp.asarray(0.0))
    return loss, (est, ess)


class DiffTReResult(NamedTuple):
    """``params``: trained parameters.  ``history``: per-outer-iteration
    records — ``loss`` (at the start of each inner phase, i.e. computed
    with fresh uniform weights: the unbiased estimate), ``ess_end``
    (effective sample size when the inner phase stopped),
    ``inner_steps`` (gradient steps taken before the ESS floor or the
    cap), ``estimates`` (fresh-trajectory observable estimates)."""

    params: Any
    history: Dict[str, Any]


def difftre_fit(potential: Callable, params: Any, *,
                sample_fn: Callable, observable_fns: Any, targets: Any,
                beta: float, key: Array,
                n_outer: int = 10, inner_steps: int = 30,
                ess_frac: float = 0.5,
                optimizer: Optional[optax.GradientTransformation] = None,
                learning_rate: float = 1e-2,
                weights: Any = None,
                sample_state: Any = None) -> DiffTReResult:
    """The full DiffTRe loop.

    Outer iterations regenerate the reference trajectory at the current
    parameters via ``sample_fn(params, key, sample_state) ->
    (frames, sample_state)`` (frames ``(n, ...)``; thread MD/MC state
    through ``sample_state`` to warm-start, or return ``None``).  Each
    inner phase is one compiled ``lax.while_loop`` of
    ``optimizer`` steps on :func:`difftre_loss`, stopping at
    ``inner_steps`` or as soon as the effective sample size of the
    reweighted estimate falls below ``ess_frac * n`` (the weights have
    concentrated; the estimate is no longer trustworthy and a fresh
    trajectory is due).
    """
    opt = optimizer if optimizer is not None else optax.adam(
        learning_rate)
    opt_state = opt.init(params)

    # Split observables into static (parameter-independent, see
    # static_observable) and dynamic leaves: static per-frame values are
    # computed once per trajectory and enter the compiled inner program
    # as arguments (no retrace across outer rounds).
    obs_leaves, obs_treedef = jax.tree_util.tree_flatten(
        observable_fns, is_leaf=callable)
    static_flags = [bool(getattr(f, "_difftre_static", False))
                    for f in obs_leaves]

    @jax.jit
    def precompute_static(params, frames):
        return [f(params, frames)
                for f, s in zip(obs_leaves, static_flags) if s]

    def _effective_obs(static_vals):
        it = iter(static_vals)
        leaves = [(lambda p, f, v=next(it): v) if s else f
                  for f, s in zip(obs_leaves, static_flags)]
        return jax.tree_util.tree_unflatten(obs_treedef, leaves)

    @jax.jit
    def inner(params, opt_state, frames, u_ref, static_vals):
        n = frames.shape[0]
        obs = _effective_obs(static_vals)
        grad_fn = jax.value_and_grad(
            lambda p: difftre_loss(potential, p, frames, u_ref, beta,
                                   obs, targets, weights),
            has_aux=True)

        def cond(carry):
            _, _, i, ess, _ = carry
            return (i < inner_steps) & (ess >= ess_frac * n)

        def body(carry):
            p, s, i, _, _ = carry
            (l, (_, ess)), g = grad_fn(p)
            up, s = opt.update(g, s, p)
            p = optax.apply_updates(p, up)
            return p, s, i + 1, ess, l

        carry = (params, opt_state, jnp.asarray(0),
                 jnp.asarray(float(n)), jnp.asarray(jnp.inf))
        params, opt_state, steps, ess, last_loss = jax.lax.while_loop(
            cond, body, carry)
        return params, opt_state, steps, ess, last_loss

    @jax.jit
    def fresh_estimate(params, frames, u_ref, static_vals):
        return difftre_loss(potential, params, frames, u_ref, beta,
                            _effective_obs(static_vals), targets,
                            weights)

    history: Dict[str, Any] = {"loss": [], "ess_end": [],
                               "inner_steps": [], "estimates": []}
    for _ in range(n_outer):
        key, k = jax.random.split(key)
        frames, sample_state = sample_fn(params, k, sample_state)
        u_ref = jax.lax.stop_gradient(potential(params, frames))
        static_vals = precompute_static(params, frames)
        loss0, (est0, _) = fresh_estimate(params, frames, u_ref,
                                          static_vals)
        params, opt_state, steps, ess, _ = inner(params, opt_state,
                                                 frames, u_ref,
                                                 static_vals)
        history["loss"].append(float(loss0))
        history["ess_end"].append(float(ess))
        history["inner_steps"].append(int(steps))
        history["estimates"].append(jax.tree_util.tree_map(
            lambda a: jnp.asarray(a), est0))
    return DiffTReResult(params=params, history=history)
