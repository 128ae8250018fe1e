"""Coarse-grained force matching (multiscale coarse-graining, MS-CG).

The reference library exists to coarse-grain and backmap molecular
systems (vaemolsim/README.md:8; mappings CGCentroid/CGCenterOfMass,
vaemolsim/mappings.py:169-305) but provides no way to obtain a
*potential* for the CG representation it creates.  This module supplies
the standard statistical-mechanics route — the force-matching
variational principle (Izvekov & Voth, J. Phys. Chem. B 109, 2469
(2005); Noid et al., J. Chem. Phys. 128, 244114 (2008)):

    min_F  E_{x~p_FG} | F(M(x)) - F_mapped(x) |^2

is minimized by the mean force ``-grad W(R)`` of the many-body PMF
``W(R) = -kT log integral delta(M(x) - R) p_FG(x) dx``, so regressing
mapped instantaneous forces yields the thermodynamically consistent CG
potential.  For a center-of-mass mapping (per-site weights summing to
1), the consistent mapped force on site I is the PLAIN SUM of the
atomistic forces of its atoms — computed here as one (S, N) matmul
(:func:`force_aggregation_matrix` / :func:`map_forces`), the same
TPU-native aggregation idiom as the CG coordinate maps
(``nn.mappings._aggregation_matrix``).

Pair the mapped data with any differentiable CG potential —
:class:`~vaemolsim_tpu.nn.SchNetPotential` is the intended model
(:func:`force_matching_loss` differentiates through it) — then run CG
MD/MC with the framework's samplers.  End-to-end workflow:
``examples/18_cg_force_matching.py``.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

__all__ = ["force_aggregation_matrix", "map_forces",
           "force_matching_loss", "rel_entropy_loss",
           "rel_entropy_fit", "RelEntropyResult"]


def force_aggregation_matrix(res_atom_nums: Sequence[int]) -> Array:
    """(n_sites, n_atoms) 0/1 block matrix summing atoms within a site.

    This is the force map ``d_{I,i}`` consistent with ANY coordinate map
    whose per-site weights sum to one (centroid, center of mass): the
    MS-CG constraint ``sum_i c_{I,i} = 1  =>  d_{I,i} = 1`` for atoms of
    site I (Noid et al. 2008, eq. 10-12).
    """
    nums = [int(n) for n in res_atom_nums]
    n_atoms = sum(nums)
    agg = np.zeros((len(nums), n_atoms), np.float32)
    start = 0
    for i, n in enumerate(nums):
        agg[i, start:start + n] = 1.0
        start += n
    return jnp.asarray(agg)


def map_forces(agg: Array, forces: Array) -> Array:
    """Aggregate atomistic forces to CG sites: ``(..., N, 3) -> (..., S, 3)``
    via the (S, N) matrix from :func:`force_aggregation_matrix`."""
    return jnp.einsum("ra,...ad->...rd", agg, forces)


def force_matching_loss(model: Any, R: Array, species: Array,
                        f_cg: Array, *,
                        box: Optional[Array] = None,
                        mask: Optional[Array] = None,
                        model_fn: Optional[Callable] = None) -> Array:
    """MS-CG objective: per-site MSE between the model's CG forces and
    the mapped atomistic forces.

    ``mean_b |(-grad_R E_model(R)) - f_cg|^2 / (3 S)`` — the residual at
    the optimum is the PMF's fluctuation floor (instantaneous mapped
    forces are a noisy, unbiased estimator of the mean force), so train
    to convergence of the *validation* loss, not to zero.

    ``model``: a :class:`~vaemolsim_tpu.nn.SchNetPotential` (or any
    pytree with the same ``__call__(x, species, box, mask)`` contract;
    pass ``model_fn`` to override how the energy is computed from it).
    """
    if model_fn is None:
        def model_fn(m, x):
            return m(x, species, box, mask)

    f_pred = -jax.grad(lambda x: jnp.sum(model_fn(model, x)))(R)
    df = jnp.square(f_pred - f_cg)
    if mask is not None:
        df = df * mask[..., None].astype(df.dtype)
        n_eff = jnp.maximum(jnp.sum(mask, axis=-1), 1).astype(df.dtype)
    else:
        n_eff = jnp.asarray(R.shape[-2], df.dtype)
    return jnp.mean(jnp.sum(df, axis=(-2, -1)) / (3.0 * n_eff))


# --- relative-entropy coarse-graining (Shell 2008) ---------------------

def rel_entropy_loss(potential: Callable, params: Any,
                     mapped_frames: Array, cg_frames: Array,
                     u_ref: Array, *, beta: float = 1.0):
    """Reweighted relative-entropy objective for CG potential fitting —
    Shell, J. Chem. Phys. 129, 144108 (2008).

    The relative entropy between the mapped atomistic ensemble and the
    CG model ``p_theta ~ exp(-beta U_theta)`` is, up to a
    theta-independent constant,

        S_rel(theta) = beta < U_theta >_{AA-mapped} + ln Z_theta .

    ``ln Z_theta`` is estimated by exponential reweighting from CG
    configurations generated at REFERENCE parameters (``u_ref`` = their
    energies under those generating parameters):

        ln Z_theta - ln Z_ref = ln < exp(-beta (U_theta - U_ref)) >_ref

    so the returned loss has the exact Srel gradient

        beta ( < dU/dtheta >_mapped - < dU/dtheta >_{theta, reweighted} )

    everywhere the reweighting overlaps (Chaimovich & Shell 2011, eq. 5;
    at ``theta == theta_ref`` the weights are uniform and the second
    term is the plain CG-ensemble average).  Returns ``(loss, ess)``;
    regenerate CG frames when ``ess`` collapses
    (:func:`rel_entropy_fit` automates this).

    Contract matches :mod:`~vaemolsim_tpu.difftre`:
    ``potential(params, frames) -> (n,)`` batched reduced energies.
    Complements :func:`force_matching_loss` (force-space, needs
    atomistic forces) with the distribution-space route (needs only
    mapped configurations) — together with DiffTRe these are the three
    standard CG-learning principles.
    """
    u_mapped = potential(params, mapped_frames)
    u_cg = potential(params, cg_frames)
    logw = -beta * (u_cg - u_ref)
    log_mean = jax.scipy.special.logsumexp(logw) - jnp.log(u_cg.shape[0])
    logw_n = logw - jax.scipy.special.logsumexp(logw)
    w = jnp.exp(logw_n)
    ess = 1.0 / jnp.sum(w * w)
    loss = beta * jnp.mean(u_mapped) + log_mean
    return loss, ess


class RelEntropyResult(NamedTuple):
    """Output of :func:`rel_entropy_fit`.

    params: optimized CG-potential parameters
    loss_history: (n_outer,) relative-entropy estimate after each round,
        comparable ACROSS rounds up to one overall additive constant
        (``ln Z`` of the starting parameters): per-round ``ln Z``
        increments are chained by exponential reweighting on that
        round's frames, so a monotone-decreasing history means Srel is
        actually falling (the raw per-round loss is gauge-dependent and
        is not recorded)
    ess_history: (n_outer,) effective sample size at each round's end
    """
    params: Any
    loss_history: Array
    ess_history: Array


def rel_entropy_fit(potential: Callable, params: Any, *,
                    mapped_frames: Array, sample_fn: Callable,
                    beta: float, key: Array,
                    n_outer: int = 10, inner_steps: int = 30,
                    ess_frac: float = 0.5,
                    optimizer=None,
                    learning_rate: float = 1e-2,
                    sample_state: Any = None) -> RelEntropyResult:
    """Srel minimization loop: outer rounds regenerate CG configurations
    at the current parameters via ``sample_fn(params, key, sample_state)
    -> (cg_frames, sample_state)``; each inner phase is one compiled
    ``lax.while_loop`` of optimizer steps on :func:`rel_entropy_loss`,
    stopping at ``inner_steps`` or when the reweighting ESS falls below
    ``ess_frac * n`` (same protocol as
    :func:`~vaemolsim_tpu.difftre.difftre_fit`, which it mirrors —
    DiffTRe matches observables top-down; this matches the mapped
    DISTRIBUTION itself).
    """
    import optax

    opt = optimizer if optimizer is not None else optax.adam(
        learning_rate)
    opt_state = opt.init(params)

    @jax.jit
    def inner(params, opt_state, cg_frames, u_ref):
        n = cg_frames.shape[0]

        def cond(carry):
            i, _, _, ess = carry
            return (i < inner_steps) & (ess >= ess_frac * n)

        def body(carry):
            i, p, s, _ = carry
            (_, ess), g = jax.value_and_grad(
                lambda q: rel_entropy_loss(
                    potential, q, mapped_frames, cg_frames, u_ref,
                    beta=beta), has_aux=True)(p)
            # Strict ESS guard: an update whose gradient was computed
            # from a below-threshold-ESS reweighting is discarded, not
            # applied-then-stopped (the loop still exits via cond).
            ok = ess >= ess_frac * n
            updates, s_new = opt.update(g, s, p)
            p_new = optax.apply_updates(p, updates)
            sel = lambda old, new: jnp.where(ok, new, old)
            p = jax.tree_util.tree_map(sel, p, p_new)
            s = jax.tree_util.tree_map(sel, s, s_new)
            return i + 1, p, s, ess

        ess0 = jnp.asarray(float(n), mapped_frames.dtype)
        _, params, opt_state, ess = jax.lax.while_loop(
            cond, body, (0, params, opt_state, ess0))
        return params, opt_state, ess

    @jax.jit
    def srel_gauge(params, cg_frames, u_ref):
        """(beta <U>_mapped, ln Z increment) at the round's END —
        the increment reweights this round's frames from their
        generating parameters to the updated ones."""
        u_new = potential(params, cg_frames)
        dlnz = (jax.scipy.special.logsumexp(-beta * (u_new - u_ref))
                - jnp.log(u_new.shape[0]))
        return beta * jnp.mean(potential(params, mapped_frames)), dlnz

    losses, esses = [], []
    cum_lnz = 0.0
    for r in range(n_outer):
        key, sub = jax.random.split(key)
        cg_frames, sample_state = sample_fn(params, sub, sample_state)
        u_ref = jax.lax.stop_gradient(potential(params, cg_frames))
        params, opt_state, ess = inner(params, opt_state, cg_frames,
                                       u_ref)
        mean_u, dlnz = srel_gauge(params, cg_frames, u_ref)
        cum_lnz += float(dlnz)
        losses.append(float(mean_u) + cum_lnz)
        esses.append(float(ess))
    return RelEntropyResult(params, jnp.asarray(losses),
                            jnp.asarray(esses))
