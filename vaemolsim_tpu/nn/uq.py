"""Ensemble uncertainty quantification for ML potentials.

Deep-ensemble UQ (Lakshminarayanan et al. 2017 applied to force
fields, e.g. Schran et al. 2020 committee-NNP): K independently
initialized :class:`~vaemolsim_tpu.nn.schnet.SchNetPotential` /
:class:`~vaemolsim_tpu.nn.painn.PaiNNPotential` models, stacked into
one pytree (``train.stack_models`` / trained in one compiled program
by ``train.fit_ensemble``), evaluated by a single ``vmap`` — the
committee disagreement on forces is the standard error signal driving
active learning: configurations where the committee diverges are
exactly where training data is missing.

TPU note: the whole committee is ONE program — ``vmap`` over the
stacked parameter axis turns K model evaluations into batched matmuls
(K is just another batch dimension on the MXU), so UQ costs the same
wall-clock as a K-times-larger batch, not K dispatches.

Duck-typed over the shared ML-potential contract
(``model(x, species, box, mask) -> energy`` + ``atom_energies``):
any stack whose members implement it works.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

Array = jax.Array

__all__ = ["EnsemblePrediction", "ensemble_energy_forces",
           "max_force_uncertainty"]


class EnsemblePrediction(NamedTuple):
    """Committee statistics over a batch of frames ``(..., N, 3)``.

    ``energy`` / ``forces``: committee means (the deployment
    prediction).  ``energy_std``: per-frame committee std of the total
    energy.  ``force_std``: per-frame scalar force disagreement
    ``sqrt(mean_{atoms, xyz} Var_K[F])`` — the standard committee
    error estimate (RMS over components of the member std).
    """

    energy: Array        # (...,)
    forces: Array        # (..., N, 3)
    energy_std: Array    # (...,)
    force_std: Array     # (...,)


def ensemble_energy_forces(model_stack: Any, x: Array, species: Array,
                           box: Optional[Array] = None,
                           mask: Optional[Array] = None
                           ) -> EnsemblePrediction:
    """Evaluate a stacked committee (leading pytree axis = members) on
    frames ``x (..., N, 3)``: one vmapped energy+force pass, committee
    mean/std out.  Padding atoms (``mask`` False) contribute zero to
    the force-disagreement average."""

    def one(member):
        e = member(x, species, box, mask)
        f = -jax.grad(lambda c: jnp.sum(member(c, species, box, mask)))(x)
        return e, f

    e_k, f_k = jax.vmap(one)(model_stack)  # (K, ...), (K, ..., N, 3)
    e_mean = jnp.mean(e_k, axis=0)
    f_mean = jnp.mean(f_k, axis=0)
    e_std = jnp.std(e_k, axis=0)
    f_var = jnp.var(f_k, axis=0)  # (..., N, 3)
    if mask is not None:
        m = mask[..., None].astype(f_var.dtype)
        f_var = f_var * m
        n_eff = 3.0 * jnp.maximum(jnp.sum(mask, axis=-1), 1)
        f_std = jnp.sqrt(jnp.sum(f_var, axis=(-2, -1)) / n_eff)
    else:
        f_std = jnp.sqrt(jnp.mean(f_var, axis=(-2, -1)))
    return EnsemblePrediction(energy=e_mean, forces=f_mean,
                              energy_std=e_std, force_std=f_std)


def max_force_uncertainty(model_stack: Any, x: Array, species: Array,
                          box: Optional[Array] = None,
                          mask: Optional[Array] = None) -> Array:
    """Per-frame MAX over atoms of the committee force std magnitude,
    ``max_i sqrt(mean_xyz Var_K[F_i])`` — the conservative per-frame
    trigger used by on-the-fly active learning (one poorly described
    atom flags the whole frame even if the frame average is calm)."""

    def one(member):
        return -jax.grad(
            lambda c: jnp.sum(member(c, species, box, mask)))(x)

    f_k = jax.vmap(one)(model_stack)
    per_atom = jnp.sqrt(jnp.mean(jnp.var(f_k, axis=0), axis=-1))
    if mask is not None:
        per_atom = per_atom * mask.astype(per_atom.dtype)
    return jnp.max(per_atom, axis=-1)
