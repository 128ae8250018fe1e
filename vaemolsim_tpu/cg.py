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

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

__all__ = ["force_aggregation_matrix", "map_forces",
           "force_matching_loss"]


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
