"""Coordinate mappings and encoder/decoder trunks.

TPU-first replacement for vaemolsim/mappings.py (reference L1 layer,
SURVEY.md §1): the FCDeepNN MLP trunk with periodic sin/cos expansion,
FG->CG reduction maps (centroid / center-of-mass), and distance-based
neighbor selection.  Design changes vs the reference:

* Ragged tensors do not exist here — variable-size particle sets are
  dense ``(batch, max_particles, 3)`` arrays with a boolean mask, which is
  the natural TPU/XLA representation (static shapes, VPU-friendly).
* The per-residue Python loops of CGCentroid/CGCenterOfMass
  (vaemolsim/mappings.py:213-220, 290-297) become a single precomputed
  aggregation matrix applied with one matmul — this rides the MXU and
  batches over frames.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from vaemolsim_tpu.nn.core import BatchNorm, Dense

Array = jax.Array

__all__ = ["FCDeepNN", "CGCentroid", "CGCenterOfMass", "DistanceSelection"]


@struct.dataclass
class FCDeepNN:
    """Fully-connected trunk mapping inputs to raw parameters.

    Reference semantics (vaemolsim/mappings.py:18-165): flatten the event
    axes; periodic DOFs are expanded to (cos, sin) pairs and concatenated
    after the non-periodic DOFs (mappings.py:144-149); then a Dense stack
    with hidden activation (default relu) and optional BatchNorm; then a
    linear head of ``prod(target_shape)`` units reshaped to
    ``target_shape``.

    ``periodic_dofs``: bool (all or none) or a mask over the *flattened*
    input, validated at create time (mappings.py:92-103).
    """

    layers: Tuple[Dense, ...]
    bns: Tuple[BatchNorm, ...]
    head: Dense
    event_ndims: int = struct.field(pytree_node=False)
    target_shape: Tuple[int, ...] = struct.field(pytree_node=False)
    periodic_mask: Tuple[bool, ...] = struct.field(pytree_node=False)
    batch_norm: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(cls, key: Array, input_shape: Union[int, Sequence[int]],
               target_shape: Union[int, Sequence[int]],
               hidden_dim: Union[int, Sequence[int]] = 200,
               periodic_dofs: Union[bool, Sequence[bool]] = False,
               batch_norm: bool = False,
               activation: str = "relu",
               kernel_initializer="glorot_uniform") -> "FCDeepNN":
        event_shape = ((input_shape,) if isinstance(input_shape, int)
                       else tuple(input_shape))
        tgt = ((target_shape,) if isinstance(target_shape, int)
               else tuple(target_shape))
        hidden = ([hidden_dim] if isinstance(hidden_dim, int)
                  else list(hidden_dim))
        flat_in = int(np.prod(event_shape))
        if isinstance(periodic_dofs, bool):
            mask = (periodic_dofs,) * flat_in
        else:
            mask = tuple(bool(b) for b in periodic_dofs)
            if len(mask) != flat_in:
                raise ValueError(
                    f"Shape of periodic_dofs ({len(mask)}) should match "
                    f"flattened input ({flat_in}).")
        n_periodic = sum(mask)
        eff_in = flat_in + n_periodic  # each periodic DOF becomes 2 values

        dims = [eff_in] + hidden
        keys = jax.random.split(key, len(hidden) + 1)
        layers = tuple(
            Dense.create(keys[i], dims[i], dims[i + 1], activation,
                         kernel_initializer)
            for i in range(len(hidden)))
        bns = (tuple(BatchNorm.create(h) for h in hidden)
               if batch_norm else ())
        head = Dense.create(keys[-1], dims[-1], int(np.prod(tgt)), None,
                            kernel_initializer)
        return cls(layers=layers, bns=bns, head=head,
                   event_ndims=len(event_shape), target_shape=tgt,
                   periodic_mask=mask, batch_norm=batch_norm)

    def _expand_periodic(self, flat: Array) -> Array:
        if not any(self.periodic_mask):
            return flat
        p_idx = jnp.asarray([i for i, b in enumerate(self.periodic_mask) if b])
        np_idx = [i for i, b in enumerate(self.periodic_mask) if not b]
        p = jnp.take(flat, p_idx, axis=-1)
        parts = []
        if np_idx:
            parts.append(jnp.take(flat, jnp.asarray(np_idx), axis=-1))
        parts += [jnp.cos(p), jnp.sin(p)]
        return jnp.concatenate(parts, axis=-1)

    def _trunk(self, x: Array, train: bool, update: bool):
        batch = x.shape[: x.ndim - self.event_ndims]
        flat = x.reshape(batch + (-1,))
        h = self._expand_periodic(flat)
        if not self.batch_norm:
            # Whole trunk + head as one fused stack (VMEM-resident
            # intermediates on TPU; plain XLA elsewhere).
            from vaemolsim_tpu.ops.fused_mlp import fused_dense_stack
            kernels = [l.kernel for l in self.layers] + [self.head.kernel]
            biases = [l.bias for l in self.layers] + [self.head.bias]
            acts = [l.activation for l in self.layers] + [None]
            out = fused_dense_stack(h, kernels, biases, acts)
            return out.reshape(batch + self.target_shape), ()
        new_bns = []
        for i, layer in enumerate(self.layers):
            h = layer(h)
            if update:
                h, nb = self.bns[i].call_and_update(h, train)
                new_bns.append(nb)
            else:
                h = self.bns[i](h, train)
        out = self.head(h).reshape(batch + self.target_shape)
        return out, tuple(new_bns)

    def __call__(self, x: Array, train: bool = False) -> Array:
        return self._trunk(x, train, update=False)[0]

    def call_and_update(self, x: Array, train: bool = False):
        """Returns (out, new_self) with EMA-updated BatchNorm stats."""
        out, new_bns = self._trunk(x, train, update=True)
        if not self.batch_norm:
            return out, self
        return out, self.replace(bns=new_bns)

def _aggregation_matrix(res_atom_nums: Sequence[int],
                        weights: Optional[np.ndarray] = None) -> np.ndarray:
    """(n_res, n_atoms) row-normalized aggregation matrix."""
    n_atoms = int(np.sum(res_atom_nums))
    A = np.zeros((len(res_atom_nums), n_atoms), dtype=np.float32)
    start = 0
    for r, n in enumerate(res_atom_nums):
        w = (np.ones(n, dtype=np.float32) if weights is None
             else np.asarray(weights[start:start + n], dtype=np.float32))
        A[r, start:start + n] = w / w.sum()
        start += n
    return A


@struct.dataclass
class CGCentroid:
    """FG->CG centroid map: per-residue mean of atom coordinates.

    Reference analog: vaemolsim/mappings.py:169-227 (a tf.split + Python
    loop); here a single precomputed (n_res, n_atoms) matmul so all
    residues and frames reduce in one MXU op.
    """

    agg: Array  # (n_res, n_atoms)

    @classmethod
    def create(cls, res_atom_nums: Sequence[int]) -> "CGCentroid":
        return cls(agg=jnp.asarray(_aggregation_matrix(res_atom_nums)))

    def __call__(self, coords: Array) -> Array:
        """coords (..., n_atoms, 3) -> (..., n_res, 3)."""
        # The aggregation matrix is a fixed physical constant, but as a
        # pytree leaf it would receive optimizer updates when the map is
        # embedded in a trained model: stop gradients at the use site.
        return jnp.einsum("ra,...ad->...rd",
                          jax.lax.stop_gradient(self.agg), coords)


@struct.dataclass
class CGCenterOfMass:
    """FG->CG center-of-mass map with per-atom masses.

    Reference analog: vaemolsim/mappings.py:233-305 (dict of per-residue
    masses + loop).  ``create`` takes either a flat per-atom ``masses``
    array with ``res_atom_nums``, or the reference-style
    ``res_masses`` dict {resname: mass_array} + ``res_names`` sequence.
    """

    agg: Array  # (n_res, n_atoms), mass-normalized rows

    @classmethod
    def create(cls, res_atom_nums: Sequence[int],
               masses: Sequence[float]) -> "CGCenterOfMass":
        return cls(agg=jnp.asarray(_aggregation_matrix(
            res_atom_nums, np.asarray(masses, dtype=np.float32))))

    @classmethod
    def from_residue_dict(cls, res_masses: Dict[str, Sequence[float]],
                          res_names: Sequence[str]) -> "CGCenterOfMass":
        nums = [len(res_masses[name]) for name in res_names]
        flat = np.concatenate([np.asarray(res_masses[name], dtype=np.float32)
                               for name in res_names])
        return cls.create(nums, flat)

    def __call__(self, coords: Array) -> Array:
        # Fixed physical constant: see CGCentroid.__call__.
        return jnp.einsum("ra,...ad->...rd",
                          jax.lax.stop_gradient(self.agg), coords)


@struct.dataclass
class DistanceSelection:
    """Distance + count-based neighbor selection around a reference point.

    Reference analog: vaemolsim/mappings.py:308-464.  Differences by
    design: inputs are dense ``(batch, n_particles, 3)`` with an optional
    boolean ``mask`` (True = real particle) instead of ragged tensors; the
    output carries an explicit ``(batch, max_included)`` validity mask
    instead of zeroed rows doubling as sentinel (zeroed rows are still
    produced for downstream layers that expect them, mappings.py:436-441).

    Semantics preserved: subtract reference point, optional minimum-image
    wrap with box lengths (mappings.py:408-412), squared distances, top-k
    nearest up to ``max_included`` (mappings.py:429-433), zero out
    selections beyond ``cutoff`` and co-select per-particle info
    (mappings.py:436-453).
    """

    cutoff: float = struct.field(pytree_node=False)
    max_included: int = struct.field(pytree_node=False, default=50)
    box_lengths: Optional[Array] = None

    @classmethod
    def create(cls, cutoff: float, max_included: int = 50,
               box_lengths=None) -> "DistanceSelection":
        box = None if box_lengths is None else jnp.asarray(box_lengths)
        return cls(cutoff=float(cutoff), max_included=max_included,
                   box_lengths=box)

    def __call__(self, coords: Array, ref: Array,
                 mask: Optional[Array] = None,
                 particle_info: Optional[Array] = None,
                 box_lengths: Optional[Array] = None):
        """
        Parameters
        ----------
        coords : (B, P, 3); ref : (B, 3) or (B, 1, 3); mask : (B, P) bool
        particle_info : optional (B, P, I)
        box_lengths : optional (3,) or (B, 3), overrides the stored ones
            (reference allows per-call box lengths, mappings.py:362-412).

        Returns
        -------
        sel_coords : (B, max_included, 3) relative to ref, zero-padded
        sel_mask : (B, max_included) bool
        sel_info : (B, max_included, I) or None
        """
        if ref.ndim == coords.ndim:
            ref = ref[..., 0, :]
        diff = coords - ref[..., None, :]
        box = box_lengths if box_lengths is not None else self.box_lengths
        if box is not None:
            # Physical constant, not a trainable parameter (it rides as
            # a pytree leaf when stored on the layer).
            box = jax.lax.stop_gradient(jnp.asarray(box))
            # (3,) or (B, 3) -> broadcast over the particle axis.
            if box.ndim < diff.ndim:
                box = box[..., None, :]
            diff = diff - box * jnp.round(diff / box)
        d2 = jnp.sum(diff * diff, axis=-1)
        big = jnp.finfo(d2.dtype).max
        if mask is not None:
            d2 = jnp.where(mask, d2, big)
        # k nearest among P (static k, clamped when fewer particles than
        # max_included exist — outputs are zero-padded back to the static
        # max_included width).
        P = d2.shape[-1]
        k = min(self.max_included, P)
        neg_top, idx = jax.lax.top_k(-d2, k)
        sel_d2 = -neg_top
        sel = jnp.take_along_axis(diff, idx[..., None], axis=-2)
        valid = sel_d2 <= (self.cutoff * self.cutoff)
        if mask is not None:
            # Exclude selections that were only padding (d2 == big).
            valid = valid & (sel_d2 < big)
        sel = jnp.where(valid[..., None], sel, 0.0)
        sel_info = None
        if particle_info is not None:
            sel_info = jnp.take_along_axis(particle_info, idx[..., None],
                                           axis=-2)
            sel_info = jnp.where(valid[..., None], sel_info, 0.0)
        if k < self.max_included:
            padn = self.max_included - k
            sel = jnp.pad(sel, [(0, 0)] * (sel.ndim - 2)
                          + [(0, padn), (0, 0)])
            valid = jnp.pad(valid, [(0, 0)] * (valid.ndim - 1) + [(0, padn)])
            if sel_info is not None:
                sel_info = jnp.pad(sel_info, [(0, 0)] * (sel_info.ndim - 2)
                                   + [(0, padn), (0, 0)])
        return sel, valid, sel_info
