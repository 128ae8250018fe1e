"""CG -> atomistic backmapping model over local environments.

TPU-first replacement for ``BackmappingOnly`` (reference
vaemolsim/models.py:470-572, workload: Molecular_Backmapping notebook /
SURVEY.md §3.4): for each CG site, select + embed the nearby particle
environment (rotation-invariant), then decode the site's internal
coordinates (e.g. BAT torsions) from a distribution conditioned on the
embedding.  Ragged inputs are dense arrays + boolean masks here (the
TPU-native layout).
"""

from __future__ import annotations

from typing import Any, Optional

import jax

from flax import struct

from vaemolsim_tpu.nn.attention import LocalParticleDescriptors

Array = jax.Array

__all__ = ["BackmappingOnly"]


@struct.dataclass
class BackmappingOnly:
    """``mask_and_embed`` (DistanceSelection + ParticleEmbedding) feeding a
    decoding ``MappingToDistribution`` (reference models.py:510-542).

    Call signature mirrors the reference's input list: the CG site to
    decode around (``cg_ref``), the surrounding coordinates (+ mask
    instead of raggedness), and per-particle info.
    """

    mask_and_embed: LocalParticleDescriptors
    decoder: Any  # models.MappingToDistribution

    def embed(self, cg_ref: Array, coords: Array, particle_info: Array,
              mask: Optional[Array] = None,
              box_lengths: Optional[Array] = None) -> Array:
        return self.mask_and_embed(coords, cg_ref, particle_info,
                                   mask=mask, box_lengths=box_lengths)

    def __call__(self, cg_ref: Array, coords: Array, particle_info: Array,
                 mask: Optional[Array] = None,
                 box_lengths: Optional[Array] = None,
                 train: bool = False):
        descriptors = self.embed(cg_ref, coords, particle_info, mask,
                                 box_lengths)
        return self.decoder(descriptors, train=train)

    def predict(self, cg_ref: Array, coords: Array, particle_info: Array,
                key: Array, mask: Optional[Array] = None,
                box_lengths: Optional[Array] = None,
                train: bool = False) -> Array:
        """Sample decoded internal coordinates (reference predict_step,
        models.py:544-564)."""
        dist = self(cg_ref, coords, particle_info, mask=mask,
                    box_lengths=box_lengths, train=train)
        return dist.sample(key)
