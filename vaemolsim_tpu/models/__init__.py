"""Trainable model compositions (reference L5: vaemolsim/models.py)."""

from vaemolsim_tpu.models.backmapping import BackmappingOnly  # noqa: F401
from vaemolsim_tpu.models.core import (  # noqa: F401
    VAE,
    DualVAEOutput,
    FlowModel,
    MappingToDistribution,
    VAEDualELBO,
    VAEOutput,
)
