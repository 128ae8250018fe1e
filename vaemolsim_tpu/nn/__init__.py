"""Neural mappings (reference L1: vaemolsim/mappings.py)."""

from vaemolsim_tpu.nn.attention import (  # noqa: F401
    AttentionBlock,
    LocalParticleDescriptors,
    ParticleEmbedding,
    VectorAttention,
    VectorAttentionTwoStage,
)
from vaemolsim_tpu.nn.core import (  # noqa: F401
    MADE,
    MLP,
    BatchNorm,
    Dense,
    LayerNorm,
)
from vaemolsim_tpu.nn.painn import (  # noqa: F401
    PaiNNBlock,
    PaiNNPotential,
)
from vaemolsim_tpu.nn.schnet import (  # noqa: F401
    SchNetEmbedding,
    SchNetInteraction,
    SchNetPotential,
    energy_force_loss,
)
from vaemolsim_tpu.nn.uq import (  # noqa: F401
    EnsemblePrediction,
    ensemble_energy_forces,
    max_force_uncertainty,
)
from vaemolsim_tpu.nn.mappings import (  # noqa: F401
    CGCenterOfMass,
    CGCentroid,
    DistanceSelection,
    FCDeepNN,
)
