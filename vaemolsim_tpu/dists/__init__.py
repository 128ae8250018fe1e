"""Distribution-emitting layers (reference L3: vaemolsim/dists.py)."""

from vaemolsim_tpu.dists.joint import (  # noqa: F401
    JointBackmapping,
    JointBackmappingDistribution,
)
from vaemolsim_tpu.dists.layers import (  # noqa: F401
    FAMILY_REGISTRY,
    AutoregressiveBlockwise,
    AutoregressiveBlockwiseDistribution,
    FlowedDistribution,
    IndependentBlockwise,
    IndependentDeterministic,
    IndependentVonMises,
    StaticFlowedDistribution,
    build_family_dist,
    family_param_count,
    register_family,
    register_von_mises_mixture,
)
