"""Normalizing flows (reference L2: vaemolsim/flows.py)."""

from vaemolsim_tpu.flows.spline_flows import (  # noqa: F401
    CouplingLayer,
    MAFLayer,
    MaskedSplineConditioner,
    RQSSplineMAF,
    RQSSplineRealNVP,
    SplineConditioner,
    maf_fused_enabled,
    set_maf_fused,
)
from vaemolsim_tpu.flows.flow_matching import (  # noqa: F401
    FlowMatching,
    FlowMatchingDist,
    FlowMatchingLayer,
    VelocityField,
)
from vaemolsim_tpu.flows.diffusion import (  # noqa: F401
    Diffusion,
    DiffusionDist,
    DiffusionLayer,
)
from vaemolsim_tpu.ops.bijectors import make_domain_transform  # noqa: F401
