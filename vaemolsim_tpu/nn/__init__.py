"""Neural mappings (reference L1: vaemolsim/mappings.py)."""

from vaemolsim_tpu.nn.core import (  # noqa: F401
    MADE,
    BatchNorm,
    Dense,
    MLP,
)
from vaemolsim_tpu.nn.mappings import (  # noqa: F401
    CGCenterOfMass,
    CGCentroid,
    DistanceSelection,
    FCDeepNN,
)
