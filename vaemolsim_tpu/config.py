"""Typed configuration dataclasses for the framework's main objects.

The reference configures everything through constructor kwargs with
defaults (SURVEY.md §5.6: hidden_dim=200, num_bins=32,
bin_range=[-10,10], num_blocks 4/2, max_included=50, rqs_params /
auto_net_params pass-throughs); these dataclasses mirror those exact
knobs, round-trip to/from plain dicts (JSON-able — the functional
replacement for Keras get_config), and build the corresponding objects
with a PRNG key.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple, Union

import jax

__all__ = ["RQSParams", "RealNVPConfig", "MAFConfig", "MappingConfig",
           "DistanceSelectionConfig", "ParticleEmbeddingConfig",
           "MCMCConfig", "from_dict", "to_dict"]


def to_dict(cfg) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


def from_dict(cls, d: Dict[str, Any]):
    """Reconstruct a config (recursively rebuilding nested dataclass
    fields such as ``rqs``) from a plain dict."""
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        ftype = f.type if not isinstance(f.type, str) else None
        # Resolve string annotations against this module's globals.
        if ftype is None:
            ftype = globals().get(f.type, None)
        if (dataclasses.is_dataclass(ftype) and isinstance(v, dict)):
            v = from_dict(ftype, v)
        kwargs[f.name] = v
    return cls(**kwargs)


@dataclass
class RQSParams:
    """Spline conditioner knobs (reference flows.py:106-109 defaults)."""

    bin_range: Tuple[float, float] = (-10.0, 10.0)
    num_bins: int = 32
    hidden_dim: int = 200
    kernel_initializer: str = "truncated_normal"
    conditional: bool = False
    conditional_event_shape: Optional[int] = None

    def asdict(self, coupling: bool = False) -> Dict[str, Any]:
        """kwargs for the conditioner factories.  ``coupling=True`` targets
        SplineConditioner (RealNVP), which has no conditional machinery
        (the reference's RealNVP is never conditional, flows.py:274)."""
        d = dataclasses.asdict(self)
        d["bin_range"] = list(self.bin_range)
        if coupling:
            if self.conditional:
                raise ValueError("RealNVP coupling flows are never "
                                 "conditional (reference flows.py:274)")
            d.pop("conditional")
            d.pop("conditional_event_shape")
        elif not self.conditional:
            d.pop("conditional_event_shape")
        return d


@dataclass
class RealNVPConfig:
    """reference flows.py:246 default num_blocks=4."""

    data_dim: int = 1
    num_blocks: int = 4
    batch_norm: bool = False
    rqs: RQSParams = field(default_factory=RQSParams)

    def build(self, key: jax.Array):
        from vaemolsim_tpu.flows import RQSSplineRealNVP
        return RQSSplineRealNVP.create(
            key, self.data_dim, self.num_blocks,
            rqs_params=self.rqs.asdict(coupling=True),
            batch_norm=self.batch_norm)


@dataclass
class MAFConfig:
    """reference flows.py:556 default num_blocks=2, seeded orders."""

    data_dim: int = 1
    num_blocks: int = 2
    order_seed: Optional[int] = None
    batch_norm: bool = False
    rqs: RQSParams = field(default_factory=RQSParams)

    def build(self, key: jax.Array):
        from vaemolsim_tpu.flows import RQSSplineMAF
        return RQSSplineMAF.create(key, self.data_dim, self.num_blocks,
                                   order_seed=self.order_seed,
                                   rqs_params=self.rqs.asdict(),
                                   batch_norm=self.batch_norm)


@dataclass
class MappingConfig:
    """FCDeepNN knobs (reference mappings.py:45 default hidden 200)."""

    input_shape: Union[int, Tuple[int, ...]] = 1
    target_shape: Union[int, Tuple[int, ...]] = 1
    hidden_dim: Union[int, List[int]] = 200
    periodic_dofs: Union[bool, List[bool]] = False
    batch_norm: bool = False
    activation: str = "relu"

    def build(self, key: jax.Array):
        from vaemolsim_tpu.nn import FCDeepNN
        return FCDeepNN.create(key, self.input_shape, self.target_shape,
                               hidden_dim=self.hidden_dim,
                               periodic_dofs=self.periodic_dofs,
                               batch_norm=self.batch_norm,
                               activation=self.activation)


@dataclass
class DistanceSelectionConfig:
    """reference mappings.py:334 default max_included=50."""

    cutoff: float = 3.0
    max_included: int = 50
    box_lengths: Optional[List[float]] = None

    def build(self):
        from vaemolsim_tpu.nn import DistanceSelection
        return DistanceSelection.create(self.cutoff, self.max_included,
                                        self.box_lengths)


@dataclass
class ParticleEmbeddingConfig:
    """reference mappings.py:564-688 defaults."""

    info_dim: int = 1
    embedding_dim: int = 20
    hidden_dim: int = 40
    num_blocks: int = 2
    mask_zero: bool = True

    def build(self, key: jax.Array):
        from vaemolsim_tpu.nn import ParticleEmbedding
        return ParticleEmbedding.create(key, self.info_dim,
                                        self.embedding_dim,
                                        self.hidden_dim, self.num_blocks,
                                        self.mask_zero)


@dataclass
class MCMCConfig:
    """MC run knobs (reference workload: 10k chains x 100 steps)."""

    n_chains: int = 10_000
    n_steps: int = 100
    collect_every: int = 0
    random_seed: int = 0
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 0
