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
import typing
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple, Union

import jax

__all__ = ["RQSParams", "RealNVPConfig", "MAFConfig", "MappingConfig",
           "DistanceSelectionConfig", "ParticleEmbeddingConfig",
           "MCMCConfig", "DistLayerConfig", "FlowedDistConfig",
           "RegularizerConfig", "MappingToDistConfig", "FlowModelConfig",
           "VAEConfig", "BackmappingConfig", "OptimizerConfig",
           "ExperimentConfig", "from_dict", "to_dict", "to_tagged_dict",
           "save_json", "load_json"]


def to_dict(cfg) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


_TAG = "__config__"


def to_tagged_dict(cfg) -> Any:
    """Recursive dict form with a ``__config__`` class tag at every
    dataclass level, so nesting under Union annotations (e.g. a
    FlowedDistConfig's MAF-vs-RealNVP flow) reconstructs unambiguously.
    JSON-safe: tuples become lists."""
    if dataclasses.is_dataclass(cfg) and not isinstance(cfg, type):
        out: Dict[str, Any] = {_TAG: type(cfg).__name__}
        for f in dataclasses.fields(cfg):
            out[f.name] = to_tagged_dict(getattr(cfg, f.name))
        return out
    if isinstance(cfg, (list, tuple)):
        return [to_tagged_dict(v) for v in cfg]
    if isinstance(cfg, dict):
        return {k: to_tagged_dict(v) for k, v in cfg.items()}
    return cfg


def _tuple_in_annotation(ann) -> bool:
    """Whether a loaded JSON list should be coerced to a tuple for this
    annotation: the annotation is tuple-origin, or (mirroring
    ``_dataclass_in_annotation``'s Union handling) a Union/Optional with
    a tuple-origin member.  A Union that also admits a list (or a bare
    ``list``) keeps the list — coercion there would be ambiguous."""
    if typing.get_origin(ann) is tuple:
        return True
    if typing.get_origin(ann) is not typing.Union:
        # Only Union/Optional wrappers are looked through: a container
        # annotation like List[Tuple[int, int]] must NOT have its outer
        # list coerced just because a tuple appears in its type args.
        return False
    args = typing.get_args(ann)
    has_tuple = any(typing.get_origin(a) is tuple for a in args)
    has_list = any(a is list or typing.get_origin(a) is list for a in args)
    return has_tuple and not has_list


def _dataclass_in_annotation(ann, keys=None):
    """The dataclass type named by an annotation, looking through
    Optional[...] / Union[...] wrappers; None if there isn't one.

    When the annotation is a Union of several config classes and the
    dict is untagged, ``keys`` (the dict's keys) picks the member whose
    field names cover them — and it is an error if none does, rather
    than silently reconstructing the first member with defaults."""
    if dataclasses.is_dataclass(ann):
        return ann
    cands = [a for a in typing.get_args(ann) if dataclasses.is_dataclass(a)]
    if not cands:
        return None
    if len(cands) == 1 or keys is None:
        return cands[0]
    keys = set(keys)
    # Exact field-set match first (dataclasses.asdict emits every field,
    # so the true class matches exactly even when its fields are a
    # subset of another Union member's); then UNIQUE subset coverage —
    # a partial dict fitting several members is ambiguous and must be
    # tagged, never silently resolved to the first member.
    for c in cands:
        if keys == {f.name for f in dataclasses.fields(c)}:
            return c
    covering = [c for c in cands
                if keys <= {f.name for f in dataclasses.fields(c)}]
    if len(covering) == 1:
        return covering[0]
    if covering:
        raise ValueError(
            f"untagged dict with keys {sorted(keys)} is ambiguous between "
            f"config classes {[c.__name__ for c in covering]}; write it "
            "with to_tagged_dict/save_json (or include every field) to "
            "disambiguate")
    raise ValueError(
        f"untagged dict with keys {sorted(keys)} matches none of the "
        f"annotated config classes {[c.__name__ for c in cands]}; write "
        "it with to_tagged_dict/save_json to disambiguate")


def from_dict(cls, d: Dict[str, Any]):
    """Reconstruct a config (recursively rebuilding nested dataclass
    fields such as ``rqs``, including under ``Optional``/``Union``
    annotations) from a plain dict.

    A ``__config__`` tag (written by :func:`to_tagged_dict`) takes
    precedence over the annotation — required when the annotation is a
    Union of several config classes.  ``cls`` may be None if ``d`` is
    tagged.
    """
    if _TAG in d:
        cls = _CONFIG_REGISTRY[d[_TAG]]
    if cls is None:
        raise ValueError("from_dict needs a target class or a "
                         f"'{_TAG}'-tagged dict")
    hints = typing.get_type_hints(cls)
    field_names = {f.name for f in dataclasses.fields(cls)}
    unknown = set(d) - field_names - {_TAG}
    if unknown:
        raise ValueError(
            f"{cls.__name__} has no fields {sorted(unknown)} — wrong "
            "target class? (tagged dicts from to_tagged_dict/save_json "
            "reconstruct unambiguously)")
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        if isinstance(v, dict) and _TAG in v:
            v = from_dict(None, v)
        else:
            nested = (_dataclass_in_annotation(hints.get(f.name), set(v))
                      if isinstance(v, dict) else None)
            if nested is not None:
                v = from_dict(nested, v)
        if isinstance(v, list) and _tuple_in_annotation(hints.get(f.name)):
            # JSON has no tuples; coerce per the annotation so
            # load_json(save_json(cfg)) == cfg holds.
            v = tuple(v)
        kwargs[f.name] = v
    return cls(**kwargs)


def save_json(cfg, path: str) -> None:
    """Write a config (any of this module's dataclasses) as tagged JSON —
    together with orbax weights + PRNG seeds this realizes "checkpoint =
    config + weights + seeds" (SURVEY.md §5.4)."""
    import json

    with open(path, "w") as fh:
        json.dump(to_tagged_dict(cfg), fh, indent=2)


def load_json(path: str):
    """Load a tagged-JSON config written by :func:`save_json`."""
    import json

    with open(path) as fh:
        return from_dict(None, json.load(fh))


@dataclass
class RQSParams:
    """Spline conditioner knobs (reference flows.py:106-109 defaults)."""

    bin_range: Tuple[float, float] = (-10.0, 10.0)
    num_bins: int = 32
    hidden_dim: int = 200
    kernel_initializer: str = "truncated_normal"
    conditional: bool = False
    conditional_event_shape: Optional[int] = None
    circular: bool = False  # Rezende-et-al. circle spline (periodic DOFs)

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
    # "fused" (one pair input, two MXU matmuls — the fast default) or
    # "two_stage" (the external package's exact value-on-invariants +
    # merge/join structure; see docs/attention_equivalence.md).
    attention: str = "fused"
    # "attention" (GA attention, the reference's embedding) or "schnet"
    # (continuous-filter convolutions — the cgschnet/atomschnet nets the
    # reference's JointDistribution sketch names, vaemolsim/dists.py:805).
    kind: str = "attention"
    # SchNet-only knobs (ignored for kind="attention"): hidden_dim doubles
    # as the per-atom feature width; rbf_cutoff should match the
    # DistanceSelection cutoff feeding the embedding.
    n_rbf: int = 16
    rbf_cutoff: float = 3.0
    pool: str = "mean"  # "mean" (bounded conditioning) | "sum" (extensive)

    def build(self, key: jax.Array):
        if self.kind == "schnet":
            from vaemolsim_tpu.nn import SchNetEmbedding
            return SchNetEmbedding.create(
                key, self.info_dim, self.embedding_dim,
                features=self.hidden_dim, num_blocks=self.num_blocks,
                n_rbf=self.n_rbf, cutoff=self.rbf_cutoff,
                mask_zero=self.mask_zero, pool=self.pool)
        if self.kind != "attention":
            raise ValueError(
                f"kind must be 'attention' or 'schnet', got {self.kind!r}")
        from vaemolsim_tpu.nn import ParticleEmbedding
        return ParticleEmbedding.create(key, self.info_dim,
                                        self.embedding_dim,
                                        self.hidden_dim, self.num_blocks,
                                        self.mask_zero,
                                        attention=self.attention)


@dataclass
class MCMCConfig:
    """MC run knobs (reference workload: 10k chains x 100 steps)."""

    n_chains: int = 10_000
    n_steps: int = 100
    collect_every: int = 0
    random_seed: int = 0
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 0


# ---------------------------------------------------------------------------
# Distribution-layer, loss, model, and experiment configs — completing the
# "checkpoint = config + weights + seeds" story (SURVEY.md §5.4/§5.6; the
# reference's per-layer get_config, vaemolsim/models.py:141-148).
# ---------------------------------------------------------------------------


@dataclass
class DistLayerConfig:
    """A distribution-emitting layer (reference vaemolsim/dists.py L3).

    ``kind``: "independent_blockwise" | "autoregressive_blockwise" |
    "independent_von_mises" | "independent_deterministic".
    """

    kind: str = "independent_blockwise"
    num_dofs: int = 1
    families: Union[str, List[str]] = "normal"
    conditional: bool = False
    conditional_event_shape: Optional[int] = None
    auto_net_params: Optional[Dict[str, Any]] = None

    def build(self, key: Optional[jax.Array] = None):
        from vaemolsim_tpu import dists

        if self.conditional and self.kind != "autoregressive_blockwise":
            raise ValueError(
                f"kind={self.kind!r} has no conditional machinery; "
                "conditional=True would be silently ignored and the "
                "model would train unconditioned (use "
                "autoregressive_blockwise, or condition via a "
                "FlowedDistConfig with a conditional flow)")
        if self.kind == "independent_blockwise":
            return dists.IndependentBlockwise.create(self.num_dofs,
                                                     self.families)
        if self.kind == "autoregressive_blockwise":
            if key is None:
                raise ValueError("autoregressive_blockwise needs a key")
            return dists.AutoregressiveBlockwise.create(
                key, self.num_dofs, self.families,
                conditional=self.conditional,
                conditional_event_shape=self.conditional_event_shape,
                auto_net_params=self.auto_net_params)
        if self.kind == "independent_von_mises":
            return dists.IndependentVonMises.create(self.num_dofs)
        if self.kind == "independent_deterministic":
            return dists.IndependentDeterministic.create(self.num_dofs)
        raise ValueError(f"Unknown dist layer kind {self.kind!r}")


@dataclass
class FlowedDistConfig:
    """Flow over a base distribution layer, or — with ``base=None`` — a
    StaticFlowedDistribution over a standard normal of dimension
    ``static_base_dim`` (the flagship prior shape)."""

    flow: Union[MAFConfig, RealNVPConfig] = field(default_factory=MAFConfig)
    base: Optional[DistLayerConfig] = None
    static_base_dim: Optional[int] = None

    def build(self, key: jax.Array):
        import jax.numpy as jnp

        from vaemolsim_tpu import dists
        from vaemolsim_tpu.ops import distributions as d

        k_flow, k_base = jax.random.split(key)
        flow = self.flow.build(k_flow)
        if self.base is None:
            dim = self.static_base_dim or self.flow.data_dim
            return dists.StaticFlowedDistribution(
                flow=flow,
                base=d.Independent(d.Normal(jnp.zeros(dim), jnp.ones(dim)),
                                   1))
        return dists.FlowedDistribution(flow=flow,
                                        base_layer=self.base.build(k_base))


@dataclass
class RegularizerConfig:
    """VAE information regularizer (reference vaemolsim/losses.py:128-330).

    ``kind``: "none" | "kl" | "log_prob" | "reverse_kl".
    """

    kind: str = "kl"
    weight: float = 1.0
    sample_dist: Optional[str] = None  # default per kind

    def build(self):
        from vaemolsim_tpu import losses

        classes = {"none": losses.NonRegularizer,
                   "kl": losses.KLDivergenceEstimate,
                   "log_prob": losses.LogProbRegularizer,
                   "reverse_kl": losses.ReverseKLDivergenceEstimate}
        try:
            cls = classes[self.kind]
        except KeyError:
            raise ValueError(f"Unknown regularizer kind {self.kind!r}; "
                             f"one of {sorted(classes)}")
        kw: Dict[str, Any] = {"weight": self.weight}
        if self.sample_dist is not None:
            kw["sample_dist"] = self.sample_dist
        return cls(**kw)


@dataclass
class MappingToDistConfig:
    """MappingToDistribution: auto-sized FCDeepNN trunk + dist layer
    (reference vaemolsim/models.py:153-237)."""

    input_shape: Union[int, List[int]] = 1
    dist: Union[DistLayerConfig, FlowedDistConfig] = field(
        default_factory=DistLayerConfig)
    mapping_kwargs: Optional[Dict[str, Any]] = None
    name: str = "map_to_dist"

    def build(self, key: jax.Array):
        from vaemolsim_tpu.models import MappingToDistribution

        k_dist, k_map = jax.random.split(key)
        dist = self.dist.build(k_dist) if isinstance(
            self.dist, FlowedDistConfig) else self.dist.build(key=k_dist)
        return MappingToDistribution.create(
            k_map, dist, input_shape=_shape(self.input_shape),
            mapping_kwargs=self.mapping_kwargs, name=self.name)


@dataclass
class FlowModelConfig:
    """FlowModel: optional mapping + flowed distribution (reference
    vaemolsim/models.py:16-148)."""

    flowed_dist: FlowedDistConfig = field(default_factory=FlowedDistConfig)
    input_shape: Optional[Union[int, List[int]]] = None
    mapping_kwargs: Optional[Dict[str, Any]] = None

    def build(self, key: jax.Array):
        from vaemolsim_tpu.models import FlowModel

        k_dist, k_map = jax.random.split(key)
        return FlowModel.create(k_map, self.flowed_dist.build(k_dist),
                                input_shape=_shape(self.input_shape),
                                mapping_kwargs=self.mapping_kwargs)


@dataclass
class VAEConfig:
    """Full VAE: encoder/decoder MappingToDistribution configs, a prior
    (flowed or standard normal), and a regularizer (reference
    vaemolsim/models.py:242-332)."""

    encoder: MappingToDistConfig = field(default_factory=MappingToDistConfig)
    decoder: MappingToDistConfig = field(default_factory=MappingToDistConfig)
    prior: Optional[FlowedDistConfig] = None  # None -> standard normal
    latent_dim: int = 1
    regularizer: RegularizerConfig = field(default_factory=RegularizerConfig)
    dual_elbo: bool = False
    reverse_regularizer: Optional[RegularizerConfig] = None

    def build(self, key: jax.Array):
        import jax.numpy as jnp

        from vaemolsim_tpu.models import VAE, VAEDualELBO
        from vaemolsim_tpu.ops import distributions as d

        k_enc, k_dec, k_prior = jax.random.split(key, 3)
        encoder = self.encoder.build(k_enc)
        decoder = self.decoder.build(k_dec)
        if self.prior is not None:
            prior = self.prior.build(k_prior)
        else:
            prior = d.Independent(
                d.Normal(jnp.zeros(self.latent_dim),
                         jnp.ones(self.latent_dim)), 1)
        if self.dual_elbo:
            rev = (self.reverse_regularizer or
                   RegularizerConfig(kind="reverse_kl")).build()
            return VAEDualELBO(encoder=encoder, decoder=decoder, prior=prior,
                               regularizer_forward=self.regularizer.build(),
                               regularizer_reverse=rev)
        return VAE(encoder=encoder, decoder=decoder, prior=prior,
                   regularizer=self.regularizer.build())


@dataclass
class BackmappingConfig:
    """BackmappingOnly: DistanceSelection + ParticleEmbedding feeding a
    decoding MappingToDistribution (reference vaemolsim/models.py:470-572;
    Molecular_Backmapping workload defaults)."""

    selection: DistanceSelectionConfig = field(
        default_factory=lambda: DistanceSelectionConfig(max_included=10))
    embedding: ParticleEmbeddingConfig = field(
        default_factory=ParticleEmbeddingConfig)
    decoder: MappingToDistConfig = field(default_factory=MappingToDistConfig)

    def build(self, key: jax.Array):
        from vaemolsim_tpu.models import BackmappingOnly
        from vaemolsim_tpu.nn import LocalParticleDescriptors

        k_embed, k_dec = jax.random.split(key)
        lpd = LocalParticleDescriptors(
            select=self.selection.build(),
            embed=self.embedding.build(k_embed))
        return BackmappingOnly(mask_and_embed=lpd,
                               decoder=self.decoder.build(k_dec))


@dataclass
class OptimizerConfig:
    """optax optimizer knobs (reference trains with Adam)."""

    name: str = "adam"
    learning_rate: float = 1e-3
    weight_decay: float = 0.0

    def build(self):
        import optax

        if self.weight_decay and self.name != "adamw":
            raise ValueError(
                f"weight_decay={self.weight_decay} is only applied by "
                f"name='adamw'; with {self.name!r} it would be silently "
                "dropped while the saved config claims otherwise")
        if self.name == "adam":
            return optax.adam(self.learning_rate)
        if self.name == "adamw":
            return optax.adamw(self.learning_rate,
                               weight_decay=self.weight_decay)
        if self.name == "sgd":
            return optax.sgd(self.learning_rate)
        raise ValueError(f"Unknown optimizer {self.name!r}")


@dataclass
class ExperimentConfig:
    """One JSON = one reproducible experiment: model + optimizer +
    training + MC run knobs + the PRNG seed.  ``build()`` returns the
    model; pair with ``save_json``/``load_json`` and orbax weight
    checkpoints for full restore in a fresh process."""

    model: Union[VAEConfig, FlowModelConfig, BackmappingConfig,
                 MappingToDistConfig] = field(default_factory=VAEConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    seed: int = 0
    num_epochs: int = 1
    batch_size: Optional[int] = None
    mcmc: Optional[MCMCConfig] = None

    def build(self):
        return self.model.build(jax.random.PRNGKey(self.seed))


def _shape(s):
    if isinstance(s, list):
        return tuple(s)
    return s


def flagship_experiment_config() -> "ExperimentConfig":
    """The bench/dryrun flagship (config-4/5 workload, SURVEY.md §6): VAE
    with a 2-block RQS-spline MAF flow prior over a 1-D standard-normal
    latent, normal blockwise encoder/decoder, KL regularizer — fully
    reconstructible from one JSON (SURVEY.md §5.4)."""
    return ExperimentConfig(
        model=VAEConfig(
            encoder=MappingToDistConfig(
                input_shape=2,
                dist=DistLayerConfig(kind="independent_blockwise",
                                     num_dofs=1, families="normal"),
                mapping_kwargs={"hidden_dim": 200}),
            decoder=MappingToDistConfig(
                input_shape=1,
                dist=DistLayerConfig(kind="independent_blockwise",
                                     num_dofs=2, families="normal"),
                mapping_kwargs={"hidden_dim": 200}),
            prior=FlowedDistConfig(
                flow=MAFConfig(data_dim=1, num_blocks=2,
                               rqs=RQSParams(num_bins=32, hidden_dim=200,
                                             bin_range=(-5.0, 5.0))),
                base=None, static_base_dim=1),
            latent_dim=1,
            regularizer=RegularizerConfig(kind="kl")),
        mcmc=MCMCConfig(n_chains=10_000, n_steps=100))


_CONFIG_REGISTRY: Dict[str, type] = {
    c.__name__: c
    for c in (RQSParams, RealNVPConfig, MAFConfig, MappingConfig,
              DistanceSelectionConfig, ParticleEmbeddingConfig, MCMCConfig,
              DistLayerConfig, FlowedDistConfig, RegularizerConfig,
              MappingToDistConfig, FlowModelConfig, VAEConfig,
              BackmappingConfig, OptimizerConfig, ExperimentConfig)
}
