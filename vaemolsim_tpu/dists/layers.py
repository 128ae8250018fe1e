"""Distribution-emitting layers: raw network outputs -> distribution pytrees.

TPU-first replacement for vaemolsim/dists.py (reference L3 layer).  A
"layer" here is a (mostly parameter-free) struct whose ``__call__`` maps a
raw parameter tensor to a distribution object, plus a ``params_size()``
protocol so upstream mappings can be auto-sized (reference idiom 3,
vaemolsim/dists.py:219-233, models.py:197-204).

The reference's per-DOF Python-object loop over heterogeneous tfp
distributions (vaemolsim/dists.py:210-217) is replaced by *family
grouping*: DOFs sharing a distribution family are evaluated in one fused
vectorized op (``ops.distributions.Blockwise``), eliminating the per-DOF
interpreter overhead on the ELBO hot path (SURVEY.md §3.1 hot spots).

Parameter-constraint transforms reproduce the reference's
``make_param_transform`` (vaemolsim/dists.py:28-87) including its
von Mises special case: loc = atan2(p0, p1) (wrapped to [-pi, pi]) and
concentration soft-clipped to [eps, sqrt(float32.max)/2]
(dists.py:59-72) — the load-bearing overflow guard (SURVEY.md §5.2).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from vaemolsim_tpu.nn.core import MADE
from vaemolsim_tpu.ops import bijectors as bj
from vaemolsim_tpu.ops import distributions as dl

Array = jax.Array

__all__ = [
    "FAMILY_REGISTRY",
    "register_family",
    "family_param_count",
    "build_family_dist",
    "register_von_mises_mixture",
    "IndependentBlockwise",
    "AutoregressiveBlockwise",
    "AutoregressiveBlockwiseDistribution",
    "FlowedDistribution",
    "StaticFlowedDistribution",
    "IndependentVonMises",
    "IndependentDeterministic",
]

_F32_EPS = float(np.finfo(np.float32).eps)
_VM_CONC_HIGH = float(np.sqrt(np.finfo(np.float32).max) / 2.0)
_vm_softclip = bj.SoftClip(low=_F32_EPS, high=_VM_CONC_HIGH)


def _positive(x: Array) -> Array:
    """Default positivity constraint (TFP's softplus-with-eps-floor)."""
    return jax.nn.softplus(x) + _F32_EPS


def _safe_atan2_loc(sin_raw: Array, cos_raw: Array) -> Array:
    """atan2 with a finite gradient at the (0, 0) degenerate point.

    Raw (sin, cos) heads are exactly (0, 0) whenever an upstream
    conditioning context is all-zero (e.g. a fully-masked empty
    neighborhood feeding a zero-initialized head): plain atan2's
    gradient ``(cos, -sin)/(sin^2+cos^2)`` is NaN there and one such
    sample poisons the whole batch's gradient.  The double-``where``
    guard pins loc = atan2(0, 1) = 0 with zero gradient at that point
    and is bit-identical to plain atan2 everywhere else.  (The
    reference inherits TF's NaN here — a bug to fix, not copy,
    vaemolsim/dists.py:59-72.)
    """
    degenerate = (sin_raw == 0.0) & (cos_raw == 0.0)
    safe_cos = jnp.where(degenerate, 1.0, cos_raw)
    return jnp.arctan2(jnp.where(degenerate, 0.0, sin_raw), safe_cos)


def _von_mises_from_raw(raw: Array) -> dl.VonMises:
    """Reference vaemolsim/dists.py:59-72: sin/cos pair -> wrapped loc,
    SoftClip-bounded concentration."""
    loc = _safe_atan2_loc(raw[..., 0], raw[..., 1])
    conc = _vm_softclip.forward(raw[..., 2])
    return dl.VonMises(loc=loc, concentration=conc)


def _von_mises_mixture_from_raw(n_components: int):
    """Per-DOF von Mises mixture (BASELINE config 3: periodic von-Mises
    mixture heads).  Raw layout per component: (sin, cos, raw_conc) then
    n mixing logits => 4*n params per DOF."""

    def build(raw: Array) -> dl.MixtureSameFamily:
        n = n_components
        comp = raw[..., : 3 * n].reshape(raw.shape[:-1] + (n, 3))
        loc = _safe_atan2_loc(comp[..., 0], comp[..., 1])
        conc = _vm_softclip.forward(comp[..., 2])
        logits = raw[..., 3 * n:]
        return dl.MixtureSameFamily(
            mixing_logits=logits,
            components=dl.VonMises(loc=loc, concentration=conc))

    return build


def register_von_mises_mixture(n_components: int) -> str:
    """Register (idempotently) and return the family name for a von Mises
    mixture with ``n_components`` components per DOF."""
    name = f"von_mises_mixture_{n_components}"
    if name not in FAMILY_REGISTRY:
        register_family(name, 4 * n_components,
                        _von_mises_mixture_from_raw(n_components))
    return name


# Family name -> (param_count, raw (..., n, p) -> scalar dist batch (..., n)).
FAMILY_REGISTRY: Dict[str, Tuple[int, Callable[[Array], dl.Distribution]]] = {
    "normal": (2, lambda r: dl.Normal(loc=r[..., 0],
                                      scale=_positive(r[..., 1]))),
    # Reference +1 rule for VonMises: 2 raw values for loc + 1 for
    # concentration (vaemolsim/dists.py:164-173).
    "von_mises": (3, _von_mises_from_raw),
    "deterministic": (1, lambda r: dl.Deterministic(loc=r[..., 0])),
    "beta": (2, lambda r: dl.Beta(concentration1=_positive(r[..., 0]),
                                  concentration0=_positive(r[..., 1]))),
    "gamma": (2, lambda r: dl.Gamma(concentration=_positive(r[..., 0]),
                                    rate=_positive(r[..., 1]))),
}

_CLASS_ALIASES = {
    dl.Normal: "normal",
    dl.VonMises: "von_mises",
    dl.Deterministic: "deterministic",
    dl.Beta: "beta",
    dl.Gamma: "gamma",
}


def register_family(name: str, param_count: int,
                    build: Callable[[Array], dl.Distribution]) -> None:
    """Extension point mirroring the reference's acceptance of arbitrary
    distribution classes / transform_fns (vaemolsim/dists.py:28-87)."""
    FAMILY_REGISTRY[name] = (param_count, build)


def _canon_family(f) -> str:
    if isinstance(f, str):
        if f not in FAMILY_REGISTRY:
            raise ValueError(f"Unknown distribution family {f!r}; known: "
                             f"{sorted(FAMILY_REGISTRY)}; use "
                             f"register_family() to add one.")
        return f
    if f in _CLASS_ALIASES:
        return _CLASS_ALIASES[f]
    raise ValueError(f"Cannot resolve distribution family from {f!r}")


def family_param_count(f) -> int:
    return FAMILY_REGISTRY[_canon_family(f)][0]


def build_family_dist(f, raw: Array) -> dl.Distribution:
    return FAMILY_REGISTRY[_canon_family(f)][1](raw)


def _group_dofs(families: Sequence[str]):
    """Group DOF indices by family, preserving first-appearance order."""
    groups: Dict[str, list] = {}
    for i, f in enumerate(families):
        groups.setdefault(f, []).append(i)
    return tuple(groups.items())


@struct.dataclass
class IndependentBlockwise:
    """N independent heterogeneous 1-D distributions over an event vector.

    Reference analog: ``IndependentBlockwise`` (vaemolsim/dists.py:97-243).
    Accepts one family for all DOFs or a per-DOF list; raw input of shape
    ``(..., params_size())`` is split per-DOF (static slices), grouped by
    family, and built into a fused ``ops.distributions.Blockwise``.
    """

    families: Tuple[str, ...] = struct.field(pytree_node=False)

    @classmethod
    def create(cls, num_dofs: int,
               dist_classes: Union[str, type, Sequence] = "normal"
               ) -> "IndependentBlockwise":
        if isinstance(dist_classes, (str, type)):
            fams = (_canon_family(dist_classes),) * num_dofs
        else:
            if len(dist_classes) != num_dofs:
                raise ValueError(
                    f"Got {len(dist_classes)} families for {num_dofs} DOFs "
                    f"(reference contract, vaemolsim/dists.py:152-161)")
            fams = tuple(_canon_family(f) for f in dist_classes)
        return cls(families=fams)

    @property
    def num_dofs(self) -> int:
        return len(self.families)

    @property
    def param_nums(self) -> Tuple[int, ...]:
        return tuple(family_param_count(f) for f in self.families)

    def params_size(self) -> int:
        return sum(self.param_nums)

    def _param_slices(self) -> Tuple[Tuple[int, int], ...]:
        out, start = [], 0
        for p in self.param_nums:
            out.append((start, start + p))
            start += p
        return tuple(out)

    def __call__(self, raw: Array, train: bool = False) -> dl.Blockwise:
        del train  # uniform dist-layer signature; no train-dependent parts
        if raw.shape[-1] != self.params_size():
            raise ValueError(
                f"Expected last dim {self.params_size()}, got {raw.shape}")
        slices = self._param_slices()
        fam_dists, fam_indices = [], []
        for fam, idx in _group_dofs(self.families):
            p = family_param_count(fam)
            # (..., n_f, p): stack this family's per-DOF raw slices.
            cols = jnp.stack([raw[..., slices[i][0]:slices[i][1]]
                              for i in idx], axis=-2)
            fam_dists.append(build_family_dist(fam, cols))
            fam_indices.append(tuple(idx))
        return dl.Blockwise(families=tuple(fam_dists),
                            dof_indices=tuple(fam_indices))


@struct.dataclass
class AutoregressiveBlockwiseDistribution(dl.Distribution):
    """The distribution emitted by :class:`AutoregressiveBlockwise`.

    Semantics follow ``tfp.distributions.Autoregressive`` as configured by
    the reference (vaemolsim/dists.py:298-340): the per-step distribution
    is the blockwise family set whose raw parameters are the layer input
    *plus* a MADE shift computed from the previous sample; sampling starts
    from ones and performs ``num_dofs`` refinement steps; log_prob is a
    single parallel pass.
    """

    raw: Array  # (..., D, P) layer input
    made: MADE
    blockwise: IndependentBlockwise
    conditional_input: Optional[Array] = None

    @property
    def batch_shape(self):
        return self.raw.shape[:-2]

    @property
    def event_shape(self):
        return (self.blockwise.num_dofs,)

    def _dist_at(self, x: Array) -> dl.Blockwise:
        shift = self.made(x, self.conditional_input)  # (..., D, P)
        params = self.raw + shift
        # Flatten per-DOF param rows back to the blockwise layout: DOF i
        # consumes its first param_nums[i] columns (reference pads all
        # DOFs to max(param_nums), dists.py:291-296).
        cols = []
        for i, p in enumerate(self.blockwise.param_nums):
            cols.append(params[..., i, :p])
        flat = jnp.concatenate(cols, axis=-1)
        return self.blockwise(flat)

    def log_prob(self, x: Array) -> Array:
        return self._dist_at(x).log_prob(x)

    def sample(self, key: Array, sample_shape: Tuple[int, ...] = ()) -> Array:
        D = self.blockwise.num_dofs
        shape = tuple(sample_shape) + self.batch_shape + (D,)
        x0 = jnp.ones(shape, self.raw.dtype)

        # The SAME key is reused for every refinement pass (as in
        # tfp.distributions.Autoregressive): with fixed noise the loop is
        # a fixed-point iteration — after k passes all DOFs of
        # autoregressive depth <= k are final, so D passes converge and
        # each DOF is drawn from its own conditional given the *returned*
        # values of its parents.  Fresh per-step keys would leave DOF j
        # conditioned on stale parent draws.
        def body(x, _):
            return self._dist_at(x).sample(key), None

        x, _ = jax.lax.scan(body, x0, None, length=D)
        return x


@struct.dataclass
class AutoregressiveBlockwise:
    """Blockwise distribution with an owned MADE autoregressive shift.

    Reference analog: ``AutoregressiveBlockwise``
    (vaemolsim/dists.py:246-366).  ``params_size()`` returns the 2-D shape
    ``(num_dofs, max(param_nums))`` the upstream mapping must produce
    (dists.py:342-358).
    """

    made: MADE
    blockwise: IndependentBlockwise

    @classmethod
    def create(cls, key: Array, num_dofs: int,
               dist_classes: Union[str, type, Sequence] = "normal",
               conditional: bool = False,
               conditional_event_shape: Optional[int] = None,
               auto_net_params: Optional[dict] = None
               ) -> "AutoregressiveBlockwise":
        bw = IndependentBlockwise.create(num_dofs, dist_classes)
        max_p = max(bw.param_nums)
        net_kw = dict(auto_net_params or {})
        net_kw.setdefault("hidden_units", [num_dofs * max_p])
        made = MADE.create(key, num_dofs, max_p,
                           conditional=conditional,
                           conditional_event_size=conditional_event_shape,
                           **net_kw)
        return cls(made=made, blockwise=bw)

    @property
    def conditional(self) -> bool:
        return self.made.conditional

    def params_size(self) -> Tuple[int, int]:
        return (self.blockwise.num_dofs, max(self.blockwise.param_nums))

    def __call__(self, raw: Array,
                 conditional_input: Optional[Array] = None,
                 train: bool = False) -> AutoregressiveBlockwiseDistribution:
        expected = self.params_size()
        if raw.shape[-2:] != expected:
            raise ValueError(
                f"Input must be shaped (..., {expected[0]}, {expected[1]}), "
                f"got {raw.shape} (reference contract, dists.py:291-296)")
        if self.conditional and conditional_input is None:
            raise ValueError("conditional_input required for conditional "
                             "AutoregressiveBlockwise")
        return AutoregressiveBlockwiseDistribution(
            raw=raw, made=self.made, blockwise=self.blockwise,
            conditional_input=conditional_input)


@struct.dataclass
class FlowedDistribution:
    """(flow, base dist layer) composition: build the base distribution
    from inputs, then push it through the flow.

    Reference analog: ``FlowedDistribution`` (vaemolsim/dists.py:369-466);
    ``conditional`` mirrors the flow's flag (dists.py:412), and
    conditional inputs / train flag are forwarded (dists.py:414-439).
    """

    flow: Any
    base_layer: Any

    @property
    def conditional(self) -> bool:
        return getattr(self.flow, "conditional", False)

    def params_size(self):
        return self.base_layer.params_size()

    def __call__(self, raw: Array,
                 conditional_input: Optional[Array] = None,
                 train: bool = False) -> dl.TransformedDistribution:
        base = self.base_layer(raw)
        if self.conditional:
            return self.flow(base, train=train,
                             conditional_input=conditional_input)
        return self.flow(base, train=train)


@struct.dataclass
class StaticFlowedDistribution:
    """Flow over a *fixed* base distribution; layer inputs are ignored
    except for their batch shape (reference vaemolsim/dists.py:478-538)."""

    flow: Any
    base: dl.Distribution

    @property
    def conditional(self) -> bool:
        return getattr(self.flow, "conditional", False)

    def __call__(self, inputs: Optional[Array] = None,
                 conditional_input: Optional[Array] = None,
                 train: bool = False) -> dl.TransformedDistribution:
        del inputs
        if self.conditional:
            return self.flow(self.base, train=train,
                             conditional_input=conditional_input)
        return self.flow(self.base, train=train)


@struct.dataclass
class IndependentVonMises:
    """Independent von Mises over ``event_dim`` DOFs: 3 raw params per DOF
    (sin, cos, raw concentration), loc = atan2, concentration = softplus.

    Reference analog: ``IndependentVonMises`` (vaemolsim/dists.py:545-638)
    — note this layer uses plain softplus for concentration
    (dists.py:602-607), unlike the blockwise von Mises transform's
    SoftClip.
    """

    event_dim: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, event_dim: int) -> "IndependentVonMises":
        return cls(event_dim=event_dim)

    def params_size(self) -> int:
        return 3 * self.event_dim

    def __call__(self, raw: Array, train: bool = False) -> dl.Independent:
        p = raw.reshape(raw.shape[:-1] + (self.event_dim, 3))
        loc = _safe_atan2_loc(p[..., 0], p[..., 1])
        conc = jax.nn.softplus(p[..., 2])
        return dl.Independent(dl.VonMises(loc=loc, concentration=conc), 1)


@struct.dataclass
class IndependentDeterministic:
    """Dirac-delta layer: 1 param per DOF, the reference's deterministic
    CG encoder (vaemolsim/dists.py:642-732)."""

    event_dim: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, event_dim: int) -> "IndependentDeterministic":
        return cls(event_dim=event_dim)

    def params_size(self) -> int:
        return self.event_dim

    def __call__(self, raw: Array, train: bool = False) -> dl.Independent:
        if raw.shape[-1] != self.event_dim:
            raise ValueError(f"Expected last dim {self.event_dim}, "
                             f"got {raw.shape}")
        return dl.Independent(dl.Deterministic(loc=raw), 1)
