"""Neural-net building blocks as parameter pytrees (equinox-style).

Every layer is a ``flax.struct`` dataclass: parameter arrays are pytree
leaves (directly trainable with optax, vmappable, shardable), structural
configuration is static.  Layers are created with shape-driven
``create(key, ...)`` classmethods (the JAX equivalent of the reference's
Keras build-on-first-call idiom, SURVEY.md §1 idiom 6) and applied by
calling.

Includes the MADE masked autoregressive network — the first-party
replacement for ``tfp.bijectors.AutoregressiveNetwork``
(vaemolsim/flows.py:454-487, vaemolsim/dists.py:301-305): masked dense
matmuls with precomputed static masks, configurable input order
(left-to-right / right-to-left / explicit permutation), and optional
unmasked conditional input into EVERY layer including the output head
(TFP AutoregressiveNetwork's all-layers default — see MADE.create).
Masked matmuls are plain XLA (they land on the MXU; masks fold into
the weights).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

Array = jax.Array

__all__ = ["Dense", "MLP", "BatchNorm", "LayerNorm", "MADE",
           "resolve_activation", "glorot_uniform",
           "truncated_normal_init"]

_ACTIVATIONS = {
    None: lambda x: x,
    "linear": lambda x: x,
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "gelu": jax.nn.gelu,
    "sigmoid": jax.nn.sigmoid,
    "softplus": jax.nn.softplus,
    "swish": jax.nn.swish,
    "leaky_relu": jax.nn.leaky_relu,
    # SchNet's shifted softplus, ssp(0) = 0 (nn/schnet.py).
    "shifted_softplus": lambda x: jax.nn.softplus(x) - 0.6931471805599453,
}


_COMPUTE_DTYPE = None  # None = params' native dtype (float32)


def set_compute_dtype(dtype) -> None:
    """Set the matmul compute dtype for Dense/MADE stacks (e.g.
    ``jnp.bfloat16`` on TPU: halves activation HBM traffic and uses
    native MXU bf16).  Outputs are cast back to the input dtype, so
    downstream distribution arithmetic stays float32.  ``None`` restores
    full precision.

    Note for MC proposals: running the proposal networks in bf16 leaves
    Metropolis-Hastings *exact* — the proposal distribution is whatever
    function the nets compute, and forward/reverse densities use the same
    function — it only changes which (equally valid) proposal is used.
    """
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = dtype


def compute_dtype():
    return _COMPUTE_DTYPE


def resolve_activation(name) -> Callable[[Array], Array]:
    if callable(name):
        return name
    try:
        return _ACTIVATIONS[name]
    except KeyError:
        raise ValueError(f"Unknown activation {name!r}; "
                         f"one of {sorted(k for k in _ACTIVATIONS if k)}")


def glorot_uniform(key: Array, shape: Tuple[int, int], dtype=jnp.float32) -> Array:
    """Keras-default Glorot/Xavier uniform (reference mappings.py:50)."""
    fan_in, fan_out = shape[0], shape[1]
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)


def truncated_normal_init(key: Array, shape: Tuple[int, int],
                          dtype=jnp.float32, stddev: float = 0.05) -> Array:
    """Keras-default TruncatedNormal (reference flows.py:109)."""
    return stddev * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


_INITIALIZERS = {
    "glorot_uniform": glorot_uniform,
    "truncated_normal": truncated_normal_init,
}


def resolve_initializer(name):
    if callable(name):
        return name
    return _INITIALIZERS[name]


@struct.dataclass
class Dense:
    """y = activation(x @ kernel + bias)."""

    kernel: Array  # (in_dim, out_dim)
    bias: Array  # (out_dim,)
    activation: Optional[str] = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, key: Array, in_dim: int, out_dim: int,
               activation: Optional[str] = None,
               kernel_initializer="glorot_uniform") -> "Dense":
        init = resolve_initializer(kernel_initializer)
        return cls(kernel=init(key, (in_dim, out_dim)),
                   bias=jnp.zeros((out_dim,)),
                   activation=activation)

    def __call__(self, x: Array) -> Array:
        cd = compute_dtype()
        if cd is not None:
            # Same dtype flow as ops.fused_mlp.dense_stack_xla (matmul,
            # bias-add, AND activation all in the compute dtype; output
            # cast back to the input dtype) so per-layer and fused-stack
            # paths produce identical bf16 numerics for the same weights.
            y = x.astype(cd) @ self.kernel.astype(cd) + self.bias.astype(cd)
            y = resolve_activation(self.activation)(y)
            return y.astype(x.dtype)
        return resolve_activation(self.activation)(x @ self.kernel
                                                   + self.bias)

    @property
    def in_dim(self) -> int:
        return self.kernel.shape[0]

    @property
    def out_dim(self) -> int:
        return self.kernel.shape[1]


@struct.dataclass
class BatchNorm:
    """Batch normalization over the last axis with running statistics.

    ``__call__(x, train)``: with ``train=True`` normalizes by batch
    moments; ``train=False`` uses running stats.  ``call_and_update``
    additionally returns the layer with EMA-updated running statistics —
    the functional replacement for Keras' in-op update
    (reference mappings.py:113-114).  ``train`` must be a Python bool
    (static under jit).
    """

    mean: Array
    var: Array
    scale: Array
    offset: Array
    momentum: float = struct.field(pytree_node=False, default=0.99)
    eps: float = struct.field(pytree_node=False, default=1e-3)

    @classmethod
    def create(cls, dim: int, momentum: float = 0.99) -> "BatchNorm":
        return cls(mean=jnp.zeros(dim), var=jnp.ones(dim),
                   scale=jnp.ones(dim), offset=jnp.zeros(dim),
                   momentum=momentum)

    def _norm(self, x, m, v):
        return (x - m) * jax.lax.rsqrt(v + self.eps) * self.scale + self.offset

    def __call__(self, x: Array, train: bool = False) -> Array:
        if train:
            axes = tuple(range(x.ndim - 1))
            m, v = jnp.mean(x, axes), jnp.var(x, axes)
        else:
            m, v = self.mean, self.var
        return self._norm(x, m, v)

    def call_and_update(self, x: Array, train: bool = False):
        if not train:
            return self(x, False), self
        axes = tuple(range(x.ndim - 1))
        m, v = jnp.mean(x, axes), jnp.var(x, axes)
        mom = self.momentum
        new = self.replace(mean=mom * self.mean + (1 - mom) * m,
                           var=mom * self.var + (1 - mom) * v)
        return self._norm(x, m, v), new


@struct.dataclass
class LayerNorm:
    """Layer normalization over the last axis."""

    scale: Array
    offset: Array
    eps: float = struct.field(pytree_node=False, default=1e-3)

    @classmethod
    def create(cls, dim: int) -> "LayerNorm":
        return cls(scale=jnp.ones(dim), offset=jnp.zeros(dim))

    def __call__(self, x: Array) -> Array:
        m = jnp.mean(x, axis=-1, keepdims=True)
        v = jnp.var(x, axis=-1, keepdims=True)
        return (x - m) * jax.lax.rsqrt(v + self.eps) * self.scale + self.offset


@struct.dataclass
class MLP:
    """Dense stack with a shared hidden activation and a linear head."""

    layers: Tuple[Dense, ...]

    @classmethod
    def create(cls, key: Array, in_dim: int, hidden_dims: Sequence[int],
               out_dim: int, activation: str = "relu",
               kernel_initializer="glorot_uniform") -> "MLP":
        dims = [in_dim] + list(hidden_dims) + [out_dim]
        keys = jax.random.split(key, len(dims) - 1)
        layers = []
        for i, (d_in, d_out) in enumerate(zip(dims[:-1], dims[1:])):
            act = activation if i < len(dims) - 2 else None
            layers.append(Dense.create(keys[i], d_in, d_out, act,
                                       kernel_initializer))
        return cls(layers=tuple(layers))

    def __call__(self, x: Array) -> Array:
        for layer in self.layers:
            x = layer(x)
        return x


# ---------------------------------------------------------------------------
# MADE
# ---------------------------------------------------------------------------


def _resolve_input_order(input_order, event_size: int) -> np.ndarray:
    """Degrees 1..D for each input position."""
    if isinstance(input_order, str):
        if input_order == "left-to-right":
            return np.arange(1, event_size + 1)
        if input_order == "right-to-left":
            return np.arange(event_size, 0, -1)
        raise ValueError(f"Unknown input_order {input_order!r}")
    order = np.asarray(input_order, dtype=np.int64)
    if sorted(order.tolist()) != list(range(1, event_size + 1)):
        raise ValueError(
            f"input_order must be a permutation of 1..{event_size}, got {order}")
    return order



@functools.lru_cache(maxsize=None)
def _made_masks_cached(degrees_in: Tuple[int, ...],
                       hidden_units: Tuple[int, ...],
                       params_per_dim: int):
    return tuple(_made_masks(np.asarray(degrees_in), hidden_units,
                             params_per_dim))


def _made_masks(degrees_in: np.ndarray, hidden_units: Sequence[int],
                params_per_dim: int):
    """Binary masks enforcing the autoregressive property.

    Standard MADE (Germain et al. 2015): hidden degrees cycle through
    1..D-1; connection allowed input->hidden when deg_h >= deg_in,
    hidden->hidden when deg_out >= deg_in, hidden->output when
    deg_out > deg_h (strict).  D==1 degenerates to a constant net (the
    single DOF may not see itself), matching the masked-autoregressive
    semantics for one-dimensional events.
    """
    D = len(degrees_in)
    degrees = [degrees_in]
    for h in hidden_units:
        if D > 1:
            degrees.append(np.arange(h) % (D - 1) + 1)
        else:
            degrees.append(np.zeros(h, dtype=np.int64))
    masks = []
    for i in range(len(hidden_units)):
        masks.append((degrees[i + 1][None, :] >= degrees[i][:, None]
                      ).astype(np.float32))
    # Output mask: (last_hidden, D * params_per_dim); output dof j repeats
    # params_per_dim times.
    out_deg = np.repeat(degrees_in, params_per_dim)
    masks.append((out_deg[None, :] > degrees[-1][:, None]).astype(np.float32))
    return masks


@struct.dataclass
class MADE:
    """Masked autoregressive dense network.

    Maps ``(..., D)`` (+ optional conditional ``(..., C)``) to
    ``(..., D, params_per_dim)`` such that output slice ``[..., j, :]``
    depends only on inputs with strictly smaller degree than DOF j under
    ``input_order``.  First-party replacement for
    ``tfp.bijectors.AutoregressiveNetwork`` (vaemolsim/flows.py:454-487).

    Masks are static constants folded into the matmuls by XLA.
    """

    kernels: Tuple[Array, ...]
    biases: Tuple[Array, ...]
    cond_kernels: Optional[Tuple[Array, ...]]  # unmasked, one per layer
    params_per_dim: int = struct.field(pytree_node=False)
    event_size: int = struct.field(pytree_node=False)
    activation: str = struct.field(pytree_node=False, default="tanh")
    input_order_static: Tuple[int, ...] = struct.field(pytree_node=False,
                                                       default=())

    @property
    def masks(self):
        """Autoregressive masks, recomputed from static config (cached);
        they are trace-time constants, not trainable leaves."""
        hidden_units = tuple(k.shape[1] for k in self.kernels[:-1])
        return _made_masks_cached(self.input_order_static, hidden_units,
                                  self.params_per_dim)

    @classmethod
    def create(cls, key: Array, event_size: int, params_per_dim: int,
               hidden_units: Sequence[int] = (200,),
               input_order="left-to-right",
               conditional: bool = False,
               conditional_event_size: Optional[int] = None,
               activation: str = "tanh",
               kernel_initializer="truncated_normal") -> "MADE":
        degrees_in = _resolve_input_order(input_order, event_size)
        dims = ([event_size] + list(hidden_units)
                + [event_size * params_per_dim])
        init = resolve_initializer(kernel_initializer)
        n_layers = len(dims) - 1
        keys = jax.random.split(key, n_layers + 1)
        kernels, biases = [], []
        for i in range(n_layers):
            kernels.append(init(keys[i], (dims[i], dims[i + 1])))
            biases.append(jnp.zeros((dims[i + 1],)))
        cond_kernels = None
        if conditional:
            if conditional_event_size is None:
                raise ValueError(
                    "conditional_event_size required when conditional=True "
                    "(reference flows.py:450-487 contract)")
            # Conditional input feeds every layer (matching TFP
            # AutoregressiveNetwork's conditional_input_layers="all_layers"
            # default) so even the lowest-degree DOF is conditioned.
            ckeys = jax.random.split(keys[-1], n_layers)
            cond_kernels = tuple(
                init(ckeys[i], (conditional_event_size, dims[i + 1]))
                for i in range(n_layers))
        return cls(
            kernels=tuple(kernels), biases=tuple(biases),
            cond_kernels=cond_kernels,
            params_per_dim=params_per_dim, event_size=event_size,
            activation=activation,
            input_order_static=tuple(int(d) for d in degrees_in))

    @property
    def conditional(self) -> bool:
        return self.cond_kernels is not None

    def __call__(self, x: Array,
                 conditional_input: Optional[Array] = None) -> Array:
        if self.conditional and conditional_input is None:
            raise ValueError(
                "This MADE network is conditional; conditional_input is "
                "required (mirrors reference flows.py conditional contract).")
        if not self.conditional and conditional_input is not None:
            raise ValueError(
                "conditional_input passed to a non-conditional MADE; "
                "build it with conditional=True (silently ignoring the "
                "context would train an unconditioned model).")
        from vaemolsim_tpu.ops.fused_mlp import fused_dense_stack
        n = len(self.kernels)
        masked = [self.kernels[i] * self.masks[i] for i in range(n)]
        acts = [self.activation] * (n - 1) + [None]
        h = fused_dense_stack(x, masked, self.biases, acts,
                              cond=conditional_input,
                              cond_kernels=self.cond_kernels)
        return h.reshape(h.shape[:-1] + (self.event_size, self.params_per_dim))
