"""Flow matching: continuous normalizing flows without ODE training.

Beyond-reference capability, frontier of the reference's discrete
spline-flow family (/root/reference/vaemolsim/flows.py): a
continuous-time generative model whose velocity field is trained by
*conditional flow matching* (Lipman et al. 2023, "Flow Matching for
Generative Modeling"; the optimal-transport linear path of Tong et
al. 2023) — a simple regression loss, no simulation during training —
and sampled/evaluated by integrating the probability-flow ODE.

Why it earns its place next to RQS flows: the CFM loss is ONE fused
MLP evaluation per sample (regression against an analytic target
velocity — ideal MXU work, no sequential inverse, no spline search),
expressivity is not tied to a coupling-mask topology, and exact
densities are still available through the instantaneous
change-of-variables, which this module computes with the EXACT
divergence (d extra JVPs through the velocity net, batched — for
molecular DOF counts this is cheap and removes the Hutchinson
estimator's variance entirely).

TPU design: fixed-step RK4 integration as one ``lax.scan`` (static
step count — no adaptive control flow under jit); time enters the MLP
as Fourier features; the divergence trace is a ``vmap`` over basis
JVPs fused into the same compiled program.

Everything composes with the package's conventions: parameters are
``flax.struct`` pytrees, training works through
``vaemolsim_tpu.train.fit`` via ``model.loss``, and the trained model
exposes ``sample`` / ``log_prob`` / ``sample_and_log_prob`` like every
distribution here, so it can stand in as a Boltzmann-generator
proposal exactly like the discrete flows (see
``examples/11_boltzmann_generator.py``).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from flax import struct

from vaemolsim_tpu.ops.distributions import Distribution

from vaemolsim_tpu.nn.mappings import FCDeepNN

Array = jax.Array

__all__ = ["VelocityField", "FlowMatching", "FlowMatchingDist",
           "FlowMatchingLayer"]


def _time_features(t: Array, n_freqs: int) -> Array:
    """``[t, sin(2 pi k t), cos(2 pi k t)]_{k=1..n_freqs}`` along a new
    last axis: smooth, bounded time conditioning for the MLP."""
    t = t[..., None]
    if n_freqs == 0:
        return t
    k = 2.0 * math.pi * jnp.arange(1, n_freqs + 1, dtype=t.dtype)
    ang = t * k
    return jnp.concatenate([t, jnp.sin(ang), jnp.cos(ang)], axis=-1)


@struct.dataclass
class VelocityField:
    """MLP velocity ``v(x, t [, cond]) -> dx/dt`` over flat events.

    Input is ``concat([x, time_features(t), cond])`` through an
    :class:`~vaemolsim_tpu.nn.mappings.FCDeepNN` trunk with a linear
    head of ``event_dim`` units.
    """

    net: FCDeepNN
    event_dim: int = struct.field(pytree_node=False)
    n_freqs: int = struct.field(pytree_node=False)
    cond_dim: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, key: Array, event_dim: int, *,
               hidden_dim: Union[int, Sequence[int]] = (128, 128),
               n_freqs: int = 4, cond_dim: int = 0,
               activation: str = "gelu",
               zero_init_head: bool = False) -> "VelocityField":
        """``zero_init_head=True`` zeroes the linear head so the fresh
        field is identically zero — for score/diffusion uses where the
        untrained model should BE the Gaussian prior (a random field
        amplified by ``1/sigma`` makes the reverse ODE exponentially
        unstable; gradients to the head are unaffected)."""
        in_dim = event_dim + 1 + 2 * n_freqs + cond_dim
        net = FCDeepNN.create(key, in_dim, event_dim,
                              hidden_dim=hidden_dim,
                              activation=activation)
        if zero_init_head:
            head = net.head.replace(
                kernel=jnp.zeros_like(net.head.kernel))
            net = net.replace(head=head)
        return cls(net=net, event_dim=event_dim, n_freqs=n_freqs,
                   cond_dim=cond_dim)

    def __call__(self, x: Array, t: Array,
                 conditional_input: Optional[Array] = None) -> Array:
        t = jnp.broadcast_to(jnp.asarray(t, x.dtype), x.shape[:-1])
        feats = [x, _time_features(t, self.n_freqs)]
        if self.cond_dim:
            if conditional_input is None:
                raise ValueError("conditional_input required: this "
                                 "velocity field was built with "
                                 f"cond_dim={self.cond_dim}")
            cond = jnp.broadcast_to(
                conditional_input, x.shape[:-1] + (self.cond_dim,))
            feats.append(cond)
        return self.net(jnp.concatenate(feats, axis=-1))


def _divergence(vel_of_x, x: Array) -> Tuple[Array, Array]:
    """Velocity and its EXACT divergence at ``x``: ``event_dim`` basis
    JVPs, vmapped (one fused batch of forward-mode passes)."""
    d = x.shape[-1]
    v = vel_of_x(x)

    def one(e):
        _, dv = jax.jvp(vel_of_x, (x,),
                        (jnp.broadcast_to(e, x.shape),))
        return dv

    dvs = jax.vmap(one)(jnp.eye(d, dtype=x.dtype))     # (d, ..., d)
    return v, jnp.einsum("i...i->...", dvs)


@struct.dataclass
class FlowMatching:
    """Continuous normalizing flow trained by conditional flow
    matching, with a standard-normal base over ``(event_dim,)`` events.

    - :meth:`loss` — the CFM regression ``E ||v(x_t, t) - u_t||^2``
      on the optimal-transport path ``x_t = (1-(1-sigma_min) t) x_0 +
      t x_1``, ``u_t = x_1 - (1-sigma_min) x_0`` (one net evaluation
      per sample; simulation-free).
    - :meth:`sample` — integrate ``dx/dt = v`` from t=0 to 1 by
      fixed-step RK4 under ``lax.scan``.
    - :meth:`log_prob` — integrate backward accumulating the exact
      instantaneous change-of-variables ``dlogp/dt = -div v``.
    - :meth:`sample_and_log_prob` — forward with the same
      accumulation (what an independence-proposal MC move needs).
    """

    velocity: VelocityField
    sigma_min: float = struct.field(pytree_node=False, default=1e-4)

    @classmethod
    def create(cls, key: Array, event_dim: int, *,
               hidden_dim: Union[int, Sequence[int]] = (128, 128),
               n_freqs: int = 4, cond_dim: int = 0,
               sigma_min: float = 1e-4,
               activation: str = "gelu") -> "FlowMatching":
        vel = VelocityField.create(key, event_dim,
                                   hidden_dim=hidden_dim,
                                   n_freqs=n_freqs, cond_dim=cond_dim,
                                   activation=activation)
        return cls(velocity=vel, sigma_min=float(sigma_min))

    @property
    def event_dim(self) -> int:
        return self.velocity.event_dim

    def _base_log_prob(self, x: Array) -> Array:
        d = self.event_dim
        return (-0.5 * jnp.sum(x * x, axis=-1)
                - 0.5 * d * math.log(2.0 * math.pi))

    def loss(self, key: Array, x1: Array,
             conditional_input: Optional[Array] = None) -> Array:
        """Mean conditional-flow-matching loss over the batch ``x1``
        of shape ``(..., event_dim)``."""
        k_t, k_0 = jax.random.split(key)
        t = jax.random.uniform(k_t, x1.shape[:-1], x1.dtype)
        x0 = jax.random.normal(k_0, x1.shape, x1.dtype)
        a = 1.0 - (1.0 - self.sigma_min) * t[..., None]
        xt = a * x0 + t[..., None] * x1
        u = x1 - (1.0 - self.sigma_min) * x0
        v = self.velocity(xt, t, conditional_input)
        return jnp.mean(jnp.sum((v - u) ** 2, axis=-1))

    def _integrate(self, x: Array, *, n_steps: int, forward: bool,
                   with_div: bool,
                   conditional_input: Optional[Array]):
        """Fixed-step RK4 on the (optionally divergence-augmented)
        probability-flow ODE, as one scan."""
        dt = (1.0 / n_steps) * (1.0 if forward else -1.0)
        t_grid = jnp.arange(n_steps, dtype=x.dtype) / n_steps
        ts = t_grid if forward else 1.0 + dt * jnp.arange(
            n_steps, dtype=x.dtype)

        def rhs(xx, tt):
            vel_at = lambda xs: self.velocity(xs, tt, conditional_input)
            if with_div:
                return _divergence(vel_at, xx)
            return vel_at(xx), jnp.zeros(xx.shape[:-1], xx.dtype)

        def step(carry, t0):
            xx, acc = carry
            k1, d1 = rhs(xx, t0)
            k2, d2 = rhs(xx + 0.5 * dt * k1, t0 + 0.5 * dt)
            k3, d3 = rhs(xx + 0.5 * dt * k2, t0 + 0.5 * dt)
            k4, d4 = rhs(xx + dt * k3, t0 + dt)
            xx = xx + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
            acc = acc + (dt / 6.0) * (d1 + 2 * d2 + 2 * d3 + d4)
            return (xx, acc), None

        zero = jnp.zeros(x.shape[:-1], x.dtype)
        (x_out, div_int), _ = jax.lax.scan(step, (x, zero), ts)
        return x_out, div_int

    def sample(self, key: Array, sample_shape=(), *,
               n_steps: int = 50,
               conditional_input: Optional[Array] = None) -> Array:
        shape = tuple(sample_shape) + (self.event_dim,)
        x0 = jax.random.normal(key, shape)
        x1, _ = self._integrate(x0, n_steps=n_steps, forward=True,
                                with_div=False,
                                conditional_input=conditional_input)
        return x1

    def sample_and_log_prob(self, key: Array, sample_shape=(), *,
                            n_steps: int = 50,
                            conditional_input: Optional[Array] = None
                            ) -> Tuple[Array, Array]:
        shape = tuple(sample_shape) + (self.event_dim,)
        x0 = jax.random.normal(key, shape)
        lp0 = self._base_log_prob(x0)
        x1, div_int = self._integrate(
            x0, n_steps=n_steps, forward=True, with_div=True,
            conditional_input=conditional_input)
        return x1, lp0 - div_int

    def log_prob(self, x: Array, *, n_steps: int = 50,
                 conditional_input: Optional[Array] = None) -> Array:
        """Exact CNF density of ``x`` (up to RK4 discretization): run
        the ODE backward to the base point, accumulate
        ``-int_0^1 div v dt``."""
        x0, div_int_back = self._integrate(
            x, n_steps=n_steps, forward=False, with_div=True,
            conditional_input=conditional_input)
        # Backward traversal accumulates -int_0^1 div dt directly
        # (dt < 0), so it ADDs to the base density.
        return self._base_log_prob(x0) + div_int_back


@struct.dataclass
class FlowMatchingDist(Distribution):
    """A trained (optionally conditional) :class:`FlowMatching` bound to
    its conditioning context, presented through the package's standard
    distribution protocol (``sample`` / ``log_prob`` /
    ``sample_and_log_prob``) — so a CNF can stand anywhere a
    distribution can: as a VAE decoder head, an MC independence
    proposal, or a density for the KL estimators.

    ``log_prob``/``sample`` integrate the probability-flow ODE
    (``n_steps`` fixed RK4 steps, exact divergence); they are exact but
    cost ``O(n_steps * event_dim)`` velocity-net evaluations — train by
    the simulation-free :meth:`FlowMatching.loss` CFM regression where
    possible and reserve the ODE paths for evaluation/sampling.
    """

    model: FlowMatching
    cond: Optional[Array] = None
    n_steps: int = struct.field(pytree_node=False, default=48)

    @property
    def event_shape(self) -> Tuple[int, ...]:
        return (self.model.event_dim,)

    @property
    def batch_shape(self) -> Tuple[int, ...]:
        return () if self.cond is None else self.cond.shape[:-1]

    def sample(self, key: Array, sample_shape: Tuple[int, ...] = ()
               ) -> Array:
        shape = tuple(sample_shape) + self.batch_shape
        return self.model.sample(key, shape, n_steps=self.n_steps,
                                 conditional_input=self.cond)

    def sample_and_log_prob(self, key: Array,
                            sample_shape: Tuple[int, ...] = ()):
        shape = tuple(sample_shape) + self.batch_shape
        return self.model.sample_and_log_prob(
            key, shape, n_steps=self.n_steps,
            conditional_input=self.cond)

    def log_prob(self, x: Array) -> Array:
        return self.model.log_prob(x, n_steps=self.n_steps,
                                   conditional_input=self.cond)


@struct.dataclass
class FlowMatchingLayer:
    """Distribution-emitting layer over a conditional CNF: the mapping
    network's output vector IS the conditioning context
    (``params_size() = cond_dim``), mirroring how the reference routes
    ``conditional_input`` into flowed decoders
    (/root/reference/vaemolsim/dists.py:414-439) but with the
    conditioner as a first-class layer input — drop-in for
    ``MappingToDistribution(dist=...)`` / VAE decoder slots.
    """

    model: FlowMatching
    cond_dim: int = struct.field(pytree_node=False)
    n_steps: int = struct.field(pytree_node=False, default=48)

    @classmethod
    def create(cls, key: Array, event_dim: int, cond_dim: int, *,
               hidden_dim: Union[int, Sequence[int]] = (128, 128),
               n_freqs: int = 4, n_steps: int = 48,
               sigma_min: float = 1e-4,
               activation: str = "gelu") -> "FlowMatchingLayer":
        model = FlowMatching.create(key, event_dim,
                                    hidden_dim=hidden_dim,
                                    n_freqs=n_freqs, cond_dim=cond_dim,
                                    sigma_min=sigma_min,
                                    activation=activation)
        return cls(model=model, cond_dim=cond_dim, n_steps=n_steps)

    def params_size(self) -> int:
        return self.cond_dim

    def __call__(self, raw: Array, train: bool = False
                 ) -> FlowMatchingDist:
        return FlowMatchingDist(model=self.model, cond=raw,
                                n_steps=self.n_steps)
