"""Trainable model compositions: mapping->distribution, flow models, VAEs.

TPU-first replacement for vaemolsim/models.py (reference L5).  Models are
parameter pytrees whose ``__call__`` returns distribution pytrees (and,
for VAEs, a structured output carrying the regularizer loss and metrics —
the functional replacement for Keras ``add_loss``/``add_metric``,
reference models.py:308-318).  Training losses live in
``vaemolsim_tpu.losses`` and ``vaemolsim_tpu.train``.

Stochastic nodes take explicit PRNG keys.  The reference's known
``VAEDualELBO`` super() bug (models.py:389, 422 — calls ``super(VAE)``
from the wrong class; SURVEY.md §7) does not carry over: the dual-ELBO
model here is an independent, working composition.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from flax import struct

from vaemolsim_tpu import losses as loss_lib
from vaemolsim_tpu.dists.layers import StaticFlowedDistribution
from vaemolsim_tpu.nn.mappings import FCDeepNN
from vaemolsim_tpu.ops import distributions as dl

Array = jax.Array

__all__ = ["MappingToDistribution", "FlowModel", "VAE", "VAEOutput",
           "VAEDualELBO", "DualVAEOutput"]


def _resolve_prior_dist(prior, shape_sample, train):
    """A prior may be a raw distribution or a dist layer; layers are
    called with the sample (shape/BN only, reference models.py:313)."""
    if isinstance(prior, dl.Distribution):
        return prior
    return _call_dist_layer(prior, shape_sample, None, train)


def _call_dist_layer(layer, raw, conditional_input, train):
    """Uniform call into a dist layer, forwarding conditional input only
    when the layer is conditional (reference models.py:225-229)."""
    if getattr(layer, "conditional", False):
        return layer(raw, conditional_input=conditional_input, train=train)
    return layer(raw, train=train)


@struct.dataclass
class MappingToDistribution:
    """Mapping network feeding a distribution layer — THE encoder/decoder
    building block (reference ``MappingToDistribution``,
    vaemolsim/models.py:153-237).  ``create`` auto-builds an FCDeepNN
    sized by the dist layer's ``params_size()`` when no mapping is given
    (models.py:197-204).
    """

    mapping: Any
    dist: Any
    name: str = struct.field(pytree_node=False, default="map_to_dist")

    @classmethod
    def create(cls, key: Array, dist: Any,
               input_shape: Union[int, Sequence[int]],
               mapping: Any = None,
               mapping_kwargs: Optional[dict] = None,
               name: str = "map_to_dist") -> "MappingToDistribution":
        if mapping is None:
            if not hasattr(dist, "params_size"):
                raise TypeError(
                    f"{type(dist).__name__} has no params_size(), so a "
                    "mapping cannot be auto-sized (a static distribution "
                    "takes no parameters — use FlowModel, or pass an "
                    "explicit mapping=)")
            target = dist.params_size()
            mapping = FCDeepNN.create(key, input_shape, target,
                                      **(mapping_kwargs or {}))
        return cls(mapping=mapping, dist=dist, name=name)

    @property
    def conditional(self) -> bool:
        return getattr(self.dist, "conditional", False)

    def __call__(self, inputs: Array, train: bool = False):
        params = self.mapping(inputs, train=train)
        return _call_dist_layer(self.dist, params, inputs, train)


@struct.dataclass
class FlowModel:
    """Optional mapping + flowed distribution; the density-estimation
    model (reference ``FlowModel``, vaemolsim/models.py:16-148).

    With a :class:`StaticFlowedDistribution` (fixed base — the
    DistributionLambda case of models.py:73-83) no mapping is used and
    inputs only matter as conditional context / batch shape.
    ``predict`` samples the output distribution (models.py:117-139).
    """

    flowed_dist: Any
    mapping: Any = None

    @classmethod
    def create(cls, key: Array, flowed_dist: Any,
               input_shape: Optional[Union[int, Sequence[int]]] = None,
               mapping: Any = None,
               mapping_kwargs: Optional[dict] = None) -> "FlowModel":
        if mapping is None and not isinstance(flowed_dist,
                                              StaticFlowedDistribution):
            if input_shape is None:
                raise ValueError("input_shape required to auto-build the "
                                 "mapping for a non-static flowed dist")
            mapping = FCDeepNN.create(key, input_shape,
                                      flowed_dist.params_size(),
                                      **(mapping_kwargs or {}))
        return cls(flowed_dist=flowed_dist, mapping=mapping)

    def __call__(self, inputs: Array, train: bool = False):
        if self.mapping is not None:
            params = self.mapping(inputs, train=train)
        else:
            params = inputs
        return _call_dist_layer(self.flowed_dist, params, inputs, train)

    def log_prob(self, inputs: Array, targets: Optional[Array] = None,
                 train: bool = False) -> Array:
        """Density of ``targets`` (defaults to inputs — max-likelihood
        training of an unconditional flow)."""
        dist = self(inputs, train=train)
        return dist.log_prob(inputs if targets is None else targets)

    def predict(self, inputs: Array, key: Array, train: bool = False):
        dist = self(inputs, train=train)
        # A static flowed dist has no batch axis of its own; draw one
        # sample per input row (reference predict_step semantics,
        # models.py:117-139).
        if tuple(dist.batch_shape) == () and inputs.ndim > 1:
            return dist.sample(key, (inputs.shape[0],))
        return dist.sample(key)


@struct.dataclass
class VAEOutput:
    """Structured forward-pass output (functional add_loss/add_metric)."""

    encode_dist: Any
    encode_sample: Array
    prior_dist: Any
    decode_dist: Any
    regularizer_loss: Array
    kl_div: Array  # unweighted regularizer value (reference metric)


@struct.dataclass
class VAE:
    """Standard VAE (reference ``VAE``, vaemolsim/models.py:242-332):
    encode -> sample -> prior (built from the sample for shape/BN only)
    -> regularize -> decode.  Returns a :class:`VAEOutput`; the
    reconstruction loss (e.g. ``losses.LogProbLoss``) is applied by the
    training loop, mirroring Keras compile-time loss wiring.
    """

    encoder: Any
    decoder: Any
    prior: Any
    regularizer: Any = struct.field(default_factory=loss_lib.KLDivergenceEstimate)

    def _prior_dist(self, shape_sample: Array, train: bool):
        return _resolve_prior_dist(self.prior, shape_sample, train)

    def __call__(self, inputs: Array, key: Array,
                 train: bool = False) -> VAEOutput:
        k_enc, k_reg = jax.random.split(key)
        encode_dist = self.encoder(inputs, train=train)
        z = encode_dist.sample(k_enc)
        prior_dist = self._prior_dist(z, train)
        reg_loss = self.regularizer(encode_dist, prior_dist, samples=z,
                                    key=k_reg)
        weight = getattr(self.regularizer, "weight", 1.0)
        kl_div = reg_loss / weight if weight != 0 else jnp.asarray(0.0)
        decode_dist = self.decoder(z, train=train)
        return VAEOutput(encode_dist=encode_dist, encode_sample=z,
                         prior_dist=prior_dist, decode_dist=decode_dist,
                         regularizer_loss=reg_loss, kl_div=kl_div)

    def elbo_loss(self, inputs: Array, key: Array,
                  train: bool = True) -> Tuple[Array, dict]:
        """Negative ELBO = reconstruction NLL + regularizer; returns
        (loss, metrics) matching the reference's logged metrics."""
        out = self(inputs, key, train=train)
        recon = -jnp.mean(out.decode_dist.log_prob(inputs))
        total = recon + out.regularizer_loss
        return total, {"loss": total, "recon_nll": recon,
                       "kl_div": out.kl_div,
                       "regularizer_loss": out.regularizer_loss}

    def iwae_loss(self, inputs: Array, key: Array, n_samples: int = 8,
                  train: bool = True) -> Array:
        """Importance-weighted (IWAE) negative bound with ``n_samples``
        posterior draws — a tighter likelihood bound than the single-
        sample ELBO (extension beyond the reference; Burda et al. 2016).
        Requires a reparameterized encoder and prior/decoder log-probs
        (all satisfied by the framework's distributions)."""
        k_enc = jax.random.split(key, n_samples)
        # The encoder depends only on the inputs: run it once and vmap
        # only the sampling/decoding over the importance draws.
        encode_dist = self.encoder(inputs, train=train)

        def one_sample(k):
            z = encode_dist.sample(k)
            prior_dist = self._prior_dist(z, train)
            decode_dist = self.decoder(z, train=train)
            return (decode_dist.log_prob(inputs) + prior_dist.log_prob(z)
                    - encode_dist.log_prob(z))

        log_w = jax.vmap(one_sample)(k_enc)  # (K, batch)
        bound = (jax.scipy.special.logsumexp(log_w, axis=0)
                 - jnp.log(float(n_samples)))
        return -jnp.mean(bound)

    def hvae_elbo_loss(self, inputs: Array, key: Array,
                       n_leapfrog: int = 5, step_size: float = 0.1,
                       train: bool = True) -> Tuple[Array, dict]:
        """Hamiltonian VAE negative bound (Caterini, Doucet &
        Sejdinovic 2018, arXiv:1805.11328; extension beyond the
        reference): refine the encoder sample with ``n_leapfrog``
        DETERMINISTIC leapfrog steps on the true joint
        ``U(z) = -[log p(x|z) + log p(z)]`` before scoring.

        The flow (z0, rho0) -> (z_K, rho_K) is volume-preserving, so
        the augmented importance weight needs no Jacobian:

            ELBO_H = E[ log p(x, z_K) + log N(rho_K; 0, I)
                        - log q(z_0|x) - log N(rho_0; 0, I) ]

        — a valid lower bound that approaches log p(x) as the leapfrog
        flow carries q's samples to the true posterior; at
        ``n_leapfrog=0`` it is EXACTLY the one-sample ELBO (the
        momentum terms cancel pointwise).  Gradients flow through the
        trajectory (decoder/prior grads per step), so training sharpens
        both the encoder and the refinement.  ``step_size`` may be a
        scalar or per-dimension array.  TPU shape: one ``fori_loop`` of
        fused decoder+prior vjps, everything batched over the batch
        axis.
        """
        k_enc, k_mom = jax.random.split(key)
        encode_dist = self.encoder(inputs, train=train)
        z0 = encode_dist.sample(k_enc)
        prior_dist = self._prior_dist(z0, train)
        eps = jnp.asarray(step_size, z0.dtype)

        def neg_u(z):  # log p(x, z) per batch element
            return (self.decoder(z, train=train).log_prob(inputs)
                    + prior_dist.log_prob(z))

        def grad_neg_u(z):
            e, vjp = jax.vjp(neg_u, z)
            (g,) = vjp(jnp.ones_like(e))
            return e, g

        rho0 = jax.random.normal(k_mom, z0.shape, z0.dtype)
        lp0, g = grad_neg_u(z0)

        def leap(_, carry):
            z, rho, _, g = carry
            z = z + eps * rho
            lp, g = grad_neg_u(z)
            return z, rho + eps * g, lp, g

        zk, rho, lp_joint, g = jax.lax.fori_loop(
            0, n_leapfrog, leap, (z0, rho0 + 0.5 * eps * g, lp0, g))
        rho = rho - 0.5 * eps * g
        if n_leapfrog == 0:
            rho = rho0  # the two half kicks cancel exactly

        def kinetic(p):
            return 0.5 * jnp.sum(p.astype(lp_joint.dtype) ** 2, axis=-1)

        bound = (lp_joint - kinetic(rho)
                 - encode_dist.log_prob(z0) + kinetic(rho0))
        loss = -jnp.mean(bound)
        recon = -jnp.mean(self.decoder(zk, train=train).log_prob(inputs))
        return loss, {"loss": loss, "recon_nll": recon,
                      "hvae_bound": -loss}

    def sample(self, key: Array, batch_shape: Tuple[int, ...] = (),
               train: bool = False) -> Array:
        """Generate by sampling the prior then the decoder (reference
        Training notebook cell 31 pattern: the prior layer's input is a
        ones probe used only for shape)."""
        k1, k2 = jax.random.split(key)
        probe = jnp.ones(tuple(batch_shape) + (1,))
        prior_dist = self._prior_dist(probe, train)
        z = prior_dist.sample(k1, tuple(batch_shape))
        return self.decoder(z, train=train).sample(k2)


@struct.dataclass
class DualVAEOutput:
    decode_dist_forward: Any
    decode_dist_reverse: Any
    encode_sample: Array
    prior_sample: Array
    decode_sample: Array
    regularizer_loss_forward: Array
    regularizer_loss_reverse: Array
    kl_div_forward: Array
    kl_div_reverse: Array


@struct.dataclass
class VAEDualELBO:
    """VAE trained with forward and reverse ELBO passes (reference
    ``VAEDualELBO``, vaemolsim/models.py:335-430, with its super() bug
    fixed by construction): forward x->z->x with a forward regularizer;
    reverse z->x->z with a reverse regularizer.  Pair the reverse decode
    distribution with ``losses.PotentialEnergyLogProbLoss``
    (models.py:341-345).
    """

    encoder: Any
    decoder: Any
    prior: Any
    regularizer_forward: Any = struct.field(
        default_factory=loss_lib.KLDivergenceEstimate)
    regularizer_reverse: Any = struct.field(
        default_factory=loss_lib.ReverseKLDivergenceEstimate)

    def _prior_dist(self, shape_sample: Array, train: bool):
        return _resolve_prior_dist(self.prior, shape_sample, train)

    def __call__(self, inputs: Array, key: Array,
                 train: bool = False) -> DualVAEOutput:
        k_enc, k_prior, k_dec, k_rf, k_rr = jax.random.split(key, 5)

        # Forward pass (x -> z -> x).
        encode_dist_f = self.encoder(inputs, train=train)
        z = encode_dist_f.sample(k_enc)
        prior_dist = self._prior_dist(z, train)
        decode_dist_f = self.decoder(z, train=train)
        reg_f = self.regularizer_forward(encode_dist_f, prior_dist,
                                         samples=z, key=k_rf)

        # Reverse pass (z -> x -> z).  A fixed/static prior has no batch
        # axis; draw one latent per input row.
        if tuple(prior_dist.batch_shape) == () and inputs.ndim > 1:
            z_r = prior_dist.sample(k_prior, (inputs.shape[0],))
        else:
            z_r = prior_dist.sample(k_prior)
        decode_dist_r = self.decoder(z_r, train=train)
        x_r = decode_dist_r.sample(k_dec)
        encode_dist_r = self.encoder(x_r, train=train)
        reg_r = self.regularizer_reverse(encode_dist_r, prior_dist,
                                         samples=z_r, key=k_rr)

        wf = getattr(self.regularizer_forward, "weight", 1.0)
        wr = getattr(self.regularizer_reverse, "weight", 1.0)
        return DualVAEOutput(
            decode_dist_forward=decode_dist_f,
            decode_dist_reverse=decode_dist_r,
            encode_sample=z, prior_sample=z_r, decode_sample=x_r,
            regularizer_loss_forward=reg_f, regularizer_loss_reverse=reg_r,
            kl_div_forward=reg_f / wf if wf != 0 else jnp.asarray(0.0),
            kl_div_reverse=reg_r / wr if wr != 0 else jnp.asarray(0.0))

    def dual_elbo_loss(self, inputs: Array, key: Array,
                       potential_fn, train: bool = True):
        """Forward NLL + reverse potential-energy loss + both regularizers
        (the intended compile configuration, models.py:341-345)."""
        out = self(inputs, key, train=train)
        recon_f = -jnp.mean(out.decode_dist_forward.log_prob(inputs))
        rev = loss_lib.PotentialEnergyLogProbLoss(potential_fn)(
            out.decode_dist_reverse, samples=out.decode_sample)
        total = (recon_f + rev + out.regularizer_loss_forward
                 + out.regularizer_loss_reverse)
        return total, {"loss": total, "recon_nll_forward": recon_f,
                       "reverse_energy_loss": rev,
                       "kl_div_forward": out.kl_div_forward,
                       "kl_div_reverse": out.kl_div_reverse}
