"""SchNet-style continuous-filter convolution embeddings.

The reference's unfinished whole-system ``JointDistribution`` names two
networks it never implements — ``cgschnet`` and ``atomschnet``
(vaemolsim/dists.py:805 and :850; design notes vaemolsim/models.py:433-468).
The intent, per those notes, is SchNet-like local-environment embeddings
(Schütt et al. 2018, "SchNet — a deep learning architecture for molecules
and materials", J. Chem. Phys. 148, 241722) feeding the per-residue
decoding distributions.  This module provides that capability as a
first-party, TPU-idiomatic alternative to the geometric-algebra attention
embedding (:class:`~vaemolsim_tpu.nn.attention.ParticleEmbedding`):

* **Continuous-filter convolutions as masked matmuls.**  Edge features
  are Gaussian radial-basis expansions of pairwise distances; the
  filter-generating network is two Dense layers applied to the
  ``(N, N, n_rbf)`` grid (batched MXU matmuls over static shapes), and
  the convolution itself is one einsum contraction over neighbors —
  no gather/scatter, no ragged data, no dynamic shapes.
* **Smooth cosine cutoff** envelope so filters vanish continuously at
  the interaction cutoff (keeps potentials-of-learned-embeddings smooth
  for HMC/MD use downstream).
* **Distance-to-site channel.**  Plain SchNet reads only interatomic
  distances and would be blind to where atoms sit relative to the CG
  site being decoded (inputs here are ref-centered clouds from
  ``DistanceSelection``, SURVEY.md §3.4).  Each atom's input features
  therefore add an RBF embedding of its distance to the site — the
  embedding stays exactly rotation-invariant about the site while
  retaining the radial information the GA-attention variant gets from
  ``|r_i|^2`` pair invariants.

:class:`SchNetEmbedding` is call-compatible with ``ParticleEmbedding``
(``(coords (..., N, 3), particle_info (..., N, I), mask (..., N)) ->
(..., embedding_dim)``) and therefore drops into
``LocalParticleDescriptors``, ``BackmappingOnly``, and
``JointBackmapping`` unchanged.  Select it with
``ParticleEmbeddingConfig(kind="schnet")``.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from vaemolsim_tpu.nn.core import Dense

Array = jax.Array

__all__ = ["SchNetEmbedding", "SchNetInteraction", "SchNetPotential",
           "gaussian_rbf", "cosine_cutoff", "shifted_softplus",
           "energy_force_loss"]


def shifted_softplus(x: Array) -> Array:
    """ssp(x) = softplus(x) - log 2 (SchNet's activation; ssp(0) = 0)."""
    return jax.nn.softplus(x) - math.log(2.0)


def gaussian_rbf(d: Array, n_rbf: int, cutoff: float) -> Array:
    """Gaussian radial basis expansion of distances.

    Centers are ``linspace(0, cutoff, n_rbf)``; the width is set from the
    center spacing (``gamma = 1/spacing**2``) so adjacent bases overlap at
    ~exp(-1), the standard SchNet choice.  ``d (...,) -> (..., n_rbf)``.
    """
    centers = jnp.linspace(0.0, cutoff, n_rbf)
    spacing = cutoff / max(n_rbf - 1, 1)
    gamma = 1.0 / (spacing * spacing)
    return jnp.exp(-gamma * jnp.square(d[..., None] - centers))


def cosine_cutoff(d: Array, cutoff: float) -> Array:
    """Behler-style smooth envelope: 0.5 (cos(pi d / r_c) + 1), 0 beyond."""
    inside = d < cutoff
    env = 0.5 * (jnp.cos(jnp.pi * jnp.minimum(d, cutoff) / cutoff) + 1.0)
    return jnp.where(inside, env, 0.0)


@struct.dataclass
class SchNetInteraction:
    """One continuous-filter convolution block with residual update.

    x_i <- x_i + g(sum_{j != i} W(d_ij) * (A x_j))  where W is the
    filter-generating net on RBF edge features (two ssp Dense layers,
    scaled by the cosine-cutoff envelope), A an atom-wise linear map,
    and g an atom-wise ssp MLP (Schütt et al. 2018, eq. 4-6).
    """

    atom_in: Dense  # F -> F, linear
    filter1: Dense  # n_rbf -> F, ssp
    filter2: Dense  # F -> F, ssp
    out1: Dense  # F -> F, ssp
    out2: Dense  # F -> F, linear

    @classmethod
    def create(cls, key: Array, features: int,
               n_rbf: int) -> "SchNetInteraction":
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        ssp = "shifted_softplus"
        return cls(atom_in=Dense.create(k1, features, features),
                   filter1=Dense.create(k2, n_rbf, features, activation=ssp),
                   filter2=Dense.create(k3, features, features,
                                        activation=ssp),
                   out1=Dense.create(k4, features, features, activation=ssp),
                   out2=Dense.create(k5, features, features))

    def __call__(self, x: Array, rbf: Array, envelope: Array,
                 pair_mask: Array) -> Array:
        """x (..., N, F); rbf (..., N, N, n_rbf); envelope/pair_mask
        (..., N, N) -> updated x."""
        filt = self.filter2(self.filter1(rbf))  # (..., N, N, F)
        filt = filt * (envelope * pair_mask)[..., None]
        h = self.atom_in(x)  # (..., N, F)
        msg = jnp.einsum("...ijf,...jf->...if", filt, h)
        return x + self.out2(self.out1(msg))


@struct.dataclass
class SchNetEmbedding:
    """Ref-centered point cloud + per-particle info -> invariant embedding.

    The ``cgschnet``/``atomschnet`` capability the reference sketches
    (vaemolsim/dists.py:805,850) as a drop-in alternative to
    ``ParticleEmbedding``: continuous features replace SchNet's species
    embedding lookup (``info_net`` on ``particle_info``, matching the
    reference's info_net idiom, vaemolsim/mappings.py:618), plus an RBF
    embedding of each atom's distance to the CG site.  ``num_blocks``
    interaction blocks, then an atom-wise output MLP and a masked pool
    (permutation-invariant).  ``pool="mean"`` (default) keeps the
    embedding scale bounded regardless of neighborhood size — the right
    contract for a *conditioning* vector feeding spline-flow nets (an
    unbounded sum drives von Mises concentrations to their SoftClip
    bound and destabilizes training); ``pool="sum"`` gives the
    size-extensive readout of energy-prediction SchNets.

    ``mask_zero=True`` treats all-zero coordinate rows as padding,
    exactly like ``ParticleEmbedding`` (reference Keras ``Masking``,
    vaemolsim/mappings.py:625-628); an explicit ``mask`` overrides it.
    A fully-masked cloud embeds to zeros.
    """

    info_net: Dense
    center_net: Dense
    blocks: Tuple[SchNetInteraction, ...]
    out1: Dense
    out2: Dense
    n_rbf: int = struct.field(pytree_node=False, default=16)
    cutoff: float = struct.field(pytree_node=False, default=3.0)
    mask_zero: bool = struct.field(pytree_node=False, default=True)
    pool: str = struct.field(pytree_node=False, default="mean")

    @classmethod
    def create(cls, key: Array, info_dim: int, embedding_dim: int,
               features: int = 32, num_blocks: int = 2, n_rbf: int = 16,
               cutoff: float = 3.0, mask_zero: bool = True,
               pool: str = "mean") -> "SchNetEmbedding":
        if pool not in ("mean", "sum"):
            raise ValueError(f"pool must be 'mean' or 'sum', got {pool!r}")
        keys = jax.random.split(key, num_blocks + 4)
        ssp = "shifted_softplus"
        return cls(
            info_net=Dense.create(keys[0], info_dim, features),
            center_net=Dense.create(keys[1], n_rbf, features),
            blocks=tuple(SchNetInteraction.create(keys[2 + i], features,
                                                  n_rbf)
                         for i in range(num_blocks)),
            out1=Dense.create(keys[-2], features, features, activation=ssp),
            out2=Dense.create(keys[-1], features, embedding_dim),
            n_rbf=n_rbf, cutoff=float(cutoff), mask_zero=mask_zero,
            pool=pool)

    def __call__(self, coords: Array, particle_info: Array,
                 mask: Optional[Array] = None) -> Array:
        if mask is None and self.mask_zero:
            mask = jnp.any(coords != 0.0, axis=-1)
        N = coords.shape[-2]

        # Pairwise and to-site distances (sqrt floored for grad safety
        # at coincident points, same device as ops/cell_lj_pallas).
        diff = coords[..., :, None, :] - coords[..., None, :, :]
        d_pair = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
        d_site = jnp.sqrt(jnp.sum(coords * coords, axis=-1) + 1e-12)

        rbf = gaussian_rbf(d_pair, self.n_rbf, self.cutoff)
        env = cosine_cutoff(d_pair, self.cutoff)
        eye = jnp.eye(N, dtype=bool)
        pair_mask = ~eye
        if mask is not None:
            pair_mask = pair_mask & mask[..., :, None] & mask[..., None, :]
        pair_mask = pair_mask.astype(rbf.dtype)

        x = (self.info_net(particle_info)
             + self.center_net(gaussian_rbf(d_site, self.n_rbf, self.cutoff)))
        for block in self.blocks:
            x = block(x, rbf, env, pair_mask)

        atomwise = self.out2(self.out1(x))  # (..., N, E)
        if mask is not None:
            atomwise = atomwise * mask[..., None].astype(atomwise.dtype)
        total = jnp.sum(atomwise, axis=-2)
        if self.pool == "sum":
            return total
        if mask is None:
            return total / N
        count = jnp.maximum(jnp.sum(mask, axis=-1, keepdims=True), 1)
        return total / count.astype(total.dtype)


@struct.dataclass
class SchNetPotential:
    """Machine-learned interatomic potential (energy + AD forces).

    The second half of the reference's unfinished SchNet intent — its
    WIP whole-system decoder names an ``atomschnet`` network over the
    *atomistic* configuration (vaemolsim/dists.py:850) that was never
    written.  This is that capability as a standalone ML force field:
    per-atom energies from ``num_blocks`` continuous-filter convolution
    blocks (Schütt et al. 2018) summed into a size-extensive total,
    trained by energy/force matching (:func:`energy_force_loss`) and
    plugged directly into the framework's samplers — ``md.baoab`` /
    ``velocity_verlet``, HMC, NPT (the potential is box-parametric, so
    ``observables.virial_pressure`` and volume moves work unchanged).

    TPU design: the (N, N) pair grid is dense masked matmuls and one
    einsum contraction per block — static shapes, no gather/scatter.
    Periodic systems use the minimum-image convention on the pair
    difference tensor (same wrapping rule as :func:`potentials
    .lennard_jones`), so ``box`` may be a traced array (NPT dilations
    differentiate through it).  Forces are exactly ``-grad(E)`` of a
    C¹ energy: the cosine cutoff envelope zeroes every filter smoothly
    at ``cutoff`` (no truncation discontinuity to break NVE energy
    conservation), and pair distances are sqrt-floored at coincidence.

    ``species``: per-atom feature vectors ``(N, S)`` (e.g. one-hot
    types; continuous descriptors work too — this generalizes SchNet's
    integer embedding lookup to a linear map).  ``e_ref`` adds a
    learnable per-species reference energy (linear in composition) and
    ``e_scale`` a learnable per-atom energy scale, so the interaction
    blocks only model the O(1)-normalized residual — standard practice
    for stable force-field fitting.
    """

    species_net: Dense
    blocks: Tuple[SchNetInteraction, ...]
    out1: Dense
    out2: Dense
    e_scale: Array  # scalar
    e_ref: Array  # (S,)
    n_rbf: int = struct.field(pytree_node=False, default=32)
    cutoff: float = struct.field(pytree_node=False, default=3.0)

    @classmethod
    def create(cls, key: Array, species_dim: int, features: int = 32,
               num_blocks: int = 3, n_rbf: int = 32,
               cutoff: float = 3.0) -> "SchNetPotential":
        keys = jax.random.split(key, num_blocks + 3)
        ssp = "shifted_softplus"
        return cls(
            species_net=Dense.create(keys[0], species_dim, features),
            blocks=tuple(SchNetInteraction.create(keys[1 + i], features,
                                                  n_rbf)
                         for i in range(num_blocks)),
            out1=Dense.create(keys[-2], features, max(features // 2, 1),
                              activation=ssp),
            out2=Dense.create(keys[-1], max(features // 2, 1), 1),
            e_scale=jnp.ones(()), e_ref=jnp.zeros((species_dim,)),
            n_rbf=n_rbf, cutoff=float(cutoff))

    def atom_energies(self, x: Array, species: Array,
                      box: Optional[Array] = None,
                      mask: Optional[Array] = None) -> Array:
        """Per-atom energy decomposition: ``(..., N)``.

        ``x (..., N, 3)``; ``species (N, S)`` or ``(..., N, S)``;
        ``box`` per-dimension periodic lengths (broadcastable to
        ``(..., 3)``) or None for open boundaries; ``mask (..., N)``
        True for real atoms (padding rows contribute exactly zero).
        """
        N = x.shape[-2]
        diff = x[..., :, None, :] - x[..., None, :, :]
        if box is not None:
            b = jnp.asarray(box, x.dtype)[..., None, None, :]
            diff = diff - b * jnp.round(diff / b)
        d_pair = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)

        rbf = gaussian_rbf(d_pair, self.n_rbf, self.cutoff)
        env = cosine_cutoff(d_pair, self.cutoff)
        pair_mask = ~jnp.eye(N, dtype=bool)
        if mask is not None:
            pair_mask = pair_mask & mask[..., :, None] & mask[..., None, :]
        pair_mask = pair_mask.astype(rbf.dtype)

        h = jnp.broadcast_to(self.species_net(species),
                             x.shape[:-1] + (self.species_net.out_dim,))
        for block in self.blocks:
            h = block(h, rbf, env, pair_mask)

        e_atom = (self.e_scale * self.out2(self.out1(h))[..., 0]
                  + species @ self.e_ref)
        if mask is not None:
            e_atom = e_atom * mask.astype(e_atom.dtype)
        return e_atom

    def __call__(self, x: Array, species: Array,
                 box: Optional[Array] = None,
                 mask: Optional[Array] = None) -> Array:
        """Total potential energy, shape = batch shape of ``x``."""
        return jnp.sum(self.atom_energies(x, species, box, mask), axis=-1)

    def as_potential(self, species: Array, box: Optional[Array] = None,
                     mask: Optional[Array] = None):
        """Close over the chemistry: returns ``energy(x)`` with the
        framework's potential contract (potentials.py) — drop it into
        ``md.velocity_verlet``/``baoab``, ``mcmc.make_hmc_step``,
        ``potentials.composite``, ``as_log_prob``, ...
        """
        return lambda x: self(x, species, box, mask)

    def as_potential_for_box(self, species: Array,
                             mask: Optional[Array] = None):
        """Box-parametric factory ``box -> energy(x)`` for NPT volume
        moves and the virial-pressure dilation (mcmc.npt /
        observables.virial_pressure contract)."""
        return lambda box: (lambda x: self(x, species, box, mask))


def energy_force_loss(model: SchNetPotential, x: Array, species: Array,
                      energy: Array, forces: Array, *,
                      box: Optional[Array] = None,
                      mask: Optional[Array] = None,
                      w_energy: float = 1.0,
                      w_force: float = 1.0) -> Array:
    """Combined per-atom MSE for energy/force matching.

    ``(w_e/N) * mean_b (E_pred - E)^2  +  (w_f/(3N)) * mean |F_pred - F|^2``
    with ``F_pred = -grad_x E_pred`` (one vmapped reverse pass; training
    then differentiates through it — second-order AD, which the dense
    matmul graph supports without custom rules).  Normalizing both terms
    per-atom keeps ``w_energy``/``w_force`` transferable across system
    sizes; force matching carries 3N constraints per frame vs 1 for the
    energy, so the conventional choice weights forces heavily
    (e.g. ``w_energy=0.1, w_force=1.0``).
    """
    if mask is None:
        n_eff = jnp.asarray(x.shape[-2], x.dtype)
    else:
        n_eff = jnp.maximum(jnp.sum(mask, axis=-1), 1).astype(x.dtype)

    def e_fn(xi):
        return model(xi, species, box, mask)

    e_pred = e_fn(x)
    f_pred = -jax.grad(lambda xi: jnp.sum(e_fn(xi)))(x)
    e_term = jnp.mean(jnp.square(e_pred - energy) / n_eff)
    df = jnp.square(f_pred - forces)
    if mask is not None:
        df = df * mask[..., None].astype(df.dtype)
    f_term = jnp.mean(jnp.sum(df, axis=(-2, -1)) / (3.0 * n_eff))
    return w_energy * e_term + w_force * f_term
