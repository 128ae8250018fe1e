"""PaiNN: E(3)-equivariant message passing interatomic potential.

Second-generation ML force field next to the invariant
:class:`~vaemolsim_tpu.nn.schnet.SchNetPotential` (which realizes the
reference's unfinished ``atomschnet`` intent, vaemolsim/dists.py:850):
the polarizable atom interaction neural network of Schütt, Unke &
Gastegger (ICML 2021, arXiv:2102.03150).  Each atom carries scalar
features ``s (..., N, F)`` *and* vector features ``v (..., N, 3, F)``
that rotate with the frame; messages mix directional information
(``r_ij / |r_ij|``) into the vectors, and updates couple vectors back
into the scalars only through rotation-invariant contractions
(``<Uv, Vv>``, ``|Vv|``).  The energy therefore remains *exactly*
invariant and its AD forces exactly equivariant, while the model sees
angular information an invariant distance-only SchNet cannot (a single
PaiNN block distinguishes environments SchNet needs multi-hop message
passing to separate).

TPU design mirrors :mod:`~vaemolsim_tpu.nn.schnet`: the ``(N, N)``
pair grid is dense and masked (no gather/scatter, no ragged data);
messages are three einsum contractions over neighbors per block; the
vector-feature linear maps are bias-free matmuls on the trailing
feature axis (bias on an equivariant channel would break covariance,
so those layers are raw kernels, not :class:`~vaemolsim_tpu.nn.core
.Dense`).  The whole network is C¹ in positions: a smooth cosine
cutoff envelope zeroes every filter at ``cutoff`` and pair distances
are sqrt-floored at coincidence — NVE on the learned surface
conserves, and second-order AD (force-matching training) works with
no custom rules.

Contract-compatible with ``SchNetPotential``: ``__call__(x, species,
box, mask)``, ``atom_energies``, ``as_potential`` /
``as_potential_for_box`` (NPT volume moves and
``observables.virial_pressure`` differentiate through the traced
``box``), and :func:`~vaemolsim_tpu.nn.schnet.energy_force_loss`
accepts it unchanged.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from vaemolsim_tpu.nn.core import Dense
from vaemolsim_tpu.nn.schnet import cosine_cutoff, gaussian_rbf

Array = jax.Array

__all__ = ["PaiNNBlock", "PaiNNPotential"]


@struct.dataclass
class PaiNNBlock:
    """One PaiNN message + update block (arXiv:2102.03150, Fig. 2).

    Message (inter-atomic): a filter net (one linear Dense on RBF edge
    features, scaled by the cutoff envelope) and a scalar net
    ``phi(s_j)`` each emit ``3F`` channels, split into three gates:

    - ``ds_i   = sum_j  phi1_j * W1_ij``
    - ``dv_i   = sum_j (phi2_j * W2_ij) v_j
                + sum_j (phi3_j * W3_ij) r_ij/|r_ij|``

    Update (atom-wise): bias-free feature mixes ``u = v U``,
    ``w = v V``; gates ``a = MLP([s, |w|]) -> (a1, a2, a3)``:

    - ``ds = a1 + a2 * <u, w>``  (spatial dot — invariant)
    - ``dv = a3 * u``

    Both stages are residual.
    """

    phi1: Dense  # F -> F, silu
    phi2: Dense  # F -> 3F, linear
    filter_net: Dense  # n_rbf -> 3F, linear
    U: Array  # (F, F) bias-free vector mix
    V: Array  # (F, F) bias-free vector mix
    upd1: Dense  # 2F -> F, silu
    upd2: Dense  # F -> 3F, linear

    @classmethod
    def create(cls, key: Array, features: int, n_rbf: int) -> "PaiNNBlock":
        ks = jax.random.split(key, 7)
        glorot = jax.nn.initializers.glorot_uniform()
        return cls(
            phi1=Dense.create(ks[0], features, features, activation="swish"),
            phi2=Dense.create(ks[1], features, 3 * features),
            filter_net=Dense.create(ks[2], n_rbf, 3 * features),
            U=glorot(ks[3], (features, features)),
            V=glorot(ks[4], (features, features)),
            upd1=Dense.create(ks[5], 2 * features, features,
                              activation="swish"),
            upd2=Dense.create(ks[6], features, 3 * features))

    def __call__(self, s: Array, v: Array, rbf: Array, direction: Array,
                 envelope: Array, pair_mask: Array
                 ) -> Tuple[Array, Array]:
        """``s (..., N, F)``, ``v (..., N, 3, F)``,
        ``rbf (..., N, N, n_rbf)``, ``direction (..., N, N, 3)``
        (unit minimum-image ``r_j - r_i`` rows), ``envelope`` /
        ``pair_mask (..., N, N)`` -> updated ``(s, v)``."""
        F = s.shape[-1]
        # --- message ---------------------------------------------------
        W = self.filter_net(rbf) * (envelope * pair_mask)[..., None]
        phi = self.phi2(self.phi1(s))  # (..., N, 3F) at atom j
        w1, w2, w3 = jnp.split(W, 3, axis=-1)  # (..., N, N, F) each
        p1, p2, p3 = jnp.split(phi, 3, axis=-1)  # (..., N, F) each
        ds = jnp.einsum("...ijf,...jf->...if", w1, p1)
        dv = (jnp.einsum("...ijf,...jf,...jdf->...idf", w2, p2, v)
              + jnp.einsum("...ijf,...jf,...ijd->...idf", w3, p3,
                           direction))
        s = s + ds
        v = v + dv
        # --- update (atom-wise) -----------------------------------------
        u = v @ self.U  # (..., N, 3, F)
        w = v @ self.V
        # Invariant vector norm; eps keeps the gradient finite at v = 0
        # (fresh models start there) and the derivative is exactly 0 at
        # the floor, so equivariance is not perturbed.
        w_norm = jnp.sqrt(jnp.sum(w * w, axis=-2) + 1e-12)  # (..., N, F)
        a = self.upd2(self.upd1(jnp.concatenate([s, w_norm], axis=-1)))
        a1, a2, a3 = jnp.split(a, 3, axis=-1)
        uw = jnp.sum(u * w, axis=-2)  # (..., N, F) invariant
        s = s + a1 + a2 * uw
        v = v + a3[..., None, :] * u
        del F
        return s, v


@struct.dataclass
class PaiNNPotential:
    """E(3)-equivariant machine-learned potential (energy + AD forces).

    Drop-in peer of :class:`~vaemolsim_tpu.nn.schnet.SchNetPotential`
    with the identical contract — ``__call__(x, species, box, mask)``
    totals per-atom energies; ``as_potential`` / ``as_potential_for_box``
    close over the chemistry for ``md.baoab`` / ``velocity_verlet``,
    HMC, NPT volume moves, and ``observables.virial_pressure``;
    :func:`~vaemolsim_tpu.nn.schnet.energy_force_loss` trains it by
    energy/force matching (second-order AD through the equivariant
    blocks).

    ``species``: per-atom feature vectors ``(N, S)`` (one-hot types or
    continuous descriptors).  ``e_ref`` is a learnable per-species
    reference energy, ``e_scale`` a learnable output scale — the blocks
    only model the O(1)-normalized residual.
    """

    species_net: Dense
    blocks: Tuple[PaiNNBlock, ...]
    out1: Dense
    out2: Dense
    e_scale: Array  # scalar
    e_ref: Array  # (S,)
    n_rbf: int = struct.field(pytree_node=False, default=20)
    cutoff: float = struct.field(pytree_node=False, default=3.0)

    @classmethod
    def create(cls, key: Array, species_dim: int, features: int = 32,
               num_blocks: int = 2, n_rbf: int = 20,
               cutoff: float = 3.0) -> "PaiNNPotential":
        keys = jax.random.split(key, num_blocks + 3)
        return cls(
            species_net=Dense.create(keys[0], species_dim, features),
            blocks=tuple(PaiNNBlock.create(keys[1 + i], features, n_rbf)
                         for i in range(num_blocks)),
            out1=Dense.create(keys[-2], features, max(features // 2, 1),
                              activation="swish"),
            out2=Dense.create(keys[-1], max(features // 2, 1), 1),
            e_scale=jnp.ones(()), e_ref=jnp.zeros((species_dim,)),
            n_rbf=n_rbf, cutoff=float(cutoff))

    def atom_energies(self, x: Array, species: Array,
                      box: Optional[Array] = None,
                      mask: Optional[Array] = None) -> Array:
        """Per-atom energy decomposition ``(..., N)``.

        ``x (..., N, 3)``; ``species (N, S)`` or ``(..., N, S)``;
        ``box`` per-dimension periodic lengths (broadcastable to
        ``(..., 3)``, may be traced) or None; ``mask (..., N)`` True
        for real atoms (padding rows contribute exactly zero).
        """
        N = x.shape[-2]
        diff = x[..., None, :, :] - x[..., :, None, :]  # r_j - r_i rows
        if box is not None:
            b = jnp.asarray(box, x.dtype)[..., None, None, :]
            diff = diff - b * jnp.round(diff / b)
        d_pair = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
        direction = diff / d_pair[..., None]

        rbf = gaussian_rbf(d_pair, self.n_rbf, self.cutoff)
        env = cosine_cutoff(d_pair, self.cutoff)
        pair_mask = ~jnp.eye(N, dtype=bool)
        if mask is not None:
            pair_mask = pair_mask & mask[..., :, None] & mask[..., None, :]
        pair_mask = pair_mask.astype(rbf.dtype)

        F = self.species_net.out_dim
        s = jnp.broadcast_to(self.species_net(species),
                             x.shape[:-1] + (F,))
        v = jnp.zeros(x.shape[:-1] + (3, F), x.dtype)
        for block in self.blocks:
            s, v = block(s, v, rbf, direction, env, pair_mask)

        e_atom = (self.e_scale * self.out2(self.out1(s))[..., 0]
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
        """Close over the chemistry: ``energy(x)`` with the framework's
        potential contract (potentials.py)."""
        return lambda x: self(x, species, box, mask)

    def as_potential_for_box(self, species: Array,
                             mask: Optional[Array] = None):
        """Box-parametric factory ``box -> energy(x)`` (mcmc.npt /
        virial-pressure contract)."""
        return lambda box: (lambda x: self(x, species, box, mask))
