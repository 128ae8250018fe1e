"""Whole-system backmapping: decode EVERY residue's internal coordinates
jointly, autoregressively across residues, conditioned on SchNet
embeddings of each residue's CG environment.

This is the workflow the reference sketches but never finishes — its WIP
``JointDistribution`` (vaemolsim/dists.py:755-858, design notes
vaemolsim/models.py:433-468) decodes residue-by-residue with undefined
``cgschnet`` environment networks.  Here both halves exist and work:
:class:`vaemolsim_tpu.dists.JointBackmapping` (parallel one-pass density
via a causal prefix matmul; scanned sampling) with
``embedding="schnet"`` (:mod:`vaemolsim_tpu.nn.schnet`).

The synthetic system makes the two conditioning channels separately
testable: per-residue torsion means depend on (a) the residue's LOCAL CG
GEOMETRY (distance to its chain neighbor) and (b) the PREVIOUS residue's
torsions (an autoregressive chain).  After maximum-likelihood training,
generated systems must reproduce the adjacent-residue torsion
correlation — a statistic an independent per-residue decoder cannot
have (verified here against exactly that ablation).

Run:  python examples/16_joint_backmapping.py [--full]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vaemolsim_tpu.dists import IndependentBlockwise, JointBackmapping

FULL = "--full" in sys.argv
N_SYSTEMS = 4_000 if FULL else 1_024
STEPS = 600 if FULL else 200
R, D = 6, 2  # residues per system, internal coords per residue
COUPLE = 0.7  # autoregressive coupling strength in the data


def synthetic_systems(key, n):
    """CG chains (noisy helix) + torsions with geometric and
    autoregressive structure."""
    k1, k2, k3 = jax.random.split(key, 3)
    t = jnp.arange(R, dtype=jnp.float32)
    helix = jnp.stack([jnp.cos(0.9 * t), jnp.sin(0.9 * t), 0.4 * t], -1)
    cg = helix + 0.25 * jax.random.normal(k1, (n, R, 3))
    info = jnp.broadcast_to((t / R)[None, :, None], (n, R, 1))

    # Geometric signal: distance to the next residue along the chain.
    nbr = jnp.linalg.norm(cg[:, 1:] - cg[:, :-1], axis=-1)
    nbr = jnp.concatenate([nbr, nbr[:, -1:]], axis=1)  # (n, R)
    mu_geo = 1.5 * (nbr - jnp.mean(nbr))

    # Autoregressive chain over residues.
    def body(prev, inp):
        mu_r, k = inp
        x_r = (COUPLE * jnp.mean(prev, -1, keepdims=True) + mu_r[:, None]
               + 0.3 * jax.random.normal(k, (n, D)))
        x_r = x_r - 2 * jnp.pi * jnp.round(x_r / (2 * jnp.pi))
        return x_r, x_r

    keys = jax.random.split(k3, R)
    _, xs = jax.lax.scan(body, jnp.zeros((n, D)), (mu_geo.T, keys))
    del k2
    return cg, info, jnp.transpose(xs, (1, 0, 2))  # (n, R, D)


def make_model(key, prefix_dim):
    """prefix_dim=0 would break shapes; the independent ablation instead
    zeroes the prefix by encoding x through a frozen zero map."""
    return JointBackmapping.create(
        key, dofs_per_residue=D, cg_info_dim=1,
        decoder_dist=IndependentBlockwise.create(D, "von_mises"),
        embed_dim=12, prefix_dim=prefix_dim, cutoff=4.0, max_included=4,
        mapping_hidden=32, embedding="schnet")


def train(model, cg, info, x, steps, freeze_prefix=False):
    opt = optax.adam(3e-3)

    if freeze_prefix:
        # Independent-decoder ablation: zero (and never update) the
        # residue encoder, so contexts carry no autoregressive signal.
        model = model.replace(residue_encoder=jax.tree_util.tree_map(
            jnp.zeros_like, model.residue_encoder))

    state = opt.init(model)

    def loss_fn(m):
        return -jnp.mean(m(cg, info).log_prob(x)) / (R * D)

    @jax.jit
    def step(m, s):
        l, g = jax.value_and_grad(loss_fn)(m)
        if freeze_prefix:
            g = g.replace(residue_encoder=jax.tree_util.tree_map(
                jnp.zeros_like, g.residue_encoder))
        up, s = opt.update(g, s)
        return optax.apply_updates(m, up), s, l

    for i in range(steps):
        model, state, l = step(model, state)
        if i % 50 == 0:
            print(f"  step {i:4d}  NLL/DOF {float(l):.4f}")
    return model, float(l)


def adjacent_correlation(x):
    """Correlation between mean torsions of adjacent residues."""
    m = np.asarray(jnp.mean(x, -1))  # (n, R)
    a, b = m[:, :-1].ravel(), m[:, 1:].ravel()
    return float(np.corrcoef(a, b)[0, 1])


def main():
    cg, info, x = synthetic_systems(jax.random.PRNGKey(0), N_SYSTEMS)
    c_data = adjacent_correlation(x)
    print(f"data adjacent-residue correlation: {c_data:.3f}")

    print("training JOINT (autoregressive) decoder, schnet embeddings:")
    joint, nll_joint = train(make_model(jax.random.PRNGKey(1), 8),
                             cg, info, x, STEPS)

    print("training INDEPENDENT ablation (prefix zeroed):")
    _, nll_indep = train(make_model(jax.random.PRNGKey(1), 8),
                         cg, info, x, STEPS, freeze_prefix=True)

    # Generate whole systems and check the learned coupling.
    samples = jax.jit(lambda k: joint(cg[:512], info[:512]).sample(k))(
        jax.random.PRNGKey(2))
    c_model = adjacent_correlation(samples)

    print(f"final joint NLL/DOF {nll_joint:.4f}  "
          f"independent NLL/DOF {nll_indep:.4f}")
    print(f"joint advantage: {nll_indep - nll_joint:.4f} nats/DOF")
    print(f"sampled adjacent-residue correlation: {c_model:.3f} "
          f"(data {c_data:.3f})")
    assert nll_joint < nll_indep - 0.02, "joint decoder must beat ablation"
    assert abs(c_model - c_data) < 0.25, "sampling must reproduce coupling"
    print("OK")


if __name__ == "__main__":
    main()
