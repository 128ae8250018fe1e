"""Out-of-container geometric_algebra_attention parity harness.

The reference borrows its point-cloud attention from the external
``geometric_algebra_attention`` (GAA) package (Spellings 2021,
arXiv:2110.02393; reference configuration at
vaemolsim/mappings.py:518-525: ``VectorAttention(score_fun, value_fun,
reduce, merge_fun='concat', join_fun='concat', rank=2)``).  GAA is not
installable in the build container (no network), so — same protocol as
tools/tf_reference_parity.py — run this on ANY machine with the
reference stack:

    pip install "tensorflow<=2.15" geometric-algebra-attention
    pip install git+https://github.com/Monroe-Molecular-Simulation-Group/vae-mol-sim
    python tools/gaa_reference_parity.py [--out tests/goldens/gaa_parity.json]

and commit the emitted goldens.  tests/test_gaa_parity.py consumes the
file: it skips until real goldens exist, then quantifies this
framework's divergence from the external package.

What gets recorded (all deterministic given the recorded weights):

1. ``vector_attention``  — the reference's AttentionBlock construction
   (score MLP Dense(hidden)->Dense(1); value MLP
   Dense->LayerNorm->act->Dense; rank-2, merge/join 'concat') applied to
   seeded point clouds, with EVERY layer weight dumped in call order
   (`layer.get_weights()`), plus outputs for reduce=False and
   reduce=True.
2. ``attention_block``   — the full reference AttentionBlock (attention
   + post-MLP + residual) on the same clouds.
3. ``particle_embedding`` — the reference ParticleEmbedding
   (info net -> 2 blocks -> reduce attention) incl. zero-row masking.

Consumption notes (why divergence is *quantified*, not asserted to
zero): this repo's default ``nn.attention.VectorAttention`` collapses
GAA's value-on-invariants + merge/join stages into one fused pair input
(two batched MXU matmuls — the TPU-native formulation), and
``VectorAttentionTwoStage`` reproduces GAA's stage structure but GAA's
internal weight layout (per-stage projections, invariant ordering and
normalization) is an implementation detail of that package.  The test
therefore (a) transfers weights onto ``VectorAttentionTwoStage`` where
layouts line up, reporting max deviation, and (b) records the
reference outputs as a capability target for the equivalence study in
docs/attention_equivalence.md.
"""

import argparse
import json
import os

import numpy as np

RNG_SEED = 20260818


def _tolist(x):
    return np.asarray(x).astype(np.float64).tolist()


def _dump_weights(layer):
    return [_tolist(w) for w in layer.get_weights()]


def build_reference_attention(tf, gaa_keras, working_dim, hidden_dim,
                              reduce):
    """Exactly the reference's construction (vaemolsim/mappings.py:
    509-525 for blocks, 633-647 for the final reduction)."""
    score_fun = tf.keras.Sequential([
        tf.keras.layers.Dense(hidden_dim, activation="relu"),
        tf.keras.layers.Dense(1),
    ])
    value_fun = tf.keras.Sequential([
        tf.keras.layers.Dense(hidden_dim),
        tf.keras.layers.LayerNormalization(),
        tf.keras.layers.Activation("relu"),
        tf.keras.layers.Dense(working_dim),
    ])
    attn = gaa_keras.VectorAttention(
        score_fun, value_fun, reduce=reduce, merge_fun="concat",
        join_fun="concat", rank=2)
    return attn, score_fun, value_fun


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "goldens", "gaa_parity.json"))
    args = parser.parse_args()

    import tensorflow as tf
    from geometric_algebra_attention import keras as gaa_keras
    import vaemolsim
    from vaemolsim import mappings

    rng = np.random.default_rng(RNG_SEED)
    cases = {}

    B, N, F, H = 4, 6, 5, 16
    coords = rng.normal(size=(B, N, 3)).astype(np.float32)
    values = rng.normal(size=(B, N, F)).astype(np.float32)

    # -- 1. bare VectorAttention, reduce False and True --
    for reduce in (False, True):
        attn, score_fun, value_fun = build_reference_attention(
            tf, gaa_keras, F, H, reduce)
        out = attn([values, coords])  # GAA call order: (values, positions)
        cases[f"vector_attention_reduce_{reduce}"] = {
            "coords": _tolist(coords), "values": _tolist(values),
            "working_dim": F, "hidden_dim": H, "reduce": reduce,
            "score_weights": _dump_weights(score_fun),
            "value_weights": _dump_weights(value_fun),
            "attention_weights": _dump_weights(attn),
            "output": _tolist(out.numpy()),
        }

    # -- 2. the reference AttentionBlock (attention + post-MLP + residual) --
    block = mappings.AttentionBlock(hidden_dim=H)
    out = block(values, coords)  # builds on first call
    cases["attention_block"] = {
        "coords": _tolist(coords), "values": _tolist(values),
        "hidden_dim": H,
        "weights": _dump_weights(block),
        "output": _tolist(np.asarray(out)),
    }

    # -- 3. the reference ParticleEmbedding incl. zero-row masking --
    info = rng.normal(size=(B, N, 2)).astype(np.float32)
    coords_pad = coords.copy()
    coords_pad[:, -2:, :] = 0.0  # Keras Masking rows (mappings.py:625-628)
    emb = mappings.ParticleEmbedding(embedding_dim=F, hidden_dim=H,
                                     num_blocks=2)
    out = emb([coords_pad, info])
    cases["particle_embedding"] = {
        "coords": _tolist(coords_pad), "info": _tolist(info),
        "embedding_dim": F, "hidden_dim": H, "num_blocks": 2,
        "weights": _dump_weights(emb),
        "output": _tolist(np.asarray(out)),
    }

    goldens = {
        "source": "gaa",
        "generator": {
            "script": "tools/gaa_reference_parity.py",
            "seed": RNG_SEED,
            "tensorflow": tf.__version__,
            "vaemolsim": getattr(vaemolsim, "__version__", "?"),
            "note": "reference geometric_algebra_attention outputs",
        },
        "cases": cases,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(goldens, f)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
