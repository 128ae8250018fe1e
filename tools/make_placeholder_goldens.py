"""Generate the PLACEHOLDER tfp-parity goldens from this repo's own
implementation (``source: "self"``).

Mirrors tools/tf_reference_parity.py exactly — same schema, same seeded
raw inputs in the same draw order — so when the TF-side harness is run
out-of-container, its output is a drop-in replacement and the consuming
test (tests/test_tfp_parity.py) flips from self-consistency checking to
true cross-framework parity evidence.

Run:  python tools/make_placeholder_goldens.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

RNG_SEED = 20260816  # matches tools/tf_reference_parity.py


def _tolist(x):
    return np.asarray(x).astype(np.float64).tolist()


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import parity_common as pc
    import vaemolsim_tpu
    from vaemolsim_tpu.flows import RQSSplineMAF
    from vaemolsim_tpu.nn.mappings import FCDeepNN
    from vaemolsim_tpu.ops import distributions as d

    rng = np.random.default_rng(RNG_SEED)
    cases = {}

    # -- rqs_spline (raw draw order matches the TF harness) --
    K, N = 8, 64
    case = {"bin_range": [-4.0, 4.0], "num_bins": K,
            "raw_w": _tolist(rng.normal(size=(N, K)).astype(np.float32)),
            "raw_h": _tolist(rng.normal(size=(N, K)).astype(np.float32)),
            "raw_s": _tolist(rng.normal(size=(N, K - 1)).astype(np.float32)),
            "x": _tolist(np.linspace(-6.0, 6.0, N).astype(np.float32)),
            "y_eval": _tolist(np.linspace(-5.5, 5.5, N).astype(np.float32))}
    case.update({k: _tolist(v)
                 for k, v in pc.compute_rqs_spline(case).items()})
    cases["rqs_spline"] = case

    # -- von_mises --
    N = 48
    case = {"raw": _tolist(rng.normal(size=(N, 3)).astype(np.float32)
                           * np.asarray([1.0, 1.0, 4.0], np.float32)),
            "x": _tolist(rng.uniform(-np.pi, np.pi,
                                     size=(N,)).astype(np.float32))}
    case.update({k: _tolist(v)
                 for k, v in pc.compute_von_mises(case).items()})
    cases["von_mises"] = case

    # -- von_mises_layer --
    N, D = 16, 3
    case = {"event_dim": D,
            "raw": _tolist(rng.normal(size=(N, 3 * D)).astype(np.float32)),
            "x": _tolist(rng.uniform(-np.pi, np.pi,
                                     size=(N, D)).astype(np.float32))}
    case.update({k: _tolist(v)
                 for k, v in pc.compute_von_mises_layer(case).items()})
    cases["von_mises_layer"] = case

    # -- von_mises_sample_stats (our sampler; the TF harness replaces
    #    these with TFP-sampler estimates) --
    n = 200_000
    spec = {"stats": [{"loc": float(l), "concentration": float(c), "n": n,
                       "mean_cos": 0.0, "mean_sin": 0.0}
                      for l in (0.0, 1.2, -2.5)
                      for c in (0.05, 1.0, 8.0, 40.0)]}
    cases["von_mises_sample_stats"] = pc.compute_von_mises_sample_stats(spec)

    # -- blockwise_normal --
    N, D = 24, 3
    case = {"num_dofs": D,
            "raw": _tolist(rng.normal(size=(N, 2 * D)).astype(np.float32)),
            "x": _tolist(rng.normal(size=(N, D)).astype(np.float32))}
    case.update({k: _tolist(v)
                 for k, v in pc.compute_blockwise_normal(case).items()})
    cases["blockwise_normal"] = case

    # -- fcdeepnn (weights from our init, Keras flat order) --
    N, D_in = 16, 4
    periodic = [False, True, False, True]
    net = FCDeepNN.create(jax.random.PRNGKey(11), D_in, 3,
                          hidden_dim=[16, 8], periodic_dofs=periodic)
    weights = []
    for lyr in list(net.layers) + [net.head]:
        weights.extend([_tolist(lyr.kernel), _tolist(lyr.bias)])
    case = {"input_dim": D_in, "target_shape": 3, "hidden_dim": [16, 8],
            "periodic_dofs": periodic, "weights": weights,
            "x": _tolist(rng.normal(size=(N, D_in)).astype(np.float32))}
    case.update({k: _tolist(v)
                 for k, v in pc.compute_fcdeepnn(case).items()})
    cases["fcdeepnn"] = case

    # -- maf_composite (stages from our flow, density order) --
    D, K, N = 3, 8, 24
    flow = RQSSplineMAF.create(
        jax.random.PRNGKey(12), D, num_blocks=2, order_seed=13,
        rqs_params={"num_bins": K, "hidden_dim": 16,
                    "bin_range": [-4.0, 4.0]})
    y = (rng.normal(size=(N, D)) * 1.5).astype(np.float32)
    stages = []
    cur = jnp.asarray(y)
    for blk in reversed(flow.blocks):  # density (inverse) order
        raw_w, raw_h, raw_s = blk.conditioner._merged_raw(cur, None)
        nxt, ildj = blk.inverse_and_log_det(cur)
        stages.append({
            "input": _tolist(cur), "raw_w": _tolist(raw_w),
            "raw_h": _tolist(raw_h), "raw_s": _tolist(raw_s),
            "output": _tolist(nxt), "ildj": _tolist(ildj),
            "input_order": list(blk.conditioner.w_net.input_order_static)})
        cur = nxt
    base = d.Independent(d.Normal(jnp.zeros(D), jnp.ones(D)), 1)
    case = {"data_dim": D, "num_bins": K, "bin_range": [-4.0, 4.0],
            "y": _tolist(y), "stages": stages,
            "log_prob": _tolist(flow(base).log_prob(jnp.asarray(y)))}
    cases["maf_composite"] = case

    # -- elbo_fixed --
    N, D_x, D_z = 16, 2, 1
    enc = FCDeepNN.create(jax.random.PRNGKey(13), D_x, 2 * D_z,
                          hidden_dim=[16])
    dec = FCDeepNN.create(jax.random.PRNGKey(14), D_z, 2 * D_x,
                          hidden_dim=[16])

    def flat(netw):
        out = []
        for lyr in list(netw.layers) + [netw.head]:
            out.extend([_tolist(lyr.kernel), _tolist(lyr.bias)])
        return out

    case = {"x": _tolist(rng.normal(size=(N, D_x)).astype(np.float32)),
            "z": _tolist(rng.normal(size=(N, D_z)).astype(np.float32)),
            "encoder_weights": flat(enc), "decoder_weights": flat(dec),
            "enc_hidden": [16], "dec_hidden": [16]}
    case.update({k: _tolist(v)
                 for k, v in pc.compute_elbo_fixed(case).items()})
    cases["elbo_fixed"] = case

    goldens = {
        "source": "self",
        "generator": {
            "script": "tools/make_placeholder_goldens.py",
            "seed": RNG_SEED,
            "vaemolsim_tpu": vaemolsim_tpu.__version__,
            "note": ("PLACEHOLDER generated from this repo's own "
                     "implementation; replace by running "
                     "tools/tf_reference_parity.py on a TF-equipped "
                     "machine."),
        },
        "cases": cases,
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "goldens", "tfp_parity.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(goldens, f)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
