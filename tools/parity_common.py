"""Shared JAX-side computations for the TFP parity goldens.

Used by tools/make_placeholder_goldens.py (to generate the
``source: "self"`` placeholder file) and tests/test_tfp_parity.py (to
check this framework against the goldens, whether placeholder or real
TFP output from tools/tf_reference_parity.py).

Every function takes a goldens *case dict* and returns this framework's
values for the recorded raw inputs/weights, as numpy arrays keyed like
the goldens.
"""

from __future__ import annotations

import numpy as np


def _np(x):
    return np.asarray(x, np.float32)


def compute_rqs_spline(case):
    import jax.numpy as jnp

    from vaemolsim_tpu.flows.spline_flows import _bin_positions, _slopes
    from vaemolsim_tpu.ops import rqs

    bin_min, bin_max = case["bin_range"]
    K = case["num_bins"]
    w = _bin_positions(jnp.asarray(_np(case["raw_w"])), bin_min, bin_max, K)
    h = _bin_positions(jnp.asarray(_np(case["raw_h"])), bin_min, bin_max, K)
    s = _slopes(jnp.asarray(_np(case["raw_s"])))
    x = jnp.asarray(_np(case["x"]))
    y_eval = jnp.asarray(_np(case["y_eval"]))
    fy, fldj = rqs.rqs_forward(x, w, h, s, bin_min)
    ix, ildj = rqs.rqs_inverse(y_eval, w, h, s, bin_min)
    return {"forward_y": np.asarray(fy), "forward_ldj": np.asarray(fldj),
            "inverse_x": np.asarray(ix), "inverse_ildj": np.asarray(ildj)}


def compute_von_mises(case):
    import jax.numpy as jnp

    from vaemolsim_tpu.dists.layers import _von_mises_from_raw

    dist = _von_mises_from_raw(jnp.asarray(_np(case["raw"])))
    x = jnp.asarray(_np(case["x"]))
    return {"loc": np.asarray(dist.loc),
            "concentration": np.asarray(dist.concentration),
            "log_prob": np.asarray(dist.log_prob(x))}


def compute_von_mises_layer(case):
    import jax.numpy as jnp

    from vaemolsim_tpu.dists import IndependentVonMises

    layer = IndependentVonMises.create(case["event_dim"])
    dist = layer(jnp.asarray(_np(case["raw"])))
    return {"log_prob": np.asarray(dist.log_prob(
        jnp.asarray(_np(case["x"]))))}


def compute_von_mises_sample_stats(case, n_override=None):
    import jax
    import jax.numpy as jnp

    from vaemolsim_tpu.ops import distributions as d

    out = []
    for i, row in enumerate(case["stats"]):
        n = n_override or row["n"]
        dist = d.VonMises(jnp.float32(row["loc"]),
                          jnp.float32(row["concentration"]))
        z = dist.sample(jax.random.PRNGKey(100 + i), (n,))
        out.append({"loc": row["loc"],
                    "concentration": row["concentration"], "n": n,
                    "mean_cos": float(jnp.mean(jnp.cos(z - row["loc"]))),
                    "mean_sin": float(jnp.mean(jnp.sin(z - row["loc"])))})
    return {"stats": out}


def compute_blockwise_normal(case):
    import jax.numpy as jnp

    from vaemolsim_tpu.dists import IndependentBlockwise

    layer = IndependentBlockwise.create(case["num_dofs"], "normal")
    dist = layer(jnp.asarray(_np(case["raw"])))
    return {"log_prob": np.asarray(dist.log_prob(
        jnp.asarray(_np(case["x"]))))}


def build_fcdeepnn_from_weights(weights, input_dim, target_shape,
                                hidden_dim, periodic_dofs,
                                activation="relu"):
    """Assemble an FCDeepNN pytree from a Keras-ordered flat weight list
    [k1, b1, k2, b2, ..., k_head, b_head] (reference
    vaemolsim/mappings.py layer order; layouts are identical: kernels
    are (in, out))."""
    import jax.numpy as jnp

    from vaemolsim_tpu.nn.core import Dense
    from vaemolsim_tpu.nn.mappings import FCDeepNN

    ws = [jnp.asarray(_np(w)) for w in weights]
    kernels, biases = ws[0::2], ws[1::2]
    hidden = [Dense(kernel=k, bias=b, activation=activation)
              for k, b in zip(kernels[:-1], biases[:-1])]
    head = Dense(kernel=kernels[-1], bias=biases[-1], activation=None)
    tshape = (tuple(target_shape) if isinstance(target_shape, (list, tuple))
              else (int(target_shape),))
    if isinstance(periodic_dofs, bool):
        periodic_mask = (periodic_dofs,) * input_dim
    else:
        periodic_mask = tuple(bool(p) for p in periodic_dofs)
    return FCDeepNN(layers=tuple(hidden), bns=(), head=head,
                    event_ndims=1, target_shape=tshape,
                    periodic_mask=periodic_mask, batch_norm=False)


def compute_fcdeepnn(case):
    import jax.numpy as jnp

    net = build_fcdeepnn_from_weights(
        case["weights"], case["input_dim"], case["target_shape"],
        case["hidden_dim"], case["periodic_dofs"])
    return {"y": np.asarray(net(jnp.asarray(_np(case["x"]))))}


def compute_maf_composite(case):
    """Stage-wise MAF density math from recorded raw conditioner outputs:
    activations + RQS inverse per block, then base log-prob + summed
    inverse log-dets.  (Raw outputs sidestep MADE weight layout; the
    matmul path is pinned by the fcdeepnn case and this repo's own
    Jacobian tests.)"""
    import jax.numpy as jnp

    from vaemolsim_tpu.flows.spline_flows import _bin_positions, _slopes
    from vaemolsim_tpu.ops import rqs

    bin_min, bin_max = case["bin_range"]
    K = case["num_bins"]
    stages_out = []
    total_ildj = 0.0
    for st in case["stages"]:
        y = jnp.asarray(_np(st["input"]))
        w = _bin_positions(jnp.asarray(_np(st["raw_w"])), bin_min, bin_max, K)
        h = _bin_positions(jnp.asarray(_np(st["raw_h"])), bin_min, bin_max, K)
        s = _slopes(jnp.asarray(_np(st["raw_s"])))
        x, ildj = rqs.rqs_inverse(y, w, h, s, bin_min)
        ildj = jnp.sum(ildj, axis=-1)
        stages_out.append({"output": np.asarray(x),
                           "ildj": np.asarray(ildj)})
        total_ildj = total_ildj + ildj
        final = x
    base_lp = jnp.sum(-0.5 * final ** 2 - 0.5 * np.log(2 * np.pi), axis=-1)
    return {"stages": stages_out,
            "log_prob": np.asarray(base_lp + total_ildj)}


def compute_elbo_fixed(case):
    import jax.numpy as jnp

    from vaemolsim_tpu.dists import IndependentBlockwise
    from vaemolsim_tpu.ops import distributions as d

    x = jnp.asarray(_np(case["x"]))
    z = jnp.asarray(_np(case["z"]))
    D_x, D_z = x.shape[-1], z.shape[-1]
    enc_map = build_fcdeepnn_from_weights(
        case["encoder_weights"], D_x, 2 * D_z, case["enc_hidden"], False)
    dec_map = build_fcdeepnn_from_weights(
        case["decoder_weights"], D_z, 2 * D_x, case["dec_hidden"], False)
    q_z = IndependentBlockwise.create(D_z, "normal")(enc_map(x))
    p_x = IndependentBlockwise.create(D_x, "normal")(dec_map(z))
    prior = d.Independent(d.Normal(jnp.zeros(D_z), jnp.ones(D_z)), 1)
    logq = q_z.log_prob(z)
    logp_xz = p_x.log_prob(x)
    logp_z = prior.log_prob(z)
    return {"log_q_z_given_x": np.asarray(logq),
            "log_p_x_given_z": np.asarray(logp_xz),
            "log_p_z": np.asarray(logp_z),
            "elbo_fixed": np.asarray(logp_xz + logp_z - logq)}


def compute_von_mises_log_prob_grid(case):
    import jax.numpy as jnp

    from vaemolsim_tpu.ops import distributions as d

    rows = []
    for row in case["rows"]:
        dist = d.VonMises(jnp.float32(row["loc"]),
                          jnp.float32(row["concentration"]))
        rows.append({"log_prob": np.asarray(
            dist.log_prob(jnp.asarray(_np(row["x"]))))})
    return {"rows": rows}


def compute_spline_activations(case):
    import jax.numpy as jnp

    from vaemolsim_tpu.flows.spline_flows import _bin_positions, _slopes

    bin_min, bin_max = case["bin_range"]
    K = case["num_bins"]
    return {
        "w": np.asarray(_bin_positions(jnp.asarray(_np(case["raw_w"])),
                                       bin_min, bin_max, K)),
        "h": np.asarray(_bin_positions(jnp.asarray(_np(case["raw_h"])),
                                       bin_min, bin_max, K)),
        "s": np.asarray(_slopes(jnp.asarray(_np(case["raw_s"])))),
    }


def compute_initializer_stats(case):
    """This framework's initializer draws at the goldens' shapes; the
    consumer compares moments/bounds statistically."""
    import jax

    from vaemolsim_tpu.nn.core import glorot_uniform, truncated_normal_init

    g_spec = case["glorot"]
    g = np.asarray(glorot_uniform(
        jax.random.PRNGKey(21), (g_spec["fan_in"], g_spec["fan_out"])))
    t_spec = case["truncated_normal"]
    n = int(np.sqrt(t_spec["n"]))
    t = np.asarray(truncated_normal_init(
        jax.random.PRNGKey(22), (n, n), stddev=t_spec["stddev"]))
    return {
        "glorot": {"mean": float(g.mean()), "std": float(g.std()),
                   "absmax": float(np.abs(g).max())},
        "truncated_normal": {"mean": float(t.mean()),
                             "std": float(t.std()),
                             "absmax": float(np.abs(t).max())},
    }


COMPUTERS = {
    "rqs_spline": compute_rqs_spline,
    "von_mises_log_prob_grid": compute_von_mises_log_prob_grid,
    "spline_activations": compute_spline_activations,
    "initializer_stats": compute_initializer_stats,
    "von_mises": compute_von_mises,
    "von_mises_layer": compute_von_mises_layer,
    "von_mises_sample_stats": compute_von_mises_sample_stats,
    "blockwise_normal": compute_blockwise_normal,
    "fcdeepnn": compute_fcdeepnn,
    "maf_composite": compute_maf_composite,
    "elbo_fixed": compute_elbo_fixed,
}
