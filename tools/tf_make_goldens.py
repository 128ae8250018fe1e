"""Generate tests/goldens/tf_parity.json with TensorFlow (in-container).

Real cross-framework numerics evidence (``source: "tf"``) for every
reference numeric derivable from TF ops alone — TFP is not installable
here (no network), so the TFP-only kernels are pinned by the other two
oracles instead (the mpmath 30-digit RQS oracle in
tools/mpmath_rqs_oracle.py and the out-of-container harness in
tools/tf_reference_parity.py; see PARITY.md).

Every case stores the raw inputs/weights alongside outputs computed BY
TENSORFLOW KERNELS in float32; tests/test_tf_parity.py recomputes from
the stored inputs with this framework and compares within the 1e-3
north-star budget.  What TF independently provides per case:

- ``von_mises``           atan2 + softplus/sigmoid (SoftClip chain) +
                          ``tf.math.special.bessel_i0e`` log-prob
                          (reference vaemolsim/dists.py:59-72 transform
                          + the VonMises density TFP computes the same
                          way via i0e).
- ``von_mises_layer``     the 3-per-DOF layer transform
                          (vaemolsim/dists.py:602-607: atan2 loc, plain
                          softplus concentration) + summed log-prob.
- ``von_mises_log_prob_grid``  the density alone on a (loc, kappa, x)
                          grid including extreme concentrations up to
                          the SoftClip bound sqrt(float32.max)/2.
- ``spline_activations``  softmax -> affine bin positions with the
                          1e-2 floor and softplus + 1e-2 slopes
                          (vaemolsim/flows.py:86-109 — THE load-bearing
                          constants) via tf.nn.softmax / tf.math.softplus.
- ``blockwise_normal``    per-DOF [loc, raw_scale] split, softplus+eps
                          scale constraint, Normal log-prob via TF ops.
- ``fcdeepnn``            Keras-ordered Dense stack (matmul + bias +
                          relu, linear head) incl. the periodic
                          [non-periodic..., cos..., sin...] expansion
                          (vaemolsim/mappings.py:144-149), evaluated
                          with tf.keras.layers.Dense.
- ``elbo_fixed``          config-1 ELBO terms at fixed (x, z): Dense
                          encoder/decoder + diagonal-normal log-probs +
                          standard-normal prior, all in TF — the direct
                          evidence for the north star "ELBO within 1e-3
                          of the TF reference" on the normal-family VAE.
- ``initializer_stats``   empirical moments/bounds of TF's
                          glorot_uniform and truncated-normal
                          initializers (vaemolsim/mappings.py:50,
                          flows.py:109) for statistical comparison.

Run:  python tools/tf_make_goldens.py
"""

import json
import math
import os

import numpy as np

RNG_SEED = 20260817
_F32_EPS = float(np.finfo(np.float32).eps)
_VM_CONC_HIGH = float(np.sqrt(np.finfo(np.float32).max) / 2.0)


def _tolist(x):
    return np.asarray(x).astype(np.float64).tolist()


def _softclip_tf(tf, x, low, high):
    """The SoftClip chain used for the von Mises concentration bound
    (vaemolsim_tpu/ops/bijectors.py::SoftClip, matching the reference's
    tfp.bijectors.SoftClip essential semantics), evaluated with TF's
    softplus kernel."""
    return (low + tf.math.softplus(x - low) - tf.math.softplus(x - high))


def _vm_log_prob_tf(tf, x, loc, conc):
    """kappa*cos(x-mu) - log(2*pi*I0(kappa)) via the exponentially-scaled
    Bessel function (log I0(k) = log i0e(k) + k) — the same stabilization
    TFP uses, but through TF's bessel_i0e kernel."""
    log_norm = (tf.math.log(tf.math.special.bessel_i0e(conc)) + conc
                + math.log(2.0 * math.pi))
    return conc * tf.math.cos(x - loc) - log_norm


def _dense_stack_tf(tf, weights, x, hidden_act="relu"):
    """Keras-ordered [k1,b1,...,k_head,b_head] Dense stack, hidden
    activation + linear head, via tf.keras.layers.Dense."""
    ws = [np.asarray(w, np.float32) for w in weights]
    kernels, biases = ws[0::2], ws[1::2]
    h = tf.convert_to_tensor(np.asarray(x, np.float32))
    for i, (k, b) in enumerate(zip(kernels, biases)):
        last = i == len(kernels) - 1
        lyr = tf.keras.layers.Dense(
            k.shape[1], activation=None if last else hidden_act)
        lyr.build((None, k.shape[0]))
        lyr.set_weights([k, b])
        h = lyr(h)
    return h


def _expand_periodic_tf(tf, x, periodic_dofs):
    """Reference vaemolsim/mappings.py:144-149 layout:
    [non-periodic..., cos(periodic)..., sin(periodic)...]."""
    if isinstance(periodic_dofs, bool):
        periodic_dofs = [periodic_dofs] * int(x.shape[-1])
    p_idx = [i for i, b in enumerate(periodic_dofs) if b]
    np_idx = [i for i, b in enumerate(periodic_dofs) if not b]
    if not p_idx:
        return x
    p = tf.gather(x, p_idx, axis=-1)
    parts = []
    if np_idx:
        parts.append(tf.gather(x, np_idx, axis=-1))
    parts += [tf.math.cos(p), tf.math.sin(p)]
    return tf.concat(parts, axis=-1)


def _normal_log_prob_tf(tf, x, loc, scale):
    return (-0.5 * tf.math.square((x - loc) / scale)
            - tf.math.log(scale) - 0.5 * math.log(2.0 * math.pi))


def main():
    import tensorflow as tf

    rng = np.random.default_rng(RNG_SEED)
    f32 = np.float32
    cases = {}

    # -- von_mises: full dists.py:59-72 chain --
    N = 48
    raw = (rng.normal(size=(N, 3)) * np.asarray([1.0, 1.0, 4.0])).astype(f32)
    x = rng.uniform(-np.pi, np.pi, size=(N,)).astype(f32)
    t_raw = tf.convert_to_tensor(raw)
    loc = tf.math.atan2(t_raw[:, 0], t_raw[:, 1])
    conc = _softclip_tf(tf, t_raw[:, 2], _F32_EPS, _VM_CONC_HIGH)
    lp = _vm_log_prob_tf(tf, tf.convert_to_tensor(x), loc, conc)
    cases["von_mises"] = {
        "raw": _tolist(raw), "x": _tolist(x),
        "loc": _tolist(loc.numpy()),
        "concentration": _tolist(conc.numpy()),
        "log_prob": _tolist(lp.numpy())}

    # -- von_mises_layer: 3-per-DOF layer (plain softplus conc) --
    N, D = 16, 3
    raw = rng.normal(size=(N, 3 * D)).astype(f32)
    x = rng.uniform(-np.pi, np.pi, size=(N, D)).astype(f32)
    p = tf.reshape(tf.convert_to_tensor(raw), (N, D, 3))
    loc = tf.math.atan2(p[..., 0], p[..., 1])
    conc = tf.math.softplus(p[..., 2])
    lp = tf.reduce_sum(
        _vm_log_prob_tf(tf, tf.convert_to_tensor(x), loc, conc), axis=-1)
    cases["von_mises_layer"] = {
        "event_dim": D, "raw": _tolist(raw), "x": _tolist(x),
        "log_prob": _tolist(lp.numpy())}

    # -- von_mises_log_prob_grid: density incl. extreme concentrations --
    rows = []
    for loc_v in (0.0, 1.2, -2.5):
        for kappa in (1e-8, 0.05, 1.0, 15.0, 1000.0, 1e8, _VM_CONC_HIGH):
            xg = np.linspace(-np.pi, np.pi, 9).astype(f32)
            lp = _vm_log_prob_tf(tf, tf.convert_to_tensor(xg),
                                 tf.constant(loc_v, tf.float32),
                                 tf.constant(kappa, tf.float32))
            rows.append({"loc": loc_v, "concentration": float(kappa),
                         "x": _tolist(xg), "log_prob": _tolist(lp.numpy())})
    cases["von_mises_log_prob_grid"] = {"rows": rows}

    # -- spline_activations: flows.py:86-109 at the reference defaults --
    K, N = 32, 40
    bin_range = [-10.0, 10.0]
    raw_w = rng.normal(size=(N, K)).astype(f32) * 2.0
    raw_h = rng.normal(size=(N, K)).astype(f32) * 2.0
    raw_s = rng.normal(size=(N, K - 1)).astype(f32) * 2.0
    w = (tf.nn.softmax(tf.convert_to_tensor(raw_w), axis=-1)
         * (bin_range[1] - bin_range[0] - K * 1e-2) + 1e-2)
    h = (tf.nn.softmax(tf.convert_to_tensor(raw_h), axis=-1)
         * (bin_range[1] - bin_range[0] - K * 1e-2) + 1e-2)
    s = tf.math.softplus(tf.convert_to_tensor(raw_s)) + 1e-2
    cases["spline_activations"] = {
        "bin_range": bin_range, "num_bins": K,
        "raw_w": _tolist(raw_w), "raw_h": _tolist(raw_h),
        "raw_s": _tolist(raw_s),
        "w": _tolist(w.numpy()), "h": _tolist(h.numpy()),
        "s": _tolist(s.numpy())}

    # -- blockwise_normal: per-DOF [loc, raw_scale], softplus+eps scale --
    N, D = 24, 3
    raw = rng.normal(size=(N, 2 * D)).astype(f32)
    x = rng.normal(size=(N, D)).astype(f32)
    pr = tf.reshape(tf.convert_to_tensor(raw), (N, D, 2))
    locs = pr[..., 0]
    scales = tf.math.softplus(pr[..., 1]) + _F32_EPS
    lp = tf.reduce_sum(
        _normal_log_prob_tf(tf, tf.convert_to_tensor(x), locs, scales),
        axis=-1)
    cases["blockwise_normal"] = {
        "num_dofs": D, "raw": _tolist(raw), "x": _tolist(x),
        "log_prob": _tolist(lp.numpy())}

    # -- fcdeepnn: Keras Dense stack + periodic expansion --
    N, D_in = 16, 4
    periodic = [False, True, False, True]
    hidden = [16, 8]
    eff_in = D_in + sum(periodic)
    dims = [eff_in] + hidden + [3]
    weights = []
    for i in range(len(dims) - 1):
        lim = np.sqrt(6.0 / (dims[i] + dims[i + 1]))
        weights.append(_tolist(rng.uniform(
            -lim, lim, size=(dims[i], dims[i + 1])).astype(f32)))
        weights.append(_tolist(rng.normal(
            size=(dims[i + 1],)).astype(f32) * 0.1))
    x = rng.normal(size=(N, D_in)).astype(f32)
    hx = _expand_periodic_tf(tf, tf.convert_to_tensor(x), periodic)
    y = _dense_stack_tf(tf, weights, hx.numpy(), hidden_act="relu")
    cases["fcdeepnn"] = {
        "input_dim": D_in, "target_shape": 3, "hidden_dim": hidden,
        "periodic_dofs": periodic, "weights": weights, "x": _tolist(x),
        "y": _tolist(y.numpy())}

    # -- elbo_fixed: config-1 ELBO terms, everything TF --
    N, D_x, D_z = 16, 2, 1

    def make_weights(d_in, hid, d_out):
        ws = []
        dd = [d_in] + hid + [d_out]
        for i in range(len(dd) - 1):
            lim = np.sqrt(6.0 / (dd[i] + dd[i + 1]))
            ws.append(_tolist(rng.uniform(
                -lim, lim, size=(dd[i], dd[i + 1])).astype(f32)))
            ws.append(_tolist(rng.normal(size=(dd[i + 1],)).astype(f32)
                              * 0.1))
        return ws

    enc_w = make_weights(D_x, [16], 2 * D_z)
    dec_w = make_weights(D_z, [16], 2 * D_x)
    x = rng.normal(size=(N, D_x)).astype(f32)
    z = rng.normal(size=(N, D_z)).astype(f32)

    def blockwise_lp(tf_raw, at):
        pr = tf.reshape(tf_raw, (N, at.shape[-1], 2))
        scales = tf.math.softplus(pr[..., 1]) + _F32_EPS
        return tf.reduce_sum(
            _normal_log_prob_tf(tf, tf.convert_to_tensor(at), pr[..., 0],
                                scales), axis=-1)

    enc_out = _dense_stack_tf(tf, enc_w, x, hidden_act="relu")
    dec_out = _dense_stack_tf(tf, dec_w, z, hidden_act="relu")
    logq = blockwise_lp(enc_out, z)
    logp_xz = blockwise_lp(dec_out, x)
    logp_z = tf.reduce_sum(
        _normal_log_prob_tf(tf, tf.convert_to_tensor(z),
                            tf.zeros_like(z), tf.ones_like(z)), axis=-1)
    cases["elbo_fixed"] = {
        "x": _tolist(x), "z": _tolist(z),
        "encoder_weights": enc_w, "decoder_weights": dec_w,
        "enc_hidden": [16], "dec_hidden": [16],
        "log_q_z_given_x": _tolist(logq.numpy()),
        "log_p_x_given_z": _tolist(logp_xz.numpy()),
        "log_p_z": _tolist(logp_z.numpy()),
        "elbo_fixed": _tolist((logp_xz + logp_z - logq).numpy())}

    # -- initializer_stats: TF initializer moments/bounds --
    fan_in, fan_out, n_draw = 200, 150, 400
    g = tf.keras.initializers.GlorotUniform(seed=7)(
        (fan_in * 2, fan_out)).numpy()  # fans: (400, 150)
    tn = tf.keras.initializers.TruncatedNormal(stddev=0.05, seed=8)(
        (n_draw, n_draw)).numpy()
    del fan_in, fan_out
    cases["initializer_stats"] = {
        "glorot": {"fan_in": int(g.shape[0]), "fan_out": int(g.shape[1]),
                   "mean": float(g.mean()), "std": float(g.std()),
                   "absmax": float(np.abs(g).max()),
                   "limit": float(np.sqrt(6.0 / (g.shape[0] + g.shape[1])))},
        "truncated_normal": {"stddev": 0.05, "n": int(tn.size),
                             "mean": float(tn.mean()),
                             "std": float(tn.std()),
                             "absmax": float(np.abs(tn).max())}}

    goldens = {
        "source": "tf",
        "generator": {
            "script": "tools/tf_make_goldens.py",
            "seed": RNG_SEED,
            "tensorflow": tf.__version__,
            "note": ("Cross-framework goldens computed by TensorFlow "
                     "kernels in-container.  TFP-only kernels (RQS "
                     "spline impl, MADE, Best-Fisher sampler) are pinned "
                     "by tools/mpmath_rqs_oracle.py and the "
                     "out-of-container tools/tf_reference_parity.py — "
                     "see PARITY.md."),
        },
        "cases": cases,
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "goldens", "tf_parity.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(goldens, f)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
