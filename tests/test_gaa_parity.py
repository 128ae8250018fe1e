"""geometric_algebra_attention parity goldens consumption.

Skips until tools/gaa_reference_parity.py has been run out-of-container
and its output committed as tests/goldens/gaa_parity.json (the GAA
package is pure Python but not installable here — no network).  Once
present, the reference package's outputs become a quantified capability
target; see docs/attention_equivalence.md for the in-container
equivalence evidence that stands in the meantime
(tests/test_attention.py::TestCapabilityEquivalence + the shared
invariance suite over both variants).
"""

import json
import os

import pytest

GOLDENS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "goldens", "gaa_parity.json")


@pytest.fixture(scope="module")
def goldens():
    if not os.path.exists(GOLDENS_PATH):
        pytest.skip(
            "GAA goldens absent; run tools/gaa_reference_parity.py on a "
            "machine with tensorflow<=2.15 + geometric-algebra-attention "
            "+ the reference vaemolsim installed, then commit "
            f"{GOLDENS_PATH}.  In-container equivalence evidence: "
            "tests/test_attention.py::TestCapabilityEquivalence.")
    with open(GOLDENS_PATH) as f:
        return json.load(f)


def test_goldens_provenance(goldens):
    assert goldens["source"] == "gaa"
    assert "vector_attention_reduce_False" in goldens["cases"]


def test_reference_outputs_are_rotation_invariant(goldens):
    """Sanity on the recorded reference outputs themselves: our
    invariance-locked tests assume the reference layer is rotation
    invariant; the goldens let us check that premise end-to-end when
    they exist (outputs recorded for rotated inputs would go here in a
    v2 of the harness; for now this asserts shapes/finite)."""
    import numpy as np
    for name, case in goldens["cases"].items():
        out = np.asarray(case["output"], np.float64)
        assert np.isfinite(out).all(), name
