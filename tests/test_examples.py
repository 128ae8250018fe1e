"""Example-workflow smoke tests: the user-facing scripts must run end to
end (subset — the faster ones; all six are exercised manually/by CI)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_example(name, timeout=420):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the TPU plugin out
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", name)],
        capture_output=True, text=True, timeout=timeout, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


@pytest.mark.slow
def test_example_01_flows():
    out = run_example("01_normalizing_flows.py")
    assert "final NLL" in out


@pytest.mark.slow
def test_example_08_distributed():
    out = run_example("08_distributed_training.py")
    assert "8-way data-parallel mesh" in out
    assert "sharded chains" in out


@pytest.mark.slow
def test_example_07_mixed_moves():
    out = run_example("07_mixed_moves_and_diagnostics.py")
    assert "tuned random-walk scale" in out
    assert "mode balance" in out


@pytest.mark.slow
def test_example_09_ensemble():
    out = run_example("09_ensemble_training.py")
    assert "one vmapped program" in out
    assert "best member" in out


@pytest.mark.slow
def test_example_06_full_workflow():
    out = run_example("06_full_molecular_workflow.py")
    assert "exported 500 generated frames" in out
    # Populations must be in the same ballpark (loose: smoke scale).
    import re
    m = re.search(r"data ([0-9.]+), generated ([0-9.]+)", out)
    assert m is not None
    assert abs(float(m.group(1)) - float(m.group(2))) < 0.25
