"""Example-workflow smoke tests: ALL user-facing scripts must run
end to end at their CI scale (the reference's four notebooks are
executable documents — examples 01-04 are their ports, 05-35 the
beyond-reference workflows).  Wall-clock is compile-dominated on CPU;
the --full scales are exercised manually / on hardware."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_example(name, timeout=420):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the TPU plugin out
    # Share one persistent compilation cache across all example
    # subprocesses (and with the test lane — conftest sets the same
    # default): examples recompile the same model building blocks.
    env.setdefault("VAEMOLSIM_JAX_CACHE_DIR",
                   os.path.expanduser("~/.cache/vaemolsim_jax_cache"))
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
def test_example_02_train_vae():
    out = run_example("02_train_vae.py", timeout=600)
    assert "final -ELBO" in out
    assert "[deterministic-encoder]" in out  # both notebook variants ran
    import re
    m = re.search(r"generated mode balance ([0-9.]+)", out)
    assert m is not None
    assert 0.2 < float(m.group(1)) < 0.8  # smoke scale: loose band


@pytest.mark.slow
def test_example_03_mc_moves():
    out = run_example("03_mc_moves.py", timeout=900)
    assert "trained VAE" in out
    assert "proposals/sec" in out
    import re
    m = re.search(r"chain mode balance ([0-9.]+)", out)
    assert m is not None
    assert 0.35 < float(m.group(1)) < 0.65
    m = re.search(r"acceptance ([0-9.]+)", out)
    assert 0.0 < float(m.group(1)) < 1.0


@pytest.mark.slow
def test_example_04_backmapping():
    out = run_example("04_backmapping.py", timeout=900)
    import re
    m = re.search(r"backmapping NLL ([-0-9.]+) -> ([-0-9.]+)", out)
    assert m is not None
    assert float(m.group(2)) < float(m.group(1))  # training improved
    assert "sampled torsions in [-pi, pi]: True" in out
    m = re.search(r"mean circular error vs target ([0-9.]+) rad", out)
    assert m is not None and float(m.group(1)) < 1.5


@pytest.mark.slow
def test_example_05_replica_exchange():
    out = run_example("05_replica_exchange.py", timeout=900)
    assert "swap acceptance" in out
    import re
    m = re.search(r"right-mode fraction: ([0-9.]+)", out)
    assert m is not None
    assert 0.2 < float(m.group(1)) < 0.8


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
def test_example_10_free_energy():
    out = run_example("10_free_energy.py", timeout=600)
    assert "free-energy workflow OK" in out
    assert "BAR" in out and "flow-FEP" in out


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


@pytest.mark.slow
def test_example_11_boltzmann_generator():
    out = run_example("11_boltzmann_generator.py", timeout=900)
    assert "Boltzmann-generator workflow OK" in out
    import re
    m = re.search(r"flow-MCMC: acceptance ([0-9.]+)", out)
    assert m is not None and float(m.group(1)) > 0.2
    m = re.search(r"well balance ([0-9.]+)", out)
    assert m is not None and 0.2 < float(m.group(1)) < 0.8


@pytest.mark.slow
def test_example_12_md_and_mc():
    out = run_example("12_md_and_mc.py", timeout=900)
    assert "MD/MC cross-validation OK" in out
    import re
    m = re.search(r"max relative energy drift ([0-9.e-]+)", out)
    assert m is not None and float(m.group(1)) < 5e-3


@pytest.mark.slow
def test_example_13_alchemical_decoupling():
    out = run_example("13_alchemical_decoupling.py", timeout=900)
    assert "alchemical workflow OK" in out
    import re
    mbar = float(re.search(r"MBAR: \+?(-?[0-9.]+)", out).group(1))
    ti = float(re.search(r"TI:   \+?(-?[0-9.]+)", out).group(1))
    assert mbar > 1.0 and abs(mbar - ti) < 1.0


@pytest.mark.slow
def test_example_14_npt_equation_of_state():
    out = run_example("14_npt_equation_of_state.py", timeout=900)
    assert "virial pressures reproduce the set pressures: OK" in out


@pytest.mark.slow
def test_example_15_molten_salt():
    out = run_example("15_molten_salt.py", timeout=900)
    assert "molten-salt charge ordering confirmed: OK" in out


@pytest.mark.slow
def test_example_16_joint_backmapping():
    out = run_example("16_joint_backmapping.py", timeout=900)
    assert "joint advantage" in out
    assert out.strip().endswith("OK")


@pytest.mark.slow
def test_example_17_ml_force_field():
    out = run_example("17_ml_force_field.py", timeout=900)
    assert "force RMSE" in out
    assert out.strip().endswith("OK")


@pytest.mark.slow
def test_example_18_cg_force_matching():
    out = run_example("18_cg_force_matching.py", timeout=900)
    assert "force correlation" in out
    assert out.strip().endswith("OK")


@pytest.mark.slow
def test_example_19_gcmc_isotherm():
    out = run_example("19_gcmc_isotherm.py", timeout=900)
    assert "Widom cross-check" in out
    assert "isotherm thermodynamically consistent: OK" in out


@pytest.mark.slow
def test_example_21_gibbs_coexistence():
    out = run_example("21_gibbs_coexistence.py", timeout=900)
    assert "coexistence densities" in out
    assert "vapor-liquid coexistence established: OK" in out


@pytest.mark.slow
def test_example_22_rigid_water():
    out = run_example("22_rigid_water.py", timeout=900)
    assert "rigid polar liquid validated: OK" in out
    import re
    m = re.search(r"max bond deviation after \d+ steps: ([0-9.e-]+)", out)
    assert m is not None and float(m.group(1)) < 2e-3


@pytest.mark.slow
def test_example_23_metadynamics():
    out = run_example("23_metadynamics.py", timeout=900)
    import re
    m = re.search(r"RMS error vs torsion\s+potential ([0-9.]+) kT", out)
    assert m is not None and float(m.group(1)) < 0.5
    assert "metadynamics torsional PMF recovered: OK" in out


@pytest.mark.slow
def test_example_20_umbrella_pmf():
    out = run_example("20_umbrella_pmf.py", timeout=900)
    import re
    m = re.search(r"max \|W - W_exact\| = ([0-9.]+) kT", out)
    assert m is not None and float(m.group(1)) < 0.35
    assert "umbrella/MBAR PMF matches the closed form: OK" in out


@pytest.mark.slow
def test_example_24_remd_flow_matching():
    out = run_example("24_remd_flow_matching.py", timeout=1200)
    import re
    m = re.search(r"CNF generator: p_right = ([0-9.]+)", out)
    assert m is not None and 0.1 < float(m.group(1)) < 0.9
    assert out.strip().endswith("OK")


@pytest.mark.slow
def test_example_25_msm_kinetics():
    out = run_example("25_msm_kinetics.py", timeout=1200)
    import re
    m = re.search(r"total-variation error vs quadrature ([0-9.]+)", out)
    assert m is not None and float(m.group(1)) < 0.12
    assert out.strip().endswith("OK")


@pytest.mark.slow
def test_example_26_temperature_extrapolation():
    out = run_example("26_temperature_extrapolation.py", timeout=1200)
    import re
    m = re.search(r"midpoint disagreement \(worst\): ([0-9.]+)%", out)
    assert m is not None and float(m.group(1)) < 8.0
    assert "Cv peak at T*" in out
    assert out.strip().endswith("OK")


@pytest.mark.slow
def test_example_27_weighted_ensemble():
    out = run_example("27_weighted_ensemble.py", timeout=1200)
    import re
    m = re.search(r"rate ratio: ([0-9.]+)", out)
    assert m is not None and 1 / 2.5 < float(m.group(1)) < 2.5
    assert out.strip().endswith("OK")


@pytest.mark.slow
def test_example_28_score_diffusion():
    out = run_example("28_score_diffusion.py", timeout=1200)
    import re
    m = re.search(r"mean \|p_model - p_target\| on grid = ([0-9.]+)", out)
    assert m is not None and float(m.group(1)) < 6e-3
    m = re.search(r"independence-MH acceptance ([0-9.]+)", out)
    assert m is not None and float(m.group(1)) > 0.5
    assert out.strip().endswith("OK")


@pytest.mark.slow
def test_example_29_vampnet_kinetics():
    out = run_example("29_vampnet_kinetics.py", timeout=1200)
    import re
    m = re.search(r"VAMP-2: net ([0-9.]+) vs linear \(TICA\) ([0-9.]+)", out)
    assert m is not None and float(m.group(1)) > float(m.group(2)) - 0.01
    m = re.search(r"accuracy ([0-9.]+)", out)
    assert m is not None and float(m.group(1)) > 0.9
    assert out.strip().endswith("OK")


@pytest.mark.slow
def test_example_30_active_learning():
    out = run_example("30_active_learning.py", timeout=1200)
    import re
    rmses = re.findall(r"force RMSE [0-9.]+ \(([0-9.]+)% of rms\)", out)
    assert len(rmses) >= 3
    # AL rounds must beat the initial committee decisively.
    assert float(rmses[2]) < 0.7 * float(rmses[0]), rmses
    assert "flagged-frame uncertainty" in out
    assert out.strip().endswith("OK") or out.strip().split("\n")[-1].startswith("OK")


@pytest.mark.slow
def test_example_31_difftre():
    out = run_example("31_difftre_top_down.py", timeout=1200)
    import re
    m = re.search(r"fitted epsilon ([0-9.]+) .* sigma ([0-9.]+)", out)
    assert m is not None
    assert abs(float(m.group(1)) - 1.0) < 0.2
    assert abs(float(m.group(2)) - 1.0) < 0.05
    assert out.strip().split("\n")[-1].startswith("OK")


@pytest.mark.slow
def test_example_32_tps():
    out = run_example("32_transition_path_sampling.py", timeout=1200)
    import re
    m = re.search(r"\|mean - saddle\| = ([0-9.]+)", out)
    assert m is not None and float(m.group(1)) < 0.25
    m = re.search(r"acceptance ([0-9.]+)", out)
    assert m is not None and float(m.group(1)) > 0.1
    assert out.strip().split("\n")[-1].startswith("OK")


@pytest.mark.slow
def test_example_33_neural_committor():
    out = run_example("33_neural_committor.py", timeout=1200)
    import re
    m = re.search(r"correlation ([0-9.-]+)", out)
    assert m is not None and float(m.group(1)) > 0.85
    assert out.strip().split("\n")[-1].startswith("OK")


@pytest.mark.slow
def test_example_34_path_integral_md():
    out = run_example("34_path_integral_md.py", timeout=1200)
    import re
    m = re.search(r"quantum energy error vs DVR: ([0-9.]+)%", out)
    assert m is not None and float(m.group(1)) < 5.0
    m = re.search(r"tunneling enhancement of barrier density: ([0-9.]+)x",
                  out)
    assert m is not None and float(m.group(1)) > 1.5
    assert out.strip().split("\n")[-1].startswith("OK")


@pytest.mark.slow
def test_example_35_rare_event_rates():
    out = run_example("35_rare_event_rates.py", timeout=1200)
    import re
    for name in ("FFS", "WE", "Kramers-TST"):
        m = re.search(rf"{name}/brute = ([0-9.]+)", out)
        assert m is not None and 0.35 < float(m.group(1)) < 2.8
    assert out.strip().split("\n")[-1].startswith("OK")


@pytest.mark.slow
def test_example_36_shear_viscosity():
    out = run_example("36_shear_viscosity.py", timeout=1500)
    import re
    m = re.search(r"eta\* = ([0-9.]+)", out)
    assert m and 1.0 < float(m.group(1)) < 8.0, out[-500:]
    assert "OK" in out


@pytest.mark.slow
def test_example_37_thermal_conductivity():
    out = run_example("37_thermal_conductivity.py", timeout=1500)
    import re
    m = re.search(r"lambda\* = ([0-9.]+)", out)
    assert m and 3.0 < float(m.group(1)) < 13.0, out[-500:]
    assert "OK" in out


@pytest.mark.slow
def test_example_38_alchemical_free_energy():
    out = run_example("38_alchemical_free_energy.py", timeout=900)
    import re
    vals = {k: float(v) for k, v in re.findall(
        r"(TI|MBAR|Widom):\s+dF_couple = ([+-][0-9.]+)", out)}
    assert set(vals) == {"TI", "MBAR", "Widom"}, out[-500:]
    assert abs(vals["TI"] - vals["Widom"]) < 0.15, vals
    assert "OK" in out


@pytest.mark.slow
def test_example_39_molecular_md_stack():
    out = run_example("39_molecular_md_stack.py", timeout=1200)
    import re
    m = re.search(r"rel err ([0-9.e-]+)", out)
    assert m and float(m.group(1)) < 3e-4, out[-500:]
    m = re.search(r"ratio ([0-9.]+)", out)
    assert m and float(m.group(1)) > 1.15, out[-500:]
    assert out.strip().split("\n")[-1] == "OK"


@pytest.mark.slow
def test_example_40_targeted_fep():
    out = run_example("40_targeted_fep.py", timeout=900)
    import re
    m = re.search(r"VALIDATED: ([0-9]+)x variance reduction", out)
    assert m and float(m.group(1)) > 5.0, out[-500:]
    m = re.search(r"within ([0-9.]+) of exact", out)
    assert m and float(m.group(1)) < 0.05, out[-500:]


@pytest.mark.slow
def test_example_41_triclinic_npt():
    out = run_example("41_triclinic_npt.py", timeout=900)
    import re
    m = re.search(r"<P_virial> = ([-0-9.]+) \(set 0\.5\)", out)
    assert m and abs(float(m.group(1)) - 0.5) < 0.1, out[-500:]
    assert out.strip().split("\n")[-1] == "All validations passed."


@pytest.mark.slow
def test_example_42_charged_crystal_npt():
    out = run_example("42_charged_crystal_npt.py", timeout=900)
    import re
    m = re.search(r"electrostatic energy/ion at d_eq: ([-0-9.]+) "
                  r"\(Madelung -M/2d = ([-0-9.]+)\)", out)
    assert m, out[-500:]
    got, want = float(m.group(1)), float(m.group(2))
    assert abs(got - want) < 0.01 * abs(want), (got, want)
    assert out.strip().split("\n")[-1] == "All validations passed."
