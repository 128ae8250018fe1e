"""Import smoke test (reference test_imports.py analog)."""


def test_package_imports():
    import vaemolsim_tpu

    for mod in ["ops", "nn", "flows", "dists", "losses", "models", "mcmc",
                "parallel", "train", "config", "coords", "utils"]:
        assert hasattr(vaemolsim_tpu, mod), mod
    assert vaemolsim_tpu.__version__


def test_key_symbols():
    from vaemolsim_tpu.dists import IndependentBlockwise  # noqa: F401
    from vaemolsim_tpu.flows import RQSSplineMAF, RQSSplineRealNVP  # noqa
    from vaemolsim_tpu.mcmc import MCMC  # noqa: F401
    from vaemolsim_tpu.models import VAE, BackmappingOnly  # noqa: F401
    from vaemolsim_tpu.nn import FCDeepNN, VectorAttention  # noqa: F401
    from vaemolsim_tpu.ops.rqs import RationalQuadraticSpline  # noqa: F401
