"""vaemolsim_tpu: a TPU-native (JAX/XLA/Pallas) framework for VAEs in
molecular simulation.

A from-scratch rebuild of the capabilities of
`Monroe-Molecular-Simulation-Group/vae-mol-sim` (vaemolsim): probabilistic
coarse-graining and backmapping of molecular systems, rational-quadratic
spline normalizing flows over periodic and non-periodic internal
coordinates, distribution-emitting neural layers, ELBO/KL losses, and a
VAE-proposal Metropolis Monte Carlo engine — designed TPU-first:

- functional distribution / bijector pytrees (no Python-object loops on the
  hot path; heterogeneous blockwise distributions are vectorized by family),
- Flax modules as parameter containers, pure-function compute,
- a fully jitted ``lax.scan`` MC inner loop, ``vmap``-ed over thousands of
  chains and shardable over a ``jax.sharding.Mesh`` (chain-parallel DP with
  replica exchange via ``lax.ppermute``),
- Pallas kernels for the hot ops (RQS spline eval, von Mises log-probs).

Reference parity map (see SURVEY.md): ``ops.distributions`` +
``ops.bijectors`` replace tfp.distributions/tfp.bijectors usage;
``nn`` replaces vaemolsim/mappings.py; ``flows`` replaces
vaemolsim/flows.py; ``dists`` replaces vaemolsim/dists.py; ``losses``
replaces vaemolsim/losses.py; ``models`` replaces vaemolsim/models.py;
``mcmc`` replaces vaemolsim/mcmc.py.
"""

import os as _os

if _os.environ.get("VAEMOLSIM_JAX_CACHE_DIR"):
    # Opt-in persistent XLA compilation cache (the test/example lanes
    # set this so the 100+ processes of a CI run share compiles; env
    # vars alone don't enable it in this jax build — the config API
    # does).  Harmless if the dir is stale: cache keys include the
    # jax/XLA versions.
    import jax as _jax

    for _name, _val in (
            ("jax_compilation_cache_dir",
             _os.environ["VAEMOLSIM_JAX_CACHE_DIR"]),
            ("jax_persistent_cache_min_compile_time_secs", 0.5),
            ("jax_persistent_cache_min_entry_size_bytes", 0)):
        try:  # config names vary across jax versions; per-key so a
            #   rejected tuning knob cannot disable (or misreport) the
            #   cache dir itself
            _jax.config.update(_name, _val)
        except Exception as _e:
            import warnings as _warnings

            _warnings.warn(f"VAEMOLSIM_JAX_CACHE_DIR: this jax build "
                           f"rejected {_name}={_val!r} ({_e!r}); "
                           "continuing with the remaining cache config.")

from vaemolsim_tpu import ops  # noqa: F401
from vaemolsim_tpu import nn  # noqa: F401
from vaemolsim_tpu import flows  # noqa: F401
from vaemolsim_tpu import dists  # noqa: F401
from vaemolsim_tpu import losses  # noqa: F401
from vaemolsim_tpu import models  # noqa: F401
from vaemolsim_tpu import mcmc  # noqa: F401
from vaemolsim_tpu import parallel  # noqa: F401
from vaemolsim_tpu import train  # noqa: F401
from vaemolsim_tpu import config  # noqa: F401
from vaemolsim_tpu import coords  # noqa: F401
from vaemolsim_tpu import cg  # noqa: F401
from vaemolsim_tpu import potentials  # noqa: F401
from vaemolsim_tpu import md  # noqa: F401
from vaemolsim_tpu import pimd  # noqa: F401
from vaemolsim_tpu import bd  # noqa: F401
from vaemolsim_tpu import dpd  # noqa: F401
from vaemolsim_tpu import gle  # noqa: F401
from vaemolsim_tpu import metadynamics  # noqa: F401
from vaemolsim_tpu import opes  # noqa: F401
from vaemolsim_tpu import colvars  # noqa: F401
from vaemolsim_tpu import abf  # noqa: F401
from vaemolsim_tpu import paths  # noqa: F401
from vaemolsim_tpu import observables  # noqa: F401
from vaemolsim_tpu import msm  # noqa: F401
from vaemolsim_tpu import extrapolation  # noqa: F401
from vaemolsim_tpu import difftre  # noqa: F401
from vaemolsim_tpu import vamp  # noqa: F401
from vaemolsim_tpu import we  # noqa: F401
from vaemolsim_tpu import data  # noqa: F401
from vaemolsim_tpu import utils  # noqa: F401

from vaemolsim_tpu._version import __version__  # noqa: F401
