"""Test configuration: run on a virtual 8-device CPU mesh.

Mirrors the driver's multi-chip dry-run environment: tests exercise
sharding/collectives on 8 virtual CPU devices (real TPU hardware in this
environment is a single chip; benches run there instead).
Must set env vars before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent XLA compilation cache, shared by every test process and
# the example-smoke subprocesses (the suite is compile-dominated on
# CPU; vaemolsim_tpu/__init__.py applies this via the config API).
os.environ.setdefault(
    "VAEMOLSIM_JAX_CACHE_DIR",
    os.path.expanduser("~/.cache/vaemolsim_jax_cache"))
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The environment's TPU-tunnel plugin (sitecustomize) may have already
# imported jax and pinned the platform before conftest runs; force CPU at
# the config level so tests always run on the 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_key():
    return jax.random.PRNGKey(0)


@pytest.fixture
def normal_dist():
    """5-dim independent normal with linspace locs (mirrors the reference's
    conftest fixture, vaemolsim/tests/conftest.py:12-19)."""
    from vaemolsim_tpu.ops import distributions as d
    loc = jnp.linspace(-2.0, 2.0, 5)
    return d.Independent(d.Normal(loc=loc, scale=jnp.ones(5)), 1)


@pytest.fixture
def vonmises_dist():
    from vaemolsim_tpu.ops import distributions as d
    loc = jnp.linspace(-2.0, 2.0, 5)
    return d.Independent(d.VonMises(loc=loc, concentration=jnp.ones(5)), 1)


@pytest.fixture
def normal_sample(normal_dist):
    return normal_dist.sample(jax.random.PRNGKey(42), (10,))


@pytest.fixture
def vonmises_sample(vonmises_dist):
    return vonmises_dist.sample(jax.random.PRNGKey(43), (10,))
