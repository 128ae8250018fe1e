"""Mesh-sharded PME (slab-decomposed distributed FFT) vs the
replicated path.

The reference has no electrostatics (or any distributed execution,
SURVEY.md §2.4); this covers the TPU build's scaling path for the
production molecular stack: `pme_coulomb(mesh=...)` shards atoms for
spreading, reduce-scatters the charge grid into x-slabs, runs the 3-D
rFFT as local-z/local-y FFTs + an all_to_all transpose + local-x FFT,
and row-shards the erfc/exclusion corrections.  Identical physics to
the replicated path — asserted here on the 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu.parallel.sharding import make_mesh
from vaemolsim_tpu.potentials import pme_coulomb

BOX = [9.0, 8.0, 10.0]


@pytest.fixture(scope="module")
def system():
    rng = np.random.default_rng(0)
    n = 50  # deliberately NOT divisible by 8 — exercises zero-charge pad
    q = rng.normal(size=n).astype(np.float32)
    q -= q.mean()
    x = jnp.asarray(rng.uniform(size=(n, 3)) * np.asarray(BOX),
                    jnp.float32)
    excl = np.asarray([[2 * i, 2 * i + 1] for i in range(10)])
    return q, x, excl


@pytest.fixture(scope="module")
def mesh():
    return make_mesh({"atoms": len(jax.devices())})


@pytest.mark.parametrize("kw", [
    {},  # full: recip + dense erfc real space
    {"include_real_space": False},  # the O(N)-stack pairing
], ids=["full", "recip_only"])
def test_sharded_matches_replicated(system, mesh, kw):
    q, x, excl = system
    e_sh = pme_coulomb(q, box=BOX, r_cutoff=3.0, tolerance=1e-4,
                       exclude=excl, mesh=mesh, mesh_axis="atoms", **kw)
    # Same grid for the replicated comparison (auto-grids differ by the
    # divisibility rounding).
    e_rep = pme_coulomb(q, box=BOX, r_cutoff=3.0, tolerance=1e-4,
                        exclude=excl, grid_shape=e_sh.grid_shape, **kw)
    ur = float(jax.jit(e_rep)(x))
    us = float(jax.jit(e_sh)(x))
    assert abs(ur - us) < 1e-4 * max(1.0, abs(ur)), (ur, us)
    # Forces: autodiff through reduce-scatter / all_to_all / psum.
    gr = jax.jit(jax.grad(e_rep))(x)
    gs = jax.jit(jax.grad(e_sh))(x)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gr),
                               rtol=1e-4, atol=1e-5)


def test_sharded_batch_vmap(system, mesh):
    q, x, _ = system
    e_sh = pme_coulomb(q, box=BOX, r_cutoff=3.0, tolerance=1e-4,
                       mesh=mesh, mesh_axis="atoms")
    e_rep = pme_coulomb(q, box=BOX, r_cutoff=3.0, tolerance=1e-4,
                        grid_shape=e_sh.grid_shape)
    xb = jnp.stack([x, x + 0.25])
    eb = jax.jit(e_sh)(xb)
    want = jax.jit(e_rep)(xb)
    assert eb.shape == (2,)
    np.testing.assert_allclose(np.asarray(eb), np.asarray(want),
                               rtol=1e-5, atol=1e-3)


def test_sharded_with_binned_spreading(system, mesh):
    """The scatter-free binned spreading composes with the sharded
    slab-FFT path (each shard bins its own atoms onto the local grid
    before the reduce-scatter)."""
    q, x, _ = system
    e_sh = pme_coulomb(q, box=BOX, r_cutoff=3.0, tolerance=1e-4,
                       include_real_space=False, spread="binned",
                       mesh=mesh, mesh_axis="atoms")
    e_rep = pme_coulomb(q, box=BOX, r_cutoff=3.0, tolerance=1e-4,
                        include_real_space=False, spread="scatter",
                        grid_shape=e_sh.grid_shape)
    us, ur = float(jax.jit(e_sh)(x)), float(jax.jit(e_rep)(x))
    assert abs(ur - us) < 1e-4 * max(1.0, abs(ur)), (ur, us)


def test_explicit_grid_must_divide(system, mesh):
    q, _, _ = system
    with pytest.raises(ValueError, match="divisible"):
        pme_coulomb(q, box=BOX, r_cutoff=3.0, grid_shape=(30, 30, 30),
                    mesh=mesh, mesh_axis="atoms")
