"""Multi-process (multi-host) runtime tests (SURVEY.md §2.4 DCN story;
VERDICT round-2 item 2).

The real test spawns TWO separate JAX processes (4 virtual CPU devices
each, gloo cross-process collectives, coordinator on localhost) running
tools/distributed_smoke.py: distributed init -> process-spanning mesh ->
data-parallel fit with per-process data shards -> chain-sharded MC scan
-> collective orbax checkpoint save/restore.  Single-process helper
semantics are covered in-process.
"""

import os
import sys

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


@pytest.mark.skipif(sys.platform == "win32",
                    reason="gloo cross-process CPU collectives are not "
                           "supported in jaxlib Windows wheels")
def test_two_process_smoke(tmp_path):
    """2 processes x 4 CPU devices: the full multi-host workload
    (spawn harness shared with __graft_entry__ dryrun phase 5)."""
    from distributed_smoke import spawn
    spawn(2, 4, str(tmp_path))


class TestSingleProcessHelpers:
    """The distributed helpers degrade to sensible single-process
    behavior (so library code can call them unconditionally)."""

    def test_process_identity(self):
        from vaemolsim_tpu import parallel
        assert parallel.process_count() == 1
        assert parallel.process_index() == 0
        assert parallel.is_coordinator()

    def test_local_global_roundtrip(self):
        from vaemolsim_tpu import parallel
        mesh = parallel.make_mesh({"chain": len(jax.devices())})
        x = np.arange(32.0, dtype=np.float32).reshape(16, 2)
        g = parallel.local_to_global(x, parallel.chain_sharding(mesh, 2))
        assert g.shape == (16, 2)
        back = parallel.global_to_local(g)
        np.testing.assert_array_equal(back, x)

    def test_local_to_global_pytree_and_callable_sharding(self):
        from vaemolsim_tpu import parallel
        mesh = parallel.make_mesh({"chain": len(jax.devices())})

        def spec(a):
            return parallel.chain_sharding(mesh, np.asarray(a).ndim)

        tree = {"a": np.zeros((8, 3), np.float32),
                "b": np.ones((8,), np.float32)}
        g = parallel.local_to_global(tree, spec)
        assert g["a"].shape == (8, 3) and g["b"].shape == (8,)

    def test_allmean_broadcast_sync_degenerate(self):
        from vaemolsim_tpu import parallel
        out = parallel.process_allmean({"x": 3.0})
        assert float(out["x"]) == 3.0
        t = parallel.broadcast_from_coordinator({"y": np.ones(2)})
        np.testing.assert_array_equal(t["y"], np.ones(2))
        parallel.sync_processes("noop")  # must not raise

    def test_fit_process_local_requires_scan_epochs(self):
        import jax.numpy as jnp

        from vaemolsim_tpu import parallel
        from vaemolsim_tpu.train import fit
        mesh = parallel.make_mesh({"batch": len(jax.devices())})
        model = {"w": jnp.zeros(2)}

        def loss(m, b, k):
            return jnp.mean((b @ m["w"]) ** 2)

        with pytest.raises(ValueError, match="scan_epochs"):
            fit(model, loss, np.zeros((16, 2), np.float32),
                key=jax.random.PRNGKey(0), mesh=mesh,
                process_local_data=True)
        with pytest.raises(ValueError, match="mesh"):
            fit(model, loss, np.zeros((16, 2), np.float32),
                key=jax.random.PRNGKey(0), scan_epochs=True,
                process_local_data=True)

    def test_fit_process_local_single_process(self):
        """process_local_data in a 1-process run == plain mesh fit."""
        import jax.numpy as jnp

        from vaemolsim_tpu import parallel
        from vaemolsim_tpu.train import fit
        mesh = parallel.make_mesh({"batch": len(jax.devices())})
        model = {"w": jnp.zeros(2)}
        data = np.random.default_rng(0).normal(
            size=(64, 2)).astype(np.float32)

        def loss(m, b, k):
            del k
            return jnp.mean((b @ m["w"] - 1.0) ** 2)

        m1, h1 = fit(model, loss, data, key=jax.random.PRNGKey(1),
                     num_epochs=3, batch_size=32, scan_epochs=True,
                     mesh=mesh, process_local_data=True)
        m2, h2 = fit(model, loss, data, key=jax.random.PRNGKey(1),
                     num_epochs=3, batch_size=32, scan_epochs=True,
                     mesh=mesh)
        np.testing.assert_allclose(h1["loss"], h2["loss"], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(m1["w"]),
                                   np.asarray(m2["w"]), rtol=1e-6)
        assert h1["loss"][-1] < h1["loss"][0]
