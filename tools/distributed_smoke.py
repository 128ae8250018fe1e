"""Multi-process smoke workload: one worker process of an N-process run.

Exercises the full SURVEY.md §2.4 multi-host story on one machine
(process-per-"host", 4 virtual CPU devices each, gloo cross-process
collectives):

1. ``parallel.initialize_distributed`` — runtime bring-up.
2. A process-spanning mesh from the unchanged ``make_mesh``.
3. Data-parallel ``train.fit(..., process_local_data=True)`` — each
   process feeds ONLY its local data shard; one scanned-epoch SPMD
   program trains the flagship VAE; final parameters must be
   bit-identical across processes (the gradient all-reduce makes them
   so).
4. A chain-sharded MC scan over the global mesh.
5. Collective checkpoint save/restore through train.checkpoint (orbax
   multi-host protocol) of the sharded MC state.

Usage (spawned by tests/test_distributed.py and __graft_entry__
dryrun phase 5):

    python tools/distributed_smoke.py <pid> <nproc> <port> <devices_per_proc> <tmpdir>

Prints "DISTRIBUTED SMOKE OK <pid>" on success.
"""

import os
import sys


def main():
    pid, nproc, port, dev_per_proc, tmpdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], int(sys.argv[4]),
        sys.argv[5])
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={dev_per_proc}")
    import jax
    jax.config.update("jax_platforms", "cpu")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from vaemolsim_tpu import parallel
    parallel.initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nproc,
        process_id=pid)

    import jax.numpy as jnp
    import numpy as np

    assert jax.process_count() == nproc
    assert jax.local_device_count() == dev_per_proc
    n_global = nproc * dev_per_proc
    assert jax.device_count() == n_global

    # --- global mesh from the unchanged mesh factory ---
    mesh = parallel.make_mesh({"batch": n_global})

    # --- per-process data shards -> distributed fit ---
    from __graft_entry__ import _build_flagship  # repo root is on sys.path
    from vaemolsim_tpu.train import fit

    vae = _build_flagship(jax.random.PRNGKey(0))  # same seed everywhere
    rng = np.random.default_rng(100 + pid)  # DIFFERENT local data per proc
    local_x = rng.normal(size=(64, 2)).astype(np.float32)

    def loss_fn(m, batch, k):
        return m.elbo_loss(batch, k, train=True)[0]

    trained, hist = fit(vae, loss_fn, local_x, key=jax.random.PRNGKey(1),
                        num_epochs=2, batch_size=32, scan_epochs=True,
                        mesh=mesh, mesh_axis="batch",
                        process_local_data=True)
    assert np.isfinite(hist["loss"]).all(), hist["loss"]

    # Parameters identical across processes (all-reduced grads).
    leaves = jax.tree_util.tree_leaves(trained)
    finger = float(sum(jnp.sum(jnp.asarray(l, jnp.float32) ** 2)
                       for l in leaves if hasattr(l, "dtype")))
    fingers = parallel.process_allmean({"f": finger})
    assert abs(fingers["f"] - finger) < 1e-6 * max(abs(finger), 1.0), (
        pid, finger, fingers["f"])

    # --- chain-sharded MC scan over the process-spanning mesh ---
    from vaemolsim_tpu.mcmc import (MCMCState, make_mcmc_step, run_mcmc,
                                    vae_proposal_fns)
    cmesh = parallel.make_mesh({"chain": n_global})
    enc, pri, dec = vae_proposal_fns(trained)

    def log_target(x):
        return -0.5 * jnp.sum(x ** 2, axis=-1)

    step = make_mcmc_step(enc, pri, dec, log_target)
    # Global chain state: every process contributes its chains.
    local_chains = rng.normal(size=(16, 2)).astype(np.float32)
    gconfigs = parallel.local_to_global(
        local_chains, parallel.chain_sharding(cmesh, 2))
    genergies = jax.jit(
        log_target,
        out_shardings=parallel.chain_sharding(cmesh, 1))(gconfigs)
    st = MCMCState.create(gconfigs, genergies, jax.random.PRNGKey(2))
    st = parallel.shard_chain_state(st, cmesh)
    st, _ = jax.jit(lambda s: run_mcmc(step, s, 5))(st)
    rate = float(st.acceptance_rate)
    assert 0.0 <= rate <= 1.0 and np.isfinite(rate), rate
    assert int(st.num_trials) == nproc * 16 * 5

    # --- collective multi-host checkpoint of the sharded state ---
    from vaemolsim_tpu.train import restore_checkpoint, save_checkpoint
    ckpt = os.path.join(tmpdir, "dist_ck")
    save_checkpoint(ckpt, st)
    parallel.sync_processes("ckpt-saved")
    template = MCMCState.create(
        parallel.local_to_global(np.zeros_like(local_chains),
                                 parallel.chain_sharding(cmesh, 2)),
        jax.jit(log_target,
                out_shardings=parallel.chain_sharding(cmesh, 1))(
            parallel.local_to_global(np.zeros_like(local_chains),
                                     parallel.chain_sharding(cmesh, 2))),
        jax.random.PRNGKey(0))
    template = parallel.shard_chain_state(template, cmesh)
    back = restore_checkpoint(ckpt, template)
    assert int(back.num_trials) == int(st.num_trials)
    local_back = parallel.global_to_local(back.configs)
    local_now = parallel.global_to_local(st.configs)
    np.testing.assert_array_equal(local_back, local_now)

    print(f"DISTRIBUTED SMOKE OK {pid}", flush=True)


def spawn(num_processes: int, devices_per_proc: int, tmpdir: str,
          timeout: float = 540.0) -> None:
    """Spawn ``num_processes`` worker copies of this script on localhost
    (coordinator on a free port) and verify every one prints its OK
    marker.  Shared by tests/test_distributed.py and __graft_entry__
    dryrun phase 5.  Raises RuntimeError on any worker failure."""
    import socket
    import subprocess

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    # Strip XLA_FLAGS: the workers set their own device count, and an
    # inherited --xla_force_host_platform_device_count would override it.
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), str(i),
             str(num_processes), str(port), str(devices_per_proc),
             str(tmpdir)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for i in range(num_processes)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 or f"DISTRIBUTED SMOKE OK {i}" not in out:
            raise RuntimeError(
                f"distributed smoke worker {i} failed "
                f"(rc={p.returncode}):\n{out[-4000:]}")


if __name__ == "__main__":
    main()
