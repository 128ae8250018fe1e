"""Headline benchmarks: MC proposals/sec + VAE ELBO train steps/sec.

Workloads (BASELINE.md / SURVEY.md §6):

1. PRIMARY — the MC_Moves_with_VAEs scale: 10,000 parallel chains of
   VAE-proposed Metropolis moves (encoder -> flow prior -> decoder ->
   accept/reject), run as one jitted lax.scan that never leaves the
   device.  The reference runs the same logical workload as an un-jitted
   NumPy-driven loop (vaemolsim/mcmc.py:133-159).
2. VAE ELBO training (the second BASELINE.md "metric to report"):
   jitted scan of full ELBO train steps (grad + adam update) on the
   flagship VAE at the reference's 10k-sample batch scale.
3. Flow training wall-clock: the Using_Normalizing_Flows workload —
   100k samples, 1-D RQS-RealNVP (4 blocks x 32 bins), 10 epochs — via
   the scanned-epoch fit path.

Prints ONE JSON line.  Primary keys keep the driver contract
({"metric", "value", "unit", "vs_baseline"}; vs_baseline = value / 1e6,
the north-star target); "median"/"reps" carry run-to-run spread (the
TPU tunnel has high variance — best-of-N reflects the chip) and
"extra_metrics" carries workloads 2-3.
"""

import json
import time

N_CHAINS = 10_000
N_STEPS = 100  # the reference workload definition (10^6 proposals)
# Throughput is timed over a longer scan: this environment's TPU tunnel
# adds ~27 ms of fixed overhead to EVERY program dispatch (measured: a
# trivial jitted x+1 costs 26 ms; marginal MC cost is ~127 us/step), so
# a 100-step dispatch under-reports the chip by ~3x.  1000 steps
# amortizes the artifact; the 100-step workload wall-clock is still
# reported as an extra metric.
N_TIMING_STEPS = 1000
ELBO_BATCH = 10_000
ELBO_SCAN_STEPS = 500
FLOW_SAMPLES = 100_000
FLOW_EPOCHS = 10
FLOW_BATCH = 4096


def _probe_tpu_alive(timeout_s: int = 240, attempts: int = 3,
                     retry_wait_s: int = 90) -> bool:
    """The environment's TPU tunnel occasionally wedges (a trivial matmul
    never returns).  Probe it in a subprocess so a hang can't take down
    the bench; fall back to CPU when dead.  Wedges are transient and
    clear within minutes, so retry with a pause before giving up the
    chip (a CPU-fallback record is ~100x slower and near-worthless)."""
    import subprocess
    import sys
    code = ("import jax, jax.numpy as jnp;"
            "print(float(jnp.sum(jax.jit(lambda a: a@a)(jnp.ones((64,64))))))")
    for attempt in range(attempts):
        if attempt:
            time.sleep(retry_wait_s)
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               timeout=timeout_s, capture_output=True)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        print(f"TPU probe attempt {attempt + 1}/{attempts} failed",
              file=sys.stderr, flush=True)
    return False


def _time_reps(fn, n_reps: int = 3):
    """(best_seconds, median_seconds, all_seconds) over n_reps calls."""
    import statistics
    times = []
    for _ in range(n_reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times), statistics.median(times), times


def bench_mc(jax, jnp):
    from __graft_entry__ import _build_flagship
    from vaemolsim_tpu.mcmc import (MCMCState, make_mcmc_step, run_mcmc,
                                    vae_proposal_fns)

    vae = _build_flagship(jax.random.PRNGKey(0))
    enc, pri, dec = vae_proposal_fns(vae)

    def log_target(x):
        return -0.5 * jnp.sum(x ** 2, axis=-1)

    step = make_mcmc_step(enc, pri, dec, log_target)
    configs = jax.random.normal(jax.random.PRNGKey(1), (N_CHAINS, 2))
    state = MCMCState.create(configs, log_target(configs),
                             jax.random.PRNGKey(2))
    run = jax.jit(lambda s, n: run_mcmc(step, s, n)[0], static_argnums=1)

    # Warmup/compile with the same static step counts as the timed runs.
    jax.block_until_ready(run(state, N_TIMING_STEPS).configs)
    jax.block_until_ready(run(state, N_STEPS).configs)

    def rep():
        jax.block_until_ready(run(state, N_TIMING_STEPS).configs)

    best, median, times = _time_reps(rep)
    proposals = N_CHAINS * N_TIMING_STEPS

    def rep_workload():
        jax.block_until_ready(run(state, N_STEPS).configs)

    w_best, _, _ = _time_reps(rep_workload)
    return proposals / best, proposals / median, times, w_best


def bench_elbo_train(jax, jnp):
    """VAE ELBO train steps/sec: one jitted lax.scan of full train steps
    (value_and_grad through encoder/flow-prior/decoder + adam update) at
    the reference's 10k-sample VAE scale (models.py:289-322 analog,
    vaemolsim_tpu/models/core.py elbo_loss)."""
    import optax

    from __graft_entry__ import _build_flagship

    vae = _build_flagship(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(vae)
    x = jax.random.normal(jax.random.PRNGKey(1), (ELBO_BATCH, 2))

    def one_step(carry, _):
        model, ostate, key = carry
        key, sub = jax.random.split(key)
        loss, grads = jax.value_and_grad(
            lambda m: m.elbo_loss(x, sub, train=True)[0])(model)
        updates, ostate = opt.update(grads, ostate, model)
        return (optax.apply_updates(model, updates), ostate, key), loss

    @jax.jit
    def run(model, ostate, key):
        (model, ostate, _), losses = jax.lax.scan(
            one_step, (model, ostate, key), None, length=ELBO_SCAN_STEPS)
        return model, ostate, losses

    out = run(vae, opt_state, jax.random.PRNGKey(2))
    jax.block_until_ready(out[2])
    assert bool(jnp.all(jnp.isfinite(out[2]))), "non-finite ELBO losses"

    def rep():
        jax.block_until_ready(run(vae, opt_state, jax.random.PRNGKey(2))[2])

    best, median, times = _time_reps(rep)
    return ELBO_SCAN_STEPS / best, ELBO_SCAN_STEPS / median, times


def bench_flow_train(jax, jnp):
    """Wall-clock for the 100k-sample flow-training workload
    (Using_Normalizing_Flows.ipynb cells 4/10/24): 10 scanned epochs."""
    from vaemolsim_tpu.dists import StaticFlowedDistribution
    from vaemolsim_tpu.flows import RQSSplineRealNVP
    from vaemolsim_tpu.ops import distributions as d
    from vaemolsim_tpu.train import fit

    flow = StaticFlowedDistribution(
        flow=RQSSplineRealNVP.create(
            jax.random.PRNGKey(0), 1, num_blocks=4,
            rqs_params={"num_bins": 32, "hidden_dim": 100,
                        "bin_range": [-5.0, 5.0]}),
        base=d.Independent(d.Normal(jnp.zeros(1), jnp.ones(1)), 1))
    # 4-mode 1-D mixture (the notebook's target family).
    key = jax.random.PRNGKey(1)
    comp = jax.random.randint(key, (FLOW_SAMPLES,), 0, 4)
    centers = jnp.asarray([-3.0, -1.0, 1.0, 3.0])
    data = (centers[comp] + 0.25 * jax.random.normal(
        jax.random.PRNGKey(2), (FLOW_SAMPLES,)))[:, None]

    def loss_fn(f, batch, k):
        del k
        return -jnp.mean(f().log_prob(batch))

    # One fit call; the first epoch absorbs the compile (fit's scanned
    # epoch is a fresh jit closure per call), so the steady-state
    # wall-clock is mean(epoch 2..N) * FLOW_EPOCHS.
    import statistics
    _, hist = fit(flow, loss_fn, data, key=jax.random.PRNGKey(3),
                  num_epochs=FLOW_EPOCHS + 1, batch_size=FLOW_BATCH,
                  scan_epochs=True)
    assert hist["loss"][-1] < hist["loss"][0]
    return statistics.mean(hist["epoch_time_s"][1:]) * FLOW_EPOCHS


def bench_backmapping_embed(jax, jnp):
    """Config-3 backmapping hot spot (SURVEY.md §3.4): DistanceSelection
    + GA-attention embedding at the Molecular_Backmapping scale (batch
    200 frames, max_included 10, embed 20).  Marginal per-call time from
    a scan (cancels the tunnel's fixed dispatch overhead).  Full study
    incl. max_included=50 shapes: tools/bench_attention.py +
    docs/performance.md."""
    from vaemolsim_tpu.nn import (DistanceSelection,
                                  LocalParticleDescriptors,
                                  ParticleEmbedding)

    batch, n_part = 200, 30
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    lpd = LocalParticleDescriptors(
        select=DistanceSelection.create(cutoff=3.0, max_included=10),
        embed=ParticleEmbedding.create(keys[0], info_dim=2,
                                       embedding_dim=20, hidden_dim=40))
    coords = jax.random.normal(keys[1], (batch, n_part, 3)) * 1.5
    info = jax.random.normal(keys[2], (batch, n_part, 2))
    ref = jax.random.normal(keys[3], (batch, 3)) * 0.3

    def body(c, _):
        out = lpd(c, ref, info)
        return c + 1e-6 * jnp.mean(out), None

    def timed(S):
        f = jax.jit(lambda a: jax.lax.scan(body, a, None, length=S)[0])
        jax.block_until_ready(f(coords))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(coords))
            best = min(best, time.perf_counter() - t0)
        return best

    per_call = (timed(200) - timed(20)) / 180
    return batch / per_call


def main():
    import os
    import sys
    if not _probe_tpu_alive():
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        print("TPU tunnel unresponsive; benching on CPU", file=sys.stderr,
              flush=True)
    import jax

    # Hardware-RNG fast path: generation via XLA's RngBitGenerator
    # instead of software threefry.  Measured on v5e: 84.9M -> 101.9M
    # props/s at 10k chains (the PRNG was ~20% of the optimized step).
    # MH is exact for any sound uniform source; statistical correctness
    # under rbg is covered by
    # tests/test_mcmc.py::TestEngineStatistics::test_independence_sampler_rbg_prng.
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from vaemolsim_tpu.nn.core import set_compute_dtype

    # Proposal networks in bfloat16 (native MXU dtype): MH stays exact —
    # forward and reverse densities use the same bf16-net-defined
    # proposal — and acceptance arithmetic stays float32.  Equilibrium
    # preservation under this mode is covered by
    # tests/test_mcmc.py::TestFullPipelineStatistics.
    set_compute_dtype(jnp.bfloat16)

    best_rate, median_rate, times, workload_s = bench_mc(jax, jnp)
    result = {
        "metric": "vae_mc_proposals_per_sec_per_chip",
        "value": round(best_rate, 1),
        "unit": "proposals/sec/chip",
        "vs_baseline": round(best_rate / 1.0e6, 4),
        "median": round(median_rate, 1),
        "reps_s": [round(t, 4) for t in times],
        "timing_steps": N_TIMING_STEPS,
        # Make a tunnel-wedge CPU fallback unmistakable in the record:
        # TPU numbers are ~100M props/s, CPU ~0.7M.
        "platform": jax.default_backend(),
    }

    extras = [{
        "metric": "mc_reference_workload_wallclock",
        "value": round(workload_s, 4),
        "unit": f"seconds ({N_CHAINS} chains x {N_STEPS} steps, one "
                f"dispatch incl. ~27ms tunnel overhead)",
    }]
    try:
        best_sps, median_sps, etimes = bench_elbo_train(jax, jnp)
        extras.append({
            "metric": "vae_elbo_train_steps_per_sec",
            "value": round(best_sps, 2),
            "unit": f"steps/sec (batch {ELBO_BATCH})",
            "median": round(median_sps, 2),
            "reps_s": [round(t, 4) for t in etimes],
        })
    except Exception as e:  # keep the primary metric alive
        extras.append({"metric": "vae_elbo_train_steps_per_sec",
                       "error": repr(e)})
    try:
        dt = bench_flow_train(jax, jnp)
        extras.append({
            "metric": "flow_train_100k_10epoch_wallclock",
            "value": round(dt, 3),
            "unit": "seconds",
        })
    except Exception as e:
        extras.append({"metric": "flow_train_100k_10epoch_wallclock",
                       "error": repr(e)})
    try:
        fps = bench_backmapping_embed(jax, jnp)
        extras.append({
            "metric": "backmapping_embed_frames_per_sec",
            "value": round(fps, 1),
            "unit": "frames/sec (batch 200, max_included 10, embed 20)",
        })
    except Exception as e:
        extras.append({"metric": "backmapping_embed_frames_per_sec",
                       "error": repr(e)})
    result["extra_metrics"] = extras
    print(json.dumps(result))


if __name__ == "__main__":
    main()
