"""Headline benchmarks + roofline accounting + on-chip correctness.

Workloads (BASELINE.md / SURVEY.md §6):

1. PRIMARY — VAE-proposed Metropolis MC throughput at 50k chains (the
   chip's best operating point) with the 10k-chain reference-notebook
   scale reported alongside for comparability.  One jitted lax.scan
   that never leaves the device; the reference runs the same logical
   workload as an un-jitted NumPy-driven loop (vaemolsim/mcmc.py:133-159).
2. VAE ELBO training steps/sec (batch 10k, scanned train loop).
3. Flow training wall-clock: the Using_Normalizing_Flows workload.
4. Backmapping embed: the reference-notebook scale (max_included 10)
   plus a COMPUTE-DENSE configuration (batch 200, max_included 50 — the
   reference's DistanceSelection default, vaemolsim/mappings.py:334)
   where MFU is meaningful.
5. Statistical validation on the chip (VERDICT r2 item 5): mixed
   VAE/MALA/random-walk chains against an analytic bimodal target —
   mode balance / second moment / R-hat recorded and ASSERTED, so every
   BENCH_rN records sampler correctness on the hardware, not just speed.
6. Pallas backend health (VERDICT r2 item 7): the TPU-only compiled
   paths (rqs_pallas, maf_fused, whole-proposal kernel) each run one
   golden-checked eval; ``pallas_backends_ok`` lands in the JSON so
   backend rot is caught the round it happens.

Roofline accounting (VERDICT r2 item 3): per-step FLOPs and HBM bytes
come from XLA's post-fusion cost analysis of the exact compiled step
(``.lower().compile().cost_analysis()``), giving ``mfu``,
``hbm_utilization`` and a ``bound`` classification per workload against
the chip's peak numbers.  The closed-form dominant-term accounting and
the interpretation live in docs/performance.md.

Un-losable emission contract (VERDICT r3 item 1 — BENCH_r03 hung and
recorded NOTHING): the record is printed (and flushed, and mirrored to
``bench_latest.json``) immediately after the PRIMARY workload and then
re-emitted after EVERY later stage, so the driver's output tail always
ends with a parseable JSON line no matter where a later stage dies.
Every stage runs under a watchdog thread with a per-stage timeout (a
wedged TPU tunnel hangs ``block_until_ready`` uninterruptibly — a
thread can be abandoned, the process cannot); after the first wedge all
remaining device stages are skipped (dispatches would queue behind the
stuck one) and whatever was measured is kept.  A global deadline
(default 18 min, ``BENCH_DEADLINE_S``) bounds the whole run below the
driver's external timeout.  CPU-fallback runs (dead tunnel) shrink all
workloads ~25x so even they complete and parse.

Prints JSON lines; the LAST one is the record.  Primary keys keep the
driver contract ({"metric", "value", "unit", "vs_baseline"};
vs_baseline = value / 1e6, the north-star target).
"""

import json
import os
import sys
import threading
import time

N_CHAINS_REF = 10_000  # the reference workload scale (MC notebook)
N_CHAINS_HEADLINE = 50_000  # the chip's best operating point (r2 sweep)
N_STEPS = 100  # reference workload definition (10^6 proposals at 10k)
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
STATS_CHAINS = 10_000
STATS_STEPS = 1500

_T0 = time.monotonic()
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", 18 * 60))


def _remaining() -> float:
    return DEADLINE_S - (time.monotonic() - _T0)


def _shrink_for_cpu():
    """Dead-tunnel fallback: a CPU run at TPU scales is what timed out
    in round 3.  ~25x smaller keeps a (clearly-marked, ~100x-slower)
    record completing in minutes."""
    global N_CHAINS_REF, N_CHAINS_HEADLINE, N_TIMING_STEPS
    global ELBO_BATCH, ELBO_SCAN_STEPS, FLOW_SAMPLES, FLOW_EPOCHS
    global STATS_CHAINS, STATS_STEPS
    N_CHAINS_REF = 2_000
    N_CHAINS_HEADLINE = 2_000
    N_TIMING_STEPS = 100
    ELBO_BATCH = 1_000
    ELBO_SCAN_STEPS = 50
    FLOW_SAMPLES = 20_000
    FLOW_EPOCHS = 3
    STATS_CHAINS = 1_000
    STATS_STEPS = 500


def _probe_tpu_alive(timeout_s: int = 60, attempts: int = 2,
                     retry_wait_s: int = 30) -> bool:
    """The environment's TPU tunnel occasionally wedges (a trivial matmul
    never returns).  Probe it in a subprocess so a hang can't take down
    the bench; fall back to CPU when dead.  Budget cut to <=2.5 min
    total (VERDICT r3: the old 3x240s+2x90s policy alone could burn
    ~15 min of the driver's window)."""
    import subprocess
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


class _StageTimeout(Exception):
    pass


def _run_stage(fn, timeout_s: float):
    """Run ``fn()`` in a daemon thread, abandon it on timeout.

    Returns (value, error_string_or_None, timed_out).  A wedged-tunnel
    ``block_until_ready`` blocks in C++ without returning to the
    interpreter, so SIGALRM can't interrupt it — but an abandoned
    daemon thread costs nothing and the main thread keeps emitting."""
    box = {}

    def target():
        try:
            box["value"] = fn()
        except BaseException as e:  # noqa: BLE001 — recorded, not raised
            box["error"] = repr(e)[:300]

    t = threading.Thread(target=target, daemon=True)
    t.start()
    t.join(max(timeout_s, 1.0))
    if t.is_alive():
        return None, f"stage watchdog timeout after {timeout_s:.0f}s", True
    return box.get("value"), box.get("error"), False


def _time_reps(fn, n_reps: int = 3):
    """(best_seconds, median_seconds, all_seconds) over n_reps calls."""
    import statistics
    times = []
    for _ in range(n_reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times), statistics.median(times), times


# ---------------------------------------------------------------------
# Roofline accounting
# ---------------------------------------------------------------------

def _chip_peaks(jax):
    """(peak bf16 FLOP/s, peak HBM bytes/s, device kind) for the current
    chip; (None, None, kind) when unknown (e.g. CPU fallback)."""
    kind = jax.devices()[0].device_kind
    k = kind.lower()
    table = [
        (("v5 lite", "v5e"), (197e12, 819e9)),
        (("v5p",), (459e12, 2765e9)),
        (("v6", "trillium"), (918e12, 1640e9)),
        (("v4",), (275e12, 1228e9)),
        (("v3",), (123e12, 900e9)),
        (("v2",), (45e12, 700e9)),
    ]
    for keys, peaks in table:
        if any(s in k for s in keys):
            return peaks[0], peaks[1], kind
    return None, None, kind


def _cost_per_call(jax, fn, *args):
    """(flops, hbm_bytes) of one call from XLA's post-fusion cost
    analysis of the compiled program — the same HLO that runs."""
    try:
        c = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def _roofline(jax, flops_per_call, bytes_per_call, calls_per_sec):
    """MFU / memory-roofline position / bound classification.

    ``bytes`` come from XLA cost analysis = operand bytes crossing
    fusion boundaries.  That is an UPPER bound on HBM traffic: operands
    re-read from VMEM/caches count too, so ``memory_boundary_fraction``
    (boundary bytes/s over HBM peak) can exceed 1.0 — which itself is
    diagnostic: the workload moves operands faster than HBM allows, so
    it is running at the memory-system roofline with VMEM-served reuse
    making up the difference."""
    peak_flops, peak_bw, kind = _chip_peaks(jax)
    out = {"flops_per_step": round(flops_per_call),
           "boundary_bytes_per_step": round(bytes_per_call),
           "achieved_tflops": round(flops_per_call * calls_per_sec / 1e12, 4),
           "boundary_gbps": round(bytes_per_call * calls_per_sec / 1e9, 2)}
    if peak_flops:
        mfu = flops_per_call * calls_per_sec / peak_flops
        bwu = bytes_per_call * calls_per_sec / peak_bw
        out["mfu"] = round(mfu, 5)
        out["memory_boundary_fraction"] = round(bwu, 4)
        out["bound"] = ("compute" if mfu > 0.33 else
                        "memory" if bwu > 0.5 else "latency")
        out["device_kind"] = kind
        # Semantics documented in docs/performance.md ("Bytes
        # semantics"): boundary bytes are an UPPER bound on HBM traffic.
        out["bytes_semantics"] = "xla-fusion-boundary-upper-bound"
    return out


# ---------------------------------------------------------------------
# Workloads
# ---------------------------------------------------------------------

def _mc_setup(jax, jnp, n_chains):
    from __graft_entry__ import _build_flagship
    from vaemolsim_tpu.mcmc import (MCMCState, make_mcmc_step, run_mcmc,
                                    vae_proposal_fns)

    vae = _build_flagship(jax.random.PRNGKey(0))
    enc, pri, dec = vae_proposal_fns(vae)

    def log_target(x):
        return -0.5 * jnp.sum(x ** 2, axis=-1)

    step = make_mcmc_step(enc, pri, dec, log_target)
    configs = jax.random.normal(jax.random.PRNGKey(1), (n_chains, 2))
    state = MCMCState.create(configs, log_target(configs),
                             jax.random.PRNGKey(2))
    run = jax.jit(lambda s, n: run_mcmc(step, s, n)[0], static_argnums=1)
    return step, state, run


def _device_busy_us_per_step(jax, run, state, n_steps):
    """Hardware device-busy microseconds per MC step from an xplane
    trace: the summed duration of the top-level scan's ``while`` op
    (the round-4 hbm_profile methodology).  Separates the CHIP number
    from axon-tunnel dispatch/gap overhead (VERDICT r4 item 5: at 50k
    chains wall-clock exceeds device-busy by ~1.5x, and a regression
    in the chip rate must not hide behind tunnel weather)."""
    try:
        import tempfile

        from tools.hbm_profile import _load_xspaces
        jax.block_until_ready(run(state, n_steps).configs)
        with tempfile.TemporaryDirectory() as tmp:
            with jax.profiler.trace(tmp):
                out = run(state, n_steps)
                jax.block_until_ready(out.configs)
            spaces = _load_xspaces(tmp)
        best = 0.0
        for xs in spaces:
            for plane in xs.planes:
                if "/device:TPU" not in plane.name:
                    continue
                totals = {}
                for line in plane.lines:
                    if "Ops" not in line.name or "Async" in line.name:
                        continue
                    for ev in line.events:
                        em = plane.event_metadata[ev.metadata_id].name
                        key = em.split(" = ")[0].lstrip("%")
                        if key.startswith("while"):
                            totals[key] = (totals.get(key, 0)
                                           + ev.duration_ps)
                if totals:
                    # The top-level scan is the single largest while
                    # total; nested whiles are strictly smaller.
                    best = max(best, max(totals.values()))
        return (best / 1e6) / n_steps if best else None   # ps -> us
    except Exception:
        return None


def bench_mc(jax, jnp, n_chains, include_workload=False,
             measure_device_busy=False):
    step, state, run = _mc_setup(jax, jnp, n_chains)

    # Warmup/compile with the same static step counts as the timed runs.
    jax.block_until_ready(run(state, N_TIMING_STEPS).configs)

    def rep():
        jax.block_until_ready(run(state, N_TIMING_STEPS).configs)

    best, median, times = _time_reps(rep)
    proposals = n_chains * N_TIMING_STEPS
    steps_per_sec = N_TIMING_STEPS / best
    flops, bts = _cost_per_call(jax, step, state)
    roof = _roofline(jax, flops, bts, steps_per_sec)

    busy_us = None
    if measure_device_busy and jax.default_backend() == "tpu":
        busy_us = _device_busy_us_per_step(jax, run, state,
                                           N_TIMING_STEPS)

    w_best = None
    if include_workload:
        jax.block_until_ready(run(state, N_STEPS).configs)
        w_best, _, _ = _time_reps(
            lambda: jax.block_until_ready(run(state, N_STEPS).configs))
    return {"rate": proposals / best, "median_rate": proposals / median,
            "times": times, "workload_s": w_best, "roofline": roof,
            "device_busy_us_per_step": (round(busy_us, 2)
                                        if busy_us is not None
                                        else None)}


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
    flops, bts = _cost_per_call(
        jax, lambda c: one_step(c, None)[0],
        (vae, opt_state, jax.random.PRNGKey(2)))
    roof = _roofline(jax, flops, bts, ELBO_SCAN_STEPS / best)
    return ELBO_SCAN_STEPS / best, ELBO_SCAN_STEPS / median, times, roof


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


def _embed_setup(jax, jnp, batch, n_part, max_included, hidden, embed):
    from vaemolsim_tpu.nn import (DistanceSelection,
                                  LocalParticleDescriptors,
                                  ParticleEmbedding)

    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    lpd = LocalParticleDescriptors(
        select=DistanceSelection.create(cutoff=6.0,
                                        max_included=max_included),
        embed=ParticleEmbedding.create(keys[0], info_dim=2,
                                       embedding_dim=embed,
                                       hidden_dim=hidden))
    coords = jax.random.normal(keys[1], (batch, n_part, 3)) * 1.5
    info = jax.random.normal(keys[2], (batch, n_part, 2))
    ref = jax.random.normal(keys[3], (batch, 3)) * 0.3
    return lpd, coords, info, ref


def bench_backmapping_embed(jax, jnp, batch=200, n_part=30,
                            max_included=10, hidden=40, embed=20,
                            scan_lens=(200, 20)):
    """Backmapping hot spot (SURVEY.md §3.4): DistanceSelection +
    GA-attention embedding.  Marginal per-call time from a scan pair
    (cancels the tunnel's fixed dispatch overhead).  The default is the
    Molecular_Backmapping notebook scale; the compute-dense variant
    (max_included=50, the reference's DistanceSelection default,
    mappings.py:334) is benched separately — its (50x50) pair grid is
    where MFU becomes meaningful."""
    lpd, coords, info, ref = _embed_setup(jax, jnp, batch, n_part,
                                          max_included, hidden, embed)

    def body(c, _):
        out = lpd(c, ref, info)
        return c + 1e-6 * jnp.mean(out), None

    def timed(S):
        f = jax.jit(lambda a: jax.lax.scan(body, a, None, length=S)[0])
        # True barrier: through the axon tunnel the first
        # block_until_ready after a remote compile can return before
        # the work ran (see tools/hbm_profile.py) — a scalar host read
        # drains the queue, so the timed reps measure real work.
        float(f(coords).ravel()[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(coords))
            best = min(best, time.perf_counter() - t0)
        return best

    hi, lo = scan_lens
    per_call = (timed(hi) - timed(lo)) / (hi - lo)
    flops, bts = _cost_per_call(
        jax, lambda c: body(c, None)[0], coords)
    roof = _roofline(jax, flops, bts, 1.0 / per_call)
    return batch / per_call, roof


def bench_statistics(jax, jnp):
    """On-chip sampler-correctness block (scaled-down
    tools/validate_statistics.py): 10k chains x 1500 steps of cycled
    VAE/MALA/random-walk moves (scales tuned ON DEVICE) against an
    analytic bimodal target.  Thresholds ASSERTED — a failure makes the
    bench record it."""
    from __graft_entry__ import _build_flagship
    from vaemolsim_tpu.mcmc import (MCMCState, cycle_moves, make_mala_step,
                                    make_mcmc_step, make_random_walk_step,
                                    potential_scale_reduction, run_mcmc,
                                    tune_scale, vae_proposal_fns)
    from vaemolsim_tpu.ops import distributions as d

    mix = d.MixtureSameFamily(jnp.zeros(2),
                              d.Normal(jnp.asarray([-2.0, 2.0]),
                                       0.7 * jnp.ones(2)))

    def log_target(x):
        return mix.log_prob(x[..., 0]) - 0.5 * x[..., 1] ** 2

    vae = _build_flagship(jax.random.PRNGKey(0))
    enc, pri, dec = vae_proposal_fns(vae)
    vae_step = make_mcmc_step(enc, pri, dec, log_target)
    cfgs = jax.random.normal(jax.random.PRNGKey(1), (STATS_CHAINS, 2))
    st = MCMCState.create(cfgs, log_target(cfgs), jax.random.PRNGKey(2))
    s_rw, st = tune_scale(log_target, st, kind="random_walk")
    s_mala, st = tune_scale(log_target, st, kind="mala", init_scale=0.05)
    step = cycle_moves([vae_step, make_mala_step(log_target, s_mala),
                        make_random_walk_step(log_target, s_rw)])
    st, traj = jax.jit(lambda s: run_mcmc(step, s, STATS_STEPS,
                                          collect_every=50))(st)
    jax.block_until_ready(st.configs)
    x0 = st.configs[:, 0].astype(jnp.float32)
    mode_balance = float(jnp.mean(x0 > 0))
    m2 = float(jnp.mean(x0 ** 2))
    want_m2 = float(jnp.mean(
        mix.sample(jax.random.PRNGKey(3), (200_000,)) ** 2))
    # traj is (T_collected, chains, dofs); potential_scale_reduction
    # expects (T, n_chains) — no transpose (a swapped orientation makes
    # the R-hat assertion vacuous: verified that 10k stuck chains read
    # as 0.9999 through .T but 199.8 in the correct orientation).
    rhat = float(potential_scale_reduction(
        traj[..., 0].astype(jnp.float32)))
    acc = float(st.acceptance_rate)

    assert abs(mode_balance - 0.5) < 0.05, f"mode balance {mode_balance}"
    assert abs(m2 - want_m2) / want_m2 < 0.05, (m2, want_m2)
    assert rhat < 1.05, f"R-hat {rhat}"
    assert 0.05 < acc < 0.95, f"acceptance {acc}"
    return {"mode_balance": round(mode_balance, 4),
            "second_moment": round(m2, 4),
            "want_second_moment": round(want_m2, 4),
            "rhat": round(rhat, 5),
            "acceptance": round(acc, 4),
            "tuned_rw_scale": round(s_rw, 4),
            "tuned_mala_eps": round(s_mala, 4),
            "chains": STATS_CHAINS, "steps": STATS_STEPS,
            "thresholds_asserted": True}


def bench_molecular_hmc(jax, jnp, n_chains=8192, n_atoms=7, n_steps=200,
                        n_leapfrog=10):
    """Molecular-sampling throughput: tuned HMC on an LJ cluster (the
    round-3 potentials + HMC capability on chip).  Rate counts GRADIENT
    evaluations of the full N^2 potential — the unit molecular MC cost
    scales in — i.e. chains * steps * (n_leapfrog + 1) / s."""
    from vaemolsim_tpu.mcmc import MCMCState, make_hmc_step, run_mcmc, \
        tune_scale
    from vaemolsim_tpu.potentials import (as_log_prob, com_restraint,
                                          composite, lennard_jones,
                                          minimize_energy)

    pot = composite(lennard_jones(sigma=1.0, epsilon=1.0),
                    com_restraint(2.0))
    lp = as_log_prob(pot, beta=2.0)
    x0 = 0.7 * jax.random.normal(jax.random.PRNGKey(0),
                                 (n_chains, n_atoms, 3))
    x0 = minimize_energy(pot, x0, steps=1000, lr=0.1)
    st = MCMCState.create(x0, lp(x0), jax.random.PRNGKey(1))
    eps, st = tune_scale(lp, st, kind="hmc", init_scale=0.05, rounds=15,
                         n_leapfrog=n_leapfrog)
    step = make_hmc_step(lp, step_size=eps, n_leapfrog=n_leapfrog)
    run = jax.jit(lambda s: run_mcmc(step, s, n_steps)[0])

    def rep():
        out = run(st)
        jax.block_until_ready(out.configs)
        return out

    best, median, times = _time_reps(rep)
    out = rep()
    acc = float(out.acceptance_rate)
    assert 0.3 < acc <= 1.0, f"HMC acceptance {acc}"
    grads = n_chains * n_steps * (n_leapfrog + 1)
    return {"rate": grads / best, "median_rate": grads / median,
            "times": times, "acceptance": acc, "tuned_eps": round(eps, 4)}


def bench_cell_list_md(jax, jnp, n_atoms=8192, n_steps=200, rho=0.8,
                       cutoff=2.5, skin=0.4, capacity=48,
                       rebuild_every=5, backend="pallas"):
    """Large-system MD throughput through the O(N) cell-list LJ path
    (the dense N^2 form's (N, N, 3) tensor is ~0.8 GB at this N): BAOAB
    Langevin on a bulk LJ liquid at reduced density ``rho``, with the
    skin/Verlet neighbor list rebuilt every ``rebuild_every`` steps and
    forces from the fused Pallas cell-pair kernel (the measured-fastest
    configuration; docs/performance.md has the study: pallas 7.6M vs
    xla 1.6M atom-steps/s at these settings).  Rate is atom-steps/sec.
    A NaN here means a cell overflowed capacity or an atom outran the
    skin (the loud-failure contract) — asserted against."""
    import numpy as np

    from vaemolsim_tpu.md import baoab_neighbor, kinetic_energy
    from vaemolsim_tpu.potentials import lennard_jones_cell_neighbor

    L = float((n_atoms / rho) ** (1.0 / 3.0))
    # CPU-fallback runs (wedged tunnel) must not error out of the whole
    # workload: Mosaic kernels are TPU-only, and interpret mode at this
    # N is pathologically slow — use the XLA backend off-TPU (the
    # recorded `platform` field already marks the run as a fallback).
    if jax.default_backend() != "tpu":
        backend = "xla"
    build, energy = lennard_jones_cell_neighbor(
        box=[L] * 3, cutoff=cutoff, skin=skin, capacity=capacity,
        backend=backend)
    # Simple-cubic seed lattice, then a short Langevin equilibration.
    m = int(np.ceil(n_atoms ** (1.0 / 3.0)))
    g = np.stack(np.meshgrid(*[np.arange(m)] * 3, indexing="ij"),
                 -1).reshape(-1, 3)[:n_atoms] * (L / m)
    x0 = jnp.asarray(g, jnp.float32)
    v0 = jax.random.normal(jax.random.PRNGKey(0), x0.shape)

    run = jax.jit(lambda x, v, k: baoab_neighbor(
        build, energy, x, v, k, dt=0.004, friction=1.0, kT=1.0,
        n_steps=n_steps, rebuild_every=rebuild_every)[0])
    st = run(x0, v0, jax.random.PRNGKey(1))          # equilibrate+compile
    jax.block_until_ready(st.x)

    def rep():
        out = run(st.x, st.v, jax.random.PRNGKey(2))
        jax.block_until_ready(out.x)
        return out

    best, median, times = _time_reps(rep)
    out = rep()
    e = float(energy(build(out.x), out.x))
    ke = float(kinetic_energy(out.v))
    assert np.isfinite(e), ("cell overflow, skin outrun, or blow-up "
                            "(NaN energy)")
    assert np.isfinite(ke) and ke > 0.0
    steps = n_atoms * n_steps
    res = {"rate": steps / best, "median_rate": steps / median,
           "times": times, "n_atoms": n_atoms, "box": round(L, 3),
           "backend": backend, "rebuild_every": rebuild_every,
           "capacity": capacity,
           "final_u_per_atom": round(e / n_atoms, 4),
           "final_kt": round(2.0 * ke / (3.0 * n_atoms), 4)}
    # HBM footprint per atom at this scale (allocator peak — the number
    # that sets the single-chip atom ceiling; VERDICT r3 item 6).
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use")
        if peak:
            res["hbm_peak_mb"] = round(peak / 2**20, 1)
            res["hbm_bytes_per_atom"] = round(peak / n_atoms, 1)
    except Exception:
        pass
    return res


def bench_molecular_stack_md(jax, jnp, n_atoms=8192, n_steps=200,
                             rho=0.6, cutoff=3.5, skin=0.4,
                             capacity=72, rebuild_every=5,
                             backend="pallas"):
    """Production MOLECULAR MD throughput — the full O(N) stack every
    MD engine runs for solvated molecular systems: harmonic bonds +
    bonded 1-2 exclusions masked inside the cell-list LJ + Ewald
    real-space sum (fused Pallas kernel incl. the in-kernel exclusion
    id-compares) + PME reciprocal space (B-spline spreading + rfftn),
    BAOAB Langevin with the Verlet-skin neighbor list.  The system is
    a charged-dimer fluid (n_atoms/2 molecules, +-0.5 charges, net
    neutral).  Rate is atom-steps/sec; NaN (drift-guard/overflow) and
    equipartition asserted.

    The Ewald split is TUNED (round-5 sweep, tools/
    profile_molecular_stack.py): r_cutoff 3.5 / alpha 0.867 / grid
    64^3 moves work from the memory-bound PME grid pipeline into the
    Pallas real-space kernel — measured 3.0x the untuned r_c 2.5 /
    90^3 split at identical tolerance (1.48M vs 0.49M atom-steps/s),
    with grad(reciprocal) dropping 15.5 -> 4.3 ms/eval and running at
    0.91x the plane HBM peak (at the memory roofline).  Larger cutoffs
    measure faster still but need per-cell capacities beyond the
    kernel's 16 MB scoped-VMEM budget.  Study: docs/performance.md."""
    import numpy as np

    from vaemolsim_tpu.md import baoab_neighbor, kinetic_energy
    from vaemolsim_tpu.potentials import (exclusions_from_bonds,
                                          harmonic_bonds,
                                          lennard_jones_cell_neighbor,
                                          pme_coulomb)

    L = float((n_atoms / rho) ** (1.0 / 3.0))
    if jax.default_backend() != "tpu":
        backend = "xla"                   # Mosaic kernels are TPU-only
    # Atoms on a lattice with an EVEN z extent, z varying fastest:
    # consecutive rows are z-adjacent and pair (2k, 2k+1) never
    # straddles a column wrap, so every bond starts at one lattice
    # spacing (~1.2 sigma at rho 0.6) — overlap-free, no ejections.
    mz = 2 * max(int(np.ceil(n_atoms ** (1.0 / 3.0) / 2.0)), 1)
    mxy = int(np.ceil(np.sqrt(n_atoms / mz)))
    g = np.stack(np.meshgrid(np.arange(mxy), np.arange(mxy),
                             np.arange(mz), indexing="ij"),
                 -1).reshape(-1, 3)[:n_atoms].astype(np.float64)
    g *= L / np.array([mxy, mxy, mz])
    bonds = [[2 * k, 2 * k + 1] for k in range(n_atoms // 2)]
    charges = np.tile([0.5, -0.5], n_atoms // 2)
    excl = np.asarray(bonds)
    recip = pme_coulomb(charges, box=[L] * 3, r_cutoff=cutoff,
                        tolerance=1e-4, exclude=excl,
                        include_real_space=False)
    build, cell_e = lennard_jones_cell_neighbor(
        box=[L] * 3, cutoff=cutoff, skin=skin, capacity=capacity,
        charges=charges, coulomb_alpha=recip.ewald_alpha,
        exclude=excl, backend=backend)
    bonded = harmonic_bonds(bonds, k=200.0, r0=1.0)

    def energy(nl, x):
        return cell_e(nl, x) + recip(x) + bonded(x)

    x0 = jnp.asarray(g, jnp.float32)
    v0 = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
    run = jax.jit(lambda x, v, k: baoab_neighbor(
        build, energy, x, v, k, dt=0.002, friction=1.0, kT=1.0,
        n_steps=n_steps, rebuild_every=rebuild_every)[0])
    # Compile, then thermalize: the lattice start stores ~2 kT/atom of
    # bond strain (bonds begin at one lattice spacing ~1.2 sigma) that
    # dumps into KE; the friction-1.0 thermostat removes it at rate
    # 2*gamma, so gamma*t >= 3 before any measured state.
    st = run(x0, v0, jax.random.PRNGKey(1))
    n_equil = max(1, int(np.ceil(3.0 / (1.0 * 0.002 * n_steps))))
    for i in range(n_equil):
        st = run(st.x, st.v, jax.random.PRNGKey(100 + i))
    jax.block_until_ready(st.x)

    def rep():
        out = run(st.x, st.v, jax.random.PRNGKey(2))
        jax.block_until_ready(out.x)
        return out

    best, median, times = _time_reps(rep)
    out = rep()
    e = float(energy(build(out.x), out.x))
    ke = float(kinetic_energy(out.v))
    kt_f = 2.0 * ke / (3.0 * n_atoms)
    assert np.isfinite(e), ("drift guard, overflow, or blow-up on the "
                            "molecular stack (NaN energy)")
    assert 0.8 < kt_f < 1.2, kt_f
    steps = n_atoms * n_steps
    # XLA cost analysis counts a while-loop BODY once (not x trip
    # count), so the per-call numbers already approximate ONE MD step
    # (cross-checked against component traces: grad(PME recip) alone
    # measures 1.4e9 flops / 3.2e9 boundary bytes per eval).
    flops, bts = _cost_per_call(
        jax, lambda a, b: run(a, b, jax.random.PRNGKey(2)), st.x, st.v)
    roof = _roofline(jax, flops, bts, steps / best / n_atoms)
    return {"rate": steps / best, "median_rate": steps / median,
            "times": times, "n_atoms": n_atoms, "box": round(L, 3),
            "backend": backend, "roofline": roof,
            "pme_grid": list(recip.grid_shape),
            "ewald_alpha": round(recip.ewald_alpha, 4),
            "r_cutoff": cutoff,
            "final_u_per_atom": round(e / n_atoms, 4),
            "final_kt": round(kt_f, 4)}


def bench_ml_potential_md(jax, jnp, n_replicas=256, n_atoms=32,
                          n_steps=100, features=64, num_blocks=3,
                          n_rbf=32, rho=0.6, cutoff=2.5):
    """ML-force-field MD throughput: BAOAB Langevin with forces from a
    SchNetPotential (continuous-filter message passing over the dense
    masked pair grid — the MXU-dense molecular workload: every step is
    num_blocks filter matmuls + one backward pass through them).  Rate
    is replica-atom-steps/sec; the model is untrained (weights don't
    change the FLOP count), energies asserted finite."""
    import numpy as np

    from vaemolsim_tpu.md import baoab, kinetic_energy
    from vaemolsim_tpu.nn import SchNetPotential

    L = float((n_atoms / rho) ** (1.0 / 3.0))
    model = SchNetPotential.create(jax.random.PRNGKey(0), 1,
                                   features=features,
                                   num_blocks=num_blocks, n_rbf=n_rbf,
                                   cutoff=cutoff)
    species = jnp.ones((n_atoms, 1))
    pot = model.as_potential(species, box=jnp.full((3,), L))

    m = int(np.ceil(n_atoms ** (1.0 / 3.0)))
    g = np.stack(np.meshgrid(*[np.arange(m)] * 3, indexing="ij"),
                 -1).reshape(-1, 3)[:n_atoms] * (L / m)
    x0 = (jnp.asarray(g, jnp.float32)[None]
          + 0.05 * jax.random.normal(jax.random.PRNGKey(1),
                                     (n_replicas, n_atoms, 3)))
    v0 = jax.random.normal(jax.random.PRNGKey(2), x0.shape)

    run = jax.jit(lambda x, v, k: baoab(
        pot, x, v, k, dt=0.002, friction=1.0, kT=1.0,
        n_steps=n_steps)[0])
    st = run(x0, v0, jax.random.PRNGKey(3))       # compile + equilibrate
    jax.block_until_ready(st.x)

    def rep():
        out = run(st.x, st.v, jax.random.PRNGKey(4))
        jax.block_until_ready(out.x)
        return out

    best, median, times = _time_reps(rep)
    out = rep()
    e = pot(out.x)
    ke = float(jnp.mean(kinetic_energy(out.v)))
    assert bool(jnp.all(jnp.isfinite(e))) and np.isfinite(ke)
    steps = n_replicas * n_atoms * n_steps
    return {"rate": steps / best, "median_rate": steps / median,
            "times": times, "n_replicas": n_replicas,
            "n_atoms": n_atoms, "features": features,
            "num_blocks": num_blocks}


def bench_gcmc(jax, jnp, n_chains=8192, n_max=64, n_sweeps=100,
               box_l=5.0, kt=2.0, z=0.1):
    """Grand-canonical MC throughput (mcmc/gcmc.py): muVT LJ sweeps —
    one single-particle displacement + one insert/delete exchange per
    chain per sweep, each costing one masked (n_max,) pair-energy row.
    Rate is MC moves/sec across all chains.  Correctness guards: counts
    stay inside [0, n_max), both acceptance channels live, energies
    finite."""
    import numpy as np

    from vaemolsim_tpu.mcmc import (gcmc_init, lj_pair_u, make_gcmc_step,
                                    run_gcmc)
    from vaemolsim_tpu.mcmc.gcmc import total_energy

    mu = kt * float(np.log(z))
    pair = lj_pair_u(cutoff=2.5)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x0 = box_l * jax.random.uniform(k1, (n_chains, n_max, 3))
    n0 = int(z * box_l ** 3)
    act0 = jnp.broadcast_to(jnp.arange(n_max)[None, :] < n0,
                            (n_chains, n_max))
    st0 = gcmc_init(x0, act0, k2)
    step = make_gcmc_step(pair, box=box_l, mu=mu, beta=1.0 / kt,
                          dx_scale=0.35, n_disp=1)
    run = jax.jit(lambda s: run_gcmc(step, s, n_sweeps)[0])
    st = run(st0)                                    # compile + burn-in
    jax.block_until_ready(st.x)

    holder = {"st": st}

    def rep():
        out = run(holder["st"])
        jax.block_until_ready(out.x)
        holder["st"] = out
        return out

    best, median, times = _time_reps(rep)
    st = holder["st"]
    n = np.asarray(st.n)
    assert 0 <= n.min() and n.max() < n_max, "capacity bound must not bind"
    exch = float(st.exchange_acceptance_rate)
    disp = float(st.disp_acceptance_rate)
    assert 0.0 < exch < 1.0 and 0.0 < disp <= 1.0
    e = total_energy(st, pair, box_l)
    assert bool(jnp.isfinite(e).all())
    moves = 2 * n_chains * n_sweeps
    return {"rate": moves / best, "median_rate": moves / median,
            "times": times, "n_chains": n_chains, "n_max": n_max,
            "mean_n": round(float(n.mean()), 2),
            "exchange_acceptance": round(exch, 4),
            "disp_acceptance": round(disp, 4)}


def bench_measured_hbm(jax, jnp):
    """Measured achievable HBM bandwidth (chained streaming saxpy,
    tools/hbm_profile.py) — the realistic denominator for roofline
    claims (the datasheet peak is not reachable by real programs;
    measured ~600 GB/s end-to-end / 658 GB/s device-time on v5e vs the
    819 GB/s plane constant).  VERDICT r3 item 3."""
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools"))
    from hbm_profile import measure_stream_bandwidth
    sizes = (1024,) if jax.default_backend() == "tpu" else (64,)
    best, per_size = measure_stream_bandwidth(jax, jnp, sizes_mb=sizes,
                                              reps=3, chain=32)
    _, peak_bw, kind = _chip_peaks(jax)
    out = {"streaming_gbps": round(best, 1),
           "per_size_mb": {str(k): v for k, v in per_size.items()},
           "device_kind": kind}
    if peak_bw:
        out["fraction_of_datasheet_peak"] = round(best * 1e9 / peak_bw, 3)
    # Elementwise VPU ceiling (round-5 embed study): the denominator
    # for VPU-roofline claims, recorded beside the HBM ceiling.
    from hbm_profile import measure_vpu_throughput
    mb = 32 if jax.default_backend() == "tpu" else 4
    vpu = measure_vpu_throughput(jax, jnp, n_mb=mb)
    out["vpu_ceiling_tops"] = (None if vpu is None else round(vpu, 3))
    return out


def bench_pallas_backends(jax, jnp):
    """Compile-and-golden-check the TPU-only Pallas paths so Mosaic/jax
    upgrades can't rot them silently (they are kept as measured-slower
    optional backends; tests cover interpret mode on CPU, THIS covers
    the real compiled kernels on the chip each round)."""
    import numpy as np

    out = {}
    on_tpu = jax.default_backend() == "tpu"
    out["platform"] = jax.default_backend()
    if not on_tpu:
        out["skipped"] = "pallas kernels are TPU-only; CPU fallback run"
        return out, True

    # The golden checks are float32 kernel-vs-XLA comparisons; the
    # bench's global bf16 compute mode must not leak in (it made the
    # f32 fused kernel "disagree" with bf16 XLA nets by ~3e-2 in r3's
    # first run — a harness artifact, not kernel rot).
    from vaemolsim_tpu.nn.core import compute_dtype, set_compute_dtype
    saved_dtype = compute_dtype()
    set_compute_dtype(None)
    try:
        return _pallas_checks(jax, jnp, out)
    finally:
        set_compute_dtype(saved_dtype)


def _rot_gate(jnp, abs_err) -> bool:
    """Backend-rot gate for compiled-kernel-vs-XLA log-density
    comparisons: all finite, median within Mosaic-vs-XLA transcendental
    noise (measured ~4e-4 on v5e — the compiled VPU tanh/exp/log
    approximations differ from XLA's; CPU interpret-mode tests pin the
    *algorithms* to 1e-5), and no sample wildly off.  Catches NaNs,
    garbage and systematic drift without failing on ill-conditioned
    near-knot samples (log-det condition numbers up to ~4e3 are
    documented in tests/test_rqs_oracle.py)."""
    return bool(jnp.all(jnp.isfinite(abs_err))
                and jnp.median(abs_err) < 2e-3
                and jnp.max(abs_err) < 0.5)


def _pallas_checks(jax, jnp, out):
    import numpy as np

    ok = True
    # 1. rqs_pallas vs XLA (deterministic).
    try:
        from vaemolsim_tpu.flows.spline_flows import _bin_positions, _slopes
        from vaemolsim_tpu.ops import rqs
        from vaemolsim_tpu.ops.rqs_pallas import (rqs_forward_pallas,
                                                  rqs_inverse_pallas)
        key = jax.random.PRNGKey(0)
        N, K = 4096, 32
        ks = jax.random.split(key, 4)
        w = _bin_positions(jax.random.normal(ks[0], (N, K)), -5.0, 5.0, K)
        h = _bin_positions(jax.random.normal(ks[1], (N, K)), -5.0, 5.0, K)
        s = _slopes(jax.random.normal(ks[2], (N, K - 1)))
        x = jax.random.normal(ks[3], (N,)) * 3.0
        fy_p, fl_p = jax.jit(rqs_forward_pallas,
                             static_argnums=4)(x, w, h, s, -5.0)
        fy_x, fl_x = rqs._rqs_forward_xla(x, w, h, s, -5.0)
        iy_p, il_p = jax.jit(rqs_inverse_pallas,
                             static_argnums=4)(x, w, h, s, -5.0)
        iy_x, il_x = rqs._rqs_inverse_xla(x, w, h, s, -5.0)
        err = max(float(jnp.max(jnp.abs(fy_p - fy_x))),
                  float(jnp.max(jnp.abs(fl_p - fl_x))),
                  float(jnp.max(jnp.abs(iy_p - iy_x))),
                  float(jnp.max(jnp.abs(il_p - il_x))))
        # Rot threshold, not ULP parity: the repo's own mpmath oracle
        # budgets 5e-4 on log-dets plus a conditioning allowance near
        # floor-width bins (tests/test_rqs_oracle.py) — kernel-vs-XLA
        # f32 differences up to that scale are numerics, not rot.
        out["rqs_pallas_max_err"] = round(err, 8)
        out["rqs_pallas_ok"] = err < 1e-3
        ok &= out["rqs_pallas_ok"]
    except Exception as e:
        out["rqs_pallas_ok"] = False
        out["rqs_pallas_error"] = repr(e)[:300]
        ok = False

    # 2. maf_fused density vs XLA (deterministic log_prob).
    try:
        from vaemolsim_tpu import flows as fl
        from vaemolsim_tpu.flows import RQSSplineMAF
        from vaemolsim_tpu.ops import distributions as d
        flow = RQSSplineMAF.create(
            jax.random.PRNGKey(5), 3, num_blocks=2,
            rqs_params={"num_bins": 8, "hidden_dim": 32,
                        "bin_range": [-4.0, 4.0]})
        base = d.Independent(d.Normal(jnp.zeros(3), jnp.ones(3)), 1)
        y = jax.random.normal(jax.random.PRNGKey(6), (512, 3)) * 1.5
        lp_ref = jax.jit(lambda v: flow(base).log_prob(v))(y)
        fl.set_maf_fused(True)
        try:
            lp_fused = jax.jit(lambda v: flow(base).log_prob(v))(y)
        finally:
            fl.set_maf_fused(False)
        e = jnp.abs(lp_fused - lp_ref)
        out["maf_fused_max_err"] = round(float(jnp.max(e)), 8)
        out["maf_fused_median_err"] = round(float(jnp.median(e)), 8)
        out["maf_fused_ok"] = _rot_gate(jnp, e)
        ok &= out["maf_fused_ok"]
    except Exception as e:
        out["maf_fused_ok"] = False
        out["maf_fused_error"] = repr(e)[:300]
        ok = False

    # 3. Whole-proposal fused kernel: compiled run, densities recomputed
    # through the XLA distributions for the kernel's own samples.
    try:
        from vaemolsim_tpu.mcmc import fused as mf
        from __graft_entry__ import _build_flagship
        vae = _build_flagship(jax.random.PRNGKey(0))
        x1 = jax.random.normal(jax.random.PRNGKey(7), (1024, 2))
        enc_w, enc_act, _, d_z = mf._extract_mlp(vae.encoder, "encoder")
        dec_w, dec_act, _, d_x = mf._extract_mlp(vae.decoder, "decoder")
        tables_fn, base_params = mf._extract_prior(vae.prior)
        (sw, sh, ss), range_min = tables_fn()
        spec = mf._Spec(d_x=d_x, d_z=d_z, enc_act=enc_act,
                        dec_act=dec_act, num_bins=sw.shape[-1],
                        range_min=float(range_min))
        x2, fwd, rev, z1, z2 = mf.fused_vae_proposal(
            x1, jnp.asarray([11, 12], jnp.int32), enc_w, dec_w,
            (sw, sh, ss), base_params, spec)
        prior_dist = vae._prior_dist(z1, train=False)
        want_fwd = (vae.encoder(x1).log_prob(z1)
                    + prior_dist.log_prob(z2)
                    + vae.decoder(z2).log_prob(x2))
        want_rev = (vae.encoder(x2).log_prob(z2)
                    + prior_dist.log_prob(z1)
                    + vae.decoder(z1).log_prob(x1))
        e = jnp.concatenate([jnp.abs(fwd - want_fwd),
                             jnp.abs(rev - want_rev)])
        out["mcmc_fused_max_err"] = round(float(jnp.max(e)), 6)
        out["mcmc_fused_median_err"] = round(float(jnp.median(e)), 8)
        out["mcmc_fused_ok"] = bool(_rot_gate(jnp, e)
                                    and np.isfinite(np.asarray(x2)).all())
        ok &= out["mcmc_fused_ok"]
    except Exception as e:
        out["mcmc_fused_ok"] = False
        out["mcmc_fused_error"] = repr(e)[:300]
        ok = False

    # 4. cell-pair LJ kernel vs the XLA cell path (compiled).
    try:
        from vaemolsim_tpu.potentials import (exclusions_from_bonds,
                                              lennard_jones_cell_neighbor)
        import numpy as _np
        L = 12.0
        # Bonded exclusions AND charges/erfc included so the in-kernel
        # id-compare masking and the Ewald real-space branch (with its
        # in-kernel erfc approximation — a Mosaic upgrade once dropped
        # the erf lowering and only this golden would catch it) are
        # golden-checked compiled each round.
        excl = exclusions_from_bonds(
            512, [[2 * k, 2 * k + 1] for k in range(256)])
        qs = _np.tile([0.5, -0.5], 256)
        build, e_x = lennard_jones_cell_neighbor(
            box=[L] * 3, cutoff=2.5, skin=0.4, capacity=32, exclude=excl,
            charges=qs, coulomb_alpha=1.0)
        _, e_p = lennard_jones_cell_neighbor(
            box=[L] * 3, cutoff=2.5, skin=0.4, capacity=32,
            backend="pallas", exclude=excl, charges=qs, coulomb_alpha=1.0)
        x = jax.random.uniform(jax.random.PRNGKey(7), (512, 3)) * L
        nl = build(x)
        ex_v, gx = jax.jit(jax.value_and_grad(e_x, argnums=1))(nl, x)
        ep_v, gp = jax.jit(jax.value_and_grad(e_p, argnums=1))(nl, x)
        e_err = float(jnp.abs(ep_v - ex_v) / jnp.maximum(jnp.abs(ex_v), 1.0))
        g_err = float(jnp.max(jnp.abs(gp - gx)
                              / (1.0 + jnp.abs(gx))))
        out["cell_lj_energy_relerr"] = round(e_err, 9)
        out["cell_lj_grad_maxrelerr"] = round(g_err, 7)
        out["cell_lj_ok"] = bool(e_err < 1e-5 and g_err < 1e-3
                                 and np.isfinite(float(ep_v)))
        ok &= out["cell_lj_ok"]
    except Exception as e:
        out["cell_lj_ok"] = False
        out["cell_lj_error"] = repr(e)[:300]
        ok = False

    # 5. fused pair-grid attention kernel vs the XLA attention path
    # (optional measured-slower backend; still rot-guarded compiled).
    try:
        from vaemolsim_tpu.nn.attention import (VectorAttention,
                                                _va_fused_impl)
        attn = VectorAttention.create(jax.random.PRNGKey(11), 8, 6,
                                      hidden_dim=16)
        ac = jax.random.normal(jax.random.PRNGKey(12), (16, 10, 3))
        av = jax.random.normal(jax.random.PRNGKey(13), (16, 10, 8))
        am = jax.random.uniform(jax.random.PRNGKey(14), (16, 10)) > 0.2
        want = jax.jit(lambda c, v: attn._xla_call(c, v, am))(ac, av)
        got = jax.jit(lambda c, v: _va_fused_impl(
            attn, c, v, am.astype(jnp.float32)))(ac, av)
        e = jnp.abs(got - want)
        out["attn_fused_max_err"] = round(float(jnp.max(e)), 8)
        out["attn_fused_ok"] = _rot_gate(jnp, e)
        ok &= out["attn_fused_ok"]
    except Exception as e:
        out["attn_fused_ok"] = False
        out["attn_fused_error"] = repr(e)[:300]
        ok = False
    return out, ok


def _compact_summary(result):
    """One SHORT summary line with the driver-contract keys.

    The driver records only the last ~2,000 chars of stdout and parses
    the final JSON line out of that tail.  The full record has grown to
    ~9 KB, so printing it last clips its own front out of the window
    (BENCH_r03/r04 both recorded ``parsed=null`` this way).  The last
    printed line is therefore ALWAYS this compact summary — hard-capped
    well under the window — and the full record lives in the line
    before it plus the ``bench_latest.json`` mirror."""
    s = {k: result.get(k) for k in
         ("metric", "value", "unit", "vs_baseline", "platform")}
    for k in ("pallas_backends_ok", "sampler_stats_ok",
              "device_busy_us_per_step", "elapsed_s"):
        if k in result:
            s[k] = result[k]
    extras = result.get("extra_metrics") or []
    s["stages_recorded"] = 1 + len(extras)
    s["full_record"] = "bench_latest.json"
    line = json.dumps(s)
    # Hard interface contract: the whole line (plus newline slack) must
    # fit in the driver's tail window no matter what future fields grow.
    assert len(line) < 1500, f"summary line too long: {len(line)}"
    return line


def _emit(result):
    """Print the current record + a compact summary line + flush, and
    mirror the record to bench_latest.json — called after the primary
    and after EVERY later stage so the last stdout line is always a
    short parseable summary, wherever a later stage dies."""
    result["elapsed_s"] = round(time.monotonic() - _T0, 1)
    line = json.dumps(result)
    print(line, flush=True)
    print(_compact_summary(result), flush=True)
    try:
        # Mirror to an UNTRACKED path so a driver bench run never
        # dirties the worktree (VERDICT r4 item 8); per-round snapshots
        # are committed deliberately by copying this file.
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_latest.json"), "w") as f:
            f.write(line + "\n")
    except OSError:
        pass


def main():
    if os.environ.get("BENCH_SMOKE"):
        _shrink_for_cpu()
    if os.environ.get("BENCH_FORCE_CPU") or not _probe_tpu_alive():
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
    # tests/test_mcmc.py::TestEngineStatistics::test_independence_sampler_rbg_prng
    # and re-verified on the chip by the statistics block below.
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from vaemolsim_tpu.nn.core import set_compute_dtype

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        _shrink_for_cpu()
    # small=True shrinks the per-stage workload kwargs too (CPU
    # fallback, and BENCH_SMOKE local testing of this harness).
    small = (not on_tpu) or bool(os.environ.get("BENCH_SMOKE"))

    # Proposal networks in bfloat16 (native MXU dtype): MH stays exact —
    # forward and reverse densities use the same bf16-net-defined
    # proposal — and acceptance arithmetic stays float32.  Equilibrium
    # preservation under this mode is covered by
    # tests/test_mcmc.py::TestFullPipelineStatistics.
    set_compute_dtype(jnp.bfloat16)

    result = {
        "metric": "vae_mc_proposals_per_sec_per_chip",
        "value": 0.0,
        "unit": f"proposals/sec/chip ({N_CHAINS_HEADLINE} chains)",
        "vs_baseline": 0.0,
        "timing_steps": N_TIMING_STEPS,
        # Make a tunnel-wedge CPU fallback unmistakable in the record:
        # TPU numbers are ~100M props/s, CPU ~0.7M.
        "platform": jax.default_backend(),
    }
    extras = []
    result["extra_metrics"] = extras
    wedged = {"flag": False}

    def guarded(fn, budget_s):
        """Stage runner: watchdog + global deadline + wedge latch.
        Returns (value, skip_or_error_note)."""
        if wedged["flag"]:
            return None, "skipped: device wedged earlier in this run"
        budget = min(budget_s, _remaining() - 20.0)
        if budget < 10.0:
            return None, "skipped: global bench deadline reached"
        val, err, timed_out = _run_stage(fn, budget)
        if timed_out:
            # A timeout means "wedged tunnel" only if a fresh-subprocess
            # probe also fails; a merely-slow stage (CPU fallback, or an
            # oversized scale workload) must not latch the skip flag.
            if not on_tpu or not _probe_tpu_alive(timeout_s=30,
                                                  attempts=1):
                if on_tpu:
                    wedged["flag"] = True
            return None, err
        return val, err

    # --- PRIMARY: headline MC (emit immediately; VERDICT r3 item 1) ---
    head, note = guarded(lambda: bench_mc(jax, jnp, N_CHAINS_HEADLINE,
                                          measure_device_busy=True),
                         360)
    if head is not None:
        result.update({
            "value": round(head["rate"], 1),
            "vs_baseline": round(head["rate"] / 1.0e6, 4),
            "median": round(head["median_rate"], 1),
            "roofline": head["roofline"],
        })
        if head.get("device_busy_us_per_step"):
            # Chip time vs wall-clock: the implied pure-chip rate and
            # the tunnel/dispatch overhead factor, tracked separately
            # so chip regressions don't hide behind tunnel weather.
            busy = head["device_busy_us_per_step"]
            wall_us = 1e6 * N_CHAINS_HEADLINE / head["rate"]
            result["device_busy_us_per_step"] = busy
            result["chip_rate_proposals_per_sec"] = round(
                N_CHAINS_HEADLINE / (busy * 1e-6), 1)
            result["dispatch_overhead_factor"] = round(
                wall_us / busy, 3)
    else:
        result["error"] = note
    _emit(result)

    def add(metric, fields_or_note):
        entry = {"metric": metric}
        if isinstance(fields_or_note, dict):
            entry.update(fields_or_note)
        else:
            entry["error"] = fields_or_note
        extras.append(entry)
        _emit(result)

    # --- reference-scale MC (round-over-round comparability) ---
    ref, note = guarded(
        lambda: bench_mc(jax, jnp, N_CHAINS_REF, include_workload=True),
        180)
    if ref is not None:
        add("mc_proposals_per_sec_10k_chains", {
            "value": round(ref["rate"], 1),
            "unit": f"proposals/sec/chip ({N_CHAINS_REF} chains — "
                    "reference MC-notebook scale)",
            "median": round(ref["median_rate"], 1)})
        add("mc_reference_workload_wallclock", {
            "value": round(ref["workload_s"], 4),
            "unit": f"seconds ({N_CHAINS_REF} chains x {N_STEPS} steps, "
                    "one dispatch incl. ~27ms tunnel overhead)"})
    else:
        add("mc_proposals_per_sec_10k_chains", note)

    # --- measured achievable HBM bandwidth (roofline denominator) ---
    hb, note = guarded(lambda: bench_measured_hbm(jax, jnp), 120)
    add("measured_hbm_streaming", hb if hb is not None else note)

    # --- the r3-built evidence blocks, early so they can't be starved:
    # pallas backend health + on-chip sampler statistics ---
    p, note = guarded(lambda: bench_pallas_backends(jax, jnp), 240)
    if p is not None:
        pstat, pok = p
        result["pallas_backends_ok"] = pok
        add("pallas_backends", pstat)
    else:
        result["pallas_backends_ok"] = False
        add("pallas_backends", note)

    s, note = guarded(lambda: bench_statistics(jax, jnp), 240)
    result["sampler_stats_ok"] = s is not None
    add("sampler_statistics_on_chip", s if s is not None else note)

    # --- training + embedding workloads ---
    e, note = guarded(lambda: bench_elbo_train(jax, jnp), 180)
    if e is not None:
        best_sps, median_sps, _, eroof = e
        add("vae_elbo_train_steps_per_sec", {
            "value": round(best_sps, 2),
            "unit": f"steps/sec (batch {ELBO_BATCH})",
            "median": round(median_sps, 2),
            "mfu": eroof.get("mfu"), "bound": eroof.get("bound")})
    else:
        add("vae_elbo_train_steps_per_sec", note)

    dt, note = guarded(lambda: bench_flow_train(jax, jnp), 120)
    # samples/epochs recorded: the CPU-fallback shrink changes the
    # workload, and a bare number under the 100k/10-epoch name would
    # silently compare different workloads round-over-round.
    add("flow_train_100k_10epoch_wallclock",
        {"value": round(dt, 3), "unit": "seconds",
         "samples": FLOW_SAMPLES, "epochs": FLOW_EPOCHS}
        if dt is not None else note)

    b, note = guarded(lambda: bench_backmapping_embed(jax, jnp), 150)
    if b is not None:
        fps, roof = b
        add("backmapping_embed_frames_per_sec", {
            "value": round(fps, 1),
            "unit": "frames/sec (batch 200, max_included 10, embed 20)",
            "bound": roof.get("bound")})
    else:
        add("backmapping_embed_frames_per_sec", note)

    dense_kw = (dict(batch=200, n_part=120, max_included=50, hidden=64,
                     embed=20, scan_lens=(60, 10)) if not small else
                dict(batch=32, n_part=120, max_included=50, hidden=64,
                     embed=20, scan_lens=(12, 4)))
    b, note = guarded(lambda: bench_backmapping_embed(
        jax, jnp, **dense_kw), 150)
    if b is not None:
        fps, roof = b
        add("backmapping_embed_dense_frames_per_sec", {
            "value": round(fps, 1),
            "unit": "frames/sec (batch 200, max_included 50 — the "
                    "compute-dense MFU workload)",
            "roofline": roof,
            # The roofline's boundary-bytes "memory" label is
            # upper-bound semantics only: the round-5 dtype experiment
            # (grid bytes halved, time unchanged) proves this workload
            # is VPU-elementwise-bound — compare its ~2 Tops/s of
            # element-ops against measured_hbm_streaming's
            # vpu_ceiling_tops.  Study: docs/performance.md.
            "measured_bound": "vpu-elementwise"})
    else:
        add("backmapping_embed_dense_frames_per_sec", note)

    # --- molecular workloads ---
    hmc_kw = {} if not small else {"n_chains": 512, "n_steps": 50}
    mol, note = guarded(lambda: bench_molecular_hmc(jax, jnp, **hmc_kw),
                        150)
    add("molecular_hmc_potential_grads_per_sec", {
        "value": round(mol["rate"], 1),
        "unit": "full-N^2 LJ7 potential gradients/sec (tuned HMC, "
                "10 leapfrog)",
        "median": round(mol["median_rate"], 1),
        "acceptance": mol["acceptance"], "tuned_eps": mol["tuned_eps"]}
        if mol is not None else note)

    def md_entry(md):
        return {"value": round(md["rate"], 1),
                "unit": f"atom-steps/sec (BAOAB, {md['n_atoms']} atoms, "
                        "rho 0.8, cutoff 2.5, skin list + cell-pair "
                        "kernel)",
                "median": round(md["median_rate"], 1),
                "backend": md["backend"], "capacity": md["capacity"],
                "final_u_per_atom": md["final_u_per_atom"],
                "final_kt": md["final_kt"],
                **{k: md[k] for k in ("hbm_peak_mb", "hbm_bytes_per_atom")
                   if k in md}}

    # Small config has only 4^3 cells (32 atoms/cell mean) — needs the
    # deeper capacity.
    md_kw = ({} if not small else
             {"n_atoms": 2048, "n_steps": 50, "capacity": 80})
    md, note = guarded(lambda: bench_cell_list_md(jax, jnp, **md_kw), 220)
    add("cell_list_md_atom_steps_per_sec",
        md_entry(md) if md is not None else note)

    # Scale-ceiling workloads (VERDICT r3 item 6): the O(N) design's
    # claim checked at 65k and 262k atoms on chip, with HBM-per-atom.
    if on_tpu and not small:
        for n_at, budget in ((65_536, 240), (262_144, 300)):
            md, note = guarded(lambda n=n_at: bench_cell_list_md(
                jax, jnp, n_atoms=n, n_steps=100), budget)
            add(f"cell_list_md_{n_at}_atom_steps_per_sec",
                md_entry(md) if md is not None else note)

    ms_kw = {} if not small else {"n_atoms": 1024, "n_steps": 50}
    ms, note = guarded(lambda: bench_molecular_stack_md(jax, jnp,
                                                        **ms_kw), 280)
    add("molecular_stack_md_atom_steps_per_sec", {
        "value": round(ms["rate"], 1),
        "unit": f"atom-steps/sec (BAOAB, {ms['n_atoms']} atoms as "
                "charged dimers: bonds + exclusions + cell-list LJ/erfc "
                "+ PME reciprocal — full production molecular stack, "
                "tuned Ewald split)",
        "median": round(ms["median_rate"], 1), "backend": ms["backend"],
        "roofline": ms["roofline"], "pme_grid": ms["pme_grid"],
        "ewald_alpha": ms["ewald_alpha"], "r_cutoff": ms["r_cutoff"],
        "final_u_per_atom": ms["final_u_per_atom"],
        "final_kt": ms["final_kt"]} if ms is not None else note)

    ml_kw = {} if not small else {"n_replicas": 16, "n_steps": 20}
    ml, note = guarded(lambda: bench_ml_potential_md(jax, jnp, **ml_kw),
                       200)
    add("schnet_md_replica_atom_steps_per_sec", {
        "value": round(ml["rate"], 1),
        "unit": f"replica-atom-steps/sec (BAOAB on SchNet: "
                f"{ml['n_replicas']} replicas x {ml['n_atoms']} atoms, "
                f"{ml['features']}f x {ml['num_blocks']} blocks, "
                "fwd+bwd per step)",
        "median": round(ml["median_rate"], 1)} if ml is not None else note)

    gc_kw = {} if not small else {"n_chains": 512, "n_sweeps": 20}
    gc, note = guarded(lambda: bench_gcmc(jax, jnp, **gc_kw), 150)
    add("gcmc_moves_per_sec", {
        "value": round(gc["rate"], 1),
        "unit": f"muVT MC moves/sec (LJ, {gc['n_chains']} chains, "
                f"capacity {gc['n_max']}, masked O(n_max) moves)",
        "median": round(gc["median_rate"], 1), "mean_n": gc["mean_n"],
        "exchange_acceptance": gc["exchange_acceptance"],
        "disp_acceptance": gc["disp_acceptance"]}
        if gc is not None else note)

    _emit(result)
    if wedged["flag"]:
        # An abandoned thread stuck in a wedged-tunnel C++ call can
        # block normal interpreter teardown; the record is out, leave.
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)


if __name__ == "__main__":
    main()
