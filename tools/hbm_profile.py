"""Measured HBM roofline: profiler counters + streaming-bandwidth peak.

VERDICT r3 item 3: the bench's `memory_boundary_fraction` uses XLA
cost-analysis *boundary* bytes — an upper bound on HBM traffic that can
exceed 1.0 and therefore proves nothing about real distance from the
HBM roofline.  This tool provides the measured complement:

1. ``measure_stream_bandwidth``: the chip's *achievable* HBM bandwidth
   through a pure streaming kernel (y = a*x + b over a large array,
   2 bytes moved per element-byte) — the denominator a roofline claim
   should use (datasheet peaks are not reachable by real programs).
2. ``trace_workload``: runs a jitted function under ``jax.profiler``
   and parses the xplane.pb trace directly (vendored public schema,
   ``tools/xplane_proto`` — no tensorflow/tensorboard needed), summing
   per-op device time and whatever memory-traffic stats the backend
   records (``bytes_accessed`` per memory space on TPU device planes).
   ``dump_stat_names`` lists every stat the trace carries so claims can
   be tied to actual counter names.

Usage (on the TPU):
    python tools/hbm_profile.py stream          # measured peak GB/s
    python tools/hbm_profile.py mc              # MC step trace summary
    python tools/hbm_profile.py embed           # dense embed trace
"""

import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "xplane_proto"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure_stream_bandwidth(jax, jnp, sizes_mb=(256, 1024), reps=3,
                             chain=64):
    """Best measured GB/s over a CHAINED streaming saxpy.

    One jitted ``lax.scan`` of ``chain`` dependent saxpy steps on a
    large array: each step reads and writes the full array (2 bytes of
    HBM traffic per element-byte — far beyond any cache), and the
    carried dependency forces sequential execution, so per-call
    dispatch/tunnel overhead (which makes single-call timings at this
    granularity meaningless — measured "76 TB/s") amortizes away."""
    best = 0.0
    per_size = {}
    for mb in sizes_mb:
        n = mb * 2**20 // 4
        x = jnp.ones((n,), jnp.float32)

        @jax.jit
        def f(a):
            return jax.lax.scan(
                lambda c, _: (c * 1.000001 + 1e-7, None),
                a, None, length=chain)[0]

        # Warmup + FULL drain: through the axon tunnel, the first
        # block_until_ready after a remote compile can return before
        # the work actually ran (measured: it "finished" in 0.3 ms and
        # the next host read then waited 62 s).  A scalar host read is
        # a true barrier; steady-state block_until_ready is honest.
        float(f(x)[0])
        t_best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(x))
            t_best = min(t_best, time.perf_counter() - t0)
        gbps = 2.0 * n * 4 * chain / t_best / 1e9
        per_size[mb] = round(gbps, 1)
        best = max(best, gbps)
    return best, per_size


def measure_vpu_throughput(jax, jnp, n_mb=32, chains=(128, 512),
                           reps=3):
    """Measured elementwise Tera-ops/s of an UNROLLED dependent chain
    ``y = max(y * a + b, 0)`` (counted as 3 VPU ops per element per
    link) inside one XLA fusion — the elementwise analog of
    measure_stream_bandwidth, the denominator for 'this workload is at
    the VPU roofline' claims.  The rate is MARGINAL between two chain
    lengths, which cancels both the fixed dispatch/tunnel overhead
    (~27 ms through axon — comparable to the whole compute at these
    sizes) and the one HBM read+write of the array.  A lax.scan would
    not work here: each iteration round-trips the carry through HBM."""
    n = n_mb * 2**20 // 4
    x = jnp.ones((n,), jnp.float32)
    a = jnp.float32(1.000001)
    b = jnp.float32(1e-7)
    ilp = 8   # independent chains: a single dependent chain measures
    #           op LATENCY per lane, not issue throughput

    def timed(chain):
        @jax.jit
        def f(y):
            ys = [y + jnp.float32(k) * b for k in range(ilp)]
            for _ in range(chain // ilp):   # unrolled -> one fusion
                ys = [jnp.maximum(yk * a + b, 0.0) for yk in ys]
            out = ys[0]
            for yk in ys[1:]:
                out = out + yk
            return out

        float(f(x)[0])                  # true barrier (see above)
        t_best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(x))
            t_best = min(t_best, time.perf_counter() - t0)
        return t_best

    c1, c2 = chains
    t1, t2 = timed(c1), timed(c2)
    links = (c2 // ilp - c1 // ilp) * ilp
    if t2 - t1 < max(0.05 * t2, 1e-4):
        return None  # timing noise swamped the marginal - no number
    return 3.0 * n * links / (t2 - t1) / 1e12


def _load_xspaces(logdir):
    from xplane_pb2 import XSpace
    spaces = []
    for p in glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                       recursive=True):
        xs = XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        spaces.append(xs)
    return spaces


def _stat_value(stat):
    which = stat.WhichOneof("value")
    return getattr(stat, which) if which else None


def summarize_xspace(xs, device_substr=("TPU", "tpu")):
    """Per-plane totals: device-time and every numeric stat, summed over
    events (keyed by stat-metadata name)."""
    out = {}
    for plane in xs.planes:
        smeta = {m.id: m.name for m in plane.stat_metadata.values()}
        totals = {}
        dur_ps = 0
        n_events = 0
        for line in plane.lines:
            for ev in line.events:
                dur_ps += ev.duration_ps
                n_events += 1
                for st in ev.stats:
                    v = _stat_value(st)
                    if isinstance(v, (int, float)):
                        name = smeta.get(st.metadata_id,
                                         str(st.metadata_id))
                        totals[name] = totals.get(name, 0) + v
        if n_events:
            out[plane.name] = {"events": n_events,
                               "device_time_ms": dur_ps / 1e9,
                               "stats": totals}
    return out


def dump_stat_names(xs):
    names = {}
    for plane in xs.planes:
        names[plane.name] = sorted(
            m.name for m in plane.stat_metadata.values())
    return names


def trace_workload(jax, fn, *args, n_calls=10, verbose=True):
    """Run ``fn(*args)`` n_calls times under the profiler; return the
    parsed per-plane summary (device planes carry per-op events whose
    stats include memory traffic where the backend records it)."""
    jax.block_until_ready(fn(*args))  # compile outside the trace
    with tempfile.TemporaryDirectory() as tmp:
        with jax.profiler.trace(tmp):
            for _ in range(n_calls):
                out = fn(*args)
            jax.block_until_ready(out)
        spaces = _load_xspaces(tmp)
        summary = {}
        stat_names = {}
        for xs in spaces:
            summary.update(summarize_xspace(xs))
            stat_names.update(dump_stat_names(xs))
    if verbose:
        for pname, s in summary.items():
            print(f"plane {pname!r}: {s['events']} events, "
                  f"{s['device_time_ms']:.3f} ms device time")
            for k, v in sorted(s["stats"].items()):
                if any(t in k.lower() for t in
                       ("byte", "flop", "bandwidth", "memory", "hbm",
                        "occupancy", "time")):
                    print(f"    {k}: {v}")
    return summary, stat_names


def op_breakdown(xs, top=12):
    """Top device ops by total device time from the 'XLA Ops' line of
    the TPU plane: (name, total_ms, calls).  Durations are
    hardware-timestamped — the measured half of the roofline."""
    rows = {}
    peaks = {}
    for plane in xs.planes:
        if "/device:TPU" not in plane.name:
            continue
        smeta = {m.id: m.name for m in plane.stat_metadata.values()}
        for st in plane.stats:
            nm = smeta.get(st.metadata_id, "")
            if nm.startswith("peak_"):
                peaks[nm] = _stat_value(st)
        for line in plane.lines:
            if "Ops" not in line.name or "Async" in line.name:
                continue
            for ev in line.events:
                em = plane.event_metadata[ev.metadata_id].name
                key = em.split(" = ")[0].lstrip("%")
                t, c = rows.get(key, (0, 0))
                rows[key] = (t + ev.duration_ps, c + 1)
    ranked = sorted(rows.items(), key=lambda kv: -kv[1][0])
    total_ps = sum(t for t, _ in rows.values())
    return ([(k, t / 1e9, c) for k, (t, c) in ranked[:top]],
            total_ps / 1e9, peaks)


def roofline_report(jax, jnp, fn, *args, n_calls, unit_count,
                    unit_name="step"):
    """Measured device-op roofline for one workload: hardware per-op
    device times + XLA boundary bytes (upper bound on HBM traffic) per
    compiled call, against the plane-reported HBM peak."""
    flops = bts = 0.0
    try:
        c = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        flops = float(c.get("flops", 0.0))
        bts = float(c.get("bytes accessed", 0.0))
    except Exception:
        pass
    f = jax.jit(fn)
    float(jnp.sum(jax.tree_util.tree_leaves(f(*args))[0]))  # true barrier
    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        with jax.profiler.trace(tmp):
            outs = [f(*args) for _ in range(n_calls)]
            jax.block_until_ready(outs)
        spaces = _load_xspaces(tmp)
    for xs in spaces:
        ops, total_ms, peaks = op_breakdown(xs)
        if not ops:
            continue
        per_unit_us = total_ms * 1e3 / (n_calls * unit_count)
        hbm_peak = peaks.get("peak_hbm_bw_gigabytes_per_second", 819.0)
        print(f"device-busy: {total_ms:.3f} ms total, "
              f"{per_unit_us:.3f} us per {unit_name} "
              f"({n_calls} calls x {unit_count} {unit_name}s)")
        if bts:
            gbps = bts / 1e9 / (total_ms / 1e3 / n_calls)
            print(f"XLA boundary bytes/call: {bts:.3e} => {gbps:.0f} "
                  f"GB/s over device-busy time "
                  f"({gbps / hbm_peak:.2f}x plane HBM peak "
                  f"{hbm_peak:.0f} GB/s; >1 means VMEM-served reuse)")
        if flops:
            tf = flops / 1e12 / (total_ms / 1e3 / n_calls)
            pk = peaks.get("peak_teraflops_per_second", 197.0)
            print(f"XLA flops/call: {flops:.3e} => {tf:.2f} TFLOP/s "
                  f"over device-busy time (MFU {tf / pk:.3f} vs plane "
                  f"peak {pk:.0f} TF/s)")
        print("top device ops (measured):")
        for name, ms, cnt in ops:
            print(f"  {ms:9.3f} ms  {cnt:6d}x  "
                  f"{100 * ms / total_ms:5.1f}%  {name[:70]}")
        return {"total_ms": total_ms, "per_unit_us": per_unit_us,
                "boundary_bytes": bts, "flops": flops, "peaks": peaks,
                "ops": ops}
    print("no TPU device plane found in trace")
    return None


def _mc_workload(jax, jnp, n_chains=50_000, n_steps=100):
    from bench import _mc_setup
    step, state, run = _mc_setup(jax, jnp, n_chains)
    return (lambda: run(state, n_steps)), n_steps


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "stream"
    import jax
    import jax.numpy as jnp
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind)

    if which == "stream":
        best, per_size = measure_stream_bandwidth(jax, jnp)
        print(f"measured streaming HBM bandwidth: {best:.1f} GB/s "
              f"(per size MB: {per_size})")
        return

    jax.config.update("jax_default_prng_impl", "rbg")
    from vaemolsim_tpu.nn.core import set_compute_dtype
    set_compute_dtype(jnp.bfloat16)

    if which == "mc":
        from bench import _mc_setup
        n_chains, n_steps = 50_000, 100
        step, state, run = _mc_setup(jax, jnp, n_chains)
        roofline_report(jax, jnp,
                        lambda s: run(s, n_steps), state,
                        n_calls=3, unit_count=n_steps,
                        unit_name="MC step")
    elif which == "embed":
        from bench import _embed_setup
        lpd, coords, info, ref = _embed_setup(jax, jnp, 200, 120, 50,
                                              64, 20)
        roofline_report(jax, jnp, lambda c: lpd(c, ref, info), coords,
                        n_calls=10, unit_count=1, unit_name="batch-200")
    else:
        raise SystemExit(f"unknown workload {which!r}")


if __name__ == "__main__":
    main()
