"""Profile the GA-attention pair grid (config-3 backmapping workload).

VERDICT round-1 item 3: the (max_included^2, hidden 40) pair grid in
nn/attention.py is the framework's only compute-dense op; this script
times it on TPU at the reference workload shapes
(Molecular_Backmapping: batch 100-200 frames, cutoff 3.0,
max_included 10-50, embedding 20) and prints marginal per-iteration
times (a lax.scan over iterations subtracts the environment's ~27 ms
per-dispatch tunnel floor, measured in tools/ notes / STATUS.md).

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_attention.py
"""

import json
import time

import jax
import jax.numpy as jnp

from vaemolsim_tpu.nn import (DistanceSelection, LocalParticleDescriptors,
                              ParticleEmbedding)
from vaemolsim_tpu.nn.core import set_compute_dtype


def marginal_time(fn, arg, s_small=10, s_big=100):
    """Per-iteration seconds from the slope between two scan lengths
    (cancels the fixed per-dispatch tunnel overhead)."""

    def scanned(S):
        f = jax.jit(lambda a: jax.lax.scan(
            lambda c, _: (fn(c), None), a, None, length=S)[0])
        out = f(arg)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(arg))
            best = min(best, time.perf_counter() - t0)
        return best

    t_small, t_big = scanned(s_small), scanned(s_big)
    return (t_big - t_small) / (s_big - s_small)


def bench_embed(batch, n_particles, max_included, embed_dim=20,
                hidden=40, info_dim=2, bf16=False):
    set_compute_dtype(jnp.bfloat16 if bf16 else None)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    lpd = LocalParticleDescriptors(
        select=DistanceSelection.create(cutoff=3.0,
                                        max_included=max_included),
        embed=ParticleEmbedding.create(keys[0], info_dim=info_dim,
                                       embedding_dim=embed_dim,
                                       hidden_dim=hidden))
    coords = jax.random.normal(keys[1], (batch, n_particles, 3)) * 1.5
    info = jax.random.normal(keys[2], (batch, n_particles, info_dim))
    ref = jax.random.normal(keys[3], (batch, 3)) * 0.3

    def fn(c):
        out = lpd(c, ref, info)
        # Feed the embedding back into the coords so the scan carries a
        # data dependency (prevents loop-invariant hoisting).
        return c + 1e-6 * jnp.mean(out)

    dt = marginal_time(fn, coords)
    return {"batch": batch, "n_particles": n_particles,
            "max_included": max_included, "bf16": bf16,
            "us_per_call": round(dt * 1e6, 1),
            "frames_per_sec": round(batch / dt, 1)}


def main():
    rows = []
    for batch, n_part, max_inc in [(100, 30, 10), (200, 30, 10),
                                   (200, 100, 50)]:
        for bf16 in (False, True):
            rows.append(bench_embed(batch, n_part, max_inc, bf16=bf16))
            print(json.dumps(rows[-1]), flush=True)
    # Large-scale variant: does the pair grid ever dominate?
    rows.append(bench_embed(2000, 100, 50, bf16=True))
    print(json.dumps(rows[-1]), flush=True)


if __name__ == "__main__":
    main()
