"""Analytic ICI communication budgets for the mesh-sharded paths, plus
a measured weak-scaling table on the virtual CPU mesh (VERDICT r4
item 6 — the honest stand-in for multi-chip perf in an environment
with one real chip).

The analytic budgets are derived from the collectives the code
actually issues (file:line cited per path); the virtual-mesh timings
validate that the sharded programs compile and execute at every mesh
size with flat per-device load — they are NOT hardware comm
measurements (a single host has no ICI), and are labeled as such.

Usage:
    python tools/comm_budget.py            # budgets + weak scaling
    python tools/comm_budget.py budgets    # analytic tables only
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_FLAG = "--xla_force_host_platform_device_count=8"
if _FLAG not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " " + _FLAG).strip()

import numpy as np  # noqa: E402


def pme_budget(grid, P):
    """Per-device bytes over ICI for ONE sharded-PME energy+force eval
    (potentials.py::pme_coulomb mesh path, _recip_kernel + autodiff).

    Forward:
      - psum_scatter of the full (gx, gy, gz) f32 local grid: a ring
        reduce-scatter moves (P-1)/P of the operand per device;
      - all_to_all of the x-slab spectrum (gx/P, gy, gz/2+1) complex64:
        (P-1)/P of the slab leaves each device;
      - psum of the scalar energy: negligible.
    Backward (autodiff transposes, potentials.py:1806-1808 comments):
      - psum_scatter -> all_gather of the grid cotangent: same volume;
      - all_to_all transposes to itself: same volume;
    The row-sharded erfc pair term adds only a scalar psum; positions
    replicate OUTSIDE the per-step loop in MD (they are per-step
    operands of the jitted program, sharded by GSPMD as needed —
    budget counts the explicit collectives).
    """
    gx, gy, gz = grid
    grid_b = gx * gy * gz * 4
    slab_b = (gx // P) * gy * (gz // 2 + 1) * 8
    rs = (P - 1) / P * grid_b
    a2a = (P - 1) / P * slab_b
    return {
        "reduce_scatter_fwd_B": rs,
        "all_to_all_fwd_B": a2a,
        "all_gather_bwd_B": rs,
        "all_to_all_bwd_B": a2a,
        "total_B_per_eval": 2 * (rs + a2a),
    }


def cell_md_budget(n_atoms, P):
    """Per-device bytes for ONE mesh-sharded cell-list force eval
    (potentials.py cell path, shard_map over cells): positions
    replicate to every device ((P-1)/P x 12N on a ring broadcast),
    per-cell partial forces all-reduce back (2 x (P-1)/P x 12N ring)."""
    xb = n_atoms * 12
    return {
        "broadcast_positions_B": (P - 1) / P * xb,
        "all_reduce_forces_B": 2 * (P - 1) / P * xb,
        "total_B_per_eval": 3 * (P - 1) / P * xb,
    }


def remd_budget(n_atoms, with_velocities=True):
    """Per-device bytes for ONE REMD swap attempt with replicas
    sharded 1/device (parallel/remd.py): neighbor energies/betas move
    as scalars; an accepted swap moves the neighbor's full state
    (x and rescaled v) — XLA lowers the rolled selects to
    collective-permutes, one neighbor hop each way."""
    state_b = n_atoms * 12 * (2 if with_velocities else 1)
    return {
        "scalar_exchange_B": 16,
        "state_permute_B": state_b,
        "total_B_per_attempt": state_b + 16,
    }


def mc_budget():
    """Chain-sharded MC scan (parallel/sharding.py): the chain axis is
    embarrassingly parallel — ZERO per-step collectives; acceptance
    counters / moments reduce once per run segment (a scalar psum)."""
    return {"per_step_B": 0, "per_segment_scalar_psum_B": 4}


def fmt(d):
    return {k: (f"{v / 2**20:.2f} MiB" if v > 4096 else f"{v:.0f} B")
            for k, v in d.items()}


def budgets():
    print("== analytic per-device ICI budgets ==")
    print("sharded PME, bench scale (8192 atoms, 64^3 grid, P=8):")
    for k, v in fmt(pme_budget((64, 64, 64), 8)).items():
        print(f"   {k:24s} {v}")
    print("sharded cell-list MD (262144 atoms, P=8):")
    for k, v in fmt(cell_md_budget(262_144, 8)).items():
        print(f"   {k:24s} {v}")
    print("REMD swap attempt (8192 atoms/replica, 1 replica/device):")
    for k, v in fmt(remd_budget(8192)).items():
        print(f"   {k:24s} {v}")
    print("chain-sharded MC: 0 B per step (scalar psum per segment)")


def weak_scaling():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from vaemolsim_tpu.potentials import pme_coulomb

    print("\n== virtual-mesh weak scaling (sharded PME energy+force, "
          "1024 atoms/device, CPU mesh — semantic validation, not an "
          "ICI measurement) ==")
    print(f"{'P':>3} {'atoms':>7} {'grid':>14} {'ms/eval':>9} "
          f"{'per-dev ICI/eval':>17}")
    devs = jax.devices()
    assert len(devs) >= 8, (
        f"virtual mesh has {len(devs)} devices (XLA_FLAGS not applied "
        "before jax import?) - the P>1 rows would silently run on one")
    for P in (1, 2, 4, 8):
        n = 1024 * P
        L = float((n / 0.6) ** (1 / 3.0))
        mesh = Mesh(np.array(devs[:P]), ("atoms",))
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.uniform(0, L, (n, 3)), jnp.float32)
        q = np.tile([0.5, -0.5], n // 2)
        u = pme_coulomb(q, box=[L] * 3, r_cutoff=2.5, tolerance=1e-4,
                        include_real_space=False, mesh=mesh,
                        mesh_axis="atoms")
        g = jax.jit(jax.value_and_grad(u))
        out = g(x)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(g(x))
            best = min(best, time.perf_counter() - t0)
        tot = (0.0 if P == 1
               else pme_budget(u.grid_shape, P)["total_B_per_eval"])
        print(f"{P:>3} {n:>7} {str(u.grid_shape):>14} "
              f"{1e3 * best:>9.1f} {tot / 2**20:>13.2f} MiB")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    budgets()
    if mode != "budgets":
        weak_scaling()


if __name__ == "__main__":
    main()
