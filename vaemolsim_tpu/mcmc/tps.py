"""Transition path sampling: Monte Carlo in the space of reactive
trajectories.

Bolhuis, Chandler, Dellago & Geissler (Annu. Rev. Phys. Chem. 2002):
when A -> B transitions are too rare for direct MD but no good reaction
coordinate is known, sample the REACTIVE PATH ENSEMBLE — fixed-length
Langevin trajectories conditioned on starting in A and ending in B —
by Metropolis moves on whole paths.  Unlike metadynamics / umbrella /
steered methods (which bias a chosen CV) or weighted ensemble (which
bins one), TPS needs NO reaction coordinate: it harvests true unbiased
dynamical transition paths, from which mechanisms (which channel? what
does the transition state look like?) are read off directly.

Moves (for the stochastic BAOAB kernel, whose phase-space chain
z = (x, v) is Markov):

- ``mode="one_way"`` (default): pick a frame j, resample the FUTURE
  from the stored ``z_j`` with fresh noise (or, flipping a fair coin
  and the momentum, the PAST via the time-reversed kernel — equal to
  the forward kernel by the generalized detailed balance BAOAB
  satisfies up to its O(dt^2) discretization bias).  The regenerated
  segment is an exact conditional (Gibbs) draw, so acceptance is the
  single endpoint indicator ``h_B`` (forward) / ``h_A`` (backward) —
  the high-acceptance standard for stochastic dynamics.
- ``mode="two_way"``: full Maxwell velocity redraw at j, integrate
  both directions, splice; acceptance ``h_A h_B`` (symmetric
  generation).  Decorrelates whole paths fastest per accepted move but
  accepts far less; useful as a mixing kicker.

Complements :func:`vaemolsim_tpu.paths.climbing_neb` (zero-temperature
geometry; a NEB path interpolated to ``n_frames`` is the canonical TPS
seed) and :func:`vaemolsim_tpu.paths.harmonic_tst_rate` (static rate
estimate).

TPU design: a path is a fixed ``(n_frames, n_atoms, dim)`` array of
positions + velocities and every shooting move integrates EXACTLY
``n_frames - 1`` BAOAB steps regardless of the shooting index or
direction (the splice is one static-shape gather with computed
indices), so W independent walkers batch as one compiled ``lax.scan``.
Validated in ``tests/test_tps.py`` against brute-force harvested
reactive windows of long unbiased MD (the same path measure by
construction) and by channel-switching ergodicity on a two-channel
ring potential.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from vaemolsim_tpu import md

Array = jax.Array

__all__ = ["TPSState", "tps_init", "make_tps_step", "run_tps",
           "reactive_windows", "first_hitting_committor"]


class TPSState(NamedTuple):
    """W walkers, each carrying one reactive path of ``n_frames``
    phase-space frames (positions ``path (W, n_frames, n_atoms, dim)``
    and matching velocities ``vel``) plus exact int32 shooting-move
    counters."""

    path: Array
    vel: Array
    n_acc: Array       # (W,) int32
    n_trials: Array    # (W,) int32

    @property
    def acceptance_rate(self) -> Array:
        return self.n_acc / jnp.maximum(self.n_trials, 1)


def tps_init(path: Array, *, vel: Optional[Array] = None,
             key: Optional[Array] = None, kt: float = 1.0,
             masses=1.0) -> TPSState:
    """Wrap seed paths ``(W, n_frames, n_atoms, dim)`` (each must be
    reactive under the caller's ``in_a``/``in_b``; e.g. a
    :func:`paths.climbing_neb` result interpolated to ``n_frames`` and
    tiled over walkers).  Seed velocities: pass the true ones (``vel``)
    when the seed came from dynamics, else pass ``key`` to draw
    Maxwell-Boltzmann placeholders — those are NOT consistent with the
    positions, so burn in until every frame has been regenerated at
    least once before harvesting."""
    path = jnp.asarray(path)
    if path.ndim != 4:
        raise ValueError(
            "tps_init expects (walkers, n_frames, n_atoms, dim), got "
            f"shape {path.shape}")
    if vel is None:
        if key is None:
            raise ValueError("pass seed velocities or a key to draw "
                             "Maxwell-Boltzmann placeholders")
        m = md._masses_arr(masses, path)   # (n_atoms, 1) vs atom axis
        vel = jnp.sqrt(kt / m) * jax.random.normal(key, path.shape,
                                                   path.dtype)
    w = path.shape[0]
    zeros = jnp.zeros((w,), jnp.int32)
    return TPSState(path=path, vel=jnp.asarray(vel), n_acc=zeros,
                    n_trials=zeros)


def make_tps_step(potential: Callable[[Array], Array], *,
                  in_a: Callable[[Array], Array],
                  in_b: Callable[[Array], Array],
                  dt: float, kt: float, friction: float = 1.0,
                  masses=1.0, mode: str = "one_way"
                  ) -> Callable[[TPSState, Array], TPSState]:
    """One shooting sweep over all walkers (see module docstring for
    the two move modes).

    ``in_a(x) / in_b(x)``: vectorized basin indicators over
    ``(..., n_atoms, dim)`` configurations -> ``(...,)`` bool (define
    them conservatively — cores of the basins — as usual for TPS).
    ``potential``/``dt``/``kt``/``friction``/``masses`` follow the
    :func:`md.baoab` contract and must match the dynamics the
    harvested ensemble is meant to represent.
    """
    if mode not in ("one_way", "two_way"):
        raise ValueError(f"unknown mode {mode!r}")

    def run(x0, v0, key, t):
        _, (tx, tv) = md.baoab(potential, x0, v0, key, dt=dt,
                               n_steps=t, friction=friction, kT=kt,
                               masses=masses, collect_every=1,
                               collect_v=True)
        return jnp.moveaxis(tx, 0, 1), jnp.moveaxis(tv, 0, 1)

    gather = jax.vmap(lambda s, f: s[f])

    def accept(state, new_x, new_v, ok):
        keep = ok.reshape((-1,) + (1,) * (state.path.ndim - 1))
        return TPSState(
            path=jnp.where(keep, new_x, state.path),
            vel=jnp.where(keep, new_v, state.vel),
            n_acc=state.n_acc + ok.astype(jnp.int32),
            n_trials=state.n_trials + jnp.int32(1))

    def step_one_way(state: TPSState, key: Array) -> TPSState:
        path, vel = state.path, state.vel
        w, n_frames = path.shape[0], path.shape[1]
        t = n_frames - 1
        kj, kd, kn = jax.random.split(key, 3)

        j = jax.random.randint(kj, (w,), 1, t)           # 1..t-1
        forward = jax.random.bernoulli(kd, 0.5, (w,))
        take = lambda a: jnp.take_along_axis(
            a, j[:, None, None, None], axis=1)[:, 0]
        xj, vj = take(path), take(vel)
        sign0 = jnp.where(forward, 1.0, -1.0)[:, None, None]
        tx, tv = run(xj, sign0 * vj, kn, t)              # (W, t, n, d)

        # Splice: keep the untouched side, gather the fresh segment
        # (time-reversed with flipped velocities for backward shots).
        i = jnp.arange(n_frames)
        fwd_idx = jnp.where(i[None] <= j[:, None], i[None],
                            n_frames + i[None] - j[:, None] - 1)
        bwd_idx = jnp.where(i[None] >= j[:, None], i[None],
                            n_frames + j[:, None] - i[None] - 1)
        idx = jnp.where(forward[:, None], fwd_idx, bwd_idx)
        new_x = gather(jnp.concatenate([path, tx], axis=1), idx)
        new_v = gather(jnp.concatenate([vel, tv], axis=1), idx)
        flip = (~forward[:, None]) & (i[None] < j[:, None])
        new_v = jnp.where(flip[..., None, None], -new_v, new_v)

        ok = jnp.where(forward, in_b(new_x[:, -1]), in_a(new_x[:, 0]))
        return accept(state, new_x, new_v, ok)

    def step_two_way(state: TPSState, key: Array) -> TPSState:
        path, vel = state.path, state.vel
        w, n_frames = path.shape[0], path.shape[1]
        t = n_frames - 1
        kj, kv, kf, kb = jax.random.split(key, 4)

        j = jax.random.randint(kj, (w,), 1, t)
        xj = jnp.take_along_axis(
            path, j[:, None, None, None], axis=1)[:, 0]
        m = md._masses_arr(masses, xj)     # per-atom masses on atom axis
        v = jnp.sqrt(kt / m) * jax.random.normal(kv, xj.shape, xj.dtype)
        fx, fv = run(xj, v, kf, t)
        bx, bv = run(xj, -v, kb, t)

        sx = jnp.concatenate([bx, xj[:, None], fx], axis=1)
        sv = jnp.concatenate([-bv, v[:, None], fv], axis=1)
        i = jnp.arange(n_frames)
        idx = jnp.where(i[None] < j[:, None],
                        j[:, None] - i[None] - 1,
                        t + i[None] - j[:, None])
        new_x = gather(sx, idx)
        new_v = gather(sv, idx)

        ok = in_a(new_x[:, 0]) & in_b(new_x[:, -1])
        return accept(state, new_x, new_v, ok)

    return step_one_way if mode == "one_way" else step_two_way


def run_tps(step_fn: Callable[[TPSState, Array], TPSState],
            state: TPSState, key: Array, n_steps: int, *,
            collect_every: int = 0
            ) -> Tuple[TPSState, Optional[Array]]:
    """Scan ``n_steps`` shooting sweeps; with ``collect_every`` also
    returns the harvested position ensemble
    ``(n_steps // collect_every, W, n_frames, n_atoms, dim)`` (thin
    enough to decorrelate — successive paths share most frames)."""
    if collect_every and n_steps % collect_every != 0:
        raise ValueError("n_steps must be a multiple of collect_every")
    keys = jax.random.split(key, n_steps)

    if collect_every:
        keys = keys.reshape(n_steps // collect_every, collect_every,
                            *keys.shape[1:])

        def body(s, ks):
            s = jax.lax.scan(lambda st, k: (step_fn(st, k), None),
                             s, ks)[0]
            return s, s.path

        return jax.lax.scan(body, state, keys)

    final = jax.lax.scan(lambda s, k: (step_fn(s, k), None),
                         state, keys)[0]
    return final, None


def reactive_windows(traj: Array, *, n_frames: int,
                     in_a: Callable[[Array], Array],
                     in_b: Callable[[Array], Array],
                     max_windows: int) -> Tuple[Array, Array]:
    """Brute-force reference ensemble: every length-``n_frames`` window
    of a long unbiased trajectory ``(T, n_atoms, dim)`` whose first
    frame is in A and last in B — EXACTLY the fixed-length reactive
    path measure TPS targets, so the two ensembles must agree in
    distribution (the validation used by ``tests/test_tps.py``).

    Returns ``(windows (max_windows, n_frames, n_atoms, dim),
    valid (max_windows,) bool)`` — static shapes: the first
    ``max_windows`` reactive start indices, padded with repeats of the
    first window when fewer exist (masked out by ``valid``).
    """
    traj = jnp.asarray(traj)
    t_total = traj.shape[0]
    n_starts = t_total - n_frames + 1
    if n_starts <= 0:
        raise ValueError("trajectory shorter than one window")
    start_ok = (in_a(traj[:n_starts])
                & in_b(traj[n_frames - 1:]))              # (n_starts,)
    # Indices of the first max_windows hits, stably, without dynamic
    # shapes: argsort on (not ok, index).
    order = jnp.argsort(jnp.where(start_ok, jnp.arange(n_starts),
                                  n_starts + jnp.arange(n_starts)))
    idx = order[:max_windows]
    valid = start_ok[idx]
    safe = jnp.where(valid, idx, idx[0])
    offsets = jnp.arange(n_frames)
    windows = traj[safe[:, None] + offsets[None, :]]
    return windows, valid


def first_hitting_committor(potential: Callable[[Array], Array],
                            x0: Array, *,
                            in_a: Callable[[Array], Array],
                            in_b: Callable[[Array], Array],
                            key: Array, n_shots: int, max_steps: int,
                            dt: float, kt: float, friction: float = 1.0,
                            masses=1.0) -> Tuple[Array, Array]:
    """Monte Carlo committor estimates: from each configuration in
    ``x0 (B, n_atoms, dim)``, fire ``n_shots`` fleeting BAOAB
    trajectories (fresh Maxwell velocities) and record which basin each
    hits first — ``q(x) = P(reach B before A | x)``, THE reaction
    coordinate (Peters & Trout 2006 use exactly these shooting outcomes
    to train committor models; :func:`vaemolsim_tpu.msm.committor` is
    the discrete-state analog).

    Returns ``(q (B,), frac_unresolved (B,))`` where unresolved shots
    (neither basin within ``max_steps``) are excluded from ``q``'s
    denominator — size ``max_steps`` to the basin relaxation time and
    check ``frac_unresolved`` stays small.  In the high-friction limit
    the 1-D result equals the overdamped quadrature
    ``q(x) = int_a^x e^{U/kT} / int_a^b e^{U/kT}`` (pinned by test).

    Memory note: labels come from one collected trajectory block of
    shape ``(max_steps, B * n_shots, ...)`` — sized for reaction-
    coordinate workloads (small systems, many configs), not for large-N
    molecular frames.
    """
    x0 = jnp.asarray(x0)
    b = x0.shape[0]
    kx, kv = jax.random.split(key)
    x_rep = jnp.repeat(x0, n_shots, axis=0)           # (B*S, n, d)
    m = md._masses_arr(masses, x_rep)      # per-atom masses, atom axis
    v0 = jnp.sqrt(kt / m) * jax.random.normal(kv, x_rep.shape, x0.dtype)
    _, traj = md.baoab(potential, x_rep, v0, kx, dt=dt,
                       n_steps=max_steps, friction=friction, kT=kt,
                       masses=masses, collect_every=1)

    a_t = in_a(traj)                                   # (T, B*S)
    b_t = in_b(traj)
    t_idx = jnp.arange(max_steps)
    big = max_steps + 1
    first_a = jnp.min(jnp.where(a_t, t_idx[:, None], big), axis=0)
    first_b = jnp.min(jnp.where(b_t, t_idx[:, None], big), axis=0)
    resolved = (first_a < big) | (first_b < big)
    hit_b = (first_b < first_a) & resolved

    hit_b = hit_b.reshape(b, n_shots)
    resolved = resolved.reshape(b, n_shots)
    n_res = jnp.sum(resolved, axis=1)
    q = jnp.sum(hit_b, axis=1) / jnp.maximum(n_res, 1)
    q = jnp.where(n_res > 0, q, jnp.nan)
    return q, 1.0 - n_res / n_shots
