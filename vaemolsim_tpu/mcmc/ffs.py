"""Forward flux sampling (direct FFS): rare-event rates from
interface-to-interface shooting.

Beyond-reference capability, completing the rare-event triad next to
transition path sampling (:mod:`vaemolsim_tpu.mcmc.tps`) and weighted
ensembles (:mod:`vaemolsim_tpu.we`): the Allen-Frenkel-ten Wolde
method (J. Chem. Phys. 124, 024102, 2006) factorizes the A -> B rate
as

    ``k_AB = Phi_0 * prod_i P(lambda_{i+1} | lambda_i)``

where ``Phi_0`` is the flux of effective positive crossings of the
first interface ``lambda_0`` out of basin A, and each
``P(lambda_{i+1} | lambda_i)`` is the probability that a trajectory
launched from a stored ``lambda_i``-crossing phase point reaches the
next interface before falling back into A.  Unlike TPS it yields the
RATE directly; unlike WE it needs no binning of the full order
parameter — only a ladder of interfaces — and it works for driven /
non-equilibrium dynamics because it never uses reweighting.

TPU-first design: every trial of a stage is one walker in a batched
absorbing BAOAB scan (status frozen on absorption, static shapes — the
classic "loop until first hit" becomes a masked fixed-length scan);
the flux stage stores crossing phase points into fixed slots with a
cyclic scatter (keeps the LAST ``n_store`` crossings — the most
equilibrated ones); stage seeds are resampled with replacement by one
categorical draw.  The interface ladder is a host loop over compiled
stages (its length is static and tiny), so zero-success stages
short-circuit loudly instead of propagating NaNs.

Validated against Rice's formula for the exact Gaussian up-crossing
flux of a harmonic well, a brute-force double-well rate, and
interface-placement invariance (``tests/test_ffs.py``).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from vaemolsim_tpu import md
from vaemolsim_tpu.md import _force_fn, _masses_arr

Array = jax.Array

__all__ = ["FluxResult", "StageResult", "FFSResult", "basin_flux",
           "ffs_stage", "run_ffs"]


class FluxResult(NamedTuple):
    """Effective positive flux through ``lambda_0`` and stored
    crossing phase points (``stored`` marks slots actually filled)."""
    flux: Array            # crossings per unit time, ALL replicas pooled
    n_crossings: Array     # int32 total counted crossings
    x: Array               # (n_store, n_atoms, dim) crossing positions
    v: Array               # (n_store, n_atoms, dim) crossing velocities
    stored: Array          # (n_store,) bool — slot holds a real crossing


class StageResult(NamedTuple):
    """One interface-to-interface shooting stage."""
    p: Array               # P(next | here); unresolved trials count as
    #                        failures (conservative — see n_unresolved)
    n_success: Array       # int32
    n_unresolved: Array    # int32 trials absorbed by neither boundary
    x: Array               # (n_trials, n, d) final positions
    v: Array
    success: Array         # (n_trials,) bool


class FFSResult(NamedTuple):
    rate: Array            # k_AB per unit time per replica
    flux: Array            # Phi_0
    p_stages: Array        # (n_stages,) conditional probabilities
    n_success: Array       # (n_stages,) int32
    n_unresolved: Array    # (n_stages,) int32


def _baoab_step_kernel(potential, masses, dt, kT, friction, x0):
    """Shared one-step BAOAB kernel (B half-kick, A, O, A, B) for the
    flux and shooting stages: returns ``step(x, v, f, key) ->
    (xn, vn, fn)`` plus the initial force, so both scans use literally
    the same integrator and a future change cannot desynchronize them."""
    force = _force_fn(potential)
    m = _masses_arr(masses, x0)
    dtj = jnp.asarray(dt, x0.dtype)
    c1 = jnp.exp(-friction * dtj)
    c2 = jnp.sqrt(kT * (1.0 - c1 * c1) / m)

    def step(x, v, f, k):
        vh = v + 0.5 * dtj * f / m
        xn = x + 0.5 * dtj * vh
        vh = c1 * vh + c2 * jax.random.normal(k, v.shape, v.dtype)
        xn = xn + 0.5 * dtj * vh
        _, fn = force(xn)
        vn = vh + 0.5 * dtj * fn / m
        return xn, vn, fn

    _, f0 = force(x0)
    return step, f0


def basin_flux(potential: Callable[[Array], Array],
               lambda_fn: Callable[[Array], Array],
               x0: Array, v0: Array, key: Array, *,
               lambda0: float, dt: float, n_steps: int, kT: float,
               friction: float = 1.0, masses=1.0, n_store: int = 256,
               lambda_a: Optional[float] = None,
               unroll: int = 4) -> FluxResult:
    """Measure the effective positive flux through ``lambda_0`` from
    basin-A dynamics, storing crossing phase points as stage-0 seeds.

    ``x0, v0``: ``(R, n_atoms, dim)`` replicas equilibrated in A.  A
    crossing is counted when ``lambda`` steps from below ``lambda0`` to
    at-or-above it while ARMED; the replica then disarms until it
    revisits ``lambda < lambda_a`` (default ``lambda0``) — the
    standard effective-crossing rule that stops barrier recrossings
    from inflating ``Phi_0``.  Crossing phase points overwrite
    ``n_store`` slots cyclically, so the slots hold the latest
    crossings.  ``flux`` pools all replicas:
    ``n_crossings / (R * n_steps * dt)``.
    """
    x0, v0 = jnp.asarray(x0), jnp.asarray(v0)
    lam_a = lambda0 if lambda_a is None else lambda_a
    step, f0 = _baoab_step_kernel(potential, masses, dt, kT, friction,
                                  x0)
    r = x0.shape[0]

    def body(carry, k):
        x, v, f, armed, count, sx, sv, nst = carry
        lam_prev = lambda_fn(x)
        xn, vn, fn = step(x, v, f, k)
        lam = lambda_fn(xn)
        crossed = armed & (lam_prev < lambda0) & (lam >= lambda0)
        armed = jnp.where(crossed, False,
                          armed | (lam < lam_a))
        # Cyclic scatter of this step's crossings into the slot ring:
        # replica j's slot is (count + rank_among_crossers) mod n_store;
        # non-crossers get index n_store (dropped).
        rank = jnp.cumsum(crossed.astype(jnp.int32)) - 1
        idx = jnp.where(crossed, (count + rank) % n_store, n_store)
        sx = sx.at[idx].set(xn, mode="drop")
        sv = sv.at[idx].set(vn, mode="drop")
        nst = nst.at[idx].set(True, mode="drop")
        count = count + jnp.sum(crossed.astype(jnp.int32))
        return (xn, vn, fn, armed, count, sx, sv, nst), None

    armed0 = lambda_fn(x0) < lam_a
    slots_x = jnp.zeros((n_store,) + x0.shape[1:], x0.dtype)
    slots_v = jnp.zeros_like(slots_x)
    init = (x0, v0, f0, armed0, jnp.int32(0), slots_x, slots_v,
            jnp.zeros((n_store,), bool))
    keys = jax.random.split(key, n_steps)
    (_, _, _, _, count, sx, sv, nst), _ = jax.lax.scan(
        body, init, keys, unroll=min(unroll, max(n_steps, 1)))
    flux = count / (r * n_steps * dt)
    return FluxResult(flux=flux, n_crossings=count, x=sx, v=sv,
                      stored=nst)


def _absorbing_baoab(potential, lambda_fn, x0, v0, key, *, lam_up,
                     lam_down, dt, max_steps, kT, friction, masses,
                     unroll):
    """Batched BAOAB where each walker freezes at its first boundary
    hit.  Returns final ``(x, v, status)`` with status 0 = running,
    1 = reached ``lam_up``, 2 = fell to/below ``lam_down``."""
    step, f0 = _baoab_step_kernel(potential, masses, dt, kT, friction,
                                  x0)

    def body(carry, k):
        x, v, f, status = carry
        xn, vn, fn = step(x, v, f, k)
        lam = lambda_fn(xn)
        hit = jnp.where(lam >= lam_up, 1,
                        jnp.where(lam <= lam_down, 2, 0)).astype(
                            jnp.int8)
        new_status = jnp.where(status == 0, hit, status)
        frozen = (status != 0)[..., None, None]
        xn = jnp.where(frozen, x, xn)
        vn = jnp.where(frozen, v, vn)
        fn = jnp.where(frozen, f, fn)
        return (xn, vn, fn, new_status), None

    # Seeds sit exactly at the launch interface (>= lam_down by
    # construction); start them as running.
    status0 = jnp.zeros(x0.shape[0], jnp.int8)
    keys = jax.random.split(key, max_steps)
    (x, v, _, status), _ = jax.lax.scan(
        body, (x0, v0, f0, status0), keys,
        unroll=min(unroll, max(max_steps, 1)))
    return x, v, status


def ffs_stage(potential: Callable[[Array], Array],
              lambda_fn: Callable[[Array], Array],
              x_seed: Array, v_seed: Array, seed_mask: Array,
              key: Array, *, lambda_next: float, lambda_fail: float,
              dt: float, max_steps: int, kT: float,
              friction: float = 1.0, masses=1.0, n_trials: int = 256,
              unroll: int = 4) -> StageResult:
    """Fire ``n_trials`` trajectories from seeds stored at the current
    interface (resampled with replacement from the ``seed_mask`` slots
    by ONE categorical draw) until each reaches ``lambda_next``
    (success) or falls back to ``lambda_fail`` (failure).

    ``p`` counts unresolved trials (neither boundary inside
    ``max_steps``) as failures — conservative; check ``n_unresolved``
    and raise ``max_steps`` if it is a visible fraction.  Stored
    velocities are kept (the standard DFFS continuation — fresh
    Langevin noise decorrelates the trials).

    An all-False ``seed_mask`` (the previous stage stored nothing)
    has no valid seeds to resample: the stage returns ``p = NaN`` with
    ``success`` all-False rather than silently shooting from
    zero-filled slot 0 (``categorical`` over all ``-inf`` logits
    returns index 0).  :func:`run_ffs` never reaches this case — it
    short-circuits a dead ladder to an exact rate of 0.
    """
    kc, kr = jax.random.split(key)
    seed_mask = jnp.asarray(seed_mask)
    has_seed = jnp.any(seed_mask)
    logits = jnp.where(seed_mask, 0.0, -jnp.inf)
    pick = jax.random.categorical(kc, logits, shape=(n_trials,))
    x0 = jnp.asarray(x_seed)[pick]
    v0 = jnp.asarray(v_seed)[pick]
    x, v, status = _absorbing_baoab(
        potential, lambda_fn, x0, v0, kr, lam_up=lambda_next,
        lam_down=lambda_fail, dt=dt, max_steps=max_steps, kT=kT,
        friction=friction, masses=masses, unroll=unroll)
    success = (status == 1) & has_seed
    n_success = jnp.sum(success.astype(jnp.int32))
    n_unresolved = jnp.sum((status == 0).astype(jnp.int32))
    p = jnp.where(has_seed, n_success / n_trials, jnp.nan)
    return StageResult(p=p, n_success=n_success,
                       n_unresolved=n_unresolved, x=x, v=v,
                       success=success)


def run_ffs(potential: Callable[[Array], Array],
            lambda_fn: Callable[[Array], Array],
            x0: Array, v0: Array, key: Array, *,
            interfaces: Sequence[float], dt: float, kT: float,
            flux_steps: int, max_steps: int, friction: float = 1.0,
            masses=1.0, n_trials: int = 256, n_store: int = 256,
            lambda_a: Optional[float] = None,
            unroll: int = 4) -> FFSResult:
    """Direct FFS: flux stage + the full interface ladder.

    ``interfaces``: increasing ``[lambda_0, ..., lambda_n]`` with
    ``lambda_n`` the B boundary; ``x0, v0`` replicas equilibrated in
    basin A (``lambda < lambda_0``).  Trials that fall back below
    ``lambda_a`` (default ``lambda_0``) fail.  The ladder is a host
    loop over jitted stages: if a stage records zero successes the
    remaining stages are skipped and the rate is exactly 0 (with
    ``p_stages`` recording where the ladder died).
    """
    interfaces = [float(s) for s in interfaces]
    if sorted(interfaces) != interfaces or len(interfaces) < 2:
        raise ValueError("interfaces must be an increasing ladder of "
                         f"at least 2 values, got {interfaces}")
    lam_a = interfaces[0] if lambda_a is None else float(lambda_a)
    kf, key = jax.random.split(jnp.asarray(key))
    fr = jax.jit(lambda x, v, k: basin_flux(
        potential, lambda_fn, x, v, k, lambda0=interfaces[0], dt=dt,
        n_steps=flux_steps, kT=kT, friction=friction, masses=masses,
        n_store=n_store, lambda_a=lam_a, unroll=unroll))(x0, v0, kf)

    stage = jax.jit(lambda xs, vs, mask, k, nxt: ffs_stage(
        potential, lambda_fn, xs, vs, mask, k, lambda_next=nxt,
        lambda_fail=lam_a, dt=dt, max_steps=max_steps, kT=kT,
        friction=friction, masses=masses, n_trials=n_trials,
        unroll=unroll), static_argnames=())

    xs, vs, mask = fr.x, fr.v, fr.stored
    ps, succs, unres = [], [], []
    alive = bool(jnp.any(mask))
    for nxt in interfaces[1:]:
        if not alive:
            ps.append(0.0)
            succs.append(0)
            unres.append(0)
            continue
        key, ks = jax.random.split(key)
        res = stage(xs, vs, mask, ks, jnp.asarray(nxt))
        ps.append(float(res.p))
        succs.append(int(res.n_success))
        unres.append(int(res.n_unresolved))
        xs, vs, mask = res.x, res.v, res.success
        alive = int(res.n_success) > 0
    p_stages = jnp.asarray(ps)
    rate = fr.flux * jnp.prod(p_stages)
    return FFSResult(rate=rate, flux=fr.flux, p_stages=p_stages,
                     n_success=jnp.asarray(succs, jnp.int32),
                     n_unresolved=jnp.asarray(unres, jnp.int32))
