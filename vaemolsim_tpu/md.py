"""Molecular dynamics: symplectic integrators as compiled scans.

Beyond-reference capability (the reference is MC-only,
/root/reference/vaemolsim/mcmc.py): with the differentiable force
fields of :mod:`vaemolsim_tpu.potentials`, classical MD is a
``lax.scan`` over a force evaluation — thousands of independent
replicas batch over the leading axis onto one chip, and the chain axis
shards over a mesh exactly like MC chains.

Integrators:

- :func:`velocity_verlet` — NVE; one force per step (the closing force
  of step k is reused as the opening force of step k+1).
- :func:`baoab` — Langevin NVT via the BAOAB splitting (Leimkuhler &
  Matthews 2013), the low-configurational-bias discretization of
  ``dv = f/m dt - gamma v dt + sqrt(2 gamma kT / m) dW``; recovers
  velocity Verlet at ``friction=0``.

Conventions: reduced units (kT enters :func:`baoab` directly),
``potential(x) -> (...,)`` over ``x`` of shape ``(..., n_atoms, dim)``
(the :mod:`potentials` contract), per-atom ``masses`` broadcast as
``(n_atoms, 1)`` against the coordinate axis.  Forces are
``-grad potential`` via one vjp per step (per-replica gradients, same
trick as MALA/HMC in mcmc.moves).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from vaemolsim_tpu.mcmc.engine import log_uniform

Array = jax.Array

__all__ = ["MDState", "NPTMDState", "NHCState", "CSVRState",
           "velocity_verlet",
           "baoab", "steered_baoab", "nose_hoover", "csvr",
           "respa_verlet",
           "nose_hoover_invariant",
           "velocity_verlet_neighbor", "baoab_neighbor", "baoab_npt",
           "kinetic_energy", "temperature",
           "BondConstraints", "bond_constraints",
           "velocity_verlet_constrained", "baoab_constrained"]


class MDState(NamedTuple):
    """Positions/velocities plus the cached force that makes
    force-reuse across scan steps explicit and restartable."""
    x: Array
    v: Array
    force: Array


def _force_fn(potential: Callable[[Array], Array]):
    def force(x):
        e, vjp = jax.vjp(potential, x)
        (g,) = vjp(jnp.ones_like(e))
        return e, -g

    return force


def _masses_arr(masses, x):
    m = jnp.asarray(masses, x.dtype)
    if m.ndim == 1:
        m = m[:, None]                     # (n_atoms, 1) vs (..., n, d)
    return m


def kinetic_energy(v: Array, masses=1.0) -> Array:
    """``sum_atoms m |v|^2 / 2`` per replica (reduces the last two
    axes)."""
    m = _masses_arr(masses, v)
    return 0.5 * jnp.sum(m * v * v, axis=(-2, -1))


def temperature(v: Array, masses=1.0) -> Array:
    """Instantaneous kinetic temperature ``2 KE / (n_dof)`` per replica
    (equipartition, all n_atoms * dim momenta counted; subtract
    constrained modes yourself if you remove the COM drift)."""
    n_dof = v.shape[-2] * v.shape[-1]
    return 2.0 * kinetic_energy(v, masses) / n_dof


def velocity_verlet(potential: Callable[[Array], Array],
                    x0: Array, v0: Array, *,
                    dt: float, n_steps: int,
                    masses=1.0,
                    collect_every: int = 0,
                    unroll: int = 4,
                    f0: Optional[Array] = None
                    ) -> Tuple[MDState, Optional[Array]]:
    """NVE velocity-Verlet integration: one force evaluation per step,
    whole trajectory as one ``lax.scan`` dispatch.

    Returns ``(MDState, trajectory)`` where ``trajectory`` stacks every
    ``collect_every``-th position as ``(n_steps//collect_every, ...)``
    (None when 0).  Symplectic: total energy oscillates but does not
    drift (pinned by test at 1e-4 relative over 2000 steps).

    ``f0``: the force at ``x0`` if already known (e.g. the closing
    force of a previous segment's ``MDState``) — skips the opening
    force evaluation on restarts/chunked runs.
    """
    if collect_every and n_steps % collect_every != 0:
        raise ValueError("n_steps must be a multiple of collect_every")
    force = _force_fn(potential)
    m = _masses_arr(masses, x0)
    dt = jnp.asarray(dt, x0.dtype)

    def step(state: MDState) -> MDState:
        v_half = state.v + 0.5 * dt * state.force / m
        x = state.x + dt * v_half
        _, f = force(x)
        return MDState(x=x, v=v_half + 0.5 * dt * f / m, force=f)

    if f0 is None:
        _, f0 = force(jnp.asarray(x0))
    init = MDState(x=jnp.asarray(x0), v=jnp.asarray(v0), force=f0)

    if collect_every:
        def body(s, _):
            s = jax.lax.fori_loop(0, collect_every, lambda i, s: step(s), s)
            return s, s.x

        return jax.lax.scan(body, init, None,
                            length=n_steps // collect_every)

    def body(s, _):
        return step(s), None

    out, _ = jax.lax.scan(body, init, None, length=n_steps,
                          unroll=min(unroll, max(n_steps, 1)))
    return out, None


def baoab(potential: Callable[[Array], Array],
          x0: Array, v0: Array, key: Array, *,
          dt: float, n_steps: int,
          friction: float = 1.0, kT: float = 1.0,
          masses=1.0,
          collect_every: int = 0,
          f0: Optional[Array] = None,
          collect_v: bool = False
          ) -> Tuple[MDState, Optional[Array]]:
    """Langevin (NVT) dynamics via the BAOAB splitting: B half-kick,
    A half-drift, O exact Ornstein-Uhlenbeck velocity refresh, A, B.

    Samples the Boltzmann distribution at temperature ``kT`` with
    leading-order configurational bias O(dt^2) (the best-in-class
    splitting for sampling accuracy per force evaluation); one force
    and one Gaussian draw per step, scanned on device.  ``friction`` is
    the collision rate gamma (units 1/time); ``friction=0`` reduces to
    velocity Verlet.

    With ``collect_every`` the second return is the position
    trajectory, or an ``(x_traj, v_traj)`` pair when ``collect_v`` is
    set (phase-space consumers: vibrational spectra, transition path
    sampling).
    """
    if collect_every and n_steps % collect_every != 0:
        raise ValueError("n_steps must be a multiple of collect_every")
    force = _force_fn(potential)
    m = _masses_arr(masses, x0)
    dt = jnp.asarray(dt, x0.dtype)
    c1 = jnp.exp(-friction * dt)
    # O-step noise amplitude per velocity component: sqrt(kT/m (1-c1^2)).
    c2 = jnp.sqrt(kT * (1.0 - c1 * c1) / m)

    def one(s, k):
        v = s.v + 0.5 * dt * s.force / m                  # B
        x = s.x + 0.5 * dt * v                            # A
        v = c1 * v + c2 * jax.random.normal(k, v.shape, v.dtype)  # O
        x = x + 0.5 * dt * v                              # A
        _, f = force(x)
        v = v + 0.5 * dt * f / m                          # B
        return MDState(x=x, v=v, force=f)

    if f0 is None:
        _, f0 = force(jnp.asarray(x0))
    init = MDState(x=jnp.asarray(x0), v=jnp.asarray(v0), force=f0)
    keys = jax.random.split(key, n_steps)

    if collect_every:
        keys = keys.reshape(n_steps // collect_every, collect_every,
                            *keys.shape[1:])

        def body(s, ks):
            def inner(s, k):
                return one(s, k), None

            s, _ = jax.lax.scan(inner, s, ks)
            return s, (s.x, s.v) if collect_v else s.x

        return jax.lax.scan(body, init, keys)

    def body(s, k):
        return one(s, k), None

    out, _ = jax.lax.scan(body, init, keys)
    return out, None


def steered_baoab(potential_for_lambda: Callable[[Array], Callable],
                  x0: Array, v0: Array, key: Array, *,
                  dt: float, n_steps: int,
                  lambdas: Array,
                  friction: float = 1.0, kT: float = 1.0,
                  masses=1.0) -> Tuple[MDState, Array]:
    """Steered (nonequilibrium) Langevin dynamics with work
    accumulation — the input to the Jarzynski / Crooks estimators.

    Beyond-reference capability.  ``potential_for_lambda(lam) ->
    energy_fn`` defines a protocol-dependent potential; ``lambdas``
    (shape ``(n_steps + 1,)``) is the switching schedule.  Each step
    propagates BAOAB at frozen ``lambdas[k]``, then accrues the
    discrete protocol work at FIXED coordinates:

        ``W += U(x; lambda_{k+1}) - U(x; lambda_k)``

    (the standard discrete-time nonequilibrium work; Jarzynski 1997).
    Returns ``(MDState, work)`` with per-replica work in energy units:
    batched replicas make the whole work ensemble one compiled scan —
    exactly what the exponential average needs, since its variance is
    dominated by rare low-work trajectories.

    Downstream (all reduced by ``kT``):
    ``exp_free_energy(work / kT)`` is the Jarzynski estimate of
    ``beta dF``; with a reverse-protocol run,
    ``bar_free_energy(w_f / kT, w_r / kT)`` is the Crooks/Bennett
    two-sided estimate.  Start ``x0`` from equilibrium at
    ``lambdas[0]``.
    """
    lambdas = jnp.asarray(lambdas)
    if lambdas.shape[0] != n_steps + 1:
        raise ValueError(f"lambdas must have n_steps + 1 ="
                         f" {n_steps + 1} entries, got"
                         f" {lambdas.shape[0]}")
    x0 = jnp.asarray(x0)
    m = _masses_arr(masses, x0)
    dt_a = jnp.asarray(dt, x0.dtype)
    c1 = jnp.exp(-friction * dt_a)
    c2 = jnp.sqrt(kT * (1.0 - c1 * c1) / m)

    def u_at(x, lam):
        return potential_for_lambda(lam)(x)

    def energy_force_at(x, lam):
        e, vjp = jax.vjp(lambda xx: u_at(xx, lam), x)
        (g,) = vjp(jnp.ones_like(e))
        return e, -g

    def step(carry, inp):
        s, w = carry
        k, lam, lam_next = inp
        v = s.v + 0.5 * dt_a * s.force / m                # B
        x = s.x + 0.5 * dt_a * v                          # A
        v = c1 * v + c2 * jax.random.normal(k, v.shape, v.dtype)  # O
        x = x + 0.5 * dt_a * v                            # A
        e_cur, f = energy_force_at(x, lam)
        v = v + 0.5 * dt_a * f / m                        # B
        # Switch lam at fixed x; the lam_next force doubles as the
        # next step's cached opening force.
        e_next, f = energy_force_at(x, lam_next)
        w = w + e_next - e_cur
        return (MDState(x=x, v=v, force=f), w), None

    _, f0 = energy_force_at(x0, lambdas[0])
    init = MDState(x=x0, v=jnp.asarray(v0), force=f0)
    w0 = jnp.zeros(x0.shape[:-2], x0.dtype)
    keys = jax.random.split(key, n_steps)
    (out, work), _ = jax.lax.scan(
        step, (init, w0), (keys, lambdas[:-1], lambdas[1:]))
    return out, work


class NHCState(NamedTuple):
    """Carry of the Nose-Hoover-chain loop: MD state plus the chain's
    own positions (``xi``, needed only for the conserved quantity) and
    velocities (``v_xi``), each ``(..., n_chain)`` per replica."""
    x: Array
    v: Array
    force: Array
    xi: Array
    v_xi: Array


# Suzuki-Yoshida composition weights: symmetric palindromic sequences
# that cancel the low-order error of the inner NHC splitting.  The
# 7-stage weights are Yoshida's 6th-order set (standard in MTK
# integrators; identical constants in LAMMPS/OpenMM/i-PI).
_W1_7, _W2_7, _W3_7 = (0.784513610477560, 0.235573213359357,
                       -1.17767998417887)
_W1_3 = 1.0 / (2.0 - 2.0 ** (1.0 / 3.0))
_SY_WEIGHTS = {
    1: (1.0,),
    3: (_W1_3, 1.0 - 2.0 * _W1_3, _W1_3),
    7: (_W1_7, _W2_7, _W3_7, 1.0 - 2.0 * (_W1_7 + _W2_7 + _W3_7),
        _W3_7, _W2_7, _W1_7),
}


def _nhc_masses(n_dof: int, kT: float, tau: float, n_chain: int):
    """MTK thermostat masses: ``Q_1 = n_dof kT tau^2``, ``Q_i = kT
    tau^2`` for the rest of the chain (tau is the thermostat period)."""
    q = [n_dof * kT * tau * tau] + [kT * tau * tau] * (n_chain - 1)
    return tuple(float(v) for v in q)


def _nhc_propagate(v, xi, v_xi, *, m, q, n_dof, kT, dt_half,
                   n_sy, n_respa):
    """Apply the Nose-Hoover-chain propagator ``exp(i L_NHC dt/2)``.

    The standard reversible factorization (Martyna, Tuckerman, Tobias &
    Klein 1996, Mol. Phys. 87:1117): for each Suzuki-Yoshida substep, a
    backward sweep updating chain velocities from the tail in, one
    velocity rescale of the particles, a chain-position drift, and a
    forward sweep back out.  The chain length is static, so the sweeps
    unroll into a handful of fused elementwise ops per replica.
    """
    n_chain = len(q)
    ke2 = jnp.sum(m * v * v, axis=(-2, -1))           # 2 * KE, (...,)
    scale = jnp.ones_like(ke2)
    vx = [v_xi[..., i] for i in range(n_chain)]
    xs = [xi[..., i] for i in range(n_chain)]
    weights = _SY_WEIGHTS[n_sy]

    for _ in range(n_respa):
        for w in weights:
            delta = w * dt_half / n_respa
            # Backward sweep: tail thermostat first.
            g = (q[n_chain - 2] * vx[n_chain - 2] ** 2 - kT) / q[-1] \
                if n_chain > 1 else (ke2 - n_dof * kT) / q[0]
            vx[-1] = vx[-1] + 0.5 * delta * g
            for i in range(n_chain - 2, -1, -1):
                aa = jnp.exp(-0.25 * delta * vx[i + 1])
                if i == 0:
                    g = (ke2 - n_dof * kT) / q[0]
                else:
                    g = (q[i - 1] * vx[i - 1] ** 2 - kT) / q[i]
                vx[i] = vx[i] * aa * aa + 0.5 * delta * g * aa
            # Particle-velocity rescale by the head thermostat.
            s = jnp.exp(-delta * vx[0])
            scale = scale * s
            ke2 = ke2 * s * s
            # Chain-position drift (enters only the invariant).
            for i in range(n_chain):
                xs[i] = xs[i] + delta * vx[i]
            # Forward sweep back out to the tail.
            for i in range(n_chain - 1):
                aa = jnp.exp(-0.25 * delta * vx[i + 1])
                if i == 0:
                    g = (ke2 - n_dof * kT) / q[0]
                else:
                    g = (q[i - 1] * vx[i - 1] ** 2 - kT) / q[i]
                vx[i] = vx[i] * aa * aa + 0.5 * delta * g * aa
            if n_chain > 1:
                g = (q[n_chain - 2] * vx[n_chain - 2] ** 2 - kT) / q[-1]
            else:
                g = (ke2 - n_dof * kT) / q[0]
            vx[-1] = vx[-1] + 0.5 * delta * g

    v = v * scale[..., None, None]
    return v, jnp.stack(xs, axis=-1), jnp.stack(vx, axis=-1)


def nose_hoover(potential: Callable[[Array], Array],
                x0: Array, v0: Array, *,
                dt: float, n_steps: int,
                kT: float = 1.0, tau: Optional[float] = None,
                masses=1.0, n_chain: int = 3,
                n_sy: int = 7, n_respa: int = 1,
                collect_every: int = 0,
                state: Optional[NHCState] = None
                ) -> Tuple[NHCState, Optional[Array]]:
    """Deterministic NVT dynamics via Nose-Hoover chains (MTK scheme).

    Beyond-reference capability (the reference is MC-only,
    /root/reference/vaemolsim/mcmc.py).  The canonical deterministic
    thermostat: a chain of ``n_chain`` thermostat variables couples to
    the kinetic energy, making the extended system's dynamics sample
    the NVT ensemble while conserving the extended Hamiltonian of
    :func:`nose_hoover_invariant` exactly in the dt -> 0 limit — the
    invariant's drift is THE integration-quality diagnostic, which
    stochastic thermostats (BAOAB) do not offer.  Chains (vs a single
    Nose-Hoover variable) restore ergodicity for stiff/harmonic
    systems; the Suzuki-Yoshida ``n_sy``-stage, ``n_respa``-fold
    splitting keeps the chain integration accurate when ``tau`` is
    small.

    One force evaluation per step, whole trajectory as one
    ``lax.scan``; replicas batch over leading axes and shard over a
    mesh like every integrator here.  ``tau`` is the thermostat period
    (defaults to ``100*dt``); thermostat masses follow MTK
    (``Q_1 = n_dof kT tau^2``, ``Q_i = kT tau^2``).

    Returns ``(NHCState, trajectory)``; pass ``state`` to resume a
    previous segment exactly (``x0``/``v0`` are then ignored).
    """
    if collect_every and n_steps % collect_every != 0:
        raise ValueError("n_steps must be a multiple of collect_every")
    if n_sy not in _SY_WEIGHTS:
        raise ValueError(f"n_sy must be one of {sorted(_SY_WEIGHTS)}")
    if n_chain < 1:
        raise ValueError("n_chain must be >= 1")
    force = _force_fn(potential)
    x0 = state.x if state is not None else jnp.asarray(x0)
    m = _masses_arr(masses, x0)
    n_dof = x0.shape[-2] * x0.shape[-1]
    tau_v = float(tau) if tau is not None else 100.0 * float(dt)
    q = _nhc_masses(n_dof, float(kT), tau_v, n_chain)
    dt = jnp.asarray(dt, x0.dtype)

    def step(s: NHCState) -> NHCState:
        v, xi, v_xi = _nhc_propagate(
            s.v, s.xi, s.v_xi, m=m, q=q, n_dof=n_dof, kT=float(kT),
            dt_half=0.5 * dt, n_sy=n_sy, n_respa=n_respa)
        v = v + 0.5 * dt * s.force / m
        x = s.x + dt * v
        _, f = force(x)
        v = v + 0.5 * dt * f / m
        v, xi, v_xi = _nhc_propagate(
            v, xi, v_xi, m=m, q=q, n_dof=n_dof, kT=float(kT),
            dt_half=0.5 * dt, n_sy=n_sy, n_respa=n_respa)
        return NHCState(x=x, v=v, force=f, xi=xi, v_xi=v_xi)

    if state is None:
        _, f0 = force(x0)
        batch = x0.shape[:-2]
        zeros = jnp.zeros(batch + (n_chain,), x0.dtype)
        state = NHCState(x=x0, v=jnp.asarray(v0), force=f0,
                         xi=zeros, v_xi=zeros)

    if collect_every:
        def body(s, _):
            s = jax.lax.fori_loop(0, collect_every, lambda i, s: step(s), s)
            return s, s.x

        return jax.lax.scan(body, state, None,
                            length=n_steps // collect_every)

    def body(s, _):
        return step(s), None

    out, _ = jax.lax.scan(body, state, None, length=n_steps)
    return out, None


def nose_hoover_invariant(potential: Callable[[Array], Array],
                          state: NHCState, *,
                          kT: float = 1.0, tau: Optional[float] = None,
                          dt: Optional[float] = None,
                          masses=1.0) -> Array:
    """The conserved quantity of :func:`nose_hoover` per replica:

    ``H' = U + KE + sum_i Q_i v_xi_i^2 / 2 + n_dof kT xi_1
    + kT sum_{i>1} xi_i``

    Pass the same ``kT``/``tau``/``masses`` as the integrator (and
    ``dt`` if ``tau`` was left at its ``100*dt`` default).  Flat to
    O(dt^2) along a trajectory — monitor it exactly like NVE energy.
    """
    if tau is None:
        if dt is None:
            raise ValueError("pass tau, or dt so the 100*dt default "
                             "tau matches the integrator")
        tau = 100.0 * float(dt)
    n_chain = state.v_xi.shape[-1]
    n_dof = state.x.shape[-2] * state.x.shape[-1]
    q = jnp.asarray(_nhc_masses(n_dof, float(kT), float(tau), n_chain),
                    state.x.dtype)
    therm_ke = 0.5 * jnp.sum(q * state.v_xi * state.v_xi, axis=-1)
    weights = jnp.asarray([n_dof] + [1] * (n_chain - 1), state.x.dtype)
    therm_pe = float(kT) * jnp.sum(weights * state.xi, axis=-1)
    return (potential(state.x) + kinetic_energy(state.v, masses)
            + therm_ke + therm_pe)


def respa_verlet(fast_potential: Callable[[Array], Array],
                 slow_potential: Callable[[Array], Array],
                 x0: Array, v0: Array, *,
                 dt: float, n_steps: int, n_inner: int = 4,
                 masses=1.0,
                 collect_every: int = 0
                 ) -> Tuple[MDState, Optional[Array]]:
    """r-RESPA multiple-timestep NVE integration (Tuckerman, Berne &
    Martyna 1992): the reversible impulse splitting

        half slow kick (dt) -> n_inner velocity-Verlet steps of the
        FAST force at dt/n_inner -> half slow kick,

    so the expensive slow force (nonbonded pairs) is evaluated once per
    OUTER step while stiff bonded terms integrate at the small inner
    step.  Symplectic and time-reversible; conserves total
    (fast + slow) energy at outer steps far beyond the plain-Verlet
    stability limit of the stiff force (pinned by test: a stiff bond
    whose plain-Verlet limit is exceeded 2x).

    One slow force + ``n_inner`` fast forces per outer step (the
    closing slow force of step k is the opening slow force of step
    k+1, carried in the scan), the whole run one nested ``lax.scan``;
    ``MDState.force`` carries the FAST force for the inner loop's
    reuse.  Replicas batch/shard over leading axes as everywhere.
    """
    if collect_every and n_steps % collect_every != 0:
        raise ValueError("n_steps must be a multiple of collect_every")
    if n_inner < 1:
        raise ValueError("n_inner must be >= 1")
    f_fast = _force_fn(fast_potential)
    f_slow = _force_fn(slow_potential)
    m = _masses_arr(masses, x0)
    dt_ = jnp.asarray(dt, jnp.asarray(x0).dtype)
    h = dt_ / n_inner

    def inner(s: MDState) -> MDState:
        v_half = s.v + 0.5 * h * s.force / m
        x = s.x + h * v_half
        _, f = f_fast(x)
        return MDState(x=x, v=v_half + 0.5 * h * f / m, force=f)

    def outer_step(carry):
        s, fs = carry                                # fs = slow force at s.x
        v = s.v + 0.5 * dt_ * fs / m                 # slow half kick
        s = MDState(x=s.x, v=v, force=s.force)
        s = jax.lax.fori_loop(0, n_inner, lambda i, ss: inner(ss), s)
        _, fs = f_slow(s.x)
        return (MDState(x=s.x, v=s.v + 0.5 * dt_ * fs / m,
                        force=s.force), fs)

    _, f0 = f_fast(jnp.asarray(x0))
    _, fs0 = f_slow(jnp.asarray(x0))
    init = (MDState(x=jnp.asarray(x0), v=jnp.asarray(v0), force=f0),
            fs0)
    from vaemolsim_tpu.utils.scan import scan_collect
    (out, _fs), traj = scan_collect(
        outer_step, init, n_steps, collect_every=collect_every,
        snapshot_fn=lambda c: c[0].x)
    return out, traj


class CSVRState(NamedTuple):
    """Carry of the CSVR loop: MD state plus the accumulated rescale
    work (the conserved effective energy is ``E(t) - work``)."""
    x: Array
    v: Array
    force: Array
    work: Array  # (...,) accumulated kinetic-energy changes


def csvr(potential: Callable[[Array], Array],
         x0: Array, v0: Array, key: Array, *,
         dt: float, n_steps: int,
         kT: float = 1.0, tau: float = 0.1,
         masses=1.0,
         collect_every: int = 0,
         state: Optional[CSVRState] = None
         ) -> Tuple[CSVRState, Optional[Array]]:
    """Canonical sampling through velocity rescaling (Bussi, Donadio &
    Parrinello 2007): velocity Verlet plus one EXACT stochastic rescale
    of the total kinetic energy per step,

        K' = K + (1-c)(Kbar (R1^2 + S)/Nf - K)
             + 2 R1 sqrt(c (1-c) K Kbar / Nf),    c = e^{-dt/tau},

    with ``R1 ~ N(0,1)``, ``S ~ chi^2(Nf-1)``, ``Kbar = Nf kT / 2`` —
    the global-rescale thermostat (GROMACS' default) that samples the
    canonical kinetic-energy distribution exactly at ANY ``tau`` while
    perturbing the Newtonian trajectories as little as possible (one
    scalar scale per replica per step; dynamics-derived observables
    like VACF/diffusion are far less disturbed than under Langevin
    friction).

    The accumulated rescale work makes ``E(t) - work`` a conserved
    effective energy — the same integration-quality diagnostic as the
    Nose-Hoover invariant, for a stochastic thermostat.  One force
    evaluation and three random draws per step; whole run is one
    ``lax.scan``; replicas batch/shard as everywhere.

    Returns ``(CSVRState, trajectory)``; pass ``state`` to resume.
    """
    if collect_every and n_steps % collect_every != 0:
        raise ValueError("n_steps must be a multiple of collect_every")
    force = _force_fn(potential)
    x0 = state.x if state is not None else jnp.asarray(x0)
    m = _masses_arr(masses, x0)
    n_dof = x0.shape[-2] * x0.shape[-1]
    dt_ = jnp.asarray(dt, x0.dtype)
    c = jnp.exp(-dt_ / tau)
    k_bar = 0.5 * n_dof * kT
    batch_shape = x0.shape[:-2]

    def rescale(v, k):
        k1, k2 = jax.random.split(k)
        K = kinetic_energy(v, masses)
        r1 = jax.random.normal(k1, batch_shape, x0.dtype)
        # S ~ chi^2(Nf - 1) via Gamma((Nf-1)/2, scale 2).
        s_sum = 2.0 * jax.random.gamma(
            k2, 0.5 * (n_dof - 1), batch_shape, x0.dtype)
        K_new = (K + (1.0 - c) * (k_bar * (r1 * r1 + s_sum) / n_dof - K)
                 + 2.0 * r1 * jnp.sqrt(c * (1.0 - c) * K * k_bar
                                       / n_dof))
        K_new = jnp.maximum(K_new, 0.0)
        # A replica with EXACTLY zero kinetic energy (v0 = 0 at a
        # stationary point) cannot be rescaled into motion: leave it
        # untouched and accrue no phantom work (document: draw
        # Maxwell-Boltzmann initial velocities to thermalize).
        has_ke = K > 0.0
        alpha = jnp.where(has_ke,
                          jnp.sqrt(K_new / jnp.maximum(K, 1e-30)), 1.0)
        dK = jnp.where(has_ke, K_new - K, 0.0)
        return alpha[(...,) + (None, None)] * v, dK

    def one(s: CSVRState, k) -> Tuple[CSVRState, None]:
        v = s.v + 0.5 * dt_ * s.force / m
        x = s.x + dt_ * v
        _, f = force(x)
        v = v + 0.5 * dt_ * f / m
        v, dK = rescale(v, k)
        return CSVRState(x=x, v=v, force=f, work=s.work + dK), None

    if state is None:
        _, f0 = force(x0)
        state = CSVRState(x=x0, v=jnp.asarray(v0), force=f0,
                          work=jnp.zeros(batch_shape, x0.dtype))

    def keyed_step(carry):
        s, k = carry
        k, sub = jax.random.split(k)
        s, _ = one(s, sub)
        return (s, k)

    from vaemolsim_tpu.utils.scan import scan_collect
    (out, _k), traj = scan_collect(
        keyed_step, (state, jnp.asarray(key)), n_steps,
        collect_every=collect_every, snapshot_fn=lambda c: c[0].x)
    return out, traj


class NPTMDState(NamedTuple):
    """Carry of the NPT-MD loop: MD state plus the per-replica box, the
    cached potential energy at ``(x, box)``, and barostat statistics."""
    x: Array
    v: Array
    force: Array
    box: Array          # (..., dim) per-replica edge lengths
    energy: Array       # (...,) potential energy U(x; box)
    key: Array
    vol_trials: Array   # () int32
    vol_acc: Array      # () int32

    @property
    def volume(self) -> Array:
        return jnp.prod(self.box, axis=-1)

    @property
    def vol_acceptance_rate(self) -> Array:
        return self.vol_acc / jnp.maximum(self.vol_trials, 1)


def baoab_npt(potential_for_box: Callable[[Array], Callable],
              x0: Array, v0: Array, box0, key: Array, *,
              dt: float, n_steps: int, pressure: float,
              friction: float = 1.0, kT: float = 1.0, masses=1.0,
              vol_every: int = 25, dlnv_scale: float = 0.02,
              min_box: Optional[float] = None,
              collect: bool = False,
              state: Optional[NPTMDState] = None
              ) -> Tuple[NPTMDState, Optional[Tuple[Array, Array]]]:
    """Isothermal-isobaric (NPT) dynamics: BAOAB Langevin + MC barostat.

    The standard hybrid scheme (Chow & Ferguson 1995; OpenMM's
    MonteCarloBarostat): ``vol_every`` BAOAB steps at frozen box, then
    one Metropolis volume move — a Gaussian step in ``ln V``, uniform
    dilation of coordinates and box, accepted with

        ``exp(-beta dU - beta P dV + (N + 1) ln(V'/V))``

    (the same ln-V-sampling exponent as :mod:`vaemolsim_tpu.mcmc.npt`;
    velocities are untouched — the Maxwell distribution is
    volume-independent, so the kinetic part cancels exactly).  Samples
    the NPT ensemble at temperature ``kT`` and pressure ``pressure`` in
    reduced units, with BAOAB's O(dt^2) configurational bias.

    ``potential_for_box(box (..., 1, 1, dim)) -> energy_fn`` is the
    box-parametric factory contract of :mod:`vaemolsim_tpu.mcmc.npt`
    (dense periodic potentials; keep ``shift=True``, and set
    ``min_box=2*cutoff`` for truncated minimum-image pair forms — see
    ``make_npt_step``).  Every replica carries its own box; thousands of
    replicas batch over the leading axes as one compiled scan.

    ``collect=True`` additionally returns ``(xs, boxes)`` sampled once
    per barostat cycle, shapes ``(n_steps//vol_every, ...)``.

    ``state``: resume from a previous call's final state (``x0``,
    ``v0``, ``box0``, ``key`` are then ignored).
    """
    if vol_every < 1 or n_steps % vol_every:
        raise ValueError(f"vol_every={vol_every} must be >= 1 and divide "
                         f"n_steps={n_steps}")
    beta = 1.0 / float(kT)
    pressure = float(pressure)
    min_box_v = None if min_box is None else float(min_box)

    def u_at(x, box):
        return potential_for_box(box[..., None, None, :])(x)

    if state is None:
        x0 = jnp.asarray(x0)
        box_arr = jnp.broadcast_to(jnp.asarray(box0, x0.dtype),
                                   x0.shape[:-2] + (x0.shape[-1],))
        _, f0 = _force_fn(lambda x: u_at(x, box_arr))(x0)
        state = NPTMDState(x=x0, v=jnp.asarray(v0), force=f0, box=box_arr,
                           energy=u_at(x0, box_arr), key=key,
                           vol_trials=jnp.asarray(0, jnp.int32),
                           vol_acc=jnp.asarray(0, jnp.int32))

    n_atoms, dim = state.x.shape[-2], state.x.shape[-1]
    n_chains = int(state.energy.size)

    def cycle(s: NPTMDState, _):
        key, k_md, k_ln, k_acc = jax.random.split(s.key, 4)
        md, _ = baoab(lambda x: u_at(x, s.box), s.x, s.v, k_md, dt=dt,
                      n_steps=vol_every, friction=friction, kT=kT,
                      masses=masses, f0=s.force)

        # MC volume move (velocities unchanged).
        e1 = u_at(md.x, s.box)
        v1 = jnp.prod(s.box, axis=-1)
        ln_v1 = jnp.log(v1)
        ln_v2 = ln_v1 + dlnv_scale * jax.random.normal(k_ln, v1.shape,
                                                       md.x.dtype)
        scale = jnp.exp((ln_v2 - ln_v1) / dim)
        box2 = scale[..., None] * s.box
        x2 = scale[..., None, None] * md.x
        e2 = u_at(x2, box2)
        v2 = jnp.exp(ln_v2)
        log_acc = (-beta * (e2 - e1) - beta * pressure * (v2 - v1)
                   + (n_atoms + 1) * (ln_v2 - ln_v1))
        if min_box_v is not None:
            log_acc = jnp.where(jnp.min(box2, axis=-1) < min_box_v,
                                -jnp.inf, log_acc)
        accept = log_acc >= log_uniform(k_acc, log_acc.shape,
                                        log_acc.dtype)

        x = jnp.where(accept[..., None, None], x2, md.x)
        box = jnp.where(accept[..., None], box2, s.box)
        energy = jnp.where(accept, e2, e1)
        # Refresh the cached force at the (possibly new) box/coords.
        _, f = _force_fn(lambda xx: u_at(xx, box))(x)
        out = NPTMDState(
            x=x, v=md.v, force=f, box=box, energy=energy, key=key,
            vol_trials=s.vol_trials + jnp.asarray(n_chains, jnp.int32),
            vol_acc=s.vol_acc + jnp.sum(accept, dtype=jnp.int32))
        return out, (x, box) if collect else None

    state, collected = jax.lax.scan(cycle, state, None,
                                    length=n_steps // vol_every)
    return state, collected


def velocity_verlet_neighbor(build, energy, x0: Array, v0: Array, *,
                             dt: float, n_steps: int,
                             rebuild_every: int,
                             masses=1.0
                             ) -> Tuple[MDState, None]:
    """NVE velocity Verlet with an amortized neighbor list: the outer
    scan rebuilds via ``build`` every ``rebuild_every`` steps, the
    inner :func:`velocity_verlet` runs with the frozen list.

    ``(build, energy)`` is the pair from
    :func:`~vaemolsim_tpu.potentials.lennard_jones_cell_neighbor` (or
    anything matching its contract); size its ``skin`` so that no atom
    moves more than ``skin/2`` in ``rebuild_every`` steps — violations
    surface as NaN coordinates, never silently-wrong forces.
    """
    if rebuild_every < 1 or n_steps % rebuild_every:
        raise ValueError(
            f"rebuild_every={rebuild_every} must be >= 1 and divide "
            f"n_steps={n_steps}")

    def chunk(s: MDState, _):
        nl = build(s.x)
        # The carried closing force was computed at this same x (with
        # the previous, still-valid list): reuse it — any valid list
        # yields the identical force, and an invalid one is already NaN.
        out, _ = velocity_verlet(lambda x: energy(nl, x), s.x, s.v,
                                 dt=dt, n_steps=rebuild_every,
                                 masses=masses, f0=s.force)
        return out, None

    x0 = jnp.asarray(x0)
    nl0 = build(x0)
    _, force0 = _force_fn(lambda x: energy(nl0, x))(x0)
    init = MDState(x=x0, v=jnp.asarray(v0), force=force0)
    out, _ = jax.lax.scan(chunk, init, None,
                          length=n_steps // rebuild_every)
    return out, None


def baoab_neighbor(build, energy, x0: Array, v0: Array, key: Array, *,
                   dt: float, n_steps: int, rebuild_every: int,
                   friction: float = 1.0, kT: float = 1.0,
                   masses=1.0) -> Tuple[MDState, None]:
    """Langevin NVT :func:`baoab` with an amortized neighbor list (see
    :func:`velocity_verlet_neighbor` for the contract)."""
    if rebuild_every < 1 or n_steps % rebuild_every:
        raise ValueError(
            f"rebuild_every={rebuild_every} must be >= 1 and divide "
            f"n_steps={n_steps}")

    def chunk(carry, k):
        s = carry
        nl = build(s.x)
        out, _ = baoab(lambda x: energy(nl, x), s.x, s.v, k, dt=dt,
                       n_steps=rebuild_every, friction=friction, kT=kT,
                       masses=masses, f0=s.force)
        return out, None

    x0 = jnp.asarray(x0)
    nl0 = build(x0)
    _, force0 = _force_fn(lambda x: energy(nl0, x))(x0)
    init = MDState(x=x0, v=jnp.asarray(v0), force=force0)
    keys = jax.random.split(key, n_steps // rebuild_every)
    out, _ = jax.lax.scan(chunk, init, keys)
    return out, None


class BondConstraints(NamedTuple):
    """Holonomic bond-length constraints (|x_i - x_j| = d_b) for MD —
    SHAKE position projection + RATTLE velocity projection
    (Ryckaert et al. 1977; Andersen 1983), built for TPU: per-iteration
    all-bond Jacobi updates applied through a precomputed signed
    incidence matrix — two einsum contractions per sweep, static
    shapes, no scatter, no per-bond Python loop (Gauss-Seidel's
    sequential sweep would serialize on device).  Jacobi SHAKE
    converges geometrically for molecular topologies; ``n_iters``
    bounds the fixed compiled cost (default 50 handles bonded chains;
    disjoint bonds converge in ~10).

    Build with :func:`bond_constraints`; integrate with
    :func:`velocity_verlet_constrained` / :func:`baoab_constrained`.
    """

    inc: Array       # (n_bonds, n_atoms) signed incidence (+1 i, -1 j)
    d0: Array        # (n_bonds,) target lengths
    inv_mu: Array    # (n_bonds,) 1/m_i + 1/m_j
    inv_m: Array     # (n_atoms, 1) 1/m_i
    n_iters: int

    def shake_delta(self, x_ref: Array, x: Array) -> Tuple[Array, Array]:
        """Project ``x`` onto the constraint manifold along the
        REFERENCE bond directions (the pre-drift geometry), the SHAKE
        linearization: after convergence ``|x_i - x_j| = d0`` to the
        Jacobi tolerance.  Returns ``(x_projected, delta)`` with
        ``delta`` the total correction ACCUMULATED SEPARATELY — the
        integrators need ``delta / dt`` as the constraint-impulse
        velocity, and computing it as ``(x_new - x) / dt`` in float32
        amplifies position roundoff by 1/dt (measured: a free rigid
        rotor bled ~3e-5 of its energy PER STEP through that
        cancellation, worse at smaller dt)."""
        r_ref = jnp.einsum("ba,...ad->...bd", self.inc, x_ref)

        def body(_, carry):
            x, delta = carry
            r = jnp.einsum("ba,...ad->...bd", self.inc, x)
            c = jnp.sum(r * r, axis=-1) - self.d0 ** 2
            denom = 2.0 * self.inv_mu * jnp.sum(r * r_ref, axis=-1)
            # guard: if the reference direction degenerates (orthogonal
            # drift), fall back to the current direction's norm
            denom = jnp.where(jnp.abs(denom) > 1e-10, denom,
                              2.0 * self.inv_mu * jnp.sum(r * r, -1))
            g = c / denom                               # (..., B)
            dx = -jnp.einsum("ba,...bd->...ad", self.inc,
                             g[..., None] * r_ref) * self.inv_m
            return x + dx, delta + dx

        out, delta = jax.lax.fori_loop(
            0, self.n_iters, body, (x, jnp.zeros_like(x)))
        return out, delta

    def shake(self, x_ref: Array, x: Array) -> Array:
        """:meth:`shake_delta` without the correction term."""
        return self.shake_delta(x_ref, x)[0]

    def rattle(self, x: Array, v: Array) -> Array:
        """Project velocities so every constrained bond has zero
        stretch rate (d/dt |x_i - x_j|^2 = 0)."""
        r = jnp.einsum("ba,...ad->...bd", self.inc, x)
        r2 = jnp.sum(r * r, axis=-1)

        def body(_, v):
            rv = jnp.sum(r * jnp.einsum("ba,...ad->...bd", self.inc, v),
                         axis=-1)
            k = rv / (self.inv_mu * r2)
            dv = -jnp.einsum("ba,...bd->...ad", self.inc,
                             k[..., None] * r) * self.inv_m
            return v + dv

        return jax.lax.fori_loop(0, self.n_iters, body, v)


def bond_constraints(bonds, lengths, n_atoms: int, masses=1.0,
                     n_iters: int = 50) -> BondConstraints:
    """Build :class:`BondConstraints` for ``bonds`` (B, 2) static index
    pairs with target ``lengths`` (scalar or (B,)).  ``masses``: scalar
    or (n_atoms,)."""
    import numpy as np

    bonds = np.asarray(bonds, np.int64)
    if bonds.ndim != 2 or bonds.shape[1] != 2:
        raise ValueError(f"bonds must be (B, 2); got {bonds.shape}")
    B = bonds.shape[0]
    inc = np.zeros((B, n_atoms), np.float32)
    inc[np.arange(B), bonds[:, 0]] = 1.0
    inc[np.arange(B), bonds[:, 1]] = -1.0
    m = np.broadcast_to(np.asarray(masses, np.float32), (n_atoms,))
    inv_mu = 1.0 / m[bonds[:, 0]] + 1.0 / m[bonds[:, 1]]
    d0 = np.broadcast_to(np.asarray(lengths, np.float32), (B,))
    return BondConstraints(
        inc=jnp.asarray(inc), d0=jnp.asarray(d0),
        inv_mu=jnp.asarray(inv_mu),
        inv_m=jnp.asarray(1.0 / m)[:, None], n_iters=int(n_iters))


def velocity_verlet_constrained(potential: Callable[[Array], Array],
                                x0: Array, v0: Array, *,
                                dt: float, n_steps: int,
                                constraints: BondConstraints,
                                masses=1.0,
                                collect_every: int = 0
                                ) -> Tuple[MDState, Optional[Array]]:
    """RATTLE: velocity Verlet with bond constraints — SHAKE after the
    drift, RATTLE velocity projection after each kick.  Conserves the
    constrained system's energy (pinned by test) and keeps every bond
    at its target length to the Jacobi tolerance."""
    if collect_every and n_steps % collect_every != 0:
        raise ValueError("n_steps must be a multiple of collect_every")
    force = _force_fn(potential)
    m = _masses_arr(masses, x0)
    dt = jnp.asarray(dt, x0.dtype)
    con = constraints

    def step(s: MDState) -> MDState:
        v_half = s.v + 0.5 * dt * s.force / m
        x_new, delta = con.shake_delta(s.x, s.x + dt * v_half)
        v_half = v_half + delta / dt             # constraint impulse
        _, f = force(x_new)
        v = con.rattle(x_new, v_half + 0.5 * dt * f / m)
        return MDState(x=x_new, v=v, force=f)

    x0 = con.shake(jnp.asarray(x0), jnp.asarray(x0))
    _, f0 = force(x0)
    init = MDState(x=x0, v=con.rattle(x0, jnp.asarray(v0)), force=f0)

    if collect_every:
        def body(s, _):
            s = jax.lax.fori_loop(0, collect_every, lambda i, s: step(s), s)
            return s, s.x

        return jax.lax.scan(body, init, None,
                            length=n_steps // collect_every)

    def body(s, _):
        return step(s), None

    out, _ = jax.lax.scan(body, init, None, length=n_steps)
    return out, None


def baoab_constrained(potential: Callable[[Array], Array],
                      x0: Array, v0: Array, key: Array, *,
                      dt: float, n_steps: int,
                      constraints: BondConstraints,
                      friction: float = 1.0, kT: float = 1.0,
                      masses=1.0,
                      collect_every: int = 0
                      ) -> Tuple[MDState, Optional[Array]]:
    """Constrained BAOAB (g-BAOAB with one constraint projection per
    stage, Leimkuhler & Matthews 2016): SHAKE after each drift, RATTLE
    after each kick and after the OU refresh.  Samples the constrained
    Boltzmann distribution; kinetic equipartition carries
    ``(3 N - B)/2 kT`` (pinned by test)."""
    if collect_every and n_steps % collect_every != 0:
        raise ValueError("n_steps must be a multiple of collect_every")
    force = _force_fn(potential)
    m = _masses_arr(masses, x0)
    dt = jnp.asarray(dt, x0.dtype)
    c1 = jnp.exp(-friction * dt)
    c2 = jnp.sqrt(kT * (1.0 - c1 * c1) / m)
    con = constraints

    def one(s, k):
        v = con.rattle(s.x, s.v + 0.5 * dt * s.force / m)       # B
        x, d1 = con.shake_delta(s.x, s.x + 0.5 * dt * v)        # A
        v = v + d1 / (0.5 * dt)
        v = c1 * v + c2 * jax.random.normal(k, v.shape, v.dtype)
        v = con.rattle(x, v)                                    # O
        x2, d2 = con.shake_delta(x, x + 0.5 * dt * v)           # A
        v = v + d2 / (0.5 * dt)
        _, f = force(x2)
        v = con.rattle(x2, v + 0.5 * dt * f / m)                # B
        return MDState(x=x2, v=v, force=f)

    x0 = con.shake(jnp.asarray(x0), jnp.asarray(x0))
    _, f0 = force(x0)
    init = MDState(x=x0, v=con.rattle(x0, jnp.asarray(v0)), force=f0)
    keys = jax.random.split(key, n_steps)

    if collect_every:
        keys = keys.reshape(n_steps // collect_every, collect_every,
                            *keys.shape[1:])

        def body(s, ks):
            def inner(s, k):
                return one(s, k), None

            s, _ = jax.lax.scan(inner, s, ks)
            return s, s.x

        return jax.lax.scan(body, init, keys)

    def body(s, k):
        return one(s, k), None

    out, _ = jax.lax.scan(body, init, keys)
    return out, None
