"""Brownian (overdamped) dynamics, free-draining and with
Rotne-Prager-Yamakawa hydrodynamic interactions.

Beyond-reference capability: the overdamped limit of Langevin dynamics
— the natural regime for colloids, polymers in solvent, and CG models
where momenta have no meaning.  Two integrators:

- :func:`brownian` — free-draining BD with the Leimkuhler-Matthews
  "BAOAB-limit" discretization (averaged half-noises), whose
  configurational sampling error is O(dt^2) instead of Euler-
  Maruyama's O(dt) at identical cost (one force + one Gaussian per
  step).
- :func:`brownian_rpy` — correlated BD with the RPY mobility tensor
  (Rotne & Prager 1969; Yamakawa 1970): solvent-mediated coupling
  between particles, the standard minimal model of hydrodynamic
  interactions.  RPY is positive definite for ALL configurations
  (including overlaps, via the overlap-regularized branch) and
  divergence-free (``div M = 0``), so the overdamped equation has no
  spurious-drift term:

      ``dx = M F dt + sqrt(2 kT dt) B xi,   B B^T = M``.

TPU-first design: the mobility build is a dense pairwise block tensor
(``(N, N, 3, 3)`` from one displacement grid — same masked dense-pair
pattern as :mod:`vaemolsim_tpu.potentials`), the deterministic update
is one ``(3N, 3N) @ (3N,)`` matmul and the correlated noise one
batched Cholesky + matmul — all MXU work that batches over replicas.
O(N^3) per step targets the colloid/polymer N (tens to hundreds) this
method is meant for.

Exactness anchors (tests): free diffusion MSD ``2 d D t``, Boltzmann
sampling of a harmonic well, the analytic RPY pair mobility at
separation r, one-step displacement covariance ``2 kT M dt``, and the
hydrodynamic enhancement of collective (center-of-mass) diffusion that
free-draining BD cannot produce.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from vaemolsim_tpu.md import _force_fn

Array = jax.Array

__all__ = ["BDState", "brownian", "rpy_mobility", "brownian_rpy"]


class BDState(NamedTuple):
    """Positions plus the cached force and the carried half-noise of
    the Leimkuhler-Matthews averaged-noise scheme."""
    x: Array
    force: Array
    noise: Array


def _diffusion_arr(diffusion, x):
    d = jnp.asarray(diffusion, x.dtype)
    if d.ndim == 1:
        d = d[:, None]                      # (n_atoms, 1) vs (..., n, d)
    return d


def brownian(potential: Callable[[Array], Array], x0: Array,
             key: Array, *, dt: float, n_steps: int, kT: float,
             diffusion=1.0, collect_every: int = 0,
             state0: Optional[BDState] = None
             ) -> Tuple[BDState, Optional[Array]]:
    """Free-draining overdamped dynamics
    ``dx = (D / kT) F dt + sqrt(2 D dt) dW`` with per-atom diffusion
    coefficients ``D`` (scalar or ``(n_atoms,)``), discretized by the
    Leimkuhler-Matthews averaged-noise scheme

        ``x_{k+1} = x_k + (D / kT) F(x_k) dt
                    + sqrt(2 D dt) (xi_k + xi_{k+1}) / 2``

    — the overdamped limit of BAOAB, with O(dt^2) configurational
    bias (Leimkuhler & Matthews 2013) at Euler-Maruyama cost.  Samples
    ``exp(-U/kT)``; MSD of a free particle is exactly ``2 d D t`` in
    expectation.  Whole trajectory is one ``lax.scan``; replicas batch
    over leading axes of ``x0 (..., n_atoms, dim)``.

    ``state0`` resumes from a previous segment's :class:`BDState`
    (keeps the cached force AND the carried half-noise, preserving the
    averaged-noise correlation across the seam).
    """
    if collect_every and n_steps % collect_every != 0:
        raise ValueError("n_steps must be a multiple of collect_every")
    x0 = jnp.asarray(x0)
    force = _force_fn(potential)
    d = _diffusion_arr(diffusion, x0)
    dtj = jnp.asarray(dt, x0.dtype)
    amp = jnp.sqrt(2.0 * d * dtj)

    def one(s: BDState, k) -> BDState:
        xi = jax.random.normal(k, s.x.shape, s.x.dtype)
        x = (s.x + (d / kT) * s.force * dtj
             + 0.5 * amp * (s.noise + xi))
        _, f = force(x)
        return BDState(x=x, force=f, noise=xi)

    if state0 is None:
        _, f0 = force(x0)
        kn, key = jax.random.split(key)
        state0 = BDState(x=x0, force=f0,
                         noise=jax.random.normal(kn, x0.shape, x0.dtype))
    keys = jax.random.split(key, n_steps)

    if collect_every:
        keys = keys.reshape(n_steps // collect_every, collect_every,
                            *keys.shape[1:])

        def body(s, ks):
            s, _ = jax.lax.scan(lambda s, k: (one(s, k), None), s, ks)
            return s, s.x

        return jax.lax.scan(body, state0, keys)

    out, _ = jax.lax.scan(lambda s, k: (one(s, k), None), state0, keys)
    return out, None


def rpy_mobility(x: Array, *, radius: float = 1.0,
                 eta: float = 1.0) -> Array:
    """Rotne-Prager-Yamakawa mobility tensor of a configuration
    ``x (..., N, 3)`` as ``(..., 3N, 3N)`` (units: ``1 / (6 pi eta
    a)`` sets the self-mobility).

    Pair blocks (``r = |x_i - x_j|``, ``e = r_vec / r``):

    - ``r >= 2a``:  ``mu0 (3a/4r) [(1 + 2a^2/3r^2) I
      + (1 - 2a^2/r^2) e e^T]``
    - ``r <  2a``:  ``mu0 [(1 - 9r/32a) I + (3r/32a) e e^T]``
      (the overlap regularization that keeps M positive SEMI-definite
      for every configuration — the property that makes the Cholesky
      in :func:`brownian_rpy` safe)
    - self: ``mu0 I``.

    Divergence-free in each particle block, so BD with RPY needs no
    ``kT div M`` drift correction.
    """
    x = jnp.asarray(x)
    n = x.shape[-2]
    if x.shape[-1] != 3:
        raise ValueError("RPY is a 3-D hydrodynamic tensor; got dim "
                         f"{x.shape[-1]}")
    mu0 = 1.0 / (6.0 * jnp.pi * eta * radius)
    rij = x[..., :, None, :] - x[..., None, :, :]      # (..., N, N, 3)
    r2 = jnp.sum(rij * rij, axis=-1)
    eye_n = jnp.eye(n, dtype=bool)
    r2_safe = jnp.where(eye_n, 1.0, jnp.maximum(r2, 1e-24))
    r = jnp.sqrt(r2_safe)
    e = rij / r[..., None]
    ee = e[..., :, None] * e[..., None, :]             # (..., N, N, 3, 3)
    i3 = jnp.eye(3, dtype=x.dtype)
    a = radius
    far_i = (3.0 * a / (4.0 * r)) * (1.0 + 2.0 * a * a / (3.0 * r2_safe))
    far_e = (3.0 * a / (4.0 * r)) * (1.0 - 2.0 * a * a / r2_safe)
    near_i = 1.0 - 9.0 * r / (32.0 * a)
    near_e = 3.0 * r / (32.0 * a)
    near = r < 2.0 * a
    ci = jnp.where(near, near_i, far_i)
    ce = jnp.where(near, near_e, far_e)
    blocks = ci[..., None, None] * i3 + ce[..., None, None] * ee
    blocks = jnp.where(eye_n[:, :, None, None],
                       jnp.broadcast_to(i3, blocks.shape), blocks)
    blocks = mu0 * blocks
    # (..., N, N, 3, 3) -> (..., 3N, 3N)
    m = jnp.swapaxes(blocks, -3, -2)
    return m.reshape(*x.shape[:-2], 3 * n, 3 * n)


def brownian_rpy(potential: Callable[[Array], Array], x0: Array,
                 key: Array, *, dt: float, n_steps: int, kT: float,
                 radius: float = 1.0, eta: float = 1.0,
                 collect_every: int = 0, jitter: float = 1e-7
                 ) -> Tuple[Array, Optional[Array]]:
    """Overdamped dynamics with RPY hydrodynamic interactions:

        ``x_{k+1} = x_k + M(x_k) F(x_k) dt
                    + sqrt(2 kT dt) chol(M(x_k)) xi_k``

    (Ermak & McCammon 1978; the RPY divergence term is identically
    zero).  ``x0``: ``(..., N, 3)``; the mobility build, the
    force product and the correlated noise are each one batched
    matmul / Cholesky per step.  ``jitter`` is added to the Cholesky
    diagonal (times ``mu0``) to absorb float32 roundoff in near-
    semi-definite overlap configurations.

    Returns ``(x_final, trajectory)``.  Euler-Maruyama in time
    (configuration-dependent mobility forbids the averaged-noise
    trick); choose ``dt`` against the stiffest force gradient as
    usual.
    """
    if collect_every and n_steps % collect_every != 0:
        raise ValueError("n_steps must be a multiple of collect_every")
    x0 = jnp.asarray(x0)
    n = x0.shape[-2]
    force = _force_fn(potential)
    dtj = jnp.asarray(dt, x0.dtype)
    mu0 = 1.0 / (6.0 * jnp.pi * eta * radius)
    eye = jnp.eye(3 * n, dtype=x0.dtype)

    def one(x, k):
        _, f = force(x)
        m = rpy_mobility(x, radius=radius, eta=eta)
        chol = jnp.linalg.cholesky(m + (jitter * mu0) * eye)
        fv = f.reshape(*f.shape[:-2], 3 * n)
        xi = jax.random.normal(k, fv.shape, x.dtype)
        drift = jnp.einsum("...ij,...j->...i", m, fv) * dtj
        kick = jnp.sqrt(2.0 * kT * dtj) * jnp.einsum(
            "...ij,...j->...i", chol, xi)
        return x + (drift + kick).reshape(x.shape)

    keys = jax.random.split(key, n_steps)
    if collect_every:
        keys = keys.reshape(n_steps // collect_every, collect_every,
                            *keys.shape[1:])

        def body(x, ks):
            x = jax.lax.scan(lambda x, k: (one(x, k), None), x, ks)[0]
            return x, x

        return jax.lax.scan(body, x0, keys)
    x, _ = jax.lax.scan(lambda x, k: (one(x, k), None), x0, keys)
    return x, None
