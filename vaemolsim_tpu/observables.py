"""Equilibrium / dynamical observables, computed on device.

Companions to :mod:`potentials` and :mod:`md` (beyond-reference: the
reference ships no analysis tooling): fixed-shape reductions over
``(..., n_atoms, dim)`` configurations and ``(T, ..., n_atoms, dim)``
trajectories, so they jit, vmap and shard like everything else —
histogramming is one ``bucketize`` + ``segment_sum`` per frame, no
host round trips.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

__all__ = ["radius_of_gyration", "pair_distance_histogram",
           "radial_distribution", "mean_squared_displacement",
           "velocity_autocorrelation", "virial_pressure",
           "structure_factor", "widom_insertion",
           "autocorrelation_fft", "diffusion_coefficient",
           "green_kubo_diffusion", "kabsch_align", "rmsd",
           "vibrational_spectrum", "normal_modes",
           "harmonic_free_energy", "quasi_harmonic_frequencies",
           "kinetic_stress", "pressure_tensor_diag",
           "green_kubo_viscosity", "surface_tension",
           "green_kubo_thermal_conductivity",
           "heat_capacity_nvt", "heat_capacity_npt",
           "isothermal_compressibility", "thermal_expansion",
           "dielectric_constant", "total_dipole"]


def radius_of_gyration(x: Array) -> Array:
    """``sqrt(mean_atoms |r - com|^2)`` per configuration (equal
    masses)."""
    com = jnp.mean(x, axis=-2, keepdims=True)
    return jnp.sqrt(jnp.mean(jnp.sum((x - com) ** 2, axis=-1), axis=-1))


def _pair_r(x: Array, box) -> Tuple[Array, Array]:
    n = x.shape[-2]
    mask = jnp.asarray(np.triu(np.ones((n, n), bool), k=1))
    d = x[..., :, None, :] - x[..., None, :, :]
    if box is not None:
        b = jnp.asarray(box, x.dtype)
        d = d - b * jnp.round(d / b)
    r = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 1e-12))
    return r, mask


def pair_distance_histogram(x: Array, *, r_max: float, n_bins: int = 100,
                            box: Optional[Sequence[float]] = None
                            ) -> Tuple[Array, Array]:
    """Probability density of pair distances over all configurations.

    Returns ``(r_centers, pdf)`` with ``pdf`` normalized so
    ``sum(pdf) * dr = 1`` over [0, r_max] (pairs beyond ``r_max`` are
    dropped from the normalization).  The gas-phase-friendly primitive
    :func:`radial_distribution` builds on.
    """
    x = jnp.asarray(x)
    r, mask = _pair_r(x, box)
    edges = jnp.linspace(0.0, r_max, n_bins + 1)
    idx = jnp.clip(jnp.searchsorted(edges, r, side="right") - 1,
                   0, n_bins - 1)
    in_range = mask & (r < r_max)
    counts = jnp.zeros(n_bins).at[idx.ravel()].add(
        in_range.astype(jnp.float32).ravel())
    dr = r_max / n_bins
    total = jnp.maximum(jnp.sum(counts), 1.0)
    centers = 0.5 * (edges[:-1] + edges[1:])
    return centers, counts / (total * dr)


def radial_distribution(x: Array, *, box: Sequence[float],
                        r_max: Optional[float] = None,
                        n_bins: int = 100) -> Tuple[Array, Array]:
    """g(r) for a homogeneous periodic system: pair counts normalized by
    the ideal-gas shell expectation at the system's density, averaged
    over all leading-axis configurations.  ``r_max`` defaults to half
    the smallest box length (the minimum-image validity bound); an
    ideal gas gives g(r) = 1 (pinned by test).  3-D only.
    """
    x = jnp.asarray(x)
    if x.shape[-1] != 3:
        raise ValueError("radial_distribution is defined for 3-D boxes")
    box_arr = np.asarray(box, np.float64)
    if r_max is None:
        r_max = float(box_arr.min() / 2.0)
    n = x.shape[-2]
    n_frames = int(np.prod(x.shape[:-2])) or 1

    r, mask = _pair_r(x, box)
    edges = jnp.linspace(0.0, float(r_max), n_bins + 1)
    idx = jnp.clip(jnp.searchsorted(edges, r, side="right") - 1,
                   0, n_bins - 1)
    in_range = mask & (r < r_max)
    counts = jnp.zeros(n_bins).at[idx.ravel()].add(
        in_range.astype(jnp.float32).ravel()) / n_frames

    vol = float(box_arr.prod())
    rho_pairs = n * (n - 1) / 2.0 / vol      # unique-pair density
    shell = (4.0 / 3.0) * jnp.pi * (edges[1:] ** 3 - edges[:-1] ** 3)
    centers = 0.5 * (edges[:-1] + edges[1:])
    return centers, counts / (rho_pairs * shell)


def mean_squared_displacement(traj: Array) -> Array:
    """``MSD(t) = <|x(t) - x(0)|^2>`` over atoms and replicas, from the
    trajectory origin (single-origin estimator; feed decorrelated
    segments for production statistics).  ``traj``:
    ``(T, ..., n_atoms, dim)`` of UNWRAPPED coordinates; returns (T,).
    """
    traj = jnp.asarray(traj)
    d = traj - traj[:1]
    return jnp.mean(jnp.sum(d * d, axis=-1),
                    axis=tuple(range(1, traj.ndim - 1)))


def velocity_autocorrelation(vtraj: Array, normalize: bool = True) -> Array:
    """``C(t) = <v(t) . v(0)>`` over atoms and replicas from the origin
    (normalized by C(0) when ``normalize``).  ``vtraj``:
    ``(T, ..., n_atoms, dim)``; returns (T,)."""
    vtraj = jnp.asarray(vtraj)
    c = jnp.mean(jnp.sum(vtraj * vtraj[:1], axis=-1),
                 axis=tuple(range(1, vtraj.ndim - 1)))
    if normalize:
        c = c / jnp.maximum(c[0], 1e-30)
    return c


def autocorrelation_fft(traj: Array) -> Array:
    """Multi-origin autocorrelation ``C(tau) = <a(t) . a(t+tau)>_t``
    averaged over ALL ``T - tau`` time origins, atoms, and replicas.

    ``traj``: ``(T, ..., n_atoms, dim)``; returns ``(T,)``.  Computed
    by zero-padded real FFTs over the time axis (O(T log T), one
    batched ``rfft``/``irfft`` pair — the Wiener-Khinchin route maps
    the whole estimator onto dense FFTs instead of a lag loop), then
    normalized per lag by its origin count.
    """
    traj = jnp.asarray(traj)
    t = traj.shape[0]
    # Collapse every non-time axis into one batch axis for the FFT.
    flat = traj.reshape(t, -1)
    n_fft = 2 * t
    f = jnp.fft.rfft(flat, n=n_fft, axis=0)
    corr = jnp.fft.irfft(f * jnp.conj(f), n=n_fft, axis=0)[:t]
    # Sum the dot product over components; average over atoms/replicas
    # = mean over flattened columns grouped by dim. Since the dot sums
    # dim and the mean divides by (n_atoms * replicas), together they
    # equal sum over all columns / (n_columns / dim).
    dim = traj.shape[-1]
    n_vectors = flat.shape[1] // dim
    counts = (t - jnp.arange(t)).astype(traj.dtype)
    return jnp.sum(corr, axis=1) / (counts * n_vectors)


def diffusion_coefficient(traj: Array, *, dt: float,
                          fit_start: float = 0.25,
                          fit_stop: float = 0.75
                          ) -> Tuple[Array, Array]:
    """Self-diffusion coefficient by the Einstein relation,
    ``MSD(t) -> 2 d D t``, from UNWRAPPED coordinates.

    The MSD is the multi-origin estimator computed in O(T log T): the
    cross term ``<x(t) . x(t+tau)>`` via :func:`autocorrelation_fft`
    and the square term ``<|x(t)|^2 + |x(t+tau)|^2>`` via prefix sums
    (the Kneller/nMoldyn decomposition ``MSD = S1 - 2 S2`` — no O(T^2)
    lag loop, no sequential recursion).  A least-squares line is fit
    over lag fractions ``[fit_start, fit_stop)`` of the trajectory
    (skipping the short-time ballistic regime and the noisy large-lag
    tail, where few origins remain).

    ``traj``: ``(T, ..., n_atoms, dim)``, frames ``dt`` apart.
    Returns ``(D, msd)`` with ``msd`` of shape ``(T,)``.
    """
    traj = jnp.asarray(traj)
    t, dim = traj.shape[0], traj.shape[-1]
    s2 = autocorrelation_fft(traj)
    # S1[m] = mean over origins of |x(t)|^2 + |x(t+m)|^2, via exclusive
    # prefix sums of the per-frame squared norms.
    d2 = jnp.mean(jnp.sum(traj * traj, axis=-1),
                  axis=tuple(range(1, traj.ndim - 1)))      # (T,)
    p = jnp.concatenate([jnp.zeros((1,), d2.dtype), jnp.cumsum(d2)])
    m = jnp.arange(t)
    counts = (t - m).astype(traj.dtype)
    s1 = (p[t - m] + p[t] - p[m]) / counts
    msd = s1 - 2.0 * s2

    lo = max(int(fit_start * t), 1)
    hi = max(int(fit_stop * t), lo + 2)
    mask = (m >= lo) & (m < hi)
    w = mask.astype(traj.dtype)
    times = m.astype(traj.dtype) * dt
    n = jnp.sum(w)
    tm = jnp.sum(w * times) / n
    ym = jnp.sum(w * msd) / n
    slope = (jnp.sum(w * (times - tm) * (msd - ym))
             / jnp.sum(w * (times - tm) ** 2))
    return slope / (2.0 * dim), msd


def green_kubo_diffusion(vtraj: Array, *, dt: float,
                         t_max: Optional[float] = None
                         ) -> Tuple[Array, Array]:
    """Self-diffusion by the Green-Kubo route,
    ``D = (1/d) integral_0^inf <v(0) . v(t)> dt``,

    with the multi-origin VACF from :func:`autocorrelation_fft` and a
    trapezoidal integral truncated at ``t_max`` (default: a quarter of
    the trajectory — the VACF tail beyond its decorrelation time adds
    only noise).  Cross-validates :func:`diffusion_coefficient`: the
    two estimators agree for any trajectory long vs the velocity
    correlation time (pinned on analytic Langevin dynamics in
    ``tests/test_observables.py``).

    ``vtraj``: velocities ``(T, ..., n_atoms, dim)``; returns
    ``(D, vacf)`` with the UNnormalized VACF of shape ``(T,)``.
    """
    vtraj = jnp.asarray(vtraj)
    t, dim = vtraj.shape[0], vtraj.shape[-1]
    vacf = autocorrelation_fft(vtraj)
    n_keep = t if t_max is None else min(int(round(t_max / dt)) + 1, t)
    if t_max is None:
        n_keep = max(t // 4, 2)
    kept = vacf[:n_keep]
    integral = dt * (jnp.sum(kept) - 0.5 * (kept[0] + kept[-1]))
    return integral / dim, vacf


def virial_pressure(potential_for_box, x: Array, *, box,
                    kt: float = 1.0) -> Array:
    """Instantaneous virial pressure of a periodic configuration,

        ``P = (N kT - (1/d) dU(s x; s L)/ds |_{s=1}) / V``,

    the scaled-coordinate form of the pair virial: one ``jax.jvp``
    through a uniform dilation of coordinates AND box equals
    ``sum_{i<j} r_ij . f_ij / d`` for any minimum-image pair potential
    — no second force loop, and it stays exact for whatever composite
    the user assembled (the standard NPT estimator; see Frenkel &
    Smit ch. 5).

    ``potential_for_box``: callable ``box_array -> energy_fn`` built
    from the :mod:`vaemolsim_tpu.potentials` periodic factories, whose
    ``box`` argument accepts traced arrays, e.g.
    ``lambda b: potentials.lennard_jones(box=b, cutoff=2.5)``.  Use the
    dense forms here — :func:`~vaemolsim_tpu.potentials.lennard_jones_cell`
    bakes its cell grid at trace time and cannot be dilated.  Keep the
    potential's ``shift=True`` (default): bare truncation adds an
    impulsive pressure term at the cutoff that this estimator (like any
    derivative-based one) cannot see.

    ``x``: ``(..., n_atoms, dim)`` (leading axes batch); ``box``:
    ``(dim,)`` edge lengths shared by the batch (vmap for per-sample
    boxes).  Returns pressure of shape ``(...,)`` in reduced units.
    """
    x = jnp.asarray(x)
    box_j = jnp.asarray(box, x.dtype)
    n, dim = x.shape[-2], x.shape[-1]
    vol = jnp.prod(box_j)

    def scaled_energy(s):
        return potential_for_box(s * box_j)(s * x)

    one = jnp.ones((), x.dtype)
    _, du_ds = jax.jvp(scaled_energy, (one,), (one,))
    return (n * kt - du_ds / dim) / vol


def kinetic_stress(v: Array, *, box, masses=1.0) -> Array:
    """Kinetic (ideal) part of the instantaneous pressure tensor,

        ``P^kin_ab = (1/V) sum_i m_i v_ia v_ib``,

    shape ``(..., dim, dim)`` from velocities ``(..., n_atoms, dim)``.
    ``trace(P^kin) = 2 KE / V`` exactly (pinned by test).  Add the
    configurational part (``energy.stress`` on the cell-list
    potentials, or :func:`pressure_tensor_diag` for diagonal-only) for
    the full instantaneous tensor that :func:`green_kubo_viscosity`
    and :func:`surface_tension` consume."""
    v = jnp.asarray(v)
    m = jnp.asarray(masses, v.dtype)
    if m.ndim == 1:
        m = m[:, None]
    vol = jnp.prod(jnp.asarray(box, v.dtype))
    mv = m * v
    return jnp.einsum("...na,...nb->...ab", mv, v) / vol


def pressure_tensor_diag(potential_for_box, x: Array, *, box,
                         v: Optional[Array] = None, masses=1.0,
                         kt: Optional[float] = None) -> Array:
    """Diagonal of the instantaneous pressure tensor by per-axis
    dilation,

        ``P_aa = (K_aa - dU(s.x; s.L)/ds_a |_{s=1}) / V``,

    the anisotropic generalization of :func:`virial_pressure` (whose
    value is exactly ``mean(P_diag)`` — pinned by test): one ``jax.jvp``
    per axis through an axis-wise scaling of coordinates AND box, exact
    for any minimum-image potential built from the box-parametric
    :mod:`vaemolsim_tpu.potentials` factories (including
    ``ewald_coulomb`` — use its ``reference_box``).  Kinetic part
    ``K_aa``: instantaneous ``sum_i m_i v_ia^2`` when ``v`` is given,
    else the ensemble value ``N kT`` on every axis (pass ``kt``).

    Off-diagonal (shear) components are NOT reachable this way — an
    orthorhombic ``(dim,)`` box cannot represent a sheared cell; use
    the analytic ``energy.stress`` of the cell-list potentials for the
    full tensor.  The diagonal is what interfacial workloads need:
    feed batches of slab configurations to :func:`surface_tension`.

    ``x``: ``(..., n_atoms, dim)``; returns ``(..., dim)``.
    """
    x = jnp.asarray(x)
    box_j = jnp.asarray(box, x.dtype)
    n, dim = x.shape[-2], x.shape[-1]
    vol = jnp.prod(box_j)

    def scaled_energy(s):
        return potential_for_box(s * box_j)(s * x)

    ones = jnp.ones((dim,), x.dtype)

    def du(axis):
        _, d = jax.jvp(scaled_energy, (ones,),
                       (jnp.zeros((dim,), x.dtype).at[axis].set(1.0),))
        return d

    du_diag = jnp.stack([du(a) for a in range(dim)], axis=-1)
    if v is not None:
        vv = jnp.asarray(v)
        m = jnp.asarray(masses, vv.dtype)
        if m.ndim == 1:
            m = m[:, None]
        kin = jnp.sum(m * vv * vv, axis=-2)          # (..., dim)
    else:
        if kt is None:
            raise ValueError("pass velocities v for the instantaneous "
                             "kinetic part, or kt for the ensemble "
                             "N kT value")
        kin = jnp.full((dim,), n * kt, x.dtype)
    return (kin - du_diag) / vol


# The five independent traceless symmetric components whose equal-time
# autocorrelations all integrate to the same shear viscosity in an
# isotropic fluid (Daivis & Evans 1994): P_xy, P_xz, P_yz,
# (P_xx - P_yy)/2, (P_yy - P_zz)/2.
def _shear_components(p: Array) -> Array:
    off = jnp.stack([p[..., 0, 1], p[..., 0, 2], p[..., 1, 2]], -1)
    diag = jnp.stack([0.5 * (p[..., 0, 0] - p[..., 1, 1]),
                      0.5 * (p[..., 1, 1] - p[..., 2, 2])], -1)
    return jnp.concatenate([off, diag], -1)


def green_kubo_viscosity(ptensor: Array, *, dt: float, volume: float,
                         kt: float, t_max: Optional[float] = None
                         ) -> Tuple[Array, Array]:
    """Shear viscosity by the Green-Kubo route,

        ``eta = (V / kT) integral_0^inf <P_ab(0) P_ab(t)> dt``,

    averaging the multi-origin autocorrelations of the FIVE independent
    traceless components (``P_xy, P_xz, P_yz, (P_xx - P_yy)/2,
    (P_yy - P_zz)/2`` — all equivalent in an isotropic fluid, so
    averaging them is a free 5x variance reduction) with the same
    FFT estimator and trapezoidal truncation as
    :func:`green_kubo_diffusion`.

    ``ptensor``: instantaneous pressure tensors ``(T, ..., dim, dim)``
    — kinetic (:func:`kinetic_stress`) PLUS configurational
    (``energy.stress`` of the cell-list potentials) — sampled every
    ``dt`` from equilibrium dynamics; leading extra axes are replicas.
    Subtracting the mean is NOT needed for the shear components (their
    equilibrium average vanishes; any residual sample mean is noise the
    truncation handles).  Returns ``(eta, sacf)`` with the averaged
    unnormalized shear-stress ACF of shape ``(T,)``.
    """
    p = jnp.asarray(ptensor)
    if p.shape[-1] != 3 or p.shape[-2] != 3:
        raise ValueError("green_kubo_viscosity expects 3-D pressure "
                         f"tensors (..., 3, 3); got {p.shape}")
    comps = _shear_components(p)                     # (T, ..., 5)
    t = comps.shape[0]
    # autocorrelation_fft treats the last axis as vector components and
    # SUMS their correlations; divide by 5 for the per-component mean.
    sacf = autocorrelation_fft(comps[..., None, :]) / comps.shape[-1]
    n_keep = t if t_max is None else min(int(round(t_max / dt)) + 1, t)
    if t_max is None:
        n_keep = max(t // 4, 2)
    kept = sacf[:n_keep]
    integral = dt * (jnp.sum(kept) - 0.5 * (kept[0] + kept[-1]))
    return volume / kt * integral, sacf


def green_kubo_thermal_conductivity(jflux: Array, *, dt: float,
                                    volume: float, kt: float,
                                    t_max: Optional[float] = None
                                    ) -> Tuple[Array, Array]:
    """Thermal conductivity by the Green-Kubo route,

        ``lambda = (V / (d kT^2)) integral_0^inf <J(0) . J(t)> dt``,

    from intensive heat-flux vectors ``(T, ..., dim)``
    (``energy.heat_flux`` of the cell-list potentials, sampled every
    ``dt`` from NVE dynamics at temperature ``kT``; leading extra axes
    are replicas) with the same multi-origin FFT estimator and
    trapezoidal truncation as :func:`green_kubo_diffusion`.

    Unlike the shear-stress components, the energy flux carries a
    systematic offset whenever the total momentum is not exactly zero
    (each atom then drags its large negative mean energy), so the
    sample mean IS subtracted per component before correlating.
    Returns ``(lambda, jacf)`` with the averaged unnormalized per-
    component flux ACF of shape ``(T,)``.
    """
    j = jnp.asarray(jflux)
    dim = j.shape[-1]
    t = j.shape[0]
    j = j - jnp.mean(j, axis=0, keepdims=True)
    # autocorrelation_fft sums the dot product over the last axis;
    # divide by dim for the per-component mean, multiply back in the
    # prefactor (the two cancel into 1/(kT^2) times the full dot ACF,
    # but keeping jacf per-component matches the viscosity API).
    jacf = autocorrelation_fft(j[..., None, :]) / dim
    n_keep = t if t_max is None else min(int(round(t_max / dt)) + 1, t)
    if t_max is None:
        n_keep = max(t // 4, 2)
    kept = jacf[:n_keep]
    integral = dt * (jnp.sum(kept) - 0.5 * (kept[0] + kept[-1]))
    return volume / (kt * kt) * integral, jacf


def surface_tension(ptensor_diag: Array, *, box,
                    normal_axis: int = 2) -> Array:
    """Kirkwood-Buff mechanical surface tension of a slab geometry,

        ``gamma = (L_n / 2) < P_nn - (P_t1 + P_t2) / 2 >``,

    from diagonal pressure tensors ``(..., dim)``
    (:func:`pressure_tensor_diag`, or the diagonal of full tensors) of
    configurations with TWO interfaces normal to ``normal_axis`` (the
    factor 1/2 shares the anisotropy between them; standard slab
    setup).  Bulk isotropic configurations give 0 within noise (pinned
    by test).  Averages over all leading axes; returns a scalar."""
    p = jnp.asarray(ptensor_diag)
    box_j = jnp.asarray(box, p.dtype)
    dim = p.shape[-1]
    tang = [a for a in range(dim) if a != normal_axis]
    anis = p[..., normal_axis] - sum(p[..., a] for a in tang) / len(tang)
    return 0.5 * box_j[normal_axis] * jnp.mean(anis)


def structure_factor(x: Array, *, box: Sequence[float],
                     k_max: float, n_bins: int = 40
                     ) -> Tuple[Array, Array]:
    """Static structure factor ``S(k) = <|sum_j exp(i k . r_j)|^2> / N``
    over the box's reciprocal-lattice modes with ``0 < |k| <= k_max``,
    averaged within ``n_bins`` equal |k| bins (and over all leading-axis
    configurations).

    Same TPU decomposition as the Ewald reciprocal sum
    (:func:`~vaemolsim_tpu.potentials.ewald_coulomb`): phases are one
    matmul, per-mode |S|^2 one cos/sin reduction, binning one
    ``searchsorted`` + segment sum.  An ideal gas gives S(k) = 1 and a
    crystal Bragg peaks at its lattice modes (both pinned by test).
    Returns ``(k_centers, S)`` of shape (n_bins,); empty bins are NaN.
    """
    x = jnp.asarray(x)
    n = x.shape[-2]
    box_np = np.asarray(box, np.float64)
    if box_np.shape != (3,):
        raise ValueError(f"box must be 3 lengths; got {box_np.shape}")
    n_max = np.maximum(np.ceil(k_max * box_np / (2 * np.pi)), 1).astype(int)
    axes = [np.arange(-m, m + 1) for m in n_max]
    nn = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)
    # Half space (S(-k) = conj(S(k)) contributes identically).
    half = ((nn[:, 0] > 0)
            | ((nn[:, 0] == 0) & (nn[:, 1] > 0))
            | ((nn[:, 0] == 0) & (nn[:, 1] == 0) & (nn[:, 2] > 0)))
    k_all = 2 * np.pi * nn[half] / box_np
    k_mag = np.sqrt((k_all ** 2).sum(-1))
    keep = k_mag <= k_max
    if not keep.any():
        raise ValueError(f"no reciprocal modes with |k| <= {k_max}; "
                         "increase k_max")
    k_modes = jnp.asarray(k_all[keep], jnp.float32)      # (n_k, 3)
    k_mag = k_mag[keep]

    phase = jnp.einsum("...nd,kd->...nk", x, k_modes)
    s2 = (jnp.sum(jnp.cos(phase), -2) ** 2
          + jnp.sum(jnp.sin(phase), -2) ** 2) / n        # (..., n_k)
    # Average over configurations, then bin by |k|.
    s2 = jnp.mean(s2.reshape(-1, s2.shape[-1]), axis=0)

    edges = np.linspace(0.0, float(k_max), n_bins + 1)
    idx = np.clip(np.searchsorted(edges, k_mag, side="right") - 1,
                  0, n_bins - 1)
    counts = np.bincount(idx, minlength=n_bins)
    sums = jnp.zeros(n_bins).at[jnp.asarray(idx)].add(s2)
    centers = jnp.asarray(0.5 * (edges[:-1] + edges[1:]), jnp.float32)
    s_binned = jnp.where(jnp.asarray(counts) > 0,
                         sums / jnp.maximum(jnp.asarray(counts, jnp.float32),
                                            1.0), jnp.nan)
    return centers, s_binned


def widom_insertion(potential, xs: Array, *, box, key: Array,
                    n_insertions: int = 16, kT: float = 1.0
                    ) -> Tuple[Array, Array]:
    """Widom test-particle estimate of the excess chemical potential.

    ``mu_ex = -kT ln < exp(-beta dU) >`` where ``dU`` is the energy of
    inserting a ghost particle at a uniform random position into an
    equilibrium configuration (Widom 1963; Frenkel & Smit ch. 7.2.1).
    The insertion energy is computed exactly as ``U([x; x_ghost]) -
    U(x)`` with the SAME potential used for sampling — the dense
    factories in :mod:`vaemolsim_tpu.potentials` build their pair masks
    from the call-time shape, so one closure serves both the n- and
    (n+1)-atom evaluations (note: potentials with per-atom (n,)
    parameter arrays are shape-bound; pass a scalar-parameter or
    insertion-aware potential for those).

    Parameters
    ----------
    potential : ``(..., n, d) -> (...)`` energy (reduced units).
    xs : ``(S, ..., n, d)`` equilibrium samples at temperature ``kT``.
    box : ``(d,)`` edge lengths ghost positions are drawn uniformly in.
    n_insertions : ghosts per configuration (all batched on device).

    Returns ``(mu_ex, stderr)`` in energy units (delta-method standard
    error via the log-space Zwanzig machinery of
    :func:`vaemolsim_tpu.mcmc.free_energy.exp_free_energy`).
    """
    from vaemolsim_tpu.mcmc.free_energy import exp_free_energy

    xs = jnp.asarray(xs)
    box_arr = jnp.asarray(box, xs.dtype)
    flat = xs.reshape((-1,) + xs.shape[-2:])             # (F, n, d)
    n_frames, _, dim = flat.shape
    ghosts = box_arr * jax.random.uniform(
        key, (n_insertions, n_frames, dim), xs.dtype)    # (M, F, d)
    u0 = potential(flat)                                 # (F,)

    def du_one(xg):
        aug = jnp.concatenate([flat, xg[:, None, :]], axis=-2)
        return potential(aug) - u0

    du = jax.vmap(du_one)(ghosts)                        # (M, F)
    beta_mu, stderr = exp_free_energy(du / kT)
    return kT * beta_mu, kT * stderr


def kabsch_align(x: Array, ref: Array, weights=None
                 ) -> Tuple[Array, Array, Array]:
    """Optimal (weighted) rigid superposition of ``x`` onto ``ref``
    (Kabsch 1976): returns ``(aligned, rotation, rmsd)``.

    ``x``: ``(..., n_atoms, dim)`` (any batch of structures), ``ref``:
    ``(n_atoms, dim)``; ``weights``: optional per-atom ``(n_atoms,)``
    (e.g. masses).  The rotation solves ``min_R ||w (x R^T - ref)||``
    after centering; reflections are excluded by the standard
    determinant sign correction, so the result is a proper rotation
    even for planar/degenerate structures.  One batched SVD of the
    (dim, dim) covariance — TPU-supported, differentiable."""
    x = jnp.asarray(x)
    ref = jnp.asarray(ref, x.dtype)
    n = x.shape[-2]
    w = (jnp.ones((n,), x.dtype) if weights is None
         else jnp.asarray(weights, x.dtype))
    w = w / jnp.sum(w)
    xc = x - jnp.sum(w[:, None] * x, axis=-2, keepdims=True)
    rc = ref - jnp.sum(w[:, None] * ref, axis=-2, keepdims=True)

    # Covariance H = x^T W ref, batched over leading axes.
    H = jnp.einsum("...ni,n,nj->...ij", xc, w, rc)
    U, _, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik",
                                    U, Vt))
    D = jnp.ones(x.shape[:-2] + (x.shape[-1],), x.dtype)
    D = D.at[..., -1].set(det)
    R = jnp.einsum("...ij,...j,...jk->...ki", U, D, Vt)
    aligned = jnp.einsum("...ni,...ji->...nj", xc, R) \
        + jnp.sum(w[:, None] * ref, axis=-2)[..., None, :]
    d2 = jnp.sum((aligned - ref) ** 2, axis=-1)
    rmsd_val = jnp.sqrt(jnp.sum(w * d2, axis=-1))
    return aligned, R, rmsd_val


def rmsd(x: Array, ref: Array, weights=None,
         superpose: bool = True) -> Array:
    """(Weighted) RMSD of ``x`` (``(..., n_atoms, dim)``) to ``ref``,
    after optimal rigid superposition unless ``superpose=False``."""
    if superpose:
        return kabsch_align(x, ref, weights)[2]
    x = jnp.asarray(x)
    ref = jnp.asarray(ref, x.dtype)
    n = x.shape[-2]
    w = (jnp.ones((n,), x.dtype) if weights is None
         else jnp.asarray(weights, x.dtype))
    w = w / jnp.sum(w)
    return jnp.sqrt(jnp.sum(w * jnp.sum((x - ref) ** 2, axis=-1),
                            axis=-1))


def vibrational_spectrum(vtraj: Array, *, dt: float
                         ) -> Tuple[Array, Array]:
    """Vibrational density of states: the one-sided power spectrum of
    the multi-origin VACF (Wiener-Khinchin — computed directly as the
    velocity periodogram, one batched real FFT).

    ``vtraj``: ``(T, ..., n_atoms, dim)`` velocities sampled every
    ``dt``; returns ``(freqs, spectrum)`` of length ``T//2 + 1``, with
    ``freqs`` in cycles per unit time (a mode of angular frequency
    omega peaks at ``omega / 2 pi``).  Normalization: the one-sided
    periodogram density per atom, so summing ``spectrum * df`` (with
    ``df = 1/(T dt)``) recovers ``<|v|^2>`` up to the one-sided
    half-power convention (DC and Nyquist undoubled)."""
    vtraj = jnp.asarray(vtraj)
    t = vtraj.shape[0]
    flat = vtraj.reshape(t, -1)
    f = jnp.fft.rfft(flat, axis=0)
    power = jnp.sum(jnp.abs(f) ** 2, axis=1)
    dim = vtraj.shape[-1]
    n_vectors = flat.shape[1] // dim
    spec = power * (dt / (t * n_vectors))
    freqs = jnp.fft.rfftfreq(t, d=dt)
    return freqs, spec


def _mass_vector(masses, n_atoms: int, dim: int) -> Array:
    m = jnp.asarray(masses, jnp.float32)
    if m.ndim == 0:
        m = jnp.full((n_atoms,), m)
    return jnp.repeat(m, dim)                       # (n_atoms * dim,)


def normal_modes(potential, x: Array, *, masses=1.0
                 ) -> Tuple[Array, Array]:
    """Mass-weighted normal-mode analysis at a configuration ``x``
    ``(n_atoms, dim)`` (a minimum or saddle from
    :func:`potentials.minimize_energy` / :func:`paths.climbing_neb`).

    Diagonalizes ``M^{-1/2} H M^{-1/2}`` with ``H`` the full Cartesian
    Hessian of ``potential`` (one ``jax.hessian`` — forward-over-
    reverse, no finite differences) and returns ``(omega, modes)``:
    ``omega (n_atoms*dim,)`` ascending angular frequencies, SIGNED as
    ``sign(lambda) sqrt(|lambda|)`` so saddle points show up as
    negative entries (imaginary modes) instead of silent NaNs, and
    ``modes (n_atoms*dim, n_modes)`` the corresponding CARTESIAN
    displacement directions (columns; mass-weighted-orthonormal, i.e.
    ``v_i^T M v_j = delta_ij``).  Rigid-body translations (and
    rotations of nonperiodic clusters) appear as ``omega ~ 0``.

    ``potential`` follows the framework contract (``(n_atoms, dim) ->
    scalar``); ``masses``: scalar or ``(n_atoms,)``.
    """
    x = jnp.asarray(x)
    n, d = x.shape
    mvec = _mass_vector(masses, n, d)

    def u_flat(xf):
        return jnp.reshape(potential(xf.reshape(n, d)), ())

    h = jax.hessian(u_flat)(x.reshape(-1))          # (nd, nd)
    inv_sqrt_m = 1.0 / jnp.sqrt(mvec)
    h_mw = h * inv_sqrt_m[:, None] * inv_sqrt_m[None, :]
    lam, v = jnp.linalg.eigh(0.5 * (h_mw + h_mw.T))
    omega = jnp.sign(lam) * jnp.sqrt(jnp.abs(lam))
    modes = inv_sqrt_m[:, None] * v                 # back to Cartesian
    return omega, modes


def harmonic_free_energy(omega: Array, *, kt: float, hbar: float = 1.0,
                         zero_tol: float = 1e-4) -> Array:
    """Classical harmonic (vibrational) free energy at a minimum:

        ``A = kT sum_i ln(hbar omega_i / kT)``

    over the modes with ``omega_i > zero_tol`` — each harmonic mode
    contributes a full phase-space partition function ``kT/(hbar
    omega)`` (configurational Gaussian x Maxwell momentum, divided by
    ``2 pi hbar``; pinned against that quadrature identity by test).
    Rigid-body zero modes are excluded by the tolerance; NEGATIVE
    entries beyond it (imaginary modes — ``x`` was a saddle) poison the
    result with NaN rather than silently contributing.  ``hbar`` sets
    the phase-space measure in the caller's unit system (reduced units:
    leave at 1; the CHOICE shifts A by a constant and cancels in free
    energy differences)."""
    omega = jnp.asarray(omega)
    real = omega > zero_tol
    bad = omega < -zero_tol
    term = jnp.where(real, jnp.log(hbar * jnp.abs(omega) / kt), 0.0)
    a = kt * jnp.sum(term)
    return jnp.where(jnp.any(bad), jnp.nan, a)


def quasi_harmonic_frequencies(traj: Array, *, kt: float, masses=1.0
                               ) -> Array:
    """Quasi-harmonic effective frequencies from equilibrium
    FLUCTUATIONS (Karplus & Kushick 1981): diagonalize the
    mass-weighted covariance ``C = M^{1/2} cov(x) M^{1/2}`` of a
    trajectory ``(T, n_atoms, dim)`` and invert equipartition per mode,

        ``omega_i = sqrt(kT / lambda_i)``,

    the sampling-based complement of :func:`normal_modes` (exactly the
    Hessian frequencies for a harmonic well, softened by anharmonicity
    in general; feed the frequencies to :func:`harmonic_free_energy`
    for the quasi-harmonic entropy/free-energy estimate).  Align the
    trajectory first (:func:`kabsch_align`) for nonperiodic clusters,
    or the rigid-body drift shows up as spurious soft modes.  Returns
    ``(n_atoms*dim,)`` DESCENDING frequencies — stiffest first, so a
    rank-deficient covariance (fewer frames than DOFs, removed
    rigid-body motion) puts its spurious ``inf`` frequencies at the
    FRONT: drop ``omega[:k]`` for ``k`` null directions, not the tail
    (the tail holds the softest REAL modes)."""
    traj = jnp.asarray(traj)
    t = traj.shape[0]
    n, d = traj.shape[-2], traj.shape[-1]
    flat = traj.reshape(t, n * d)
    flat = flat - jnp.mean(flat, axis=0)
    cov = flat.T @ flat / t
    mvec = _mass_vector(masses, n, d)
    sqrt_m = jnp.sqrt(mvec)
    c_mw = cov * sqrt_m[:, None] * sqrt_m[None, :]
    lam = jnp.linalg.eigvalsh(0.5 * (c_mw + c_mw.T))  # ascending
    # Rank tolerance: float32 eigvalsh renders exact null directions as
    # tiny POSITIVE eigenvalues (huge-but-finite garbage frequencies);
    # clip them to 0 so null modes come out as exactly inf, up front,
    # as documented.
    tol = lam[-1] * lam.shape[0] * jnp.finfo(lam.dtype).eps
    lam = jnp.where(lam <= jnp.maximum(tol, 0.0), 0.0, lam)
    return jnp.sqrt(kt / lam)

def _flat_samples(*arrs) -> Tuple[Array, ...]:
    """Broadcast scalar time series against each other and flatten all
    leading axes into one sample axis (time plus any replica axes)."""
    arrs = [jnp.asarray(a) for a in arrs]
    arrs = jnp.broadcast_arrays(*arrs) if len(arrs) > 1 else arrs
    return tuple(a.reshape(-1) for a in arrs)


def heat_capacity_nvt(u: Array, *, kt: float,
                      n_dof_kinetic: int = 0) -> Array:
    """Canonical heat capacity from energy fluctuations,

        ``C_V / k_B = Var(U) / (kT)^2 + n_dof_kinetic / 2``,

    for sampled energies ``u`` of any shape (time plus replica axes,
    all treated as samples).  Pass TOTAL energies from MD with
    ``n_dof_kinetic=0``, or POTENTIAL energies (e.g. from the MC
    engines, which never materialize momenta) with the number of
    momentum DOFs so the exactly-known ideal kinetic part is added
    analytically — kinetic-potential cross fluctuations vanish in the
    canonical ensemble, so the split is exact.  Returns the EXTENSIVE
    heat capacity in units of ``k_B`` (cross-check: the ``order=2``
    coefficient of :func:`~vaemolsim_tpu.extrapolation.\
beta_extrapolation_coefficients` applied to ``u`` is
    ``d<U>/dbeta = -Var(U)``)."""
    (u,) = _flat_samples(u)
    return jnp.var(u) / (kt * kt) + 0.5 * n_dof_kinetic


def heat_capacity_npt(u: Array, volume: Array, *, kt: float,
                      pressure: float, n_dof_kinetic: int = 0) -> Array:
    """Isobaric heat capacity from enthalpy fluctuations in NPT,

        ``C_P / k_B = Var(U + P V) / (kT)^2 + n_dof_kinetic / 2``,

    with ``u``/``volume`` sampled configurational energies and volumes
    (e.g. :func:`~vaemolsim_tpu.mcmc.npt.run_npt` chains or
    :func:`~vaemolsim_tpu.md.baoab_npt`), broadcast against each other.
    Same kinetic-part convention as :func:`heat_capacity_nvt`."""
    u, v = _flat_samples(u, volume)
    return (jnp.var(u + pressure * v) / (kt * kt)
            + 0.5 * n_dof_kinetic)


def isothermal_compressibility(volume: Array, *, kt: float) -> Array:
    """``kappa_T = Var(V) / (kT <V>)`` from NPT volume fluctuations
    (exactly ``1/P`` for the ideal gas — pinned by test against the
    closed-form Gamma volume law of the NPT engine)."""
    (v,) = _flat_samples(volume)
    return jnp.var(v) / (kt * jnp.mean(v))


def thermal_expansion(u: Array, volume: Array, *, kt: float,
                      pressure: float) -> Array:
    """Isobaric thermal expansion coefficient from NPT cross
    fluctuations,

        ``alpha_P = Cov(V, U + P V) / (kT^2 <V>)``

    (in units where ``k_B = 1`` so temperature is ``kt``; exactly
    ``1/T`` for the ideal gas).  The kinetic energy is uncorrelated
    with ``V`` in the canonical NPT ensemble, so configurational ``u``
    needs no kinetic correction here."""
    u, v = _flat_samples(u, volume)
    h = u + pressure * v
    cov = jnp.mean((v - jnp.mean(v)) * (h - jnp.mean(h)))
    return cov / (kt * kt * jnp.mean(v))


def total_dipole(x: Array, charges: Array) -> Array:
    """``M = sum_i q_i r_i`` per configuration ``(..., n_atoms, dim)``
    -> ``(..., dim)``.  Use UNWRAPPED or molecule-contiguous
    coordinates: wrapping an atom of a charged site across the box
    jumps ``M`` by ``q L`` (the itinerant-polarization branch), which
    poisons the fluctuation estimator of :func:`dielectric_constant`.
    Neutral rigid molecules whose atoms are kept whole are safe."""
    q = jnp.asarray(charges)
    return jnp.sum(q[..., :, None] * jnp.asarray(x), axis=-2)


def dielectric_constant(m_traj: Array, *, volume: float,
                        kt: float) -> Array:
    """Static dielectric constant from total-dipole fluctuations under
    tinfoil (conducting) boundary conditions,

        ``eps = 1 + 4 pi (<M^2> - <M>^2) / (3 V kT)``,

    matching this package's Gaussian-units Ewald convention
    (:func:`~vaemolsim_tpu.potentials.ewald_coulomb`, Coulomb constant
    ``= 1``, where the standard tinfoil k=0 treatment is implicit in
    dropping the surface term).  ``m_traj`` is ``(T, ..., dim)`` total
    dipoles from :func:`total_dipole`; all leading axes are samples."""
    m = jnp.asarray(m_traj)
    dim = m.shape[-1]
    m = m.reshape(-1, dim)
    dm = m - jnp.mean(m, axis=0)
    fluct = jnp.mean(jnp.sum(dm * dm, axis=-1))
    return 1.0 + 4.0 * jnp.pi * fluct / (3.0 * volume * kt)
