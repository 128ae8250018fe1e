"""On-device observables against analytic results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu import observables, potentials
from vaemolsim_tpu.observables import (mean_squared_displacement,
                                       pair_distance_histogram,
                                       radial_distribution,
                                       radius_of_gyration,
                                       velocity_autocorrelation)


class TestStructure:

    def test_rg_hand_computed(self):
        # Two atoms 2 apart: each 1 from the COM -> Rg = 1.
        x = jnp.asarray([[0.0, 0, 0], [2.0, 0, 0]])
        np.testing.assert_allclose(float(radius_of_gyration(x)), 1.0,
                                   rtol=1e-6)
        xb = jnp.stack([x, 2.0 * x])
        np.testing.assert_allclose(np.asarray(radius_of_gyration(xb)),
                                   [1.0, 2.0], rtol=1e-6)

    def test_pair_histogram_normalized_and_peaked(self):
        # Rigid dimer at r=1 in every frame: pdf concentrates in one bin
        # and integrates to 1.
        x = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0]])[None].repeat(32, 0)
        r, pdf = pair_distance_histogram(x, r_max=2.0, n_bins=40)
        dr = 2.0 / 40
        np.testing.assert_allclose(float(jnp.sum(pdf) * dr), 1.0,
                                   rtol=1e-5)
        assert float(r[int(jnp.argmax(pdf))]) == pytest.approx(1.0,
                                                               abs=dr)

    def test_ideal_gas_rdf_is_one(self):
        """Uniform random points in a periodic box: g(r) = 1 at every r
        (the normalization's defining property)."""
        box = [8.0, 8.0, 8.0]
        x = jax.random.uniform(jax.random.PRNGKey(0), (64, 64, 3)) * 8.0
        r, g = radial_distribution(x, box=box, n_bins=30)
        # Skip the first bins (few pairs, noisy).
        np.testing.assert_allclose(np.asarray(g[5:]), 1.0, atol=0.1)

    def test_rdf_rejects_2d(self):
        with pytest.raises(ValueError, match="3-D"):
            radial_distribution(jnp.zeros((4, 2)), box=[1.0, 1.0])

    def test_lj_solid_rdf_first_peak(self):
        """An fcc-like LJ arrangement peaks near r = 2^(1/6)."""
        from vaemolsim_tpu.md import baoab
        from vaemolsim_tpu.potentials import lennard_jones

        # 3x3x3 cubic lattice at the LJ minimum spacing, periodic.
        a = 2.0 ** (1.0 / 6.0)
        g0 = jnp.stack(jnp.meshgrid(*[jnp.arange(3.0)] * 3,
                                    indexing="ij"), -1).reshape(-1, 3) * a
        box = [3 * a] * 3
        pot = lennard_jones(box=box, cutoff=1.6)
        st, traj = baoab(pot, g0[None].repeat(8, 0),
                         jnp.zeros((8, 27, 3)), jax.random.PRNGKey(1),
                         dt=0.004, n_steps=500, friction=2.0, kT=0.1,
                         collect_every=100)
        r, g = radial_distribution(traj.reshape(-1, 27, 3), box=box,
                                   n_bins=40)
        peak_r = float(r[int(jnp.argmax(g))])
        assert abs(peak_r - a) < 0.15, peak_r
        assert float(jnp.max(g)) > 2.0  # strongly structured


class TestDynamics:

    def test_ballistic_msd_quadratic(self):
        """Free particles: x(t) = x0 + v t => MSD(t) = <|v|^2> t^2."""
        key = jax.random.PRNGKey(0)
        v = jax.random.normal(key, (16, 5, 3))
        t = jnp.arange(20.0)[:, None, None, None] * 0.1
        traj = jnp.zeros((16, 5, 3)) + v * t
        msd = np.asarray(mean_squared_displacement(traj))
        v2 = float(jnp.mean(jnp.sum(v * v, -1)))
        np.testing.assert_allclose(msd, v2 * np.asarray(t[:, 0, 0, 0]) ** 2,
                                   rtol=1e-5)

    def test_langevin_msd_diffusive_tail(self):
        """Overdamped Langevin free particle: MSD(t) -> 2 d D t with
        D = kT / (m gamma)."""
        from vaemolsim_tpu.md import baoab

        kT, gamma = 1.0, 5.0
        pot = lambda x: jnp.zeros(x.shape[:-2])  # noqa: E731
        x0 = jnp.zeros((4096, 1, 3))
        st, traj = baoab(pot, x0, jnp.zeros_like(x0), jax.random.PRNGKey(2),
                         dt=0.01, n_steps=4000, friction=gamma, kT=kT,
                         collect_every=200)
        msd = np.asarray(mean_squared_displacement(traj))
        times = 0.01 * 200 * (np.arange(len(msd)))
        d_coef = kT / gamma
        # Fit the slope over the diffusive tail.
        slope = np.polyfit(times[5:], msd[5:], 1)[0]
        np.testing.assert_allclose(slope, 6.0 * d_coef, rtol=0.1)

    def test_vacf_free_particles_constant(self):
        v = jax.random.normal(jax.random.PRNGKey(1), (8, 3, 3))
        vtraj = jnp.broadcast_to(v, (10, 8, 3, 3))
        c = np.asarray(velocity_autocorrelation(vtraj))
        np.testing.assert_allclose(c, 1.0, rtol=1e-6)
        c_raw = np.asarray(velocity_autocorrelation(vtraj,
                                                    normalize=False))
        np.testing.assert_allclose(
            c_raw, float(jnp.mean(jnp.sum(v * v, -1))), rtol=1e-5)


class TestStructureFactor:

    def test_ideal_gas_is_one(self):
        from vaemolsim_tpu.observables import structure_factor
        x = jax.random.uniform(jax.random.PRNGKey(0), (64, 100, 3)) * 8.0
        k, s = structure_factor(x, box=[8.0] * 3, k_max=6.0)
        vals = np.asarray(s)
        vals = vals[np.isfinite(vals)]
        np.testing.assert_allclose(vals.mean(), 1.0, atol=0.15)

    def test_crystal_bragg_peak(self):
        """Simple-cubic lattice: S spikes to ~N at k = 2 pi / a."""
        from vaemolsim_tpu.observables import structure_factor
        a, m = 2.0, 4
        g = np.stack(np.meshgrid(*[np.arange(m)] * 3, indexing="ij"),
                     -1).reshape(-1, 3) * a
        n = g.shape[0]
        k, s = structure_factor(jnp.asarray(g, jnp.float32),
                                box=[m * a] * 3, k_max=4.0, n_bins=40)
        s = np.asarray(s)
        k = np.asarray(k)
        bragg = 2 * np.pi / a                    # ~3.1416
        peak_bin = np.nanargmax(s)
        assert abs(k[peak_bin] - bragg) < 0.2
        assert s[peak_bin] > 0.5 * n             # near-perfect coherence

    def test_validation(self):
        from vaemolsim_tpu.observables import structure_factor
        with pytest.raises(ValueError, match="k_max"):
            structure_factor(jnp.zeros((4, 3)), box=[100.0] * 3,
                             k_max=0.01)


class TestTailCorrection:

    def test_matches_numeric_integral(self):
        from vaemolsim_tpu.potentials import lennard_jones_tail
        import scipy.integrate as si
        n, L, rc, sig, eps = 50, 8.0, 2.5, 1.1, 0.8
        u = lennard_jones_tail(sig, eps, box=[L] * 3, cutoff=rc)
        got = float(u(jnp.zeros((n, 3))))
        integrand = lambda r: 4 * np.pi * r * r * 4 * eps * (
            (sig / r) ** 12 - (sig / r) ** 6)
        integral, _ = si.quad(integrand, rc, np.inf)
        want = 0.5 * n * (n / L ** 3) * integral
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_npt_and_virial_composition(self):
        """Box-parametric: composes into NPT factories and the virial
        dilation picks up the pressure tail (dU/ds through V)."""
        from vaemolsim_tpu import observables
        from vaemolsim_tpu.potentials import (composite, lennard_jones,
                                              lennard_jones_tail)
        fac = lambda b: composite(
            lennard_jones(box=b, cutoff=2.5),
            lennard_jones_tail(box=b, cutoff=2.5))
        x = jax.random.uniform(jax.random.PRNGKey(1), (40, 3)) * 8.0
        box = jnp.asarray([8.0] * 3)
        p = float(observables.virial_pressure(fac, x, box=box))
        h = 1e-3
        us = lambda s: float(fac(s * box)(s * x))
        du_fd = (us(1.0 + h) - us(1.0 - h)) / (2 * h)
        p_fd = (40 - du_fd / 3.0) / float(jnp.prod(box))
        np.testing.assert_allclose(p, p_fd, rtol=5e-3, atol=1e-4)


class TestWidomInsertion:
    """Widom test-particle chemical potential: exact ideal-gas zero, and
    quadrature-exact dilute-LJ value (low-density closed form)."""

    def test_ideal_gas_zero(self):
        from vaemolsim_tpu.observables import widom_insertion
        pot = lambda x: jnp.zeros(x.shape[:-2], x.dtype)  # noqa: E731
        xs = jax.random.uniform(jax.random.PRNGKey(0), (10, 4, 5, 3)) * 4.0
        mu, err = widom_insertion(pot, xs, box=[4.0] * 3,
                                  key=jax.random.PRNGKey(1),
                                  n_insertions=8)
        assert float(mu) == 0.0
        assert float(err) == 0.0

    def test_dilute_lj_matches_quadrature(self):
        """Uniform (ideal) configurations are the exact low-density
        ensemble; there <exp(-beta dU)> = (1 - c/V)^N with
        c = int (1 - exp(-beta u(r))) d^3r over the truncated-shifted
        LJ — pinned against numpy quadrature within the estimator's own
        reported stderr."""
        from vaemolsim_tpu.observables import widom_insertion
        from vaemolsim_tpu.potentials import lennard_jones
        n_atoms, box_l, cutoff, kt = 16, 8.0, 2.5, 1.0
        pot = lennard_jones(box=[box_l] * 3, cutoff=cutoff)
        xs = jax.random.uniform(jax.random.PRNGKey(2),
                                (64, n_atoms, 3)) * box_l
        mu, err = jax.jit(lambda xs, k: widom_insertion(
            pot, xs, box=[box_l] * 3, key=k, n_insertions=128, kT=kt))(
                xs, jax.random.PRNGKey(3))

        r = np.linspace(1e-4, cutoff, 200_000)
        u_c = 4.0 * (cutoff ** -12 - cutoff ** -6)
        u = 4.0 * (r ** -12.0 - r ** -6.0) - u_c
        c = np.trapezoid((1.0 - np.exp(-np.clip(u, None, 60.0) / kt))
                         * 4.0 * np.pi * r ** 2, r)
        mu_exact = -kt * n_atoms * np.log(1.0 - c / box_l ** 3)
        assert mu_exact < 0.0  # attraction dominates at this cutoff
        assert float(err) < 0.1 * abs(mu_exact)
        assert abs(float(mu) - mu_exact) < 4.0 * float(err) + 0.01


class TestTransport:
    """Multi-origin correlation estimators and the two diffusion
    routes (Einstein MSD slope, Green-Kubo VACF integral), pinned on
    exactly-known stochastic processes."""

    def test_autocorrelation_fft_matches_direct(self):
        """The FFT estimator equals the O(T^2) definition exactly."""
        from vaemolsim_tpu.observables import autocorrelation_fft
        rng = np.random.default_rng(0)
        v = rng.standard_normal((37, 3, 5, 2)).astype(np.float32)
        got = np.asarray(autocorrelation_fft(jnp.asarray(v)))
        want = np.array([
            np.mean(np.sum(v[:37 - m] * v[m:], axis=-1))
            for m in range(37)
        ])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_vacf_exponential_ou(self):
        """Discrete OU velocities: C(m)/C(0) = c1^m, C(0) = d kT."""
        from vaemolsim_tpu.observables import autocorrelation_fft
        kT, gamma, dt, T = 1.2, 2.0, 0.02, 4000
        c1 = np.exp(-gamma * dt)
        rng = np.random.default_rng(1)
        v = np.zeros((T, 64, 4, 3), np.float64)
        v[0] = np.sqrt(kT) * rng.standard_normal(v.shape[1:])
        sig = np.sqrt(kT * (1.0 - c1 * c1))
        for t in range(1, T):
            v[t] = c1 * v[t - 1] + sig * rng.standard_normal(v.shape[1:])
        vacf = np.asarray(autocorrelation_fft(jnp.asarray(v, jnp.float32)))
        assert abs(vacf[0] - 3 * kT) < 0.05 * 3 * kT
        np.testing.assert_allclose(vacf[1:20] / vacf[0],
                                   c1 ** np.arange(1, 20), atol=0.02)

    def test_diffusion_langevin_both_routes(self):
        """Free Langevin particle: D = kT / (m gamma).  The Einstein
        fit on real BAOAB output and the Green-Kubo integral on exact
        OU velocities both recover it."""
        from vaemolsim_tpu.md import baoab
        from vaemolsim_tpu.observables import (diffusion_coefficient,
                                               green_kubo_diffusion)
        kT, gamma, dt = 1.2, 2.0, 0.02
        pot = lambda x: jnp.zeros(x.shape[:-2])
        x0 = jnp.zeros((256, 8, 3))
        v0 = jnp.sqrt(kT) * jax.random.normal(jax.random.PRNGKey(0),
                                              x0.shape)
        _, traj = baoab(pot, x0, v0, jax.random.PRNGKey(1), dt=dt,
                        n_steps=8000, friction=gamma, kT=kT,
                        collect_every=4)
        d_true = kT / gamma
        d_msd, msd = diffusion_coefficient(traj, dt=4 * dt)
        assert abs(float(d_msd) - d_true) < 0.05 * d_true
        assert msd.shape == (2000,) and float(msd[0]) < 1e-5

        c1 = np.exp(-gamma * dt)
        rng = np.random.default_rng(2)
        v = np.zeros((4000, 64, 4, 3), np.float64)
        v[0] = np.sqrt(kT) * rng.standard_normal(v.shape[1:])
        sig = np.sqrt(kT * (1.0 - c1 * c1))
        for t in range(1, 4000):
            v[t] = c1 * v[t - 1] + sig * rng.standard_normal(v.shape[1:])
        d_gk, vacf = green_kubo_diffusion(jnp.asarray(v, jnp.float32),
                                          dt=dt, t_max=6.0 / gamma)
        assert abs(float(d_gk) - d_true) < 0.05 * d_true
        assert vacf.shape == (4000,)

    def test_msd_ballistic(self):
        """Free flight x = v t: multi-origin MSD is exactly
        <|v|^2> t^2 at every lag (all origins identical)."""
        from vaemolsim_tpu.observables import diffusion_coefficient
        rng = np.random.default_rng(3)
        v = rng.standard_normal((16, 2, 3)).astype(np.float32)
        ts = np.arange(64, dtype=np.float32)
        traj = jnp.asarray(ts[:, None, None, None] * v[None])
        _, msd = diffusion_coefficient(traj, dt=1.0)
        want = np.mean(np.sum(v * v, axis=-1)) * ts ** 2
        np.testing.assert_allclose(np.asarray(msd), want, rtol=2e-3,
                                   atol=1e-3)


class TestKabsch:

    @staticmethod
    def _random_rotation(key):
        import jax
        q = jax.random.normal(key, (4,))
        q = q / jnp.linalg.norm(q)
        w, x, y, z = q
        return jnp.array([
            [1 - 2*(y*y + z*z), 2*(x*y - z*w), 2*(x*z + y*w)],
            [2*(x*y + z*w), 1 - 2*(x*x + z*z), 2*(y*z - x*w)],
            [2*(x*z - y*w), 2*(y*z + x*w), 1 - 2*(x*x + y*y)]])

    def test_recovers_rotation_exactly(self):
        import jax
        ref = jax.random.normal(jax.random.PRNGKey(0), (12, 3))
        R_true = self._random_rotation(jax.random.PRNGKey(1))
        x = ref @ R_true.T + jnp.array([1.0, -2.0, 0.5])
        aligned, R, r = observables.kabsch_align(x, ref)
        assert float(r) < 1e-5
        np.testing.assert_allclose(np.asarray(aligned), np.asarray(ref),
                                   atol=1e-5)
        # recovered rotation undoes R_true
        np.testing.assert_allclose(np.asarray(R @ R_true),
                                   np.eye(3), atol=1e-5)

    def test_batched_structures(self):
        import jax
        ref = jax.random.normal(jax.random.PRNGKey(2), (8, 3))
        Rs = jnp.stack([self._random_rotation(jax.random.PRNGKey(i))
                        for i in (3, 4, 5)])
        xs = jnp.einsum("ni,bji->bnj", ref, Rs) + 2.0
        _, _, r = observables.kabsch_align(xs, ref)
        assert r.shape == (3,)
        assert float(jnp.max(r)) < 1e-5

    def test_reflection_not_allowed(self):
        import jax
        # A chiral structure mirrored: proper rotations cannot reach it,
        # so RMSD stays large even though an improper transform would
        # give zero.
        ref = jax.random.normal(jax.random.PRNGKey(6), (10, 3))
        mirrored = ref * jnp.array([1.0, 1.0, -1.0])
        _, R, r = observables.kabsch_align(mirrored, ref)
        np.testing.assert_allclose(float(jnp.linalg.det(R)), 1.0,
                                   atol=1e-5)
        assert float(r) > 0.1

    def test_weighted_rmsd_matches_manual(self):
        import jax
        ref = jax.random.normal(jax.random.PRNGKey(7), (6, 3))
        x = ref + 0.1 * jax.random.normal(jax.random.PRNGKey(8), (6, 3))
        w = jnp.array([1.0, 2.0, 1.0, 3.0, 1.0, 1.0])
        r_nosup = observables.rmsd(x, ref, weights=w, superpose=False)
        manual = np.sqrt(np.average(
            np.sum((np.asarray(x) - np.asarray(ref)) ** 2, -1),
            weights=np.asarray(w)))
        np.testing.assert_allclose(float(r_nosup), manual, rtol=1e-5)
        # superposed rmsd can only be smaller
        assert float(observables.rmsd(x, ref, weights=w)) <= \
            float(r_nosup) + 1e-7


class TestVibrationalSpectrum:

    def test_harmonic_frequency_peak(self):
        import jax
        from vaemolsim_tpu import md
        omega = 3.0

        def pot(x):
            return 0.5 * omega ** 2 * jnp.sum(x[..., 0, :] ** 2, -1)

        x0 = jnp.ones((16, 1, 1))
        v0 = jnp.zeros_like(x0)
        dt = 0.02
        T = 4096
        # NVE: sharp line at omega / 2 pi
        state, _ = md.velocity_verlet(pot, x0, v0, dt=dt, n_steps=1)
        # collect velocities by scanning verlet manually
        def step(s, _):
            s2, _ = md.velocity_verlet(pot, s[0], s[1], dt=dt, n_steps=1)
            return (s2.x, s2.v), s2.v

        (_, _), vtraj = jax.lax.scan(step, (x0, v0 + 1.0), None, length=T)
        freqs, spec = observables.vibrational_spectrum(vtraj, dt=dt)
        peak = float(freqs[int(jnp.argmax(spec[1:])) + 1])
        np.testing.assert_allclose(peak, omega / (2 * np.pi), rtol=0.02)

    def test_white_noise_flat_spectrum(self):
        import jax
        v = jax.random.normal(jax.random.PRNGKey(0), (2048, 64, 1, 1))
        freqs, spec = observables.vibrational_spectrum(v, dt=1.0)
        s = np.asarray(spec[1:-1])
        assert s.std() / s.mean() < 0.2  # flat up to estimator noise
        # density integrates to ~ <v^2>/2 (one-sided)
        df = float(freqs[1] - freqs[0])
        total = float((spec[1:-1]).sum() * df)
        np.testing.assert_allclose(total, 0.5 * float(jnp.mean(v**2)),
                                   rtol=0.05)


class TestNormalModes:

    def test_isotropic_harmonic_exact(self):
        """U = 0.5 k |x|^2 per atom: every mode omega = sqrt(k/m)."""
        k, m = 2.0, 4.0
        pot = lambda x: 0.5 * k * jnp.sum(x ** 2)
        w, v = observables.normal_modes(pot, jnp.zeros((3, 3)), masses=m)
        np.testing.assert_allclose(np.asarray(w), np.sqrt(k / m),
                                   rtol=1e-5)
        # Mass-weighted orthonormality of the Cartesian columns.
        gram = v.T @ (m * v)
        np.testing.assert_allclose(np.asarray(gram), np.eye(9),
                                   atol=1e-5)

    def test_lj_dimer_stretch_and_zero_modes(self):
        """LJ dimer at its minimum: 5 rigid modes (3 translations + 2
        rotations) at omega ~ 0 and ONE stretch at the analytic
        omega = sqrt(2 U''(r0) / m), U''(r0) = 4 eps (156 r0^-14
        - 42 r0^-8), r0 = 2^(1/6)."""
        from vaemolsim_tpu import potentials
        pot = potentials.lennard_jones()
        r0 = 2.0 ** (1.0 / 6.0)
        x = jnp.array([[0.0, 0.0, 0.0], [r0, 0.0, 0.0]])
        w, _ = observables.normal_modes(pot, x)
        w = np.sort(np.asarray(w))
        upp = 4.0 * (156.0 * r0 ** -14 - 42.0 * r0 ** -8)
        np.testing.assert_allclose(w[-1], np.sqrt(2.0 * upp), rtol=1e-4)
        np.testing.assert_allclose(w[:5], 0.0, atol=1e-3)

    def test_saddle_gives_negative_mode(self):
        """1-D double well (x^2-1)^2 at x=0: U'' = -4 -> omega = -2."""
        pot = lambda x: jnp.reshape((x[..., 0, 0] ** 2 - 1.0) ** 2, ())
        w, _ = observables.normal_modes(pot, jnp.zeros((1, 1)))
        np.testing.assert_allclose(float(w[0]), -2.0, rtol=1e-5)

    def test_harmonic_free_energy_quadrature_identity(self):
        """One harmonic mode: A = kT ln(hbar omega / kT) equals
        -kT ln[ (1/2 pi hbar) Int e^{-beta p^2/2m} dp
                 Int e^{-beta k x^2/2} dx ]."""
        k, m, kt, hbar = 3.0, 2.0, 0.8, 1.0
        omega = np.sqrt(k / m)
        a = float(observables.harmonic_free_energy(
            jnp.asarray([omega]), kt=kt, hbar=hbar))
        z = (np.sqrt(2 * np.pi * m * kt) * np.sqrt(2 * np.pi * kt / k)
             / (2 * np.pi * hbar))
        np.testing.assert_allclose(a, -kt * np.log(z), rtol=1e-6)

    def test_harmonic_free_energy_skips_zero_flags_negative(self):
        a = observables.harmonic_free_energy(
            jnp.asarray([1e-7, 2.0, 3.0]), kt=1.0)
        want = np.log(2.0) + np.log(3.0)
        np.testing.assert_allclose(float(a), want, rtol=1e-6)
        bad = observables.harmonic_free_energy(
            jnp.asarray([-0.5, 2.0]), kt=1.0)
        assert np.isnan(float(bad))

    def test_quasi_harmonic_recovers_hessian_frequencies(self):
        """Exact Gaussian sampling of a diagonal harmonic well: the
        fluctuation route must match the Hessian route."""
        ks = np.array([0.5, 2.0, 8.0])
        m, kt = 1.5, 0.7
        key = jax.random.PRNGKey(0)
        std = np.sqrt(kt / ks)
        traj = (jax.random.normal(key, (40000, 1, 3))
                * jnp.asarray(std))
        w = observables.quasi_harmonic_frequencies(traj, kt=kt,
                                                   masses=m)
        want = np.sort(np.sqrt(ks / m))[::-1]
        np.testing.assert_allclose(np.asarray(w), want, rtol=0.03)

    def test_quasi_harmonic_matches_normal_modes_on_md(self):
        """BAOAB sampling of a stiff anisotropic well: quasi-harmonic
        frequencies from the trajectory match normal_modes at the
        minimum within sampling error."""
        from vaemolsim_tpu import md
        ks = jnp.array([4.0, 9.0, 16.0])
        pot = lambda x: jnp.sum(0.5 * ks * x[..., 0, :] ** 2, axis=-1)
        kt = 0.5
        x0 = jnp.zeros((16, 1, 3))
        _, traj = md.baoab(pot, x0, jnp.zeros_like(x0),
                           jax.random.PRNGKey(1), dt=0.02,
                           n_steps=4000, friction=1.0, kT=kt,
                           collect_every=4)
        flat = traj.reshape(-1, 1, 3)
        w_qh = observables.quasi_harmonic_frequencies(flat, kt=kt)
        w_nm, _ = observables.normal_modes(
            lambda x: jnp.reshape(pot(x[None]), ()), jnp.zeros((1, 3)))
        np.testing.assert_allclose(np.sort(np.asarray(w_qh)),
                                   np.sort(np.asarray(w_nm)),
                                   rtol=0.08)


class TestQuasiHarmonicRankDeficiency:

    def test_infs_lead_not_trail(self):
        """Regression (doc contract): eigvalsh is ascending, so the
        null directions of a rank-deficient covariance surface as inf
        frequencies at the FRONT of the descending output — a user
        dropping 'trailing entries' per the old docstring kept the infs
        and discarded the softest real modes."""
        traj = jax.random.normal(jax.random.PRNGKey(0), (3, 2, 3))
        w = np.asarray(observables.quasi_harmonic_frequencies(
            traj, kt=1.0))
        n_inf = int(np.sum(~np.isfinite(w)))
        assert n_inf >= 4                    # rank <= n_frames - 1 = 2
        assert not np.isfinite(w[:n_inf]).any()
        assert np.isfinite(w[n_inf:]).all()


class TestStressTensor:
    """Pressure-tensor stack: kinetic part exactness, the per-axis
    dilation diagonal vs the scalar virial, the cell-list analytic
    full tensor vs a test-local dense pair formula, and the
    Kirkwood-Buff surface-tension reduction."""

    L, CUT = 10.0, 2.5

    def _config(self, seed=0, n_side=4, jitter=0.15):
        # Jittered lattice: keeps every pair outside the 0.3 sigma
        # linear-core region so the plain LJ derivative is the truth.
        g = jnp.stack(jnp.meshgrid(*[jnp.arange(float(n_side))] * 3,
                                   indexing="ij"), -1).reshape(-1, 3)
        g = g * (self.L / n_side)
        return g + jitter * jax.random.normal(jax.random.PRNGKey(seed),
                                              g.shape)

    def test_kinetic_stress_trace_is_2ke_over_v(self):
        from vaemolsim_tpu.md import kinetic_energy
        v = jax.random.normal(jax.random.PRNGKey(1), (5, 32, 3))
        m = jnp.linspace(1.0, 3.0, 32)
        p = observables.kinetic_stress(v, box=[self.L] * 3, masses=m)
        assert p.shape == (5, 3, 3)
        tr = np.trace(np.asarray(p), axis1=-2, axis2=-1)
        ke = np.asarray(jax.vmap(lambda vv: kinetic_energy(vv, m))(v))
        np.testing.assert_allclose(tr, 2.0 * ke / self.L ** 3,
                                   rtol=1e-6)

    def test_diag_mean_equals_virial_pressure(self):
        pfb = lambda b: potentials.lennard_jones(box=b, cutoff=self.CUT)
        x = self._config()
        kt = 1.3
        diag = observables.pressure_tensor_diag(
            pfb, x, box=[self.L] * 3, kt=kt)
        p = observables.virial_pressure(pfb, x, box=[self.L] * 3, kt=kt)
        np.testing.assert_allclose(float(diag.mean()), float(p),
                                   rtol=1e-6)
        # Instantaneous kinetic part: trace consistency by hand.
        v = jax.random.normal(jax.random.PRNGKey(2), x.shape)
        diag_v = observables.pressure_tensor_diag(
            pfb, x, box=[self.L] * 3, v=v)
        manual_kin = np.asarray(jnp.sum(v * v, axis=0)) / self.L ** 3
        np.testing.assert_allclose(
            np.asarray(diag_v - diag), manual_kin - kt * x.shape[0]
            / self.L ** 3, rtol=1e-5, atol=1e-7)

    def _dense_stress(self, x, charges=None, alpha=None):
        """Test-local O(N^2) pair virial: the independent truth."""
        x = np.asarray(x, np.float64)
        box = np.array([self.L] * 3)
        d = x[:, None, :] - x[None, :, :]
        d -= box * np.round(d / box)
        r = np.sqrt((d ** 2).sum(-1))
        n = x.shape[0]
        mask = (r < self.CUT) & ~np.eye(n, dtype=bool)
        r = np.where(mask, r, 1.0)
        sr6 = 1.0 / r ** 6
        dudr = 24.0 / r * (sr6 - 2.0 * sr6 * sr6)
        if charges is not None:
            from scipy.special import erfc
            qq = np.asarray(charges)[:, None] * np.asarray(charges)[None]
            dudr = dudr - qq * (erfc(alpha * r) / r ** 2
                                + 2.0 / np.sqrt(np.pi) * alpha
                                * np.exp(-(alpha * r) ** 2) / r)
        w = np.where(mask, dudr / r, 0.0)
        return -0.5 * np.einsum("ij,ija,ijb->ab", w, d, d) / self.L ** 3

    @pytest.mark.parametrize("backend", ["xla", "pallas"])
    def test_cell_stress_matches_dense_pair_formula(self, backend):
        from vaemolsim_tpu.potentials import lennard_jones_cell_neighbor
        x = self._config(seed=3)
        n = x.shape[0]
        q = jnp.where(jnp.arange(n) % 2 == 0, 1.0, -1.0)
        kw = {"interpret": True} if backend == "pallas" else {}
        build, energy = lennard_jones_cell_neighbor(
            box=[self.L] * 3, cutoff=self.CUT, skin=0.5, capacity=32,
            backend=backend, charges=q, coulomb_alpha=0.8, **kw)
        nl = build(x)
        sig = np.asarray(energy.stress(nl, x))
        ref = self._dense_stress(x, charges=q, alpha=0.8)
        np.testing.assert_allclose(sig, ref, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(sig, sig.T, rtol=1e-5)

    def test_cell_stress_trace_matches_virial_pressure(self):
        from vaemolsim_tpu.potentials import lennard_jones_cell_neighbor
        x = self._config(seed=4)
        build, energy = lennard_jones_cell_neighbor(
            box=[self.L] * 3, cutoff=self.CUT, skin=0.5, capacity=32)
        nl = build(x)
        tr3 = float(jnp.trace(energy.stress(nl, x))) / 3.0
        pfb = lambda b: potentials.lennard_jones(box=b, cutoff=self.CUT)
        p_conf = float(observables.virial_pressure(
            pfb, x, box=[self.L] * 3, kt=0.0))
        np.testing.assert_allclose(tr3, p_conf, rtol=1e-4)

    def test_cell_stress_honors_drift_contract(self):
        from vaemolsim_tpu.potentials import lennard_jones_cell_neighbor
        x = self._config(seed=5)
        build, energy = lennard_jones_cell_neighbor(
            box=[self.L] * 3, cutoff=self.CUT, skin=0.5, capacity=32)
        nl = build(x)
        x_far = x.at[0].add(jnp.asarray([0.6, 0.0, 0.0]))
        assert np.isnan(np.asarray(energy.stress(nl, x_far))).all()

    def test_surface_tension_reduction(self):
        # Synthetic anisotropic diagonals: exact closed form.
        diag = jnp.asarray([[1.0, 1.0, 2.0], [0.5, 1.5, 2.0]])
        g = observables.surface_tension(diag, box=[4.0, 4.0, 8.0])
        assert float(g) == pytest.approx(0.5 * 8.0 * 1.0)
        iso = jnp.ones((16, 3)) * 0.7
        assert float(observables.surface_tension(
            iso, box=[4.0, 4.0, 8.0])) == pytest.approx(0.0, abs=1e-6)


class TestGreenKuboViscosity:

    def test_ar1_stress_integral(self):
        """Synthetic AR(1) shear components with a closed-form GK
        integral: eta = (V/kT) sigma^2 dt (1+a)/(2(1-a)) under the
        trapezoidal rule."""
        a, sig2, dt, t = 0.8, 0.09, 0.01, 32768
        key = jax.random.PRNGKey(0)
        noise = jnp.sqrt(sig2 * (1 - a * a)) * jax.random.normal(
            key, (t, 5))
        s = jax.lax.scan(lambda c, e: (a * c + e, a * c + e),
                         jnp.sqrt(sig2) * jax.random.normal(
                             jax.random.PRNGKey(1), (5,)),
                         noise)[1]                       # (T, 5)
        # Assemble full traceless tensors from the 5 components.
        pyy = (2.0 * s[:, 4] - 2.0 * s[:, 3]) / 3.0
        pxx = pyy + 2.0 * s[:, 3]
        pzz = pyy - 2.0 * s[:, 4]
        p = jnp.zeros((t, 3, 3))
        p = p.at[:, 0, 0].set(pxx).at[:, 1, 1].set(pyy)
        p = p.at[:, 2, 2].set(pzz)
        p = p.at[:, 0, 1].set(s[:, 0]).at[:, 1, 0].set(s[:, 0])
        p = p.at[:, 0, 2].set(s[:, 1]).at[:, 2, 0].set(s[:, 1])
        p = p.at[:, 1, 2].set(s[:, 2]).at[:, 2, 1].set(s[:, 2])
        vol, kt = 125.0, 1.0
        eta, sacf = observables.green_kubo_viscosity(
            p, dt=dt, volume=vol, kt=kt, t_max=60 * dt)
        exact = vol / kt * sig2 * dt * (1 + a) / (2 * (1 - a))
        assert float(eta) == pytest.approx(exact, rel=0.25)
        # The averaged shear ACF is the AR(1) autocorrelation.
        assert float(sacf[1] / sacf[0]) == pytest.approx(a, abs=0.03)
        assert float(sacf[0]) == pytest.approx(sig2, rel=0.1)

    def test_shape_validation(self):
        with pytest.raises(ValueError, match="3-D"):
            observables.green_kubo_viscosity(
                jnp.zeros((10, 2, 2)), dt=0.1, volume=1.0, kt=1.0)


class TestHeatFlux:
    """energy.heat_flux: dense O(N^2) pair-formula parity on both
    backends (incl. the Ewald real-space term and per-atom masses),
    the exact non-interacting (pure-convective) limit, and the drift
    contract."""

    L, CUT = 10.0, 2.5

    def _config(self, seed=0, n_side=4, jitter=0.15):
        g = jnp.stack(jnp.meshgrid(*[jnp.arange(float(n_side))] * 3,
                                   indexing="ij"), -1).reshape(-1, 3)
        g = g * (self.L / n_side)
        return g + jitter * jax.random.normal(jax.random.PRNGKey(seed),
                                              g.shape)

    def _dense_heat_flux(self, x, v, masses, charges=None, alpha=None,
                         shift=True):
        """Test-local O(N^2) Irving-Kirkwood energy flux (float64)."""
        x = np.asarray(x, np.float64)
        v = np.asarray(v, np.float64)
        m = np.broadcast_to(np.asarray(masses, np.float64), (x.shape[0],))
        box = np.array([self.L] * 3)
        d = x[:, None, :] - x[None, :, :]
        d -= box * np.round(d / box)
        r = np.sqrt((d ** 2).sum(-1))
        n = x.shape[0]
        mask = (r < self.CUT) & ~np.eye(n, dtype=bool)
        r = np.where(mask, r, 1.0)
        sr6 = 1.0 / r ** 6
        u = 4.0 * (sr6 * sr6 - sr6)
        if shift:
            sc6 = self.CUT ** -6
            u = u - 4.0 * (sc6 * sc6 - sc6)
        dudr = 24.0 / r * (sr6 - 2.0 * sr6 * sr6)
        if charges is not None:
            from scipy.special import erfc
            qq = np.asarray(charges)[:, None] * np.asarray(charges)[None]
            u = u + qq * erfc(alpha * r) / r
            dudr = dudr - qq * (erfc(alpha * r) / r ** 2
                                + 2.0 / np.sqrt(np.pi) * alpha
                                * np.exp(-(alpha * r) ** 2) / r)
        u = np.where(mask, u, 0.0)
        dudr = np.where(mask, dudr, 0.0)
        e_i = 0.5 * m * (v ** 2).sum(-1) + 0.5 * u.sum(1)
        conv = (e_i[:, None] * v).sum(0)
        vsum = v[:, None, :] + v[None, :, :]
        fdotv = -(dudr / r) * np.einsum("ija,ija->ij", d, vsum)
        vir = 0.25 * np.einsum("ij,ija->a", fdotv, d)
        return (conv + vir) / self.L ** 3

    @pytest.mark.parametrize("backend", ["xla", "pallas"])
    def test_matches_dense_pair_formula(self, backend):
        from vaemolsim_tpu.potentials import lennard_jones_cell_neighbor
        x = self._config(seed=7)
        n = x.shape[0]
        v = jax.random.normal(jax.random.PRNGKey(8), x.shape)
        m = jnp.linspace(1.0, 2.0, n)
        q = jnp.where(jnp.arange(n) % 2 == 0, 1.0, -1.0)
        kw = {"interpret": True} if backend == "pallas" else {}
        build, energy = lennard_jones_cell_neighbor(
            box=[self.L] * 3, cutoff=self.CUT, skin=0.5, capacity=32,
            backend=backend, charges=q, coulomb_alpha=0.8, **kw)
        nl = build(x)
        j = np.asarray(energy.heat_flux(nl, x, v, masses=m))
        ref = self._dense_heat_flux(x, v, m, charges=q, alpha=0.8)
        np.testing.assert_allclose(j, ref, rtol=1e-4, atol=1e-7)

    def test_non_interacting_limit_is_convective(self):
        # 8 atoms on a 5.0-spaced lattice in L=10 with cutoff 2.5:
        # every pair distance >= 5 > cutoff, so J = sum e_kin_i v_i / V
        # EXACTLY (the pair terms vanish; shift only applies in-range).
        from vaemolsim_tpu.potentials import lennard_jones_cell_neighbor
        g = jnp.stack(jnp.meshgrid(*[jnp.arange(2.0)] * 3,
                                   indexing="ij"), -1).reshape(-1, 3)
        x = g * 5.0 + 1.0
        v = jax.random.normal(jax.random.PRNGKey(3), x.shape)
        build, energy = lennard_jones_cell_neighbor(
            box=[self.L] * 3, cutoff=self.CUT, skin=0.4, capacity=8)
        nl = build(x)
        j = energy.heat_flux(nl, x, v)
        e_kin = 0.5 * jnp.sum(v * v, -1)
        expected = jnp.sum(e_kin[:, None] * v, 0) / self.L ** 3
        np.testing.assert_allclose(np.asarray(j), np.asarray(expected),
                                   rtol=1e-6)

    def test_honors_drift_contract(self):
        from vaemolsim_tpu.potentials import lennard_jones_cell_neighbor
        x = self._config(seed=9)
        v = jax.random.normal(jax.random.PRNGKey(10), x.shape)
        build, energy = lennard_jones_cell_neighbor(
            box=[self.L] * 3, cutoff=self.CUT, skin=0.5, capacity=32)
        nl = build(x)
        x_far = x.at[0].add(jnp.asarray([0.6, 0.0, 0.0]))
        assert np.isnan(np.asarray(
            energy.heat_flux(nl, x_far, v))).all()


class TestGreenKuboThermalConductivity:

    def test_ar1_flux_integral(self):
        """Synthetic AR(1) flux components with the closed-form GK
        integral lambda = (V/kT^2) sigma^2 dt (1+a)/(2(1-a))."""
        a, sig2, dt, t = 0.7, 0.04, 0.02, 32768
        noise = jnp.sqrt(sig2 * (1 - a * a)) * jax.random.normal(
            jax.random.PRNGKey(0), (t, 3))
        j = jax.lax.scan(lambda c, e: (a * c + e, a * c + e),
                         jnp.sqrt(sig2) * jax.random.normal(
                             jax.random.PRNGKey(1), (3,)),
                         noise)[1]
        vol, kt = 216.0, 0.9
        lam, jacf = observables.green_kubo_thermal_conductivity(
            j, dt=dt, volume=vol, kt=kt, t_max=50 * dt)
        exact = vol / kt ** 2 * sig2 * dt * (1 + a) / (2 * (1 - a))
        assert float(lam) == pytest.approx(exact, rel=0.25)
        assert float(jacf[1] / jacf[0]) == pytest.approx(a, abs=0.03)

    def test_mean_subtraction(self):
        # A constant offset (nonzero total momentum artifact) must not
        # poison the integral: pure-constant flux -> lambda ~ 0.
        j = jnp.ones((4096, 3)) * 5.0
        lam, _ = observables.green_kubo_thermal_conductivity(
            j, dt=0.01, volume=100.0, kt=1.0, t_max=0.5)
        assert abs(float(lam)) < 1e-3


class TestResponseFunctions:
    """Fluctuation-formula response functions pinned to closed-form
    ensembles: chi-squared canonical energies (Cv, plus the
    thermoextrap cross-identity), the exact Gamma(N+1, betaP) ideal-gas
    NPT volume law (kappa_T = 1/P, alpha_P = 1/T, Cp = 5N/2 + 1), and
    Gaussian dipole fluctuations (dielectric constant)."""

    KT = 0.7

    def test_cv_chi_squared_energies(self):
        # U = sum of n quadratic modes -> Var(U) = n kT^2 / 2, Cv = n/2.
        n, t = 10, 200_000
        g = jax.random.normal(jax.random.PRNGKey(0), (t, n))
        u = 0.5 * self.KT * jnp.sum(g * g, -1)
        cv = observables.heat_capacity_nvt(u, kt=self.KT)
        assert float(cv) == pytest.approx(n / 2, rel=0.03)
        # Kinetic part is exact bookkeeping.
        cv2 = observables.heat_capacity_nvt(u, kt=self.KT,
                                            n_dof_kinetic=6)
        assert float(cv2 - cv) == pytest.approx(3.0, abs=1e-5)

    def test_cv_matches_beta_derivative(self):
        # Cross-identity with extrapolation: d<U>/dbeta = -Var(U).
        from vaemolsim_tpu.extrapolation import (
            beta_extrapolation_coefficients)
        u = 2.0 + 0.3 * jax.random.normal(jax.random.PRNGKey(1),
                                          (50_000,))
        cv = observables.heat_capacity_nvt(u, kt=self.KT)
        coeffs = beta_extrapolation_coefficients(u, u, order=1)
        np.testing.assert_allclose(float(cv),
                                   -float(coeffs[1]) / self.KT ** 2,
                                   rtol=1e-4)

    def _ideal_gas_npt(self, n=64, p=1.3, t=400_000):
        # Exact NPT volume law: V ~ Gamma(N+1, rate = P/kT) — the same
        # law tests/test_npt.py pins the NPT engine against.
        v = self.KT / p * jax.random.gamma(
            jax.random.PRNGKey(2), n + 1.0, (t,))
        return v, p, n

    def test_kappa_t_ideal_gas(self):
        v, p, _ = self._ideal_gas_npt()
        kap = observables.isothermal_compressibility(v, kt=self.KT)
        assert float(kap) == pytest.approx(1.0 / p, rel=0.03)

    def test_alpha_p_ideal_gas(self):
        v, p, _ = self._ideal_gas_npt()
        alpha = observables.thermal_expansion(
            jnp.zeros_like(v), v, kt=self.KT, pressure=p)
        assert float(alpha) == pytest.approx(1.0 / self.KT, rel=0.03)

    def test_cp_ideal_gas(self):
        v, p, n = self._ideal_gas_npt()
        cp = observables.heat_capacity_npt(
            jnp.zeros_like(v), v, kt=self.KT, pressure=p,
            n_dof_kinetic=3 * n)
        # <H> = (3N/2 + N + 1) kT in this ensemble -> Cp = 5N/2 + 1.
        assert float(cp) == pytest.approx(2.5 * n + 1, rel=0.03)

    def test_dielectric_gaussian_dipoles(self):
        s2, vol, t = 0.9, 50.0, 300_000
        m = jnp.sqrt(s2) * jax.random.normal(jax.random.PRNGKey(3),
                                             (t, 3))
        eps = observables.dielectric_constant(m, volume=vol, kt=self.KT)
        exact = 1.0 + 4.0 * np.pi * 3 * s2 / (3.0 * vol * self.KT)
        assert float(eps) == pytest.approx(exact, rel=0.02)
        # A net mean dipole (polar crystal, itinerant offset) must not
        # enter the FLUCTUATION estimator.
        eps_off = observables.dielectric_constant(
            m + jnp.asarray([5.0, -2.0, 0.0]), volume=vol, kt=self.KT)
        assert float(eps_off) == pytest.approx(float(eps), rel=1e-4)

    def test_total_dipole(self):
        x = jnp.asarray([[[0.0, 0.0, 0.0], [1.0, 2.0, 3.0]],
                         [[1.0, 1.0, 1.0], [0.0, 0.0, 0.0]]])
        q = jnp.asarray([1.0, -1.0])
        m = observables.total_dipole(x, q)
        np.testing.assert_allclose(np.asarray(m),
                                   [[-1.0, -2.0, -3.0],
                                    [1.0, 1.0, 1.0]], atol=1e-6)
