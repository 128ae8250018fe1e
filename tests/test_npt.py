"""NPT Monte Carlo and the virial-pressure observable.

Correctness anchors: the ideal-gas volume distribution is exactly
Gamma(N+1, beta*P) under ln-V sampling (closed form for mean/variance),
the virial estimator must equal a finite-difference dilation
derivative, and NPT(P) must reproduce P as the average virial pressure
(the standard self-consistency check, Frenkel & Smit ch. 5.4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu import observables, potentials
from vaemolsim_tpu.mcmc import (NPTState, make_npt_step, npt_init,
                                run_npt)


def _ideal_gas_factory(b):
    # Zero potential with the correct batch shape contract.
    del b
    return lambda x: jnp.zeros(x.shape[:-2], x.dtype)


def _lj_factory(cutoff=2.5):
    return lambda b: potentials.lennard_jones(box=b, cutoff=cutoff)


class TestVirialPressure:

    def test_ideal_gas_exact(self):
        x = jax.random.uniform(jax.random.PRNGKey(0), (4, 20, 3)) * 5.0
        p = observables.virial_pressure(_ideal_gas_factory, x,
                                        box=[5.0] * 3, kt=1.3)
        np.testing.assert_allclose(np.asarray(p),
                                   20 * 1.3 / 125.0, rtol=1e-6)

    def test_matches_finite_difference_dilation(self):
        box = jnp.asarray([6.0, 6.0, 6.0])
        x = jax.random.uniform(jax.random.PRNGKey(1), (30, 3)) * 6.0
        fac = _lj_factory()
        p = float(observables.virial_pressure(fac, x, box=box))
        h = 1e-4
        u = lambda s: float(fac(s * box)(s * x))
        du_fd = (u(1.0 + h) - u(1.0 - h)) / (2 * h)
        p_fd = (30 * 1.0 - du_fd / 3.0) / float(jnp.prod(box))
        np.testing.assert_allclose(p, p_fd, rtol=2e-3, atol=1e-4)

    def test_batched_and_jittable(self):
        x = jax.random.uniform(jax.random.PRNGKey(2), (5, 8, 16, 3)) * 4.0
        f = jax.jit(lambda x: observables.virial_pressure(
            _lj_factory(cutoff=1.9), x, box=[4.0] * 3))
        out = f(x)
        assert out.shape == (5, 8)
        assert np.isfinite(np.asarray(out)).all()


class TestNPTIdealGas:

    def test_volume_distribution_gamma(self):
        """ln-V NPT sampling of an ideal gas: V ~ Gamma(N+1, beta P)."""
        n_atoms, beta_p = 8, 1.0
        x0 = jax.random.uniform(jax.random.PRNGKey(3),
                                (256, n_atoms, 3)) * 2.0
        st = npt_init(_ideal_gas_factory, x0, [2.0] * 3,
                      jax.random.PRNGKey(4))
        step = make_npt_step(_ideal_gas_factory, pressure=beta_p,
                             beta=1.0, dx_scale=0.3, dlnv_scale=0.3)
        st, collected = jax.jit(
            lambda s: run_npt(step, s, 3000, collect_every=10))(st)
        _, boxes = collected
        vols = np.asarray(jnp.prod(boxes[150:], axis=-1)).ravel()
        mean, var = n_atoms + 1.0, n_atoms + 1.0  # Gamma(N+1, 1)
        assert abs(vols.mean() - mean) < 0.15 * mean
        assert abs(vols.var() - var) < 0.3 * var

    def test_counters_and_acceptance(self):
        x0 = jax.random.uniform(jax.random.PRNGKey(5), (16, 4, 3))
        st = npt_init(_ideal_gas_factory, x0, [1.0] * 3,
                      jax.random.PRNGKey(6))
        step = make_npt_step(_ideal_gas_factory, pressure=1.0,
                             dx_scale=0.1, dlnv_scale=0.1, n_disp=2)
        st, _ = run_npt(step, st, 50)
        assert int(st.disp_trials) == 50 * 2 * 16
        assert int(st.vol_trials) == 50 * 16
        # Ideal-gas displacements are always accepted.
        assert int(st.disp_acc) == int(st.disp_trials)
        assert 0.0 < float(st.vol_acceptance_rate) <= 1.0


class TestNPTLennardJones:

    def test_pressure_self_consistency(self):
        """<P_virial> under NPT(P_set) equals P_set (gas density)."""
        p_set, n_atoms = 0.05, 16
        fac = _lj_factory(cutoff=2.5)
        x0 = (jax.random.uniform(jax.random.PRNGKey(7),
                                 (64, n_atoms, 3)) * 8.0)
        st = npt_init(fac, x0, [8.0] * 3, jax.random.PRNGKey(8))
        step = make_npt_step(fac, pressure=p_set, beta=1.0,
                             dx_scale=0.25, dlnv_scale=0.08)
        st, collected = jax.jit(
            lambda s: run_npt(step, s, 4000, collect_every=20))(st)
        xs, boxes = collected
        xs, boxes = xs[100:], boxes[100:]  # burn-in

        p_fn = jax.jit(jax.vmap(jax.vmap(
            lambda x, b: observables.virial_pressure(fac, x, box=b))))
        p_vir = np.asarray(p_fn(xs, boxes))
        assert np.isfinite(p_vir).all()
        # Chain-averaged estimate; generous tolerance for MC noise.
        assert abs(p_vir.mean() - p_set) < 0.2 * p_set
        # Both move families actually move.
        assert 0.05 < float(st.disp_acceptance_rate) < 1.0
        assert 0.05 < float(st.vol_acceptance_rate) < 1.0

    def test_energy_bookkeeping_consistent(self):
        """Carried energy equals a fresh evaluation at the final state
        (catches stale-energy bugs in either move's accept path)."""
        fac = _lj_factory(cutoff=1.9)
        x0 = jax.random.uniform(jax.random.PRNGKey(9), (8, 10, 3)) * 4.0
        st = npt_init(fac, x0, [4.0] * 3, jax.random.PRNGKey(10))
        step = make_npt_step(fac, pressure=0.2, dx_scale=0.15,
                             dlnv_scale=0.05)
        st, _ = run_npt(step, st, 100)
        e_fresh = fac(st.box[..., None, None, :])(st.x)
        np.testing.assert_allclose(np.asarray(st.energy),
                                   np.asarray(e_fresh), rtol=2e-4,
                                   atol=2e-4)


class TestNPTValidation:

    def test_n_disp_validated(self):
        with pytest.raises(ValueError, match="n_disp"):
            make_npt_step(_ideal_gas_factory, pressure=1.0, n_disp=0)

    def test_collect_every_must_divide(self):
        st = npt_init(_ideal_gas_factory,
                      jnp.ones((2, 3, 3)), [1.0] * 3,
                      jax.random.PRNGKey(0))
        step = make_npt_step(_ideal_gas_factory, pressure=1.0)
        with pytest.raises(ValueError, match="divide"):
            run_npt(step, st, 10, collect_every=3)


class TestAnisotropicNPT:

    def test_ideal_gas_volume_law(self):
        """Per-axis ln L moves keep the exact Gamma(N+1, beta P) VOLUME
        law, while the box shape fluctuates (edges decouple).  Note an
        ideal gas has no shear restoring force, so its shape marginal
        is a free random walk — shape stability is an interaction
        effect, tested on the LJ fluid below."""
        n_atoms, beta_p = 6, 1.0
        x0 = jax.random.uniform(jax.random.PRNGKey(0),
                                (256, n_atoms, 3)) * 2.0
        st = npt_init(_ideal_gas_factory, x0, [2.0] * 3,
                      jax.random.PRNGKey(1))
        step = make_npt_step(_ideal_gas_factory, pressure=beta_p,
                             dx_scale=0.3, dlnv_scale=0.2,
                             anisotropic=True)
        st, collected = jax.jit(
            lambda s: run_npt(step, s, 3000, collect_every=10))(st)
        _, boxes = collected
        boxes = np.asarray(boxes[150:])
        vols = boxes.prod(-1).ravel()
        mean = n_atoms + 1.0
        assert abs(vols.mean() - mean) < 0.15 * mean
        aspect = boxes.reshape(-1, 3)
        assert np.std(np.log(aspect[:, 0] / aspect[:, 1])) > 0.05

    def test_lj_fluid_shape_stays_bounded(self):
        """With interactions + the min_box wall, anisotropic NPT keeps
        a sensible box and stays finite."""
        fac = _lj_factory(cutoff=1.9)
        x0 = jax.random.uniform(jax.random.PRNGKey(6), (16, 12, 3)) * 5.0
        st = npt_init(fac, x0, [5.0] * 3, jax.random.PRNGKey(7))
        step = make_npt_step(fac, pressure=0.2, dx_scale=0.15,
                             dlnv_scale=0.05, min_box=3.9,
                             anisotropic=True)
        st, _ = jax.jit(lambda s: run_npt(step, s, 400))(st)
        assert np.isfinite(np.asarray(st.energy)).all()
        assert float(jnp.min(st.box)) >= 3.9
        e_fresh = fac(st.box[..., None, None, :])(st.x)
        np.testing.assert_allclose(np.asarray(st.energy),
                                   np.asarray(e_fresh), rtol=2e-4,
                                   atol=2e-4)

    def test_min_box_applies_per_axis(self):
        x0 = jax.random.uniform(jax.random.PRNGKey(2), (16, 4, 3)) * 3.0
        st = npt_init(_ideal_gas_factory, x0, [3.0] * 3,
                      jax.random.PRNGKey(3))
        step = make_npt_step(_ideal_gas_factory, pressure=20.0,
                             dlnv_scale=0.3, min_box=2.5,
                             anisotropic=True)
        st, _ = run_npt(step, st, 200)
        assert float(jnp.min(st.box)) >= 2.5
