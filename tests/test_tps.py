"""Transition path sampling (mcmc/tps.py): reactivity invariance and
counters, exact bookkeeping of the brute-force window harvester, the
distributional gold standard (TPS ensemble == reactive windows of long
unbiased MD), and channel-switching ergodicity on a two-channel ring.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu import md
from vaemolsim_tpu.mcmc import (make_tps_step, reactive_windows,
                                run_tps, tps_init)

H = 3.5
KT = 1.0
DT = 0.02
FRICTION = 0.5
N_FRAMES = 201          # duration 4.0 — room for a full damped transit


def dwell(x):
    """Quartic double well, event shape (1, 1)."""
    return H * (x[..., 0, 0] ** 2 - 1.0) ** 2


def in_a(x):
    return x[..., 0, 0] < -0.7


def in_b(x):
    return x[..., 0, 0] > 0.7


def straight_seed(n_walkers, n_frames=N_FRAMES):
    line = jnp.linspace(-1.0, 1.0, n_frames)[None, :, None, None]
    return jnp.tile(line, (n_walkers, 1, 1, 1))


class TestBookkeeping:

    def test_paths_stay_reactive_counters_exact(self):
        state = tps_init(straight_seed(16), key=jax.random.PRNGKey(100), kt=KT)
        step = make_tps_step(dwell, in_a=in_a, in_b=in_b, dt=DT,
                             kt=KT, friction=FRICTION)
        state, _ = run_tps(step, state, jax.random.PRNGKey(0), 50)
        assert np.all(np.asarray(state.n_trials) == 50)
        assert bool(jnp.all(in_a(state.path[:, 0])))
        assert bool(jnp.all(in_b(state.path[:, -1])))
        acc = float(jnp.mean(state.acceptance_rate))
        assert 0.05 < acc < 0.95, acc
        # Paths actually moved off the straight-line seed.
        assert float(jnp.max(jnp.abs(
            state.path - straight_seed(16)))) > 0.1

    def test_collect_returns_thinned_ensemble(self):
        state = tps_init(straight_seed(4), key=jax.random.PRNGKey(101), kt=KT)
        step = make_tps_step(dwell, in_a=in_a, in_b=in_b, dt=DT,
                             kt=KT, friction=FRICTION)
        state, coll = run_tps(step, state, jax.random.PRNGKey(1), 20,
                              collect_every=5)
        assert coll.shape == (4, 4, N_FRAMES, 1, 1)
        assert bool(jnp.all(in_a(coll[:, :, 0])))
        assert bool(jnp.all(in_b(coll[:, :, -1])))

    def test_init_validates_rank_and_velocity_source(self):
        with pytest.raises(ValueError):
            tps_init(jnp.zeros((3, 5, 2)), key=jax.random.PRNGKey(0))
        with pytest.raises(ValueError):
            tps_init(jnp.zeros((3, 5, 1, 2)))   # no vel, no key

    def test_two_way_mode_bookkeeping(self):
        state = tps_init(straight_seed(16), key=jax.random.PRNGKey(103),
                         kt=KT)
        step = make_tps_step(dwell, in_a=in_a, in_b=in_b, dt=DT,
                             kt=KT, friction=FRICTION, mode="two_way")
        state, _ = run_tps(step, state, jax.random.PRNGKey(104), 40)
        assert np.all(np.asarray(state.n_trials) == 40)
        assert bool(jnp.all(in_a(state.path[:, 0])))
        assert bool(jnp.all(in_b(state.path[:, -1])))
        assert float(jnp.mean(state.acceptance_rate)) > 0.0
        with pytest.raises(ValueError):
            make_tps_step(dwell, in_a=in_a, in_b=in_b, dt=DT, kt=KT,
                          mode="sideways")

    def test_reactive_windows_exact(self):
        """Hand-built trajectory with known reactive window starts."""
        xs = jnp.array([-1.0, -0.9, 0.0, 0.9, 1.0, -1.0, 0.0,
                        1.0, 0.9])[:, None, None]
        win, valid = reactive_windows(xs, n_frames=4, in_a=in_a,
                                      in_b=in_b, max_windows=4)
        # Starts: t=0 (-1.0 .. 0.9)? frame 3 = 0.9 > 0.7 yes;
        # t=1 (-0.9 .. 1.0) yes; t=5 (-1.0, 0.0, 1.0, 0.9) yes.
        assert np.asarray(valid).tolist() == [True, True, True, False]
        np.testing.assert_allclose(np.asarray(win[0, :, 0, 0]),
                                   [-1.0, -0.9, 0.0, 0.9])
        np.testing.assert_allclose(np.asarray(win[2, :, 0, 0]),
                                   [-1.0, 0.0, 1.0, 0.9])


class TestAgainstBruteForce:

    def test_tps_matches_harvested_reactive_windows(self):
        """Gold standard: the TPS ensemble must equal (in distribution)
        the set of fixed-length reactive windows of one long unbiased
        BAOAB run of the SAME kernel — compared on the pooled-frame
        position histogram, the barrier-fraction, and the midframe
        mean."""
        # --- brute force: 8 chains x 40k steps ---
        x0 = jnp.tile(jnp.array([[[-1.0]]]), (8, 1, 1))
        _, traj = md.baoab(dwell, x0, jnp.zeros_like(x0),
                           jax.random.PRNGKey(2), dt=DT, n_steps=40000,
                           friction=FRICTION, kT=KT, collect_every=1)
        traj = jnp.moveaxis(traj, 0, 1)         # (8, T, 1, 1)
        wins, valids = jax.vmap(
            lambda tr: reactive_windows(tr, n_frames=N_FRAMES,
                                        in_a=in_a, in_b=in_b,
                                        max_windows=600))(traj)
        bf = np.asarray(wins.reshape(-1, N_FRAMES))[
            np.asarray(valids.reshape(-1))]
        assert bf.shape[0] > 300, bf.shape     # enough reference paths

        # --- TPS with the same kernel ---
        state = tps_init(straight_seed(32), key=jax.random.PRNGKey(102), kt=KT)
        step = make_tps_step(dwell, in_a=in_a, in_b=in_b, dt=DT,
                             kt=KT, friction=FRICTION)
        state, _ = run_tps(step, state, jax.random.PRNGKey(3), 150)
        _, coll = run_tps(step, state, jax.random.PRNGKey(4), 200,
                          collect_every=5)
        tps = np.asarray(coll.reshape(-1, N_FRAMES))

        edges = np.linspace(-1.6, 1.6, 17)
        h_bf, _ = np.histogram(bf.ravel(), edges, density=True)
        h_tps, _ = np.histogram(tps.ravel(), edges, density=True)
        dx = edges[1] - edges[0]
        tv = 0.5 * np.sum(np.abs(h_bf - h_tps)) * dx
        assert tv < 0.08, tv

        frac_bar_bf = np.mean(np.abs(bf) < 0.5)
        frac_bar_tps = np.mean(np.abs(tps) < 0.5)
        assert abs(frac_bar_bf - frac_bar_tps) < 0.05, (frac_bar_bf,
                                                        frac_bar_tps)
        assert abs(np.mean(bf[:, N_FRAMES // 2])
                   - np.mean(tps[:, N_FRAMES // 2])) < 0.15


class TestTwoChannelErgodicity:

    def test_shooting_switches_channels(self):
        """Ring potential with two symmetric transition channels
        (upper/lower arc): seeded ENTIRELY in the upper channel, the
        shooting moves must discover and substantially populate the
        lower one."""
        def ring(x):
            px, py = x[..., 0, 0], x[..., 0, 1]
            return (4.0 * (px ** 2 + py ** 2 - 1.0) ** 2
                    + 1.5 * (px ** 2 - 1.0) ** 2)

        a = lambda x: x[..., 0, 0] < -0.8
        b = lambda x: x[..., 0, 0] > 0.8
        kt = 0.5
        n_frames = 401          # duration 8: a semi-ballistic half-arc
        theta = jnp.linspace(jnp.pi, 0.0, n_frames)   # upper arc
        seed = jnp.stack([jnp.cos(theta), jnp.sin(theta)],
                         axis=-1)[None, :, None, :]
        seed = jnp.tile(seed, (32, 1, 1, 1))
        state = tps_init(seed, key=jax.random.PRNGKey(105), kt=kt)
        assert bool(jnp.all(a(state.path[:, 0])))
        assert bool(jnp.all(b(state.path[:, -1])))

        step = make_tps_step(ring, in_a=a, in_b=b, dt=DT, kt=kt,
                             friction=0.3)
        state, coll = run_tps(step, state, jax.random.PRNGKey(5), 400,
                              collect_every=10)
        # Channel of each collected path: sign of y at the frame
        # nearest the barrier (|x| minimal).
        paths = coll.reshape(-1, n_frames, 2)
        i_bar = jnp.argmin(jnp.abs(paths[..., 0]), axis=1)
        y_bar = jnp.take_along_axis(paths[..., 1], i_bar[:, None],
                                    axis=1)[:, 0]
        frac_lower = float(jnp.mean(y_bar < 0))
        assert 0.15 < frac_lower < 0.85, frac_lower
        acc = float(jnp.mean(state.acceptance_rate))
        assert acc > 0.05, acc


class TestFirstHittingCommittor:

    def test_overdamped_matches_quadrature(self):
        """High friction: the MC committor must equal the exact
        overdamped quadrature q(x) = int_a^x e^{U/kT} / int_a^b."""
        from vaemolsim_tpu.mcmc import first_hitting_committor
        xs = jnp.array([-0.5, -0.25, 0.0, 0.25, 0.5])
        q, unres = first_hitting_committor(
            dwell, xs[:, None, None], in_a=in_a, in_b=in_b,
            key=jax.random.PRNGKey(0), n_shots=512, max_steps=4000,
            dt=0.005, kt=KT, friction=25.0)
        assert float(jnp.max(unres)) < 0.02, np.asarray(unres)
        grid = np.linspace(-0.7, 0.7, 4001)
        w = np.exp(H * (grid ** 2 - 1.0) ** 2 / KT)
        cum = np.concatenate([[0.0], np.cumsum(
            0.5 * (w[1:] + w[:-1]) * np.diff(grid))])
        q_exact = np.interp(np.asarray(xs), grid, cum / cum[-1])
        np.testing.assert_allclose(np.asarray(q), q_exact, atol=0.07)
        # Monotone in x (the defining property of a 1-D committor).
        assert np.all(np.diff(np.asarray(q)) > -0.05)

    def test_basin_configs_are_trivial(self):
        from vaemolsim_tpu.mcmc import first_hitting_committor
        xs = jnp.array([-1.0, 1.0])[:, None, None]
        q, unres = first_hitting_committor(
            dwell, xs, in_a=in_a, in_b=in_b,
            key=jax.random.PRNGKey(1), n_shots=64, max_steps=50,
            dt=0.005, kt=KT, friction=25.0)
        np.testing.assert_allclose(np.asarray(q), [0.0, 1.0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(unres), 0.0, atol=1e-6)


class TestPerAtomMasses:
    """Regression: the Maxwell-Boltzmann draws in tps_init,
    step_two_way, and first_hitting_committor used raw
    ``jnp.asarray(masses)``, aligning an (n_atoms,) masses array with
    the trailing DIM axis — a hard broadcast error for n_atoms != dim
    and a silently wrong path measure for n_atoms == dim.  All three
    now go through ``md._masses_arr`` like the dynamics itself."""

    MASSES = jnp.array([1.0, 16.0])

    @staticmethod
    def _pot2(x):
        # dwell on atom 0's first coordinate, harmonic tether on the rest
        rest = jnp.sum(x[..., 1, :] ** 2, axis=-1) + jnp.sum(
            x[..., 0, 1:] ** 2, axis=-1)
        return dwell(x[..., :1, :1]) + 0.5 * rest

    def test_init_draw_is_per_atom(self):
        path = jnp.zeros((16, 50, 2, 3))         # n_atoms=2 != dim=3
        state = tps_init(path, key=jax.random.PRNGKey(0), kt=KT,
                         masses=self.MASSES)
        v = np.asarray(state.vel)
        var = v.var(axis=(0, 1, 3)).mean(axis=-1) \
            if v.ndim == 5 else v.var(axis=(0, 1, 3))
        # equipartition per atom: var(v_i) = kT / m_i
        assert var[0] / var[1] == pytest.approx(16.0, rel=0.15)

    def test_two_way_step_runs_with_per_atom_masses(self):
        w, f = 4, 31
        line = jnp.linspace(-1.0, 1.0, f)
        path = jnp.zeros((w, f, 2, 3)).at[:, :, 0, 0].set(line[None])
        state = tps_init(path, key=jax.random.PRNGKey(1), kt=KT,
                         masses=self.MASSES)
        step = make_tps_step(self._pot2, in_a=in_a, in_b=in_b, dt=DT,
                             kt=KT, friction=FRICTION,
                             masses=self.MASSES, mode="two_way")
        out = jax.jit(step)(state, jax.random.PRNGKey(2))
        assert np.isfinite(np.asarray(out.path)).all()
        assert out.path.shape == state.path.shape

    def test_committor_runs_with_per_atom_masses(self):
        from vaemolsim_tpu.mcmc import first_hitting_committor
        x0 = jnp.zeros((3, 2, 3)).at[:, 0, 0].set(
            jnp.array([-1.0, 0.0, 1.0]))
        q, unres = first_hitting_committor(
            self._pot2, x0, key=jax.random.PRNGKey(3), in_a=in_a,
            in_b=in_b, dt=DT, kt=KT, friction=FRICTION,
            masses=self.MASSES, n_shots=8, max_steps=400)
        q = np.asarray(q)
        assert q.shape == (3,)
        assert q[0] <= q[2]
