"""SchNet continuous-filter embedding (nn/schnet.py) — the
cgschnet/atomschnet capability the reference's JointDistribution sketch
names but never implements (vaemolsim/dists.py:805,850)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import vaemolsim_tpu.config as cfg
from vaemolsim_tpu.nn import (DistanceSelection, LocalParticleDescriptors,
                              SchNetEmbedding)
from vaemolsim_tpu.nn.schnet import (cosine_cutoff, gaussian_rbf,
                                     shifted_softplus)


def _embed(key=0, **kw):
    kw.setdefault("info_dim", 2)
    kw.setdefault("embedding_dim", 6)
    kw.setdefault("features", 8)
    kw.setdefault("n_rbf", 8)
    kw.setdefault("cutoff", 3.0)
    return SchNetEmbedding.create(jax.random.PRNGKey(key), **kw)


def _cloud(n=10, batch=4, scale=1.0, seed=1):
    ks = jax.random.split(jax.random.PRNGKey(seed), 2)
    coords = jax.random.normal(ks[0], (batch, n, 3)) * scale
    info = jax.random.normal(ks[1], (batch, n, 2))
    return coords, info


def _rotation(seed=3):
    # QR of a random matrix -> uniform-ish rotation.
    m = jax.random.normal(jax.random.PRNGKey(seed), (3, 3))
    q, r = jnp.linalg.qr(m)
    return q * jnp.sign(jnp.diag(r))


class TestBasics:

    def test_shifted_softplus_zero(self):
        assert abs(float(shifted_softplus(jnp.array(0.0)))) < 1e-7

    def test_rbf_partition(self):
        """Each basis peaks at its center with value 1."""
        r = gaussian_rbf(jnp.linspace(0.0, 3.0, 8), 8, 3.0)
        np.testing.assert_allclose(jnp.diag(r), 1.0, atol=1e-6)

    def test_cutoff_envelope(self):
        c = cosine_cutoff(jnp.array([0.0, 1.5, 3.0, 5.0]), 3.0)
        np.testing.assert_allclose(c, [1.0, 0.5, 0.0, 0.0], atol=1e-6)

    def test_output_shape(self):
        emb = _embed()
        coords, info = _cloud()
        out = emb(coords, info)
        assert out.shape == (4, 6)
        assert jnp.isfinite(out).all()


class TestInvariance:

    def test_rotation_invariant_about_site(self):
        """Rotating the ref-centered cloud leaves the embedding unchanged
        (same guarantee as the GA-attention embedding)."""
        emb = _embed()
        coords, info = _cloud()
        out = emb(coords, info)
        rot = _rotation()
        np.testing.assert_allclose(emb(coords @ rot.T, info), out, atol=1e-4)

    def test_permutation_invariant(self):
        emb = _embed()
        coords, info = _cloud()
        perm = jax.random.permutation(jax.random.PRNGKey(5), coords.shape[1])
        np.testing.assert_allclose(emb(coords[:, perm], info[:, perm]),
                                   emb(coords, info), atol=1e-5)

    def test_not_translation_invariant(self):
        """Distance-to-site channel: shifting the cloud off the site must
        change the embedding (plain SchNet would be blind to this)."""
        emb = _embed()
        coords, info = _cloud()
        shifted = emb(coords + jnp.array([1.0, 0.0, 0.0]), info)
        assert float(jnp.max(jnp.abs(shifted - emb(coords, info)))) > 1e-4


class TestMasking:

    def test_zero_rows_are_padding(self):
        """Appending all-zero rows (DistanceSelection's invalid-row fill)
        does not change the embedding."""
        emb = _embed()
        coords, info = _cloud(n=6)
        pad_c = jnp.concatenate([coords, jnp.zeros((4, 3, 3))], axis=1)
        pad_i = jnp.concatenate(
            [info, jax.random.normal(jax.random.PRNGKey(9), (4, 3, 2))],
            axis=1)
        np.testing.assert_allclose(emb(pad_c, pad_i), emb(coords, info),
                                   atol=1e-5)

    def test_explicit_mask_overrides(self):
        emb = _embed()
        coords, info = _cloud(n=6)
        mask = jnp.ones((4, 6), bool).at[:, -2:].set(False)
        np.testing.assert_allclose(
            emb(coords, info, mask=mask),
            emb(coords[:, :4], info[:, :4]), atol=1e-5)

    def test_fully_masked_embeds_to_zero(self):
        emb = _embed()
        coords, info = _cloud(n=5)
        out = emb(coords, info, mask=jnp.zeros((4, 5), bool))
        np.testing.assert_allclose(out, 0.0, atol=1e-7)

    def test_single_atom_no_self_interaction(self):
        """One atom: no pairs, but the node still embeds finitely."""
        emb = _embed()
        coords = jnp.ones((2, 1, 3))
        info = jnp.ones((2, 1, 2))
        out = emb(coords, info)
        assert jnp.isfinite(out).all()
        assert float(jnp.max(jnp.abs(out))) > 0.0


class TestGradientsAndTraining:

    def test_gradients_finite_at_coincident_atoms(self):
        emb = _embed()
        coords = jnp.zeros((1, 4, 3)).at[:, :, 0].set(0.5)  # all coincident
        info = jnp.ones((1, 4, 2))

        def f(c):
            return jnp.sum(emb(c, info))

        g = jax.grad(f)(coords)
        assert jnp.isfinite(g).all()

    def test_learns_radial_statistic(self):
        """A few optax steps reduce the loss on predicting the mean
        distance-to-site — the channel plain pair-distance SchNet lacks."""
        emb = _embed()
        coords, info = _cloud(n=8, batch=64, scale=1.2, seed=11)
        target = jnp.mean(jnp.linalg.norm(coords, axis=-1), axis=-1)

        def loss_fn(e):
            pred = e(coords, info)[:, 0]
            return jnp.mean((pred - target) ** 2)

        opt = optax.adam(1e-2)
        state = opt.init(emb)

        @jax.jit
        def step(e, s):
            l, g = jax.value_and_grad(loss_fn)(e)
            up, s = opt.update(g, s)
            return optax.apply_updates(e, up), s, l

        l0 = float(loss_fn(emb))
        for _ in range(60):
            emb, state, l = step(emb, state)
        assert float(l) < 0.5 * l0


class TestIntegration:

    def test_plugs_into_local_particle_descriptors(self):
        lpd = LocalParticleDescriptors(
            select=DistanceSelection.create(cutoff=3.0, max_included=8),
            embed=_embed(cutoff=3.0))
        coords = jax.random.normal(jax.random.PRNGKey(1), (5, 12, 3)) * 2.0
        info = jax.random.normal(jax.random.PRNGKey(2), (5, 12, 2))
        ref = jax.random.normal(jax.random.PRNGKey(3), (5, 3)) * 0.2
        out = lpd(coords, ref, info)
        assert out.shape == (5, 6)
        # Rigid translation of the whole frame is invariant.
        shift = jnp.array([10.0, -5.0, 3.0])
        np.testing.assert_allclose(lpd(coords + shift, ref + shift, info),
                                   out, atol=1e-3)

    def test_config_builds_and_round_trips(self):
        c = cfg.ParticleEmbeddingConfig(info_dim=2, embedding_dim=6,
                                        hidden_dim=8, kind="schnet",
                                        n_rbf=8, rbf_cutoff=3.0)
        c2 = cfg.from_dict(None, cfg.to_tagged_dict(c))
        assert c2 == c
        emb = c2.build(jax.random.PRNGKey(0))
        assert isinstance(emb, SchNetEmbedding)
        coords, info = _cloud()
        assert emb(coords, info).shape == (4, 6)

    def test_config_rejects_unknown_kind(self):
        with pytest.raises(ValueError, match="kind"):
            cfg.ParticleEmbeddingConfig(kind="nope").build(
                jax.random.PRNGKey(0))

    def test_backmapping_config_with_schnet(self):
        """BackmappingConfig with kind='schnet' trains end-to-end
        (reference workload §3.4 with the roadmap embedding)."""
        c = cfg.BackmappingConfig(
            selection=cfg.DistanceSelectionConfig(cutoff=3.0,
                                                  max_included=8),
            embedding=cfg.ParticleEmbeddingConfig(
                info_dim=2, embedding_dim=12, hidden_dim=8,
                num_blocks=1, kind="schnet", n_rbf=8, rbf_cutoff=3.0),
            decoder=cfg.MappingToDistConfig(
                input_shape=12,
                dist=cfg.FlowedDistConfig(
                    flow=cfg.MAFConfig(
                        data_dim=3, num_blocks=1,
                        rqs=cfg.RQSParams(
                            num_bins=4, hidden_dim=8,
                            bin_range=(-np.pi, np.pi),
                            conditional=True,
                            conditional_event_shape=12)),
                    base=cfg.DistLayerConfig(
                        kind="independent_blockwise", num_dofs=3,
                        families="von_mises")),
                mapping_kwargs={"hidden_dim": 8}))
        model = c.build(jax.random.PRNGKey(0))
        n = 16
        coords = jax.random.normal(jax.random.PRNGKey(8), (n, 10, 3)) * 1.5
        info = jax.random.normal(jax.random.PRNGKey(9), (n, 10, 2))
        cg_ref = jax.random.normal(jax.random.PRNGKey(10), (n, 3)) * 0.3
        tors = jax.random.uniform(jax.random.PRNGKey(7), (n, 3),
                                  minval=-np.pi, maxval=np.pi)

        def loss_fn(m):
            return -jnp.mean(m(cg_ref, coords, info).log_prob(tors))

        l0 = float(loss_fn(model))
        assert np.isfinite(l0)
        opt = optax.adam(5e-3)
        state = opt.init(model)

        @jax.jit
        def step(m, s):
            l, g = jax.value_and_grad(loss_fn)(m)
            up, s = opt.update(g, s)
            return optax.apply_updates(m, up), s, l

        for _ in range(20):
            model, state, l = step(model, state)
        assert float(l) < l0
