"""GA attention tests: rotation invariance, permutation equivariance /
invariance, zero-mask correctness, and the backmapping workload
(config 3: conditional von Mises + MAF decoder over a local environment).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vaemolsim_tpu.dists import FlowedDistribution, IndependentBlockwise
from vaemolsim_tpu.flows import RQSSplineMAF
from vaemolsim_tpu.models import BackmappingOnly, MappingToDistribution
from vaemolsim_tpu.nn import (AttentionBlock, DistanceSelection,
                              LocalParticleDescriptors, ParticleEmbedding,
                              VectorAttention, VectorAttentionTwoStage)


def random_rotation(key):
    """Random 3x3 rotation via QR of a Gaussian matrix."""
    A = jax.random.normal(key, (3, 3))
    Q, R = jnp.linalg.qr(A)
    return Q * jnp.sign(jnp.diag(R))


@pytest.fixture
def cloud():
    key = jax.random.PRNGKey(0)
    coords = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 3))
    values = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 5))
    return coords, values


ATTN_CLASSES = {"fused": VectorAttention,
                "two_stage": VectorAttentionTwoStage}


@pytest.fixture(params=["fused", "two_stage"])
def attn_cls(request):
    """Both variants (the fast fused default and the external package's
    two-stage structure) carry identical invariance guarantees."""
    return ATTN_CLASSES[request.param]


class TestVectorAttention:

    def test_shapes(self, cloud, attn_cls):
        coords, values = cloud
        attn = attn_cls.create(jax.random.PRNGKey(3), 5, 7)
        out = attn(coords, values)
        assert out.shape == (2, 6, 7)
        red = attn_cls.create(jax.random.PRNGKey(3), 5, 7, reduce=True)
        assert red(coords, values).shape == (2, 7)

    def test_rotation_invariance(self, cloud, attn_cls):
        coords, values = cloud
        attn = attn_cls.create(jax.random.PRNGKey(3), 5, 7)
        Q = random_rotation(jax.random.PRNGKey(4))
        out1 = attn(coords, values)
        out2 = attn(coords @ Q.T, values)
        np.testing.assert_allclose(out1, out2, atol=1e-4)

    def test_permutation_equivariance(self, cloud, attn_cls):
        coords, values = cloud
        attn = attn_cls.create(jax.random.PRNGKey(3), 5, 7)
        perm = jnp.asarray([3, 1, 5, 0, 4, 2])
        out_perm = attn(coords[:, perm], values[:, perm])
        np.testing.assert_allclose(out_perm, attn(coords, values)[:, perm],
                                   atol=1e-4)

    def test_reduce_permutation_invariance(self, cloud, attn_cls):
        coords, values = cloud
        attn = attn_cls.create(jax.random.PRNGKey(3), 5, 7,
                               reduce=True)
        perm = jnp.asarray([3, 1, 5, 0, 4, 2])
        np.testing.assert_allclose(attn(coords[:, perm], values[:, perm]),
                                   attn(coords, values), atol=1e-4)

    def test_mask_excludes_particles(self, cloud, attn_cls):
        coords, values = cloud
        attn = attn_cls.create(jax.random.PRNGKey(3), 5, 7,
                               reduce=True)
        mask = jnp.array([[True] * 4 + [False] * 2] * 2)
        out_masked = attn(coords, values, mask)
        # Garbage in masked slots must not change the output.
        coords2 = coords.at[:, 4:].set(1e3)
        values2 = values.at[:, 4:].set(-1e3)
        np.testing.assert_allclose(out_masked,
                                   attn(coords2, values2, mask), atol=1e-3)
        # And masking must matter.
        assert not np.allclose(out_masked, attn(coords, values))


class TestAttentionBlock:

    def test_residual_shape_and_rotation_invariance(self, cloud):
        coords, values = cloud
        block = AttentionBlock.create(jax.random.PRNGKey(5), 5)
        out = block(coords, values)
        assert out.shape == values.shape
        Q = random_rotation(jax.random.PRNGKey(6))
        np.testing.assert_allclose(block(coords @ Q.T, values), out,
                                   atol=1e-4)


class TestParticleEmbedding:

    def test_embedding_invariances(self):
        emb = ParticleEmbedding.create(jax.random.PRNGKey(0), info_dim=2,
                                       embedding_dim=8, num_blocks=2)
        coords = jax.random.normal(jax.random.PRNGKey(1), (3, 5, 3))
        info = jax.random.normal(jax.random.PRNGKey(2), (3, 5, 2))
        out = emb(coords, info)
        assert out.shape == (3, 8)
        Q = random_rotation(jax.random.PRNGKey(3))
        np.testing.assert_allclose(emb(coords @ Q.T, info), out, atol=1e-4)
        perm = jnp.asarray([4, 2, 0, 3, 1])
        np.testing.assert_allclose(emb(coords[:, perm], info[:, perm]), out,
                                   atol=1e-4)

    def test_mask_zero_rows(self):
        # Zero-coordinate rows are padding (reference Masking semantics).
        emb = ParticleEmbedding.create(jax.random.PRNGKey(0), info_dim=2,
                                       embedding_dim=8)
        coords = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 3))
        info = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 2))
        coords_pad = jnp.concatenate([coords, jnp.zeros((1, 3, 3))], axis=1)
        info_pad = jnp.concatenate([info, 7.0 * jnp.ones((1, 3, 2))], axis=1)
        np.testing.assert_allclose(emb(coords_pad, info_pad),
                                   emb(coords, info), atol=1e-4)


class TestLocalParticleDescriptors:

    def test_pipeline(self):
        lpd = LocalParticleDescriptors(
            select=DistanceSelection.create(cutoff=3.0, max_included=4),
            embed=ParticleEmbedding.create(jax.random.PRNGKey(0), info_dim=2,
                                           embedding_dim=6))
        coords = jax.random.normal(jax.random.PRNGKey(1), (5, 12, 3)) * 2.0
        info = jax.random.normal(jax.random.PRNGKey(2), (5, 12, 2))
        ref = jnp.zeros((5, 3))
        out = lpd(coords, ref, info)
        assert out.shape == (5, 6)
        # Translating everything (coords and ref) together is invariant.
        shift = jnp.array([10.0, -5.0, 3.0])
        np.testing.assert_allclose(lpd(coords + shift, ref + shift, info),
                                   out, atol=1e-3)


class TestBackmappingOnly:
    """Config 3: cutoff 3.0, max_included 10, embed 20, 3-DOF von Mises
    base + conditional MAF decoder (Backmapping notebook cells 4-8)."""

    def _model(self, key):
        keys = jax.random.split(key, 4)
        lpd = LocalParticleDescriptors(
            select=DistanceSelection.create(cutoff=3.0, max_included=10),
            embed=ParticleEmbedding.create(keys[0], info_dim=2,
                                           embedding_dim=20))
        flow = RQSSplineMAF.create(
            keys[1], 3, num_blocks=2,
            rqs_params={"num_bins": 8, "hidden_dim": 16,
                        "bin_range": [-np.pi, np.pi], "conditional": True,
                        "conditional_event_shape": 20})
        dec_dist = FlowedDistribution(
            flow=flow,
            base_layer=IndependentBlockwise.create(3, "von_mises"))
        decoder = MappingToDistribution.create(
            keys[2], dec_dist, input_shape=20,
            mapping_kwargs={"hidden_dim": 16})
        return BackmappingOnly(mask_and_embed=lpd, decoder=decoder)

    def _data(self, n=32):
        k = jax.random.PRNGKey(7)
        coords = jax.random.normal(jax.random.PRNGKey(8), (n, 15, 3)) * 1.5
        info = jax.random.normal(jax.random.PRNGKey(9), (n, 15, 2))
        cg_ref = jax.random.normal(jax.random.PRNGKey(10), (n, 3)) * 0.3
        torsions = jax.random.uniform(k, (n, 3), minval=-np.pi,
                                      maxval=np.pi)
        return cg_ref, coords, info, torsions

    def test_forward_and_sample(self):
        model = self._model(jax.random.PRNGKey(0))
        cg_ref, coords, info, torsions = self._data()
        dist = model(cg_ref, coords, info)
        lp = dist.log_prob(torsions)
        assert lp.shape == (32,)
        assert jnp.isfinite(lp).all()
        s = model.predict(cg_ref, coords, info, jax.random.PRNGKey(1))
        assert s.shape == (32, 3)
        assert jnp.all(jnp.abs(s) <= np.pi + 1e-4)

    def test_trains(self):
        model = self._model(jax.random.PRNGKey(0))
        cg_ref, coords, info, torsions = self._data()

        def loss_fn(m):
            return -jnp.mean(m(cg_ref, coords, info).log_prob(torsions))

        opt = optax.adam(1e-3)
        st = opt.init(model)

        @jax.jit
        def step(m, s):
            l, g = jax.value_and_grad(loss_fn)(m)
            u, s = opt.update(g, s)
            return optax.apply_updates(m, u), s, l

        l0 = float(loss_fn(model))
        for _ in range(20):
            model, st, l = step(model, st)
        assert float(l) < l0

    def test_masked_particles(self):
        model = self._model(jax.random.PRNGKey(0))
        cg_ref, coords, info, torsions = self._data()
        mask = jnp.ones(coords.shape[:2], bool).at[:, 10:].set(False)
        coords_garbage = coords.at[:, 10:].set(0.5)
        d1 = model(cg_ref, coords, info, mask=mask)
        d2 = model(cg_ref, coords_garbage, info, mask=mask)
        np.testing.assert_allclose(d1.log_prob(torsions),
                                   d2.log_prob(torsions), atol=1e-3)


class TestCapabilityEquivalence:
    """The fused VectorAttention (default) and the external package's
    two-stage structure (VectorAttentionTwoStage) are expressively
    equivalent on the workload that matters: learning a rotation-
    invariant function of a local particle environment (VERDICT round-2
    item 6 — in-container half of the evidence; the out-of-container
    golden harness is tools/gaa_reference_parity.py)."""

    def _fit_embedding(self, attention: str, seed: int = 0):
        key = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        coords = jax.random.normal(k1, (256, 8, 3))
        info = jax.random.normal(k2, (256, 8, 2))
        # Invariant regression target: a smooth two-body kernel.
        d2 = jnp.sum(
            (coords[:, :, None, :] - coords[:, None, :, :]) ** 2, axis=-1)
        target = jnp.sum(jnp.exp(-d2 / 4.0), axis=(1, 2)) / 8.0

        emb = ParticleEmbedding.create(k3, info_dim=2, embedding_dim=8,
                                       hidden_dim=16, num_blocks=1,
                                       mask_zero=False,
                                       attention=attention)
        from vaemolsim_tpu.nn.core import Dense
        head = Dense.create(jax.random.PRNGKey(seed + 10), 8, 1)
        model = (emb, head)

        def loss_fn(m):
            e, h = m
            pred = h(e(coords, info))[..., 0]
            return jnp.mean((pred - target) ** 2)

        opt = optax.adam(3e-3)
        st = opt.init(model)

        @jax.jit
        def run(model, st):
            def body(c, _):
                m, s = c
                l, g = jax.value_and_grad(loss_fn)(m)
                u, s = opt.update(g, s)
                return (optax.apply_updates(m, u), s), l

            (model, st), losses = jax.lax.scan(body, (model, st), None,
                                               length=400)
            return model, st, losses

        model, st, losses = run(model, st)
        base = float(jnp.mean((target - jnp.mean(target)) ** 2))
        return float(losses[0]) / base, float(losses[-1]) / base

    def test_both_variants_learn_the_invariant_task(self):
        first_f, final_f = self._fit_embedding("fused")
        first_t, final_t = self._fit_embedding("two_stage")
        # Both must explain most of the variance...
        assert final_f < 0.15, (first_f, final_f)
        assert final_t < 0.15, (first_t, final_t)
        # ... and neither dramatically out-learns the other.
        assert final_t < 10 * final_f + 0.02
        assert final_f < 10 * final_t + 0.02


class TestComputeDtypeGrid:
    """The bf16-compute path keeps the (N, N, H) pair-grid
    intermediates in the compute dtype (round-5 embed traffic halving,
    docs/performance.md): outputs must stay f32, agree with the f32
    path to bf16 tolerance, and differentiate finitely."""

    def test_bf16_grid_parity_and_dtypes(self):
        from vaemolsim_tpu.nn.attention import VectorAttention
        from vaemolsim_tpu.nn.core import set_compute_dtype
        attn = VectorAttention.create(jax.random.PRNGKey(0), 8, 6,
                                      hidden_dim=16, reduce=True)
        c = jax.random.normal(jax.random.PRNGKey(1), (4, 12, 3))
        v = jax.random.normal(jax.random.PRNGKey(2), (4, 12, 8))
        m = jax.random.uniform(jax.random.PRNGKey(3), (4, 12)) > 0.2
        ref = attn._xla_call(c, v, m)
        try:
            set_compute_dtype(jnp.bfloat16)
            got = attn._xla_call(c, v, m)
            g = jax.grad(lambda cc: attn._xla_call(cc, v, m)
                         .astype(jnp.float32).sum())(c)
        finally:
            set_compute_dtype(None)
        assert got.dtype == ref.dtype == jnp.float32
        assert float(jnp.max(jnp.abs(got - ref))) < 0.05
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_bf16_grid_equivariant_path(self):
        from vaemolsim_tpu.nn.attention import VectorAttention
        from vaemolsim_tpu.nn.core import set_compute_dtype
        attn = VectorAttention.create(jax.random.PRNGKey(4), 8, 6,
                                      hidden_dim=16, reduce=False)
        c = jax.random.normal(jax.random.PRNGKey(5), (3, 10, 3))
        v = jax.random.normal(jax.random.PRNGKey(6), (3, 10, 8))
        ref = attn._xla_call(c, v, None)
        try:
            set_compute_dtype(jnp.bfloat16)
            got = attn._xla_call(c, v, None)
        finally:
            set_compute_dtype(None)
        assert got.shape == ref.shape and got.dtype == jnp.float32
        assert float(jnp.max(jnp.abs(got - ref))) < 0.05
