"""nn layer tests: FCDeepNN (shapes, periodic expansion, batch norm), CG
maps, DistanceSelection, MADE autoregressive property.

Mirrors reference test_mappings.py construction/shape/semantics style.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaemolsim_tpu.nn import (MADE, CGCenterOfMass, CGCentroid,
                              DistanceSelection, FCDeepNN)


class TestFCDeepNN:

    def test_shapes_flat_target(self):
        net = FCDeepNN.create(jax.random.PRNGKey(0), input_shape=6,
                              target_shape=4, hidden_dim=32)
        out = net(jnp.ones((7, 6)))
        assert out.shape == (7, 4)

    def test_shapes_tuple_target_and_multihidden(self):
        net = FCDeepNN.create(jax.random.PRNGKey(0), input_shape=(3, 2),
                              target_shape=(5, 2), hidden_dim=[16, 8])
        out = net(jnp.ones((7, 3, 2)))
        assert out.shape == (7, 5, 2)
        assert len(net.layers) == 2

    def test_periodic_expansion_invariance(self):
        # A fully periodic input shifted by 2*pi must map identically.
        net = FCDeepNN.create(jax.random.PRNGKey(0), input_shape=4,
                              target_shape=3, periodic_dofs=True)
        x = jnp.array([[0.3, -1.2, 2.0, 3.0]])
        np.testing.assert_allclose(net(x), net(x + 2 * np.pi), atol=1e-5)

    def test_partial_periodic_mask(self):
        mask = [True, False, False, True]
        net = FCDeepNN.create(jax.random.PRNGKey(0), input_shape=4,
                              target_shape=3, periodic_dofs=mask)
        x = jnp.array([[0.3, -1.2, 2.0, 3.0]])
        shift = jnp.array([[2 * np.pi, 0.0, 0.0, -2 * np.pi]])
        np.testing.assert_allclose(net(x), net(x + shift), atol=1e-5)
        # Shifting a non-periodic DOF must change the output.
        assert not np.allclose(net(x), net(x + jnp.array([[0., 1., 0., 0.]])))

    def test_periodic_mask_validation(self):
        with pytest.raises(ValueError):
            FCDeepNN.create(jax.random.PRNGKey(0), input_shape=4,
                            target_shape=3, periodic_dofs=[True, False])

    def test_batch_norm_train_flag(self):
        net = FCDeepNN.create(jax.random.PRNGKey(0), input_shape=4,
                              target_shape=3, batch_norm=True)
        x = jax.random.normal(jax.random.PRNGKey(1), (32, 4)) * 5.0
        out_train = net(x, train=True)
        out_eval = net(x, train=False)
        assert not np.allclose(out_train, out_eval)

    def test_batch_norm_stats_update(self):
        net = FCDeepNN.create(jax.random.PRNGKey(0), input_shape=4,
                              target_shape=3, batch_norm=True)
        x = jax.random.normal(jax.random.PRNGKey(1), (32, 4)) * 5.0
        _, net2 = net.call_and_update(x, train=True)
        assert not np.allclose(net2.bns[0].mean, net.bns[0].mean)

    def test_trainable_pytree(self):
        net = FCDeepNN.create(jax.random.PRNGKey(0), input_shape=4,
                              target_shape=2)

        def loss(m, x):
            return jnp.sum(m(x) ** 2)

        g = jax.grad(loss)(net, jnp.ones((3, 4)))
        assert g.layers[0].kernel.shape == net.layers[0].kernel.shape
        assert float(jnp.sum(jnp.abs(g.layers[0].kernel))) > 0


class TestCGMaps:

    def test_centroid(self):
        cg = CGCentroid.create([2, 3])
        coords = jnp.arange(5 * 3, dtype=jnp.float32).reshape(1, 5, 3)
        out = cg(coords)
        assert out.shape == (1, 2, 3)
        np.testing.assert_allclose(out[0, 0], coords[0, :2].mean(0), rtol=1e-6)
        np.testing.assert_allclose(out[0, 1], coords[0, 2:].mean(0), rtol=1e-6)

    def test_center_of_mass(self):
        masses = [1.0, 3.0, 2.0, 2.0]
        cg = CGCenterOfMass.create([2, 2], masses)
        coords = jnp.array([[[0., 0, 0], [4, 0, 0], [0, 2, 0], [0, 6, 0]]])
        out = cg(coords)
        np.testing.assert_allclose(out[0, 0], [3.0, 0, 0], rtol=1e-6)
        np.testing.assert_allclose(out[0, 1], [0, 4.0, 0], rtol=1e-6)

    def test_from_residue_dict(self):
        cg = CGCenterOfMass.from_residue_dict(
            {"ALA": [1.0, 2.0], "GLY": [1.0]}, ["GLY", "ALA"])
        assert cg.agg.shape == (2, 3)
        np.testing.assert_allclose(cg.agg[0], [1.0, 0, 0], rtol=1e-6)


class TestDistanceSelection:

    def test_nearest_selection_and_cutoff(self):
        sel = DistanceSelection.create(cutoff=2.0, max_included=3)
        coords = jnp.array([[[1.0, 0, 0], [0, 5.0, 0], [0, 0, 0.5],
                             [3.0, 0, 0]]])
        ref = jnp.zeros((1, 3))
        out, mask, _ = sel(coords, ref)
        assert out.shape == (1, 3, 3)
        # Nearest three: (0,0,0.5), (1,0,0), (3,0,0); last exceeds cutoff.
        np.testing.assert_allclose(out[0, 0], [0, 0, 0.5], atol=1e-6)
        np.testing.assert_allclose(out[0, 1], [1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(out[0, 2], [0, 0, 0], atol=1e-6)
        assert mask[0].tolist() == [True, True, False]

    def test_particle_mask_excludes_padding(self):
        # Masked-out particle at origin must not be selected even though
        # it is nearest (replaces the reference's ragged-row handling).
        sel = DistanceSelection.create(cutoff=10.0, max_included=2)
        coords = jnp.array([[[0.01, 0, 0], [1.0, 0, 0], [2.0, 0, 0]]])
        pmask = jnp.array([[False, True, True]])
        out, mask, _ = sel(coords, jnp.zeros((1, 3)), mask=pmask)
        np.testing.assert_allclose(out[0, 0], [1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(out[0, 1], [2, 0, 0], atol=1e-6)

    def test_periodic_wrap(self):
        sel = DistanceSelection.create(cutoff=3.0, max_included=1,
                                       box_lengths=[10.0, 10.0, 10.0])
        coords = jnp.array([[[9.5, 0, 0]]])
        ref = jnp.zeros((1, 3))
        out, mask, _ = sel(coords, ref)
        # Minimum image: 9.5 - 10 = -0.5.
        np.testing.assert_allclose(out[0, 0], [-0.5, 0, 0], atol=1e-6)
        assert bool(mask[0, 0])

    def test_per_call_box_override(self):
        sel = DistanceSelection.create(cutoff=3.0, max_included=1)
        coords = jnp.array([[[9.5, 0, 0]]])
        out, _, _ = sel(coords, jnp.zeros((1, 3)),
                        box_lengths=jnp.array([10.0, 10.0, 10.0]))
        np.testing.assert_allclose(out[0, 0], [-0.5, 0, 0], atol=1e-6)

    def test_info_coselection(self):
        sel = DistanceSelection.create(cutoff=5.0, max_included=2)
        coords = jnp.array([[[1.0, 0, 0], [2.0, 0, 0], [9.0, 0, 0]]])
        info = jnp.array([[[10.0], [20.0], [30.0]]])
        _, _, sel_info = sel(coords, jnp.zeros((1, 3)), particle_info=info)
        np.testing.assert_allclose(sel_info[0, :, 0], [10.0, 20.0], atol=1e-6)


class TestMADE:

    @pytest.mark.parametrize("order", ["left-to-right", "right-to-left",
                                       [3, 1, 4, 2]])
    def test_autoregressive_property(self, order):
        D, P = 4, 5
        net = MADE.create(jax.random.PRNGKey(0), D, P, hidden_units=[32, 16],
                          input_order=order)
        x = jax.random.normal(jax.random.PRNGKey(1), (D,))
        jac = jax.jacfwd(lambda t: net(t))(x)  # (D, P, D)
        degrees = np.asarray(net.input_order_static)
        for j in range(D):
            for i in range(D):
                block = np.asarray(jac[j, :, i])
                if degrees[i] >= degrees[j]:
                    np.testing.assert_allclose(block, 0.0, atol=1e-7,
                                               err_msg=f"j={j} i={i}")

    def test_first_dof_constant(self):
        # The lowest-degree output must be constant in the input.
        net = MADE.create(jax.random.PRNGKey(0), 3, 2)
        a = net(jnp.zeros(3))
        b = net(jnp.ones(3) * 7.0)
        np.testing.assert_allclose(a[0], b[0], atol=1e-6)

    def test_conditional_input(self):
        net = MADE.create(jax.random.PRNGKey(0), 3, 2, conditional=True,
                          conditional_event_size=4)
        x = jnp.zeros((2, 3))
        c1 = jnp.zeros((2, 4))
        c2 = jnp.ones((2, 4))
        assert not np.allclose(net(x, c1), net(x, c2))
        # All outputs (including the first DOF) see the conditional input.
        assert not np.allclose(net(x, c1)[:, 0], net(x, c2)[:, 0])

    def test_conditional_required(self):
        net = MADE.create(jax.random.PRNGKey(0), 3, 2, conditional=True,
                          conditional_event_size=4)
        with pytest.raises(ValueError):
            net(jnp.zeros((2, 3)))

    def test_one_dim_event(self):
        # D=1: output may not depend on the input at all.
        net = MADE.create(jax.random.PRNGKey(0), 1, 3)
        a = net(jnp.zeros((2, 1)))
        b = net(jnp.full((2, 1), 5.0))
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_output_shape(self):
        net = MADE.create(jax.random.PRNGKey(0), 5, 7)
        out = net(jnp.ones((2, 3, 5)))
        assert out.shape == (2, 3, 5, 7)

    def test_bad_order_raises(self):
        with pytest.raises(ValueError):
            MADE.create(jax.random.PRNGKey(0), 3, 2, input_order=[1, 1, 2])


def test_dense_bf16_matches_stack_path():
    """Per-layer Dense and the fused dense_stack_xla must produce
    identical bf16 numerics for the same weights (they share a dtype
    flow: matmul/bias/activation in the compute dtype)."""
    from vaemolsim_tpu.nn.core import Dense, set_compute_dtype
    from vaemolsim_tpu.ops.fused_mlp import dense_stack_xla

    lyr = Dense.create(jax.random.PRNGKey(0), 4, 8, activation="tanh")
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 4))
    set_compute_dtype(jnp.bfloat16)
    try:
        got = lyr(x)
        want = dense_stack_xla(x, [lyr.kernel], [lyr.bias], ["tanh"])
        assert got.dtype == x.dtype
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    finally:
        set_compute_dtype(None)


def test_cg_aggregation_not_trainable():
    """The CG aggregation matrix is a physical constant: gradients must
    not flow into it even though it is a pytree leaf."""
    from vaemolsim_tpu.nn import CGCenterOfMass, CGCentroid

    for layer in (CGCentroid.create([2, 3]),
                  CGCenterOfMass.create([2, 3],
                                        masses=np.asarray([1., 2., 1., 1., 3.]))):
        coords = jax.random.normal(jax.random.PRNGKey(0), (4, 5, 3))
        g = jax.grad(lambda l: jnp.sum(l(coords) ** 2))(layer)
        np.testing.assert_array_equal(np.asarray(g.agg), 0.0)
