"""Differentiable fused fine transformer vs flax autodiff (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from featurematching_tpu.models.transformer import LocalFeatureTransformer
from featurematching_tpu.ops.pallas_fine_grad import (
    fine_train_supported,
    fine_transformer_train,
)


def _make(rng, B_, N, C, nhead, layer_names):
    tf = LocalFeatureTransformer(C, nhead, layer_names, "linear", jnp.float32)
    w0 = jnp.asarray(rng.standard_normal((B_, N, C)).astype(np.float32) * 0.5)
    w1 = jnp.asarray(rng.standard_normal((B_, N, C)).astype(np.float32) * 0.5)
    variables = tf.init(jax.random.PRNGKey(0), w0, w1)
    c0 = jnp.asarray(rng.standard_normal((B_, N, C)).astype(np.float32))
    c1 = jnp.asarray(rng.standard_normal((B_, N, C)).astype(np.float32))
    return tf, variables["params"], w0, w1, c0, c1


class TestFineTrainFused:
    def test_supported(self):
        assert fine_train_supported(("self", "cross"), 64, 8, 49)
        assert not fine_train_supported(("self", "cross"), 64, 8, 4800)  # long
        assert not fine_train_supported(("self", "cross"), 8, 2, 49)  # tiny C

    @pytest.mark.parametrize(
        "B_,N,C,nhead,layer_names",
        [
            (8, 49, 64, 8, ("self", "cross")),  # flagship fine geometry
            (6, 25, 64, 4, ("cross", "self")),
            (4, 49, 128, 8, ("self", "cross", "self", "cross")),
        ],
    )
    @pytest.mark.slow
    def test_grads_match_flax(self, rng, B_, N, C, nhead, layer_names):
        """Value + input grads + EVERY weight grad vs flax autodiff (f32),
        incl. the sublane-padded ww=49->56 case."""
        tf, params, w0, w1, c0, c1 = _make(rng, B_, N, C, nhead, layer_names)

        def loss_ref(p, a, b):
            r0, r1 = tf.apply({"params": p}, a, b)
            return jnp.sum(r0 * c0) + 2.0 * jnp.sum(r1 * c1)

        def loss_fused(p, a, b):
            g0, g1 = fine_transformer_train(
                a, b, p, tuple(layer_names), nhead, 2, True
            )
            return jnp.sum(g0 * c0) + 2.0 * jnp.sum(g1 * c1)

        vr, gr = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(params, w0, w1)
        vf, gf = jax.value_and_grad(loss_fused, argnums=(0, 1, 2))(params, w0, w1)
        np.testing.assert_allclose(float(vf), float(vr), rtol=1e-4)

        flat_r, tree_r = jax.tree_util.tree_flatten_with_path(gr)
        flat_f, tree_f = jax.tree_util.tree_flatten_with_path(gf)
        assert tree_r == tree_f
        for (path_r, leaf_r), (_, leaf_f) in zip(flat_r, flat_f):
            scale = max(1.0, float(jnp.max(jnp.abs(leaf_r))))
            np.testing.assert_allclose(
                np.asarray(leaf_f), np.asarray(leaf_r),
                rtol=3e-4, atol=3e-4 * scale,
                err_msg=jax.tree_util.keystr(path_r),
            )

    def test_flax_wiring_fine_route(self, rng):
        """use_fused_train=True at window scale (C=64 < coarse's 128) must
        route to the fine VJP: same param tree, same outputs, finite grads."""
        B_, N, C, nhead = 4, 49, 64, 8
        layer_names = ("self", "cross")
        w0 = jnp.asarray(rng.standard_normal((B_, N, C)).astype(np.float32))
        w1 = jnp.asarray(rng.standard_normal((B_, N, C)).astype(np.float32))
        tf_plain = LocalFeatureTransformer(C, nhead, layer_names, "linear")
        tf_fused = LocalFeatureTransformer(
            C, nhead, layer_names, "linear", use_fused_train=True
        )
        v = tf_plain.init(jax.random.PRNGKey(1), w0, w1)
        v2 = tf_fused.init(jax.random.PRNGKey(1), w0, w1)
        sp = jax.tree_util.tree_map(jnp.shape, v)
        sf = jax.tree_util.tree_map(jnp.shape, v2)
        assert sp == sf

        r0, r1 = tf_plain.apply(v, w0, w1)
        g0, g1 = tf_fused.apply(v, w0, w1)
        np.testing.assert_allclose(np.asarray(g0), np.asarray(r0), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(r1), rtol=2e-4, atol=2e-4)

        def loss(p):
            a, b = tf_fused.apply({"params": p}, w0, w1)
            return jnp.sum(a**2) + jnp.sum(b**2)

        g = jax.grad(loss)(v["params"])
        assert all(bool(jnp.isfinite(x).all()) for x in jax.tree_util.tree_leaves(g))
