"""Differentiable fused coarse transformer vs flax autodiff (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from featurematching_tpu.models.transformer import LocalFeatureTransformer
from featurematching_tpu.ops.pallas_coarse_grad import coarse_transformer_train


def _make(rng, B, N, C, nhead, layer_names):
    tf = LocalFeatureTransformer(C, nhead, layer_names, "linear", jnp.float32)
    f0 = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32) * 0.5)
    f1 = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32) * 0.5)
    variables = tf.init(jax.random.PRNGKey(0), f0, f1)
    w0 = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
    return tf, variables["params"], f0, f1, w0, w1


class TestCoarseTrainFused:
    @pytest.mark.parametrize(
        "B,N,C,nhead,layer_names",
        [
            (2, 64, 128, 8, ("self", "cross")),
            (1, 96, 128, 4, ("cross", "self", "cross")),
        ],
    )
    @pytest.mark.slow
    def test_grads_match_flax(self, rng, B, N, C, nhead, layer_names):
        """Value + input grads + EVERY weight grad vs flax autodiff (f32)."""
        tf, params, f0, f1, w0, w1 = _make(rng, B, N, C, nhead, layer_names)

        def loss_ref(p, a, b):
            r0, r1 = tf.apply({"params": p}, a, b)
            return jnp.sum(r0 * w0) + 2.0 * jnp.sum(r1 * w1)

        def loss_fused(p, a, b):
            g0, g1 = coarse_transformer_train(
                a, b, p, tuple(layer_names), nhead, 32, True
            )
            return jnp.sum(g0 * w0) + 2.0 * jnp.sum(g1 * w1)

        vr, gr = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(params, f0, f1)
        vf, gf = jax.value_and_grad(loss_fused, argnums=(0, 1, 2))(params, f0, f1)
        np.testing.assert_allclose(float(vf), float(vr), rtol=1e-4)

        flat_r, tree_r = jax.tree_util.tree_flatten_with_path(gr)
        flat_f, tree_f = jax.tree_util.tree_flatten_with_path(gf)
        assert tree_r == tree_f
        for (path_r, leaf_r), (_, leaf_f) in zip(flat_r, flat_f):
            scale = max(1.0, float(jnp.max(jnp.abs(leaf_r))))
            np.testing.assert_allclose(
                np.asarray(leaf_f), np.asarray(leaf_r),
                rtol=2e-4, atol=2e-4 * scale,
                err_msg=jax.tree_util.keystr(path_r),
            )

    def test_flax_wiring_param_compat(self, rng):
        """use_fused_train=True must produce the SAME param tree as the
        per-op path (checkpoint compatibility) and the same outputs."""
        B, N, C, nhead = 1, 64, 128, 8
        layer_names = ("self", "cross")
        f0 = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
        f1 = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
        tf_plain = LocalFeatureTransformer(C, nhead, layer_names, "linear")
        tf_fused = LocalFeatureTransformer(
            C, nhead, layer_names, "linear", use_fused_train=True
        )
        v_plain = tf_plain.init(jax.random.PRNGKey(1), f0, f1)
        v_fused = tf_fused.init(jax.random.PRNGKey(1), f0, f1)
        sp = jax.tree_util.tree_map(jnp.shape, v_plain)
        sf = jax.tree_util.tree_map(jnp.shape, v_fused)
        assert jax.tree_util.tree_structure(sp) == jax.tree_util.tree_structure(sf)
        assert sp == sf

        r0, r1 = tf_plain.apply(v_plain, f0, f1)
        g0, g1 = tf_fused.apply(v_plain, f0, f1)  # same weights
        np.testing.assert_allclose(np.asarray(g0), np.asarray(r0), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(r1), rtol=2e-4, atol=2e-4)

    def test_fallback_unsupported_dims(self, rng):
        """C=64 (< 128 lanes) must silently use the per-op path, grads and
        all — exercised via jax.grad through the flax module."""
        B, N, C, nhead = 1, 32, 64, 8
        f0 = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
        f1 = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
        tf_fused = LocalFeatureTransformer(
            C, nhead, ("self", "cross"), "linear", use_fused_train=True
        )
        v = tf_fused.init(jax.random.PRNGKey(0), f0, f1)

        def loss(p):
            a, b = tf_fused.apply({"params": p}, f0, f1)
            return jnp.sum(a**2) + jnp.sum(b**2)

        g = jax.grad(loss)(v["params"])
        assert all(
            bool(jnp.isfinite(x).all()) for x in jax.tree_util.tree_leaves(g)
        )
