"""Linen SwinUNet with the fully-fused differentiable block (fused_block='on',
interpret mode on CPU) vs the per-op path: identical param trees, matching
forward and gradients. Closes VERDICT round-1 weak #1 for the training path."""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from featurematching_tpu.models.backbone_swin import SwinUNet

KW = dict(
    in_channels=1,
    patch_size=4,
    embed_dim=16,
    depths=(1, 1),
    depths_up=(1, 1),
    num_heads=(2, 4),
    window=4,
    mlp_ratio=2.0,
    drop_path_rate=0.0,
    dtype=jnp.float32,
)


def _models():
    return (
        SwinUNet(**KW, fused_block=False),
        SwinUNet(**KW, fused_block=True),
    )


class TestFusedBlockLinen:
    def test_param_tree_identical(self, rng):
        plain, fused = _models()
        x = jnp.asarray(rng.standard_normal((2, 32, 32, 1)).astype(np.float32))
        v0 = plain.init(jax.random.PRNGKey(0), x)
        v1 = fused.init(jax.random.PRNGKey(0), x)
        s0 = jax.tree_util.tree_structure(v0)
        s1 = jax.tree_util.tree_structure(v1)
        assert s0 == s1
        for a, b in zip(
            jax.tree_util.tree_leaves(v0), jax.tree_util.tree_leaves(v1)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_forward_matches_per_op(self, rng):
        plain, fused = _models()
        # 32x32 input -> token grids 8x8 and 4x4, both divisible by window 4:
        # no padding, so the pad-key LN difference (documented) doesn't apply
        x = jnp.asarray(rng.standard_normal((2, 32, 32, 1)).astype(np.float32))
        v = plain.init(jax.random.PRNGKey(0), x)
        c0, f0 = plain.apply(v, x)
        c1, f1 = fused.apply(v, x)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c0), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), rtol=2e-4, atol=2e-4)

    def test_grads_match_per_op(self, rng):
        plain, fused = _models()
        x = jnp.asarray(rng.standard_normal((2, 32, 32, 1)).astype(np.float32))
        v = plain.init(jax.random.PRNGKey(0), x)

        def loss(model, params):
            c, f = model.apply({"params": params}, x)
            return jnp.sum(c**2) + jnp.sum(f**2)

        g0 = jax.grad(lambda p: loss(plain, p))(v["params"])
        g1 = jax.grad(lambda p: loss(fused, p))(v["params"])
        flat0 = jax.tree_util.tree_leaves_with_path(g0)
        flat1 = jax.tree_util.tree_leaves_with_path(g1)
        for (p0, a), (_, b) in zip(flat0, flat1):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-3,
                err_msg=jax.tree_util.keystr(p0),
            )

    def test_droppath_training_runs_and_matches_stats(self, rng):
        kw = dict(KW, drop_path_rate=0.5)
        fused = SwinUNet(**kw, fused_block=True)
        x = jnp.asarray(rng.standard_normal((4, 32, 32, 1)).astype(np.float32))
        v = fused.init(jax.random.PRNGKey(0), x)

        def loss(params, key):
            c, f = fused.apply(
                {"params": params}, x, train=True, rngs={"droppath": key}
            )
            return jnp.sum(c**2)

        val, grads = jax.value_and_grad(loss)(v["params"], jax.random.PRNGKey(1))
        assert np.isfinite(float(val))
        for leaf in jax.tree_util.tree_leaves(grads):
            assert np.isfinite(np.asarray(leaf)).all()
        # different droppath keys give different losses (stochastic depth live)
        val2 = loss(v["params"], jax.random.PRNGKey(2))
        assert float(val) != float(val2)

    def test_padded_shapes_run(self, rng):
        """24x24 -> token grid 6x6 (pad 2 at window 4): path must still work;
        fused pads pre-LN (documented deviation), so only finiteness+shape."""
        plain, fused = _models()
        x = jnp.asarray(rng.standard_normal((2, 24, 24, 1)).astype(np.float32))
        v = plain.init(jax.random.PRNGKey(0), x)
        c0, f0 = plain.apply(v, x)
        c1, f1 = fused.apply(v, x)
        assert c1.shape == c0.shape and f1.shape == f0.shape
        # pad effect is confined to pad-adjacent windows; overall fields stay close
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c0), rtol=0.2, atol=0.2)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), rtol=0.2, atol=0.2)
