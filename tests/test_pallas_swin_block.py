"""Fused Swin block kernel vs jnp reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from featurematching_tpu.ops.pallas_swin_block import (
    swin_block_fused,
    swin_block_reference,
)


def make_params(rng, C, h, N, hid):
    def g(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.1)

    return {
        "ln1_scale": g(C) + 1.0,
        "ln1_bias": g(C),
        "w_qkv": g(C, 3 * C),
        "b_qkv": g(3 * C),
        "rel_bias": g(h, N, N),
        "w_proj": g(C, C),
        "b_proj": g(C),
        "ln2_scale": g(C) + 1.0,
        "ln2_bias": g(C),
        "w_mlp1": g(C, hid),
        "b_mlp1": g(hid),
        "w_mlp2": g(hid, C),
        "b_mlp2": g(C),
    }


class TestFusedSwinBlock:
    @pytest.mark.parametrize("B_,N,C,h", [(8, 16, 32, 2), (6, 64, 64, 4)])
    def test_unmasked(self, rng, B_, N, C, h):
        params = make_params(rng, C, h, N, 4 * C)
        x = jnp.asarray(rng.standard_normal((B_, N, C)).astype(np.float32))
        ref = swin_block_reference(x, None, params, h)
        got = swin_block_fused(x, None, params, h, chunk=2, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
        )

    def test_masked(self, rng):
        B_, N, C, h, nW = 12, 16, 32, 2, 6
        params = make_params(rng, C, h, N, 4 * C)
        m = np.zeros((nW, N, N), np.float32)
        m[2:, : N // 2, N // 2 :] = -100.0
        m[2:, N // 2 :, : N // 2] = -100.0
        mask = jnp.asarray(m)
        x = jnp.asarray(rng.standard_normal((B_, N, C)).astype(np.float32))
        ref = swin_block_reference(x, mask, params, h)
        got = swin_block_fused(x, mask, params, h, chunk=4, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
        )

    def test_bf16(self, rng):
        B_, N, C, h = 8, 64, 64, 4
        params = make_params(rng, C, h, N, 4 * C)
        x = jnp.asarray(rng.standard_normal((B_, N, C)).astype(np.float32)).astype(
            jnp.bfloat16
        )
        ref = swin_block_reference(x, None, params, h)
        got = swin_block_fused(x, None, params, h, chunk=8, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=0.06, atol=0.06,
        )

    def test_matches_model_block(self, rng):
        """The fused kernel must reproduce the SwinBlock module (via its
        params) on window-partitioned inputs."""
        from featurematching_tpu.models.backbone_swin import (
            SwinBlock,
            window_partition,
            window_reverse,
            _rel_pos_bias_from_table,
        )

        B, H, W, C, h, w = 1, 16, 16, 32, 4, 4
        blk = SwinBlock(dim=C, num_heads=h, window=w, shift=0)
        x_img = jnp.asarray(rng.standard_normal((B, H * W, C)).astype(np.float32))
        variables = blk.init(jax.random.PRNGKey(0), x_img, H, W)
        ref_out = blk.apply(variables, x_img, H, W)

        p = variables["params"]
        N = w * w
        params = {
            "ln1_scale": p["norm1"]["scale"],
            "ln1_bias": p["norm1"]["bias"],
            "w_qkv": p["attn"]["qkv"]["kernel"],
            "b_qkv": p["attn"]["qkv"]["bias"],
            "rel_bias": _rel_pos_bias_from_table(p["attn"]["rel_pos_bias"], w, h),
            "w_proj": p["attn"]["proj"]["kernel"],
            "b_proj": p["attn"]["proj"]["bias"],
            "ln2_scale": p["norm2"]["scale"],
            "ln2_bias": p["norm2"]["bias"],
            "w_mlp1": p["mlp1"]["kernel"],
            "b_mlp1": p["mlp1"]["bias"],
            "w_mlp2": p["mlp2"]["kernel"],
            "b_mlp2": p["mlp2"]["bias"],
        }
        xw = window_partition(x_img.reshape(B, H, W, C), w)
        got_w = swin_block_fused(xw, None, params, h, chunk=4, interpret=True)
        got = window_reverse(got_w, w, H, W).reshape(B, H * W, C)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref_out), rtol=2e-3, atol=2e-3
        )
