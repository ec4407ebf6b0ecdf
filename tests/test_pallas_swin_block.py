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


class TestImageLayoutBlock:
    """swin_block_image (pad formulation, partition/roll absorbed) must equal
    the roll-path reference exactly for every geometry class: aligned,
    pad-to-multiple, shifted, unshifted, single-head."""

    def _xla_ref(self, x, H, W, params, num_heads, w, shift):
        from featurematching_tpu.models.backbone_swin import (
            _shift_attn_mask,
            window_partition,
            window_reverse,
        )

        B, L, C = x.shape
        xi = x.reshape(B, H, W, C)
        pad_b = (w - H % w) % w
        pad_r = (w - W % w) % w
        if pad_b or pad_r:
            xi = jnp.pad(xi, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r
        mask = None
        if shift > 0:
            xi = jnp.roll(xi, shift=(-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(Hp, Wp, w, shift))
        ow = swin_block_reference(window_partition(xi, w), mask, params, num_heads)
        oi = window_reverse(ow, w, Hp, Wp)
        if shift > 0:
            oi = jnp.roll(oi, shift=(shift, shift), axis=(1, 2))
        return oi[:, :H, :W].reshape(B, H * W, C)

    @pytest.mark.parametrize(
        "H,W,C,h,w,shift",
        [
            (16, 24, 32, 4, 4, 2),
            (16, 24, 32, 4, 4, 0),
            (14, 18, 32, 2, 4, 2),  # pad-to-multiple + shift
            (12, 12, 16, 1, 4, 2),  # single head
            (30, 40, 64, 4, 8, 4),  # flagship stage-2 geometry
        ],
    )
    def test_matches_roll_path(self, rng, H, W, C, h, w, shift):
        from featurematching_tpu.ops.pallas_swin_block import swin_block_image

        N = w * w
        params = make_params(rng, C, h, N, 2 * C)
        x = jnp.asarray(rng.standard_normal((2, H * W, C)).astype(np.float32))
        ref = self._xla_ref(x, H, W, params, h, w, shift)
        got = swin_block_image(x, H, W, params, h, w, shift, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_pad_region_masks_isolate_pads(self):
        from featurematching_tpu.ops.pallas_swin_block import pad_region_masks

        w, shift = 8, 4
        m = pad_region_masks(24 + w, 32 + w, w, shift)  # content 24x32
        assert m.shape == (3, 5, 64, 64)
        # window-row 0, col 0: the top-left pad block must be masked from the
        # real region: position (0,0) is pad, position (w-shift, w-shift) real
        pad_tok = 0
        real_tok = (w - shift) * w + (w - shift)
        assert m[0, 0, pad_tok, real_tok] == -100.0
        assert m[0, 0, real_tok, pad_tok] == -100.0
        # interior windows (middle rows, interior cols) are mask-free;
        # the first/last col windows carry the column-band masks
        assert np.all(m[1, 1:-1] == 0.0)
        assert np.any(m[1, 0] == -100.0) and np.any(m[1, -1] == -100.0)
