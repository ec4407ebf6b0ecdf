"""Fused window-attention kernel vs jnp reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from featurematching_tpu.ops.pallas_window_attention import (
    window_attention_pallas,
    window_attention_reference,
)


def make_inputs(rng, B_, N, C, h, nW=None):
    qkv = jnp.asarray(rng.standard_normal((B_, N, 3 * C)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((h, N, N)).astype(np.float32) * 0.1)
    mask = None
    if nW:
        m = np.zeros((nW, N, N), np.float32)
        m[1:, : N // 2, N // 2 :] = -100.0
        m[1:, N // 2 :, : N // 2] = -100.0
        mask = jnp.asarray(m)
    return qkv, bias, mask


class TestWindowAttention:
    @pytest.mark.parametrize("B_,N,C,h", [(12, 16, 32, 2), (8, 64, 64, 4)])
    def test_unmasked_matches_reference(self, rng, B_, N, C, h):
        qkv, bias, _ = make_inputs(rng, B_, N, C, h)
        scale = (C // h) ** -0.5
        ref = window_attention_reference(qkv, bias, None, h, scale)
        got = window_attention_pallas(qkv, bias, None, h, scale, chunk=4, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)

    def test_masked_matches_reference(self, rng):
        B_, N, C, h, nW = 12, 16, 32, 2, 6
        qkv, bias, mask = make_inputs(rng, B_, N, C, h, nW)
        scale = (C // h) ** -0.5
        ref = window_attention_reference(qkv, bias, mask, h, scale)
        got = window_attention_pallas(qkv, bias, mask, h, scale, chunk=4, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)

    def test_mask_period_not_aligned_with_chunk(self, rng):
        """chunk=4 with nW=6: window->mask mapping must stay exact."""
        B_, N, C, h, nW = 24, 16, 16, 2, 6
        qkv, bias, mask = make_inputs(rng, B_, N, C, h, nW)
        scale = (C // h) ** -0.5
        ref = window_attention_reference(qkv, bias, mask, h, scale)
        got = window_attention_pallas(qkv, bias, mask, h, scale, chunk=4, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)

    def test_bf16(self, rng):
        B_, N, C, h = 8, 64, 64, 4
        qkv, bias, _ = make_inputs(rng, B_, N, C, h)
        qkv = qkv.astype(jnp.bfloat16)
        scale = (C // h) ** -0.5
        ref = window_attention_reference(qkv, bias, None, h, scale)
        got = window_attention_pallas(qkv, bias, None, h, scale, chunk=8, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=0.05, atol=0.05
        )


class TestFusedInModel:
    def test_swin_fused_equals_xla(self, rng):
        """SwinUNet with fused_attention on (interpret via CPU is not
        possible for real pallas, so compare the module-level paths with
        use_fused toggled under interpret mode at the WindowAttention level).
        Here: verify the 'on' config threads without error on CPU by
        monkeypatching the kernel to interpret mode."""
        import functools
        import featurematching_tpu.ops.pallas_window_attention as pw

        orig = pw.window_attention_pallas
        try:
            pw.window_attention_pallas = functools.partial(orig, interpret=True)
            from featurematching_tpu.models.backbone_swin import SwinUNet

            x = jnp.asarray(rng.standard_normal((1, 32, 32, 1)).astype(np.float32))
            m_ref = SwinUNet(in_channels=1, embed_dim=8, depths=(1, 1, 1),
                             depths_up=(1, 1, 1), num_heads=(2, 2, 2), window=4,
                             fused_attention=False)
            m_fused = SwinUNet(in_channels=1, embed_dim=8, depths=(1, 1, 1),
                               depths_up=(1, 1, 1), num_heads=(2, 2, 2), window=4,
                               fused_attention=True)
            v = m_ref.init(jax.random.PRNGKey(0), x)
            c_ref, f_ref = m_ref.apply(v, x)
            c_fus, f_fus = m_fused.apply(v, x)  # same params (same names)
            np.testing.assert_allclose(
                np.asarray(c_fus), np.asarray(c_ref), rtol=1e-4, atol=1e-4
            )
            np.testing.assert_allclose(
                np.asarray(f_fus), np.asarray(f_ref), rtol=1e-4, atol=1e-4
            )
        finally:
            pw.window_attention_pallas = orig
