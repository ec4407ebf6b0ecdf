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
