"""Fused fine-stage kernel vs the flax transformer + mixing (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from featurematching_tpu.models.transformer import LocalFeatureTransformer
from featurematching_tpu.ops.pallas_fine_stage import (
    fine_stage_fused,
    fine_stage_supported,
)


def _mix_ref(w, p):
    """The _WindowMix contraction (models/matcher.py)."""
    y = jnp.einsum(
        "brc,r->bc", w, p["kernel"][:, 0].astype(w.dtype),
        preferred_element_type=jnp.float32,
    ).astype(w.dtype)
    return y + p["bias"][0].astype(w.dtype)


def _make(rng, B_, N, C, nhead, layer_names, dtype):
    tf = LocalFeatureTransformer(C, nhead, layer_names, "linear", dtype)
    w0 = jnp.asarray(rng.standard_normal((B_, N, C)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((B_, N, C)).astype(np.float32))
    variables = tf.init(jax.random.PRNGKey(0), w0, w1)
    mix0 = {
        "kernel": jnp.asarray(rng.standard_normal((N, 1)).astype(np.float32) * 0.3),
        "bias": jnp.asarray(rng.standard_normal((1,)).astype(np.float32)),
    }
    mix1 = {
        "kernel": jnp.asarray(rng.standard_normal((N, 1)).astype(np.float32) * 0.3),
        "bias": jnp.asarray(rng.standard_normal((1,)).astype(np.float32)),
    }
    return tf, variables, w0, w1, mix0, mix1


class TestFineStageFused:
    def test_supported(self):
        assert fine_stage_supported(("self", "cross"), 64, 8)
        assert fine_stage_supported(("self", "cross"), 128, 8)
        assert not fine_stage_supported(("self", "cross"), 8, 2)  # tiny cfg
        assert not fine_stage_supported(("swap",), 64, 8)

    @pytest.mark.parametrize(
        "B_,N,C,nhead,layer_names",
        [
            (8, 49, 64, 8, ("self", "cross")),
            (6, 25, 64, 4, ("self", "cross")),
            (4, 49, 128, 8, ("self", "cross", "self", "cross")),
            (4, 49, 64, 1, ("cross",)),
        ],
    )
    def test_matches_flax_f32(self, rng, B_, N, C, nhead, layer_names):
        tf, variables, w0, w1, mix0, mix1 = _make(
            rng, B_, N, C, nhead, layer_names, jnp.float32
        )
        r0, r1 = tf.apply(variables, w0, w1)
        rm0 = _mix_ref(r0, mix0)
        rm1 = _mix_ref(r1, mix1)
        g0, g1, gm0, gm1 = fine_stage_fused(
            w0, w1, variables["params"], mix0, mix1, layer_names, nhead,
            chunk=2, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(g0), np.asarray(r0), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(r1), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(gm0), np.asarray(rm0), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(gm1), np.asarray(rm1), rtol=2e-4, atol=2e-4)

    def test_matches_flax_bf16(self, rng):
        B_, N, C, nhead = 8, 49, 64, 8
        layer_names = ("self", "cross")
        tf, variables, w0, w1, mix0, mix1 = _make(
            rng, B_, N, C, nhead, layer_names, jnp.bfloat16
        )
        w0 = w0.astype(jnp.bfloat16)
        w1 = w1.astype(jnp.bfloat16)
        r0, r1 = tf.apply(variables, w0, w1)
        rm0 = _mix_ref(r0, mix0)
        rm1 = _mix_ref(r1, mix1)
        g0, g1, gm0, gm1 = fine_stage_fused(
            w0, w1, variables["params"], mix0, mix1, layer_names, nhead,
            chunk=4, interpret=True,
        )
        # bf16 activations: differences are rounding-order only (bf16
        # resolution is ~0.06 at magnitude 8, and the 49-tap mixing sum
        # cancels, so abs tolerance must sit above one ulp of the operands)
        for got, ref in [(g0, r0), (g1, r1), (gm0, rm0), (gm1, rm1)]:
            np.testing.assert_allclose(
                np.asarray(got, np.float32), np.asarray(ref, np.float32),
                rtol=0.05, atol=0.13,
            )

    @pytest.mark.parametrize(
        "B_,N,C,nhead,layer_names",
        [
            (8, 49, 64, 8, ("self", "cross")),
            (6, 25, 64, 4, ("self", "cross")),
        ],
    )
    def test_fold_softargmax(self, rng, B_, N, C, nhead, layer_names):
        """Fold mode == XLA correlation+softmax on the plain-mode outputs."""
        tf, variables, w0, w1, mix0, mix1 = _make(
            rng, B_, N, C, nhead, layer_names, jnp.float32
        )
        r0, r1 = tf.apply(variables, w0, w1)
        rm0 = _mix_ref(r0, mix0)
        rm1 = _mix_ref(r1, mix1)
        temp = 1.0 / (C**0.5)
        ref_h0 = jax.nn.softmax(
            temp * jnp.einsum("bc,brc->br", rm0, r1), axis=-1
        )
        ref_h1 = jax.nn.softmax(
            temp * jnp.einsum("bc,brc->br", rm1, r0), axis=-1
        )
        h0, h1 = fine_stage_fused(
            w0, w1, variables["params"], mix0, mix1, layer_names, nhead,
            chunk=2, interpret=True, fold_softargmax=True,
        )
        assert h0.shape == (B_, N) and h1.shape == (B_, N)
        np.testing.assert_allclose(np.asarray(h0), np.asarray(ref_h0), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(h1), np.asarray(ref_h1), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(h0).sum(-1), 1.0, rtol=1e-5)

    def test_chunk_divisibility(self, rng):
        """Odd B_ forces the chunk-shrink loop; result must not change."""
        B_, N, C, nhead = 6, 25, 64, 4
        layer_names = ("self", "cross")
        tf, variables, w0, w1, mix0, mix1 = _make(
            rng, B_, N, C, nhead, layer_names, jnp.float32
        )
        full = fine_stage_fused(
            w0, w1, variables["params"], mix0, mix1, layer_names, nhead,
            chunk=6, interpret=True,
        )
        odd = fine_stage_fused(
            w0, w1, variables["params"], mix0, mix1, layer_names, nhead,
            chunk=4, interpret=True,  # 6 % 4 != 0 -> shrinks to 3
        )
        for a, b in zip(full, odd):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
            )
