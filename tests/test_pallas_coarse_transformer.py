"""Fused streaming coarse transformer vs the flax stack (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from featurematching_tpu.models.transformer import LocalFeatureTransformer
from featurematching_tpu.ops.pallas_coarse_transformer import (
    coarse_transformer_fused,
    coarse_transformer_supported,
    _pick_chunk,
)


def _make(rng, B, N, C, nhead, layer_names, dtype):
    tf = LocalFeatureTransformer(C, nhead, layer_names, "linear", dtype)
    f0 = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
    f1 = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
    variables = tf.init(jax.random.PRNGKey(0), f0, f1)
    return tf, variables, f0, f1


class TestCoarseTransformerFused:
    def test_supported(self):
        assert coarse_transformer_supported(("self", "cross") * 4, 256, 8, 4800)
        assert not coarse_transformer_supported(("self",), 64, 8, 4800)  # C<128
        assert not coarse_transformer_supported(("swap",), 256, 8, 4800)
        assert not coarse_transformer_supported(("self",), 256, 8, 7)  # no chunk

    def test_pick_chunk(self):
        assert _pick_chunk(4800, 256) == 1600  # device-swept default
        assert 4800 % _pick_chunk(4800, 256) == 0
        assert _pick_chunk(64, 128) == 64
        assert _pick_chunk(7, 128) == 0

    @pytest.mark.parametrize(
        "B,N,C,nhead,layer_names",
        [
            (2, 64, 128, 8, ("self", "cross", "self", "cross")),
            (1, 96, 128, 4, ("cross", "self")),
        ],
    )
    def test_matches_flax_f32(self, rng, B, N, C, nhead, layer_names):
        tf, variables, f0, f1 = _make(rng, B, N, C, nhead, layer_names, jnp.float32)
        r0, r1 = tf.apply(variables, f0, f1)
        g0, g1 = coarse_transformer_fused(
            f0, f1, variables["params"], layer_names, nhead,
            chunk=32, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(g0), np.asarray(r0), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(r1), rtol=2e-4, atol=2e-4)

    def test_matches_flax_f32_long(self, rng):
        """N > 256 routes flax to the plain (non-packed) linear attention —
        the exact semantics the kernel streams. (bf16 cannot be exercised on
        XLA:CPU — DotThunk rejects bf16 x bf16 = f32 at these shapes on BOTH
        the flax and kernel sides; device parity is checked by
        benchmarks/coarse_ab.py.)"""
        B, N, C, nhead = 1, 320, 128, 8
        layer_names = ("self", "cross")
        tf, variables, f0, f1 = _make(rng, B, N, C, nhead, layer_names, jnp.float32)
        r0, r1 = tf.apply(variables, f0, f1)
        g0, g1 = coarse_transformer_fused(
            f0, f1, variables["params"], layer_names, nhead,
            chunk=64, interpret=True,
        )
        for got, ref in [(g0, r0), (g1, r1)]:
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
            )
