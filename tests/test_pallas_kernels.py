"""Pallas kernel correctness vs jnp references (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from featurematching_tpu.ops.pallas_dual_softmax import (
    MatchStats,
    _pallas_forward,
    _stats_reference,
    dual_softmax_match_stats,
)


class TestDualSoftmaxStats:
    @pytest.mark.parametrize("B,L,S,C", [(1, 256, 256, 64), (2, 512, 512, 128)])
    def test_matches_reference(self, rng, B, L, S, C):
        f0 = jnp.asarray(rng.standard_normal((B, L, C)).astype(np.float32))
        f1 = jnp.asarray(rng.standard_normal((B, S, C)).astype(np.float32))
        inv_temp = 1.0 / (C * 0.1)
        ref = _stats_reference(f0, f1, inv_temp)
        got = _pallas_forward(f0, f1, inv_temp, row_tile=128, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got.row_max), np.asarray(ref.row_max), rtol=2e-4, atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(got.col_max), np.asarray(ref.col_max), rtol=2e-4, atol=1e-7
        )
        np.testing.assert_array_equal(
            np.asarray(got.row_argmax), np.asarray(ref.row_argmax)
        )
        np.testing.assert_array_equal(
            np.asarray(got.col_argmax), np.asarray(ref.col_argmax)
        )

    def test_col_argmax_crosses_tiles(self, rng):
        """Best row for some columns must live in a non-first row tile."""
        B, L, S, C = 1, 256, 128, 32
        f0 = rng.standard_normal((B, L, C)).astype(np.float32) * 0.1
        f1 = rng.standard_normal((B, S, C)).astype(np.float32)
        # plant strong rows in tile 1 (rows 128..255)
        for j in range(0, S, 7):
            i = 130 + (j % 100)
            f0[0, i] = f1[0, j] * 2
        ref = _stats_reference(jnp.asarray(f0), jnp.asarray(f1), 1.0 / (C * 0.1))
        got = _pallas_forward(
            jnp.asarray(f0), jnp.asarray(f1), 1.0 / (C * 0.1), row_tile=128,
            interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(got.col_argmax), np.asarray(ref.col_argmax)
        )
        assert (np.asarray(got.col_argmax) >= 128).any()

    def test_auto_dispatch_cpu_uses_xla(self, rng):
        f0 = jnp.asarray(rng.standard_normal((1, 64, 32)).astype(np.float32))
        stats = dual_softmax_match_stats(f0, f0, temperature=0.1, impl="auto")
        # self-similarity: argmax should be the diagonal
        np.testing.assert_array_equal(
            np.asarray(stats.row_argmax[0]), np.arange(64)
        )


class TestShardedMatching:
    def test_sharded_stats_equal_single_device(self, rng):
        """S-axis-sharded correlation over an 8-way 'model' mesh must match
        the single-device reference stats."""
        from featurematching_tpu.ops.pallas_dual_softmax import _stats_reference
        from featurematching_tpu.ops.sharded_matching import (
            dual_softmax_match_stats_sharded,
        )
        from featurematching_tpu.parallel.mesh import make_mesh

        assert jax.device_count() >= 8
        mesh = make_mesh(n_data=1, n_model=8)
        B, L, S, C = 2, 64, 128, 32
        f0 = jnp.asarray(rng.standard_normal((B, L, C)).astype(np.float32))
        f1 = jnp.asarray(rng.standard_normal((B, S, C)).astype(np.float32))
        got = dual_softmax_match_stats_sharded(f0, f1, mesh, 0.1)
        ref = _stats_reference(f0, f1, 1.0 / (C * 0.1))
        np.testing.assert_allclose(
            np.asarray(got.row_max), np.asarray(ref.row_max), rtol=1e-4, atol=1e-7
        )
        np.testing.assert_array_equal(
            np.asarray(got.row_argmax), np.asarray(ref.row_argmax)
        )
        np.testing.assert_allclose(
            np.asarray(got.col_max), np.asarray(ref.col_max), rtol=1e-4, atol=1e-7
        )
        np.testing.assert_array_equal(
            np.asarray(got.col_argmax), np.asarray(ref.col_argmax)
        )

    def test_matcher_shard_mesh_end_to_end(self, rng):
        """Matcher(..., shard_mesh=('data','model') mesh) must produce the
        same match ids as the unsharded Matcher — the high-res serving path
        (config.highres_eval_config, apps/evaluate --model-shard)."""
        import dataclasses as dc

        from featurematching_tpu.config import tiny_test_config
        from featurematching_tpu.models import Matcher
        from featurematching_tpu.parallel.mesh import make_mesh

        cfg = tiny_test_config()
        mcfg = dc.replace(
            cfg.model,
            match_coarse=dc.replace(cfg.model.match_coarse, thr=1e-6),
        )
        model = Matcher(mcfg)
        mesh = make_mesh(n_data=2, n_model=4)
        img = jnp.asarray(rng.random((2, 48, 64, 1)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), img, img)
        out_sh = jax.jit(
            lambda v, a, b: model.apply(v, a, b, shard_mesh=mesh).coarse
        )(variables, img, img)
        out_1d = jax.jit(lambda v, a, b: model.apply(v, a, b).coarse)(
            variables, img, img
        )
        np.testing.assert_array_equal(
            np.asarray(out_sh.i_ids), np.asarray(out_1d.i_ids)
        )
        np.testing.assert_array_equal(
            np.asarray(out_sh.j_ids), np.asarray(out_1d.j_ids)
        )
        np.testing.assert_array_equal(
            np.asarray(out_sh.mask), np.asarray(out_1d.mask)
        )
        assert int(np.asarray(out_1d.mask).sum()) > 0

    def test_sharded_match_extraction(self, rng):
        """End-to-end: extraction from sharded stats equals the XLA path."""
        from featurematching_tpu.matching.coarse import (
            dual_softmax_confidence,
            extract_matches,
            extract_matches_from_stats,
        )
        from featurematching_tpu.ops.sharded_matching import (
            dual_softmax_match_stats_sharded,
        )
        from featurematching_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=1, n_model=8)
        B, h, w, C = 1, 8, 8, 16
        f = jnp.asarray(rng.standard_normal((B, h * w, C)).astype(np.float32))
        stats = dual_softmax_match_stats_sharded(f, f, mesh, 0.1)
        got = extract_matches_from_stats(stats, (h, w), (h, w), 0.01, 1, 32)
        conf = dual_softmax_confidence(f, f, 0.1)
        ref = extract_matches(conf, (h, w), (h, w), 0.01, 1, 32)
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
        np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(ref[2]))


class TestLayerNormChain:
    """ops/pallas_ln.layer_norm_chain vs plain jnp double-LN."""

    def _ref_ln(self, x, s, b, eps=1e-6):
        x32 = x.astype(np.float32)
        mu = x32.mean(-1, keepdims=True)
        var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
        return (x32 - mu) / np.sqrt(var + eps) * s + b

    def test_single_and_double(self, rng):
        from featurematching_tpu.ops.pallas_ln import layer_norm_chain

        x = rng.standard_normal((2, 300, 64)).astype(np.float32)
        s1 = 1 + 0.1 * rng.standard_normal(64).astype(np.float32)
        b1 = 0.1 * rng.standard_normal(64).astype(np.float32)
        s2 = 1 + 0.1 * rng.standard_normal(64).astype(np.float32)
        b2 = 0.1 * rng.standard_normal(64).astype(np.float32)

        xb = jnp.asarray(x).astype(jnp.bfloat16)
        got1 = np.asarray(
            layer_norm_chain(xb, jnp.asarray(s1), jnp.asarray(b1), interpret=True)
        ).astype(np.float32)
        ref1 = self._ref_ln(np.asarray(xb).astype(np.float32), s1, b1)
        np.testing.assert_allclose(got1, ref1, atol=2e-2)

        got2 = np.asarray(
            layer_norm_chain(
                xb, jnp.asarray(s1), jnp.asarray(b1), jnp.asarray(s2),
                jnp.asarray(b2), interpret=True,
            )
        ).astype(np.float32)
        ref2 = self._ref_ln(ref1, s2, b2)
        np.testing.assert_allclose(got2, ref2, atol=2e-2)

    def test_odd_row_count_chunking(self, rng):
        from featurematching_tpu.ops.pallas_ln import layer_norm_chain

        x = jnp.asarray(rng.standard_normal((7, 100, 32)).astype(np.float32))
        s = jnp.ones(32); b = jnp.zeros(32)
        got = np.asarray(layer_norm_chain(x, s, b, interpret=True))
        ref = self._ref_ln(np.asarray(x), np.ones(32, np.float32), np.zeros(32, np.float32))
        np.testing.assert_allclose(got, ref, atol=1e-5)


class TestPatchExpandLN:
    """ops/pallas_patch_expand.patch_expand_ln vs the 6-d transpose path
    it replaces (models/fast_inference._patch_expand round-1..3 form)."""

    def _ref(self, y, H, W, s1, b1, s2=None, b2=None, wh=None, bh=None):
        B, L, Ce = y.shape
        C4 = Ce // 4
        t = (
            y.astype(np.float32)
            .reshape(B, H, W, 2, 2, C4)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(B, 4 * H * W, C4)
        )

        def ln(v, s, b, eps=1e-6):
            mu = v.mean(-1, keepdims=True)
            var = ((v - mu) ** 2).mean(-1, keepdims=True)
            return (v - mu) / np.sqrt(var + eps) * s + b

        o = ln(t, s1, b1)
        if s2 is not None:
            o = ln(o, s2, b2)
        outs = [o]
        if wh is not None:
            outs.append(o @ wh + bh)
        return outs

    @pytest.mark.parametrize(
        "B,H,W,Ce,head,emit_ln",
        [
            (2, 6, 10, 128, False, True),   # dec1-like C4=32..128 family
            (2, 6, 10, 128, True, True),    # dec0-like: LN out + head out
            (1, 4, 8, 64, True, False),     # dec2-like: head only
            (3, 5, 7, 32, False, True),     # narrow lanes, odd spatial
        ],
    )
    def test_matches_transpose_path(self, rng, B, H, W, Ce, head, emit_ln):
        from featurematching_tpu.ops.pallas_patch_expand import patch_expand_ln

        C4 = Ce // 4
        y = rng.standard_normal((B, H * W, Ce)).astype(np.float32)
        s1 = 1 + 0.1 * rng.standard_normal(C4).astype(np.float32)
        b1 = 0.1 * rng.standard_normal(C4).astype(np.float32)
        s2 = 1 + 0.1 * rng.standard_normal(C4).astype(np.float32)
        b2 = 0.1 * rng.standard_normal(C4).astype(np.float32)
        wh = rng.standard_normal((C4, 16)).astype(np.float32) * 0.1
        bh = rng.standard_normal(16).astype(np.float32)

        got = patch_expand_ln(
            jnp.asarray(y), H, W,
            jnp.asarray(s1), jnp.asarray(b1), jnp.asarray(s2), jnp.asarray(b2),
            jnp.asarray(wh) if head else None,
            jnp.asarray(bh) if head else None,
            emit_ln=emit_ln, interpret=True,
        )
        refs = self._ref(y, H, W, s1, b1, s2, b2, wh if head else None,
                         bh if head else None)
        if not emit_ln:
            refs = refs[1:]
        assert len(got) == len(refs)
        for g, r in zip(got, refs):
            np.testing.assert_allclose(np.asarray(g), r, atol=5e-4)


class TestShardedFusedStats:
    """The fused (Pallas per-shard) sequence-parallel path returns the same
    match statistics as the single-device XLA reference and the sharded XLA
    formulation — on an 8-device virtual mesh, interpret mode."""

    def test_fused_equals_xla_sharded_and_single(self, rng):
        import jax
        from jax.sharding import Mesh
        from featurematching_tpu.ops.pallas_dual_softmax import (
            dual_softmax_match_stats,
        )
        from featurematching_tpu.ops.sharded_matching import (
            dual_softmax_match_stats_sharded,
        )

        B, L, S, C = 2, 64, 64, 16
        f0 = jnp.asarray(rng.standard_normal((B, L, C)).astype(np.float32))
        f1 = jnp.asarray(rng.standard_normal((B, S, C)).astype(np.float32))
        mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("data", "model"))

        single = dual_softmax_match_stats(f0, f1, impl="xla")
        xla_sh = dual_softmax_match_stats_sharded(f0, f1, mesh, impl="xla")
        fused = dual_softmax_match_stats_sharded(
            f0, f1, mesh, impl="pallas", interpret=True
        )
        # match sets: argmaxes identical across all three
        np.testing.assert_array_equal(
            np.asarray(single.row_argmax), np.asarray(fused.row_argmax)
        )
        np.testing.assert_array_equal(
            np.asarray(single.col_argmax), np.asarray(fused.col_argmax)
        )
        np.testing.assert_array_equal(
            np.asarray(xla_sh.row_argmax), np.asarray(fused.row_argmax)
        )
        # conf maxima agree to fp32 merge-order noise
        np.testing.assert_allclose(
            np.asarray(single.row_max), np.asarray(fused.row_max), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(single.col_max), np.asarray(fused.col_max), rtol=1e-5
        )
