"""Matching-core tests: dual-softmax, mutual-NN top-K extraction, window
gather, and soft-argmax — each validated against an independent numpy
emulation of the reference semantics (coarse_matching_new.py,
fine_preprocess.py, fine_matching_new.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from featurematching_tpu.matching.coarse import (
    border_mask_flat,
    coarse_match,
    dual_softmax_confidence,
    extract_matches,
    ids_to_keypoints,
)
from featurematching_tpu.matching.fine import (
    fine_soft_argmax,
    gather_fine_windows,
    normalized_grid,
    spatial_expectation,
    window_center_offset,
)


def np_softmax(x, axis):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


class TestDualSoftmax:
    def test_matches_numpy(self, rng):
        B, L, S, C = 2, 12, 12, 8
        f0 = rng.standard_normal((B, L, C)).astype(np.float32)
        f1 = rng.standard_normal((B, S, C)).astype(np.float32)
        conf = np.asarray(dual_softmax_confidence(jnp.asarray(f0), jnp.asarray(f1), 0.1))
        sim = np.einsum("blc,bsc->bls", f0, f1) / (C * 0.1)
        ref = np_softmax(sim, 1) * np_softmax(sim, 2)
        np.testing.assert_allclose(conf, ref, rtol=1e-4, atol=1e-6)

    def test_rows_cols_bounded(self, rng):
        f0 = rng.standard_normal((1, 20, 16)).astype(np.float32)
        conf = np.asarray(
            dual_softmax_confidence(jnp.asarray(f0), jnp.asarray(f0), 0.1)
        )
        assert conf.min() >= 0 and conf.max() <= 1.0


def reference_match_extraction(conf, grid0, grid1, thr, border):
    """Numpy transcription of coarse_matching_new.py:98-110."""
    B, L, S = conf.shape
    h0, w0 = grid0
    h1, w1 = grid1
    mask = conf > thr
    m5 = mask.reshape(B, h0, w0, h1, w1)
    if border > 0:
        m5[:, :border] = False
        m5[:, :, :border] = False
        m5[:, :, :, :border] = False
        m5[:, :, :, :, :border] = False
        m5[:, -border:] = False
        m5[:, :, -border:] = False
        m5[:, :, :, -border:] = False
        m5[:, :, :, :, -border:] = False
    mask = m5.reshape(B, L, S)
    mask = (
        mask
        & (conf == conf.max(axis=2, keepdims=True))
        & (conf == conf.max(axis=1, keepdims=True))
    )
    out = []
    for b in range(B):
        i, j = np.where(mask[b])
        out.append(set(zip(i.tolist(), j.tolist())))
    return out


class TestExtractMatches:
    def test_equals_reference_semantics(self, rng):
        B, h, w = 3, 6, 8
        L = h * w
        conf = rng.random((B, L, L)).astype(np.float32) * 0.4
        # plant some strong mutual matches
        for b in range(B):
            for _ in range(10):
                i = rng.integers(0, L)
                j = rng.integers(0, L)
                conf[b, i, j] = 0.5 + 0.5 * rng.random()
        ref_sets = reference_match_extraction(conf.copy(), (h, w), (h, w), 0.2, 1)
        i_ids, j_ids, mask, mconf = extract_matches(
            jnp.asarray(conf), (h, w), (h, w), thr=0.2, border_rm=1, max_matches=L
        )
        for b in range(B):
            got = {
                (int(i), int(j))
                for i, j, m in zip(
                    np.asarray(i_ids[b]), np.asarray(j_ids[b]), np.asarray(mask[b])
                )
                if m
            }
            assert got == ref_sets[b], f"batch {b}: {got} != {ref_sets[b]}"

    def test_confidence_sorted_and_padded(self, rng):
        B, h, w = 1, 4, 4
        L = h * w
        conf = np.zeros((B, L, L), dtype=np.float32)
        conf[0, 5, 6] = 0.9
        conf[0, 6, 9] = 0.8  # both cells interior for border_rm=1 on a 4x4 grid
        i_ids, j_ids, mask, mconf = extract_matches(
            jnp.asarray(conf), (h, w), (h, w), thr=0.2, border_rm=1, max_matches=8
        )
        m = np.asarray(mconf[0])
        assert np.all(np.diff(m) <= 1e-6)  # descending
        assert int(np.asarray(mask).sum()) == 2
        assert m[0] > m[1] > 0 and m[2] == 0

    def test_border_mask(self):
        bm = np.asarray(border_mask_flat(4, 5, 1)).reshape(4, 5)
        assert not bm[0].any() and not bm[-1].any()
        assert not bm[:, 0].any() and not bm[:, -1].any()
        assert bm[1:3, 1:4].all()

    def test_ids_to_keypoints(self):
        ids = jnp.asarray([[0, 1, 7]])
        pts = np.asarray(ids_to_keypoints(ids, 5, 8.0))
        np.testing.assert_allclose(pts[0], [[0, 0], [8, 0], [16, 8]])

    def test_max_matches_caps(self, rng):
        B, h, w = 1, 6, 6
        L = h * w
        f = rng.standard_normal((B, L, 16)).astype(np.float32) * 3
        matches, conf = coarse_match(
            jnp.asarray(f), jnp.asarray(f), (h, w), (h, w), 8.0,
            thr=0.01, border_rm=0, max_matches=4,
        )
        assert matches.i_ids.shape == (1, 4)
        # self-matching: diagonal is mutual max
        valid = np.asarray(matches.mask[0])
        ii = np.asarray(matches.i_ids[0])[valid]
        jj = np.asarray(matches.j_ids[0])[valid]
        np.testing.assert_array_equal(ii, jj)


class TestStatsPathEquivalence:
    def test_stats_extraction_equals_conf_extraction(self, rng):
        """The fused-stats match path must produce exactly the matches of the
        materialized-conf path."""
        from featurematching_tpu.ops.pallas_dual_softmax import (
            dual_softmax_match_stats,
        )
        from featurematching_tpu.matching.coarse import extract_matches_from_stats

        B, h, w, C = 2, 8, 8, 32
        L = h * w
        f0 = jnp.asarray(rng.standard_normal((B, L, C)).astype(np.float32))
        f1 = jnp.asarray(rng.standard_normal((B, L, C)).astype(np.float32))
        conf = dual_softmax_confidence(f0, f1, 0.1)
        ref = extract_matches(conf, (h, w), (h, w), 0.01, 1, 32)
        stats = dual_softmax_match_stats(f0, f1, 0.1, impl="xla")
        got = extract_matches_from_stats(stats, (h, w), (h, w), 0.01, 1, 32)
        # ids/mask must agree exactly; confidences only to fp32 ulp (the two
        # paths scale sim by *(1/a) vs /a — last-bit difference)
        for a, b in zip(ref[:3], got[:3]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_allclose(
            np.asarray(ref[3]), np.asarray(got[3]), rtol=1e-5, atol=1e-8
        )

    def test_coarse_match_auto_path(self, rng):
        """coarse_match with conf=None routes through the stats path and
        agrees with the conf path."""
        B, h, w, C = 1, 6, 6, 16
        f = jnp.asarray(rng.standard_normal((B, h * w, C)).astype(np.float32))
        m_stats, conf_none = coarse_match(
            f, f, (h, w), (h, w), 8.0, thr=0.01, border_rm=1, max_matches=16
        )
        assert conf_none is None
        conf = dual_softmax_confidence(f, f, 0.1)
        m_conf, _ = coarse_match(
            f, f, (h, w), (h, w), 8.0, thr=0.01, border_rm=1, max_matches=16,
            conf=conf,
        )
        np.testing.assert_array_equal(
            np.asarray(m_stats.i_ids), np.asarray(m_conf.i_ids)
        )
        np.testing.assert_array_equal(
            np.asarray(m_stats.mask), np.asarray(m_conf.mask)
        )


class TestFineWindows:
    def np_unfold_gather(self, feat, ids, grid_c, W, stride):
        """Emulate F.unfold(kernel=W, stride=stride, padding=W//2-1) + gather
        (fine_preprocess.py:43-50)."""
        B, Hf, Wf, C = feat.shape
        hc, wc = grid_c
        pad = -window_center_offset(W, stride)
        padded = np.zeros((B, Hf + 2 * pad, Wf + 2 * pad, C), feat.dtype)
        padded[:, pad : pad + Hf, pad : pad + Wf] = feat
        out = np.zeros((B, ids.shape[1], W * W, C), feat.dtype)
        for b in range(B):
            for k, idx in enumerate(ids[b]):
                r, c = divmod(int(idx), wc)
                y0 = r * stride
                x0 = c * stride
                out[b, k] = padded[b, y0 : y0 + W, x0 : x0 + W].reshape(W * W, C)
        return out

    def test_gather_matches_unfold(self, rng):
        B, hc, wc, stride, W, C = 2, 4, 5, 4, 7, 3
        Hf, Wf = hc * stride, wc * stride
        feat = rng.standard_normal((B, Hf, Wf, C)).astype(np.float32)
        ids = rng.integers(0, hc * wc, size=(B, 6))
        ours = np.asarray(
            gather_fine_windows(jnp.asarray(feat), jnp.asarray(ids), (hc, wc), W, stride)
        )
        ref = self.np_unfold_gather(feat, ids, (hc, wc), W, stride)
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    @pytest.mark.parametrize(
        "B,hc,wc,W,stride,K",
        [
            (2, 6, 8, 7, 4, 11),   # flagship geometry
            (1, 8, 8, 7, 2, 9),    # stride < window/2: |cell shift| > 1
            (1, 6, 6, 3, 8, 5),    # window < stride: uncovered residues
            (2, 7, 9, 7, 1, 6),
        ],
    )
    def test_gather_backward_fold_matches_scatter(self, rng, B, hc, wc, W, stride, K):
        """The col2im backward (_gather_bwd_fold) must equal both the per-tap
        scatter path and jax autodiff of the raw forward, incl. duplicate ids
        and border windows."""
        from featurematching_tpu.matching.fine import (
            _gather_bwd_fold,
            _gather_bwd_taps,
            _gather_rows,
        )

        C = 8
        Hf, Wf = hc * stride, wc * stride
        feat = jnp.asarray(rng.standard_normal((B, Hf, Wf, C)).astype(np.float32))
        ids_np = rng.integers(0, hc * wc, size=(B, K))
        ids_np[:, -1] = ids_np[:, 0]  # force a duplicate id (scatter-add path)
        ids = jnp.asarray(ids_np)
        g = jnp.asarray(rng.standard_normal((B, K, W * W, C)).astype(np.float32))
        d_fold = _gather_bwd_fold(ids, B, Hf, Wf, C, feat.dtype, (hc, wc), W, stride, g)
        d_tap = _gather_bwd_taps(ids, B, Hf, Wf, C, feat.dtype, (hc, wc), W, stride, g)
        _, vjp = jax.vjp(lambda f: _gather_rows(f, ids, (hc, wc), W, stride), feat)
        (d_auto,) = vjp(g)
        np.testing.assert_allclose(np.asarray(d_fold), np.asarray(d_tap), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(d_fold), np.asarray(d_auto), rtol=1e-5, atol=1e-5)

    def test_border_windows_zero_padded(self, rng):
        B, hc, wc, stride, W, C = 1, 3, 3, 4, 7, 2
        feat = rng.standard_normal((B, hc * stride, wc * stride, C)).astype(np.float32)
        ids = np.asarray([[0]])  # top-left cell -> taps at -2
        ours = np.asarray(
            gather_fine_windows(jnp.asarray(feat), jnp.asarray(ids), (hc, wc), W, stride)
        )[0, 0].reshape(W, W, C)
        assert np.all(ours[:2] == 0) and np.all(ours[:, :2] == 0)
        np.testing.assert_allclose(ours[2:, 2:], feat[0, : W - 2, : W - 2], atol=1e-6)


class TestSoftArgmax:
    def test_grid_layout(self):
        g = np.asarray(normalized_grid(5))
        assert g.shape == (25, 2)
        np.testing.assert_allclose(g[0], [-1, -1])
        np.testing.assert_allclose(g[4], [1, -1])  # x varies fastest
        np.testing.assert_allclose(g[-1], [1, 1])

    def test_delta_heatmap(self):
        W = 7
        heat = np.zeros((1, 1, W * W), np.float32)
        heat[0, 0, 3 * W + 5] = 1.0  # row 3 (y), col 5 (x)
        coords, std = spatial_expectation(jnp.asarray(heat), W)
        g = np.asarray(normalized_grid(W))
        np.testing.assert_allclose(np.asarray(coords)[0, 0], g[3 * W + 5], atol=1e-6)
        assert float(std[0, 0]) < 1e-4

    def test_uniform_heatmap_centered(self):
        W = 5
        heat = np.full((1, 1, W * W), 1.0 / (W * W), np.float32)
        coords, std = spatial_expectation(jnp.asarray(heat), W)
        np.testing.assert_allclose(np.asarray(coords)[0, 0], [0, 0], atol=1e-6)
        assert float(std[0, 0]) > 0.5  # high uncertainty

    def test_fine_soft_argmax_offsets(self, rng):
        """A window whose best-matching tap is its center must give a zero
        offset: mkpts_f = mkpts_c + W//2."""
        B, K, W, C = 1, 3, 7, 8
        ww = W * W
        center = (W // 2) * W + W // 2
        def unit(x):
            return x / np.linalg.norm(x, axis=-1, keepdims=True)

        feat1 = unit(rng.standard_normal((B, K, ww, C))).astype(np.float32)
        mixed0 = feat1[:, :, center] * 50.0  # sharp peak at center (unit rows)
        feat0 = unit(rng.standard_normal((B, K, ww, C))).astype(np.float32)
        mixed1 = feat0[:, :, center] * 50.0
        mk0 = np.zeros((B, K, 2), np.float32)
        mk1 = np.zeros((B, K, 2), np.float32)
        out = fine_soft_argmax(
            jnp.asarray(mixed0), jnp.asarray(mixed1),
            jnp.asarray(feat0), jnp.asarray(feat1),
            jnp.asarray(mk0), jnp.asarray(mk1), W, 2.0,
        )
        np.testing.assert_allclose(
            np.asarray(out.mkpts0_f)[..., :2], np.full((B, K, 2), W // 2), atol=0.5
        )
        assert out.mkpts0_f.shape == (B, K, 3)


class TestPackedLinearAttention:
    def test_equals_standard(self, rng):
        from featurematching_tpu.ops.attention import (
            linear_attention,
            linear_attention_packed,
        )

        B, L, S, H, D = 3, 49, 49, 8, 8
        q = jnp.asarray(rng.standard_normal((B, L, H, D)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
        a = linear_attention(q, k, v)
        b = linear_attention_packed(q, k, v)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    def test_equals_standard_with_masks(self, rng):
        from featurematching_tpu.ops.attention import (
            linear_attention,
            linear_attention_packed,
        )

        B, L, S, H, D = 2, 16, 20, 4, 8
        q = jnp.asarray(rng.standard_normal((B, L, H, D)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
        qm = jnp.asarray(rng.random((B, L)) < 0.8)
        km = jnp.asarray(rng.random((B, S)) < 0.8)
        a = linear_attention(q, k, v, qm, km)
        b = linear_attention_packed(q, k, v, qm, km)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
