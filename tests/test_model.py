"""Model-layer tests: backbone shapes, transformer invariants, and the full
Matcher forward on tiny inputs (SURVEY.md §4 layer-1 smoke tests, made real)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from featurematching_tpu.config import tiny_test_config, default_config
from featurematching_tpu.models.backbone_resnet_fpn import ResNetFPN
from featurematching_tpu.models.backbone_swin import (
    SwinUNet,
    window_partition,
    window_reverse,
)
from featurematching_tpu.models.transformer import LocalFeatureTransformer
from featurematching_tpu.models.matcher import Matcher


class TestWindows:
    def test_partition_reverse_roundtrip(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 8, 12, 3)).astype(np.float32))
        w = window_partition(x, 4)
        assert w.shape == (2 * 2 * 3, 16, 3)
        back = window_reverse(w, 4, 8, 12)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x))


class TestBackbones:
    def test_resnet_fpn_shapes(self, rng):
        model = ResNetFPN(initial_dim=8, block_dims=(8, 12, 16))
        x = jnp.asarray(rng.standard_normal((2, 64, 96, 1)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        coarse, fine = model.apply(variables, x)
        assert coarse.shape == (2, 8, 12, 16)  # 1/8
        assert fine.shape == (2, 32, 48, 8)  # 1/2

    def test_swin_unet_shapes(self, rng):
        model = SwinUNet(
            in_channels=1, embed_dim=64, depths=(1, 1, 1), depths_up=(1, 1, 1),
            num_heads=(2, 2, 2), window=4,
        )
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 1)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        coarse, fine = model.apply(variables, x)
        assert coarse.shape == (1, 8, 8, 256)  # 1/8, 256 ch
        assert fine.shape == (1, 32, 32, 64)  # 1/2, 64 ch

    def test_swin_shifted_window_padding(self, rng):
        """Stage at 6x10 with window 4 forces the padded SW-MSA path."""
        model = SwinUNet(
            in_channels=1, embed_dim=8, depths=(2, 1, 1), depths_up=(1, 1, 1),
            num_heads=(2, 2, 2), window=4,
        )
        x = jnp.asarray(rng.standard_normal((1, 48, 80, 1)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        coarse, fine = model.apply(variables, x)
        assert coarse.shape == (1, 6, 10, 256)
        assert fine.shape == (1, 24, 40, 64)
        assert np.isfinite(np.asarray(coarse)).all()


class TestTransformer:
    def test_forward_shapes_and_params(self, rng):
        model = LocalFeatureTransformer(16, 2, ("self", "cross"), "linear")
        f0 = jnp.asarray(rng.standard_normal((2, 10, 16)).astype(np.float32))
        f1 = jnp.asarray(rng.standard_normal((2, 14, 16)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), f0, f1)
        o0, o1 = model.apply(variables, f0, f1)
        assert o0.shape == f0.shape and o1.shape == f1.shape
        # 2 layers, each with q/k/v/merge + 2 mlp + 2 norms
        assert len(variables["params"]) == 2

    def test_full_vs_linear_both_run(self, rng):
        for attn in ("linear", "full"):
            model = LocalFeatureTransformer(16, 2, ("cross",), attn)
            f0 = jnp.asarray(rng.standard_normal((1, 6, 16)).astype(np.float32))
            f1 = jnp.asarray(rng.standard_normal((1, 8, 16)).astype(np.float32))
            variables = model.init(jax.random.PRNGKey(0), f0, f1)
            o0, _ = model.apply(variables, f0, f1)
            assert np.isfinite(np.asarray(o0)).all()


class TestMatcher:
    @pytest.fixture(scope="class")
    def tiny_setup(self):
        cfg = tiny_test_config()
        model = Matcher(cfg.model)
        B, H, W = 2, 64, 96
        rng = np.random.default_rng(3)
        img0 = jnp.asarray(rng.random((B, H, W, 1)).astype(np.float32))
        img1 = jnp.asarray(rng.random((B, H, W, 1)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), img0, img1)
        return cfg, model, variables, img0, img1

    def test_forward_shapes(self, tiny_setup):
        cfg, model, variables, img0, img1 = tiny_setup
        out = model.apply(variables, img0, img1)
        K = cfg.model.match_coarse.max_matches
        B = img0.shape[0]
        assert out.coarse.i_ids.shape == (B, K)
        assert out.coarse.mkpts0_c.shape == (B, K, 2)
        assert out.fine.mkpts0_f.shape == (B, K, 3)
        assert out.conf_matrix is None  # eval mode default
        L = (64 // 8) * (96 // 8)
        assert out.feat_c0.shape == (B, L, cfg.model.coarse.d_model)

    def test_forward_jit_and_valid_coords(self, tiny_setup):
        cfg, model, variables, img0, img1 = tiny_setup
        fwd = jax.jit(lambda v, a, b: model.apply(v, a, b))
        out = fwd(variables, img0, img1)
        mask = np.asarray(out.coarse.mask)
        mk0 = np.asarray(out.fine.mkpts0_f)[..., :2]
        H, W = img0.shape[1:3]
        if mask.any():
            pts = mk0[mask]
            assert (pts[:, 0] >= -4).all() and (pts[:, 0] <= W + 4).all()
            assert (pts[:, 1] >= -4).all() and (pts[:, 1] <= H + 4).all()

    def test_train_mode_uses_gt_ids_and_conf(self, tiny_setup):
        cfg, model, variables, img0, img1 = tiny_setup
        B = img0.shape[0]
        G = cfg.model.match_coarse.max_gt_matches
        L = (64 // 8) * (96 // 8)
        rng = np.random.default_rng(0)
        gi = jnp.asarray(rng.integers(0, L, (B, G)))
        gj = jnp.asarray(rng.integers(0, L, (B, G)))
        gm = jnp.asarray(np.ones((B, G), bool))
        out, _ = model.apply(
            variables, img0, img1, train=True, gt_ids=(gi, gj, gm),
            mutable=["batch_stats"],
        )
        assert out.conf_matrix is not None
        assert out.conf_matrix.shape == (B, L, L)
        np.testing.assert_array_equal(np.asarray(out.fine_ids[0]), np.asarray(gi))
        # fine keypoints anchored at the GT coarse cells
        wc = 96 // 8
        exp_x = (np.asarray(gi) % wc) * 8
        got_x = np.asarray(out.fine.mkpts0_f)[..., 0]
        assert np.abs(got_x - exp_x).max() <= 8.0  # within one coarse cell

    def test_identical_images_match_diagonal(self):
        """Self-matching two identical images should produce i==j matches."""
        cfg = tiny_test_config()
        model = Matcher(cfg.model)
        rng = np.random.default_rng(7)
        img = jnp.asarray(rng.random((1, 64, 64, 1)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(1), img, img)
        out = model.apply(variables, img, img)
        mask = np.asarray(out.coarse.mask[0])
        if mask.any():
            ii = np.asarray(out.coarse.i_ids[0])[mask]
            jj = np.asarray(out.coarse.j_ids[0])[mask]
            np.testing.assert_array_equal(ii, jj)


class TestMatcherSwin:
    def test_default_config_small_image(self):
        """Default (swin_v1) matcher on a 64x64 image — checks the full wiring
        at the real channel widths (256/64)."""
        cfg = default_config()
        from featurematching_tpu.config import replace as cfg_replace
        import dataclasses

        model_cfg = dataclasses.replace(
            cfg.model,
            compute_dtype="float32",
            match_coarse=dataclasses.replace(cfg.model.match_coarse, max_matches=16),
        )
        model = Matcher(model_cfg)
        rng = np.random.default_rng(0)
        img0 = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
        img1 = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), img0, img1)
        out = model.apply(variables, img0, img1)
        assert out.coarse.i_ids.shape == (1, 16)
        assert out.fine.mkpts0_f.shape == (1, 16, 3)
        assert np.isfinite(np.asarray(out.fine.mkpts0_f)).all()


class TestTpuOptimizedProfile:
    def test_profile_runs(self):
        import dataclasses

        from featurematching_tpu.config import tpu_optimized_config

        cfg = tpu_optimized_config()
        mcfg = dataclasses.replace(
            cfg.model, compute_dtype="float32",
            match_coarse=dataclasses.replace(cfg.model.match_coarse, max_matches=16),
        )
        model = Matcher(mcfg)
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
        v = model.init(jax.random.PRNGKey(0), img, img)
        out = model.apply(v, img, img)
        assert np.isfinite(np.asarray(out.fine.mkpts0_f)).all()
