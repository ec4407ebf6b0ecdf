"""Numerics parity against the reference implementation as an oracle.

Loads the REFERENCE torch modules from /root/reference (read-only), converts
their randomly-initialized weights with utils.torch_convert, and requires our
flax forward to reproduce the torch forward on identical inputs
(SURVEY.md §7: validate against the reference's forward, CPU torch as oracle).

timm is absent from this image; a minimal shim provides the three symbols the
reference's Swin file uses (DropPath/to_2tuple/trunc_normal_ — inference
behavior only).
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


from featurematching_tpu.utils.ref_oracle import load_ref_module, sd_numpy as _sd_numpy


def _load_ref_module(_name: str, relpath: str):
    return load_ref_module(relpath)


class TestTransformerParity:
    def test_linear_attention_transformer(self, rng):
        ref_mod = _load_ref_module("ref_transformer", "network/module/transformer.py")
        cfg = {"d_model": 32, "nhead": 4, "layer_names": ["self", "cross"],
               "attention": "linear"}
        torch.manual_seed(0)
        ref = ref_mod.LocalFeatureTransformer(cfg).eval()

        import jax
        import jax.numpy as jnp

        from featurematching_tpu.models.transformer import LocalFeatureTransformer
        from featurematching_tpu.utils.torch_convert import (
            convert_local_feature_transformer,
        )

        ours = LocalFeatureTransformer(32, 4, ("self", "cross"), "linear")
        f0 = rng.standard_normal((2, 24, 32)).astype(np.float32)
        f1 = rng.standard_normal((2, 30, 32)).astype(np.float32)

        params = convert_local_feature_transformer(_sd_numpy(ref), 2)
        with torch.no_grad():
            t0, t1 = ref(torch.from_numpy(f0), torch.from_numpy(f1))
        o0, o1 = ours.apply({"params": params}, jnp.asarray(f0), jnp.asarray(f1))
        np.testing.assert_allclose(np.asarray(o0), t0.numpy(), rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(o1), t1.numpy(), rtol=2e-3, atol=2e-3)

    def test_full_attention_parity(self, rng):
        ref_mod = _load_ref_module("ref_transformer2", "network/module/transformer.py")
        cfg = {"d_model": 16, "nhead": 2, "layer_names": ["cross"],
               "attention": "full"}
        torch.manual_seed(1)
        ref = ref_mod.LocalFeatureTransformer(cfg).eval()

        import jax.numpy as jnp

        from featurematching_tpu.models.transformer import LocalFeatureTransformer
        from featurematching_tpu.utils.torch_convert import (
            convert_local_feature_transformer,
        )

        ours = LocalFeatureTransformer(16, 2, ("cross",), "full")
        f0 = rng.standard_normal((1, 10, 16)).astype(np.float32)
        f1 = rng.standard_normal((1, 14, 16)).astype(np.float32)
        params = convert_local_feature_transformer(_sd_numpy(ref), 1)
        with torch.no_grad():
            t0, _ = ref(torch.from_numpy(f0), torch.from_numpy(f1))
        o0, _ = ours.apply({"params": params}, jnp.asarray(f0), jnp.asarray(f1))
        np.testing.assert_allclose(np.asarray(o0), t0.numpy(), rtol=2e-3, atol=2e-3)


class TestResNetFPNParity:
    def test_forward_parity(self, rng):
        ref_mod = _load_ref_module("ref_resnet", "network/backbone/resnet_fpn.py")
        torch.manual_seed(0)
        config = {"initial_dim": 16, "block_dims": [16, 24, 32]}
        ref = ref_mod.ResNetFPN_8_2(config).eval()

        import jax.numpy as jnp

        from featurematching_tpu.models.backbone_resnet_fpn import ResNetFPN
        from featurematching_tpu.utils.torch_convert import convert_resnet_fpn

        ours = ResNetFPN(initial_dim=16, block_dims=(16, 24, 32))
        params, stats = convert_resnet_fpn(_sd_numpy(ref))

        x = rng.standard_normal((2, 1, 64, 96)).astype(np.float32)
        with torch.no_grad():
            tc, tf = ref(torch.from_numpy(x))
        oc, of = ours.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x.transpose(0, 2, 3, 1)),
        )
        np.testing.assert_allclose(
            np.asarray(oc).transpose(0, 3, 1, 2), tc.numpy(), rtol=1e-3, atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(of).transpose(0, 3, 1, 2), tf.numpy(), rtol=1e-3, atol=1e-3
        )


class TestSwinParity:
    def test_swin_unet_forward_parity(self, rng):
        ref_mod = _load_ref_module(
            "ref_swin", "network/backbone/swin_backbone_modify_unetarchecture.py"
        )
        torch.manual_seed(0)
        ref = ref_mod.SwinTransformer_v1(
            pretrain_img_size=(64, 64), in_chans=1, embed_dim=64,
            depths=[2, 2, 6], depths_up=[1, 1, 1], num_heads=[4, 8, 16],
            window_size=8, drop_path_rate=0.0,
        ).eval()

        import jax.numpy as jnp

        from featurematching_tpu.models.backbone_swin import SwinUNet
        from featurematching_tpu.utils.torch_convert import convert_swin_unet

        ours = SwinUNet(in_channels=1, embed_dim=64, depths=(2, 2, 6),
                        depths_up=(1, 1, 1), num_heads=(4, 8, 16), window=8,
                        drop_path_rate=0.0)
        params = convert_swin_unet(_sd_numpy(ref))

        x = rng.standard_normal((1, 1, 64, 64)).astype(np.float32)
        with torch.no_grad():
            tc, tf = ref(torch.from_numpy(x))
        oc, of = ours.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(oc).transpose(0, 3, 1, 2), tc.numpy(), rtol=2e-3, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(of).transpose(0, 3, 1, 2), tf.numpy(), rtol=2e-3, atol=2e-3
        )


class TestCoarseMatchingParity:
    def test_match_extraction_vs_reference_module(self, rng):
        """Run the reference CoarseMatching (torch) on a conf matrix and
        require identical match sets from our extractor."""
        ref_mod = _load_ref_module(
            "ref_coarse", "network/utils/coarse_matching_new.py"
        )
        cm = ref_mod.CoarseMatching(
            {"thr": 0.2, "border_rm": 2, "train_coarse_percent": 1.0,
             "train_pad_num_gt_min": 20, "dsmax_temperature": 0.1}
        ).eval()

        import jax.numpy as jnp

        from featurematching_tpu.matching.coarse import coarse_match

        B, h, w, C = 1, 8, 10, 32
        f0 = rng.standard_normal((B, h * w, C)).astype(np.float32) * 2
        f1 = rng.standard_normal((B, h * w, C)).astype(np.float32) * 2

        data = {
            "hw0_i": (h * 8, w * 8), "hw1_i": (h * 8, w * 8),
            "hw0_c": (h, w), "hw1_c": (h, w),
        }
        with torch.no_grad():
            cm(torch.from_numpy(f0), torch.from_numpy(f1), data)
        ref_pairs = set(
            zip(data["i_ids"].numpy().tolist(), data["j_ids"].numpy().tolist())
        )
        ref_kpts0 = data["mkpts0_c"].numpy()

        matches, _ = coarse_match(
            jnp.asarray(f0), jnp.asarray(f1), (h, w), (h, w), 8.0,
            thr=0.2, border_rm=2, max_matches=h * w, impl="xla",
        )
        mask = np.asarray(matches.mask[0])
        got_pairs = set(
            zip(
                np.asarray(matches.i_ids[0])[mask].tolist(),
                np.asarray(matches.j_ids[0])[mask].tolist(),
            )
        )
        assert got_pairs == ref_pairs
        # keypoint coordinate convention identical
        if len(ref_pairs):
            ref_map = {
                (int(i), int(j)): k
                for k, (i, j) in enumerate(
                    zip(data["i_ids"].numpy(), data["j_ids"].numpy())
                )
            }
            for k in range(int(mask.sum())):
                key = (int(matches.i_ids[0][k]), int(matches.j_ids[0][k]))
                rk = ref_map[key]
                np.testing.assert_allclose(
                    np.asarray(matches.mkpts0_c[0][k]), ref_kpts0[rk], atol=1e-4
                )


class TestFineMatchingParity:
    def test_soft_argmax_refinement_vs_reference(self, rng):
        """Reference FineMatching (kornia-dsnt path, fine_matching_new.py:50-79)
        as oracle for our fine_soft_argmax: same mixed features -> identical
        subpixel keypoints + std column."""
        ref_mod = _load_ref_module("ref_fine", "network/utils/fine_matching_new.py")
        torch.manual_seed(3)
        ref = ref_mod.FineMatching({"d_model": 32}).eval()

        import jax.numpy as jnp

        from featurematching_tpu.matching.fine import fine_soft_argmax

        M, W, C = 12, 7, 32
        WW = W * W
        feat0 = rng.standard_normal((M, WW, C)).astype(np.float32)
        feat1 = rng.standard_normal((M, WW, C)).astype(np.float32)
        mk0 = rng.uniform(50, 400, (M, 2)).astype(np.float32)
        mk1 = rng.uniform(50, 400, (M, 2)).astype(np.float32)
        data = {
            "hw0_i": (480, 640), "hw0_f": (240, 320),
            "mkpts0_c": torch.from_numpy(mk0),
            "mkpts1_c": torch.from_numpy(mk1),
        }
        with torch.no_grad():
            ref(torch.from_numpy(feat0), torch.from_numpy(feat1), data)

        # apply the reference's 49->1 mixers by hand (they live in our Matcher)
        w0 = ref.mix_feat_0.weight.detach().numpy()[0]  # [49]
        b0 = ref.mix_feat_0.bias.detach().numpy()[0]
        w1 = ref.mix_feat_1.weight.detach().numpy()[0]
        b1 = ref.mix_feat_1.bias.detach().numpy()[0]
        mixed0 = np.einsum("mrc,r->mc", feat0, w0) + b0
        mixed1 = np.einsum("mrc,r->mc", feat1, w1) + b1

        fine = fine_soft_argmax(
            jnp.asarray(mixed0[None]), jnp.asarray(mixed1[None]),
            jnp.asarray(feat0[None]), jnp.asarray(feat1[None]),
            jnp.asarray(mk0[None]), jnp.asarray(mk1[None]),
            window=W, img_to_fine_scale=2.0,
        )
        np.testing.assert_allclose(
            np.asarray(fine.mkpts0_f[0]), data["mkpts0_f"].numpy(),
            rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(fine.mkpts1_f[0]), data["mkpts1_f"].numpy(),
            rtol=1e-4, atol=1e-4,
        )


class TestPoseHeadParity:
    def _feats(self, rng, B, L, C=256):
        f0 = (rng.standard_normal((B, L, C)) * 0.5).astype(np.float32)
        f1 = (rng.standard_normal((B, L, C)) * 0.5).astype(np.float32)
        return f0, f1

    def test_pose_pred_old_parity(self, rng):
        """Reference Pose_Pred (pose_pred.py:196-227) with converted weights;
        cv-blend weights 0 so the mid-forward OpenCV call contributes nothing."""
        ref_mod = _load_ref_module("ref_pose_old", "network/utils/pose_pred.py")
        h, w = 8, 8
        cfg = {
            "size": (h, w), "axis_w": 1.0, "trans_w": 1.0,
            "axis_w_cv": 0.0, "trans_w_cv": 0.0,
            "d_model": 256, "nhead": 8,
            "layer_names": ["self", "cross"], "attention": "linear",
        }
        torch.manual_seed(7)
        ref = ref_mod.Pose_Pred(cfg).eval()

        import jax.numpy as jnp

        from featurematching_tpu.models.pose_head import PosePredOld
        from featurematching_tpu.utils.torch_convert import convert_pose_pred

        f0, f1 = self._feats(rng, 1, h * w)
        kp = rng.uniform(10, 300, (24, 2)).astype(np.float32)
        data = {
            "mkpts0_f": torch.from_numpy(kp),
            "mkpts1_f": torch.from_numpy(kp + rng.normal(0, 2, kp.shape).astype(np.float32)),
            "K0": torch.eye(3)[None] * 300,
        }
        with torch.no_grad():
            ref(torch.from_numpy(f0), torch.from_numpy(f1), data)

        ours = PosePredOld(
            d_model=256, nhead=8, layer_names=("self", "cross"),
            attention="linear", size=(h, w),
        )
        params = convert_pose_pred(_sd_numpy(ref), 2)
        T01, T10 = ours.apply(
            {"params": params}, jnp.asarray(f0), jnp.asarray(f1)
        )
        np.testing.assert_allclose(
            np.asarray(T01[0]), data["T_0to1_pred"][0].numpy(), rtol=2e-3, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(T10[0]), data["T_1to0_pred"][0].numpy(), rtol=2e-3, atol=2e-3
        )

    def test_pose_pred_new_parity(self, rng):
        """Reference Pose_Pred_new (pose_pred_new.py:171-214): batch-stacked
        maps, 7-ch head, softmax over the direction axis, scipy quat -> R."""
        ref_mod = _load_ref_module("ref_pose_new", "network/utils/pose_pred_new.py")
        h, w = 8, 8
        cfg = {
            "size": (h, w), "axis_w": 1.0, "trans_w": 1.0,
            "d_model": 256, "nhead": 8,
            "layer_names": ["cross", "cross"], "attention": "linear",
        }
        torch.manual_seed(11)
        ref = ref_mod.Pose_Pred_new(cfg).eval()

        import jax.numpy as jnp

        from featurematching_tpu.models.pose_head import PosePredNew
        from featurematching_tpu.utils.torch_convert import convert_pose_pred

        f0, f1 = self._feats(rng, 1, h * w)
        data = {}
        with torch.no_grad():
            ref(torch.from_numpy(f0), torch.from_numpy(f1), data)

        ours = PosePredNew(
            d_model=256, nhead=8, layer_names=("cross", "cross"),
            attention="linear", size=(h, w),
        )
        params = convert_pose_pred(_sd_numpy(ref), 2)
        T01, T10, quat, trans = ours.apply(
            {"params": params}, jnp.asarray(f0), jnp.asarray(f1)
        )
        np.testing.assert_allclose(
            np.asarray(quat[0]), data["quot_pred"][0].numpy(), rtol=2e-3, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(trans[0]), data["translate_pred"][0].numpy(),
            rtol=2e-3, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(T01[0]), data["T_0to1_pred"][0].numpy(), rtol=2e-3, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(T10[0]), data["T_1to0_pred"][0].numpy(), rtol=2e-3, atol=2e-4
        )


class TestLossParity:
    def _ref_loss(self, coarse_type="focal", sparse=False):
        ref_mod = _load_ref_module("ref_loss", "losses.loss".replace(".", "/") + ".py")
        cfg = {
            "module": {
                "loss": {
                    "fine_correct_thr": 1.0, "pos_weight": 1.0, "neg_weight": 1.0,
                    "pose_loss_cal_flag": "none", "coarse_type": coarse_type,
                    "focal_alpha": 0.25, "focal_gamma": 2.0,
                    "coarse_weight": 1.0, "fine_weight": 1.0,
                    "r_weight": 1.0, "t_weight": 1.0,
                },
                "match_coarse": {"sparse_spvs": sparse},
            }
        }
        return ref_mod.Loss(cfg).eval()

    def _conf_pair(self, rng, L=24, S=24, n_pos=5):
        conf = rng.uniform(0.01, 0.99, (1, L, S)).astype(np.float32)
        gt = np.zeros((1, L, S), np.float32)
        ii = rng.choice(L, n_pos, replace=False)
        jj = rng.choice(S, n_pos, replace=False)
        gt[0, ii, jj] = 1.0
        return conf, gt

    @pytest.mark.parametrize(
        "coarse_type,sparse",
        [("focal", False), ("focal", True), ("cross_entropy", False)],
    )
    def test_coarse_loss_value_parity(self, rng, coarse_type, sparse):
        ref = self._ref_loss(coarse_type, sparse)
        conf, gt = self._conf_pair(rng)
        with torch.no_grad():
            ref_val = ref.compute_coarse_loss(
                torch.from_numpy(conf), torch.from_numpy(gt)
            ).item()

        import jax.numpy as jnp

        from featurematching_tpu.config import LossConfig
        from featurematching_tpu.losses.loss import compute_coarse_loss

        cfg = LossConfig(coarse_type=coarse_type, sparse_spvs=sparse)
        ours = float(
            compute_coarse_loss(jnp.asarray(conf), jnp.asarray(gt), cfg)
        )
        np.testing.assert_allclose(ours, ref_val, rtol=1e-5)

    def test_fine_loss_value_parity(self, rng):
        """Std-weighted fine loss incl. the all-rows inv-std normalizer and
        nonzero-GT row selection (loss.py:70-98)."""
        ref = self._ref_loss()
        M = 16
        mk0 = np.concatenate(
            [rng.uniform(0, 100, (M, 2)), rng.uniform(0.1, 2.0, (M, 1))], -1
        ).astype(np.float32)
        mk1 = np.concatenate(
            [rng.uniform(0, 100, (M, 2)), rng.uniform(0.1, 2.0, (M, 1))], -1
        ).astype(np.float32)
        gt0 = rng.uniform(0, 100, (M, 2)).astype(np.float32)
        gt1 = rng.uniform(0, 100, (M, 2)).astype(np.float32)
        gt0[5:9] = 0.0  # rows the reference drops (x == 0)
        gt1[2:4] = 0.0
        with torch.no_grad():
            ref_val = ref.compute_fine_loss(
                torch.from_numpy(mk0), torch.from_numpy(mk1),
                torch.from_numpy(gt0), torch.from_numpy(gt1),
            ).item()

        import jax.numpy as jnp

        from featurematching_tpu.losses.loss import compute_fine_loss

        ours = float(
            compute_fine_loss(
                jnp.asarray(mk0[None]), jnp.asarray(mk1[None]),
                jnp.asarray(gt0[None]), jnp.asarray(gt1[None]),
                jnp.ones((1, M), bool), window=7,
            )
        )
        np.testing.assert_allclose(ours, ref_val, rtol=1e-5)

    def test_fine_loss_padding_invariance(self, rng):
        """Padded rows (spv_mask False) must not change the loss — the
        fixed-shape equivalent of the reference's dynamic M."""
        import jax.numpy as jnp

        from featurematching_tpu.losses.loss import compute_fine_loss

        M, P = 12, 8
        mk = lambda n: np.concatenate(
            [rng.uniform(0, 100, (n, 2)), rng.uniform(0.1, 2.0, (n, 1))], -1
        ).astype(np.float32)
        mk0, mk1 = mk(M), mk(M)
        gt0 = rng.uniform(1, 100, (M, 2)).astype(np.float32)
        gt1 = rng.uniform(1, 100, (M, 2)).astype(np.float32)
        base = float(
            compute_fine_loss(
                jnp.asarray(mk0[None]), jnp.asarray(mk1[None]),
                jnp.asarray(gt0[None]), jnp.asarray(gt1[None]),
                jnp.ones((1, M), bool), window=7,
            )
        )
        pad = lambda a: np.concatenate(
            [a, np.full((P,) + a.shape[1:], 7.7, a.dtype)]
        )
        mask = np.concatenate([np.ones(M, bool), np.zeros(P, bool)])
        padded = float(
            compute_fine_loss(
                jnp.asarray(pad(mk0)[None]), jnp.asarray(pad(mk1)[None]),
                jnp.asarray(pad(gt0)[None]), jnp.asarray(pad(gt1)[None]),
                jnp.asarray(mask[None]), window=7,
            )
        )
        np.testing.assert_allclose(padded, base, rtol=1e-5)

    def test_pose_loss_new_value_parity(self, rng):
        """Quat MSE(sum) + log translation MSE(mean) blend (loss.py:155-165)."""
        ref = self._ref_loss()
        quat_pred = rng.uniform(0, 1, (1, 2, 4)).astype(np.float32)
        trans_pred = rng.standard_normal((1, 2, 3)).astype(np.float32)
        q01 = rng.uniform(0, 1, (1, 4)).astype(np.float32)
        q10 = rng.uniform(0, 1, (1, 4)).astype(np.float32)
        T01 = np.eye(4, dtype=np.float32)
        T01[:3, 3] = rng.standard_normal(3)
        T10 = np.eye(4, dtype=np.float32)
        T10[:3, 3] = rng.standard_normal(3)

        with torch.no_grad():
            quot_loss = ref.quot_loss(
                torch.from_numpy(q01), torch.from_numpy(quat_pred[:, 0])
            )
            quot_inv = ref.quot_loss(
                torch.from_numpy(q10), torch.from_numpy(quat_pred[:, 1])
            )
            t_loss = ref.translate_loss(
                torch.from_numpy(T01[:3, 3:].T), torch.from_numpy(trans_pred[:, 0])
            )
            t_inv = ref.translate_loss(
                torch.from_numpy(T10[:3, 3:].T), torch.from_numpy(trans_pred[:, 1])
            )
            R_e = (quot_loss + quot_inv) / 2
            t_e = (t_loss + t_inv) / 2
            ref_val = float(R_e * 1.0 + torch.log(t_e + 1) * 1.0)

        import jax.numpy as jnp

        from featurematching_tpu.config import LossConfig
        from featurematching_tpu.losses.loss import compute_pose_loss_new

        ours = float(
            compute_pose_loss_new(
                jnp.asarray(quat_pred), jnp.asarray(trans_pred),
                jnp.asarray(q01), jnp.asarray(q10),
                jnp.asarray(T01[None, :3, 3]), jnp.asarray(T10[None, :3, 3]),
                LossConfig(),
            )
        )
        np.testing.assert_allclose(ours, ref_val, rtol=1e-5)


class TestLoFTRTinyTeacherImport:
    def test_coarse_only_matcher_reproduces_loftr_tiny(self, rng):
        """End-to-end teacher import (VERDICT item 7): a randomly-initialized
        reference LoFTR_tiny (loftr_tiny.py:244-281) converted with
        convert_loftr_tiny must reproduce conf_matrix + match extraction in
        our coarse_only Matcher. The out-of-repo `Loftr` package is shimmed
        with the reference's own transformer.py (the same module the external
        package provides — verbatim LoFTR upstream code)."""
        ref_tf = _load_ref_module("ref_transformer3", "network/module/transformer.py")
        # shim the external Loftr package (loftr_tiny.py:9-11)
        for name in ("Loftr", "Loftr.src"):
            sys.modules.setdefault(name, types.ModuleType(name))
        lm = types.ModuleType("Loftr.src.loftr_module")
        lm.LocalFeatureTransformer = ref_tf.LocalFeatureTransformer
        cfgmod = types.ModuleType("Loftr.src.cvpr_ds_config")
        cfgmod.loftr_default_cfg = {}
        sys.modules["Loftr.src.loftr_module"] = lm
        sys.modules["Loftr.src.cvpr_ds_config"] = cfgmod

        ref_mod = _load_ref_module("ref_loftr_tiny", "network/module/loftr_tiny.py")
        coarse_cfg = {
            "d_model": 256, "nhead": 8,
            "layer_names": ["self", "cross"], "attention": "linear",
        }
        torch.manual_seed(5)
        ref = ref_mod.LoFTR_tiny({"coarse": coarse_cfg}).eval()

        # checkpoint round-trip through the names the reference strips
        sd = {"matcher." + k: v for k, v in _sd_numpy(ref).items()}

        import dataclasses

        import jax.numpy as jnp

        from featurematching_tpu.config import loftr_tiny_config
        from featurematching_tpu.models.matcher import Matcher
        from featurematching_tpu.utils.torch_convert import convert_loftr_tiny

        cfg = loftr_tiny_config()
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model,
                coarse=dataclasses.replace(
                    cfg.model.coarse, layer_names=("self", "cross")
                ),
            ),
        )
        params, stats = convert_loftr_tiny(sd)

        H, W = 64, 64
        img = (rng.uniform(0, 255, (1, 1, H, W))).astype(np.float32)
        img2 = (rng.uniform(0, 255, (1, 1, H, W))).astype(np.float32)
        data = {
            "image0": torch.from_numpy(img), "image1": torch.from_numpy(img2),
        }
        with torch.no_grad():
            ref(data)

        model = Matcher(cfg.model)
        out = model.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(img.transpose(0, 2, 3, 1)),
            jnp.asarray(img2.transpose(0, 2, 3, 1)),
            want_conf_matrix=True,
        )
        np.testing.assert_allclose(
            np.asarray(out.conf_matrix[0]),
            data["conf_matrix"][0].numpy(),
            rtol=5e-3, atol=5e-5,
        )
        ref_pairs = set(
            zip(data["i_ids"].numpy().tolist(), data["j_ids"].numpy().tolist())
        )
        mask = np.asarray(out.coarse.mask[0])
        got_pairs = set(
            zip(
                np.asarray(out.coarse.i_ids[0])[mask].tolist(),
                np.asarray(out.coarse.j_ids[0])[mask].tolist(),
            )
        )
        assert got_pairs == ref_pairs


class TestPositionalEncodingParity:
    def test_sine_pe_matches_reference(self):
        ref_mod = _load_ref_module("ref_pe", "network/utils/position_encoding.py")
        d_model = 32
        ref = ref_mod.PositionEncodingSine(d_model, max_shape=(16, 20))

        from featurematching_tpu.models.matcher import sine_positional_encoding

        ours = sine_positional_encoding((16, 20), d_model)  # [H, W, C]
        ref_pe = ref.pe[0].numpy()[:, :16, :20].transpose(1, 2, 0)
        np.testing.assert_allclose(ours, ref_pe, atol=1e-5)
