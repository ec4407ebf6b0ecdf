"""Numerics parity against the reference implementation as an oracle.

Loads the REFERENCE torch modules from /root/reference (read-only), converts
their randomly-initialized weights with utils.torch_convert, and requires our
flax forward to reproduce the torch forward on identical inputs
(SURVEY.md §7: validate against the reference's forward, CPU torch as oracle).

timm is absent from this image; a minimal shim provides the three symbols the
reference's Swin file uses (DropPath/to_2tuple/trunc_normal_ — inference
behavior only).
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _install_timm_shim():
    if "timm" in sys.modules:
        return
    import torch.nn as nn

    shim = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x  # eval-mode identity

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, std=1.0, **kw):
        with torch.no_grad():
            tensor.normal_(0, std)
        return tensor

    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    models.layers = layers
    shim.models = models
    sys.modules["timm"] = shim
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


def _load_ref_module(name: str, relpath: str):
    """Import a reference module as part of its package (relative imports)."""
    _install_timm_shim()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib

    modname = relpath.replace("/", ".").removesuffix(".py")
    return importlib.import_module(modname)


def _sd_numpy(module) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


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


class TestPositionalEncodingParity:
    def test_sine_pe_matches_reference(self):
        ref_mod = _load_ref_module("ref_pe", "network/utils/position_encoding.py")
        d_model = 32
        ref = ref_mod.PositionEncodingSine(d_model, max_shape=(16, 20))

        from featurematching_tpu.models.matcher import sine_positional_encoding

        ours = sine_positional_encoding((16, 20), d_model)  # [H, W, C]
        ref_pe = ref.pe[0].numpy()[:, :16, :20].transpose(1, 2, 0)
        np.testing.assert_allclose(ours, ref_pe, atol=1e-5)
