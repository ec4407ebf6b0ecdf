"""Reference (torch) checkpoint -> flax parameter conversion.

Enables loading weights trained with /root/reference into this framework
(and is the instrument for numerics-parity validation: the reference's torch
forward is the oracle the converted flax model must reproduce —
SURVEY.md §7 "minimum end-to-end slice" validation).

All converters take a flat torch state_dict mapping names to NUMPY arrays
(call `{k: v.cpu().numpy() for k, v in sd.items()}` upstream; torch is not
imported here) and return flax-style nested dicts.

Layout rules: torch Linear weight [out, in] -> kernel [in, out];
Conv2d [O, I, kh, kw] -> [kh, kw, I, O]; LayerNorm weight/bias ->
scale/bias; BatchNorm -> params (scale, bias) + batch_stats (mean, var).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np

SD = Dict[str, np.ndarray]


def _dense(sd: SD, prefix: str, bias: bool = True) -> Dict[str, np.ndarray]:
    out = {"kernel": np.ascontiguousarray(sd[prefix + ".weight"].T)}
    if bias and prefix + ".bias" in sd:
        out["bias"] = sd[prefix + ".bias"]
    return out


def _conv(sd: SD, prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": np.ascontiguousarray(sd[prefix + ".weight"].transpose(2, 3, 1, 0))}
    if prefix + ".bias" in sd:
        out["bias"] = sd[prefix + ".bias"]
    return out


def _ln(sd: SD, prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}


def _bn(sd: SD, prefix: str):
    params = {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}
    stats = {"mean": sd[prefix + ".running_mean"], "var": sd[prefix + ".running_var"]}
    return params, stats


def convert_local_feature_transformer(sd: SD, num_layers: int, prefix: str = "") -> Dict:
    """Reference LocalFeatureTransformer (network/module/transformer.py) ->
    our models.transformer.LocalFeatureTransformer params."""
    params: Dict[str, Any] = {}
    for i in range(num_layers):
        p = f"{prefix}layers.{i}."
        params[f"layer_{i}"] = {
            "q_proj": _dense(sd, p + "q_proj", bias=False),
            "k_proj": _dense(sd, p + "k_proj", bias=False),
            "v_proj": _dense(sd, p + "v_proj", bias=False),
            "merge": _dense(sd, p + "merge", bias=False),
            "mlp1": _dense(sd, p + "mlp.0", bias=False),
            "mlp2": _dense(sd, p + "mlp.2", bias=False),
            "norm1": _ln(sd, p + "norm1"),
            "norm2": _ln(sd, p + "norm2"),
        }
    return params


def convert_resnet_fpn(sd: SD, prefix: str = "") -> Tuple[Dict, Dict]:
    """Reference ResNetFPN_8_2 -> (params, batch_stats)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put_bn(flax_name: str, torch_name: str):
        p, s = _bn(sd, prefix + torch_name)
        params[flax_name] = p
        stats[flax_name] = s

    params["conv1"] = _conv(sd, prefix + "conv1")
    put_bn("bn1", "bn1")

    for L in (1, 2, 3):
        for j in (0, 1):
            blk = f"layer{L}_{j}"
            tp = f"layer{L}.{j}."
            bp: Dict[str, Any] = {
                "conv1": _conv(sd, prefix + tp + "conv1"),
                "conv2": _conv(sd, prefix + tp + "conv2"),
            }
            bs: Dict[str, Any] = {}
            p1, s1 = _bn(sd, prefix + tp + "bn1")
            p2, s2 = _bn(sd, prefix + tp + "bn2")
            bp["bn1"], bs["bn1"] = p1, s1
            bp["bn2"], bs["bn2"] = p2, s2
            if prefix + tp + "downsample.0.weight" in sd:
                bp["down"] = _conv(sd, prefix + tp + "downsample.0")
                pd, sd_ = _bn(sd, prefix + tp + "downsample.1")
                bp["bn_down"], bs["bn_down"] = pd, sd_
            params[blk] = bp
            stats[blk] = bs

    params["layer3_outconv"] = _conv(sd, prefix + "layer3_outconv")
    for L in (1, 2):
        params[f"layer{L}_outconv"] = _conv(sd, prefix + f"layer{L}_outconv")
        params[f"layer{L}_outconv2_a"] = _conv(sd, prefix + f"layer{L}_outconv2.0")
        pb, sb = _bn(sd, prefix + f"layer{L}_outconv2.1")
        params[f"layer{L}_bn"] = pb
        stats[f"layer{L}_bn"] = sb
        params[f"layer{L}_outconv2_b"] = _conv(sd, prefix + f"layer{L}_outconv2.3")

    return params, stats


def _swin_block(sd: SD, p: str) -> Dict:
    return {
        "norm1": _ln(sd, p + "norm1"),
        "attn": {
            "qkv": _dense(sd, p + "attn.qkv"),
            "proj": _dense(sd, p + "attn.proj"),
            "rel_pos_bias": sd[p + "attn.relative_position_bias_table"],
        },
        "norm2": _ln(sd, p + "norm2"),
        "mlp1": _dense(sd, p + "mlp.fc1"),
        "mlp2": _dense(sd, p + "mlp.fc2"),
    }


def convert_swin_unet(
    sd: SD,
    depths: Sequence[int] = (2, 2, 6),
    depths_up: Sequence[int] = (1, 1, 1),
    prefix: str = "",
) -> Dict:
    """Reference SwinTransformer_v1 -> our SwinUNet params."""
    params: Dict[str, Any] = {
        "patch_embed": _conv(sd, prefix + "patch_embed.proj"),
    }
    if prefix + "patch_embed.norm.weight" in sd:
        params["patch_norm"] = _ln(sd, prefix + "patch_embed.norm")

    n_stages = len(depths)
    for i in range(n_stages):
        for b in range(depths[i]):
            params[f"enc{i}_blk{b}"] = _swin_block(
                sd, f"{prefix}layers.{i}.blocks.{b}."
            )
        if i < n_stages - 1:
            params[f"enc{i}_merge"] = {
                "norm": _ln(sd, f"{prefix}layers.{i}.downsample.norm"),
                "reduction": _dense(
                    sd, f"{prefix}layers.{i}.downsample.reduction", bias=False
                ),
            }
        params[f"norm_down{i}"] = _ln(sd, f"{prefix}norm_down.{i}")

    n_up = len(depths_up)
    for j in range(n_up):
        depth = depths_up[n_up - 1 - j]
        for b in range(depth):
            params[f"dec{j}_blk{b}"] = _swin_block(
                sd, f"{prefix}layers_up.{j}.blocks.{b}."
            )
        params[f"dec{j}_expand"] = {
            "expand": _dense(sd, f"{prefix}layers_up.{j}.upsample.expand", bias=False),
            "norm": _ln(sd, f"{prefix}layers_up.{j}.upsample.norm"),
        }
        params[f"norm_up{j}"] = _ln(sd, f"{prefix}norm_up.{j}")

    params["linear_middle"] = _dense(sd, prefix + "liner_middle", bias=False)
    params["linear_end"] = _dense(sd, prefix + "liner_end", bias=False)
    return params


def convert_loftr_tiny(sd: SD) -> Tuple[Dict, Dict]:
    """Official-LoFTR / LoFTR-tiny checkpoint -> coarse-only Matcher variables.

    Handles the naming the reference's LoFTR_tiny consumes
    (/root/reference/network/module/loftr_tiny.py:107-287): strips the
    'matcher.' lightning prefix (:283-287), maps `backbone.*` (its
    ResNetFPN_8_2 is architecturally identical to resnet_fpn.py:46) and
    `loftr_coarse.*` -> our `coarse_transformer`. Fine-stage keys
    (loftr_fine / fine_preprocess / fine_matching) are ignored, like the
    reference's strict=False load of outdoor_ds.ckpt.

    Returns (params, batch_stats) for a Matcher built with
    config.loftr_tiny_config().
    """
    clean: SD = {}
    for k, v in sd.items():
        if k.startswith("matcher."):
            k = k[len("matcher."):]
        clean[k] = v
    layer_ids = [
        int(k.split("loftr_coarse.layers.")[1].split(".")[0])
        for k in clean
        if k.startswith("loftr_coarse.layers.")
    ]
    if not layer_ids:
        raise ValueError(
            "no loftr_coarse.* keys found — not a LoFTR(-tiny) checkpoint"
        )
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    bb, bs = convert_resnet_fpn(clean, prefix="backbone.")
    params["backbone"] = bb
    stats["backbone"] = bs
    params["coarse_transformer"] = convert_local_feature_transformer(
        clean, max(layer_ids) + 1, prefix="loftr_coarse."
    )
    return params, stats


def load_loftr_tiny_checkpoint(path: str) -> Tuple[Dict, Dict]:
    """torch.load an official LoFTR .ckpt file (e.g. outdoor_ds.ckpt, with its
    {'state_dict': ...} wrapping) and convert via convert_loftr_tiny."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return convert_loftr_tiny(
        {k: v.cpu().numpy() for k, v in sd.items() if hasattr(v, "cpu")}
    )


def _conv1x1_as_dense(sd: SD, prefix: str) -> Dict[str, np.ndarray]:
    """Conv2d(kernel 1x1) [O, I, 1, 1] -> Dense kernel [I, O]."""
    w = sd[prefix + ".weight"]
    out = {"kernel": np.ascontiguousarray(w[:, :, 0, 0].T)}
    if prefix + ".bias" in sd:
        out["bias"] = sd[prefix + ".bias"]
    return out


def convert_pose_pred(sd: SD, num_layers: int, prefix: str = "") -> Dict:
    """Reference Pose_Pred / Pose_Pred_new (pose_pred.py:153-169,
    pose_pred_new.py:156-169 — identical module skeleton, 12 vs 7 output
    channels) -> our PosePredOld / PosePredNew params."""
    return {
        "transformer": convert_local_feature_transformer(
            sd, num_layers, prefix + "featuretransformer."
        ),
        "downsample": {
            "norm": _ln(sd, prefix + "downsample.norm"),
            "reduction": _dense(sd, prefix + "downsample.reduction", bias=False),
        },
        "norm": _ln(sd, prefix + "norm"),
        "head": _dense(sd, prefix + "head"),
        "pose_conv": _conv1x1_as_dense(sd, prefix + "pose_conv"),
    }


def convert_matcher(
    sd: SD,
    coarse_layers: int = 8,
    fine_layers: int = 2,
    depths: Sequence[int] = (2, 2, 6),
    depths_up: Sequence[int] = (1, 1, 1),
) -> Tuple[Dict, Dict]:
    """Full reference `net` state_dict -> (params, batch_stats) for Matcher.

    Handles the reference's ckpt key prefixes ('matcher.'/'loftr_' already
    stripped by its load_state_dict, net.py:94-102 — strip here too).
    """
    clean: SD = {}
    for k, v in sd.items():
        if k.startswith("matcher."):
            k = k[len("matcher."):]
        if k.startswith("loftr_"):
            k = k[len("loftr_"):]
        clean[k] = v
    sd = clean

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    if any(k.startswith("backbone.patch_embed") for k in sd):
        params["backbone"] = convert_swin_unet(
            sd, depths, depths_up, prefix="backbone."
        )
    else:
        bb, bs = convert_resnet_fpn(sd, prefix="backbone.")
        params["backbone"] = bb
        stats["backbone"] = bs
    params["coarse_transformer"] = convert_local_feature_transformer(
        sd, coarse_layers, prefix="coarse."
    )
    params["fine_transformer"] = convert_local_feature_transformer(
        sd, fine_layers, prefix="fine."
    )
    if "fine_preprocess.down_proj.weight" in sd:
        params["fine_down_proj"] = _dense(sd, "fine_preprocess.down_proj")
        params["fine_merge"] = _dense(sd, "fine_preprocess.merge_feat")
    params["mix_feat_0"] = _dense(sd, "fine_matching.mix_feat_0")
    params["mix_feat_1"] = _dense(sd, "fine_matching.mix_feat_1")
    if any(k.startswith("pose_pred.") for k in sd):
        n_pose_layers = (
            max(
                int(k.split("featuretransformer.layers.")[1].split(".")[0])
                for k in sd
                if "pose_pred.featuretransformer.layers." in k
            )
            + 1
        )
        params["pose_pred"] = convert_pose_pred(
            sd, n_pose_layers, prefix="pose_pred."
        )
    return params, stats


def make_deconverter(template_sd: SD, coarse_layers: int, fine_layers: int):
    """Inverse of convert_matcher: flax params -> reference torch state_dict.

    Built MECHANICALLY from convert_matcher itself via value provenance:
    every element of the template sd is replaced by a unique global integer
    id, run through convert_matcher, and the resulting flax leaves then give
    an elementwise (torch key, flat index) provenance map. This inverts ANY
    value-preserving rearrangement (transposes, conv flips, concats/splits)
    without per-layer code, and cannot drift from the forward mapping.
    Exactness requires total element count < 2^24 (f32 integer range) —
    asserted. Torch keys convert_matcher never reads (constant buffers like
    attn_mask, num_batches_tracked) pass through with template values.

    Returns deconvert(params) -> sd (numpy, template dtypes/shapes).
    """
    keys = list(template_sd.keys())
    sizes = {k: int(np.prod(template_sd[k].shape)) or 1 for k in keys}
    total = sum(sizes.values())
    assert total < (1 << 24), f"{total} params exceed exact-f32 id range"
    offsets = {}
    off = 0
    for k in keys:
        offsets[k] = off
        off += sizes[k]
    tagged = {
        k: (offsets[k] + np.arange(sizes[k], dtype=np.float32)).reshape(
            template_sd[k].shape
        )
        for k in keys
    }
    tp, _ = convert_matcher(tagged, coarse_layers, fine_layers)
    prov_leaves = [
        np.asarray(x).astype(np.int64).reshape(-1)
        for x in jax.tree_util.tree_leaves(tp)
    ]
    treedef = jax.tree_util.tree_structure(tp)

    def deconvert(params) -> SD:
        got_leaves = jax.tree_util.tree_leaves(params)
        got_def = jax.tree_util.tree_structure(params)
        assert got_def == treedef, (
            f"param tree mismatch:\n{got_def}\nvs template\n{treedef}"
        )
        flat = np.zeros(total, np.float64)
        for prov, leaf in zip(prov_leaves, got_leaves):
            leaf = np.asarray(leaf, np.float64).reshape(-1)
            assert leaf.shape == prov.shape, (leaf.shape, prov.shape)
            flat[prov] = leaf
        out: SD = {}
        for k in keys:
            t = template_sd[k]
            sl = flat[offsets[k] : offsets[k] + sizes[k]]
            out[k] = sl.reshape(t.shape).astype(t.dtype)
        # keys never consumed by convert_matcher keep their template values
        consumed = np.zeros(total, bool)
        for prov in prov_leaves:
            consumed[prov] = True
        for k in keys:
            if not consumed[offsets[k] : offsets[k] + sizes[k]].any():
                out[k] = np.asarray(template_sd[k])
        return out

    return deconvert
