"""Fast inference engine: the Matcher forward as a pure function over the
linen param tree, with fully-fused Pallas Swin blocks.

The linen `Matcher` stays the source of truth for training and reference
parity; this engine consumes the SAME `variables` (weight-compatible by
construction — it reads the param tree produced by `Matcher.init` /
checkpoint restore) and replaces the backbone's per-op XLA chain with
`ops.pallas_swin_block.swin_block_fused` per block. Output equality against
`Matcher.apply` is tested (tests/test_fast_inference.py).

Usage:
    fwd = make_fast_matcher_fn(cfg.model)          # jit-able
    out = jax.jit(fwd)(variables, image0, image1)  # same MatcherOutput fields
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from featurematching_tpu.config import ModelConfig
from featurematching_tpu.matching.coarse import (
    CoarseMatches,
    extract_matches_from_stats,
    ids_to_keypoints,
)
from featurematching_tpu.matching.fine import (
    fine_from_heatmaps,
    fine_soft_argmax,
    gather_fine_windows,
)
from featurematching_tpu.ops.pallas_coarse_transformer import (
    coarse_transformer_fused,
    coarse_transformer_supported,
)
from featurematching_tpu.models.backbone_swin import (
    _rel_pos_bias_from_table,
    _shift_attn_mask,
    window_partition,
    window_reverse,
)
from featurematching_tpu.models.matcher import MatcherOutput
from featurematching_tpu.models.transformer import LocalFeatureTransformer
from featurematching_tpu.ops.pallas_dual_softmax import dual_softmax_match_stats
from featurematching_tpu.ops.pallas_fine_stage import (
    fine_stage_fused,
    fine_stage_supported,
)
from featurematching_tpu.ops.pallas_ln import layer_norm_chain
from featurematching_tpu.ops.pallas_patch_expand import (
    patch_expand_ln,
    patch_expand_supported,
)
from featurematching_tpu.ops.pallas_swin_block import swin_block_fused


def _ln(x, p, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    out = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (out * p["scale"] + p["bias"]).astype(x.dtype)


def _dense(x, p):
    y = jnp.einsum(
        "...i,io->...o", x, p["kernel"].astype(x.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _block_params(p: Dict, window: int, num_heads: int) -> Dict:
    return {
        "ln1_scale": p["norm1"]["scale"],
        "ln1_bias": p["norm1"]["bias"],
        "w_qkv": p["attn"]["qkv"]["kernel"],
        "b_qkv": p["attn"]["qkv"]["bias"],
        "rel_bias": _rel_pos_bias_from_table(
            p["attn"]["rel_pos_bias"], window, num_heads
        ),
        "w_proj": p["attn"]["proj"]["kernel"],
        "b_proj": p["attn"]["proj"]["bias"],
        "ln2_scale": p["norm2"]["scale"],
        "ln2_bias": p["norm2"]["bias"],
        "w_mlp1": p["mlp1"]["kernel"],
        "b_mlp1": p["mlp1"]["bias"],
        "w_mlp2": p["mlp2"]["kernel"],
        "b_mlp2": p["mlp2"]["bias"],
    }


def _run_block(x, H, W, p, window, shift, num_heads, interpret):
    """One Swin block in window space via the fused kernel. x: [B, H*W, C].

    Measured note (round 2): the image-layout kernel variant
    (ops/pallas_swin_block.swin_block_image — window partition/reverse/roll
    absorbed into block index maps + in-VMEM relayout) was built, parity-
    tested and device-profiled at 8.17 ms vs 7.32 ms for this window-space
    form, with the copy bucket nearly unchanged (5.29 vs 5.58 ms): XLA
    already fuses the partition/roll copies into neighbors, and the in-VMEM
    relayout + pad-formulation extra windows cost more than they save. The
    window-space layout stays the production path."""
    B, L, C = x.shape
    xi = x.reshape(B, H, W, C)
    pad_b = (window - H % window) % window
    pad_r = (window - W % window) % window
    if pad_b or pad_r:
        xi = jnp.pad(xi, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    Hp, Wp = H + pad_b, W + pad_r
    if shift > 0:
        xi = jnp.roll(xi, shift=(-shift, -shift), axis=(1, 2))
        mask = jnp.asarray(_shift_attn_mask(Hp, Wp, window, shift))
    else:
        mask = None
    xw = window_partition(xi, window)
    ow = swin_block_fused(
        xw, mask, _block_params(p, window, num_heads), num_heads,
        interpret=interpret,
    )
    oi = window_reverse(ow, window, Hp, Wp)
    if shift > 0:
        oi = jnp.roll(oi, shift=(shift, shift), axis=(1, 2))
    if pad_b or pad_r:
        oi = oi[:, :H, :W]
    return oi.reshape(B, H * W, C)


def _patch_merge(x, H, W, p):
    B, L, C = x.shape
    xi = x.reshape(B, H, W, C)
    if H % 2 or W % 2:
        xi = jnp.pad(xi, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
    cat = jnp.concatenate(
        [xi[:, 0::2, 0::2], xi[:, 1::2, 0::2], xi[:, 0::2, 1::2], xi[:, 1::2, 1::2]],
        axis=-1,
    )
    cat = cat.reshape(B, -1, 4 * C)
    return _dense(_ln(cat, p["norm"]), p["reduction"])


def _patch_expand(x, H, W, p, p_norm_up, interpret):
    """Expand dense + depth-to-space + PatchExpand LN + stage norm_up LN.

    The depth-to-space reshuffle must stay in bf16: without the barrier XLA
    hoists the LayerNorms' f32 convert above the reshape/transpose pair and
    the three full-feature-map layout copies run at twice the bytes
    (profiled at ~3.6 ms of the forward at [8,19200,256] -> [8,76800,64]).
    The two back-to-back LNs run as one Pallas pass (two HBM round trips
    instead of ~6 reduce/apply passes).

    Measured dead end (round 2): moving the depth-to-space INSIDE a Pallas
    kernel (to kill the remaining ~1.26 ms of XLA 6-d transpose copies) is
    unlowerable on this Mosaic version — every formulation hits
    "infer-vector-layout: unsupported shape cast": the lane split
    vector<...x256> -> <...x2x2x64>, jnp.stack's unit-dim insertion
    <16x4x64> -> <16x4x1x64>, and even strided ref stores
    o_ref[0,:,di,:,dj,:]. Permutation-matmul interleaves lower but their
    surrounding stacks do not. Revisit when Mosaic's relayout support grows.
    """
    B, L, C = x.shape
    y = _dense(x, p["expand"])
    Ce = y.shape[-1]
    y = y.reshape(B, H, W, 2, 2, Ce // 4)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, 4 * H * W, Ce // 4)
    y = jax.lax.optimization_barrier(y)
    return layer_norm_chain(
        y, p["norm"]["scale"], p["norm"]["bias"],
        p_norm_up["scale"], p_norm_up["bias"], interpret=interpret,
    )


def _patch_expand_fused(x, H, W, p, p_norm_up, head, emit_ln, interpret):
    """PatchExpand via ops/pallas_patch_expand: the depth-to-space 6-d
    transpose (round-2/3 profile: ~0.95 ms copies + 0.31 ms reshape) is
    replaced by two contiguous lane-half reshapes + an interleaving output
    BlockSpec, and the LN chain (+ optional head dense: linear_middle /
    linear_end) runs in the same HBM pass. Falls back to `_patch_expand`
    when the shape is unsupported."""
    y = _dense(x, p["expand"])
    Ce = y.shape[-1]
    if not patch_expand_supported(Ce):
        out = _patch_expand(x, H, W, p, p_norm_up, interpret)
        outs = [out] if emit_ln else []
        if head is not None:
            outs.append(_dense(out, head))
        return tuple(outs)
    return patch_expand_ln(
        y, H, W,
        p["norm"]["scale"], p["norm"]["bias"],
        p_norm_up["scale"], p_norm_up["bias"],
        w_head=head["kernel"].astype(y.dtype) if head is not None else None,
        b_head=head.get("bias", jnp.zeros(head["kernel"].shape[1]))
        if head is not None else None,
        emit_ln=emit_ln, interpret=interpret,
    )


def swin_backbone_fast(
    params: Dict, x: jnp.ndarray, cfg: ModelConfig, interpret: bool = False
):
    """SwinUNet forward with fused blocks. x: [B, H, W, C_in] -> (coarse, fine)."""
    s = cfg.swin
    dtype = jnp.dtype(cfg.compute_dtype)
    p = params["backbone"]
    B = x.shape[0]

    # patch embed: conv via lax (VALID, stride = patch). Measured dead end
    # (round 2): a reshape+matmul patch extraction costs MORE (~1.7 ms vs
    # ~1.0) — XLA lowers the [B,Wh,P,Ww,P,3] patch transpose with a
    # pathological {4,3,2,1,5,0} layout (3-channel lane dim); the conv's
    # internal im2col is the better layout engine here.
    k = p["patch_embed"]["kernel"].astype(dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), k, (s.patch_size, s.patch_size), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["patch_embed"]["bias"].astype(dtype)
    Wh, Ww = y.shape[1], y.shape[2]
    y = y.reshape(B, Wh * Ww, s.embed_dim)
    if s.patch_norm:
        pn = p["patch_norm"]
        y = layer_norm_chain(y, pn["scale"], pn["bias"], interpret=interpret)

    n_stages = len(s.depths)
    for i in range(n_stages):
        for b in range(s.depths[i]):
            shift = 0 if b % 2 == 0 else s.window_size // 2
            y = _run_block(
                y, Wh, Ww, p[f"enc{i}_blk{b}"], s.window_size, shift,
                s.num_heads[i], interpret,
            )
        if i < n_stages - 1:
            y = _patch_merge(y, Wh, Ww, p[f"enc{i}_merge"])
            Wh, Ww = (Wh + 1) // 2, (Ww + 1) // 2
        nd = p[f"norm_down{i}"]
        y = layer_norm_chain(y, nd["scale"], nd["bias"], interpret=interpret)

    out_c = out_f = None
    n_up = len(s.depths_up)
    for j in range(n_up):
        depth = s.depths_up[n_up - 1 - j]
        heads = s.num_heads[n_up - 1 - j]
        for b in range(depth):
            shift = 0 if b % 2 == 0 else s.window_size // 2
            y = _run_block(
                y, Wh, Ww, p[f"dec{j}_blk{b}"], s.window_size, shift, heads,
                interpret,
            )
        last = j == n_up - 1
        head = p["linear_middle"] if j == 0 else (p["linear_end"] if last else None)
        outs = _patch_expand_fused(
            y, Wh, Ww, p[f"dec{j}_expand"], p[f"norm_up{j}"],
            head=head, emit_ln=not last, interpret=interpret,
        )
        Wh, Ww = Wh * 2, Ww * 2
        if j == 0:
            y, oc = outs
            out_c = oc.reshape(B, Wh, Ww, 256)
        elif last:
            out_f = outs[0].reshape(B, Wh, Ww, 64)
        else:
            y = outs[0]
    return out_c, out_f


def make_fast_matcher_fn(cfg: ModelConfig, interpret: bool = False):
    """Returns fwd(variables, image0, image1) -> MatcherOutput (eval only)."""
    coarse_tf = LocalFeatureTransformer(
        cfg.coarse.d_model, cfg.coarse.nhead, cfg.coarse.layer_names,
        cfg.coarse.attention, jnp.dtype(cfg.compute_dtype),
    )
    fine_tf = LocalFeatureTransformer(
        cfg.fine.d_model, cfg.fine.nhead, cfg.fine.layer_names,
        cfg.fine.attention, jnp.dtype(cfg.compute_dtype),
    )

    def fwd(variables, image0, image1):
        assert cfg.backbone_type == "swin_v1", "fast path implements swin_v1"
        params = variables["params"]
        dtype = jnp.dtype(cfg.compute_dtype)
        B, H, W, _ = image0.shape
        sc, sf = cfg.resolution
        hc, wc = H // sc, W // sc

        imgs = jnp.concatenate([image0, image1], axis=0).astype(dtype)
        feat_c, feat_f = swin_backbone_fast(params, imgs, cfg, interpret)
        feat_c0, feat_c1 = feat_c[:B], feat_c[B:]
        feat_f0, feat_f1 = feat_f[:B], feat_f[B:]
        Cc = feat_c0.shape[-1]
        Cf = feat_f0.shape[-1]

        feat_c0 = feat_c0.reshape(B, hc * wc, Cc)
        feat_c1 = feat_c1.reshape(B, hc * wc, Cc)
        use_fused_coarse = (
            not interpret
            and jax.default_backend() != "cpu"
            and cfg.coarse.attention == "linear"
            and coarse_transformer_supported(
                cfg.coarse.layer_names, Cc, cfg.coarse.nhead, hc * wc
            )
        )
        if use_fused_coarse:
            # 8 encoder layers as streaming stats+apply kernel pairs — the
            # XLA op-chain here device-profiled at ~5.5 ms/iter
            feat_c0, feat_c1 = coarse_transformer_fused(
                feat_c0, feat_c1, params["coarse_transformer"],
                cfg.coarse.layer_names, cfg.coarse.nhead,
            )
        else:
            feat_c0, feat_c1 = coarse_tf.apply(
                {"params": params["coarse_transformer"]}, feat_c0, feat_c1
            )

        mc = cfg.match_coarse
        impl = "xla" if (interpret or jax.default_backend() == "cpu") else "pallas"
        stats = dual_softmax_match_stats(
            feat_c0, feat_c1, temperature=mc.dsmax_temperature, impl=impl
        )
        i_ids, j_ids, mask, mconf = extract_matches_from_stats(
            stats, (hc, wc), (hc, wc), mc.thr, mc.border_rm, mc.max_matches
        )
        mkpts0_c = ids_to_keypoints(i_ids, wc, float(sc))
        mkpts1_c = ids_to_keypoints(j_ids, wc, float(sc))
        matches = CoarseMatches(
            i_ids=i_ids, j_ids=j_ids, mask=mask, mconf=mconf,
            mkpts0_c=mkpts0_c, mkpts1_c=mkpts1_c,
        )

        # fine stage
        Wf_win = cfg.fine.window_size
        stride = sc // sf
        win0 = gather_fine_windows(feat_f0, i_ids, (hc, wc), Wf_win, stride)
        win1 = gather_fine_windows(feat_f1, j_ids, (hc, wc), Wf_win, stride)
        if cfg.fine.concat_coarse_feat:
            c0 = jnp.take_along_axis(feat_c0, i_ids[..., None], axis=1)
            c1 = jnp.take_along_axis(feat_c1, j_ids[..., None], axis=1)
            c0 = _dense(c0, params["fine_down_proj"])[:, :, None, :]
            c1 = _dense(c1, params["fine_down_proj"])[:, :, None, :]
            win0 = _dense(
                jnp.concatenate([win0, jnp.broadcast_to(c0, win0.shape)], -1),
                params["fine_merge"],
            )
            win1 = _dense(
                jnp.concatenate([win1, jnp.broadcast_to(c1, win1.shape)], -1),
                params["fine_merge"],
            )
        K = win0.shape[1]
        ww = Wf_win * Wf_win
        use_fused_fine = (
            not interpret
            and jax.default_backend() != "cpu"
            and cfg.fine.attention == "linear"
            and fine_stage_supported(cfg.fine.layer_names, Cf, cfg.fine.nhead)
        )
        if use_fused_fine:
            # whole fine transformer + 49->1 mixing + center-vs-window
            # soft-argmax correlation/softmax in ONE Pallas kernel — the XLA
            # chain here is ~20 small [B*K, ww, C] HBM round trips, and the
            # fold skips the two [B*K, ww, C] window writebacks entirely
            heat0, heat1 = fine_stage_fused(
                win0.reshape(B * K, ww, Cf),
                win1.reshape(B * K, ww, Cf),
                params["fine_transformer"],
                params["mix_feat_0"], params["mix_feat_1"],
                cfg.fine.layer_names, cfg.fine.nhead,
                fold_softargmax=True,
            )
            fine = fine_from_heatmaps(
                heat0.reshape(B, K, ww), heat1.reshape(B, K, ww),
                mkpts0_c, mkpts1_c, Wf_win, float(sf),
            )
            return MatcherOutput(
                coarse=matches, fine=fine, conf_matrix=None,
                feat_c0=feat_c0, feat_c1=feat_c1,
                fine_ids=(i_ids, j_ids, mask),
            )
        else:
            w0, w1 = fine_tf.apply(
                {"params": params["fine_transformer"]},
                win0.reshape(B * K, ww, Cf),
                win1.reshape(B * K, ww, Cf),
            )
            w0 = w0.reshape(B, K, ww, Cf)
            w1 = w1.reshape(B, K, ww, Cf)

            def _mix(w, p):
                # 49->1 window mixing as a direct contraction over the window
                # axis: the swapaxes+Dense form forced a [B,K,C,ww] transpose
                # whose layout pressure rippled back into an f32 copy of the
                # fine-attention output (traced ~0.5 ms/iter). Same math.
                y = jnp.einsum(
                    "bkrc,r->bkc", w, p["kernel"][:, 0].astype(w.dtype),
                    preferred_element_type=jnp.float32,
                ).astype(w.dtype)
                if "bias" in p:
                    y = y + p["bias"][0].astype(w.dtype)
                return y

            w0_mixed = _mix(w0, params["mix_feat_0"])
            w1_mixed = _mix(w1, params["mix_feat_1"])
        fine = fine_soft_argmax(
            w0_mixed.astype(jnp.float32), w1_mixed.astype(jnp.float32),
            w0.astype(jnp.float32), w1.astype(jnp.float32),
            mkpts0_c, mkpts1_c, Wf_win, float(sf),
        )
        return MatcherOutput(
            coarse=matches, fine=fine, conf_matrix=None,
            feat_c0=feat_c0, feat_c1=feat_c1,
            fine_ids=(i_ids, j_ids, mask),
        )

    return fwd
