"""Top-level coarse-to-fine matcher — the TPU equivalent of the reference's
`net` (/root/reference/network/net.py:20-102).

Pipeline (all fixed-shape, one jit-able program):
  1. shared-weight backbone over the stacked image pair (twin batching via
     concat on the batch axis, like net.py:56)
  2. coarse LoFTR transformer over flattened [B, L, C] features
  3. dual-softmax coarse matching -> static top-K match list
  4. fine window gather (+ optional coarse-context merge) at match ids
     (training: ground-truth spv ids, mirroring coarse_matching_new.py:113-120)
  5. fine LoFTR transformer over [B*K, W*W, C] windows
  6. learned 49->1 window mixing + center-vs-window soft-argmax refinement
  7. optional pose head over the coarse features

Positional encoding note: the reference constructs PositionEncodingSine but
bypasses it for the Swin backbone (net.py:66-70 commented out); we add it only
for the ResNet-FPN backbone, which otherwise has no positional signal.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from featurematching_tpu.config import ModelConfig
from featurematching_tpu.matching.coarse import (
    CoarseMatches,
    coarse_match,
    dual_softmax_confidence,
    ids_to_keypoints,
)
from featurematching_tpu.matching.fine import (
    FineMatches,
    fine_soft_argmax,
    gather_fine_windows,
)

from featurematching_tpu.models.backbone_resnet_fpn import ResNetFPN
from featurematching_tpu.models.backbone_swin import SwinUNet
from featurematching_tpu.models.pose_head import PosePredNew, PosePredOld
from featurematching_tpu.models.transformer import LocalFeatureTransformer


class MatcherOutput(NamedTuple):
    coarse: CoarseMatches  # static top-K predicted matches (always computed)
    fine: FineMatches  # refined keypoints at the ids used for the fine stage
    conf_matrix: Optional[jnp.ndarray]  # [B, L, S] fp32 (None if not requested)
    feat_c0: jnp.ndarray  # [B, L, C] post-transformer coarse features
    feat_c1: jnp.ndarray
    fine_ids: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]  # (i, j, mask) used for fine
    T_0to1_pred: Optional[jnp.ndarray] = None
    T_1to0_pred: Optional[jnp.ndarray] = None
    quat_pred: Optional[jnp.ndarray] = None
    trans_pred: Optional[jnp.ndarray] = None


def sine_positional_encoding(shape: Tuple[int, int], d_model: int) -> np.ndarray:
    """2D sinusoidal PE [H, W, C] (reference position_encoding.py:5-28)."""
    h, w = shape
    pe = np.zeros((d_model, h, w), dtype=np.float32)
    # positions start at 1 (reference uses ones().cumsum())
    y = np.arange(1, h + 1, dtype=np.float32)[:, None]
    x = np.arange(1, w + 1, dtype=np.float32)[None, :]
    div = np.exp(
        np.arange(0, d_model // 2, 2, dtype=np.float32)
        * (-np.log(10000.0) / (d_model // 2))
    )[:, None, None]
    pe[0::4] = np.sin(x[None] * div)
    pe[1::4] = np.cos(x[None] * div)
    pe[2::4] = np.sin(y[None] * div)
    pe[3::4] = np.cos(y[None] * div)
    return pe.transpose(1, 2, 0)  # HWC


class _WindowMix(nn.Module):
    """Learned ww->1 window mixing as a direct contraction over the window
    axis. Drop-in for the nn.Dense(1)-on-swapaxes form (identical param tree:
    kernel [ww, 1] lecun_normal, bias [1] zeros; identical math) — the
    swapaxes forced a [B, G, C, ww] layout transpose whose pressure rippled
    into full-feature f32 copies on TPU (see fast_inference._mix note)."""

    window_tokens: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, w: jnp.ndarray) -> jnp.ndarray:  # [B, G, ww, C]
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.window_tokens, 1), jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros_init(), (1,), jnp.float32)
        y = jnp.einsum(
            "bgrc,r->bgc", w, k[:, 0].astype(self.dtype),
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        return y + b[0].astype(self.dtype)


class Matcher(nn.Module):
    """Config-driven coarse-to-fine matcher."""

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        image0: jnp.ndarray,
        image1: jnp.ndarray,
        train: bool = False,
        gt_ids: Optional[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]] = None,
        want_conf_matrix: Optional[bool] = None,
        shard_mesh=None,
    ) -> MatcherOutput:
        """image*: [B, H, W, C_in] (NHWC, same static shape).

        gt_ids: (spv_i_ids, spv_j_ids, spv_mask), each [B, G] — the fine stage
        samples these during training (like the reference substituting
        spv_{b,i,j}_ids, coarse_matching_new.py:113-120).

        shard_mesh: a ('data', 'model') Mesh with model>1 runs the coarse
        correlation sequence-parallel over the 'model' axis (the [L, S]
        volume is sharded on S; only O(L) stats cross the ICI) — the
        high-resolution serving mode (SURVEY.md §5).
        """
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        B, H, W, _ = image0.shape
        sc, sf = cfg.resolution  # coarse/fine strides (8, 2)
        if image0.shape != image1.shape:
            raise ValueError(
                f"image0 {image0.shape} and image1 {image1.shape} must have the "
                "same static shape (pad/resize upstream)"
            )
        if H % sc or W % sc:
            raise ValueError(
                f"image size {H}x{W} must be divisible by the coarse stride "
                f"{sc} (got H%{sc}={H % sc}, W%{sc}={W % sc}); resize or pad "
                "the input"
            )
        hc, wc = H // sc, W // sc
        hf, wf = H // sf, W // sf
        if want_conf_matrix is None:
            want_conf_matrix = train

        # 1. backbone on stacked pair (shared weights)
        imgs = jnp.concatenate([image0, image1], axis=0).astype(dtype)
        if cfg.backbone_type == "swin_v1":
            s = cfg.swin
            if s.fused_attention == "auto":
                fused = (not train) and jax.default_backend() not in ("cpu",)
            else:
                fused = s.fused_attention == "on"
            if s.fused_block == "auto":
                fused_blk = jax.default_backend() not in ("cpu",)
            else:
                fused_blk = s.fused_block == "on"
            feat_c, feat_f = SwinUNet(
                in_channels=cfg.input_channels,
                patch_size=s.patch_size,
                embed_dim=s.embed_dim,
                depths=s.depths,
                depths_up=s.depths_up,
                num_heads=s.num_heads,
                window=s.window_size,
                mlp_ratio=s.mlp_ratio,
                qkv_bias=s.qkv_bias,
                drop_path_rate=s.drop_path_rate,
                patch_norm=s.patch_norm,
                dtype=dtype,
                fused_attention=fused and not fused_blk,
                fused_block=fused_blk,
                name="backbone",
            )(imgs, train=train)
        elif cfg.backbone_type == "resnet_fpn":
            r = cfg.resnet_fpn
            feat_c, feat_f = ResNetFPN(
                initial_dim=r.initial_dim,
                block_dims=r.block_dims,
                dtype=dtype,
                name="backbone",
            )(imgs, train=train)
        else:
            raise ValueError(f"unknown backbone {cfg.backbone_type!r}")

        feat_c0, feat_c1 = feat_c[:B], feat_c[B:]  # [B, hc, wc, Cc]
        feat_f0, feat_f1 = feat_f[:B], feat_f[B:]  # [B, hf, wf, Cf]
        Cc = feat_c0.shape[-1]
        Cf = feat_f0.shape[-1]
        assert Cc == cfg.coarse.d_model and Cf == cfg.fine.d_model

        # 2. coarse transformer over flattened sequences
        use_pe = cfg.positional_encoding
        if use_pe is None:  # auto: resnet has no positional signal; swin does
            use_pe = cfg.backbone_type == "resnet_fpn"
        if use_pe:
            pe = jnp.asarray(sine_positional_encoding((hc, wc), Cc), dtype)
            feat_c0 = feat_c0 + pe[None]
            feat_c1 = feat_c1 + pe[None]
        feat_c0 = feat_c0.reshape(B, hc * wc, Cc)
        feat_c1 = feat_c1.reshape(B, hc * wc, Cc)
        if cfg.coarse.fused_train == "auto":
            fused_tf = jax.default_backend() not in ("cpu",)
        else:
            fused_tf = cfg.coarse.fused_train == "on"
        feat_c0, feat_c1 = LocalFeatureTransformer(
            cfg.coarse.d_model, cfg.coarse.nhead, cfg.coarse.layer_names,
            cfg.coarse.attention, dtype, name="coarse_transformer",
            use_fused_train=fused_tf,
        )(feat_c0, feat_c1)

        # 3. coarse matching — normalize by sqrt(C) each (carried inside
        # dual_softmax_confidence), threshold+border+mutual-NN+top-K
        mc = cfg.match_coarse
        if train and gt_ids is not None and not want_conf_matrix:
            # sparse-supervised TRAIN step: fine ids come from GT and the
            # coarse loss from ops/sparse_focal_loss — the extracted match
            # list is dead weight (its stats kernels + top-K while loop cost
            # ~1.5 ms/step at 640x480 batch 4, round-5 trace). Emit an empty
            # fixed-shape list instead; eval/inference always extracts.
            B_, K = feat_c0.shape[0], mc.max_matches
            zi = jnp.zeros((B_, K), jnp.int32)
            matches = CoarseMatches(
                i_ids=zi, j_ids=zi, mask=jnp.zeros((B_, K), bool),
                mconf=jnp.zeros((B_, K), feat_c0.dtype),
                mkpts0_c=jnp.zeros((B_, K, 2), jnp.float32),
                mkpts1_c=jnp.zeros((B_, K, 2), jnp.float32),
            )
            conf_out = None
        else:
            if want_conf_matrix:
                conf = dual_softmax_confidence(
                    feat_c0, feat_c1, mc.dsmax_temperature
                )
            else:
                conf = None
            matches, conf = coarse_match(
                feat_c0, feat_c1, (hc, wc), (hc, wc), float(sc),
                thr=mc.thr, border_rm=mc.border_rm,
                temperature=mc.dsmax_temperature,
                max_matches=mc.max_matches, conf=conf,
                mesh=shard_mesh,
            )
            if not want_conf_matrix:
                conf_out = None
            else:
                conf_out = conf

        # coarse-only (LoFTR-tiny teacher mode, loftr_tiny.py:107-242): skip
        # fine refinement; "fine" keypoints are the coarse centers, std = 0
        if cfg.coarse_only:
            zeros = jnp.zeros_like(matches.mkpts0_c[..., :1])
            fine = FineMatches(
                mkpts0_f=jnp.concatenate([matches.mkpts0_c, zeros], -1),
                mkpts1_f=jnp.concatenate([matches.mkpts1_c, zeros], -1),
                coords0=jnp.zeros_like(matches.mkpts0_c),
                coords1=jnp.zeros_like(matches.mkpts1_c),
                std0=zeros[..., 0],
                std1=zeros[..., 0],
            )
            return MatcherOutput(
                coarse=matches, fine=fine, conf_matrix=conf_out,
                feat_c0=feat_c0, feat_c1=feat_c1,
                fine_ids=(matches.i_ids, matches.j_ids, matches.mask),
            )

        # 4. choose fine-stage ids (train: GT supervision ids)
        if train and gt_ids is not None:
            fid_i, fid_j, fid_mask = gt_ids
            fine_mkpts0_c = ids_to_keypoints(fid_i, wc, float(sc))
            fine_mkpts1_c = ids_to_keypoints(fid_j, wc, float(sc))
        else:
            fid_i, fid_j, fid_mask = matches.i_ids, matches.j_ids, matches.mask
            fine_mkpts0_c = matches.mkpts0_c
            fine_mkpts1_c = matches.mkpts1_c

        # 5. fine preprocess: gather windows + optional coarse context merge
        Wf_win = cfg.fine.window_size
        stride = sc // sf
        win0 = gather_fine_windows(feat_f0, fid_i, (hc, wc), Wf_win, stride)
        win1 = gather_fine_windows(feat_f1, fid_j, (hc, wc), Wf_win, stride)
        if cfg.fine.concat_coarse_feat:
            # down-project coarse feats at match ids, broadcast over window,
            # merge (fine_preprocess.py:52-60); weights shared across images
            down = nn.Dense(Cf, dtype=dtype, name="fine_down_proj")
            merge = nn.Dense(Cf, dtype=dtype, name="fine_merge")
            c0 = jnp.take_along_axis(feat_c0, fid_i[..., None], axis=1)  # [B, G, Cc]
            c1 = jnp.take_along_axis(feat_c1, fid_j[..., None], axis=1)
            c0 = down(c0)[:, :, None, :]  # [B, G, 1, Cf]
            c1 = down(c1)[:, :, None, :]
            ww = Wf_win * Wf_win
            win0 = merge(
                jnp.concatenate([win0, jnp.broadcast_to(c0, win0.shape)], -1)
            )
            win1 = merge(
                jnp.concatenate([win1, jnp.broadcast_to(c1, win1.shape)], -1)
            )

        # 6. fine transformer over windows as sequences
        G = win0.shape[1]
        ww = Wf_win * Wf_win
        w0 = win0.reshape(B * G, ww, Cf)
        w1 = win1.reshape(B * G, ww, Cf)
        if cfg.fine.fused_train == "auto":
            fused_ftf = jax.default_backend() not in ("cpu",)
        else:
            fused_ftf = cfg.fine.fused_train == "on"
        w0, w1 = LocalFeatureTransformer(
            cfg.fine.d_model, cfg.fine.nhead, cfg.fine.layer_names,
            cfg.fine.attention, dtype, name="fine_transformer",
            use_fused_train=fused_ftf,
        )(w0, w1)
        w0 = w0.reshape(B, G, ww, Cf)
        w1 = w1.reshape(B, G, ww, Cf)

        # 7. learned window mixing (49->1) + soft-argmax
        # mix over the window dim: [B, G, ww, C] -> [B, G, C]
        w0_mixed = _WindowMix(ww, dtype, name="mix_feat_0")(w0)
        w1_mixed = _WindowMix(ww, dtype, name="mix_feat_1")(w1)
        fine = fine_soft_argmax(
            w0_mixed.astype(jnp.float32),
            w1_mixed.astype(jnp.float32),
            w0.astype(jnp.float32),
            w1.astype(jnp.float32),
            fine_mkpts0_c,
            fine_mkpts1_c,
            Wf_win,
            float(sf),
        )

        # 8. optional pose head
        T01 = T10 = quat_pred = trans_pred = None
        if cfg.pose.flag == "old":
            T01, T10 = PosePredOld(
                d_model=cfg.pose.d_model, nhead=cfg.pose.nhead,
                layer_names=cfg.pose.layer_names_old, attention=cfg.pose.attention,
                size=(hc, wc), axis_w=cfg.pose.axis_w, trans_w=cfg.pose.trans_w,
                dtype=dtype, name="pose_pred",
            )(feat_c0, feat_c1)
        elif cfg.pose.flag in ("new", "new_fixed"):
            T01, T10, quat_pred, trans_pred = PosePredNew(
                d_model=cfg.pose.d_model, nhead=cfg.pose.nhead,
                layer_names=cfg.pose.layer_names_new, attention=cfg.pose.attention,
                size=(hc, wc), dtype=dtype,
                quat_norm="l2" if cfg.pose.flag == "new_fixed" else "softmax_dir",
                name="pose_pred",
            )(feat_c0, feat_c1)

        return MatcherOutput(
            coarse=matches,
            fine=fine,
            conf_matrix=conf_out,
            feat_c0=feat_c0,
            feat_c1=feat_c1,
            fine_ids=(fid_i, fid_j, fid_mask),
            T_0to1_pred=T01,
            T_1to0_pred=T10,
            quat_pred=quat_pred,
            trans_pred=trans_pred,
        )
