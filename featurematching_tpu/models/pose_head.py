"""Learned relative-pose regression heads.

Re-design of /root/reference/network/utils/pose_pred.py:154-230 ("old":
axis-angle + translation, both directions) and pose_pred_new.py ("new":
quaternion + translation). The reference's 'old' head optionally blends in an
OpenCV RANSAC pose computed on CPU mid-forward (pose_pred.py:170-197,
weights axis_w_cv/trans_w_cv, both 0 by default) — here that hook takes an
optional precomputed on-device RANSAC pose instead, keeping the forward pure.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from featurematching_tpu.geometry.se3 import (
    axis_angle_to_matrix,
    quat_to_matrix,
)
from featurematching_tpu.models.backbone_swin import PatchMerging
from featurematching_tpu.models.transformer import LocalFeatureTransformer


def _transform_from(axisangle_zyx: jnp.ndarray, translation: jnp.ndarray) -> jnp.ndarray:
    """Reference-ordered axis-angle [rz, ry, rx] + t -> [B, 4, 4].

    pose_pred.py:59-98 reads vec[...,0] into the z role; our
    axis_angle_to_matrix uses [rx, ry, rz], so flip.
    """
    R = axis_angle_to_matrix(axisangle_zyx[..., ::-1])
    B = R.shape[0]
    T = jnp.zeros((B, 4, 4), R.dtype)
    T = T.at[:, :3, :3].set(R)
    T = T.at[:, :3, 3].set(translation)
    T = T.at[:, 3, 3].set(1.0)
    return T


class PosePredOld(nn.Module):
    """LoFTR-transformer over coarse feats -> PatchMerging -> 12-ch head ->
    2x(axis-angle, translation). Reference: pose_pred.py:154-230."""

    d_model: int = 256
    nhead: int = 8
    layer_names: Sequence[str] = ("self", "cross")
    attention: str = "linear"
    size: Tuple[int, int] = (60, 80)
    axis_w: float = 1.0
    trans_w: float = 1.0
    axis_w_cv: float = 0.0
    trans_w_cv: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        feat_c0: jnp.ndarray,
        feat_c1: jnp.ndarray,
        cv_pose: Optional[Tuple[jnp.ndarray, ...]] = None,
    ):
        """feat_c*: [B, L, C]; returns (T_0to1_pred, T_1to0_pred) [B, 4, 4]."""
        h, w = self.size
        f0, f1 = LocalFeatureTransformer(
            self.d_model, self.nhead, self.layer_names, self.attention,
            self.dtype, name="transformer",
        )(feat_c0, feat_c1)
        down = PatchMerging(self.d_model, self.dtype, name="downsample")
        f0d = down(f0, h, w)  # [B, hw/4, 2C]
        f1d = down(f1, h, w)
        B = f0d.shape[0]
        f0d = f0d.reshape(B, h // 2, w // 2, -1)
        f1d = f1d.reshape(B, h // 2, w // 2, -1)
        cat = jnp.concatenate([f0d, f1d], axis=-1)  # [B, h/2, w/2, 4C] (NHWC)
        out = nn.LayerNorm(dtype=self.dtype, name="norm")(cat)
        out = nn.Dense(self.d_model, dtype=self.dtype, name="head")(out)
        out = nn.Dense(12, dtype=self.dtype, name="pose_conv")(out)  # 1x1 conv
        out = jnp.mean(out, axis=(1, 2))  # [B, 12]
        out = out.reshape(B, 2, 6).astype(jnp.float32)
        axisangle = out[..., :3]  # [B, 2, 3]
        translation = out[..., 3:]

        aa_fwd = self.axis_w * axisangle[:, 0]
        t_fwd = self.trans_w * translation[:, 0]
        aa_inv = self.axis_w * axisangle[:, 1]
        t_inv = self.trans_w * translation[:, 1]
        if cv_pose is not None:
            aa_cv, t_cv, aa_cv_inv, t_cv_inv = cv_pose
            aa_fwd = aa_fwd + self.axis_w_cv * aa_cv
            t_fwd = t_fwd + self.trans_w_cv * t_cv
            aa_inv = aa_inv + self.axis_w_cv * aa_cv_inv
            t_inv = t_inv + self.trans_w_cv * t_cv_inv
        return _transform_from(aa_fwd, t_fwd), _transform_from(aa_inv, t_inv)


class PosePredNew(nn.Module):
    """Cross-only transformer -> PatchMerging -> 7-ch head (3 trans + 4 quat,
    quat softmax-normalized). Reference: pose_pred_new.py:129-214."""

    d_model: int = 256
    nhead: int = 8
    layer_names: Sequence[str] = ("cross", "cross", "cross", "cross")
    attention: str = "linear"
    size: Tuple[int, int] = (60, 80)
    dtype: jnp.dtype = jnp.float32
    # 'softmax_dir': bit-faithful to the reference (pose_pred_new.py:169,189)
    #   — nn.Softmax across the two prediction DIRECTIONS per component. This
    #   constrains every quat component to (0, 1) with q[:,0]+q[:,1]=1, which
    #   cannot represent general unit quaternions: the head is architecturally
    #   unable to learn rotation (measured chance-level ~120 deg R_med,
    #   benchmarks/pose_s7.json).
    # 'l2' (the 'new_fixed' head): per-direction L2 normalization with the
    #   sign canonicalized to w >= 0 — matches the GT convention
    #   (geometry.se3.matrix_to_quat) so the chordal MSE loss
    #   (losses/loss.py:compute_pose_loss_new) is well-posed.
    quat_norm: str = "softmax_dir"

    @nn.compact
    def __call__(self, feat_c0: jnp.ndarray, feat_c1: jnp.ndarray):
        """Returns (T_0to1_pred, T_1to0_pred, quat_pred [B,2,4], trans_pred [B,2,3]).

        Mirrors the reference computation exactly (pose_pred_new.py:171-199):
        the two downsampled maps are stacked on the BATCH axis (each direction
        predicted from one image's features), normed over 2C, projected to 7
        channels, and global-mean-pooled. The reference then applies
        nn.Softmax(dim=0) over the stacked [2, 4] quaternion rows — i.e. per
        component ACROSS the two directions, not across quat components
        (:169,189); that only makes sense for B=1, so here it is the batched
        generalization: softmax over the direction axis within each pair.
        """
        h, w = self.size
        B = feat_c0.shape[0]
        f0, f1 = LocalFeatureTransformer(
            self.d_model, self.nhead, self.layer_names, self.attention,
            self.dtype, name="transformer",
        )(feat_c0, feat_c1)
        down = PatchMerging(self.d_model, self.dtype, name="downsample")
        f0d = down(f0, h, w).reshape(B, h // 2, w // 2, -1)
        f1d = down(f1, h, w).reshape(B, h // 2, w // 2, -1)
        cat = jnp.concatenate([f0d, f1d], axis=0)  # [2B, h/2, w/2, 2C]
        out = nn.LayerNorm(dtype=self.dtype, name="norm")(cat)
        out = nn.Dense(self.d_model, dtype=self.dtype, name="head")(out)
        out = nn.Dense(7, dtype=self.dtype, name="pose_conv")(out)  # 1x1 conv
        out = jnp.mean(out, axis=(1, 2)).astype(jnp.float32)  # [2B, 7]
        out = jnp.stack([out[:B], out[B:]], axis=1)  # [B, 2, 7]
        trans = out[..., :3]  # [B, 2, 3]
        raw = out[..., 3:]
        if self.quat_norm == "l2":
            q = raw / (jnp.linalg.norm(raw, axis=-1, keepdims=True) + 1e-8)
            quat = jnp.where(q[..., 3:4] >= 0, q, -q)  # w >= 0 canonical
        else:
            quat = nn.softmax(raw, axis=1)  # over the direction axis

        def to_T(q, t):
            R = quat_to_matrix(q)
            T = jnp.zeros((B, 4, 4), jnp.float32)
            T = T.at[:, :3, :3].set(R)
            T = T.at[:, :3, 3].set(t)
            T = T.at[:, 3, 3].set(1.0)
            return T

        return to_T(quat[:, 0], trans[:, 0]), to_T(quat[:, 1], trans[:, 1]), quat, trans
