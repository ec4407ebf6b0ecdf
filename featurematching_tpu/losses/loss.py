"""Training losses — pure, fixed-shape, fully on-device.

Re-design of /root/reference/losses/loss.py. Differences forced by the TPU
redesign:
  * all selections are masked reductions instead of boolean indexing
    (conf[pos_mask] etc. — loss.py:34-67);
  * the reference's "assign a false supervision to avoid ddp deadlock" hacks
    (loss.py:37-41,73-75) disappear: masked means are already total functions
    of fixed-shape inputs, so every rank always computes the same program;
  * the 'old' pose loss (loss.py:144-154) ran numpy/OpenCV on CPU and was
    NOT added to the total (loss.py:169 commented out) — we keep it as a
    metric via geometry.relative_pose_error, also not added.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from featurematching_tpu.config import LossConfig
from featurematching_tpu.geometry.se3 import relative_pose_error


class LossOutput(NamedTuple):
    loss: jnp.ndarray  # scalar total
    loss_c: jnp.ndarray
    loss_f: jnp.ndarray
    loss_pose: jnp.ndarray


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def compute_coarse_loss(
    conf: jnp.ndarray,
    conf_gt: jnp.ndarray,
    cfg: LossConfig,
) -> jnp.ndarray:
    """Focal / CE loss on the dual-softmax confidence matrix.

    conf, conf_gt: [B, L, S]. Port of loss.py:27-67 with masked reductions.
    """
    conf = jnp.clip(conf, 1e-6, 1 - 1e-6)
    pos = conf_gt > 0.5
    neg = ~pos

    if cfg.coarse_type == "cross_entropy":
        loss_pos = _masked_mean(-jnp.log(conf), pos)
        loss_neg = _masked_mean(-jnp.log(1.0 - conf), neg)
        return cfg.pos_weight * loss_pos + cfg.neg_weight * loss_neg

    if cfg.coarse_type != "focal":
        raise ValueError(f"unknown coarse loss {cfg.coarse_type!r}")

    alpha, gamma = cfg.focal_alpha, cfg.focal_gamma
    loss_pos_el = -alpha * (1.0 - conf) ** gamma * jnp.log(conf)
    if cfg.sparse_spvs:
        # sparse supervision: positives only (loss.py:57-62)
        return cfg.pos_weight * _masked_mean(loss_pos_el, pos)
    loss_neg_el = -alpha * conf**gamma * jnp.log(1.0 - conf)
    return cfg.pos_weight * _masked_mean(loss_pos_el, pos) + cfg.neg_weight * _masked_mean(
        loss_neg_el, neg
    )


def compute_fine_loss(
    mkpts0_f: jnp.ndarray,
    mkpts1_f: jnp.ndarray,
    expec_f_gt_0: jnp.ndarray,
    expec_f_gt_1: jnp.ndarray,
    spv_mask: jnp.ndarray,
    window: int = 7,
) -> jnp.ndarray:
    """Std-weighted L2 on subpixel offsets (loss.py:70-98).

    mkpts*_f: [B, G, 3] (x, y, std); expec_f_gt_*: [B, G, 2] pixel targets
    (zeros where no GT); spv_mask: [B, G].
    The reference weights by inverse std (normalized by its mean, detached)
    and keeps rows whose GT x is nonzero (loss.py:86-96); /7 is the fine
    window size.
    """
    std0 = mkpts0_f[..., 2]
    std1 = mkpts1_f[..., 2]
    inv0 = 1.0 / jnp.clip(std0, min=1e-10)
    inv1 = 1.0 / jnp.clip(std1, min=1e-10)
    m0 = spv_mask & (expec_f_gt_0[..., 0] != 0)
    m1 = spv_mask & (expec_f_gt_1[..., 0] != 0)
    # stop-gradient on the std weights ("avoid minimizing loss through
    # increasing std", loss.py:83-84). NOTE the normalizer is the mean of
    # inv-std over ALL real rows (reference loss.py:85-86 divides by
    # torch.mean over the full M), not just the nonzero-GT rows it later
    # selects — spv_mask is our "all real rows" equivalent.
    w0 = jax.lax.stop_gradient(
        jnp.nan_to_num(inv0 / jnp.maximum(_masked_mean(inv0, spv_mask), 1e-10))
    )
    w1 = jax.lax.stop_gradient(
        jnp.nan_to_num(inv1 / jnp.maximum(_masked_mean(inv1, spv_mask), 1e-10))
    )

    off0 = jnp.sum(((mkpts0_f[..., :2] - expec_f_gt_0) / window) ** 2, axis=-1)
    off1 = jnp.sum(((mkpts1_f[..., :2] - expec_f_gt_1) / window) ** 2, axis=-1)
    return _masked_mean(off0 * w0, m0) + _masked_mean(off1 * w1, m1)


def compute_pose_loss_new(
    quat_pred: jnp.ndarray,
    trans_pred: jnp.ndarray,
    quat_0to1: jnp.ndarray,
    quat_1to0: jnp.ndarray,
    t_0to1: jnp.ndarray,
    t_1to0: jnp.ndarray,
    cfg: LossConfig,
    mode: str = "ref",
) -> jnp.ndarray:
    """Pose loss for the quaternion head.

    mode='ref' (the 'new' head): quaternion MSE (sum) + log translation MSE
    (mean) — quirk-faithful to reference loss.py:155-165. Two known defects
    ride along: the quat MSE ignores the q/-q double cover, and the log-MSE
    on raw translation channels entangles scale with direction (two-view
    pose is scale-free — the eval metric is ANGULAR t error; round-4
    measured t_med stuck at 55.3 deg under this loss).

    mode='fixed' (the 'new_fixed' head): sign-invariant chordal quaternion
    distance min(|q-q_hat|^2, |q+q_hat|^2) + scale-free cosine direction
    loss 1 - |cos(t, t_hat)| on unit vectors (|.| because an E-matrix
    decomposition only fixes t up to sign through the cheirality check the
    head never sees)."""
    if mode == "fixed":
        def chordal(q_gt, q_hat):
            d_minus = jnp.sum((q_gt - q_hat) ** 2, axis=-1)
            d_plus = jnp.sum((q_gt + q_hat) ** 2, axis=-1)
            return jnp.mean(jnp.minimum(d_minus, d_plus))

        def t_dir(t_gt, t_hat):
            g = t_gt / jnp.maximum(
                jnp.linalg.norm(t_gt, axis=-1, keepdims=True), 1e-8
            )
            h = t_hat / jnp.maximum(
                jnp.linalg.norm(t_hat, axis=-1, keepdims=True), 1e-8
            )
            return jnp.mean(1.0 - jnp.abs(jnp.sum(g * h, axis=-1)))

        q_loss = chordal(quat_0to1, quat_pred[:, 0]) + chordal(
            quat_1to0, quat_pred[:, 1]
        )
        t_loss = t_dir(t_0to1, trans_pred[:, 0]) + t_dir(t_1to0, trans_pred[:, 1])
        return cfg.r_weight * q_loss / 2.0 + cfg.t_weight * t_loss / 2.0
    q_loss = jnp.sum((quat_0to1 - quat_pred[:, 0]) ** 2) + jnp.sum(
        (quat_1to0 - quat_pred[:, 1]) ** 2
    )
    t_loss = jnp.mean((t_0to1 - trans_pred[:, 0]) ** 2) + jnp.mean(
        (t_1to0 - trans_pred[:, 1]) ** 2
    )
    R_e = q_loss / 2.0
    t_e = t_loss / 2.0
    return cfg.r_weight * R_e + cfg.t_weight * jnp.log(t_e + 1.0)


def compute_pose_metric_old(
    T_0to1: jnp.ndarray,
    T_1to0: jnp.ndarray,
    T_0to1_pred: jnp.ndarray,
    T_1to0_pred: jnp.ndarray,
    cfg: LossConfig,
) -> jnp.ndarray:
    """log(1 + R_err + t_err) averaged over both directions (loss.py:144-154).
    Metric only — the reference never adds it to the total (loss.py:169).

    NOTE: the reference's call site unpacks `t_err, R_err = relative_pose_
    error(...)` (loss.py:145-148) while the function returns (R_err, t_err),
    silently swapping the two in its r_weight/t_weight blend; and its t_err
    there is the absolute translation L2, not the angular error. We keep the
    intended order (R with r_weight) — a deliberate bug-fix divergence, same
    policy as the swin_v1 dispatch fix."""
    R_err_f, t_err_f = relative_pose_error(
        T_0to1, T_0to1_pred[..., :3, :3], T_0to1_pred[..., :3, 3]
    )
    R_err_b, t_err_b = relative_pose_error(
        T_1to0, T_1to0_pred[..., :3, :3], T_1to0_pred[..., :3, 3]
    )
    R_e = jnp.mean(jnp.stack([R_err_f, R_err_b]))
    t_e = jnp.mean(jnp.stack([t_err_f, t_err_b]))
    return jnp.log(cfg.r_weight * R_e + cfg.t_weight * t_e + 1.0)


def total_loss(
    conf: Optional[jnp.ndarray],
    conf_gt: Optional[jnp.ndarray],
    mkpts0_f: jnp.ndarray,
    mkpts1_f: jnp.ndarray,
    expec_f_gt_0: jnp.ndarray,
    expec_f_gt_1: jnp.ndarray,
    spv_mask: jnp.ndarray,
    cfg: LossConfig,
    window: int = 7,
    loss_pose: Optional[jnp.ndarray] = None,
    loss_c_override: Optional[jnp.ndarray] = None,
) -> LossOutput:
    """Total = coarse_weight * L_c + fine_weight * L_f (loss.py:116-172).
    `loss_pose` is recorded but NOT added, matching the reference.
    `loss_c_override` supplies a precomputed coarse loss (the conf-free
    sparse path, ops/sparse_focal_loss.py) and skips the materialized one."""
    if loss_c_override is not None:
        loss_c = loss_c_override
    else:
        loss_c = compute_coarse_loss(conf, conf_gt, cfg)
    loss_f = compute_fine_loss(
        mkpts0_f, mkpts1_f, expec_f_gt_0, expec_f_gt_1, spv_mask, window
    )
    loss = cfg.coarse_weight * loss_c + cfg.fine_weight * loss_f
    if loss_pose is None:
        loss_pose = jnp.zeros((), loss.dtype)
    elif cfg.pose_in_total:
        # opt-in: the reference's commented-out `loss += loss_pose`
        # (loss.py:169) re-enabled — the pose head actually trains
        loss = loss + loss_pose
    return LossOutput(loss=loss, loss_c=loss_c, loss_f=loss_f, loss_pose=loss_pose)
