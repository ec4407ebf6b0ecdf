"""Evaluation metrics: epipolar precision, pose AUC, aggregation.

Re-design of /root/reference/utils/metrics.py. Device-side parts (epipolar
errors, RANSAC pose recovery) are batched fixed-shape JAX — the reference
bounced every batch item to OpenCV on the CPU (metrics.py:79-109,146-159).
Dataset-level aggregation (AUC / precision curves over all pairs) stays
host-side numpy like the reference (metrics.py:162-219): it is O(dataset)
scalar work, not accelerator work.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from featurematching_tpu.geometry.epipolar import (
    epipolar_errors_batch,
    normalize_keypoints,
)
from featurematching_tpu.geometry.ransac import estimate_essential_ransac
from featurematching_tpu.geometry.se3 import relative_pose_error


def compute_symmetrical_epipolar_errors(
    mkpts0: jnp.ndarray,
    mkpts1: jnp.ndarray,
    mask: jnp.ndarray,
    T_0to1: jnp.ndarray,
    K0: jnp.ndarray,
    K1: jnp.ndarray,
) -> jnp.ndarray:
    """[B, K] squared symmetric epipolar errors; padding rows get +inf so they
    never count as precise (reference: metrics.py:56-76)."""
    errs = epipolar_errors_batch(mkpts0[..., :2], mkpts1[..., :2], T_0to1, K0, K1)
    return jnp.where(mask, errs, jnp.inf)


def compute_pose_errors(
    mkpts0: jnp.ndarray,
    mkpts1: jnp.ndarray,
    mask: jnp.ndarray,
    T_0to1: jnp.ndarray,
    K0: jnp.ndarray,
    K1: jnp.ndarray,
    key: jax.Array,
    pixel_thr: float = 0.5,
    num_hypotheses: int = 512,
):
    """Batched RANSAC pose + (R_err, t_err) per pair. Fully on-device.

    Replaces metrics.py:124-159 (per-item cv2.findEssentialMat loop). The
    RANSAC threshold is normalized by the mean focal length, mirroring the
    commented normalized-threshold variant at metrics.py:91-94 (OpenCV applied
    0.5 px internally on normalized coords scaled by focal).
    Returns dict of [B] arrays: R_errs, t_errs (degrees/L2), num_inliers, valid.
    """
    B = mkpts0.shape[0]
    p0 = normalize_keypoints(mkpts0[..., :2], K0)
    p1 = normalize_keypoints(mkpts1[..., :2], K1)
    focal = 0.5 * (K0[:, 0, 0] + K0[:, 1, 1])  # [B]
    thr = pixel_thr / focal  # normalized units

    keys = jax.random.split(key, B)

    def solve(p0b, p1b, mb, kb, tb):
        return estimate_essential_ransac(
            p0b, p1b, mb, kb, thresh=tb, num_hypotheses=num_hypotheses
        )

    res = jax.vmap(solve)(p0, p1, mask, keys, thr)
    R_err, t_err = relative_pose_error(T_0to1, res.R, res.t)
    R_err = jnp.where(res.valid, R_err, jnp.inf)
    t_err = jnp.where(res.valid, t_err, jnp.inf)
    return {
        "R_errs": R_err,
        "t_errs": t_err,
        "num_inliers": res.num_inliers,
        "pose_valid": res.valid,
    }


def compute_pose_errors_from_head(
    T_0to1: jnp.ndarray, T_0to1_pred: jnp.ndarray
) -> dict:
    """Pose errors from a learned pose head's prediction instead of RANSAC
    (reference compute_pose_errors_new, metrics.py:112-121). Batched [B,4,4]."""
    R_err, t_err = relative_pose_error(
        T_0to1, T_0to1_pred[..., :3, :3], T_0to1_pred[..., :3, 3]
    )
    return {"R_errs": R_err, "t_errs": t_err}


# ---------------------------------------------------------------------------
# host-side aggregation (numpy) — ports of metrics.py:162-219
# ---------------------------------------------------------------------------

def error_auc(errors: Sequence[float], thresholds=(5, 10, 20)) -> Dict[str, float]:
    """AUC of the recall-vs-error curve at each threshold (metrics.py:162-182)."""
    errors = [0.0] + sorted(float(e) for e in errors)
    recall = list(np.linspace(0, 1, len(errors)))
    aucs = {}
    for thr in thresholds:
        last_index = int(np.searchsorted(errors, thr))
        y = recall[:last_index] + [recall[last_index - 1]]
        x = errors[:last_index] + [thr]
        aucs[f"auc@{thr}"] = float(np.trapezoid(y, x) / thr)
    return aucs


def epidist_prec(
    errors_per_pair: Sequence[np.ndarray], thresholds=(5e-4,)
) -> Dict[str, float]:
    """Mean matching precision at epipolar thresholds (metrics.py:185-196)."""
    out = {}
    for thr in thresholds:
        precs = []
        for errs in errors_per_pair:
            errs = np.asarray(errs)
            errs = errs[np.isfinite(errs)]
            precs.append(float(np.mean(errs < thr)) if errs.size else 0.0)
        out[f"prec@{thr:.0e}"] = float(np.mean(precs)) if precs else 0.0
    return out


def aggregate_metrics(
    metrics: Dict[str, List], epi_err_thr: float = 5e-4
) -> Dict[str, float]:
    """Dataset-level aggregation with identifier dedup (metrics.py:199-219).

    metrics keys: 'identifiers' (list of str), 'R_errs', 't_errs' (per pair),
    'epi_errs' (list of per-pair arrays).
    """
    unq_ids = OrderedDict(
        (iden, idx) for idx, iden in enumerate(metrics["identifiers"])
    )
    keep = list(unq_ids.values())

    pose_errors = np.maximum(
        np.asarray(metrics["R_errs"], dtype=np.float64),
        np.asarray(metrics["t_errs"], dtype=np.float64),
    )[keep]
    aucs = error_auc(pose_errors)
    precs = epidist_prec([metrics["epi_errs"][i] for i in keep], (epi_err_thr,))
    return {**aucs, **precs}
