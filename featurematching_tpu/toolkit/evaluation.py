"""Depth/disparity benchmark metrics with coverage gating.

Port of /root/reference/datasets/scared_toolkits/scaredtk/evaluation.py:4-92
and the MAE/bad3 benchmark of scripts/evaluate.py:78-106.
"""

from __future__ import annotations

import numpy as np


def depthmap_coverage(depthmap: np.ndarray) -> float:
    """Fraction of pixels with known (finite) values (evaluation.py:4-20)."""
    return float(np.isfinite(depthmap).sum() / depthmap.size)


def depthmap_error(ref: np.ndarray, comp: np.ndarray, min_coverage: float = 0.1):
    """Mean absolute depth error over mutually-valid pixels; None when the
    reference coverage is below `min_coverage` (evaluation.py:23-56)."""
    if depthmap_coverage(ref) < min_coverage:
        return None
    valid = np.isfinite(ref) & np.isfinite(comp)
    if not valid.any():
        return None
    return float(np.abs(ref[valid] - comp[valid]).mean())


def xyz_error(ref: np.ndarray, comp: np.ndarray, min_coverage: float = 0.1):
    """Mean euclidean 3D error over mutually-valid pixels of two img3d maps
    (evaluation.py:59-92)."""
    ref_depth = ref[..., 2]
    if depthmap_coverage(ref_depth) < min_coverage:
        return None
    valid = np.isfinite(ref).all(-1) & np.isfinite(comp).all(-1)
    if not valid.any():
        return None
    return float(np.linalg.norm(ref[valid] - comp[valid], axis=-1).mean())


def disparity_error(ref: np.ndarray, comp: np.ndarray, bad_thr: float = 3.0):
    """(MAE, bad-pixel %) over mutually-valid pixels — the scripts/evaluate.py
    metric pair (MAE + bad3)."""
    valid = np.isfinite(ref) & np.isfinite(comp) & (ref > 0)
    if not valid.any():
        return None, None
    err = np.abs(ref[valid] - comp[valid])
    return float(err.mean()), float((err > bad_thr).mean() * 100.0)
