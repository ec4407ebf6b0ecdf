"""Dense geometry conversions: disparity <-> img3d <-> pointcloud <-> depthmap
<-> flow, with calibration matrices (K/D/Q/P1/P2).

Same capability surface as /root/reference/datasets/scared_toolkits/scaredtk/
convertions.py:6-468, re-implemented as vectorized numpy. Conventions match
the reference: img3d is HxWx3 with NaN for unknown pixels; disparity is HxW
float32; pointclouds are Nx3.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


# --- primitive transforms ---------------------------------------------------

def create_RT(R: np.ndarray = None, T: np.ndarray = None) -> np.ndarray:
    """4x4 homogeneous transform from R (3x3) and T (3,)."""
    RT = np.eye(4)
    if R is not None:
        RT[:3, :3] = R
    if T is not None:
        RT[:3, 3] = np.asarray(T).reshape(3)
    return RT


def transform_pts(pts3d: np.ndarray, RT: np.ndarray) -> np.ndarray:
    """Apply a 4x4 transform to an Nx3 pointcloud."""
    return pts3d @ RT[:3, :3].T + RT[:3, 3]


def project_pts(pts3d: np.ndarray, P: np.ndarray) -> np.ndarray:
    """Project Nx3 points through a 3x4 projection matrix -> Nx2 pixels."""
    ph = pts3d @ P[:, :3].T + P[:, 3]
    return ph[:, :2] / (ph[:, 2:3])


def _project_with_distortion(pts3d: np.ndarray, K: np.ndarray, D: np.ndarray):
    import cv2

    if D is None or np.sum(np.abs(D)) == 0:
        P = np.hstack([K, np.zeros((3, 1))])
        return project_pts(pts3d, P)
    proj, _ = cv2.projectPoints(
        pts3d.astype(np.float64), np.zeros(3), np.zeros(3), K, D
    )
    return proj.reshape(-1, 2)


def _scatter_rounded(values: np.ndarray, proj: np.ndarray, size: Tuple[int, int],
                     fill):
    """Scatter per-point values into an image at rounded projections."""
    h, w = size
    out_shape = (h, w) + (() if values.ndim == 1 else (values.shape[1],))
    out = np.full(out_shape, fill, dtype=np.float64)
    pix = np.round(proj)
    ok = (pix[:, 0] >= 0) & (pix[:, 0] < w) & (pix[:, 1] >= 0) & (pix[:, 1] < h)
    xs = pix[ok, 0].astype(int)
    ys = pix[ok, 1].astype(int)
    out[ys, xs] = values[ok]
    return out


# --- disparity --------------------------------------------------------------

def disparity_to_img3d(disparity: np.ndarray, Q: np.ndarray) -> np.ndarray:
    """Unproject disparity via the rectification Q matrix -> HxWx3 (NaN where
    disparity < 0)."""
    import cv2

    disparity = np.nan_to_num(disparity.astype(np.float32))
    valid = disparity >= 0
    img3d = cv2.reprojectImageTo3D(disparity, Q)
    img3d[~valid] = np.nan
    return img3d


def disparity_to_ptcloud(disparity: np.ndarray, Q: np.ndarray) -> np.ndarray:
    return img3d_to_ptcloud(disparity_to_img3d(disparity, Q))


def disparity_to_depthmap(disparity: np.ndarray, Q: np.ndarray) -> np.ndarray:
    return img3d_to_depthmap(disparity_to_img3d(disparity, Q))


def depthmap_to_disparity(depthmap: np.ndarray, Q: np.ndarray) -> np.ndarray:
    """d = (f * baseline) / z using the Q-matrix entries: Q[2,3] = f,
    Q[3,2] = -1/baseline (OpenCV rectification convention)."""
    f = Q[2, 3]
    inv_b = -Q[3, 2]
    with np.errstate(divide="ignore", invalid="ignore"):
        disp = f / (depthmap * inv_b)
    return disp.astype(np.float32)


# --- img3d ------------------------------------------------------------------

def img3d_to_ptcloud(img3d: np.ndarray) -> np.ndarray:
    pts = img3d.reshape(-1, 3)
    return pts[~np.isnan(pts).any(axis=1)].copy()


def img3d_to_depthmap(img3d: np.ndarray) -> np.ndarray:
    return img3d[:, :, 2].copy()


def img3d_to_disparity(img3d: np.ndarray, P1: np.ndarray, P2: np.ndarray) -> np.ndarray:
    return ptcloud_to_disparity(img3d_to_ptcloud(img3d), P1, P2, img3d.shape[:2])


# --- pointcloud -------------------------------------------------------------

def ptcloud_to_disparity(
    ptcloud: np.ndarray, P1: np.ndarray, P2: np.ndarray, size: Tuple[int, int]
) -> np.ndarray:
    """Project to both rectified views; disparity = x_left - x_right, scattered
    at rounded left-view pixels."""
    pl_ = project_pts(ptcloud, P1)
    pr = project_pts(ptcloud, P2)
    disp = (pl_ - pr)[:, 0]
    return _scatter_rounded(disp, pl_, size, 0.0).astype(np.float32)


def ptcloud_to_img3d(
    ptcloud: np.ndarray, K: np.ndarray, D: np.ndarray, size: Tuple[int, int]
) -> np.ndarray:
    proj = _project_with_distortion(ptcloud, K, D)
    return _scatter_rounded(ptcloud, proj, size, 0.0)


def ptcloud_to_depthmap(
    ptcloud: np.ndarray, K: np.ndarray, D: np.ndarray, size: Tuple[int, int]
) -> np.ndarray:
    return img3d_to_depthmap(ptcloud_to_img3d(ptcloud, K, D, size))


def depthmap_to_img3d(
    depthmap: np.ndarray, K: np.ndarray
) -> np.ndarray:
    """Backproject a depthmap through K (no distortion) -> HxWx3."""
    h, w = depthmap.shape
    ys, xs = np.mgrid[0:h, 0:w]
    x = (xs - K[0, 2]) / K[0, 0] * depthmap
    y = (ys - K[1, 2]) / K[1, 1] * depthmap
    return np.stack([x, y, depthmap], axis=-1)


def depthmap_to_ptcloud(depthmap: np.ndarray, K: np.ndarray) -> np.ndarray:
    img3d = depthmap_to_img3d(depthmap, K)
    pts = img3d.reshape(-1, 3)
    return pts[pts[:, 2] > 0].copy()


# --- flow -------------------------------------------------------------------

def ptcloud_to_flow(
    ptcloud: np.ndarray,
    pose_1: np.ndarray,
    pose_2: np.ndarray,
    size: Tuple[int, int],
    K: np.ndarray,
    D: np.ndarray = None,
) -> np.ndarray:
    """Forward flow between two kinematic poses of the same cloud: project the
    cloud under both poses and scatter the displacement at the t=0 pixels
    (NaN where no flow is known)."""
    p1 = transform_pts(ptcloud, pose_1)
    p2 = transform_pts(ptcloud, pose_2)
    proj1 = _project_with_distortion(p1, K, D)
    proj2 = _project_with_distortion(p2, K, D)
    return _scatter_rounded(proj2 - proj1, proj1, size, np.nan)
