"""Offline pseudo-ground-truth pipeline: SIFT caches + inlier match caches.

The reference computes pseudo-GT INSIDE `Dataset.__getitem__` — kornia SIFT
caches are read, mutual-NN matched, then GPU RANSAC-filtered per item
(/root/reference/datasets/scared_new2.py:194-216), which puts accelerator work
into dataloader workers (SURVEY.md §3.1 flags this as a design wart). Here the
whole pipeline is offline host-CPU tooling (L0 layer):

  1. `extract_sift_cache(frame_dir)` — per-frame SIFT keypoints+descriptors ->
     `keypoints/<frame>.npz` (port of datasets/create_matches.py:235-259,
     using OpenCV SIFT instead of kornia ScaleSpaceDetector).
  2. `build_match_cache(...)` — per-pair mutual-NN + homography-RANSAC inliers
     -> `matches/<i>_<j>.npz` (port of scared_new2.py:201-211). The training
     input pipeline then only ever does npz reads + padding.

The matcher/RANSAC math here intentionally runs on host CPU with OpenCV —
this is offline tooling, not the TPU compute path; a pure-JAX RANSAC is
available in geometry.ransac when cache-building on accelerator is wanted.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np


def detect_sift(
    image_gray: np.ndarray, max_keypoints: int = 2048
) -> Tuple[np.ndarray, np.ndarray]:
    """SIFT keypoints [N, 2] + descriptors [N, 128] (root-SIFT normalized)."""
    import cv2

    sift = cv2.SIFT_create(nfeatures=max_keypoints)
    kps, desc = sift.detectAndCompute(image_gray, None)
    if desc is None or len(kps) == 0:
        return np.zeros((0, 2), np.float32), np.zeros((0, 128), np.float32)
    pts = np.array([k.pt for k in kps], np.float32)
    desc = desc.astype(np.float32)
    # root-SIFT: L1 normalize + sqrt — more stable mutual-NN
    desc = desc / (np.abs(desc).sum(axis=1, keepdims=True) + 1e-7)
    desc = np.sqrt(desc)
    return pts, desc


def match_mnn(desc0: np.ndarray, desc1: np.ndarray) -> np.ndarray:
    """Mutual nearest-neighbour match indices [M, 2] (kornia match_mnn
    equivalent, scared_new2.py:201)."""
    if len(desc0) == 0 or len(desc1) == 0:
        return np.zeros((0, 2), np.int64)
    # distance matrix via the |a-b|^2 = |a|^2 + |b|^2 - 2ab expansion
    d2 = (
        (desc0**2).sum(1)[:, None]
        + (desc1**2).sum(1)[None, :]
        - 2.0 * desc0 @ desc1.T
    )
    nn01 = d2.argmin(axis=1)
    nn10 = d2.argmin(axis=0)
    idx0 = np.arange(len(desc0))
    mutual = nn10[nn01] == idx0
    return np.stack([idx0[mutual], nn01[mutual]], axis=1)


def ransac_homography_inliers(
    pts0: np.ndarray, pts1: np.ndarray, thresh: float = 5.0
) -> np.ndarray:
    """Boolean inlier mask via homography RANSAC (the reference's pseudo-GT
    filter, scared_new2.py:205-208 / the cv2 variant it keeps commented)."""
    import cv2

    if len(pts0) < 4:
        return np.zeros((len(pts0),), bool)
    _, mask = cv2.findHomography(pts0, pts1, cv2.RANSAC, thresh)
    if mask is None:
        return np.zeros((len(pts0),), bool)
    return mask.ravel().astype(bool)


def extract_sift_cache(
    image_paths: List[str],
    out_dir: str,
    max_keypoints: int = 2048,
    resize: Optional[Tuple[int, int]] = None,
) -> None:
    """Write per-frame `keypoints/<stem>.npz` (kp [N,2], desc [N,128]).

    Port of create_kps (create_matches.py:338-371).
    """
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    for path in image_paths:
        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise FileNotFoundError(path)
        if resize is not None:
            img = cv2.resize(img, resize)
        kp, desc = detect_sift(img, max_keypoints)
        stem = os.path.splitext(os.path.basename(path))[0]
        np.savez(os.path.join(out_dir, stem + ".npz"), kp=kp, desc=desc)


def load_sift_cache(path: str) -> Tuple[np.ndarray, np.ndarray]:
    d = np.load(path)
    return d["kp"].astype(np.float32), d["desc"].astype(np.float32)


def gate_extra_matches(
    sift0: np.ndarray,
    sift1: np.ndarray,
    e0: np.ndarray,
    e1: np.ndarray,
    ransac_thresh: float = 5.0,
    gate_thresh: float = 1.5,
) -> np.ndarray:
    """Boolean keep-mask over extra (teacher) matches: consistency with the
    SIFT-derived homography at a TIGHT threshold.

    The final union RANSAC (ransac_thresh, default 5 px) is loose enough
    that coarse-ish teacher matches slip through and dilute label precision
    (round-4 finding: union precision 1.0 -> 0.936). The SIFT-MNN matches
    are near-perfect post-RANSAC, so the model THEY imply is a trustworthy
    gate: fit H on the SIFT inliers only, keep a teacher match only when its
    symmetric transfer error is under `gate_thresh` px."""
    import cv2

    if len(e0) == 0:
        return np.zeros((0,), bool)
    if len(sift0) < 8:
        # not enough trusted matches to fit a gate model: drop the extras
        # rather than risk diluting the cache
        return np.zeros((len(e0),), bool)
    H, mask = cv2.findHomography(sift0, sift1, cv2.RANSAC, ransac_thresh)
    if H is None:
        return np.zeros((len(e0),), bool)
    def transfer_err(pts_src, pts_dst, M):
        ph = np.concatenate(
            [pts_src, np.ones((len(pts_src), 1), np.float32)], axis=1
        )
        proj = ph @ M.T
        w = proj[:, 2:]
        w = np.where(np.abs(w) < 1e-9, 1e-9, w)
        return np.linalg.norm(proj[:, :2] / w - pts_dst, axis=1)

    err_f = transfer_err(e0, e1, H)
    err_b = transfer_err(e1, e0, np.linalg.inv(H))
    return np.maximum(err_f, err_b) < gate_thresh


def pseudo_gt_for_pair(
    kp0: np.ndarray,
    desc0: np.ndarray,
    kp1: np.ndarray,
    desc1: np.ndarray,
    ransac_thresh: float = 5.0,
    extra: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    extra_gate: Optional[float] = 1.5,
) -> Tuple[np.ndarray, np.ndarray]:
    """MNN (+ optional deep matches) + homography RANSAC -> inlier pairs.

    `extra` is a second match source unioned with the SIFT-MNN matches
    BEFORE the RANSAC filter — the reference's mixed-keypoint recipe for
    Unity pseudo-GT (unity_data.py:215-235: SIFT-smnn ∪ DISK deep matches,
    one homography RANSAC over the union). Unlike the reference, extra
    matches pass a tight SIFT-model consistency gate first (`extra_gate` px,
    None disables) — see gate_extra_matches."""
    m = match_mnn(desc0, desc1)
    p0 = kp0[m[:, 0]] if len(m) else np.zeros((0, 2), np.float32)
    p1 = kp1[m[:, 1]] if len(m) else np.zeros((0, 2), np.float32)
    if extra is not None and len(extra[0]):
        e0 = np.asarray(extra[0], np.float32)
        e1 = np.asarray(extra[1], np.float32)
        if extra_gate is not None:
            keep = gate_extra_matches(
                p0, p1, e0, e1, ransac_thresh, extra_gate
            )
            e0, e1 = e0[keep], e1[keep]
        p0 = np.concatenate([p0, e0], axis=0)
        p1 = np.concatenate([p1, e1], axis=0)
    if len(p0) == 0:
        z = np.zeros((0, 2), np.float32)
        return z, z
    inl = ransac_homography_inliers(p0, p1, ransac_thresh)
    return p0[inl], p1[inl]


def build_match_cache(
    sift_dir: str,
    pairs: List[Tuple[str, str]],
    out_dir: str,
    ransac_thresh: float = 5.0,
    deep_fn=None,
    image_paths: Optional[Dict[str, str]] = None,
    extra_gate: Optional[float] = 1.5,
) -> Dict[str, int]:
    """For each (stem0, stem1) pair, write `matches/<stem0>__<stem1>.npz`
    with the inlier pseudo-GT keypoints. Returns per-pair inlier counts.

    deep_fn(path0, path1) -> (kp0, kp1): optional second match source (a
    frozen teacher, see data/teacher.py) unioned with SIFT before RANSAC;
    requires `image_paths` mapping stem -> image file."""
    os.makedirs(out_dir, exist_ok=True)
    counts = {}
    cache: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}

    def get(stem):
        if stem not in cache:
            cache[stem] = load_sift_cache(os.path.join(sift_dir, stem + ".npz"))
        return cache[stem]

    for stem0, stem1 in pairs:
        kp0, d0 = get(stem0)
        kp1, d1 = get(stem1)
        extra = None
        if deep_fn is not None:
            if image_paths is None:
                raise ValueError("deep_fn requires image_paths")
            extra = deep_fn(image_paths[stem0], image_paths[stem1])
        p0, p1 = pseudo_gt_for_pair(
            kp0, d0, kp1, d1, ransac_thresh, extra, extra_gate=extra_gate
        )
        name = f"{stem0}__{stem1}.npz"
        np.savez(os.path.join(out_dir, name), kp0=p0, kp1=p1)
        counts[name] = len(p0)
    return counts


def load_match_cache(path: str) -> Tuple[np.ndarray, np.ndarray]:
    d = np.load(path)
    return d["kp0"].astype(np.float32), d["kp1"].astype(np.float32)
