"""SCARED keyframe-sequence dataset reader (host-CPU input pipeline).

Re-design of /root/reference/datasets/scared_new2.py (ScaredDataset). Directory
layout per keyframe root (reference :128-140):

    <keyframe_root>/
        raw_images/Left/<frame>.png
        frame_data/<frame>.json      # camera-pose + camera-calibration (KL/DL/KR/DR)
        keypoints/<frame>.npz        # offline SIFT cache (ours; reference: .npy)
        matches/<f0>__<f1>.npz       # offline pseudo-GT cache (ours; the
                                     # reference ran MNN+RANSAC per __getitem__)
        sence_images/Left/<frame>.npy  # optional 3D scene-point images

Differences by design:
  * pseudo-GT comes from the offline cache (data/pseudo_gt.py) — the input
    pipeline never touches an accelerator (reference ran kornia GPU RANSAC in
    dataloader workers, scared_new2.py:201-216);
  * low-inlier pairs are FILTERED AT ENUMERATION (min_gt_matches) instead of
    the reference's recursive random resample in __getitem__ (:213-216) —
    deterministic and jit-friendly;
  * samples are fixed-shape padded numpy dicts matching train.step's batch
    pytree.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from featurematching_tpu.data.pairs import (
    FramePair,
    compute_rel_pose,
    enumerate_pairs,
    pad_keypoint_pairs,
)
from featurematching_tpu.data.pseudo_gt import load_match_cache

# SCARED raw calibration resolution (reference convertK, scared_new2.py:181-186)
RAW_W, RAW_H = 1280.0, 1024.0


def load_frame_json(path: str, flag: str = "Left"):
    """K, D, camera_pose from a frame_data json (scared_new2.py:114-125)."""
    with open(path) as f:
        d = json.load(f)
    pose = np.asarray(d["camera-pose"], np.float64)
    calib = d["camera-calibration"]
    if flag == "Left":
        K = np.asarray(calib["KL"], np.float64)
        D = np.asarray(calib["DL"], np.float64)
    else:
        K = np.asarray(calib["KR"], np.float64)
        D = np.asarray(calib["DR"], np.float64)
    return K, D, pose


def convert_K(K: np.ndarray, img_size: Tuple[int, int] = (640, 480)) -> np.ndarray:
    """Rescale intrinsics from the 1280x1024 calibration resolution to the
    working resolution (scared_new2.py:181-186)."""
    K = K.copy()
    K[0, :] *= img_size[0] / RAW_W
    K[1, :] *= img_size[1] / RAW_H
    return K


def _first_occurrence_np(keys: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """First occurrence of each key among valid rows, numpy mirror of
    matching.supervision._first_occurrence_mask (stable sort order)."""
    big = np.iinfo(np.int32).max
    k = np.where(valid, keys.astype(np.int64), big)
    order = np.argsort(k, kind="stable")
    sorted_k = k[order]
    first_sorted = np.ones_like(sorted_k, dtype=bool)
    first_sorted[1:] = sorted_k[1:] != sorted_k[:-1]
    first = np.empty_like(first_sorted)
    first[order] = first_sorted
    return first & valid


def host_fine_mtx(
    gt_kp0: np.ndarray,
    gt_kp1: np.ndarray,
    gt_mask: np.ndarray,
    grid: Tuple[int, int],
    coarse_scale: int = 8,
):
    """Host-side precomputed supervision scatter matrices — the legacy
    dataset variant where `__getitem__` ships `fine_mtx_{0,1}` with the
    sample instead of the in-graph supervision building them
    (/root/reference/datasets/scared_new.py:252-268). Output is exactly
    `matching.supervision.compute_supervision_coarse`'s fine_mtx / spv ids
    for the same keypoints (asserted by tests/test_data.py).

    gt_kp0/gt_kp1: [G, 2] full-res pixel coords; gt_mask: [G] bool.
    grid: (h_c, w_c). Returns (fine_mtx_0 [L,2], fine_mtx_1 [L,2],
    spv_i_ids [G], spv_j_ids [G], keep [G]).
    """
    h, w = grid
    L = h * w
    cell0 = (gt_kp0 // coarse_scale).astype(np.int64)
    cell1 = (gt_kp1 // coarse_scale).astype(np.int64)
    i_ids = cell0[:, 0] + cell0[:, 1] * w
    j_ids = cell1[:, 0] + cell1[:, 1] * w
    in_grid = (
        (i_ids >= 0) & (i_ids < L) & (j_ids >= 0) & (j_ids < L) & gt_mask
    )
    keep_j = _first_occurrence_np(j_ids, in_grid)
    keep_i = _first_occurrence_np(i_ids, in_grid & keep_j)
    keep = keep_i & keep_j & in_grid

    i_safe = np.where(keep, i_ids, 0).astype(np.int32)
    j_safe = np.where(keep, j_ids, 0).astype(np.int32)
    fine_mtx_0 = np.zeros((L, 2), np.float32)
    fine_mtx_1 = np.zeros((L, 2), np.float32)
    fine_mtx_0[i_safe[keep]] = gt_kp0[keep].astype(np.float32)
    fine_mtx_1[j_safe[keep]] = gt_kp1[keep].astype(np.float32)
    return fine_mtx_0, fine_mtx_1, i_safe, j_safe, keep


class ScaredPairDataset:
    """Enumerates frame pairs of one keyframe root; returns fixed-shape dicts."""

    def __init__(
        self,
        keyframe_root: str,
        data_enhance=(1,),
        img_size: Tuple[int, int] = (640, 480),  # (W, H)
        read_img_gray: bool = False,
        lighting_subsample: bool = False,
        num_gt: int = 512,
        min_gt_matches: int = 250,
        flag: str = "Left",
        with_scene: bool = False,
        precompute_fine_mtx: bool = False,
        seed: int = 0,
    ):
        self.root = keyframe_root
        self.img_size = img_size
        self.read_img_gray = read_img_gray
        self.num_gt = num_gt
        self.with_scene = with_scene
        self.precompute_fine_mtx = precompute_fine_mtx
        self.flag = flag

        img_dir = os.path.join(keyframe_root, "raw_images", flag)
        self.frames = sorted(
            os.path.splitext(f)[0] for f in os.listdir(img_dir)
            if f.lower().endswith((".png", ".jpg", ".jpeg"))
        )
        pairs = enumerate_pairs(
            len(self.frames), data_enhance, lighting_subsample, seed
        )
        # deterministic low-inlier filtering (replaces the reference's
        # recursive random resampling on <250 inliers)
        self.pairs: List[FramePair] = []
        for p in pairs:
            mpath = self._match_path(p)
            if os.path.exists(mpath):
                kp0, _ = load_match_cache(mpath)
                if len(kp0) < min_gt_matches:
                    continue
            self.pairs.append(p)

    # -- paths -------------------------------------------------------------
    def _img_path(self, idx: int) -> str:
        base = os.path.join(self.root, "raw_images", self.flag, self.frames[idx])
        for ext in (".png", ".jpg", ".jpeg"):
            if os.path.exists(base + ext):
                return base + ext
        return base + ".png"

    def _frame_json(self, idx: int) -> str:
        return os.path.join(self.root, "frame_data", self.frames[idx] + ".json")

    def _match_path(self, pair: FramePair) -> str:
        return os.path.join(
            self.root, "matches",
            f"{self.frames[pair.idx0]}__{self.frames[pair.idx1]}.npz",
        )

    def _scene_path(self, idx: int) -> str:
        return os.path.join(
            self.root, "sence_images", self.flag, self.frames[idx] + ".npy"
        )

    # -- loading -----------------------------------------------------------
    def _load_image(self, idx: int) -> np.ndarray:
        import cv2

        if self.read_img_gray:
            img = cv2.imread(self._img_path(idx), cv2.IMREAD_GRAYSCALE)
        else:
            img = cv2.imread(self._img_path(idx), cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(self._img_path(idx))
        img = cv2.resize(img, self.img_size)
        img = img.astype(np.float32) / 255.0
        if img.ndim == 2:
            img = img[..., None]
        else:
            img = img[..., ::-1]  # BGR -> RGB, NHWC
        return img

    def __len__(self) -> int:
        return len(self.pairs)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        pair = self.pairs[idx]
        i0, i1 = pair.idx0, pair.idx1

        img0 = self._load_image(i0)
        img1 = self._load_image(i1)

        K0, D0, T0 = load_frame_json(self._frame_json(i0), self.flag)
        K1, D1, T1 = load_frame_json(self._frame_json(i1), self.flag)
        K0 = convert_K(K0, self.img_size)
        K1 = convert_K(K1, self.img_size)

        T_0to1 = compute_rel_pose(T0, T1)
        T_1to0 = np.linalg.inv(T_0to1)

        mpath = self._match_path(pair)
        if os.path.exists(mpath):
            kp0, kp1 = load_match_cache(mpath)
        else:
            kp0 = np.zeros((0, 2), np.float32)
            kp1 = np.zeros((0, 2), np.float32)
        gt0, gt1, gmask = pad_keypoint_pairs(kp0, kp1, self.num_gt)

        sample = {
            "image0": img0,
            "image1": img1,
            "gt_kp0": gt0,
            "gt_kp1": gt1,
            "gt_mask": gmask,
            "T_0to1": T_0to1.astype(np.float32),
            "T_1to0": T_1to0.astype(np.float32),
            "K0": K0.astype(np.float32),
            "K1": K1.astype(np.float32),
            "pair_id": np.int32(idx),
        }
        if self.with_scene:
            sample["scene_image0"] = np.load(self._scene_path(i0)).astype(np.float32)
            sample["scene_image1"] = np.load(self._scene_path(i1)).astype(np.float32)
        if self.precompute_fine_mtx:
            W, H = self.img_size
            fm0, fm1, si, sj, keep = host_fine_mtx(
                gt0, gt1, gmask, (H // 8, W // 8)
            )
            sample.update(
                fine_mtx_0=fm0, fine_mtx_1=fm1,
                spv_i_ids=si, spv_j_ids=sj, spv_mask=keep,
            )
        return sample

    @property
    def pair_names(self) -> List[Tuple[str, str]]:
        return [
            (self.frames[p.idx0], self.frames[p.idx1]) for p in self.pairs
        ]


def discover_keyframe_roots(data_root: str) -> List[str]:
    """Find all `dataset_*/keyframe_*` roots under a SCARED data root
    (the reference's MultiSceneDataModule discovery, lightning_new.py:123-149)."""
    roots = []
    for ds in sorted(os.listdir(data_root)):
        dpath = os.path.join(data_root, ds)
        if not os.path.isdir(dpath):
            continue
        for kf in sorted(os.listdir(dpath)):
            kpath = os.path.join(dpath, kf)
            if os.path.isdir(os.path.join(kpath, "raw_images")):
                roots.append(kpath)
    return roots
