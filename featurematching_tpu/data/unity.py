"""Unity synthetic endoscopy dataset reader (host-CPU input pipeline).

Re-design of /root/reference/datasets/unity_data.py (UnityDataset). Layout:

    <root>/Frames/<frame>.png
    <root>/Poses/<file>.csv          # rows: [tx, ty, tz, qx, qy, qz, qw, ...]
                                     # (reference reads values[:, :-1], :91-92)
    <root>/keypoints/<frame>.npz     # offline SIFT cache
    <root>/matches/<f0>__<f1>.npz    # offline pseudo-GT cache (the reference
                                     # unions cached SIFT-smnn with DISK deep
                                     # matches at load time, :215-235; our
                                     # cache builder can union arbitrary
                                     # sources offline)

Unity specifics kept: fixed intrinsics (unity_data.py:164-166) and the
FOV-circle filter removing matches outside radius 170 px of the image center
(remove_none_kps, :182-194).
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np

from featurematching_tpu.data.endoslam import pose_from_row
from featurematching_tpu.data.pairs import (
    FramePair,
    compute_rel_pose,
    enumerate_pairs,
    pad_keypoint_pairs,
)
from featurematching_tpu.data.pseudo_gt import load_match_cache

UNITY_K = np.array(
    [[156.0418, 0, 178.5604], [0, 155.7529, 181.8043], [0, 0, 1]], np.float32
)
FOV_RADIUS = 170.0


def fov_circle_filter(
    kp0: np.ndarray, kp1: np.ndarray, h: int, w: int, radius: float = FOV_RADIUS
):
    """Keep matches whose BOTH endpoints lie inside the endoscope FOV circle
    (unity_data.py:182-194). NOTE the reference centers at (h//2, w//2) in
    (x, y) order — i.e. center x = h//2 — reproduced verbatim for parity."""
    center = np.array([h // 2, w // 2], np.float32)
    d0 = np.linalg.norm(kp0 - center, axis=1)
    d1 = np.linalg.norm(kp1 - center, axis=1)
    keep = (d0 <= radius) & (d1 <= radius)
    return kp0[keep], kp1[keep]


class UnityPairDataset:
    def __init__(
        self,
        root: str,
        data_enhance=(1,),
        img_size: Tuple[int, int] = (640, 480),
        read_img_gray: bool = False,
        lighting_subsample: bool = False,
        num_gt: int = 512,
        min_gt_matches: int = 0,
        apply_fov_filter: bool = True,
        seed: int = 0,
    ):
        import pandas as pd

        self.root = root
        self.img_size = img_size
        self.read_img_gray = read_img_gray
        self.num_gt = num_gt
        self.apply_fov_filter = apply_fov_filter

        frame_dir = os.path.join(root, "Frames")
        self.frames = sorted(
            os.path.splitext(f)[0] for f in os.listdir(frame_dir)
            if f.lower().endswith((".png", ".jpg", ".jpeg"))
        )
        pose_dir = os.path.join(root, "Poses")
        pose_path = os.path.join(pose_dir, sorted(os.listdir(pose_dir))[0])
        self.pose_rows = np.asarray(pd.read_csv(pose_path).values[:, :-1], np.float64)

        pairs = enumerate_pairs(len(self.frames), data_enhance, lighting_subsample, seed)
        self.pairs: List[FramePair] = []
        for p in pairs:
            mpath = self._match_path(p)
            if min_gt_matches and os.path.exists(mpath):
                kp0, _ = load_match_cache(mpath)
                if len(kp0) < min_gt_matches:
                    continue
            self.pairs.append(p)

        import cv2

        probe = cv2.imread(self._img_path(0), cv2.IMREAD_GRAYSCALE)
        h0, w0 = probe.shape[:2]
        self.native_hw = (h0, w0)
        K = UNITY_K.copy()
        K[0, :] *= img_size[0] / w0
        K[1, :] *= img_size[1] / h0
        self.K = K

    def _img_path(self, idx: int) -> str:
        base = os.path.join(self.root, "Frames", self.frames[idx])
        for ext in (".png", ".jpg", ".jpeg"):
            if os.path.exists(base + ext):
                return base + ext
        return base + ".png"

    def _match_path(self, pair: FramePair) -> str:
        return os.path.join(
            self.root, "matches",
            f"{self.frames[pair.idx0]}__{self.frames[pair.idx1]}.npz",
        )

    def __len__(self) -> int:
        return len(self.pairs)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        import cv2

        pair = self.pairs[idx]
        i0, i1 = pair.idx0, pair.idx1

        def load(i):
            if self.read_img_gray:
                img = cv2.imread(self._img_path(i), cv2.IMREAD_GRAYSCALE)
            else:
                img = cv2.imread(self._img_path(i), cv2.IMREAD_COLOR)
            img = cv2.resize(img, self.img_size).astype(np.float32) / 255.0
            return img[..., None] if img.ndim == 2 else img[..., ::-1]

        pose0 = pose_from_row(self.pose_rows[i0])
        pose1 = pose_from_row(self.pose_rows[i1])
        T_0to1 = compute_rel_pose(pose0, pose1)

        mpath = self._match_path(pair)
        if os.path.exists(mpath):
            kp0, kp1 = load_match_cache(mpath)
        else:
            kp0 = np.zeros((0, 2), np.float32)
            kp1 = np.zeros((0, 2), np.float32)
        if self.apply_fov_filter and len(kp0):
            h0, w0 = self.native_hw
            kp0, kp1 = fov_circle_filter(kp0, kp1, h0, w0)
        gt0, gt1, gmask = pad_keypoint_pairs(kp0, kp1, self.num_gt)

        return {
            "image0": load(i0),
            "image1": load(i1),
            "gt_kp0": gt0,
            "gt_kp1": gt1,
            "gt_mask": gmask,
            "T_0to1": T_0to1.astype(np.float32),
            "T_1to0": np.linalg.inv(T_0to1).astype(np.float32),
            "K0": self.K.astype(np.float32),
            "K1": self.K.astype(np.float32),
            "pair_id": np.int32(idx),
        }
