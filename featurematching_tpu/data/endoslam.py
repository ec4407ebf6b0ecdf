"""EndoSLAM dataset reader (host-CPU input pipeline).

Re-design of /root/reference/datasets/endoslam.py (EndoDataset). Layout per
sequence root:

    <root>/Frames/<frame>.png        # RGB or gray endoscopic frames
    <root>/Poses/<file>.xlsx         # rows: [.., .., .., tx, ty, tz, qx, qy, qz, qw]
                                     # (reference reads columns 3: as trans+quat,
                                     #  endoslam.py:88-89, 211-234)
    <root>/keypoints/<frame>.npz     # offline SIFT cache (ours)
    <root>/matches/<f0>__<f1>.npz    # offline pseudo-GT cache (ours; the
                                     # reference ran cv2.findHomography per item)

Fixed EndoSLAM intrinsics/distortion (endoslam.py:148-152) are module
constants. Pose parsing uses scipy-quaternion (x, y, z, w) order exactly as
the reference's R.from_quat.
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np

from featurematching_tpu.data.pairs import (
    FramePair,
    compute_rel_pose,
    enumerate_pairs,
    pad_keypoint_pairs,
)
from featurematching_tpu.data.pseudo_gt import load_match_cache
from featurematching_tpu.geometry.se3 import quat_to_matrix

ENDOSLAM_K = np.array(
    [[957.411, 0, 282.192], [0, 959.386, 170.731], [0, 0, 1]], np.float32
)
ENDOSLAM_DIST = np.array([0.2533, -0.2085, 0, 0], np.float32)


def pose_from_row(row: np.ndarray) -> np.ndarray:
    """[tx, ty, tz, qx, qy, qz, qw] -> 4x4 pose (endoslam.py:211-229)."""
    import jax.numpy as jnp

    t = np.asarray(row[:3], np.float64)
    q = np.asarray(row[3:7], np.float64)
    Rm = np.asarray(quat_to_matrix(jnp.asarray(q, jnp.float32)), np.float64)
    T = np.eye(4)
    T[:3, :3] = Rm
    T[:3, 3] = t
    return T


def load_pose_table(poses_dir: str) -> np.ndarray:
    """Read the single xlsx/csv in Poses/; returns [N, >=7] (cols 3: of the
    sheet, matching endoslam.py:88-89)."""
    import pandas as pd

    files = sorted(os.listdir(poses_dir))
    if not files:
        raise FileNotFoundError(f"no pose file in {poses_dir}")
    path = os.path.join(poses_dir, files[0])
    if path.endswith((".xlsx", ".xls")):
        table = pd.read_excel(path).values
    else:
        table = pd.read_csv(path).values
    return np.asarray(table[:, 3:], np.float64)


class EndoSlamPairDataset:
    def __init__(
        self,
        root: str,
        data_enhance=(1,),
        img_size: Tuple[int, int] = (640, 480),
        read_img_gray: bool = False,
        lighting_subsample: bool = False,
        num_gt: int = 512,
        min_gt_matches: int = 0,
        seed: int = 0,
    ):
        self.root = root
        self.img_size = img_size
        self.read_img_gray = read_img_gray
        self.num_gt = num_gt

        frame_dir = os.path.join(root, "Frames")
        self.frames = sorted(
            os.path.splitext(f)[0] for f in os.listdir(frame_dir)
            if f.lower().endswith((".png", ".jpg", ".jpeg"))
        )
        self.pose_rows = load_pose_table(os.path.join(root, "Poses"))

        pairs = enumerate_pairs(len(self.frames), data_enhance, lighting_subsample, seed)
        self.pairs: List[FramePair] = []
        for p in pairs:
            mpath = self._match_path(p)
            if min_gt_matches and os.path.exists(mpath):
                kp0, _ = load_match_cache(mpath)
                if len(kp0) < min_gt_matches:
                    continue
            self.pairs.append(p)

        # intrinsics rescale from the native frame size to img_size
        import cv2

        probe = cv2.imread(self._img_path(0), cv2.IMREAD_GRAYSCALE)
        h0, w0 = probe.shape[:2]
        K = ENDOSLAM_K.copy()
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
