"""Frame-pair enumeration with temporal-gap augmentation.

Pure-python port of the reference's pair list construction
(/root/reference/datasets/scared_new2.py:51-152): for each temporal gap in
`data_enhance`, pair frame i with frame i+gap; optionally subsample each gap's
pairs to `len(frames) * log(len(frames)) * 0.08` ("lighting_data" mode).

Determinism: the reference used `random.sample` with global state; we take an
explicit seed so multi-host input pipelines can agree on the pair list.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence


@dataclass(frozen=True)
class FramePair:
    idx0: int
    idx1: int
    gap: int


def enumerate_pairs(
    num_frames: int,
    data_enhance: Sequence[int] = (1,),
    lighting_subsample: bool = False,
    seed: int = 0,
) -> List[FramePair]:
    """Pairs (i, i+gap) for each gap; optional per-gap random subsampling.

    Reference: matches_split_list (scared_new2.py:74-92) with
    scale = log(N) * 0.08 (load_all_keyframe, :142).
    """
    import random as _random

    rng = _random.Random(seed)
    scale = math.log(num_frames) * 0.08 if num_frames > 1 else 0.0
    out: List[FramePair] = []
    for gap in data_enhance:
        current = [
            FramePair(i, i + int(gap), int(gap))
            for i in range(num_frames - 1)
            if i + int(gap) < num_frames
        ]
        if lighting_subsample:
            quota = int(num_frames * scale)
            if quota < len(current):
                current = rng.sample(current, quota)
        out.extend(current)
    return out


def compute_rel_pose(pose0, pose1):
    """T_0to1 convention of the reference (scared_new2.py:178-179):
    inv(inv(pose1) @ pose0)."""
    import numpy as np

    return np.linalg.inv(np.matmul(np.linalg.inv(pose1), pose0))


def pad_keypoint_pairs(kp0, kp1, num_gt: int):
    """Pad/truncate [N, 2]+[N, 2] -> ([G, 2], [G, 2], [G] mask) fixed shapes."""
    import numpy as np

    n = min(len(kp0), num_gt)
    out0 = np.zeros((num_gt, 2), np.float32)
    out1 = np.zeros((num_gt, 2), np.float32)
    mask = np.zeros((num_gt,), bool)
    out0[:n] = kp0[:n]
    out1[:n] = kp1[:n]
    mask[:n] = True
    return out0, out1, mask
