"""Windowed-BA sequential odometry: keyframe map + track linking + scale
propagation + sliding-window bundle adjustment.

Closes the round-1 gap "SfM sequence runner is two-view chaining only":
`pipeline.run_sequence` chains unit-norm essential-matrix translations, so
any variation in true step length becomes trajectory error that no global
alignment can remove. This module:

  1. links matches across consecutive pairs into TRACKS (a keypoint seen in
     pair (i-1, i) and pair (i, i+1) is the same map point — linked by pixel
     proximity in the shared frame i);
  2. resolves each new pair's monocular scale against the map: the shared
     frame's depths from the previous reconstruction vs the new one give
     s = median(d_prev / d_new), which rescales the new unit translation into
     the global scale (classic monocular scale propagation);
  3. runs a fixed-capacity sliding-window `ba.bundle_adjust` over the last W
     keyframes (first two fixed — the monocular gauge: similarity transform =
     6 dof pose + 1 dof scale), writing refined poses/points back to the map.

All capacities are static (one jit compile for every window solve). This is
new capability relative to the reference, which stops at two-view pose
errors (SURVEY.md §7 scope note).
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from featurematching_tpu.geometry.epipolar import normalize_keypoints
from featurematching_tpu.sfm.ba import BAProblem, bundle_adjust
from featurematching_tpu.sfm.pipeline import Trajectory, two_view_reconstruction


class Track:
    """One map point: world position + (frame, normalized-uv) observations."""

    __slots__ = ("X_w", "obs")

    def __init__(self, X_w: np.ndarray):
        self.X_w = X_w
        self.obs: List[Tuple[int, np.ndarray]] = []


def _quantize(px: np.ndarray, cell: float) -> Tuple[int, int]:
    return (int(px[0] / cell), int(px[1] / cell))


def _world_from_cam(T_wc: np.ndarray, X_c: np.ndarray) -> np.ndarray:
    """world->cam pose T, camera-frame points -> world points."""
    R, t = T_wc[:3, :3], T_wc[:3, 3]
    return (X_c - t[None]) @ R


class OdometryResult(NamedTuple):
    """Windowed-odometry output plus the map state loop closure needs:
    `frame_tables[i]` maps quantized frame-i pixels -> track id, letting a
    later loop pair resolve its monocular scale against the map."""

    trajectory: Trajectory
    tracks: List[Track]
    frame_tables: List[Dict[Tuple[int, int], int]]
    link_px: float


def run_sequence_windowed(
    matcher_fn,
    frames: List[np.ndarray],
    K: np.ndarray,
    key: Optional[jax.Array] = None,
    window: int = 5,
    pixel_thr: float = 1.0,
    num_hypotheses: int = 256,
    link_px: float = 1.5,
    ba_iters: int = 8,
    max_window_points: int = 1024,
    seed: int = 0,
) -> Trajectory:
    """Sequential odometry with map reuse + windowed BA (trajectory only)."""
    return run_sequence_windowed_full(
        matcher_fn, frames, K, key, window, pixel_thr, num_hypotheses,
        link_px, ba_iters, max_window_points, seed,
    ).trajectory


def run_sequence_windowed_full(
    matcher_fn,
    frames: List[np.ndarray],
    K: np.ndarray,
    key: Optional[jax.Array] = None,
    window: int = 5,
    pixel_thr: float = 1.0,
    num_hypotheses: int = 256,
    link_px: float = 1.5,
    ba_iters: int = 8,
    max_window_points: int = 1024,
    seed: int = 0,
) -> OdometryResult:
    """Sequential odometry with map reuse + windowed BA.

    matcher_fn(img0, img1) -> (mkpts0 [M,2or3], mkpts1, mask) fixed-shape,
    pixel coords. Returns world->cam trajectory in the global (first-pair)
    scale, plus the track map and per-frame pixel->track tables
    (sfm/loop_closure.py resolves loop-edge scale against these).
    """
    if key is None:
        key = jax.random.PRNGKey(seed)
    Kj = jnp.asarray(K, jnp.float32)
    Knp = np.asarray(K, np.float64)

    poses: List[np.ndarray] = [np.eye(4, dtype=np.float64)]
    valid = [True]
    tracks: List[Track] = []
    # frame-i pixel-cell -> track id, for linking the NEXT pair's mkpts0
    link_table: Dict[Tuple[int, int], int] = {}
    # persistent per-frame tables (both match sides), for loop closure
    frame_tables: List[Dict[Tuple[int, int], int]] = [
        {} for _ in range(len(frames))
    ]

    for i in range(len(frames) - 1):
        mk0, mk1, mask = matcher_fn(frames[i], frames[i + 1])
        mk0 = np.asarray(mk0, np.float64)[:, :2]
        mk1 = np.asarray(mk1, np.float64)[:, :2]
        mask_np = np.asarray(mask, bool)

        key, sub = jax.random.split(key)
        T_rel_j, X_j, good_j, n_inl = two_view_reconstruction(
            jnp.asarray(mk0, jnp.float32), jnp.asarray(mk1, jnp.float32),
            jnp.asarray(mask_np), Kj, Kj, sub,
            pixel_thr=pixel_thr, num_hypotheses=num_hypotheses, ba_iters=3,
        )
        T_rel = np.asarray(T_rel_j, np.float64)
        X = np.asarray(X_j, np.float64)  # frame-i camera coords, |t|=1 scale
        good = np.asarray(good_j, bool) & mask_np
        ok = int(np.asarray(n_inl)) >= 8

        if not ok:
            poses.append(poses[-1].copy())
            valid.append(False)
            link_table = {}
            continue

        # ---- scale propagation: depths of linked tracks in frame i
        linked: List[Tuple[int, int]] = []  # (match_row, track_id)
        for j in np.nonzero(good)[0]:
            tid = link_table.get(_quantize(mk0[j], link_px))
            if tid is not None:
                linked.append((int(j), tid))
        if linked and i > 0:
            T_i = poses[i]  # world->cam of frame i (global scale)
            R_i, t_i = T_i[:3, :3], T_i[:3, 3]
            ratios = []
            for j, tid in linked:
                d_map = (R_i @ tracks[tid].X_w + t_i)[2]  # global-scale depth
                d_new = X[j, 2]  # current-pair scale depth
                if d_new > 1e-6 and d_map > 1e-6:
                    ratios.append(d_map / d_new)
            s = float(np.median(ratios)) if ratios else 1.0
        else:
            s = 1.0  # first pair defines the global scale
        T_rel[:3, 3] *= s
        X = X * s

        T_next = T_rel @ poses[i]
        poses.append(T_next)
        valid.append(True)

        # ---- map update: extend linked tracks, create new ones
        p0_n = np.asarray(normalize_keypoints(jnp.asarray(mk0, jnp.float32), Kj))
        p1_n = np.asarray(normalize_keypoints(jnp.asarray(mk1, jnp.float32), Kj))
        linked_rows = dict(linked)
        new_table: Dict[Tuple[int, int], int] = {}
        X_w = _world_from_cam(poses[i], X)  # world coords, global scale
        for j in np.nonzero(good)[0]:
            j = int(j)
            tid = linked_rows.get(j)
            if tid is None:
                tr = Track(X_w[j])
                tr.obs.append((i, p0_n[j]))
                tracks.append(tr)
                tid = len(tracks) - 1
            tracks[tid].obs.append((i + 1, p1_n[j]))
            new_table[_quantize(mk1[j], link_px)] = tid
            frame_tables[i][_quantize(mk0[j], link_px)] = tid
            frame_tables[i + 1][_quantize(mk1[j], link_px)] = tid
        link_table = new_table

        # ---- sliding-window BA
        lo = max(0, len(poses) - window)
        hi = len(poses)  # frames [lo, hi)
        if hi - lo >= 3:
            _window_ba(
                poses, tracks, lo, hi, ba_iters, max_window_points
            )

    return OdometryResult(
        trajectory=Trajectory(
            poses=np.stack(poses).astype(np.float32), valid=np.asarray(valid)
        ),
        tracks=tracks,
        frame_tables=frame_tables,
        link_px=link_px,
    )


def _window_ba(
    poses: List[np.ndarray],
    tracks: List[Track],
    lo: int,
    hi: int,
    ba_iters: int,
    max_points: int,
) -> None:
    """Refine poses[lo:hi] (first two fixed) + their tracks in place."""
    Nc = hi - lo
    sel: List[int] = []
    for tid, tr in enumerate(tracks):
        n_in = sum(1 for f, _ in tr.obs if lo <= f < hi)
        if n_in >= 2:
            sel.append(tid)
    if len(sel) < 8:
        return
    if len(sel) > max_points:
        # keep the longest tracks (most constraining)
        sel.sort(key=lambda t: -len(tracks[t].obs))
        sel = sel[:max_points]

    Np = max_points
    max_obs = Np * min(Nc, 6)
    pts = np.zeros((Np, 3))
    cam_idx = np.zeros(max_obs, np.int32)
    pt_idx = np.zeros(max_obs, np.int32)
    uv = np.zeros((max_obs, 2))
    msk = np.zeros(max_obs, bool)
    m = 0
    for pslot, tid in enumerate(sel):
        pts[pslot] = tracks[tid].X_w
        for f, ob in tracks[tid].obs:
            if lo <= f < hi and m < max_obs:
                cam_idx[m] = f - lo
                pt_idx[m] = pslot
                uv[m] = ob
                msk[m] = True
                m += 1

    problem = BAProblem(
        poses=jnp.asarray(np.stack(poses[lo:hi]), jnp.float32),
        points=jnp.asarray(pts, jnp.float32),
        cam_idx=jnp.asarray(cam_idx),
        pt_idx=jnp.asarray(pt_idx),
        uv=jnp.asarray(uv, jnp.float32),
        mask=jnp.asarray(msk),
        fix_cameras=2,  # monocular gauge: 6-dof pose + scale
    )
    res = bundle_adjust(problem, iters=ba_iters)
    # accept only if the solve reduced the cost (LM guards each step, but
    # guard the whole window against degenerate geometry too)
    hist = np.asarray(res.cost_history)
    if not np.isfinite(hist[-1]) or hist[-1] > hist[0]:
        return
    new_poses = np.asarray(res.poses, np.float64)
    new_pts = np.asarray(res.points, np.float64)
    for c in range(2, Nc):
        poses[lo + c] = new_poses[c]
    for pslot, tid in enumerate(sel):
        tracks[tid].X_w = new_pts[pslot]
