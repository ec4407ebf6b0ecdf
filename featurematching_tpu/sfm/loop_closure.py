"""Loop-closure detection + pose-graph correction for sequential odometry.

Completes the incremental-SfM stack (docs/ROADMAP.md deferred item): the
windowed odometry (sfm/windowed.py) drifts because every edge is local;
this module adds the global constraints:

  1. retrieval — every frame gets a compact global descriptor (pooled
     coarse backbone features when a matcher is available, or a normalized
     thumbnail as the dependency-free fallback) and is queried against all
     temporally-distant previous frames by cosine similarity;
  2. geometric verification — candidate pairs are matched with the full
     matcher and accepted only if essential-matrix RANSAC finds enough
     inliers (`two_view_reconstruction`);
  3. scale resolution — a verified loop pair's unit-norm translation is
     rescaled into the odometry's global scale by comparing its triangulated
     depths against the map depths of tracks seen at the same pixels
     (the same median-depth-ratio rule the windowed runner uses per step);
  4. pose-graph optimization — sequential odometry edges + loop edges are
     optimized with `optimize_pose_graph` (Gauss-Newton on SE(3)).

This is new capability relative to the reference, which stops at two-view
pose errors (SURVEY.md §7 scope note); it makes `apps/sfm.py --loop-closure`
a full monocular SLAM-style back-end on TPU-friendly fixed-shape solvers.
"""

from __future__ import annotations

from typing import Callable, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from featurematching_tpu.sfm.pipeline import Trajectory, two_view_reconstruction
from featurematching_tpu.sfm.pose_graph import PoseGraph, optimize_pose_graph
from featurematching_tpu.sfm.windowed import (
    OdometryResult,
    _quantize,
    run_sequence_windowed_full,
)


def image_descriptor(frame: np.ndarray, grid: int = 12) -> np.ndarray:
    """Dependency-free global descriptor: grid x grid mean-pooled intensity,
    mean-subtracted and L2-normalized. Robust to exposure; good enough to
    shortlist revisits (verification rejects false positives geometrically)."""
    img = np.asarray(frame, np.float32)
    if img.ndim == 3:
        img = img.mean(axis=-1)
    H, W = img.shape
    hs, ws = H // grid, W // grid
    pooled = (
        img[: hs * grid, : ws * grid]
        .reshape(grid, hs, grid, ws)
        .mean(axis=(1, 3))
        .reshape(-1)
    )
    pooled -= pooled.mean()
    n = np.linalg.norm(pooled)
    return pooled / n if n > 1e-12 else pooled


def feature_descriptor(feat_c: np.ndarray) -> np.ndarray:
    """Global descriptor from coarse backbone features [L, C] (or [H, W, C]):
    GeM-style mean of squared activations per channel, L2-normalized —
    cheap, rotation-tolerant retrieval on features the matcher already
    computed."""
    f = np.asarray(feat_c, np.float32).reshape(-1, feat_c.shape[-1])
    g = np.sqrt(np.mean(f * f, axis=0))
    g -= g.mean()
    n = np.linalg.norm(g)
    return g / n if n > 1e-12 else g


class LoopDetector:
    """Cosine-similarity retrieval over past frame descriptors.

    `min_gap` frames around the query are excluded (consecutive frames always
    look alike); at most `topk` candidates above `sim_thresh` are returned,
    best first.
    """

    def __init__(self, min_gap: int = 5, sim_thresh: float = 0.88, topk: int = 1):
        self.min_gap = min_gap
        self.sim_thresh = sim_thresh
        self.topk = topk
        self._descs: List[np.ndarray] = []

    def add(self, desc: np.ndarray) -> int:
        self._descs.append(np.asarray(desc, np.float32))
        return len(self._descs) - 1

    def query(self, desc: np.ndarray, cur_idx: int) -> List[Tuple[int, float]]:
        """Candidates among frames [0, cur_idx - min_gap), as (idx, sim)."""
        hi = cur_idx - self.min_gap
        if hi <= 0 or not self._descs:
            return []
        D = np.stack(self._descs[: min(hi, len(self._descs))])
        sims = D @ np.asarray(desc, np.float32)
        order = np.argsort(-sims)[: self.topk]
        return [(int(i), float(sims[i])) for i in order if sims[i] >= self.sim_thresh]


class LoopEdge(NamedTuple):
    i: int  # earlier frame
    j: int  # later frame
    Z: np.ndarray  # [4, 4] cam-i -> cam-j, odometry-scale translation
    n_inliers: int
    similarity: float


def _loop_edge_scale(
    odo: OdometryResult,
    frame_i: int,
    mk0: np.ndarray,
    good: np.ndarray,
    X: np.ndarray,
) -> Optional[float]:
    """Median(map depth / loop-reconstruction depth) over matches whose
    frame-i pixel links to an existing track — the windowed runner's scale
    rule applied to a non-consecutive pair. None if nothing links."""
    table = odo.frame_tables[frame_i]
    if not table:
        return None
    T_i = np.asarray(odo.trajectory.poses[frame_i], np.float64)
    R_i, t_i = T_i[:3, :3], T_i[:3, 3]
    ratios = []
    for j in np.nonzero(good)[0]:
        tid = table.get(_quantize(mk0[j], odo.link_px))
        if tid is None:
            continue
        d_map = (R_i @ odo.tracks[tid].X_w + t_i)[2]
        d_new = X[j, 2]
        if d_new > 1e-6 and d_map > 1e-6:
            ratios.append(d_map / d_new)
    return float(np.median(ratios)) if len(ratios) >= 5 else None


def detect_loop_edges(
    matcher_fn: Callable,
    frames: Sequence,
    odo: OdometryResult,
    K: np.ndarray,
    descriptors: Sequence[np.ndarray],
    min_gap: int = 5,
    sim_thresh: float = 0.88,
    topk: int = 1,
    min_inliers: int = 30,
    pixel_thr: float = 1.0,
    num_hypotheses: int = 256,
    key: Optional[jax.Array] = None,
) -> List[LoopEdge]:
    """Retrieval + geometric verification + scale resolution for every frame.

    Returns accepted loop edges (earlier -> later, odometry scale). Edges
    whose scale cannot be resolved against the map are dropped (an unscaled
    translation constraint would fight the odometry instead of correcting it).
    """
    if key is None:
        key = jax.random.PRNGKey(7)
    det = LoopDetector(min_gap=min_gap, sim_thresh=sim_thresh, topk=topk)
    valid = np.asarray(odo.trajectory.valid, bool)
    edges: List[LoopEdge] = []
    for q in range(len(frames)):
        cands = det.query(descriptors[q], q) if valid[q] else []
        det.add(descriptors[q])
        for c, sim in cands:
            if not valid[c]:
                continue
            mk0, mk1, mask = matcher_fn(frames[c], frames[q])
            mk0 = np.asarray(mk0, np.float64)[:, :2]
            mk1 = np.asarray(mk1, np.float64)[:, :2]
            mask_np = np.asarray(mask, bool)
            if mask_np.sum() < min_inliers:
                continue
            key, sub = jax.random.split(key)
            T_rel_j, X_j, good_j, n_inl = two_view_reconstruction(
                jnp.asarray(mk0, jnp.float32), jnp.asarray(mk1, jnp.float32),
                jnp.asarray(mask_np), jnp.asarray(K, jnp.float32),
                jnp.asarray(K, jnp.float32), sub,
                pixel_thr=pixel_thr, num_hypotheses=num_hypotheses, ba_iters=3,
            )
            n_inl = int(np.asarray(n_inl))
            if n_inl < min_inliers:
                continue
            good = np.asarray(good_j, bool) & mask_np
            s = _loop_edge_scale(
                odo, c, mk0, good, np.asarray(X_j, np.float64)
            )
            if s is None:
                continue
            Z = np.asarray(T_rel_j, np.float64)
            Z[:3, 3] *= s
            edges.append(LoopEdge(i=c, j=q, Z=Z, n_inliers=n_inl, similarity=sim))
    return edges


def close_loops(
    traj: Trajectory,
    loop_edges: Sequence[LoopEdge],
    iters: int = 12,
    loop_weight: float = 1.0,
) -> Trajectory:
    """Pose-graph optimize sequential odometry edges + verified loop edges.

    Sequential measurements are taken from the odometry trajectory itself
    (they encode the windowed-BA result); node 0 is the gauge. Returns the
    corrected trajectory (odometry is returned unchanged when no loop edge
    survived verification).
    """
    if not loop_edges:
        return traj
    poses = np.asarray(traj.poses, np.float64)
    N = len(poses)
    ei = list(range(N - 1))
    ej = list(range(1, N))
    Z = [poses[i + 1] @ np.linalg.inv(poses[i]) for i in range(N - 1)]
    w = [1.0] * (N - 1)
    for e in loop_edges:
        ei.append(e.i)
        ej.append(e.j)
        Z.append(e.Z)
        w.append(loop_weight)
    graph = PoseGraph(
        poses=jnp.asarray(poses, jnp.float32),
        edge_i=jnp.asarray(ei, jnp.int32),
        edge_j=jnp.asarray(ej, jnp.int32),
        measurements=jnp.asarray(np.stack(Z), jnp.float32),
        weights=jnp.asarray(w, jnp.float32),
    )
    opt, costs = optimize_pose_graph(graph, iters=iters)
    costs = np.asarray(costs)
    if not np.isfinite(costs[-1]) or costs[-1] > costs[0]:
        return traj
    return Trajectory(poses=np.asarray(opt, np.float32), valid=traj.valid)


def run_sequence_loop_closed(
    matcher_fn: Callable,
    frames: Sequence,
    K: np.ndarray,
    descriptor_fn: Optional[Callable] = None,
    window: int = 5,
    min_gap: int = 5,
    sim_thresh: float = 0.88,
    topk: int = 1,
    min_inliers: int = 30,
    pixel_thr: float = 1.0,
    num_hypotheses: int = 256,
    pgo_iters: int = 12,
    seed: int = 0,
    **windowed_kwargs,
) -> Tuple[Trajectory, List[LoopEdge]]:
    """Windowed odometry -> loop detection -> pose-graph correction.

    descriptor_fn(frame) -> 1-D descriptor; defaults to `image_descriptor`
    (frames must then be image arrays). Returns (trajectory, loop_edges).
    """
    odo = run_sequence_windowed_full(
        matcher_fn, list(frames), K, window=window, pixel_thr=pixel_thr,
        num_hypotheses=num_hypotheses, seed=seed, **windowed_kwargs,
    )
    dfn = descriptor_fn if descriptor_fn is not None else image_descriptor
    descriptors = [dfn(f) for f in frames]
    edges = detect_loop_edges(
        matcher_fn, frames, odo, K, descriptors,
        min_gap=min_gap, sim_thresh=sim_thresh, topk=topk,
        min_inliers=min_inliers, pixel_thr=pixel_thr,
        num_hypotheses=num_hypotheses, key=jax.random.PRNGKey(seed + 1),
    )
    return close_loops(odo.trajectory, edges, iters=pgo_iters), edges
