"""Two-view + sequential SfM pipeline over the matcher's fixed-shape outputs.

Glues the framework end to end (BASELINE.json config 4): per-pair matches ->
essential-matrix RANSAC -> pose chaining -> triangulation -> windowed
Schur-BA -> trajectory. Map state is fixed-capacity (static max keyframes /
points / observations) so one jit covers the whole run.

This is new capability relative to the reference, which stops at two-view
pose errors (SURVEY.md §7 scope note).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from featurematching_tpu.geometry.epipolar import normalize_keypoints
from featurematching_tpu.geometry.ransac import estimate_essential_ransac
from featurematching_tpu.geometry.triangulation import (
    projection_from_pose,
    triangulate_linear,
)
from featurematching_tpu.sfm.ba import BAProblem, bundle_adjust


class Trajectory(NamedTuple):
    poses: np.ndarray  # [N, 4, 4] world->cam
    valid: np.ndarray  # [N]


def two_view_reconstruction(
    mkpts0: jnp.ndarray,
    mkpts1: jnp.ndarray,
    mask: jnp.ndarray,
    K0: jnp.ndarray,
    K1: jnp.ndarray,
    key: jax.Array,
    pixel_thr: float = 0.5,
    num_hypotheses: int = 512,
    ba_iters: int = 5,
):
    """Matches -> (R, t) + triangulated points + two-view BA refinement.

    Returns (T_0to1 [4,4], points [K,3], point_mask [K], num_inliers).
    Translation is up to scale (unit norm), like any essential-matrix pose.
    """
    p0 = normalize_keypoints(mkpts0[..., :2], K0)
    p1 = normalize_keypoints(mkpts1[..., :2], K1)
    focal = 0.5 * (K0[0, 0] + K0[1, 1])
    res = estimate_essential_ransac(
        p0, p1, mask, key, thresh=pixel_thr / focal, num_hypotheses=num_hypotheses
    )

    T0 = jnp.eye(4)
    T1 = jnp.eye(4).at[:3, :3].set(res.R).at[:3, 3].set(res.t)
    P0 = projection_from_pose(T0)
    P1 = projection_from_pose(T1)
    X = triangulate_linear(P0, P1, p0, p1)  # [K, 3]
    # points valid if inlier and in front of both cameras
    z0 = X[:, 2]
    Xc1 = X @ res.R.T + res.t
    good = res.inliers & (z0 > 1e-3) & (Xc1[:, 2] > 1e-3)

    # two-view BA: cameras [2], points [K], observations both views
    K_pts = X.shape[0]
    poses = jnp.stack([T0, T1])
    cam_idx = jnp.concatenate(
        [jnp.zeros(K_pts, jnp.int32), jnp.ones(K_pts, jnp.int32)]
    )
    pt_idx = jnp.concatenate([jnp.arange(K_pts), jnp.arange(K_pts)]).astype(jnp.int32)
    uv = jnp.concatenate([p0, p1])
    obs_mask = jnp.concatenate([good, good])
    problem = BAProblem(
        poses=poses, points=X, cam_idx=cam_idx, pt_idx=pt_idx, uv=uv,
        mask=obs_mask, fix_cameras=1,
    )
    ba = bundle_adjust(problem, iters=ba_iters)
    return ba.poses[1], ba.points, good, res.num_inliers


def run_sequence(
    matcher_fn,
    frames: List[np.ndarray],
    K: np.ndarray,
    key: Optional[jax.Array] = None,
    pixel_thr: float = 1.0,
    num_hypotheses: int = 256,
) -> Trajectory:
    """Sequential odometry: match consecutive frames, chain two-view poses.

    matcher_fn(img0, img1) -> (mkpts0 [K,2or3], mkpts1, mask) fixed-shape.
    Scale is not observable from monocular essential matrices; each step's
    translation is unit-norm (trajectory comparison should be ATE after
    Sim(3)/per-step-scale alignment).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    Kj = jnp.asarray(K, jnp.float32)
    poses = [np.eye(4, dtype=np.float32)]
    valid = [True]
    cur = jnp.eye(4)
    for i in range(len(frames) - 1):
        mk0, mk1, mask = matcher_fn(frames[i], frames[i + 1])
        key, sub = jax.random.split(key)
        T_rel, _, _, n_inl = two_view_reconstruction(
            jnp.asarray(mk0), jnp.asarray(mk1), jnp.asarray(mask), Kj, Kj, sub,
            pixel_thr=pixel_thr, num_hypotheses=num_hypotheses, ba_iters=3,
        )
        ok = int(np.asarray(n_inl)) >= 8
        cur = T_rel @ cur if ok else cur
        poses.append(np.asarray(cur))
        valid.append(ok)
    return Trajectory(poses=np.stack(poses), valid=np.asarray(valid))


def ate_rmse(traj: np.ndarray, gt: np.ndarray, align_scale: bool = True) -> float:
    """Absolute trajectory error (RMSE of camera centers) after Umeyama
    similarity alignment — the benchmark metric for BASELINE config 4."""
    # camera centers: C = -R^T t
    c_est = np.stack([-T[:3, :3].T @ T[:3, 3] for T in traj])
    c_gt = np.stack([-T[:3, :3].T @ T[:3, 3] for T in gt])

    mu_e = c_est.mean(0)
    mu_g = c_gt.mean(0)
    E = c_est - mu_e
    G = c_gt - mu_g
    # Umeyama
    U, D, Vt = np.linalg.svd(G.T @ E / len(E))
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var_e = (E**2).sum() / len(E)
    s = np.trace(np.diag(D) @ S) / var_e if (align_scale and var_e > 0) else 1.0
    t = mu_g - s * R @ mu_e
    aligned = (s * (R @ E.T)).T + mu_g
    return float(np.sqrt(((aligned - c_gt) ** 2).sum(axis=1).mean()))
