"""On-device robust homography estimation (DLT + fixed-shape RANSAC).

Covers BASELINE.json config 2 (HPatches-style homography estimation) and the
pseudo-GT filtering role the reference delegated to kornia/cv2 homography
RANSAC (datasets/scared_new2.py:205-208) — as a batched, jit-able solver in
the style of geometry.ransac.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class HomographyResult(NamedTuple):
    H: jnp.ndarray  # [3, 3]
    inliers: jnp.ndarray  # [N] bool
    num_inliers: jnp.ndarray  # [] int32
    valid: jnp.ndarray  # [] bool


def _normalize_pts(pts: jnp.ndarray, w: jnp.ndarray):
    """Hartley normalization: zero-mean, sqrt(2) RMS. Returns (pts_n, T)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-8)
    mean = jnp.sum(pts * w[..., None], axis=-2) / wsum
    d = jnp.sqrt(jnp.sum((pts - mean) ** 2, axis=-1) + 1e-12)
    scale = jnp.sqrt(2.0) / jnp.maximum(jnp.sum(d * w) / wsum, 1e-8)
    T = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    ) * scale
    T = T.at[2, 2].set(1.0)
    T = T.at[0, 2].set(-scale * mean[0])
    T = T.at[1, 2].set(-scale * mean[1])
    return (pts - mean) * scale, T


def dlt_homography(
    pts0: jnp.ndarray, pts1: jnp.ndarray, w: jnp.ndarray
) -> jnp.ndarray:
    """Weighted normalized DLT: pts [*, N, 2], w [*, N] -> H [*, 3, 3]
    (maps pts0 -> pts1)."""

    def single(p0, p1, wt):
        p0n, T0 = _normalize_pts(p0, wt)
        p1n, T1 = _normalize_pts(p1, wt)
        x, y = p0n[:, 0], p0n[:, 1]
        u, v = p1n[:, 0], p1n[:, 1]
        zeros = jnp.zeros_like(x)
        ones = jnp.ones_like(x)
        ax = jnp.stack(
            [-x, -y, -ones, zeros, zeros, zeros, u * x, u * y, u], axis=-1
        )
        ay = jnp.stack(
            [zeros, zeros, zeros, -x, -y, -ones, v * x, v * y, v], axis=-1
        )
        A = jnp.concatenate([ax, ay], axis=0) * jnp.concatenate([wt, wt])[:, None]
        AtA = A.T @ A
        _, _, Vt = jnp.linalg.svd(AtA)
        Hn = Vt[-1].reshape(3, 3)
        H = jnp.linalg.inv(T1) @ Hn @ T0
        return H / (H[2, 2] + 1e-12)

    if pts0.ndim == 2:
        return single(pts0, pts1, w)
    return jax.vmap(single)(pts0, pts1, w)


def homography_transfer_error(
    pts0: jnp.ndarray, pts1: jnp.ndarray, H: jnp.ndarray
) -> jnp.ndarray:
    """Squared symmetric transfer error [..., N]."""
    def warp(p, M):
        ph = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
        q = ph @ M.T
        return q[..., :2] / (q[..., 2:3] + 1e-12)

    Hinv = jnp.linalg.inv(H)
    e_fwd = jnp.sum((warp(pts0, H) - pts1) ** 2, axis=-1)
    e_bwd = jnp.sum((warp(pts1, Hinv) - pts0) ** 2, axis=-1)
    return e_fwd + e_bwd


@partial(jax.jit, static_argnames=("num_hypotheses", "refine_iters"))
def estimate_homography_ransac(
    pts0: jnp.ndarray,
    pts1: jnp.ndarray,
    mask: jnp.ndarray,
    key: jax.Array,
    thresh: float = 3.0,
    num_hypotheses: int = 256,
    refine_iters: int = 2,
) -> HomographyResult:
    """Fixed-shape 4-point RANSAC. pts in pixels, thresh in pixels."""
    N = pts0.shape[0]
    logits = jnp.where(mask, 0.0, -jnp.inf)
    g = jax.random.gumbel(key, (num_hypotheses, N)) + logits[None, :]
    _, idx = jax.lax.top_k(g, 4)

    sets0 = pts0[idx]
    sets1 = pts1[idx]
    w4 = jnp.ones(idx.shape, pts0.dtype)
    H_h = dlt_homography(sets0, sets1, w4)  # [Hyp, 3, 3]

    err = jax.vmap(lambda Hm: homography_transfer_error(pts0, pts1, Hm))(H_h)
    t2 = thresh * thresh
    inl = (err < t2) & mask[None, :]
    score = jnp.sum(jnp.where(inl, 1.0 - err / t2, 0.0), axis=1)
    best = jnp.argmax(score)
    H_best = H_h[best]
    inliers = inl[best]

    def refit(carry, _):
        H_cur, inl_cur = carry
        w = inl_cur.astype(pts0.dtype)
        enough = jnp.sum(w) >= 4
        H_new = dlt_homography(pts0, pts1, w)
        H_new = jnp.where(enough, H_new, H_cur)
        e = homography_transfer_error(pts0, pts1, H_new)
        return (H_new, (e < t2) & mask), None

    (H_ref, inl_ref), _ = jax.lax.scan(
        refit, (H_best, inliers), None, length=refine_iters
    )
    better = jnp.sum(inl_ref) >= jnp.sum(inliers)
    H_final = jnp.where(better, H_ref, H_best)
    inliers_final = jnp.where(better, inl_ref, inliers)
    n = jnp.sum(inliers_final).astype(jnp.int32)
    return HomographyResult(
        H=H_final, inliers=inliers_final, num_inliers=n,
        valid=(jnp.sum(mask) >= 4) & (n >= 4),
    )


def homography_corner_error(
    H_est: jnp.ndarray, H_gt: jnp.ndarray, width: float, height: float
) -> jnp.ndarray:
    """Mean corner reprojection error (the HPatches benchmark metric)."""
    corners = jnp.array(
        [[0.0, 0.0], [width, 0.0], [width, height], [0.0, height]]
    )

    def warp(p, M):
        ph = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
        q = ph @ M.T
        return q[..., :2] / (q[..., 2:3] + 1e-12)

    return jnp.mean(
        jnp.linalg.norm(warp(corners, H_est) - warp(corners, H_gt), axis=-1)
    )
