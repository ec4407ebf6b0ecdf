"""On-device robust essential-matrix estimation + pose recovery.

TPU-native replacement for the reference's CPU OpenCV calls
(`cv2.findEssentialMat` + `cv2.recoverPose`, /root/reference/utils/metrics.py:79-109
and network/utils/pose_pred.py:130-151), which forced a device→host sync per
eval batch item. Here the whole solver is a fixed-shape, vmappable JAX program:

  * H hypotheses are drawn at once (static `num_hypotheses`), each an 8-point
    normalized linear solve with rank-2 projection — an [H, 8, 9] batched SVD
    instead of OpenCV's sequential adaptive loop.
  * Scoring is Sampson distance, inliers thresholded in normalized coords.
  * The best model is re-fit on its inliers (weighted 8-point, `refine_iters`
    IRLS rounds) and decomposed into (R, t) with a batched cheirality vote.

Works on padded match lists: `mask` marks valid matches; invalid rows get zero
weight everywhere and can never be sampled as minimal sets (their sampling
probability is zero).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from featurematching_tpu.geometry.epipolar import sampson_distance


class RansacResult(NamedTuple):
    E: jnp.ndarray  # [3, 3] best essential matrix
    R: jnp.ndarray  # [3, 3] recovered rotation
    t: jnp.ndarray  # [3] recovered unit translation
    inliers: jnp.ndarray  # [N] bool
    num_inliers: jnp.ndarray  # [] int32
    valid: jnp.ndarray  # [] bool — enough points & a usable model found


def _eight_point(pts0: jnp.ndarray, pts1: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted 8-point: pts [*, N, 2] normalized, w [*, N] -> E [*, 3, 3].

    Builds the [N, 9] epipolar constraint matrix, takes the null-space via SVD,
    then projects to the essential manifold (two equal singular values).
    """
    x0, y0 = pts0[..., 0], pts0[..., 1]
    x1, y1 = pts1[..., 0], pts1[..., 1]
    ones = jnp.ones_like(x0)
    # row: [x1x0, x1y0, x1, y1x0, y1y0, y1, x0, y0, 1]
    A = jnp.stack(
        [x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1, x0, y0, ones], axis=-1
    )  # [*, N, 9]
    A = A * w[..., None]
    # null space of A: eigenvector of A^T A with smallest eigenvalue
    AtA = jnp.einsum("...ni,...nj->...ij", A, A)  # [*, 9, 9]
    _, _, Vt = jnp.linalg.svd(AtA)
    e = Vt[..., -1, :]  # [*, 9]
    E = e.reshape(e.shape[:-1] + (3, 3))
    # project onto essential manifold: singular values -> (s, s, 0)
    U, S, Vt2 = jnp.linalg.svd(E)
    s = (S[..., 0] + S[..., 1]) / 2.0
    S_proj = jnp.stack([s, s, jnp.zeros_like(s)], axis=-1)
    E = U @ (S_proj[..., None] * Vt2)
    # fix sign/scale for determinism
    norm = jnp.linalg.norm(E, axis=(-2, -1), keepdims=True) + 1e-12
    return E / norm


def decompose_essential(E: jnp.ndarray):
    """E [..., 3, 3] -> (R1, R2, t) candidate decompositions (Hartley-Zisserman)."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    det_u = jnp.linalg.det(U)[..., None, None]
    det_v = jnp.linalg.det(Vt)[..., None, None]
    U = U * jnp.concatenate(
        [jnp.ones_like(det_u), jnp.ones_like(det_u), jnp.sign(det_u)], axis=-1
    )
    Vt = Vt * jnp.concatenate(
        [jnp.ones_like(det_v), jnp.ones_like(det_v), jnp.sign(det_v)], axis=-2
    )
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[..., :, 2]
    return R1, R2, t


def _depths_two_view(R: jnp.ndarray, t: jnp.ndarray, pts0: jnp.ndarray, pts1: jnp.ndarray):
    """Midpoint-style depths of triangulated points in both cameras.

    pts: [N, 2] normalized. Returns (z0, z1) each [N]. Solves, per point, the
    2x2 least-squares system  z1*x1 = z0*R x0 + t  in closed form.
    """
    f0 = jnp.concatenate([pts0, jnp.ones_like(pts0[..., :1])], axis=-1)  # [N, 3]
    f1 = jnp.concatenate([pts1, jnp.ones_like(pts1[..., :1])], axis=-1)
    Rf0 = f0 @ R.T  # [N, 3]
    # minimize || z0 * Rf0 - z1 * f1 + t ||^2 over (z0, z1):
    #   [a b; b c] [z0; z1] = [d; e]   (normal equations)
    a = jnp.sum(Rf0 * Rf0, -1)
    b = -jnp.sum(Rf0 * f1, -1)
    c = jnp.sum(f1 * f1, -1)
    d = -jnp.sum(Rf0 * t, -1)
    e = jnp.sum(f1 * t, -1)
    det = a * c - b * b
    z0 = (c * d - b * e) / (det + 1e-12)
    z1 = (a * e - b * d) / (det + 1e-12)
    return z0, z1


def recover_pose_from_essential(
    E: jnp.ndarray, pts0: jnp.ndarray, pts1: jnp.ndarray, weights: jnp.ndarray
):
    """Pick the (R, t) with the best cheirality vote among the 4 decompositions.

    Replaces cv2.recoverPose (utils/metrics.py:100-108). pts are normalized
    [N, 2]; weights [N] gate which correspondences vote.
    Returns (R [3,3], t [3], votes [4]).
    """
    R1, R2, t = decompose_essential(E)
    cands_R = jnp.stack([R1, R1, R2, R2])  # [4, 3, 3]
    cands_t = jnp.stack([t, -t, t, -t])  # [4, 3]

    def vote(R, tt):
        z0, z1 = _depths_two_view(R, tt, pts0, pts1)
        good = (z0 > 0) & (z1 > 0)
        return jnp.sum(good * weights)

    votes = jax.vmap(vote)(cands_R, cands_t)
    best = jnp.argmax(votes)
    return cands_R[best], cands_t[best], votes


@partial(jax.jit, static_argnames=("num_hypotheses", "refine_iters"))
def estimate_essential_ransac(
    pts0: jnp.ndarray,
    pts1: jnp.ndarray,
    mask: jnp.ndarray,
    key: jax.Array,
    thresh: float = 1e-3,
    num_hypotheses: int = 512,
    refine_iters: int = 2,
) -> RansacResult:
    """Fixed-shape essential-matrix RANSAC on normalized coordinates.

    Args:
      pts0, pts1: [N, 2] normalized camera coords (padded).
      mask: [N] validity of each correspondence.
      key: PRNG key for hypothesis sampling.
      thresh: Sampson inlier threshold in normalized units
        (pixel_thr / focal — reference uses pixel_thr=0.5, config.py:135).
      num_hypotheses: static hypothesis count (replaces cv2's adaptive loop,
        capped at RANSAC_MAX_ITERS=10000 in the reference).
      refine_iters: IRLS refit rounds on the best model's inliers.
    """
    N = pts0.shape[0]
    maskf = mask.astype(jnp.float32)
    num_valid = jnp.sum(maskf)

    # --- sample minimal sets: [H, 8] indices, valid-only via masked Gumbel top-k
    logits = jnp.where(mask, 0.0, -jnp.inf)  # uniform over valid
    g = jax.random.gumbel(key, (num_hypotheses, N)) + logits[None, :]
    _, idx = jax.lax.top_k(g, 8)  # [H, 8] distinct valid indices per hypothesis

    sets0 = pts0[idx]  # [H, 8, 2]
    sets1 = pts1[idx]
    w8 = jnp.ones(idx.shape, dtype=pts0.dtype)
    E_h = _eight_point(sets0, sets1, w8)  # [H, 3, 3]

    # --- score all hypotheses on all points: [H, N]
    d = sampson_distance(pts0[None], pts1[None], E_h)  # [H, N]
    inl = (d < thresh * thresh) & mask[None, :]
    # MSAC-style truncated score (better than raw counts, same asymptotics)
    score = jnp.sum(jnp.where(inl, 1.0 - d / (thresh * thresh), 0.0), axis=1)
    best_h = jnp.argmax(score)
    E_best = E_h[best_h]
    inliers = inl[best_h]

    # --- IRLS refit on inliers of the best model
    def refit(carry, _):
        E_cur, inl_cur = carry
        w = inl_cur.astype(pts0.dtype)
        enough = jnp.sum(w) >= 8
        E_new = _eight_point(pts0, pts1, w)
        E_new = jnp.where(enough, E_new, E_cur)
        d_new = sampson_distance(pts0, pts1, E_new)
        inl_new = (d_new < thresh * thresh) & mask
        return (E_new, inl_new), None

    (E_ref, inliers_ref), _ = jax.lax.scan(
        refit, (E_best, inliers), None, length=refine_iters
    )
    num_inl = jnp.sum(inliers_ref)
    use_refined = num_inl >= jnp.sum(inliers)
    E_final = jnp.where(use_refined, E_ref, E_best)
    inliers_final = jnp.where(use_refined, inliers_ref, inliers)

    R, t, _ = recover_pose_from_essential(
        E_final, pts0, pts1, inliers_final.astype(pts0.dtype)
    )
    num_inliers = jnp.sum(inliers_final).astype(jnp.int32)
    valid = (num_valid >= 8) & (num_inliers >= 5)
    return RansacResult(E=E_final, R=R, t=t, inliers=inliers_final,
                        num_inliers=num_inliers, valid=valid)
