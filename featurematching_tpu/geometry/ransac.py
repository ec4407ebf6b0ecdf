"""On-device robust essential-matrix estimation + pose recovery.

TPU-native replacement for the reference's CPU OpenCV calls
(`cv2.findEssentialMat` + `cv2.recoverPose`, /root/reference/utils/metrics.py:79-109
and network/utils/pose_pred.py:130-151), which forced a device→host sync per
eval batch item. Here the whole solver is a fixed-shape, vmappable JAX program:

  * H hypotheses are drawn at once (static `num_hypotheses`) instead of
    OpenCV's sequential adaptive loop. Default minimal solver is the Nistér
    5-point (geometry/five_point.py, up to 10 models per sample — what
    cv2.findEssentialMat uses); an 8-point linear solve is available too.
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
from featurematching_tpu.geometry.five_point import five_point_candidates


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


def _skew(v: jnp.ndarray) -> jnp.ndarray:
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -v[..., 2], v[..., 1]], -1),
            jnp.stack([v[..., 2], z, -v[..., 0]], -1),
            jnp.stack([-v[..., 1], v[..., 0], z], -1),
        ],
        -2,
    )


def _sampson_residual(E, f0, f1):
    """Signed first-order geometric (Sampson) residual, [N]."""
    Ex0 = jnp.einsum("ij,nj->ni", E, f0)
    Etx1 = jnp.einsum("ji,nj->ni", E, f1)
    num = jnp.sum(f1 * Ex0, -1)
    den = jnp.sqrt(
        Ex0[:, 0] ** 2 + Ex0[:, 1] ** 2 + Etx1[:, 0] ** 2 + Etx1[:, 1] ** 2
        + 1e-20
    )
    return num / den


def refine_pose_sampson(
    R: jnp.ndarray,
    t: jnp.ndarray,
    pts0: jnp.ndarray,
    pts1: jnp.ndarray,
    weights: jnp.ndarray,
    iters: int = 5,
):
    """Gauss-Newton on the essential manifold: minimize weighted Sampson error
    over (R, t) with t on the unit sphere (5 DoF). Works from 5 points up —
    the final polish the linear 8-point refit cannot provide at low N, and a
    strict improvement at any N (steps are only accepted when the cost drops).
    Returns (R, t)."""
    f0 = jnp.concatenate([pts0, jnp.ones_like(pts0[..., :1])], -1)
    f1 = jnp.concatenate([pts1, jnp.ones_like(pts1[..., :1])], -1)
    w = weights.astype(pts0.dtype)

    def so3_exp(v):
        """Rodrigues with SMOOTH gradients at v=0 (the GN linearization point;
        a norm-based axis-angle map has an undefined derivative there)."""
        th2 = jnp.sum(v * v)
        small = th2 < 1e-8
        th = jnp.sqrt(jnp.where(small, 1.0, th2))  # safe sqrt
        A = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / th)
        B = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / th2)
        K = _skew(v)
        return jnp.eye(3, dtype=v.dtype) + A * K + B * (K @ K)

    def tangent_basis(t):
        e = jnp.where(
            jnp.abs(t[0]) < 0.9,
            jnp.array([1.0, 0.0, 0.0], t.dtype),
            jnp.array([0.0, 1.0, 0.0], t.dtype),
        )
        b1 = jnp.cross(t, e)
        b1 = b1 / (jnp.linalg.norm(b1) + 1e-12)
        b2 = jnp.cross(t, b1)
        return b1, b2

    def apply_params(p, R, t):
        Rp = R @ so3_exp(p[:3])
        b1, b2 = tangent_basis(t)
        tp = t + b1 * p[3] + b2 * p[4]
        tp = tp / (jnp.linalg.norm(tp) + 1e-12)
        return Rp, tp

    def residuals(p, R, t):
        Rp, tp = apply_params(p, R, t)
        E = _skew(tp) @ Rp
        return _sampson_residual(E, f0, f1) * w

    zero = jnp.zeros((5,), pts0.dtype)

    def step(carry, _):
        R, t = carry
        r = residuals(zero, R, t)
        J = jax.jacfwd(residuals)(zero, R, t)  # [N, 5]
        JtJ = J.T @ J + 1e-9 * jnp.eye(5, dtype=J.dtype)
        delta = jnp.linalg.solve(JtJ, J.T @ r)
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
        Rn, tn = apply_params(-delta, R, t)
        # accept only on cost decrease
        cost_old = jnp.sum(r * r)
        rn = residuals(zero, Rn, tn)
        cost_new = jnp.sum(rn * rn)
        better = cost_new < cost_old
        R = jnp.where(better, Rn, R)
        t = jnp.where(better, tn, t)
        return (R, t), None

    (R, t), _ = jax.lax.scan(step, (R, t), None, length=iters)
    return R, t


@partial(jax.jit, static_argnames=("num_hypotheses", "refine_iters", "solver"))
def estimate_essential_ransac(
    pts0: jnp.ndarray,
    pts1: jnp.ndarray,
    mask: jnp.ndarray,
    key: jax.Array,
    thresh: float = 1e-3,
    num_hypotheses: int = 512,
    refine_iters: int = 2,
    solver: str = "5pt",
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
      solver: '5pt' (Nistér minimal solver, the cv2.findEssentialMat default
        the reference relies on — each sample yields up to 10 models) or
        '8pt' (linear, needs >=8 points).
    """
    N = pts0.shape[0]
    maskf = mask.astype(jnp.float32)
    num_valid = jnp.sum(maskf)
    min_pts = 5 if solver == "5pt" else 8

    # --- sample minimal sets, valid-only via masked Gumbel top-k
    logits = jnp.where(mask, 0.0, -jnp.inf)  # uniform over valid
    g = jax.random.gumbel(key, (num_hypotheses, N)) + logits[None, :]
    _, idx = jax.lax.top_k(g, min_pts)  # [H, m] distinct valid indices

    sets0 = pts0[idx]  # [H, m, 2]
    sets1 = pts1[idx]
    if solver == "5pt":
        E_cand, cand_ok = five_point_candidates(sets0, sets1)  # [H, 10, 3, 3]
        E_h = E_cand.reshape(-1, 3, 3)  # [H*10, 3, 3]
        model_ok = cand_ok.reshape(-1)
    elif solver == "8pt":
        w8 = jnp.ones(idx.shape, dtype=pts0.dtype)
        E_h = _eight_point(sets0, sets1, w8)  # [H, 3, 3]
        model_ok = jnp.ones(E_h.shape[0], bool)
    else:
        raise ValueError(f"unknown solver {solver!r}")

    # --- score all models on all points: [M, N]
    d = sampson_distance(pts0[None], pts1[None], E_h)  # [M, N]
    inl = (d < thresh * thresh) & mask[None, :] & model_ok[:, None]
    # MSAC-style truncated score (better than raw counts, same asymptotics)
    score = jnp.sum(jnp.where(inl, 1.0 - d / (thresh * thresh), 0.0), axis=1)
    score = jnp.where(model_ok, score, -1.0)

    # LO-RANSAC: Sampson-GN-polish the top-K models and rescore with a
    # CHEIRALITY-GATED MSAC score. Two reasons: (a) candidate models from a
    # float32 minimal solver are noisy, and a single-basin polish of only the
    # argmax can land on the wrong mode; (b) at small N several legitimate
    # essential matrices explain all points epipolarly — only the
    # triangulated-depth (cheirality) vote separates the true pose from the
    # phantom solutions (what cv2.recoverPose's inlier count does).
    K_LO = min(32, score.shape[0])
    _, top_idx = jax.lax.top_k(score, K_LO)

    def polish(E_k, inl_k):
        wk = inl_k.astype(pts0.dtype)
        R0, t0, _ = recover_pose_from_essential(E_k, pts0, pts1, wk)
        R1, t1 = refine_pose_sampson(R0, t0, pts0, pts1, wk, iters=5)
        E1 = _skew(t1) @ R1
        E1 = E1 / (jnp.linalg.norm(E1) + 1e-12)
        d1 = sampson_distance(pts0, pts1, E1)
        z0, z1 = _depths_two_view(R1, t1, pts0, pts1)
        chei = (z0 > 0) & (z1 > 0)
        in1 = (d1 < thresh * thresh) & mask & chei
        sc1 = jnp.sum(jnp.where(in1, 1.0 - d1 / (thresh * thresh), 0.0))
        return E1, in1, sc1

    E_pol, inl_pol, sc_pol = jax.vmap(polish)(E_h[top_idx], inl[top_idx])
    best_k = jnp.argmax(sc_pol)
    raw_best = jnp.argmax(score)
    # fall back to the raw argmax only if every polished model scored zero
    use_pol = sc_pol[best_k] > 0.0
    E_best = jnp.where(use_pol, E_pol[best_k], E_h[raw_best])
    inliers = jnp.where(use_pol, inl_pol[best_k], inl[raw_best])

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
    # final manifold polish: GN on the weighted Sampson error over inliers
    # (the low-N precision cv2's float64 solver gets for free)
    R, t = refine_pose_sampson(
        R, t, pts0, pts1, inliers_final.astype(pts0.dtype), iters=5
    )
    E_gn = _skew(t) @ R
    E_gn = E_gn / (jnp.linalg.norm(E_gn) + 1e-12)
    d_gn = sampson_distance(pts0, pts1, E_gn)
    inl_gn = (d_gn < thresh * thresh) & mask
    use_gn = jnp.sum(inl_gn) >= jnp.sum(inliers_final)
    E_final = jnp.where(use_gn, E_gn, E_final)
    inliers_final = jnp.where(use_gn, inl_gn, inliers_final)
    num_inliers = jnp.sum(inliers_final).astype(jnp.int32)
    valid = (num_valid >= min_pts) & (num_inliers >= 5)
    return RansacResult(E=E_final, R=R, t=t, inliers=inliers_final,
                        num_inliers=num_inliers, valid=valid)
