"""Epipolar geometry: essential matrices and point-to-epipolar-line distances.

Replaces the reference's kornia/torch epipolar math
(/root/reference/utils/metrics.py:33-76) with batched fixed-shape JAX.
"""

from __future__ import annotations

import jax.numpy as jnp


def cross_product_matrix(t: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> skew-symmetric [..., 3, 3] (kornia numeric.cross_product_matrix)."""
    zeros = jnp.zeros_like(t[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -t[..., 2], t[..., 1]], -1),
            jnp.stack([t[..., 2], zeros, -t[..., 0]], -1),
            jnp.stack([-t[..., 1], t[..., 0], zeros], -1),
        ],
        axis=-2,
    )


def essential_from_pose(T_0to1: jnp.ndarray) -> jnp.ndarray:
    """E = [t]_x @ R from a relative transform [..., 4, 4].

    Reference: utils/metrics.py:61-62 (`Tx @ R`).
    """
    R = T_0to1[..., :3, :3]
    t = T_0to1[..., :3, 3]
    return cross_product_matrix(t) @ R


def normalize_keypoints(kpts: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Pixel coords [..., N, 2] -> normalized camera coords, given K [..., 3, 3].

    Reference: utils/metrics.py:41-42 ((pts - c) / f).
    """
    cx = K[..., 0, 2][..., None]
    cy = K[..., 1, 2][..., None]
    fx = K[..., 0, 0][..., None]
    fy = K[..., 1, 1][..., None]
    x = (kpts[..., 0] - cx) / fx
    y = (kpts[..., 1] - cy) / fy
    return jnp.stack([x, y], axis=-1)


def _to_homogeneous(pts: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)


def symmetric_epipolar_distance(
    pts0: jnp.ndarray,
    pts1: jnp.ndarray,
    E: jnp.ndarray,
    K0: jnp.ndarray | None = None,
    K1: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Squared symmetric epipolar distance [..., N].

    Port of /root/reference/utils/metrics.py:33-53. If K0/K1 given, pts are
    pixel coords and get normalized first; otherwise they are already
    normalized camera coords.
    """
    if K0 is not None:
        pts0 = normalize_keypoints(pts0, K0)
    if K1 is not None:
        pts1 = normalize_keypoints(pts1, K1)
    p0 = _to_homogeneous(pts0).astype(jnp.float32)  # [..., N, 3]
    p1 = _to_homogeneous(pts1).astype(jnp.float32)
    Ep0 = jnp.einsum("...nj,...ij->...ni", p0, E)  # p0 @ E.T
    p1Ep0 = jnp.sum(p1 * Ep0, axis=-1)  # [..., N]
    Etp1 = jnp.einsum("...ni,...ij->...nj", p1, E)  # p1 @ E
    d = p1Ep0**2 * (
        1.0 / (Ep0[..., 0] ** 2 + Ep0[..., 1] ** 2 + 1e-12)
        + 1.0 / (Etp1[..., 0] ** 2 + Etp1[..., 1] ** 2 + 1e-12)
    )
    return d


def sampson_distance(
    pts0: jnp.ndarray, pts1: jnp.ndarray, E: jnp.ndarray
) -> jnp.ndarray:
    """First-order geometric (Sampson) distance [..., N] on normalized coords.

    Used as the RANSAC scoring function (OpenCV's findEssentialMat scores with
    Sampson error internally).
    """
    p0 = _to_homogeneous(pts0)
    p1 = _to_homogeneous(pts1)
    Ep0 = jnp.einsum("...nj,...ij->...ni", p0, E)
    Etp1 = jnp.einsum("...ni,...ij->...nj", p1, E)
    p1Ep0 = jnp.sum(p1 * Ep0, axis=-1)
    denom = Ep0[..., 0] ** 2 + Ep0[..., 1] ** 2 + Etp1[..., 0] ** 2 + Etp1[..., 1] ** 2
    return p1Ep0**2 / (denom + 1e-12)


def epipolar_errors_batch(
    mkpts0: jnp.ndarray,
    mkpts1: jnp.ndarray,
    T_0to1: jnp.ndarray,
    K0: jnp.ndarray,
    K1: jnp.ndarray,
) -> jnp.ndarray:
    """Batched symmetric epipolar error for padded match lists.

    mkpts*: [B, K, 2] pixel coords, T_0to1: [B, 4, 4], K*: [B, 3, 3] -> [B, K].
    Replaces the per-item python loop at utils/metrics.py:69-74 with one
    batched einsum chain.
    """
    E = essential_from_pose(T_0to1)  # [B, 3, 3]
    return symmetric_epipolar_distance(mkpts0, mkpts1, E, K0, K1)
