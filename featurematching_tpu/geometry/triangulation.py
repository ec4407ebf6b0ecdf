"""Two-view and multi-view linear triangulation (DLT) in batched JAX.

New capability relative to the reference (which never triangulates — it only
measures epipolar error); needed by the SfM back-end (BASELINE.json configs 4-5).
"""

from __future__ import annotations

import jax.numpy as jnp


def triangulate_linear(
    P0: jnp.ndarray, P1: jnp.ndarray, pts0: jnp.ndarray, pts1: jnp.ndarray
) -> jnp.ndarray:
    """DLT triangulation.

    Args:
      P0, P1: [..., 3, 4] projection matrices (K @ [R|t] or normalized [R|t]).
      pts0, pts1: [..., N, 2] image/normalized points.
    Returns:
      X: [..., N, 3] triangulated 3D points (euclidean).
    """
    # rows: x * P[2] - P[0],  y * P[2] - P[1]  for each view
    def two_rows(P, pts):
        p0 = P[..., 0, :][..., None, :]  # [..., 1, 4]
        p1 = P[..., 1, :][..., None, :]
        p2 = P[..., 2, :][..., None, :]
        x = pts[..., 0:1]  # [..., N, 1]
        y = pts[..., 1:2]
        return x * p2 - p0, y * p2 - p1  # each [..., N, 4]

    r0a, r0b = two_rows(P0, pts0)
    r1a, r1b = two_rows(P1, pts1)
    A = jnp.stack([r0a, r0b, r1a, r1b], axis=-2)  # [..., N, 4, 4]
    # null vector of A via SVD
    _, _, Vt = jnp.linalg.svd(A)
    Xh = Vt[..., -1, :]  # [..., N, 4]
    return Xh[..., :3] / (Xh[..., 3:4] + 1e-12)


def projection_from_pose(T: jnp.ndarray, K: jnp.ndarray | None = None) -> jnp.ndarray:
    """T [..., 4, 4] (world->cam) and optional K -> P [..., 3, 4]."""
    P = T[..., :3, :]
    if K is not None:
        P = K @ P
    return P


def reproject(X: jnp.ndarray, T: jnp.ndarray, K: jnp.ndarray | None = None) -> jnp.ndarray:
    """Project 3D points X [..., N, 3] through world->cam T; returns [..., N, 2]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Xc = jnp.einsum("...ij,...nj->...ni", R, X) + t[..., None, :]
    uv = Xc[..., :2] / (Xc[..., 2:3] + 1e-12)
    if K is not None:
        fx = K[..., 0, 0][..., None]
        fy = K[..., 1, 1][..., None]
        cx = K[..., 0, 2][..., None]
        cy = K[..., 1, 2][..., None]
        uv = jnp.stack([uv[..., 0] * fx + cx, uv[..., 1] * fy + cy], axis=-1)
    return uv
