"""Bundle adjustment with Schur-complement reduction, pure JAX.

Problem: cameras T_c (world->cam, se(3)-parameterized updates), points X_p,
observations (cam_idx, pt_idx, uv, mask) with normalized image coordinates.
Levenberg-Marquardt with the standard two-block structure:

    [U  W ] [dc]   [-g_c]
    [W^T V ] [dp] = [-g_p]

    S  = U - W V^-1 W^T        (reduced camera system, block-sparse)
    dc = solve(S, -g_c + W V^-1 g_p)
    dp = V^-1 (-g_p - W^T dc)

TPU design notes:
  * per-observation Jacobians come from one `jax.vmap(jax.jacfwd)` over the
    fixed-shape observation arrays (no per-camera python loops);
  * U, V, W, g are assembled with `segment_sum`-style scatters; the reduced
    system S is materialized densely over 6*Nc dims (camera counts in a BA
    window are small — tens) and solved with Cholesky;
  * the damping loop is a `lax.scan` of fixed length with accept/reject
    carried as state — jit-compatible LM;
  * gauge freedom: camera 0 is held fixed (its update rows are zeroed).

The observation axis shards cleanly across devices: partial U/V/W/g are
psum-reduced (see sfm/distributed.py), which is the Schur-block aggregation
the survey's multi-host plan calls for (SURVEY.md §7 step 7).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from featurematching_tpu.geometry.se3 import se3_exp


class BAProblem(NamedTuple):
    poses: jnp.ndarray  # [Nc, 4, 4] world->cam
    points: jnp.ndarray  # [Np, 3]
    cam_idx: jnp.ndarray  # [M] int32
    pt_idx: jnp.ndarray  # [M] int32
    uv: jnp.ndarray  # [M, 2] normalized image coords
    mask: jnp.ndarray  # [M] bool
    fix_cameras: int = 1  # number of leading cameras held fixed (gauge)


class BAResult(NamedTuple):
    poses: jnp.ndarray
    points: jnp.ndarray
    cost_history: jnp.ndarray  # [iters+1] masked mean squared residual
    num_obs: jnp.ndarray


def _project(pose: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """World point -> normalized image coords under world->cam pose."""
    Xc = pose[:3, :3] @ X + pose[:3, 3]
    z = jnp.where(jnp.abs(Xc[2]) < 1e-8, 1e-8, Xc[2])
    return Xc[:2] / z


def reprojection_residuals(
    poses: jnp.ndarray, points: jnp.ndarray, problem: BAProblem
) -> jnp.ndarray:
    """[M, 2] residuals (zeros at masked rows)."""
    def one(ci, pi, uv):
        return _project(poses[ci], points[pi]) - uv

    r = jax.vmap(one)(problem.cam_idx, problem.pt_idx, problem.uv)
    return jnp.where(problem.mask[:, None], r, 0.0)


def _residual_and_jacobians(poses, points, problem):
    """Per-observation residual [M,2] + J_cam [M,2,6] + J_pt [M,2,3].

    Camera jacobian is wrt a LEFT-multiplied se(3) increment:
    T <- exp(xi) @ T.
    """

    def obs_fn(xi, dX, pose, X, uv):
        T = se3_exp(xi) @ pose
        return _project(T, X + dX) - uv

    zeros6 = jnp.zeros(6)
    zeros3 = jnp.zeros(3)

    def one(ci, pi, uv):
        pose = poses[ci]
        X = points[pi]
        r = obs_fn(zeros6, zeros3, pose, X, uv)
        Jc = jax.jacfwd(obs_fn, argnums=0)(zeros6, zeros3, pose, X, uv)
        Jp = jax.jacfwd(obs_fn, argnums=1)(zeros6, zeros3, pose, X, uv)
        return r, Jc, Jp

    r, Jc, Jp = jax.vmap(one)(problem.cam_idx, problem.pt_idx, problem.uv)
    m = problem.mask[:, None]
    return (
        jnp.where(m, r, 0.0),
        jnp.where(m[..., None], Jc, 0.0),
        jnp.where(m[..., None], Jp, 0.0),
    )


def _assemble(r, Jc, Jp, problem, Nc, Np):
    """Normal-equation blocks via scatter-adds over the observation axis."""
    ci = problem.cam_idx
    pi = problem.pt_idx

    U = jnp.zeros((Nc, 6, 6)).at[ci].add(jnp.einsum("mki,mkj->mij", Jc, Jc))
    V = jnp.zeros((Np, 3, 3)).at[pi].add(jnp.einsum("mki,mkj->mij", Jp, Jp))
    g_c = jnp.zeros((Nc, 6)).at[ci].add(jnp.einsum("mki,mk->mi", Jc, r))
    g_p = jnp.zeros((Np, 3)).at[pi].add(jnp.einsum("mki,mk->mi", Jp, r))
    W_obs = jnp.einsum("mki,mkj->mij", Jc, Jp)  # [M, 6, 3]
    return U, V, g_c, g_p, W_obs


def _schur_solve(U, V, g_c, g_p, W_obs, problem, lam, Nc, Np):
    """Reduced camera solve + point back-substitution."""
    ci = problem.cam_idx
    pi = problem.pt_idx

    # damp V and invert the 3x3 blocks
    V_d = V + lam * jnp.eye(3)[None] * jnp.maximum(
        jnp.trace(V, axis1=1, axis2=2)[:, None, None] / 3.0, 1e-8
    )
    V_inv = jnp.linalg.inv(V_d + 1e-10 * jnp.eye(3)[None])

    # Schur cross terms couple cameras observing the same point:
    #   S_cross[a, b] = sum_p ( sum_{obs of p at a} W V_inv[p] )
    #                         ( sum_{obs of p at b} W )^T
    # Group observations into per-(point, camera) accumulators with one
    # scatter over flat (p * Nc + c) ids, then contract over points. For
    # window-BA sizes (Nc tens, Np thousands) the [Np, Nc, 6, 3] accumulators
    # are a few MB and the contraction is one MXU einsum.
    Y_obs = jnp.einsum("mij,mjk->mik", W_obs, V_inv[pi])  # [M, 6, 3]
    flat_ids = pi * Nc + ci
    W_pc = jnp.zeros((Np * Nc, 6, 3)).at[flat_ids].add(W_obs).reshape(Np, Nc, 6, 3)
    Y_pc = jnp.zeros((Np * Nc, 6, 3)).at[flat_ids].add(Y_obs).reshape(Np, Nc, 6, 3)

    # S_cross[a, b] = sum_p Y_pc[p, a] @ W_pc[p, b]^T
    S_cross = jnp.einsum("paij,pbkj->abik", Y_pc, W_pc)  # [Nc, Nc, 6, 6]

    U_d = U + lam * jnp.eye(6)[None] * jnp.maximum(
        jnp.trace(U, axis1=1, axis2=2)[:, None, None] / 6.0, 1e-8
    )
    S = -S_cross
    S = S.at[jnp.arange(Nc), jnp.arange(Nc)].add(U_d)

    # rhs: -g_c + sum_p Y_pc[p, c] @ g_p[p]
    rhs = -g_c + jnp.einsum("pcij,pj->ci", Y_pc, g_p)

    # gauge fixing: zero out rows/cols of fixed cameras, identity diagonal
    fix = jnp.arange(Nc) < problem.fix_cameras  # [Nc]
    fix_row = fix[:, None, None, None] | fix[None, :, None, None]
    S = jnp.where(fix_row, 0.0, S)
    S = S.at[jnp.arange(Nc), jnp.arange(Nc)].add(
        jnp.where(fix[:, None, None], jnp.eye(6)[None], 0.0)
    )
    rhs = jnp.where(fix[:, None], 0.0, rhs)

    # dense solve on [6Nc, 6Nc]
    S_dense = S.transpose(0, 2, 1, 3).reshape(Nc * 6, Nc * 6)
    dc = jnp.linalg.solve(
        S_dense + 1e-9 * jnp.eye(Nc * 6), rhs.reshape(Nc * 6)
    ).reshape(Nc, 6)

    # back-substitute points: dp = V^-1 (-g_p - sum_c W_pc[p,c]^T dc[c])
    Wt_dc = jnp.einsum("pcij,ci->pj", W_pc, dc)  # [Np, 3]
    dp = jnp.einsum("pij,pj->pi", V_inv, -g_p - Wt_dc)
    return dc, dp


def _cost(poses, points, problem):
    r = reprojection_residuals(poses, points, problem)
    n = jnp.maximum(jnp.sum(problem.mask), 1)
    return jnp.sum(r**2) / n


@functools.partial(jax.jit, static_argnames=("iters",))
def bundle_adjust(problem: BAProblem, iters: int = 10, init_lambda: float = 1e-3) -> BAResult:
    """Fixed-iteration LM bundle adjustment."""
    Nc = problem.poses.shape[0]
    Np = problem.points.shape[0]

    def lm_step(carry, _):
        poses, points, lam = carry
        r, Jc, Jp = _residual_and_jacobians(poses, points, problem)
        U, V, g_c, g_p, W_obs = _assemble(r, Jc, Jp, problem, Nc, Np)
        dc, dp = _schur_solve(U, V, g_c, g_p, W_obs, problem, lam, Nc, Np)

        new_poses = jax.vmap(lambda xi, T: se3_exp(xi) @ T)(dc, poses)
        new_points = points + dp

        old_cost = _cost(poses, points, problem)
        new_cost = _cost(new_poses, new_points, problem)
        accept = new_cost < old_cost
        poses = jnp.where(accept, new_poses, poses)
        points = jnp.where(accept, new_points, points)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        lam = jnp.clip(lam, 1e-9, 1e3)
        return (poses, points, lam), jnp.where(accept, new_cost, old_cost)

    init_cost = _cost(problem.poses, problem.points, problem)
    (poses, points, _), costs = jax.lax.scan(
        lm_step,
        (problem.poses, problem.points, jnp.asarray(init_lambda)),
        None,
        length=iters,
    )
    return BAResult(
        poses=poses,
        points=points,
        cost_history=jnp.concatenate([init_cost[None], costs]),
        num_obs=jnp.sum(problem.mask),
    )
