"""Multi-chip distributed bundle adjustment via observation sharding.

The BA normal-equation blocks are sums over observations, so the observation
axis is the natural parallel axis (SURVEY.md §7 step 7: "distributed BA via
psum/all-gather of Schur blocks"). Each device:

  1. holds a 1/D shard of (cam_idx, pt_idx, uv, mask),
  2. computes residuals/jacobians for its shard,
  3. scatter-assembles PARTIAL U, V, g_c, g_p and the per-(point, camera)
     W accumulators,
  4. `psum`s them over the 'data' axis — the Schur-block aggregation ride on
     ICI collectives,
  5. every device then solves the (replicated, small) reduced camera system
     and applies identical updates.

Implemented with `jax.shard_map` so the collectives are explicit; the update
loop stays bitwise identical to the single-chip `bundle_adjust` given the
same observations (verified in tests on the virtual CPU mesh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from featurematching_tpu.geometry.se3 import se3_exp
from featurematching_tpu.sfm.ba import (
    BAProblem,
    BAResult,
    _assemble,
    _cost,
    _residual_and_jacobians,
    _schur_solve,
)


def _pad_observations(problem: BAProblem, n_shards: int) -> BAProblem:
    """Pad the observation axis to a multiple of n_shards (masked rows)."""
    M = problem.cam_idx.shape[0]
    pad = (-M) % n_shards
    if pad == 0:
        return problem
    return problem._replace(
        cam_idx=jnp.pad(problem.cam_idx, (0, pad)),
        pt_idx=jnp.pad(problem.pt_idx, (0, pad)),
        uv=jnp.pad(problem.uv, ((0, pad), (0, 0))),
        mask=jnp.pad(problem.mask, (0, pad)),
    )


def bundle_adjust_sharded(
    problem: BAProblem,
    mesh: Mesh,
    iters: int = 10,
    init_lambda: float = 1e-3,
    axis: str = "data",
) -> BAResult:
    """Distributed LM bundle adjustment over `mesh`'s `axis`."""
    n_shards = mesh.shape[axis]
    problem = _pad_observations(problem, n_shards)
    Nc = problem.poses.shape[0]
    Np = problem.points.shape[0]

    obs_spec = P(axis)
    rep = P()

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(rep, rep, obs_spec, obs_spec, obs_spec, obs_spec, rep),
        out_specs=(rep, rep, rep),
        check_vma=False,
    )
    def lm_iterations(poses, points, cam_idx, pt_idx, uv, mask, lam0):
        shard = BAProblem(
            poses=poses, points=points, cam_idx=cam_idx, pt_idx=pt_idx,
            uv=uv, mask=mask, fix_cameras=problem.fix_cameras,
        )

        def shard_cost(po, pt):
            local = jnp.sum(
                jnp.where(
                    mask[:, None],
                    jax.vmap(
                        lambda ci, pi, u: _project_pose(po[ci], pt[pi]) - u
                    )(cam_idx, pt_idx, uv),
                    0.0,
                )
                ** 2
            )
            total = jax.lax.psum(local, axis)
            n = jax.lax.psum(jnp.sum(mask), axis)
            return total / jnp.maximum(n, 1)

        def lm_step(carry, _):
            poses_c, points_c, lam = carry
            r, Jc, Jp = _residual_and_jacobians(poses_c, points_c, shard)
            U, V, g_c, g_p, W_obs = _assemble(r, Jc, Jp, shard, Nc, Np)
            # --- Schur-block aggregation over ICI
            U = jax.lax.psum(U, axis)
            V = jax.lax.psum(V, axis)
            g_c = jax.lax.psum(g_c, axis)
            g_p = jax.lax.psum(g_p, axis)
            # W accumulators are built per-device inside _schur_solve from
            # W_obs; psum the grouped per-(point,camera) form instead:
            dc, dp = _schur_solve_psum(
                U, V, g_c, g_p, W_obs, shard, lam, Nc, Np, axis
            )
            new_poses = jax.vmap(lambda xi, T: se3_exp(xi) @ T)(dc, poses_c)
            new_points = points_c + dp
            old_cost = shard_cost(poses_c, points_c)
            new_cost = shard_cost(new_poses, new_points)
            accept = new_cost < old_cost
            poses_c = jnp.where(accept, new_poses, poses_c)
            points_c = jnp.where(accept, new_points, points_c)
            lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e3)
            return (poses_c, points_c, lam), jnp.where(accept, new_cost, old_cost)

        (poses_f, points_f, _), costs = jax.lax.scan(
            lm_step, (poses, points, lam0), None, length=iters
        )
        return poses_f, points_f, costs

    poses, points, costs = lm_iterations(
        problem.poses,
        problem.points,
        problem.cam_idx,
        problem.pt_idx,
        problem.uv,
        problem.mask,
        jnp.asarray(init_lambda),
    )
    init_cost = _cost(problem.poses, problem.points, problem)
    return BAResult(
        poses=poses,
        points=points,
        cost_history=jnp.concatenate([init_cost[None], costs]),
        num_obs=jnp.sum(problem.mask),
    )


def _project_pose(pose, X):
    Xc = pose[:3, :3] @ X + pose[:3, 3]
    z = jnp.where(jnp.abs(Xc[2]) < 1e-8, 1e-8, Xc[2])
    return Xc[:2] / z


def _schur_solve_psum(U, V, g_c, g_p, W_obs, shard, lam, Nc, Np, axis):
    """Like ba._schur_solve but with the per-(point, camera) W/Y accumulators
    psum-reduced before the reduced-system assembly."""
    ci = shard.cam_idx
    pi = shard.pt_idx

    V_d = V + lam * jnp.eye(3)[None] * jnp.maximum(
        jnp.trace(V, axis1=1, axis2=2)[:, None, None] / 3.0, 1e-8
    )
    V_inv = jnp.linalg.inv(V_d + 1e-10 * jnp.eye(3)[None])

    Y_obs = jnp.einsum("mij,mjk->mik", W_obs, V_inv[pi])
    flat_ids = pi * Nc + ci
    W_pc = jnp.zeros((Np * Nc, 6, 3)).at[flat_ids].add(W_obs).reshape(Np, Nc, 6, 3)
    Y_pc = jnp.zeros((Np * Nc, 6, 3)).at[flat_ids].add(Y_obs).reshape(Np, Nc, 6, 3)
    W_pc = jax.lax.psum(W_pc, axis)
    Y_pc = jax.lax.psum(Y_pc, axis)

    S_cross = jnp.einsum("paij,pbkj->abik", Y_pc, W_pc)
    U_d = U + lam * jnp.eye(6)[None] * jnp.maximum(
        jnp.trace(U, axis1=1, axis2=2)[:, None, None] / 6.0, 1e-8
    )
    S = -S_cross
    S = S.at[jnp.arange(Nc), jnp.arange(Nc)].add(U_d)
    rhs = -g_c + jnp.einsum("pcij,pj->ci", Y_pc, g_p)

    fix = jnp.arange(Nc) < shard.fix_cameras
    fix_row = fix[:, None, None, None] | fix[None, :, None, None]
    S = jnp.where(fix_row, 0.0, S)
    S = S.at[jnp.arange(Nc), jnp.arange(Nc)].add(
        jnp.where(fix[:, None, None], jnp.eye(6)[None], 0.0)
    )
    rhs = jnp.where(fix[:, None], 0.0, rhs)

    S_dense = S.transpose(0, 2, 1, 3).reshape(Nc * 6, Nc * 6)
    dc = jnp.linalg.solve(
        S_dense + 1e-9 * jnp.eye(Nc * 6), rhs.reshape(Nc * 6)
    ).reshape(Nc, 6)

    Wt_dc = jnp.einsum("pcij,ci->pj", W_pc, dc)
    dp = jnp.einsum("pij,pj->pi", V_inv, -g_p - Wt_dc)
    return dc, dp
