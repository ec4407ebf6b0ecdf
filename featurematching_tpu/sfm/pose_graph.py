"""Pose-graph optimization over SE(3) in pure JAX.

Nodes are world->cam poses; edges carry relative measurements Z_ij ≈
T_j T_i^-1 (the transform mapping cam-i coordinates to cam-j coordinates,
matching the matcher's T_0to1 convention). Residuals are
se3_log(Z_ij^-1 T_j T_i^-1) and the fixed-iteration Gauss-Newton solve uses a
dense [6N, 6N] system (pose graphs here are keyframe-scale). Gauge: node 0
fixed.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from featurematching_tpu.geometry.se3 import invert_se3, se3_exp, se3_log


class PoseGraph(NamedTuple):
    poses: jnp.ndarray  # [N, 4, 4]
    edge_i: jnp.ndarray  # [E] int32
    edge_j: jnp.ndarray  # [E] int32
    measurements: jnp.ndarray  # [E, 4, 4] Z_ij
    weights: jnp.ndarray  # [E] edge information weight (0 disables an edge)


def _edge_residual(T_i, T_j, Z):
    return se3_log(invert_se3(Z) @ (T_j @ invert_se3(T_i)))  # [6]


def graph_residuals(poses: jnp.ndarray, graph: PoseGraph) -> jnp.ndarray:
    def one(i, j, Z, w):
        return _edge_residual(poses[i], poses[j], Z) * w

    return jax.vmap(one)(
        graph.edge_i, graph.edge_j, graph.measurements, graph.weights
    )


@functools.partial(jax.jit, static_argnames=("iters",))
def optimize_pose_graph(graph: PoseGraph, iters: int = 10, damping: float = 1e-6):
    """Fixed-iteration Gauss-Newton. Returns (poses, cost_history)."""
    N = graph.poses.shape[0]
    E = graph.edge_i.shape[0]

    def residual_with_delta(xi_i, xi_j, T_i, T_j, Z, w):
        return _edge_residual(se3_exp(xi_i) @ T_i, se3_exp(xi_j) @ T_j, Z) * w

    zeros6 = jnp.zeros(6)

    def gn_step(carry, _):
        poses, prev_cost = carry

        def one(i, j, Z, w):
            T_i, T_j = poses[i], poses[j]
            r = residual_with_delta(zeros6, zeros6, T_i, T_j, Z, w)
            Ji = jax.jacfwd(residual_with_delta, argnums=0)(
                zeros6, zeros6, T_i, T_j, Z, w
            )
            Jj = jax.jacfwd(residual_with_delta, argnums=1)(
                zeros6, zeros6, T_i, T_j, Z, w
            )
            return r, Ji, Jj

        r, Ji, Jj = jax.vmap(one)(
            graph.edge_i, graph.edge_j, graph.measurements, graph.weights
        )  # [E, 6], [E, 6, 6] x2

        # assemble H [N, N, 6, 6] and b [N, 6] with scatters
        H = jnp.zeros((N * N, 6, 6))
        ii = graph.edge_i * N + graph.edge_i
        jj = graph.edge_j * N + graph.edge_j
        ij = graph.edge_i * N + graph.edge_j
        ji = graph.edge_j * N + graph.edge_i
        H = H.at[ii].add(jnp.einsum("eki,ekj->eij", Ji, Ji))
        H = H.at[jj].add(jnp.einsum("eki,ekj->eij", Jj, Jj))
        H = H.at[ij].add(jnp.einsum("eki,ekj->eij", Ji, Jj))
        H = H.at[ji].add(jnp.einsum("eki,ekj->eij", Jj, Ji))
        H = H.reshape(N, N, 6, 6)
        b = jnp.zeros((N, 6))
        b = b.at[graph.edge_i].add(jnp.einsum("eki,ek->ei", Ji, r))
        b = b.at[graph.edge_j].add(jnp.einsum("eki,ek->ei", Jj, r))

        # gauge: fix node 0
        fix = jnp.arange(N) < 1
        fix_rc = fix[:, None, None, None] | fix[None, :, None, None]
        H = jnp.where(fix_rc, 0.0, H)
        H = H.at[jnp.arange(N), jnp.arange(N)].add(
            jnp.where(fix[:, None, None], jnp.eye(6)[None], 0.0)
        )
        b = jnp.where(fix[:, None], 0.0, b)

        H_dense = H.transpose(0, 2, 1, 3).reshape(N * 6, N * 6)
        dx = jnp.linalg.solve(
            H_dense + damping * jnp.eye(N * 6), -b.reshape(N * 6)
        ).reshape(N, 6)

        new_poses = jax.vmap(lambda xi, T: se3_exp(xi) @ T)(dx, poses)
        new_cost = jnp.sum(graph_residuals(new_poses, graph) ** 2)
        old_cost = jnp.sum(graph_residuals(poses, graph) ** 2)
        accept = new_cost < old_cost
        poses = jnp.where(accept, new_poses, poses)
        return (poses, jnp.where(accept, new_cost, old_cost)), jnp.where(
            accept, new_cost, old_cost
        )

    init_cost = jnp.sum(graph_residuals(graph.poses, graph) ** 2)
    (poses, _), costs = jax.lax.scan(
        gn_step, (graph.poses, init_cost), None, length=iters
    )
    return poses, jnp.concatenate([init_cost[None], costs])
