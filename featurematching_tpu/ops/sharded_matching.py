"""Sequence-parallel dual-softmax matching over the mesh 'model' axis.

The [L, S] correlation volume is the memory/compute hot spot as resolution
grows (SURVEY.md §5 long-context notes: "sharding the L or S axis of the
correlation volume across chips ... is the natural sequence-parallel
generalization"). This module shards the S axis (image-1 tokens):

  * each device holds f1's S/D shard and ALL of f0 (f0 is small: L*C),
  * local sim tile [L, S/D] -> local row max / sum-exp -> combined with
    `pmax`/`psum` (flash-style merge over ICI),
  * col stats and col argmax are purely local to the shard,
  * the global row argmax is recovered by offsetting local argmaxes and
    selecting the shard holding the global max.

The result equals the single-device MatchStats bit-for-fp32-bit; verified on
the virtual CPU mesh in tests. On a real multi-chip slice the sim tiles ride
each chip's MXU and only O(L) statistics cross the ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from featurematching_tpu.ops.pallas_dual_softmax import (
    _HAS_PALLAS,
    MatchStats,
    _pass1_stats,
    _pass2_conf,
    _pick_row_tile,
)


def dual_softmax_match_stats_sharded(
    feat0: jnp.ndarray,
    feat1: jnp.ndarray,
    mesh: Mesh,
    temperature: float = 0.1,
    axis: str = "model",
    batch_axis: str = None,
    impl: str = "auto",
    row_tile: int = 512,
    interpret: bool = False,
) -> MatchStats:
    """MatchStats with the S axis of the correlation sharded over `axis`.

    feat0: [B, L, C], feat1: [B, S, C] (sharded on S over `axis`).
    S must be divisible by the axis size. When `batch_axis` is given (e.g.
    'data' inside a jit whose batch rides the 'data' mesh axis), B is kept
    sharded over it — the collectives then only cross the 'model' submesh and
    no batch resharding is inserted.

    impl='pallas' (auto on TPU): each shard runs the SAME fused two-pass
    kernels as the single-device path (ops/pallas_dual_softmax) over its
    [L, S/D] tile — the per-shard sim/logconf are never materialized in HBM
    (round-3 wiring held ~L*S/D*4 B/chip of XLA f32 temps; at the
    highres_eval point that was ~0.7 GB/pair/chip). Only the O(L) row
    statistics cross the ICI (flash merge), exactly as before.
    impl='xla': the previous einsum formulation (CPU-mesh reference).
    """
    C = feat0.shape[-1]
    inv_temp = 1.0 / (C * temperature)
    D = mesh.shape[axis]
    S = feat1.shape[1]
    assert S % D == 0, (S, D)
    S_local = S // D
    ba = batch_axis
    if ba is not None:
        assert feat0.shape[0] % mesh.shape[ba] == 0, (feat0.shape, mesh.shape)
    if impl == "auto":
        impl = "pallas" if (
            _HAS_PALLAS and jax.default_backend() not in ("cpu",)
        ) else "xla"

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(ba), P(ba, axis, None)),
        out_specs=(P(ba), P(ba), P(ba, axis), P(ba, axis)),
        check_vma=False,
    )
    def stats_fused(f0, f1_local):
        # f0: [B, L, C] full; f1_local: [B, S_local, C]
        L = f0.shape[1]
        # VMEM cap: the kernels hold one [tile, S_local] f32 sim block —
        # keep it ~<= 8 MB (16 MB scoped budget with double buffering)
        cap = max(8, ((8 << 20) // (S_local * 4)) // 8 * 8)
        tile = _pick_row_tile(L, min(row_tile, cap))
        f0s = (f0.astype(jnp.float32) * inv_temp).astype(f0.dtype)

        # pass 1 per shard (fused, no [L, S_local] in HBM), flash row merge
        rowm_loc, rowz_loc, colm, colz = _pass1_stats(
            f0s, f1_local, tile, interpret
        )
        m_glob = jax.lax.pmax(rowm_loc, axis)
        z_glob = jax.lax.psum(rowz_loc * jnp.exp(rowm_loc - m_glob), axis)
        lse_r = m_glob + jnp.log(z_glob)
        col_stat = jnp.stack([colm, jnp.log(colz)], axis=1)

        # pass 2 per shard with the GLOBAL row stats; col outputs stay local
        row_max_loc, row_arg_loc, col_max, col_arg = _pass2_conf(
            f0s, f1_local, lse_r, col_stat, tile, interpret
        )

        shard_idx = jax.lax.axis_index(axis)
        row_arg_loc = row_arg_loc + shard_idx * S_local
        row_max_glob = jax.lax.pmax(row_max_loc, axis)
        is_best = row_max_loc >= row_max_glob
        # resolve ties deterministically to the LOWEST winning column id
        row_arg_glob = jax.lax.pmin(
            jnp.where(is_best, row_arg_loc, jnp.iinfo(jnp.int32).max), axis
        )
        return row_max_glob, row_arg_glob, col_max, col_arg

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(ba), P(ba, axis, None)),
        out_specs=(P(ba), P(ba), P(ba, axis), P(ba, axis)),
        check_vma=False,
    )
    def stats_xla(f0, f1_local):
        # f0: [B, L, C] full; f1_local: [B, S_local, C]
        sim = jnp.einsum(
            "blc,bsc->bls",
            f0.astype(jnp.float32) * inv_temp,
            f1_local.astype(jnp.float32),
        )  # [B, L, S_local]

        # --- row stats: flash-merge across shards
        m_loc = jnp.max(sim, axis=2)  # [B, L]
        m_glob = jax.lax.pmax(m_loc, axis)
        z_loc = jnp.sum(jnp.exp(sim - m_glob[..., None]), axis=2)
        z_glob = jax.lax.psum(z_loc, axis)
        lse_r = m_glob + jnp.log(z_glob)

        # --- col stats: local to the shard
        m_c = jnp.max(sim, axis=1)  # [B, S_local]
        z_c = jnp.sum(jnp.exp(sim - m_c[:, None, :]), axis=1)
        lse_c = m_c + jnp.log(z_c)

        # --- conf reductions: log conf = 2 sim - lse_r - lse_c
        logconf = 2.0 * sim - lse_r[..., None] - lse_c[:, None, :]

        shard_idx = jax.lax.axis_index(axis)
        offset = shard_idx * S_local

        # rows: local best then global merge (argmax follows the max's shard)
        row_max_loc = jnp.max(logconf, axis=2)
        row_arg_loc = jnp.argmax(logconf, axis=2).astype(jnp.int32) + offset
        row_max_glob = jax.lax.pmax(row_max_loc, axis)
        is_best = row_max_loc >= row_max_glob
        # resolve ties deterministically to the LOWEST winning column id
        row_arg_glob = jax.lax.pmin(
            jnp.where(is_best, row_arg_loc, jnp.iinfo(jnp.int32).max), axis
        )

        # cols: fully local
        col_max = jnp.max(logconf, axis=1)
        col_arg = jnp.argmax(logconf, axis=1).astype(jnp.int32)

        return (
            jnp.exp(row_max_glob),
            row_arg_glob,
            jnp.exp(col_max),
            col_arg,
        )

    fn = stats_fused if impl == "pallas" else stats_xla
    row_max, row_arg, col_max, col_arg = fn(feat0, feat1)
    return MatchStats(
        row_max=row_max, row_argmax=row_arg, col_max=col_max, col_argmax=col_arg
    )
