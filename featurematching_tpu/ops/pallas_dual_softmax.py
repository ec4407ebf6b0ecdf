"""Fused dual-softmax mutual-NN matching statistics — Pallas TPU kernels.

The coarse matcher needs, per pair, the row-wise and column-wise argmax/max of

    conf = softmax_rows(sim) * softmax_cols(sim),   sim = f0 f1^T / (C*T)

The XLA path (matching/coarse.py) materializes conf: a [4800, 4800] fp32
matrix is 92 MB/pair and makes ~6 HBM round trips through the two softmaxes
and the reductions. These kernels never materialize conf in HBM:

  pass 1 (`_stats_kernel`): per row-tile, sim is computed on the MXU from
    VMEM-resident features and reduced to row max/sum-exp; per-tile partial
    column max/sum-exp are emitted and flash-combined across tiles in XLA.
  pass 2 (`_conf_kernel`): sim is recomputed per tile; conf follows from
    conf[i,j] = exp(2*sim - m_r[i] - m_c[j]) / (Z_r[i] * Z_c[j]) and is
    reduced to row/col max + argmax without ever leaving VMEM.

HBM traffic drops from ~550 MB to ~5 MB per pair at the cost of one extra
sim matmul pass (2 x 11.8 GFLOP, MXU-shaped [TL,256]@[256,4800]).

`dual_softmax_match_stats(...)` is the public entry; it dispatches to the
kernels on TPU and to a jnp reference everywhere else (also used by tests
via interpret mode).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class MatchStats(NamedTuple):
    """Per-pair dual-softmax statistics, no [L, S] materialization.

    row_max: [B, L] max_j conf[i, j]
    row_argmax: [B, L] argmax_j conf[i, j]
    col_max: [B, S] max_i conf[i, j]
    col_argmax: [B, S] argmax_i conf[i, j]
    """

    row_max: jnp.ndarray
    row_argmax: jnp.ndarray
    col_max: jnp.ndarray
    col_argmax: jnp.ndarray


# ---------------------------------------------------------------------------
# reference implementation (jnp) — ground truth for tests, CPU fallback
# ---------------------------------------------------------------------------

def _stats_reference(
    feat0: jnp.ndarray, feat1: jnp.ndarray, inv_temp: float
) -> MatchStats:
    sim = jnp.einsum(
        "blc,bsc->bls", feat0, feat1, preferred_element_type=jnp.float32
    ) * inv_temp
    conf = jax.nn.softmax(sim, axis=1) * jax.nn.softmax(sim, axis=2)
    return MatchStats(
        row_max=jnp.max(conf, axis=2),
        row_argmax=jnp.argmax(conf, axis=2).astype(jnp.int32),
        col_max=jnp.max(conf, axis=1),
        col_argmax=jnp.argmax(conf, axis=1).astype(jnp.int32),
    )


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _stats_kernel(f0_ref, f1_ref, rowm_ref, rowz_ref, colm_ref, colz_ref):
    """Row softmax stats for one row-tile + partial col stats.

    f0_ref: [TL, C] row-tile; f1_ref: [S, C] full second image.
    rowm/rowz: [n_tiles, TL] buffers — this grid step writes row i_tile.
    colm/colz: [n_tiles, S] per-tile partial col max / shifted sum-exp.
    (Outputs carry the full n_tiles axis because Mosaic requires the last two
    block dims be /8-/128 or full-size — a squeezed tile axis is neither.)
    """
    i = pl.program_id(1)
    sim = jax.lax.dot_general(
        f0_ref[...],
        f1_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TL, S]
    row_m = jnp.max(sim, axis=1)
    rowm_ref[i, :] = row_m
    rowz_ref[i, :] = jnp.sum(jnp.exp(sim - row_m[:, None]), axis=1)
    col_m = jnp.max(sim, axis=0)
    colm_ref[i, :] = col_m
    colz_ref[i, :] = jnp.sum(jnp.exp(sim - col_m[None, :]), axis=0)


def _conf_kernel(
    f0_ref, f1_ref, rowstat_ref, colstat_ref,
    rowmax_ref, rowarg_ref, colmax_ref, colarg_ref,
):
    """Fused conf reduction for one row-tile.

    rowstat_ref: [n_tiles, 2, TL] ([m_r; logZ_r] per tile); colstat_ref:
    [2, S]. Outputs indexed at row i_tile: rowmax/rowarg [n_tiles, TL],
    colmax/colarg [n_tiles, S] (per-tile partials).
    """
    i_tile = pl.program_id(1)
    TL = rowmax_ref.shape[1]

    sim = jax.lax.dot_general(
        f0_ref[...],
        f1_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TL, S]
    m_r = rowstat_ref[i_tile, 0, :]
    logz_r = rowstat_ref[i_tile, 1, :]
    m_c = colstat_ref[0, :]
    logz_c = colstat_ref[1, :]
    # log conf = 2*sim - (m_r + logZ_r) - (m_c + logZ_c)
    logconf = (
        2.0 * sim
        - (m_r + logz_r)[:, None]
        - (m_c + logz_c)[None, :]
    )
    conf = jnp.exp(logconf)

    rowmax_ref[i_tile, :] = jnp.max(conf, axis=1)
    rowarg_ref[i_tile, :] = jnp.argmax(conf, axis=1).astype(jnp.int32)
    colmax_ref[i_tile, :] = jnp.max(conf, axis=0)
    # col argmax is local to this row-tile; shift to global row ids
    colarg_ref[i_tile, :] = jnp.argmax(conf, axis=0).astype(jnp.int32) + i_tile * TL


try:  # import guarded so CPU-only environments can still import the module
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def dual_softmax_match_stats(
    feat0: jnp.ndarray,
    feat1: jnp.ndarray,
    temperature: float = 0.1,
    impl: str = "auto",
    row_tile: int = 512,
    interpret: bool = False,
) -> MatchStats:
    """Row/col max+argmax of the dual-softmax confidence, fused on TPU.

    feat*: [B, L/S, C] pre-normalized features (the 1/sqrt(C) scaling of
    coarse_matching_new.py:64 is folded into inv_temp here).
    """
    C = feat0.shape[-1]
    inv_temp = 1.0 / (C * temperature)
    if impl == "auto":
        impl = "pallas" if (
            _HAS_PALLAS and jax.default_backend() not in ("cpu",)
        ) else "xla"
    if impl == "xla":
        return _stats_reference(feat0, feat1, inv_temp)
    return _pallas_forward(feat0, feat1, inv_temp, row_tile, interpret)


# trace-time tunable (benchmarks/chunk_sweep.py): pass-1/2 row-tile target.
# The sim tile is [row_tile, S] f32 in VMEM; _vmem_params raises the Mosaic
# limit automatically when a bigger tile needs it.
TUNE = {"row_tile": 512}


def _pick_row_tile(L: int, max_tile: int) -> int:
    """Largest divisor of L that is <= max_tile and a multiple of 8 (fp32
    sublane), falling back to any divisor."""
    for t in range(min(max_tile, L), 7, -1):
        if L % t == 0 and t % 8 == 0:
            return t
    for t in range(min(max_tile, L), 0, -1):
        if L % t == 0:
            return t
    return L


def _vmem_params(row_tile, n_tiles, S, C):
    """Mosaic scoped-VMEM limit for one grid step, when the default 16 MB is
    not enough (the highres/sharded points: row_tile x S f32 sim tiles plus
    the [n_tiles, S] col-stat partials the out_specs keep resident). v5e has
    128 MB VMEM; raising the limit only when needed keeps the common 4800-
    token case on the default (better double-buffering headroom)."""
    need = 4 * (
        2 * row_tile * S  # sim + exp intermediate
        + 2 * n_tiles * S  # col-stat partial outputs (full block resident)
        + 4 * n_tiles * row_tile  # row stat/max/arg outputs
        + 2 * S  # col_stat input (pass 2)
    ) + 2 * C * (row_tile + S)  # bf16 feature inputs
    if need <= 14 * 1024 * 1024:
        return None
    limit = min(int(need * 1.5), 110 * 1024 * 1024)
    return pltpu.CompilerParams(vmem_limit_bytes=limit)


def _pass1_stats(f0, f1, row_tile, interpret):
    """Pass 1 over a (local) S extent: returns rowm/rowz [B, L] (rowz shifted
    by the LOCAL row max) and combined col stats colm/colz [B, S].
    f0 must already carry the inv_temp scaling."""
    B, L, C = f0.shape
    S = f1.shape[1]
    n_tiles = L // row_tile

    # NOTE on output shapes: Mosaic requires the last block dim be /128 or the
    # full array dim. row_tile (480 for L=4800) is neither, so all per-row
    # outputs/inputs are shaped [B, n_tiles, row_tile] (last dim = full) and
    # flattened to [B, L] afterwards in XLA.
    rowm, rowz, colm_p, colz_p = pl.pallas_call(
        _stats_kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((None, row_tile, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, S, C), lambda b, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, n_tiles, row_tile), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, n_tiles, row_tile), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, n_tiles, S), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, n_tiles, S), lambda b, i: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_tiles, row_tile), jnp.float32),
            jax.ShapeDtypeStruct((B, n_tiles, row_tile), jnp.float32),
            jax.ShapeDtypeStruct((B, n_tiles, S), jnp.float32),
            jax.ShapeDtypeStruct((B, n_tiles, S), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _vmem_params(row_tile, n_tiles, S, C),
    )(f0, f1)

    # flash-combine partial col stats across row tiles (tiny, XLA)
    colm = jnp.max(colm_p, axis=1)  # [B, S]
    colz = jnp.sum(colz_p * jnp.exp(colm_p - colm[:, None, :]), axis=1)
    return rowm.reshape(B, L), rowz.reshape(B, L), colm, colz


def _pass2_conf(f0, f1, lse_r, col_stat, row_tile, interpret):
    """Pass 2: fused conf reductions given FINAL row logsumexp lse_r [B, L]
    and col_stat [B, 2, S]. Returns (rowmax, rowarg [B, L]; colmax, colarg
    [B, S] — col argmax in GLOBAL row ids)."""
    B, L, C = f0.shape
    S = f1.shape[1]
    n_tiles = L // row_tile
    # pass-2 kernel reads [m_r; logZ_r] and uses their SUM — feed (lse_r, 0)
    zeros = jnp.zeros_like(lse_r)
    row_stat = jnp.stack(
        [lse_r.reshape(B, n_tiles, row_tile), zeros.reshape(B, n_tiles, row_tile)],
        axis=2,
    )

    rowmax, rowarg, colmax_p, colarg_p = pl.pallas_call(
        _conf_kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((None, row_tile, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, S, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, n_tiles, 2, row_tile), lambda b, i: (b, 0, 0, 0)),
            pl.BlockSpec((None, 2, S), lambda b, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, n_tiles, row_tile), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, n_tiles, row_tile), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, n_tiles, S), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, n_tiles, S), lambda b, i: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_tiles, row_tile), jnp.float32),
            jax.ShapeDtypeStruct((B, n_tiles, row_tile), jnp.int32),
            jax.ShapeDtypeStruct((B, n_tiles, S), jnp.float32),
            jax.ShapeDtypeStruct((B, n_tiles, S), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _vmem_params(row_tile, n_tiles, S, C),
    )(f0, f1, row_stat, col_stat)
    rowmax = rowmax.reshape(B, L)
    rowarg = rowarg.reshape(B, L)

    # combine col argmax across row tiles
    best_tile = jnp.argmax(colmax_p, axis=1)  # [B, S]
    colmax = jnp.take_along_axis(colmax_p, best_tile[:, None, :], axis=1)[:, 0]
    colarg = jnp.take_along_axis(colarg_p, best_tile[:, None, :], axis=1)[:, 0]
    return rowmax, rowarg, colmax, colarg


@functools.partial(jax.jit, static_argnames=("row_tile", "interpret"))
def _pallas_forward(feat0, feat1, inv_temp, row_tile=512, interpret=False):
    B, L, C = feat0.shape
    if row_tile == 512:  # default: honor the TUNE override
        row_tile = TUNE["row_tile"]
    row_tile = _pick_row_tile(L, row_tile)
    f0 = (feat0.astype(jnp.float32) * inv_temp).astype(feat0.dtype)
    f1 = feat1

    rowm, rowz, colm, colz = _pass1_stats(f0, f1, row_tile, interpret)
    lse_r = rowm + jnp.log(rowz)
    col_stat = jnp.stack([colm, jnp.log(colz)], axis=1)
    rowmax, rowarg, colmax, colarg = _pass2_conf(
        f0, f1, lse_r, col_stat, row_tile, interpret
    )
    return MatchStats(
        row_max=rowmax, row_argmax=rowarg, col_max=colmax, col_argmax=colarg
    )
