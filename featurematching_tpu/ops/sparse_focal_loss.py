"""Sparse dual-softmax focal loss WITHOUT materializing the [L, S] confidence
matrix — forward via row/col logsumexp tiles, backward via a custom VJP.

The training loss (sparse_spvs=True, the reference default) only needs the
confidence at GT positions:

    log conf[i,j] = 2*sim[i,j] - lse_row(i) - lse_col(j)
    sim = f0 f1^T * inv_temp,  lse_* = logsumexp over rows/cols

The XLA path (losses/loss.py) materializes conf (B*92 MB at 640x480) in both
the forward and backward graphs. Here:

  forward:  row/col logsumexps (flash-style tiles — reuses the Pallas stats
            kernel's pass-1 math) + a [G]-sized gather of sim at GT pairs.
  backward: d sim decomposes into a sparse direct term at GT pairs plus
            rank-structured softmax terms:
                dsim[i,j] = 2*g[i,j]                       (sparse, GT only)
                          - a_r[i] * softmax_row(i)[j]
                          - a_c[j] * softmax_col(j)[i]
            with a_r/a_c the per-row/col sums of upstream grads. df0/df1 then
            follow by one tiled matmul pass each — sim is recomputed per tile
            and never stored.

Everything here is jnp; XLA fuses the per-tile exp/matmul chain (a lax.map
over row tiles keeps peak memory at [tile, S]). A dedicated Pallas backward
kernel is a further option; the tiled XLA version already removes the
materialization and is differentiable-correctness-tested against the naive
loss.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _dot_f32(a, b, dims):
    """dot_general in the OPERAND dtype with f32 accumulation — on TPU a
    bf16xbf16->f32 MXU pass (1 pass vs ~6 for upcast-to-f32 matmuls; the
    products of bf16 values are exact in f32, so only the accumulation
    order differs from an f32 matmul of the same values)."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=dims, preferred_element_type=jnp.float32
    )


def _logsumexps(f0, f1, inv_temp, tile=512):
    """Row and col logsumexps of sim without materializing [L, S].

    f0: [L, C], f1: [S, C] (single pair, ORIGINAL dtype — the tile matmuls
    run in that dtype with f32 accumulation). Returns (lse_r [L], lse_c [S]).
    """
    L, C = f0.shape
    S = f1.shape[0]
    n = -(-L // tile)
    pad = n * tile - L
    f0p = jnp.pad(f0, ((0, pad), (0, 0)))
    row_valid = (jnp.arange(n * tile) < L).reshape(n, tile)

    def body(args):
        f0_tile, valid = args
        sim = _dot_f32(f0_tile, f1, (((1,), (1,)), ((), ()))) * inv_temp  # [tile, S] fp32
        lse_r = jax.nn.logsumexp(sim, axis=1)
        # padded rows must not contaminate the column stats
        sim_c = jnp.where(valid[:, None], sim, -jnp.inf)
        m_c = jnp.max(sim_c, axis=0)
        m_c_safe = jnp.where(jnp.isfinite(m_c), m_c, 0.0)
        z_c = jnp.sum(
            jnp.where(valid[:, None], jnp.exp(sim - m_c_safe[None, :]), 0.0),
            axis=0,
        )
        return lse_r, m_c_safe, z_c

    lse_r_t, m_c_t, z_c_t = jax.lax.map(body, (f0p.reshape(n, tile, C), row_valid))
    lse_r = lse_r_t.reshape(-1)[:L]
    m_c = jnp.max(m_c_t, axis=0)
    z_c = jnp.sum(z_c_t * jnp.exp(m_c_t - m_c[None, :]), axis=0)
    return lse_r, m_c + jnp.log(z_c)


def _gather_sim(f0, f1, gi, gj, inv_temp):
    """sim at GT pairs: [G] (f32 elementwise math on the gathered rows)."""
    r0 = f0[gi].astype(jnp.float32)  # [G, C]
    r1 = f1[gj].astype(jnp.float32)
    return jnp.sum(r0 * r1, axis=-1) * inv_temp


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8)
)
def sparse_focal_loss(
    f0: jnp.ndarray,
    f1: jnp.ndarray,
    gt_i: jnp.ndarray,
    gt_j: jnp.ndarray,
    gt_mask: jnp.ndarray,
    inv_temp: float,
    alpha: float = 0.25,
    gamma: float = 2.0,
    tile: int = 512,
) -> jnp.ndarray:
    """Mean sparse focal loss over GT positions, conf-matrix-free.

    f0: [B, L, C] fp32/bf16 coarse features (pre-scaled by 1/sqrt(C) is NOT
    assumed — fold everything into inv_temp = 1/(C*T)).
    gt_i/gt_j/gt_mask: [B, G] padded GT coarse pairs.
    """
    loss, _ = _sfl_fwd(f0, f1, gt_i, gt_j, gt_mask, inv_temp, alpha, gamma, tile)
    return loss


def _per_pair_loss_and_grad(logc, alpha, gamma):
    """focal(logc) and d focal / d logc for conf = clip(exp(logc)).

    Clipped pairs get ZERO gradient, matching the reference's
    torch.clamp(conf, 1e-6, 1-1e-6) semantics (loss.py:53).
    """
    raw = jnp.exp(logc)
    in_range = (raw > 1e-6) & (raw < 1.0 - 1e-6)
    conf = jnp.clip(raw, 1e-6, 1.0 - 1e-6)
    one_m = 1.0 - conf
    loss = -alpha * one_m**gamma * jnp.log(conf)
    # d/dlogc = conf * d/dconf;  d loss/d conf =
    #   alpha * gamma * one_m^(g-1) * log(conf) - alpha * one_m^g / conf
    dconf = alpha * gamma * one_m ** (gamma - 1.0) * jnp.log(conf) - (
        alpha * one_m**gamma / conf
    )
    return loss, jnp.where(in_range, dconf * conf, 0.0)


def _lses_pallas(f0, f1, inv_temp, interpret=False):
    """Batched row/col logsumexps via the fused dual-softmax pass-1 stats
    kernel (ops/pallas_dual_softmax) — the XLA lax.map tiling below lowers
    to a TPU while loop costing ~0.9 ms/step at the flagship shape; the
    stats kernel does the identical flash-style math in one pallas_call.
    Numerics: inv_temp is folded into the bf16 f0 operand (exactly the
    matching path's scaling), vs post-matmul f32 scaling in the XLA tiling —
    a bf16-rounding-level difference."""
    from featurematching_tpu.ops.pallas_dual_softmax import (
        _pass1_stats,
        _pick_row_tile,
    )

    L = f0.shape[1]
    row_tile = _pick_row_tile(L, 512)
    f0s = (f0.astype(jnp.float32) * inv_temp).astype(f0.dtype)
    rowm, rowz, colm, colz = _pass1_stats(f0s, f1, row_tile, interpret)
    return rowm + jnp.log(rowz), colm + jnp.log(colz)


# trace-time tunable (benchmarks/chunk_sweep.py): route the loss fwd LSEs and
# the softmax backward terms through the Pallas kernels vs the XLA tilings
TUNE = {"use_pallas": True}


def _use_pallas_lse():
    if not TUNE["use_pallas"]:
        return False
    try:
        from featurematching_tpu.ops.pallas_dual_softmax import _HAS_PALLAS

        return _HAS_PALLAS and jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def _sfl_fwd(f0, f1, gt_i, gt_j, gt_mask, inv_temp, alpha, gamma, tile):
    B = f0.shape[0]
    f0_orig, f1_orig = f0, f1  # residuals keep the primal dtype (bf16 ok)

    if _use_pallas_lse():
        lse_r, lse_c = _lses_pallas(f0, f1, inv_temp)
        sim_p = jax.vmap(
            lambda f0b, f1b, gib, gjb: _gather_sim(f0b, f1b, gib, gjb, inv_temp)
        )(f0, f1, gt_i, gt_j)
        logc = (
            2.0 * sim_p
            - jnp.take_along_axis(lse_r, gt_i, axis=1)
            - jnp.take_along_axis(lse_c, gt_j, axis=1)
        )
    else:
        def one(f0b, f1b, gib, gjb):
            lse_rb, lse_cb = _logsumexps(f0b, f1b, inv_temp, tile)
            sim_pb = _gather_sim(f0b, f1b, gib, gjb, inv_temp)
            logcb = 2.0 * sim_pb - lse_rb[gib] - lse_cb[gjb]
            return logcb, lse_rb, lse_cb

        logc, lse_r, lse_c = jax.vmap(one)(f0, f1, gt_i, gt_j)
    per, dlogc = _per_pair_loss_and_grad(logc, alpha, gamma)
    m = gt_mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(m), 1.0)
    loss = jnp.sum(per * m) / denom
    res = (f0_orig, f1_orig, gt_i, gt_j, gt_mask, lse_r, lse_c, dlogc, denom)
    return loss, res


def _sfl_bwd_kernel(
    f0s_ref, f1_ref, ar_ref, lser_ref, ac_ref, lsec_ref,
    df0_ref, df1_ref,
):
    """One row-tile of the softmax backward terms, fully in VMEM.

    f0s: [n_tiles, T, C] PRE-SCALED (inv_temp folded) bf16 rows; f1: [S, C].
    ar/lser: [n_tiles, T] f32 row-grad sums / row LSEs; ac/lsec: [1, S].
    df0 out: [n_tiles, T, C] f32 (d/d f0s — caller rescales by inv_temp);
    df1 out: [S, C] f32, accumulated across the sequential tile grid.
    Replaces the XLA lax.scan tiling (a TPU while loop, ~0.6 ms/step at the
    flagship shape) with one pallas_call."""
    i = pl.program_id(1)
    f0_t = f0s_ref[i]
    sim = jax.lax.dot_general(
        f0_t, f1_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T, S] — f0s carries inv_temp, so this IS sim
    p_row = jnp.exp(sim - lser_ref[i][:, None])
    p_col = jnp.exp(sim - lsec_ref[0][None, :])
    dsim = -(ar_ref[i][:, None] * p_row + ac_ref[0][None, :] * p_col)
    dsim_lo = dsim.astype(f0_t.dtype)
    df0_ref[i] = jax.lax.dot_general(
        dsim_lo, f1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    df1_t = jax.lax.dot_general(
        dsim_lo, f0_t,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [S, C]

    @pl.when(i == 0)
    def _init():
        df1_ref[...] = jnp.zeros_like(df1_ref)

    df1_ref[...] += df1_t


@functools.partial(jax.jit, static_argnames=("row_tile", "interpret"))
def _sfl_bwd_pallas(f0, f1, a_r, lse_r, a_c, lse_c, inv_temp, row_tile=480,
                    interpret=False):
    """Batched softmax backward terms via the Pallas kernel. Returns
    (df0 [B, L, C] f32 in ORIGINAL f0 units, df1 [B, S, C] f32)."""
    from featurematching_tpu.ops.pallas_dual_softmax import _pick_row_tile

    B, L, C = f0.shape
    S = f1.shape[1]
    T = _pick_row_tile(L, row_tile)
    n = L // T
    f0s = (f0.astype(jnp.float32) * inv_temp).astype(f0.dtype)
    f0s = f0s.reshape(B, n, T, C)
    ar = a_r.reshape(B, n, T).astype(jnp.float32)
    lser = lse_r.reshape(B, n, T).astype(jnp.float32)
    ac = a_c.reshape(B, 1, S).astype(jnp.float32)
    lsec = lse_c.reshape(B, 1, S).astype(jnp.float32)
    # VMEM: sim + p_row + p_col [T, S] f32 ~3x8.8M at T=480/S=4800
    params = (
        None if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=56 * 1024 * 1024)
    )
    df0, df1 = pl.pallas_call(
        _sfl_bwd_kernel,
        grid=(B, n),
        in_specs=[
            pl.BlockSpec((None, n, T, C), lambda b, i: (b, 0, 0, 0)),
            pl.BlockSpec((None, S, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, n, T), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, n, T), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, 1, S), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, 1, S), lambda b, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, n, T, C), lambda b, i: (b, 0, 0, 0)),
            pl.BlockSpec((None, S, C), lambda b, i: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n, T, C), jnp.float32),
            jax.ShapeDtypeStruct((B, S, C), jnp.float32),
        ],
        compiler_params=params,
        interpret=interpret,
    )(f0s, f1, ar, lser, ac, lsec)
    # df0 is d/d(f0s); d/d f0 = inv_temp * d/d f0s. df1 needs no rescale:
    # d sim/d f1 = f0s exactly.
    return df0.reshape(B, L, C) * inv_temp, df1


def _sfl_bwd(inv_temp, alpha, gamma, tile, res, g):
    f0_orig, f1_orig, gt_i, gt_j, gt_mask, lse_r, lse_c, dlogc, denom = res
    f0 = f0_orig  # tile matmuls run in the primal dtype (f32 accumulation)
    f1 = f1_orig
    dt = f0.dtype
    B, L, C = f0.shape
    S = f1.shape[1]
    G = gt_i.shape[1]
    m = gt_mask.astype(jnp.float32)
    gbar = (g / denom) * dlogc * m  # [B, G] upstream grad per GT pair

    if _use_pallas_lse():
        # per-row/col accumulated upstream grads (the -lse cotangents)
        a_r = jnp.zeros((B, L)).at[jnp.arange(B)[:, None], gt_i].add(gbar)
        a_c = jnp.zeros((B, S)).at[jnp.arange(B)[:, None], gt_j].add(gbar)
        df0, df1 = _sfl_bwd_pallas(f0, f1, a_r, lse_r, a_c, lse_c, inv_temp)
        # sparse direct term: dsim[i_p, j_p] += 2 * g_p
        coef = (2.0 * gbar * inv_temp)[..., None]
        rows1 = jnp.take_along_axis(
            f1.astype(jnp.float32), gt_j[..., None], axis=1
        )
        rows0 = jnp.take_along_axis(
            f0.astype(jnp.float32), gt_i[..., None], axis=1
        )
        df0 = jax.vmap(lambda d, i, v: d.at[i].add(v))(df0, gt_i, coef * rows1)
        df1 = jax.vmap(lambda d, j, v: d.at[j].add(v))(df1, gt_j, coef * rows0)
        zeros_i = jnp.zeros_like(gt_i)
        return (
            df0.astype(f0_orig.dtype),
            df1.astype(f1_orig.dtype),
            zeros_i,
            zeros_i,
            jnp.zeros_like(gt_mask),
        )

    def one(f0b, f1b, gib, gjb, gb, lse_rb, lse_cb):
        # per-row / per-col accumulated upstream (the -lse terms)
        a_r = jnp.zeros((L,)).at[gib].add(gb)  # [L]
        a_c = jnp.zeros((S,)).at[gjb].add(gb)  # [S]

        n = -(-L // tile)
        pad = n * tile - L
        f0p = jnp.pad(f0b, ((0, pad), (0, 0)))
        a_rp = jnp.pad(a_r, (0, pad))
        lse_rp = jnp.pad(lse_rb, (0, pad))

        def body(df1_acc, args):
            # df1 is ACCUMULATED in the scan carry: lax.map would stack the
            # per-tile [S, C] f32 partials into an [n, S, C] buffer
            # (dynamic-update-slice writes + a re-read for the final sum —
            # ~0.6 ms/step of pure HBM traffic at the flagship shape)
            f0_tile, a_r_t, lse_r_t = args
            sim = _dot_f32(f0_tile, f1b, (((1,), (1,)), ((), ()))) * inv_temp
            p_row = jnp.exp(sim - lse_r_t[:, None])  # [tile, S] f32
            p_col = jnp.exp(sim - lse_cb[None, :])
            dsim = (-(a_r_t[:, None] * p_row) - (a_c[None, :] * p_col)).astype(dt)
            df0_t = _dot_f32(dsim, f1b, (((1,), (0,)), ((), ()))) * inv_temp
            df1_t = _dot_f32(dsim, f0_tile, (((0,), (0,)), ((), ()))) * inv_temp
            return df1_acc + df1_t, df0_t  # carry [S, C] f32, out [tile, C]

        df1, df0_t = jax.lax.scan(
            body, jnp.zeros((S, C), jnp.float32),
            (f0p.reshape(n, tile, C), a_rp.reshape(n, tile),
             lse_rp.reshape(n, tile)),
        )
        df0 = df0_t.reshape(-1, C)[:L]

        # sparse direct term: dsim[i_p, j_p] += 2 * g_p
        df0 = df0.at[gib].add((2.0 * gb)[:, None] * f1b[gjb] * inv_temp)
        df1 = df1.at[gjb].add((2.0 * gb)[:, None] * f0b[gib] * inv_temp)
        return df0, df1

    df0, df1 = jax.vmap(one)(f0, f1, gt_i, gt_j, gbar, lse_r, lse_c)
    zeros_i = jnp.zeros_like(gt_i)
    # cotangents must match the primal dtypes (bf16 activations in training)
    return (
        df0.astype(f0_orig.dtype),
        df1.astype(f1_orig.dtype),
        zeros_i,
        zeros_i,
        jnp.zeros_like(gt_mask),
    )


sparse_focal_loss.defvjp(_sfl_fwd, _sfl_bwd)


def naive_sparse_focal_loss(
    f0, f1, gt_i, gt_j, gt_mask, inv_temp, alpha=0.25, gamma=2.0
):
    """Materialized reference implementation (for tests)."""
    sim = jnp.einsum("blc,bsc->bls", f0.astype(jnp.float32), f1.astype(jnp.float32)) * inv_temp
    conf = jax.nn.softmax(sim, 1) * jax.nn.softmax(sim, 2)
    conf = jnp.clip(conf, 1e-6, 1 - 1e-6)
    B, G = gt_i.shape
    cp = conf[jnp.arange(B)[:, None], gt_i, gt_j]
    per = -alpha * (1 - cp) ** gamma * jnp.log(cp)
    msk = gt_mask.astype(jnp.float32)
    return jnp.sum(per * msk) / jnp.maximum(jnp.sum(msk), 1.0)
