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


def _sfl_fwd(f0, f1, gt_i, gt_j, gt_mask, inv_temp, alpha, gamma, tile):
    B = f0.shape[0]
    f0_orig, f1_orig = f0, f1  # residuals keep the primal dtype (bf16 ok)

    def one(f0b, f1b, gib, gjb):
        lse_r, lse_c = _logsumexps(f0b, f1b, inv_temp, tile)
        sim_p = _gather_sim(f0b, f1b, gib, gjb, inv_temp)
        logc = 2.0 * sim_p - lse_r[gib] - lse_c[gjb]
        return logc, lse_r, lse_c

    logc, lse_r, lse_c = jax.vmap(one)(f0, f1, gt_i, gt_j)
    per, dlogc = _per_pair_loss_and_grad(logc, alpha, gamma)
    m = gt_mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(m), 1.0)
    loss = jnp.sum(per * m) / denom
    res = (f0_orig, f1_orig, gt_i, gt_j, gt_mask, lse_r, lse_c, dlogc, denom)
    return loss, res


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
