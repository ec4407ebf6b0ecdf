"""Differentiable fused coarse transformer — Pallas forward + backward.

ops/pallas_coarse_transformer.py gave the INFERENCE path streaming
stats/apply kernels for the 8-layer coarse LoFTR stack; the training path
still ran the per-op XLA chain (device-measured 17.1 ms/step fwd+bwd at
[4, 4800, 256] bf16 — the largest single slice of the train step). This
module closes that gap with a `jax.custom_vjp`:

  * forward: the inference kernels, with (x, src, KV, KOnes) stashed per
    encoder call as residuals (KV/KOnes are [G, C, C] — tiny).
  * backward, per encoder call, two streaming kernels mirroring the forward
    split (flash-style: intermediates are RECOMPUTED in VMEM from the saved
    inputs, in the exact bf16 rounding of the forward):
      apply-bwd — stream query chunks; recompute Q/Z/o/msg/FFN; emit dx
                  plus dWq/dWmerge/LN/MLP grads (whole-grid accumulators)
                  and the per-image dKV/dKOnes [G, C, C] accumulators.
      stats-bwd — stream key/value chunks; recompute K/V; turn dKV/dKOnes
                  into dsrc and dWkv.
  * the host-level reverse loop mirrors the self/cross twin structure,
    including the reference's sequential cross ordering (feat1 attends the
    UPDATED feat0 — transformer.py:93-95), summing the two cross calls'
    weight grads.

Gradient math (linear attention, per head packed into lane blocks):
  o = (Q KV_bd) * n,  n = S / (Z + eps),  Z = Q KOnes_bd
  dQ = (do*n) KV_bd^T + dZ KOnes_bd^T,  dZ = -(do ⊙ o) / (Z + eps)
  dKV = Q^T (do*n),   dKOnes = Q^T dZ          (masked to the head blocks)
  dK  = V dKV^T + rowsum(dKOnes) ⊕ rows,  dV = (K dKV) / S

All dots run with bf16 operands + f32 accumulation (the Swin grad kernel's
mixed-precision recipe); with f32 inputs the math is exact vs the flax path.
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

from featurematching_tpu.ops.pallas_coarse_transformer import (
    _full_spec,
    _layer_apply,
    _layer_stats,
    _pick_chunk,
    coarse_transformer_supported,
)
from featurematching_tpu.ops.pallas_fine_stage import _dot2, _elu1, _layer_values
from featurematching_tpu.ops.tuning import vmem_params

_EPS = 1e-6


def _dot_t(a, b):
    """a [M, K] x b [N, K]^T -> [M, N] (rhs lane contraction), f32 accum."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dot_g(a, b):
    """a [K, M]^T x b [K, N] -> [M, N] (both sublane contraction), f32."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _ln_fwd_stats(v_lo):
    """LN forward on a bf16/f32 value (f32 stats). Returns (y, xhat, rstd)."""
    v32 = v_lo.astype(jnp.float32)
    mu = jnp.mean(v32, axis=-1, keepdims=True)
    var = jnp.mean((v32 - mu) ** 2, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + 1e-6)
    xhat = (v32 - mu) * rstd
    return xhat, rstd


def _ln_bwd2(dh, xhat, rstd, scale):
    """2D LN backward. dh [M, C] f32. Returns (dv f32, dscale [1,C], dbias)."""
    dscale = jnp.sum(dh * xhat, axis=0, keepdims=True)
    dbias = jnp.sum(dh, axis=0, keepdims=True)
    dxhat = dh * scale
    mean1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    mean2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dv = rstd * (dxhat - mean1 - xhat * mean2)
    return dv, dscale, dbias


def _apply_bwd_kernel(
    x_ref, g_ref, kv_ref, ko_ref, bm_ref,
    wq_ref, wmerge_ref, n1s_ref, n1b_ref, wmlp1_ref, wmlp2_ref, n2s_ref, n2b_ref,
    dx_ref, dkv_ref, dko_ref,
    dwq_ref, dwmerge_ref, dn1s_ref, dn1b_ref, dwmlp1_ref, dwmlp2_ref,
    dn2s_ref, dn2b_ref,
    *, S, C,
):
    gi = pl.program_id(0)
    jj = pl.program_id(1)
    blk = x_ref[...]
    chunk = blk.shape[1]
    x2 = blk.reshape(chunk, C)
    dtype = x2.dtype
    bm = bm_ref[...]
    n1s = n1s_ref[...]
    n2s = n2s_ref[...]
    wmlp1 = wmlp1_ref[...]

    @pl.when((gi == 0) & (jj == 0))
    def _init_w():
        for ref in (
            dwq_ref, dwmerge_ref, dn1s_ref, dn1b_ref,
            dwmlp1_ref, dwmlp2_ref, dn2s_ref, dn2b_ref,
        ):
            ref[...] = jnp.zeros_like(ref)

    @pl.when(jj == 0)
    def _init_g():
        dkv_ref[...] = jnp.zeros_like(dkv_ref)
        dko_ref[...] = jnp.zeros_like(dko_ref)

    # ---- forward recompute (must reproduce _apply_kernel bit-for-bit) ----
    qf = _dot2(x2, wq_ref[...])  # f32
    Q = _elu1(qf).astype(dtype)
    kv = kv_ref[...].reshape(C, C)
    ko = ko_ref[...].reshape(C, C)
    KV_bd = (kv * bm).astype(dtype)
    KO_bd = (ko * bm).astype(dtype)
    Z = _dot2(Q, KO_bd)  # f32
    opre = _dot2(Q, KV_bd)  # f32
    nfac = float(S) / (Z + _EPS)
    o_lo = (opre * nfac).astype(dtype)
    m1_lo = _dot2(o_lo, wmerge_ref[...]).astype(dtype)
    xhat1, rstd1 = _ln_fwd_stats(m1_lo)
    msg = (xhat1 * n1s + n1b_ref[...]).astype(dtype)
    y1 = _dot2(x2, wmlp1[:C]) + _dot2(msg, wmlp1[C:])  # f32
    h_lo = jnp.maximum(y1, 0.0).astype(dtype)
    y2_lo = _dot2(h_lo, wmlp2_ref[...]).astype(dtype)
    xhat2, rstd2 = _ln_fwd_stats(y2_lo)

    # ---- backward ----
    g = g_ref[...].reshape(chunk, C).astype(jnp.float32)

    dy2, dn2s, dn2b = _ln_bwd2(g, xhat2, rstd2, n2s)
    dn2s_ref[...] += dn2s
    dn2b_ref[...] += dn2b
    dy2_lo = dy2.astype(dtype)
    dwmlp2_ref[...] += _dot_g(h_lo, dy2_lo)
    dh = _dot_t(dy2_lo, wmlp2_ref[...])  # [chunk, 2C] f32
    dy1 = dh * (y1 > 0.0).astype(jnp.float32)
    dy1_lo = dy1.astype(dtype)
    dwmlp1_ref[...] += jnp.concatenate(
        [_dot_g(x2, dy1_lo), _dot_g(msg, dy1_lo)], axis=0
    )  # [2C, 2C]
    dx_ffn = _dot_t(dy1_lo, wmlp1[:C])  # [chunk, C] f32
    dmsg = _dot_t(dy1_lo, wmlp1[C:])

    dm1, dn1s, dn1b = _ln_bwd2(dmsg, xhat1, rstd1, n1s)
    dn1s_ref[...] += dn1s
    dn1b_ref[...] += dn1b
    dm1_lo = dm1.astype(dtype)
    dwmerge_ref[...] += _dot_g(o_lo, dm1_lo)
    do = _dot_t(dm1_lo, wmerge_ref[...])  # [chunk, C] f32

    dopre = do * nfac
    o32 = opre * nfac
    dZ = -(do * o32) / (Z + _EPS)
    dopre_lo = dopre.astype(dtype)
    dZ_lo = dZ.astype(dtype)
    dkv_ref[...] += (_dot_g(Q, dopre_lo) * bm).reshape(1, C, C)
    dko_ref[...] += (_dot_g(Q, dZ_lo) * bm).reshape(1, C, C)
    dQ = _dot_t(dopre_lo, KV_bd) + _dot_t(dZ_lo, KO_bd)  # f32
    dqf = dQ * jnp.where(qf > 0, 1.0, jnp.exp(qf))
    dqf_lo = dqf.astype(dtype)
    dwq_ref[...] += _dot_g(x2, dqf_lo)
    dx_q = _dot_t(dqf_lo, wq_ref[...])

    dx_ref[...] = (g + dx_ffn + dx_q).astype(dx_ref.dtype).reshape(1, chunk, C)


def _stats_bwd_kernel(
    src_ref, dkv_ref, dko_ref, wkv_ref,
    dsrc_ref, dwkv_ref,
    *, S, C,
):
    gi = pl.program_id(0)
    jj = pl.program_id(1)
    blk = src_ref[...]
    chunk = blk.shape[1]
    s2 = blk.reshape(chunk, C)
    dtype = s2.dtype

    @pl.when((gi == 0) & (jj == 0))
    def _init():
        dwkv_ref[...] = jnp.zeros_like(dwkv_ref)

    kv3 = _dot2(s2, wkv_ref[...])  # [chunk, 2C] f32
    kf = kv3[:, :C]
    K = _elu1(kf).astype(dtype)
    V = (kv3[:, C:] * (1.0 / S)).astype(dtype)

    dkv = dkv_ref[...].reshape(C, C).astype(dtype)  # already blockmasked
    dko = dko_ref[...].reshape(C, C).astype(dtype)

    dV_scaled = _dot2(K, dkv)  # [chunk, C] f32
    dK = _dot_t(V, dkv)  # [chunk, C] f32
    ones_row = jnp.ones((1, C), dtype)
    dK = dK + _dot_t(ones_row, dko)  # rowsum(dKOnes) broadcast over rows
    dkf = dK * jnp.where(kf > 0, 1.0, jnp.exp(kf))
    dkv3_lo = jnp.concatenate(
        [dkf.astype(dtype), (dV_scaled * (1.0 / S)).astype(dtype)], axis=-1
    )  # [chunk, 2C]
    dwkv_ref[...] += _dot_g(s2, dkv3_lo)
    dsrc = _dot_t(dkv3_lo, wkv_ref[...])  # [chunk, C] f32
    dsrc_ref[...] = dsrc.astype(dsrc_ref.dtype).reshape(1, chunk, C)


# trace-time tunables (benchmarks/chunk_sweep.py): bwd row target + Mosaic
# scoped-VMEM limit in MiB for the two backward kernels (0 = 16M default,
# which capped the bwd chunk at 480-600 rows — "960 hit the 16M limit").
# Round-5 device sweep (chunk_sweep.json): 600 = 66.21, 960 = 65.54,
# 1600 = 65.36 ms/step — the old ceiling was the 16 MB default, not the
# hardware; 1600 rows with a 48 MiB limit is the new default.
TUNE = {"bwd_rows": 1600, "bwd_vmem_mb": 48}


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def _apply_bwd(x, g, kv, ko, bm, wvals, chunk, interpret):
    G, N, C = x.shape
    wq, _, wmerge, n1s, n1b, wmlp1, wmlp2, n2s, n2b = wvals
    kern = functools.partial(_apply_bwd_kernel, S=N, C=C)
    operands = [wq, wmerge, n1s.reshape(1, C), n1b.reshape(1, C),
                wmlp1, wmlp2, n2s.reshape(1, C), n2b.reshape(1, C)]
    f32 = jnp.float32
    return pl.pallas_call(
        kern,
        grid=(G, N // chunk),
        in_specs=[
            pl.BlockSpec((1, chunk, C), lambda g_, j: (g_, j, 0)),
            pl.BlockSpec((1, chunk, C), lambda g_, j: (g_, j, 0)),
            pl.BlockSpec((1, C, C), lambda g_, j: (g_, 0, 0)),
            pl.BlockSpec((1, C, C), lambda g_, j: (g_, 0, 0)),
            _full_spec(bm),
        ] + [_full_spec(a) for a in operands],
        out_specs=(
            pl.BlockSpec((1, chunk, C), lambda g_, j: (g_, j, 0)),
            pl.BlockSpec((1, C, C), lambda g_, j: (g_, 0, 0)),
            pl.BlockSpec((1, C, C), lambda g_, j: (g_, 0, 0)),
        ) + tuple(
            pl.BlockSpec(s, (lambda g_, j, _nd=len(s): (0,) * _nd))
            for s in ((C, C), (C, C), (1, C), (1, C),
                      (2 * C, 2 * C), (2 * C, C), (1, C), (1, C))
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G, N, C), x.dtype),
            jax.ShapeDtypeStruct((G, C, C), f32),
            jax.ShapeDtypeStruct((G, C, C), f32),
            jax.ShapeDtypeStruct((C, C), f32),
            jax.ShapeDtypeStruct((C, C), f32),
            jax.ShapeDtypeStruct((1, C), f32),
            jax.ShapeDtypeStruct((1, C), f32),
            jax.ShapeDtypeStruct((2 * C, 2 * C), f32),
            jax.ShapeDtypeStruct((2 * C, C), f32),
            jax.ShapeDtypeStruct((1, C), f32),
            jax.ShapeDtypeStruct((1, C), f32),
        ),
        interpret=interpret,
        compiler_params=None if interpret else vmem_params(TUNE["bwd_vmem_mb"]),
    )(x, g, kv, ko, bm, *operands)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def _stats_bwd(src, dkv, dko, wkv, chunk, interpret):
    G, S, C = src.shape
    kern = functools.partial(_stats_bwd_kernel, S=S, C=C)
    return pl.pallas_call(
        kern,
        grid=(G, S // chunk),
        in_specs=[
            pl.BlockSpec((1, chunk, C), lambda g_, j: (g_, j, 0)),
            pl.BlockSpec((1, C, C), lambda g_, j: (g_, 0, 0)),
            pl.BlockSpec((1, C, C), lambda g_, j: (g_, 0, 0)),
            _full_spec(wkv),
        ],
        out_specs=(
            pl.BlockSpec((1, chunk, C), lambda g_, j: (g_, j, 0)),
            pl.BlockSpec((C, 2 * C), lambda g_, j: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G, S, C), src.dtype),
            jax.ShapeDtypeStruct((C, 2 * C), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=None if interpret else vmem_params(TUNE["bwd_vmem_mb"]),
    )(src, dkv, dko, wkv)


# ---------------------------------------------------------------------------
# custom_vjp orchestration over the full self/cross stack
# ---------------------------------------------------------------------------

def _blockmask(C: int, nhead: int):
    head_of = np.arange(C) // (C // nhead)
    return jnp.asarray((head_of[:, None] == head_of[None, :]).astype(np.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def coarse_transformer_train(
    feat0: jnp.ndarray,
    feat1: jnp.ndarray,
    params: Dict,
    layer_names: Tuple[str, ...],
    nhead: int,
    chunk: int | None = None,
    interpret: bool = False,
):
    """Differentiable fused coarse transformer. feat*: [B, N, C]; params is
    the LocalFeatureTransformer subtree ({'layer_0': {...}, ...}, f32)."""
    out, _ = _train_fwd(feat0, feat1, params, layer_names, nhead, chunk, interpret)
    return out


def _train_fwd(feat0, feat1, params, layer_names, nhead, chunk, interpret):
    B, N, C = feat0.shape
    dtype = feat0.dtype
    if chunk is None:
        chunk = _pick_chunk(N, C)
    bm = _blockmask(C, nhead)

    calls = []  # (x, src, kv, ko) in forward order; kinds derive statically
    for i, name in enumerate(layer_names):
        wvals = _layer_values(params[f"layer_{i}"], dtype)
        wkv = wvals[1]
        if name == "self":
            stacked = jnp.concatenate([feat0, feat1], axis=0)
            kv, ko = _layer_stats(stacked, wkv, chunk, interpret)
            out = _layer_apply(stacked, kv, ko, bm, wvals, chunk, interpret)
            calls.append((stacked, None, kv, ko))
            feat0, feat1 = out[:B], out[B:]
        else:
            kv1, ko1 = _layer_stats(feat1, wkv, chunk, interpret)
            f0n = _layer_apply(feat0, kv1, ko1, bm, wvals, chunk, interpret)
            calls.append((feat0, feat1, kv1, ko1))
            kv0, ko0 = _layer_stats(f0n, wkv, chunk, interpret)
            f1n = _layer_apply(feat1, kv0, ko0, bm, wvals, chunk, interpret)
            calls.append((feat1, f0n, kv0, ko0))
            feat0, feat1 = f0n, f1n
    return (feat0, feat1), calls


def _call_plan(layer_names):
    """Static (kind, layer_index) per forward call: self = 1 call,
    cross = (crossA, crossB)."""
    plan = []
    for i, name in enumerate(layer_names):
        if name == "self":
            plan.append(("self", i))
        else:
            plan.append(("crossA", i))
            plan.append(("crossB", i))
    return plan


def _vjp_fwd(feat0, feat1, params, layer_names, nhead, chunk, interpret):
    out, calls = _train_fwd(feat0, feat1, params, layer_names, nhead, chunk, interpret)
    return out, (params, calls)


def _vjp_bwd(layer_names, nhead, chunk, interpret, res, g):
    params, calls = res
    df0, df1 = g
    B = df0.shape[0]
    N, C = df0.shape[1], df0.shape[2]
    dtype = calls[0][0].dtype
    if chunk is None:
        # the bwd kernels hold ~3x the forward's live set (recompute +
        # cotangents): chunk 960 hit the 16M scoped-vmem limit at 17.1M;
        # device A/B: 480 = 73.3, 600 = 72.0 ms/step end-to-end.
        # TUNE["bwd_rows"] > 600 requires TUNE["bwd_vmem_mb"] raised too.
        chunk = _pick_chunk(N, C, target_rows=TUNE["bwd_rows"])
    bm = _blockmask(C, nhead)

    plan = _call_plan(layer_names)
    dparams = {f"layer_{i}": None for i in range(len(layer_names))}

    def add_wgrads(i, wg):
        acc = dparams[f"layer_{i}"]
        dparams[f"layer_{i}"] = wg if acc is None else tuple(
            a + b for a, b in zip(acc, wg)
        )

    pending_extra = None  # dsrc flowing into a cross pair's first output
    for ci in range(len(calls) - 1, -1, -1):
        x, src, kv, ko = calls[ci]
        kind, li = plan[ci]
        wvals = _layer_values(params[f"layer_{li}"], dtype)
        wkv = wvals[1]
        if kind == "self":
            dout = jnp.concatenate([df0, df1], axis=0)
            (dx, dkv, dko, dwq, dwm, dn1s, dn1b, dw1, dw2, dn2s, dn2b) = _apply_bwd(
                x, dout, kv, ko, bm, wvals, chunk, interpret
            )
            dsrc, dwkv = _stats_bwd(x, dkv, dko, wkv, chunk, interpret)
            add_wgrads(li, (dwq, dwkv, dwm, dn1s, dn1b, dw1, dw2, dn2s, dn2b))
            dstacked = dx + dsrc
            df0, df1 = dstacked[:B], dstacked[B:]
        elif kind == "crossB":  # f1' = L(f1, f0'); processed FIRST in reverse
            (dx, dkv, dko, dwq, dwm, dn1s, dn1b, dw1, dw2, dn2s, dn2b) = _apply_bwd(
                x, df1, kv, ko, bm, wvals, chunk, interpret
            )
            dsrc, dwkv = _stats_bwd(src, dkv, dko, wkv, chunk, interpret)
            add_wgrads(li, (dwq, dwkv, dwm, dn1s, dn1b, dw1, dw2, dn2s, dn2b))
            df1 = dx
            pending_extra = dsrc  # cotangent of f0' beyond downstream df0
        else:  # crossA: f0' = L(f0, f1)
            dout = df0 + pending_extra if pending_extra is not None else df0
            pending_extra = None
            (dx, dkv, dko, dwq, dwm, dn1s, dn1b, dw1, dw2, dn2s, dn2b) = _apply_bwd(
                x, dout, kv, ko, bm, wvals, chunk, interpret
            )
            dsrc, dwkv = _stats_bwd(src, dkv, dko, wkv, chunk, interpret)
            add_wgrads(li, (dwq, dwkv, dwm, dn1s, dn1b, dw1, dw2, dn2s, dn2b))
            df0 = dx
            df1 = df1 + dsrc

    # unpack packed weight grads into the params pytree (f32, param shapes)
    dptree = {}
    for i in range(len(layer_names)):
        dwq, dwkv, dwm, dn1s, dn1b, dw1, dw2, dn2s, dn2b = dparams[f"layer_{i}"]
        p = params[f"layer_{i}"]

        def like(g_, ref):
            return g_.reshape(ref.shape).astype(ref.dtype)

        dptree[f"layer_{i}"] = {
            "q_proj": {"kernel": like(dwq, p["q_proj"]["kernel"])},
            "k_proj": {"kernel": like(dwkv[:, :C], p["k_proj"]["kernel"])},
            "v_proj": {"kernel": like(dwkv[:, C:], p["v_proj"]["kernel"])},
            "merge": {"kernel": like(dwm, p["merge"]["kernel"])},
            "norm1": {
                "scale": like(dn1s[0], p["norm1"]["scale"]),
                "bias": like(dn1b[0], p["norm1"]["bias"]),
            },
            "mlp1": {"kernel": like(dw1, p["mlp1"]["kernel"])},
            "mlp2": {"kernel": like(dw2, p["mlp2"]["kernel"])},
            "norm2": {
                "scale": like(dn2s[0], p["norm2"]["scale"]),
                "bias": like(dn2b[0], p["norm2"]["bias"]),
            },
        }
    return df0, df1, dptree


coarse_transformer_train.defvjp(_vjp_fwd, _vjp_bwd)


def coarse_train_supported(
    layer_names: Sequence[str], d_model: int, nhead: int, n_tokens: int
) -> bool:
    return coarse_transformer_supported(layer_names, d_model, nhead, n_tokens)
