"""Differentiable fused Swin block — Pallas TPU forward + backward kernels.

Round-1 shipped the fused forward (`pallas_swin_block.swin_block_fused`) for
inference only; training fell back to the per-op XLA chain, making the train
step 3.2x slower than the inference forward (VERDICT round 1, weak #1). This
module closes that gap with a `jax.custom_vjp` pair:

  * forward: the round-1 fused block extended with per-window droppath scales
    s1/s2 (stochastic depth multiplies each residual BRANCH by 0 or 1/keep —
    timm DropPath semantics, reference swin_...py:151-248 via timm).
  * backward: one flash-style Pallas kernel per chunk of windows that
    RECOMPUTES the forward intermediates in VMEM (nothing but x + params are
    saved as residuals) and produces dx plus all parameter gradients,
    accumulated across the sequential TPU grid.

Gradients flow to x and every parameter (incl. the expanded relative-position
bias [h, N, N]; callers chain it back to the (2w-1)^2 table through the XLA
VJP of the gather). mask / s1 / s2 receive zero cotangents.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

from featurematching_tpu.ops.pallas_swin_block import _erf_approx
from featurematching_tpu.ops.tuning import vmem_params

_SQRT_HALF = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327

# trace-time tunables (benchmarks/chunk_sweep.py sweeps these in-process):
# chunk budgets in "rows of C" (chunk = budget // C) and the Mosaic
# scoped-VMEM limit in MiB (0 = default 16M). Defaults = round-5 device
# sweep winners.
TUNE = {"fwd_budget": 2048, "bwd_budget": 1024, "fwd_vmem_mb": 0, "bwd_vmem_mb": 0}

PARAM_KEYS = (
    "ln1_scale", "ln1_bias", "w_qkv", "b_qkv", "rel_bias", "w_proj", "b_proj",
    "ln2_scale", "ln2_bias", "w_mlp1", "b_mlp1", "w_mlp2", "b_mlp2",
)


# ---------------------------------------------------------------------------
# jnp ground truth (droppath-scale-aware)
# ---------------------------------------------------------------------------

def swin_block_train_reference(
    x: jnp.ndarray,
    mask_pw: Optional[jnp.ndarray],
    s1: jnp.ndarray,
    s2: jnp.ndarray,
    params: dict,
    num_heads: int,
) -> jnp.ndarray:
    """x: [B_, N, C]; mask_pw: [B_, N, N] additive or None; s1/s2: [B_]
    per-window residual-branch scales (droppath)."""
    B_, N, C = x.shape
    h = num_heads
    d = C // h
    dtype = x.dtype

    def ln(v, scale, bias):
        v32 = v.astype(jnp.float32)
        mu = jnp.mean(v32, axis=-1, keepdims=True)
        var = jnp.mean((v32 - mu) ** 2, axis=-1, keepdims=True)
        return ((v32 - mu) * jax.lax.rsqrt(var + 1e-6) * scale + bias).astype(dtype)

    hx = ln(x, params["ln1_scale"], params["ln1_bias"])
    qkv = (hx @ params["w_qkv"].astype(dtype)) + params["b_qkv"].astype(dtype)
    q = qkv[..., :C].reshape(B_, N, h, d).transpose(0, 2, 1, 3)
    k = qkv[..., C : 2 * C].reshape(B_, N, h, d).transpose(0, 2, 1, 3)
    v = qkv[..., 2 * C :].reshape(B_, N, h, d).transpose(0, 2, 1, 3)
    attn = jnp.einsum(
        "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
    ) * (d**-0.5)
    attn = attn + params["rel_bias"][None].astype(attn.dtype)
    if mask_pw is not None:
        attn = attn + mask_pw[:, None].astype(attn.dtype)
    attn = jax.nn.softmax(attn, axis=-1)
    o = jnp.einsum(
        "bhnm,bhmd->bhnd", attn.astype(dtype), v, preferred_element_type=jnp.float32
    ).astype(dtype)
    o = o.transpose(0, 2, 1, 3).reshape(B_, N, C)
    o = (o @ params["w_proj"].astype(dtype)) + params["b_proj"].astype(dtype)
    x = x + s1[:, None, None].astype(dtype) * o

    h2 = ln(x, params["ln2_scale"], params["ln2_bias"])
    y = (h2 @ params["w_mlp1"].astype(dtype)) + params["b_mlp1"].astype(dtype)
    y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(dtype)
    y = (y @ params["w_mlp2"].astype(dtype)) + params["b_mlp2"].astype(dtype)
    return x + s2[:, None, None].astype(dtype) * y


# ---------------------------------------------------------------------------
# forward kernel (scale-aware variant of pallas_swin_block._block_kernel)
# ---------------------------------------------------------------------------

def _fwd_recompute(
    x, mask, s1, s2,
    ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, bias_ref, hmask_ref,
    wproj_ref, bproj_ref,
    ln2s_ref, ln2b_ref, wm1_ref, bm1_ref, wm2_ref, bm2_ref,
    num_heads, want_intermediates, p_saved=None, p_out_ref=None,
):
    """Shared forward math over VMEM-resident values. x: [CH, N, C] dtype.
    mask: [CH, N, N] f32 or None. s1/s2: [CH, 1, 1] f32 or None.
    bias_ref: PACKED rel bias [N, h*N]; hmask_ref: {0,1} head-block channel
    mask [h*N, C] (see pallas_swin_block head-packed attention notes).
    Returns `out` or the full intermediate set for the backward pass.

    p_saved: attention probabilities stashed by the TRAIN forward — skips the
    score matmul + softmax recompute in the backward (the HBM round trip is
    cheaper than the VPU recompute at stage-0 widths). p_out_ref: where the
    train forward stashes them."""
    CH, N, C = x.shape
    h = num_heads
    d = C // h
    dtype = x.dtype

    def ln(v, s_ref, b_ref):
        v32 = v.astype(jnp.float32)
        mu = jnp.mean(v32, axis=-1, keepdims=True)
        var = jnp.mean((v32 - mu) ** 2, axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + 1e-6)
        xhat = (v32 - mu) * rstd
        return (xhat * s_ref[...] + b_ref[...]).astype(dtype), xhat, rstd

    h1, xhat1, rstd1 = ln(x, ln1s_ref, ln1b_ref)
    h1f = h1.reshape(CH * N, C)
    qkv = (
        jax.lax.dot_general(
            h1f, wqkv_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bqkv_ref[...].astype(jnp.float32)
    ).astype(dtype).reshape(CH, N, 3 * C)

    q = qkv[:, :, :C]
    k = qkv[:, :, C : 2 * C]
    v = qkv[:, :, 2 * C :]

    # head-packed attention (same construction as pallas_swin_block):
    # K_big[b, hi*N+m, c] = k[b, m, c] * (c in head hi), one batched dot
    # per window chunk, per-head lane blocks in the score/probability tensor
    hmask = hmask_ref[...]
    kbig = (k if h == 1 else jnp.concatenate([k] * h, axis=1)) * hmask
    vbig = (v if h == 1 else jnp.concatenate([v] * h, axis=1)) * hmask
    if p_saved is not None:
        p = p_saved.astype(jnp.float32)
    else:
        s = jax.lax.dot_general(
            q, kbig,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * (d**-0.5)  # [CH, N, h*N]
        s = s + bias_ref[...]
        if mask is not None:
            s = s + (mask if h == 1 else jnp.concatenate([mask] * h, axis=-1))
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        if h == 1:
            p = e / jnp.sum(e, axis=-1, keepdims=True)
        else:
            denom = jnp.concatenate(
                [
                    jnp.broadcast_to(
                        jnp.sum(e[:, :, hi * N : (hi + 1) * N], axis=-1, keepdims=True),
                        (CH, N, N),
                    )
                    for hi in range(h)
                ],
                axis=-1,
            )
            p = e / denom  # [CH, N, h*N] f32
        if p_out_ref is not None:
            p_out_ref[...] = p.astype(p_out_ref.dtype)
    abig = jax.lax.dot_general(
        p.astype(dtype), vbig,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dtype)  # [CH, N, C] — heads land in their own lane blocks
    a = abig

    af = a.reshape(CH * N, C)
    o2 = (
        jax.lax.dot_general(
            af, wproj_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bproj_ref[...].astype(jnp.float32)
    ).reshape(CH, N, C)
    if s1 is not None:
        o2 = o2 * s1
    x1 = x + o2.astype(dtype)

    h2, xhat2, rstd2 = ln(x1, ln2s_ref, ln2b_ref)
    h2f = h2.reshape(CH * N, C)
    y1 = (
        jax.lax.dot_general(
            h2f, wm1_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bm1_ref[...].astype(jnp.float32)
    )
    ge = (y1 * 0.5 * (1.0 + _erf_approx(y1 * _SQRT_HALF))).astype(dtype)
    m = (
        jax.lax.dot_general(
            ge, wm2_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bm2_ref[...].astype(jnp.float32)
    ).reshape(CH, N, C)
    if s2 is not None:
        m = m * s2
    out = x1 + m.astype(dtype)

    if not want_intermediates:
        return out
    return dict(
        h1=h1, xhat1=xhat1, rstd1=rstd1, qkv=qkv, a=a, x1=x1,
        h2=h2, xhat2=xhat2, rstd2=rstd2, y1=y1, ge=ge,
        p=p, kbig=kbig, vbig=vbig,
    )


def _train_fwd_kernel(
    x_ref, mask_ref, s1_ref, s2_ref,
    ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, bias_ref, hmask_ref,
    wproj_ref, bproj_ref,
    ln2s_ref, ln2b_ref, wm1_ref, bm1_ref, wm2_ref, bm2_ref,
    out_ref, *maybe_p_ref,
    num_heads, has_mask, has_scale,
):
    x = x_ref[...]
    mask = mask_ref[...] if has_mask else None
    s1 = s1_ref[...] if has_scale else None  # [CH,1,1]
    s2 = s2_ref[...] if has_scale else None
    out_ref[...] = _fwd_recompute(
        x, mask, s1, s2,
        ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, bias_ref, hmask_ref,
        wproj_ref, bproj_ref,
        ln2s_ref, ln2b_ref, wm1_ref, bm1_ref, wm2_ref, bm2_ref,
        num_heads, want_intermediates=False,
        p_out_ref=maybe_p_ref[0] if maybe_p_ref else None,
    )


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _ln_bwd(dh, xhat, rstd, scale):
    """v32-space LN backward. dh: [CH,N,C] f32 cotangent of LN output.
    Returns (dv [CH,N,C] f32, dscale [C], dbias [C])."""
    dscale = jnp.sum(dh * xhat, axis=(0, 1))
    dbias = jnp.sum(dh, axis=(0, 1))
    dxhat = dh * scale
    mean1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    mean2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dv = rstd * (dxhat - mean1 - xhat * mean2)
    return dv, dscale, dbias


def _train_bwd_kernel(
    x_ref, mask_ref, s1_ref, s2_ref, g_ref, p_ref,
    ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, bias_ref, hmask_ref,
    wproj_ref, bproj_ref,
    ln2s_ref, ln2b_ref, wm1_ref, bm1_ref, wm2_ref, bm2_ref,
    dx_ref, dln1s_ref, dln1b_ref, dwqkv_ref, dbqkv_ref, dbias_ref,
    dwproj_ref, dbproj_ref, dln2s_ref, dln2b_ref, dwm1_ref, dbm1_ref,
    dwm2_ref, dbm2_ref,
    *, num_heads, has_mask, has_scale,
):
    CH, N, C = x_ref.shape
    h = num_heads
    d = C // h
    x = x_ref[...]
    dtype = x.dtype
    mask = mask_ref[...] if has_mask else None
    s1 = s1_ref[...] if has_scale else None
    s2 = s2_ref[...] if has_scale else None

    inter = _fwd_recompute(
        x, mask, s1, s2,
        ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, bias_ref, hmask_ref,
        wproj_ref, bproj_ref,
        ln2s_ref, ln2b_ref, wm1_ref, bm1_ref, wm2_ref, bm2_ref,
        num_heads, want_intermediates=True, p_saved=p_ref[...],
    )

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (
            dln1s_ref, dln1b_ref, dwqkv_ref, dbqkv_ref, dbias_ref,
            dwproj_ref, dbproj_ref, dln2s_ref, dln2b_ref, dwm1_ref,
            dbm1_ref, dwm2_ref, dbm2_ref,
        ):
            ref[...] = jnp.zeros_like(ref)

    # Mixed precision: every dot_general runs with operands in the INPUT
    # dtype (bf16 in production — 1 MXU pass vs several for f32) and f32
    # accumulation; elementwise stats/sums stay f32. With f32 inputs the math
    # is bit-identical to before, so the fp32 parity tests are unaffected.
    g = g_ref[...].astype(jnp.float32)  # [CH, N, C]

    # ---- MLP branch: out = x1 + s2 * (gelu(h2 W1 + b1) W2 + b2)
    dm32 = (g * s2 if s2 is not None else g).reshape(CH * N, C)
    dm = dm32.astype(dtype)
    ge = inter["ge"]  # [CH*N, HID] dtype
    dwm2_ref[...] += jax.lax.dot_general(
        ge, dm, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbm2_ref[...] += jnp.sum(dm32, axis=0)
    dge = jax.lax.dot_general(
        dm, wm2_ref[...].astype(dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [CH*N, HID] f32
    y1 = inter["y1"]  # f32
    # gelu'(y) = Phi(y) + y * phi(y)
    phi_cdf = 0.5 * (1.0 + _erf_approx(y1 * _SQRT_HALF))
    phi_pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * y1 * y1)
    dy1_32 = dge * (phi_cdf + y1 * phi_pdf)
    dy1 = dy1_32.astype(dtype)
    h2f = inter["h2"].reshape(CH * N, C)  # dtype
    dwm1_ref[...] += jax.lax.dot_general(
        h2f, dy1, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbm1_ref[...] += jnp.sum(dy1_32, axis=0)
    dh2 = jax.lax.dot_general(
        dy1, wm1_ref[...].astype(dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(CH, N, C)

    dx1_ln, dln2s, dln2b = _ln_bwd(dh2, inter["xhat2"], inter["rstd2"], ln2s_ref[...])
    dln2s_ref[...] += dln2s
    dln2b_ref[...] += dln2b
    dx1 = g + dx1_ln  # [CH, N, C] f32

    # ---- attention branch: x1 = x + s1 * (a Wproj + bproj)
    do32 = (dx1 * s1 if s1 is not None else dx1).reshape(CH * N, C)
    do = do32.astype(dtype)
    af = inter["a"].reshape(CH * N, C)  # dtype
    dwproj_ref[...] += jax.lax.dot_general(
        af, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbproj_ref[...] += jnp.sum(do32, axis=0)
    da = jax.lax.dot_general(
        do, wproj_ref[...].astype(dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(CH, N, C)

    qkv = inter["qkv"]
    q = qkv[:, :, :C]
    scale = d**-0.5

    # head-packed attention backward: the forward recompute already holds
    # p [CH, N, h*N] f32 and kbig/vbig [CH, h*N, C] (head-blocked, masked).
    # Per-head dots become ONE batched dot each; gradients that land in the
    # blocked layout (dv, dk) are folded back to [CH, N, C] by summing the
    # hmask-selected head blocks (each channel is nonzero in exactly one).
    p = inter["p"]
    kbig = inter["kbig"]
    vbig = inter["vbig"]
    hmask32 = hmask_ref[...].astype(jnp.float32)
    p_lo = p.astype(dtype)
    da_lo = da.astype(dtype)

    dv_big = jax.lax.dot_general(
        p_lo, da_lo,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [CH, h*N, C] f32 (junk outside each block's channels)
    dp = jax.lax.dot_general(
        da_lo, vbig,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [CH, N, h*N] f32
    if h == 1:
        row = jnp.sum(dp * p, axis=-1, keepdims=True)
    else:
        row = jnp.concatenate(
            [
                jnp.broadcast_to(
                    jnp.sum(
                        (dp * p)[:, :, hi * N : (hi + 1) * N],
                        axis=-1, keepdims=True,
                    ),
                    (CH, N, N),
                )
                for hi in range(h)
            ],
            axis=-1,
        )
    ds32 = p * (dp - row)  # [CH, N, h*N]
    dbias_ref[...] += jnp.sum(ds32, axis=0)  # packed [N, h*N]
    ds = ds32.astype(dtype)

    dq = jax.lax.dot_general(
        ds, kbig,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # [CH, N, C] — kbig zeros select each channel's head block
    dk_big = jax.lax.dot_general(
        ds, q.astype(dtype),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [CH, h*N, C]

    def fold_blocks(big):
        if h == 1:
            return big * hmask32
        acc = None
        for hi in range(h):
            part = (
                big[:, hi * N : (hi + 1) * N, :]
                * hmask32[hi * N : (hi + 1) * N, :]
            )
            acc = part if acc is None else acc + part
        return acc

    dv = fold_blocks(dv_big)
    dk = fold_blocks(dk_big) * scale
    dqkv32 = jnp.concatenate([dq, dk, dv], axis=-1).reshape(CH * N, 3 * C)
    dqkv = dqkv32.astype(dtype)

    h1f = inter["h1"].reshape(CH * N, C)  # dtype
    dwqkv_ref[...] += jax.lax.dot_general(
        h1f, dqkv, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbqkv_ref[...] += jnp.sum(dqkv32, axis=0)
    dh1 = jax.lax.dot_general(
        dqkv, wqkv_ref[...].astype(dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(CH, N, C)

    dx_ln, dln1s, dln1b = _ln_bwd(dh1, inter["xhat1"], inter["rstd1"], ln1s_ref[...])
    dln1s_ref[...] += dln1s
    dln1b_ref[...] += dln1b
    dx_ref[...] = (dx1 + dx_ln).astype(dx_ref.dtype)


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

def _pick_chunk(B_: int, C: int, budget: int) -> int:
    chunk = max(1, min(budget // max(C, 1), B_))
    while B_ % chunk:
        chunk -= 1
    return chunk


def _param_specs(C: int, HID: int, num_heads: int, N: int):
    return [
        pl.BlockSpec((C,), lambda g: (0,)),
        pl.BlockSpec((C,), lambda g: (0,)),
        pl.BlockSpec((C, 3 * C), lambda g: (0, 0)),
        pl.BlockSpec((3 * C,), lambda g: (0,)),
        pl.BlockSpec((N, num_heads * N), lambda g: (0, 0)),  # packed bias
        pl.BlockSpec((num_heads * N, C), lambda g: (0, 0)),  # hmask
        pl.BlockSpec((C, C), lambda g: (0, 0)),
        pl.BlockSpec((C,), lambda g: (0,)),
        pl.BlockSpec((C,), lambda g: (0,)),
        pl.BlockSpec((C,), lambda g: (0,)),
        pl.BlockSpec((C, HID), lambda g: (0, 0)),
        pl.BlockSpec((HID,), lambda g: (0,)),
        pl.BlockSpec((HID, C), lambda g: (0, 0)),
        pl.BlockSpec((C,), lambda g: (0,)),
    ]


def _param_args(params: dict, bf, num_heads: int):
    import numpy as _np

    p32 = {k: params[k].astype(jnp.float32) for k in PARAM_KEYS}
    h, N, _ = params["rel_bias"].shape
    C = params["w_proj"].shape[0]
    d = C // num_heads
    # rel_bias [h, N, N] -> packed [N, h*N]; {0,1} head-block channel mask
    rel_packed = jnp.transpose(p32["rel_bias"], (1, 0, 2)).reshape(N, h * N)
    hm = _np.zeros((h * N, C), _np.float32)
    for hi in range(h):
        hm[hi * N : (hi + 1) * N, hi * d : (hi + 1) * d] = 1.0
    return (
        p32["ln1_scale"], p32["ln1_bias"],
        params["w_qkv"].astype(bf), p32["b_qkv"],
        rel_packed, jnp.asarray(hm, bf),
        params["w_proj"].astype(bf), p32["b_proj"],
        p32["ln2_scale"], p32["ln2_bias"],
        params["w_mlp1"].astype(bf), p32["b_mlp1"],
        params["w_mlp2"].astype(bf), p32["b_mlp2"],
    )


def _prep_scale_mask(x, mask_pw, s1, s2):
    B_ = x.shape[0]
    has_mask = mask_pw is not None
    has_scale = s1 is not None
    if not has_mask:
        mask_pw = jnp.zeros((B_, 1, 1), jnp.float32)
    if has_scale:
        s1 = s1.reshape(B_, 1, 1).astype(jnp.float32)
        s2 = s2.reshape(B_, 1, 1).astype(jnp.float32)
    else:
        # Mosaic block rule: last two dims must equal the array's (1, 1)
        s1 = s2 = jnp.zeros((B_, 1, 1), jnp.float32)
    return mask_pw.astype(jnp.float32), s1, s2, has_mask, has_scale


@functools.partial(
    jax.jit, static_argnames=("num_heads", "chunk", "interpret", "save_probs")
)
def _fwd_impl(x, mask_pw, s1, s2, params, num_heads, chunk, interpret,
              save_probs=False):
    """save_probs: ALSO emit the attention probabilities [B_, N, h*N] (in
    x.dtype) for the backward kernel — used by the vjp forward only, so the
    eval/primal forward never pays the extra HBM write."""
    B_, N, C = x.shape
    HID = params["w_mlp1"].shape[1]
    mask_pw, s1p, s2p, has_mask, has_scale = _prep_scale_mask(x, mask_pw, s1, s2)
    if chunk is None:
        chunk = _pick_chunk(B_, C, TUNE["fwd_budget"])  # VMEM: fwd ~18M at 4096 w/ mask
    mask_block = (
        pl.BlockSpec((chunk, N, N), lambda g: (g, 0, 0))
        if has_mask
        else pl.BlockSpec((chunk, 1, 1), lambda g: (g, 0, 0))
    )
    kernel = functools.partial(
        _train_fwd_kernel, num_heads=num_heads, has_mask=has_mask,
        has_scale=has_scale,
    )
    out_specs = pl.BlockSpec((chunk, N, C), lambda g: (g, 0, 0))
    out_shape = jax.ShapeDtypeStruct((B_, N, C), x.dtype)
    if save_probs:
        out_specs = [
            out_specs,
            pl.BlockSpec((chunk, N, num_heads * N), lambda g: (g, 0, 0)),
        ]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((B_, N, num_heads * N), x.dtype),
        ]
    return pl.pallas_call(
        kernel,
        grid=(B_ // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, N, C), lambda g: (g, 0, 0)),
            mask_block,
            pl.BlockSpec((chunk, 1, 1), lambda g: (g, 0, 0)),
            pl.BlockSpec((chunk, 1, 1), lambda g: (g, 0, 0)),
        ] + _param_specs(C, HID, num_heads, N),
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else vmem_params(TUNE["fwd_vmem_mb"]),
    )(x, mask_pw, s1p, s2p, *_param_args(params, x.dtype, num_heads))


@functools.partial(
    jax.jit, static_argnames=("num_heads", "chunk", "interpret")
)
def _bwd_impl(x, mask_pw, s1, s2, params, g, p, num_heads, chunk, interpret):
    B_, N, C = x.shape
    HID = params["w_mlp1"].shape[1]
    mask_pw, s1p, s2p, has_mask, has_scale = _prep_scale_mask(x, mask_pw, s1, s2)
    if chunk is None:
        # bwd VMEM budget: the f32 MLP intermediates (y1/dge) scale with
        # chunk*N*HID; measured limits: chunk 16@C=64 / 8@C=128 / 4@C=256 fit
        # the 16M scoped-vmem budget, one step up OOMs — unless bwd_vmem_mb
        # raises the Mosaic limit (see ops/tuning.py)
        chunk = _pick_chunk(B_, C, TUNE["bwd_budget"])
    mask_block = (
        pl.BlockSpec((chunk, N, N), lambda g_: (g_, 0, 0))
        if has_mask
        else pl.BlockSpec((chunk, 1, 1), lambda g_: (g_, 0, 0))
    )
    kernel = functools.partial(
        _train_bwd_kernel, num_heads=num_heads, has_mask=has_mask,
        has_scale=has_scale,
    )
    f32 = jnp.float32
    out_shapes = [
        jax.ShapeDtypeStruct((B_, N, C), f32),          # dx
        jax.ShapeDtypeStruct((C,), f32),                # dln1_scale
        jax.ShapeDtypeStruct((C,), f32),                # dln1_bias
        jax.ShapeDtypeStruct((C, 3 * C), f32),          # dw_qkv
        jax.ShapeDtypeStruct((3 * C,), f32),            # db_qkv
        jax.ShapeDtypeStruct((N, num_heads * N), f32),  # drel_bias (packed)
        jax.ShapeDtypeStruct((C, C), f32),              # dw_proj
        jax.ShapeDtypeStruct((C,), f32),                # db_proj
        jax.ShapeDtypeStruct((C,), f32),                # dln2_scale
        jax.ShapeDtypeStruct((C,), f32),                # dln2_bias
        jax.ShapeDtypeStruct((C, HID), f32),            # dw_mlp1
        jax.ShapeDtypeStruct((HID,), f32),              # db_mlp1
        jax.ShapeDtypeStruct((HID, C), f32),            # dw_mlp2
        jax.ShapeDtypeStruct((C,), f32),                # db_mlp2
    ]
    acc = lambda *shape: pl.BlockSpec(shape, lambda g_: (0,) * len(shape))
    out_specs = [
        pl.BlockSpec((chunk, N, C), lambda g_: (g_, 0, 0)),
        acc(C), acc(C), acc(C, 3 * C), acc(3 * C),
        acc(N, num_heads * N), acc(C, C), acc(C),
        acc(C), acc(C), acc(C, HID), acc(HID), acc(HID, C), acc(C),
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(B_ // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, N, C), lambda g_: (g_, 0, 0)),
            mask_block,
            pl.BlockSpec((chunk, 1, 1), lambda g_: (g_, 0, 0)),
            pl.BlockSpec((chunk, 1, 1), lambda g_: (g_, 0, 0)),
            pl.BlockSpec((chunk, N, C), lambda g_: (g_, 0, 0)),
            pl.BlockSpec((chunk, N, num_heads * N), lambda g_: (g_, 0, 0)),
        ] + _param_specs(C, HID, num_heads, N),
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=None if interpret else vmem_params(TUNE["bwd_vmem_mb"]),
    )(x, mask_pw, s1p, s2p, g, p, *_param_args(params, x.dtype, num_heads))
    dx = outs[0].astype(x.dtype)
    keys = [k for k in PARAM_KEYS]
    dparams = {k: outs[1 + i] for i, k in enumerate(keys)}
    # unpack drel_bias [N, h*N] -> [h, N, N]
    dparams["rel_bias"] = jnp.transpose(
        dparams["rel_bias"].reshape(N, num_heads, N), (1, 0, 2)
    )
    dparams = {k: v.astype(params[k].dtype) for k, v in dparams.items()}
    return dx, dparams


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def swin_block_train(x, mask_pw, s1, s2, params, num_heads, chunk=None,
                     interpret=False):
    """Differentiable fused Swin block.

    x: [B_, N, C] windows; mask_pw: [B_, N, N] additive SW-MSA mask or None;
    s1/s2: [B_] droppath branch scales or None (both or neither);
    params: dict with PARAM_KEYS. Gradients flow to x and params only.
    """
    return _fwd_impl(x, mask_pw, s1, s2, params, num_heads, chunk, interpret)


def _vjp_fwd(x, mask_pw, s1, s2, params, num_heads, chunk, interpret):
    out, p = _fwd_impl(
        x, mask_pw, s1, s2, params, num_heads, chunk, interpret,
        save_probs=True,
    )
    return out, (x, mask_pw, s1, s2, params, p)


def _vjp_bwd(num_heads, chunk, interpret, res, g):
    x, mask_pw, s1, s2, params, p = res
    dx, dparams = _bwd_impl(
        x, mask_pw, s1, s2, params, g, p, num_heads, chunk, interpret
    )
    dmask = None if mask_pw is None else jnp.zeros_like(mask_pw)
    ds1 = None if s1 is None else jnp.zeros_like(s1)
    ds2 = None if s2 is None else jnp.zeros_like(s2)
    return dx, dmask, ds1, ds2, dparams


swin_block_train.defvjp(_vjp_fwd, _vjp_bwd)
