"""Fully-fused Swin block — Pallas TPU kernel (inference).

Extends the fused window attention to the ENTIRE block:

    h   = LN1(x)
    o   = proj(W-MSA(qkv(h), rel_bias, shift_mask))
    x   = x + o
    out = x + mlp2(gelu(mlp1(LN2(x))))

computed per chunk of windows in VMEM. Compared to the XLA op-chain, this
removes ~6 HBM round trips of the [B_, N, C] activations per block and the
fp32 LayerNorm convert_reduce traffic the profiler attributed ~6 ms/iter to
(docs/ROADMAP.md). Window partition/reverse stay outside (pure permutations;
the residual algebra commutes with them, so block math in window space is
exact).

Forward-only (no VJP): training uses the XLA path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def swin_block_reference(
    x: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    params: dict,
    num_heads: int,
) -> jnp.ndarray:
    """jnp ground truth over window-space inputs [B_, N, C].

    params: ln1_scale, ln1_bias, w_qkv [C,3C], b_qkv, rel_bias [h,N,N],
    w_proj [C,C], b_proj, ln2_scale, ln2_bias, w_mlp1 [C,HID], b_mlp1,
    w_mlp2 [HID,C], b_mlp2. mask: [nW, N, N] additive or None.
    """
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
    if mask is not None:
        nW = mask.shape[0]
        wid = jnp.arange(B_) % nW
        attn = attn + mask[wid][:, None].astype(attn.dtype)
    attn = jax.nn.softmax(attn, axis=-1)
    o = jnp.einsum(
        "bhnm,bhmd->bhnd", attn.astype(dtype), v, preferred_element_type=jnp.float32
    ).astype(dtype)
    o = o.transpose(0, 2, 1, 3).reshape(B_, N, C)
    o = (o @ params["w_proj"].astype(dtype)) + params["b_proj"].astype(dtype)
    x = x + o

    h2 = ln(x, params["ln2_scale"], params["ln2_bias"])
    y = (h2 @ params["w_mlp1"].astype(dtype)) + params["b_mlp1"].astype(dtype)
    y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(dtype)
    y = (y @ params["w_mlp2"].astype(dtype)) + params["b_mlp2"].astype(dtype)
    return x + y


def _erf_approx(x):
    """Abramowitz & Stegun 7.1.26 rational approximation (|err| <= 1.5e-7).

    Mosaic has no erf/erfc lowering; this is pure VPU arithmetic and keeps
    the exact-GELU parity within fp32 noise.
    """
    # Mosaic lacks bf16 vector compares — keep the sign compare in f32 (a
    # no-op cast on the f32 path this kernel always takes; see the round-4
    # bf16-VPU dead-end note in _block_math)
    sign = jnp.sign(x.astype(jnp.float32)).astype(x.dtype)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _block_math(
    x, mask,
    ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, bias_ref, hmask_ref,
    wproj_ref, bproj_ref,
    ln2s_ref, ln2b_ref, wm1_ref, bm1_ref, wm2_ref, bm2_ref,
    *, num_heads,
):
    """Kernel-body math on VALUES: x [CH, N, C], mask [CH, N, N] f32 or
    None; weight refs as in swin_block_fused. Returns [CH, N, C]. Shared by
    the window-space kernel and the image-layout kernel below."""
    CH, N, C = x.shape
    h = num_heads
    d = C // h
    has_mask = mask is not None
    dtype = x.dtype

    def ln(v, s_ref, b_ref):
        v32 = v.astype(jnp.float32)
        mu = jnp.mean(v32, axis=-1, keepdims=True)
        var = jnp.mean((v32 - mu) ** 2, axis=-1, keepdims=True)
        out = (v32 - mu) * jax.lax.rsqrt(var + 1e-6)
        return (out * s_ref[...] + b_ref[...]).astype(dtype)

    hx = ln(x, ln1s_ref, ln1b_ref)
    hx2 = hx.reshape(CH * N, C)
    qkv = (
        jax.lax.dot_general(
            hx2, wqkv_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bqkv_ref[...].astype(jnp.float32)
    ).astype(dtype).reshape(CH, N, 3 * C)

    q = qkv[:, :, :C]
    k = qkv[:, :, C : 2 * C]
    v = qkv[:, :, 2 * C :]

    # Head-packed attention: one batched dot per window instead of one per
    # (window, head). Batched (CH, 64, d)@(CH, 64, d) dots with d = C/h of
    # 16 issue CH*h tiny MXU matmuls per grid step and were the measured
    # bottleneck (~4% MXU util). Instead stack all heads' keys along the
    # sublane axis with other heads' channels zeroed:
    #     K_big[b, hi*N+m, c] = k[b, m, c] * (c in head hi)
    # so  s = q @ K_big^T  gives s[b, n, hi*N+m] = s_hi[b, n, m] EXACTLY
    # (q's other-head channels multiply zeros). Same trick for V with the
    # output-lane mask, which also lands each head's output in its own lane
    # block — the per-head concat disappears. Extra FLOPs are zeros; MXU
    # issues drop h-fold and every VPU op runs at full lane width.
    # hmask_ref: precomputed {0,1} block mask [h*N, C], hmask[hi*N+m, c] =
    # (c in head hi); tile-then-multiply beats per-head where+concat (VPU).
    hmask = hmask_ref[...]
    kbig = (k if h == 1 else jnp.concatenate([k] * h, axis=1)) * hmask
    s = jax.lax.dot_general(
        q, kbig,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * (d**-0.5)  # [CH, N, h*N]
    s = s + bias_ref[...]  # packed [N, h*N]
    if has_mask:
        s = s + (mask if h == 1 else jnp.concatenate([mask] * h, axis=-1))
    # Per-head softmax over each N-wide lane block, restructured to avoid
    # 4x(max,exp,sum,div) lane-reduce chains: subtracting any per-row
    # constant is exact, so use ONE row max over all h*N lanes and ONE exp;
    # only the per-head denominators need h small lane-slice reduces.
    s = s - jnp.max(s, axis=-1, keepdims=True)
    # NOTE (round-4 measured dead end): running exp/divide/GELU in bf16
    # ("packed VPU") REGRESSES ~15% per block on this Mosaic — bf16
    # transcendentals are emulated via f32 with extra cast passes
    # (stage-0: 1.20 -> 1.38 ms). Keep the f32 chain.
    e = jnp.exp(s)
    if h == 1:
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
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
        p = (e / denom).astype(dtype)
    vbig = (v if h == 1 else jnp.concatenate([v] * h, axis=1)) * hmask
    acc = jax.lax.dot_general(
        p, vbig,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dtype)  # [CH, N, C], heads already in their lane blocks

    o2 = acc.reshape(CH * N, C)
    o2 = (
        jax.lax.dot_general(
            o2, wproj_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bproj_ref[...].astype(jnp.float32)
    ).astype(dtype)
    x = x + o2.reshape(CH, N, C)

    h2 = ln(x, ln2s_ref, ln2b_ref).reshape(CH * N, C)
    y = (
        jax.lax.dot_general(
            h2, wm1_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bm1_ref[...].astype(jnp.float32)
    )
    # exact gelu via the A&S erf approximation (Mosaic lowers neither erf
    # nor erfc); |erf err| <= 1.5e-7 keeps exact-GELU parity at fp32 noise
    y = (y * 0.5 * (1.0 + _erf_approx(y * 0.7071067811865476))).astype(dtype)
    y = (
        jax.lax.dot_general(
            y, wm2_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bm2_ref[...].astype(jnp.float32)
    ).astype(dtype)
    return x + y.reshape(CH, N, C)


def _block_kernel(
    x_ref, mask_ref,
    ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, bias_ref, hmask_ref,
    wproj_ref, bproj_ref,
    ln2s_ref, ln2b_ref, wm1_ref, bm1_ref, wm2_ref, bm2_ref,
    out_ref,
    *, num_heads, has_mask,
):
    out_ref[...] = _block_math(
        x_ref[...], mask_ref[...] if has_mask else None,
        ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, bias_ref, hmask_ref,
        wproj_ref, bproj_ref, ln2s_ref, ln2b_ref, wm1_ref, bm1_ref,
        wm2_ref, bm2_ref, num_heads=num_heads,
    )


@functools.partial(jax.jit, static_argnames=("num_heads", "chunk", "interpret"))
def swin_block_fused(
    x: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    params: dict,
    num_heads: int,
    chunk: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused block over window-space activations. x: [B_, N, C]."""
    B_, N, C = x.shape
    if chunk is None:
        # head-packed operands dominate VMEM: kbig/vbig bf16 [chunk, h*N, C]
        # + s/e f32 [chunk, N, h*N]; keep their sum under ~6.5 MB (the 16 MB
        # scoped-vmem limit roughly halves under Mosaic double buffering)
        chunk = max(1, int(6.5e6) // (num_heads * N * (4 * C + 8 * N)))
    chunk = min(chunk, B_)
    while B_ % chunk:
        chunk -= 1

    has_mask = mask is not None
    if has_mask:
        nW = mask.shape[0]
        wid = jnp.arange(B_) % nW
        mask_pw = mask.astype(jnp.float32)[wid]  # [B_, N, N]
    else:
        mask_pw = jnp.zeros((B_, 1, 1), jnp.float32)  # placeholder, unread

    HID = params["w_mlp1"].shape[1]
    f32 = jnp.float32
    p32 = {k: v.astype(f32) for k, v in params.items()}
    bf = x.dtype
    # pack rel_bias [h, N, N] -> [N, h*N]: packed[n, hi*N + m] = bias[hi, n, m]
    rel_packed = jnp.transpose(p32["rel_bias"], (1, 0, 2)).reshape(
        N, num_heads * N
    )
    d = C // num_heads
    import numpy as _np

    hm = _np.zeros((num_heads * N, C), _np.float32)
    for hi in range(num_heads):
        hm[hi * N : (hi + 1) * N, hi * d : (hi + 1) * d] = 1.0
    hmask = jnp.asarray(hm, bf)

    kernel = functools.partial(
        _block_kernel, num_heads=num_heads, has_mask=has_mask
    )
    mask_block = (
        pl.BlockSpec((chunk, N, N), lambda g: (g, 0, 0))
        if has_mask
        else pl.BlockSpec((chunk, 1, 1), lambda g: (g, 0, 0))
    )
    return pl.pallas_call(
        kernel,
        grid=(B_ // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, N, C), lambda g: (g, 0, 0)),
            mask_block,
            pl.BlockSpec((C,), lambda g: (0,)),
            pl.BlockSpec((C,), lambda g: (0,)),
            pl.BlockSpec((C, 3 * C), lambda g: (0, 0)),
            pl.BlockSpec((3 * C,), lambda g: (0,)),
            pl.BlockSpec((N, num_heads * N), lambda g: (0, 0)),
            pl.BlockSpec((num_heads * N, C), lambda g: (0, 0)),
            pl.BlockSpec((C, C), lambda g: (0, 0)),
            pl.BlockSpec((C,), lambda g: (0,)),
            pl.BlockSpec((C,), lambda g: (0,)),
            pl.BlockSpec((C,), lambda g: (0,)),
            pl.BlockSpec((C, HID), lambda g: (0, 0)),
            pl.BlockSpec((HID,), lambda g: (0,)),
            pl.BlockSpec((HID, C), lambda g: (0, 0)),
            pl.BlockSpec((C,), lambda g: (0,)),
        ],
        out_specs=pl.BlockSpec((chunk, N, C), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B_, N, C), x.dtype),
        interpret=interpret,
    )(
        x, mask_pw,
        p32["ln1_scale"], p32["ln1_bias"],
        params["w_qkv"].astype(bf), p32["b_qkv"],
        rel_packed, hmask,
        params["w_proj"].astype(bf), p32["b_proj"],
        p32["ln2_scale"], p32["ln2_bias"],
        params["w_mlp1"].astype(bf), p32["b_mlp1"],
        params["w_mlp2"].astype(bf), p32["b_mlp2"],
    )


# ---------------------------------------------------------------------------
# Image-layout fused block: window partition / reverse / roll absorbed.
# ---------------------------------------------------------------------------

import numpy as np


@functools.lru_cache(maxsize=None)
def pad_region_masks(Hp2: int, Wp2: int, w: int, shift: int) -> np.ndarray:
    """Additive SW-MSA masks for the PAD formulation, [3, nWw, N, N] f32.

    Equivalence to roll+_shift_attn_mask (backbone_swin.py:51): rolling by
    -shift then partitioning at multiples of w groups tokens at original-
    coordinate boundaries == shift (mod w); padding the top/left by
    (w - shift) instead places the SAME boundaries at padded multiples of w
    (offset by exactly one window), with the wrapped tokens replaced by pad
    zeros. Every real-real attention pair allowed by the roll-land mask has
    both tokens in the same pad-land window at the SAME within-window
    positions (so rel_bias agrees), and every pair the roll-land mask
    forbids (-100) is either forbidden here too or replaced by a masked pad
    token — softmax contributions exp(-100+s) underflow to 0 either way, so
    real-token outputs are identical.

    Args use PAD-land dims: Hp2/Wp2 = (w-shift) + roll-land padded H/W +
    shift. Region bands per axis on original coords y: [0, shift) -> 2,
    [Hp-w+shift, Hp) -> 1, else 0 (matching _shift_attn_mask's slices);
    pad coords get band 3 (isolated). Returns masks for window-row 0,
    middle rows, and the last row (columns enumerated per window).
    """
    N = w * w

    def bands(P2: int) -> np.ndarray:
        Hp = P2 - w  # roll-land content size (multiple of w)
        top = w - shift
        b = np.full(P2, 3, np.int32)  # pad
        y = np.arange(P2) - top
        content = (y >= 0) & (y < Hp)
        b = np.where(content & (y < shift), 2, b)
        b = np.where(content & (y >= shift) & (y < Hp - w + shift), 0, b)
        b = np.where(content & (y >= Hp - w + shift), 1, b)
        return b

    rb = bands(Hp2)  # [Hp2]
    cb = bands(Wp2)  # [Wp2]
    region = rb[:, None] * 4 + cb[None, :]  # [Hp2, Wp2]
    nwh, nww = Hp2 // w, Wp2 // w
    win = (
        region.reshape(nwh, w, nww, w).transpose(0, 2, 1, 3).reshape(nwh, nww, N)
    )
    diff = win[:, :, None, :] - win[:, :, :, None]
    full = np.where(diff != 0, -100.0, 0.0).astype(np.float32)  # [nwh, nww, N, N]
    mid = full[1] if nwh > 2 else full[0]  # nwh >= 2 always (top pad row)
    return np.stack([full[0], mid, full[-1]])


def _image_kernel(
    x_ref, mask_ref,
    ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, bias_ref, hmask_ref,
    wproj_ref, bproj_ref,
    ln2s_ref, ln2b_ref, wm1_ref, bm1_ref, wm2_ref, bm2_ref,
    out_ref,
    *, num_heads, has_mask, window, cw,
):
    w = window
    blk = x_ref[0]  # [w, cw*w, C]
    C = blk.shape[-1]
    # in-VMEM window partition (the HBM copy this kernel exists to remove)
    xw = blk.reshape(w, cw, w, C).transpose(1, 0, 2, 3).reshape(cw, w * w, C)
    out = _block_math(
        xw, mask_ref[0] if has_mask else None,
        ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, bias_ref, hmask_ref,
        wproj_ref, bproj_ref, ln2s_ref, ln2b_ref, wm1_ref, bm1_ref,
        wm2_ref, bm2_ref, num_heads=num_heads,
    )
    out_ref[0] = (
        out.reshape(cw, w, w, C).transpose(1, 0, 2, 3).reshape(w, cw * w, C)
    )


@functools.partial(
    jax.jit, static_argnames=("num_heads", "window", "shift", "chunk_w", "interpret")
)
def swin_block_fused_image(
    xp: jnp.ndarray,
    params: dict,
    num_heads: int,
    window: int,
    shift: int,
    chunk_w: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused Swin block over PADDED image-layout activations [B, Hp2, Wp2, C].

    The caller pads: bottom/right to window multiples when shift == 0, or
    (w-shift) top/left + content-to-multiple + shift bottom/right when
    shift > 0 (see pad_region_masks), and slices the content back out.
    Window partition/reverse and the shifted roll never touch HBM: each grid
    step reads one [w, cw*w, C] row-band block and relayouts in VMEM.
    """
    B, Hp2, Wp2, C = xp.shape
    w = window
    N = w * w
    nwh, nww = Hp2 // w, Wp2 // w
    has_mask = shift > 0

    if chunk_w is None:
        budget = max(1, int(9e6) // (num_heads * N * (4 * C + 8 * N)))
        chunk_w = max(d for d in range(1, nww + 1) if nww % d == 0 and d <= budget)

    if has_mask:
        masks = jnp.asarray(pad_region_masks(Hp2, Wp2, w, shift))  # [3,nww,N,N]
    else:
        masks = jnp.zeros((3, nww, 1, 1), jnp.float32)  # placeholder, unread

    HID = params["w_mlp1"].shape[1]
    f32 = jnp.float32
    p32 = {k: v.astype(f32) for k, v in params.items()}
    bf = xp.dtype
    rel_packed = jnp.transpose(p32["rel_bias"], (1, 0, 2)).reshape(
        N, num_heads * N
    )
    d = C // num_heads
    hm = np.zeros((num_heads * N, C), np.float32)
    for hi in range(num_heads):
        hm[hi * N : (hi + 1) * N, hi * d : (hi + 1) * d] = 1.0
    hmask = jnp.asarray(hm, bf)

    kernel = functools.partial(
        _image_kernel, num_heads=num_heads, has_mask=has_mask,
        window=w, cw=chunk_w,
    )
    last = nwh - 1

    def mask_idx(b, r, c):
        return (jnp.where(r == 0, 0, jnp.where(r == last, 2, 1)), c, 0, 0)

    mask_block = (
        pl.BlockSpec((1, chunk_w, N, N), mask_idx)
        if has_mask
        else pl.BlockSpec((1, chunk_w, 1, 1), mask_idx)
    )
    return pl.pallas_call(
        kernel,
        grid=(B, nwh, nww // chunk_w),
        in_specs=[
            pl.BlockSpec((1, w, chunk_w * w, C), lambda b, r, c: (b, r, c, 0)),
            mask_block,
            pl.BlockSpec((C,), lambda b, r, c: (0,)),
            pl.BlockSpec((C,), lambda b, r, c: (0,)),
            pl.BlockSpec((C, 3 * C), lambda b, r, c: (0, 0)),
            pl.BlockSpec((3 * C,), lambda b, r, c: (0,)),
            pl.BlockSpec((N, num_heads * N), lambda b, r, c: (0, 0)),
            pl.BlockSpec((num_heads * N, C), lambda b, r, c: (0, 0)),
            pl.BlockSpec((C, C), lambda b, r, c: (0, 0)),
            pl.BlockSpec((C,), lambda b, r, c: (0,)),
            pl.BlockSpec((C,), lambda b, r, c: (0,)),
            pl.BlockSpec((C,), lambda b, r, c: (0,)),
            pl.BlockSpec((C, HID), lambda b, r, c: (0, 0)),
            pl.BlockSpec((HID,), lambda b, r, c: (0,)),
            pl.BlockSpec((HID, C), lambda b, r, c: (0, 0)),
            pl.BlockSpec((C,), lambda b, r, c: (0,)),
        ],
        out_specs=pl.BlockSpec((1, w, chunk_w * w, C), lambda b, r, c: (b, r, c, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hp2, Wp2, C), xp.dtype),
        interpret=interpret,
    )(
        xp, masks,
        p32["ln1_scale"], p32["ln1_bias"],
        params["w_qkv"].astype(bf), p32["b_qkv"],
        rel_packed, hmask,
        params["w_proj"].astype(bf), p32["b_proj"],
        p32["ln2_scale"], p32["ln2_bias"],
        params["w_mlp1"].astype(bf), p32["b_mlp1"],
        params["w_mlp2"].astype(bf), p32["b_mlp2"],
    )


def swin_block_image(
    x: jnp.ndarray,
    H: int,
    W: int,
    params: dict,
    num_heads: int,
    window: int,
    shift: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """One Swin block on [B, H*W, C] sequence-layout activations via the
    image-layout kernel: pad -> fused block -> slice. Replaces the
    pad/roll/window_partition/kernel/window_reverse/roll/slice chain
    (4-6 full-feature-map HBM copies per block) with pad + slice."""
    B, L, C = x.shape
    w = window
    xi = x.reshape(B, H, W, C)
    pad_b = (w - H % w) % w
    pad_r = (w - W % w) % w
    if shift > 0:
        top = w - shift
        xi = jnp.pad(
            xi, ((0, 0), (top, pad_b + shift), (top, pad_r + shift), (0, 0))
        )
        oi = swin_block_fused_image(
            xi, params, num_heads, w, shift, interpret=interpret
        )
        oi = oi[:, top : top + H, top : top + W]
    else:
        if pad_b or pad_r:
            xi = jnp.pad(xi, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        oi = swin_block_fused_image(
            xi, params, num_heads, w, 0, interpret=interpret
        )
        oi = oi[:, :H, :W]
    return oi.reshape(B, H * W, C)
