"""Fused window multi-head attention — Pallas TPU kernel.

The Swin backbone's hot loop is W-MSA over thousands of tiny windows
(N = window^2 = 64 tokens, head_dim 16): as separate XLA ops the [B_, h, N, N]
fp32 score tensor makes multiple HBM round trips (scores + bias + mask +
softmax + AV). This kernel keeps a chunk of windows' QKV in VMEM and runs
scores -> bias/mask -> softmax -> AV without touching HBM in between.

Inputs:
    qkv:   [B_, N, 3C]  (post qkv-projection, heads packed in C)
    bias:  [h, N, N]    relative-position bias (broadcast over windows)
    mask:  [nW, N, N]   SW-MSA region mask (window w uses mask[w % nW]) or None

The SW-MSA mask is expanded to per-window form [B_, N, N] once in XLA (cheap
gather, read tile-by-tile by the kernel) so all kernel indexing stays static.

Reference behavior being fused: swin_...py WindowAttention.forward:117-148.
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


def window_attention_reference(
    qkv: jnp.ndarray,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    num_heads: int,
    scale: float,
) -> jnp.ndarray:
    """jnp ground truth (mirrors models/backbone_swin.WindowAttention math)."""
    B_, N, C3 = qkv.shape
    C = C3 // 3
    h = num_heads
    d = C // h
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B_, N, h, d).transpose(0, 2, 1, 3)
    k = k.reshape(B_, N, h, d).transpose(0, 2, 1, 3)
    v = v.reshape(B_, N, h, d).transpose(0, 2, 1, 3)
    attn = jnp.einsum(
        "bhnd,bhmd->bhnm", q * scale, k, preferred_element_type=jnp.float32
    )
    attn = attn + bias[None].astype(attn.dtype)
    if mask is not None:
        nW = mask.shape[0]
        wid = jnp.arange(B_) % nW
        attn = attn + mask[wid][:, None].astype(attn.dtype)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum(
        "bhnm,bhmd->bhnd", attn.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.transpose(0, 2, 1, 3).reshape(B_, N, C).astype(qkv.dtype)


def _wmsa_kernel(qkv_ref, bias_ref, out_ref, *, num_heads, scale):
    """Unmasked W-MSA: one grid step = one chunk of windows, all heads."""
    _wmsa_body(qkv_ref, bias_ref, None, out_ref, num_heads, scale)


def _wmsa_masked_kernel(qkv_ref, bias_ref, mask_ref, out_ref, *, num_heads, scale):
    """SW-MSA with per-window additive mask tile [chunk, N, N]."""
    _wmsa_body(qkv_ref, bias_ref, mask_ref, out_ref, num_heads, scale)


def _wmsa_body(qkv_ref, bias_ref, mask_ref, out_ref, num_heads, scale):
    N = qkv_ref.shape[1]
    C = qkv_ref.shape[2] // 3
    h = num_heads
    d = C // h

    qkv = qkv_ref[...]
    q = qkv[:, :, :C]
    k = qkv[:, :, C : 2 * C]
    v = qkv[:, :, 2 * C :]
    mask = mask_ref[...] if mask_ref is not None else None

    for hi in range(h):
        qh = q[:, :, hi * d : (hi + 1) * d]
        kh = k[:, :, hi * d : (hi + 1) * d]
        vh = v[:, :, hi * d : (hi + 1) * d]
        s = jax.lax.dot_general(
            qh,
            kh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [chunk, N, N] fp32
        s = s * scale + bias_ref[hi][None]
        if mask is not None:
            s = s + mask
        p = jax.nn.softmax(s, axis=-1)
        o = jax.lax.dot_general(
            p.astype(vh.dtype),
            vh,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [chunk, N, d]
        out_ref[:, :, hi * d : (hi + 1) * d] = o.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "chunk", "interpret")
)
def window_attention_pallas(
    qkv: jnp.ndarray,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    num_heads: int,
    scale: float,
    chunk: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused W-MSA / SW-MSA. qkv [B_, N, 3C] -> [B_, N, C]."""
    B_, N, C3 = qkv.shape
    C = C3 // 3
    chunk = min(chunk, B_)
    while B_ % chunk:
        chunk -= 1

    bias = bias.astype(jnp.float32)
    common = dict(
        grid=(B_ // chunk,),
        out_specs=pl.BlockSpec((chunk, N, C), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B_, N, C), qkv.dtype),
        interpret=interpret,
    )
    if mask is None:
        kernel = functools.partial(_wmsa_kernel, num_heads=num_heads, scale=scale)
        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec((chunk, N, C3), lambda g: (g, 0, 0)),
                pl.BlockSpec((num_heads, N, N), lambda g: (0, 0, 0)),
            ],
            **common,
        )(qkv, bias)

    nW = mask.shape[0]
    wid = jnp.arange(B_) % nW
    mask_pw = mask.astype(jnp.float32)[wid]  # [B_, N, N] one-time XLA gather
    kernel = functools.partial(_wmsa_masked_kernel, num_heads=num_heads, scale=scale)
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec((chunk, N, C3), lambda g: (g, 0, 0)),
            pl.BlockSpec((num_heads, N, N), lambda g: (0, 0, 0)),
            pl.BlockSpec((chunk, N, N), lambda g: (g, 0, 0)),
        ],
        **common,
    )(qkv, bias, mask_pw)
