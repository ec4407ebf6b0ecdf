"""Fused PatchExpand depth-to-space + LayerNorm chain — Pallas TPU kernel.

The Swin-UNet decoder's PatchExpand (reference:
swin_backbone_modify_unetarchecture.py:437-521) is `dense(C -> 2C)` followed
by a 2x2 depth-to-space and one or two LayerNorms. As XLA ops the
depth-to-space lowers to a 6-d transpose pair (~0.95 ms/iter of the flagship
forward) plus a narrow-lane reshape (~0.31 ms) and the LN chain re-reads the
full map (~0.76 ms at [8,76800,32]).

This kernel removes the transpose entirely. Key identity: with the expand
output y viewed as [B, H, W, (i, j, c)] (i/j = row/col sub-position, c = out
channels), the lane-half split y_i = y[..., i*2C4:(i+1)*2C4] followed by
`reshape(B, H, 2W, C4)` is CONTIGUOUS in row-major order ((w, (j, c)) ->
((w, j), c)) — XLA lowers it as a single relayout copy, not a transpose.
The remaining work — interleaving the two row-halves into output rows
(2h, 2h+1) — is done by the output BlockSpec: each grid step reads one
H-row from each half and writes a contiguous 2-row slab of the output.
Inside the kernel everything is leading-dim stacking (no lane/sublane shape
casts, which this Mosaic version cannot lower — see the measured dead end in
models/fast_inference.py:_patch_expand round 2).

The kernel also optionally fuses the LayerNorm chain (PatchExpand.norm +
stage norm_up) and a trailing per-token dense head (the decoder's
linear_end, used at the last expand where the C4=32 LN output has no other
consumer) so the narrow-lane map makes one HBM round trip total.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _kernel(
    y0_ref, y1_ref, s1_ref, b1_ref, s2_ref, b2_ref, wh_ref, bh_ref,
    *outs, two, head, emit_ln, eps,
):
    C4 = y0_ref.shape[-1]
    # LN stats on the MXU: mean = v @ (11^T/C) lands broadcast across lanes
    # in ONE matmul instead of a lane-reduce + broadcast VPU chain (the
    # kernel is VPU-bound at these narrow widths: C4 = 32..128 lanes)
    avg = jnp.full((C4, C4), 1.0 / C4, jnp.float32)

    def ln(v, s_ref, b_ref):
        mu = jax.lax.dot_general(
            v, avg, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d = v - mu
        var = jax.lax.dot_general(
            d * d, avg, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return d * jax.lax.rsqrt(var + eps) * s_ref[...] + b_ref[...]

    def chain(ref):
        v = ref[...].astype(jnp.float32)
        v = ln(v, s1_ref, b1_ref)
        if two:
            v = ln(v, s2_ref, b2_ref)
        return v

    # the two row-halves are processed independently and stored into the
    # interleaved output via its [G, 2, 2W, C4] block view — no in-kernel
    # stack temp, no lane/sublane shape casts
    for i, ref in enumerate((y0_ref, y1_ref)):
        v = chain(ref)  # [G, 2W, C4] f32
        oi = 0
        if emit_ln:
            outs[oi][:, i] = v.astype(outs[oi].dtype)
            oi += 1
        if head:
            w = wh_ref[...]
            z = jax.lax.dot_general(
                v.astype(w.dtype), w,
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bh_ref[...].astype(jnp.float32)
            outs[oi][:, i] = z.astype(outs[oi].dtype)


@functools.partial(
    jax.jit, static_argnames=("H", "W", "emit_ln", "interpret")
)
def patch_expand_ln(
    y: jnp.ndarray,
    H: int,
    W: int,
    scale1: jnp.ndarray,
    bias1: jnp.ndarray,
    scale2: Optional[jnp.ndarray] = None,
    bias2: Optional[jnp.ndarray] = None,
    w_head: Optional[jnp.ndarray] = None,
    b_head: Optional[jnp.ndarray] = None,
    emit_ln: bool = True,
    interpret: bool = False,
):
    """Depth-to-space + LN chain (+ optional dense head) on the expand output.

    y: [B, H*W, Ce] — the PatchExpand dense output (Ce = 4*C4, lanes ordered
    (i, j, c)). Returns a tuple of the requested outputs, each
    [B, 4*H*W, C4 or C_head], matching
        t = y.reshape(B,H,W,2,2,C4).transpose(0,1,3,2,4,5).reshape(B,4HW,C4)
        ln_out = LN2(LN1(t));  head_out = ln_out @ w_head + b_head
    """
    B, L, Ce = y.shape
    assert L == H * W and Ce % 4 == 0
    C4 = Ce // 4
    f32 = jnp.float32
    two = scale2 is not None
    head = w_head is not None
    assert emit_ln or head

    y4 = y.reshape(B, H, W, Ce)
    # contiguous lane-half split: [B, H, W, 2*C4] -> [B*H, 2W, C4]
    y0 = y4[..., : Ce // 2].reshape(B * H, 2 * W, C4)
    y1 = y4[..., Ce // 2 :].reshape(B * H, 2 * W, C4)

    rows = B * H
    # rows per grid step: the Mosaic scoped-vmem budget is 16 MB and the LN
    # chain's f32 temporaries cost several copies of the per-half block, so
    # size the per-half block to ~3 MB of f32 working set (measured: one
    # whole-block stack temp at 4 MB OOMs with 17.8M scoped)
    target = max(1, (6 << 20) // (2 * W * C4 * 4 * 4))  # TEMP-AB
    G = min(target, rows)
    while rows % G:
        G -= 1

    s1 = scale1.astype(f32)
    b1 = bias1.astype(f32)
    s2 = scale2.astype(f32) if two else s1
    b2 = bias2.astype(f32) if two else b1
    if head:
        wh = w_head.astype(y.dtype)
        bh = b_head.astype(f32)
        Chead = wh.shape[1]
    else:  # placeholders (unread)
        wh = jnp.zeros((C4, 8), y.dtype)
        bh = jnp.zeros((8,), f32)
        Chead = 8

    # outputs in a [rows, 2, 2W, C] layout — contiguous-identical to the
    # final [2*rows, 2W, C] (leading dims only), so the trailing reshape is
    # layout-free
    out_shapes = []
    out_specs = []
    if emit_ln:
        out_shapes.append(jax.ShapeDtypeStruct((rows, 2, 2 * W, C4), y.dtype))
        out_specs.append(pl.BlockSpec((G, 2, 2 * W, C4), lambda g: (g, 0, 0, 0)))
    if head:
        out_shapes.append(jax.ShapeDtypeStruct((rows, 2, 2 * W, Chead), y.dtype))
        out_specs.append(pl.BlockSpec((G, 2, 2 * W, Chead), lambda g: (g, 0, 0, 0)))

    outs = pl.pallas_call(
        functools.partial(
            _kernel, two=two, head=head, emit_ln=emit_ln, eps=1e-6
        ),
        grid=(rows // G,),
        in_specs=[
            pl.BlockSpec((G, 2 * W, C4), lambda g: (g, 0, 0)),
            pl.BlockSpec((G, 2 * W, C4), lambda g: (g, 0, 0)),
            pl.BlockSpec((C4,), lambda g: (0,)),
            pl.BlockSpec((C4,), lambda g: (0,)),
            pl.BlockSpec((C4,), lambda g: (0,)),
            pl.BlockSpec((C4,), lambda g: (0,)),
            pl.BlockSpec(wh.shape, lambda g: (0, 0)),
            pl.BlockSpec(bh.shape, lambda g: (0,)),
        ],
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
        out_shape=out_shapes if len(out_shapes) > 1 else out_shapes[0],
        interpret=interpret,
    )(y0, y1, s1, b1, s2, b2, wh, bh)

    if not isinstance(outs, (tuple, list)):
        outs = (outs,)
    return tuple(o.reshape(B, 4 * H * W, o.shape[-1]) for o in outs)


def patch_expand_supported(Ce: int) -> bool:
    return _HAS_PALLAS and Ce % 4 == 0 and (Ce // 4) % 8 == 0
