"""Fused coarse LoFTR transformer — streaming Pallas TPU kernels.

The coarse stage runs 8 linear-attention encoder layers over [B, 4800, 256]
features (reference /root/reference/network/module/transformer.py:59-97 with
attentions.py:19-46). As XLA ops the stage device-profiles at ~5.5 ms/iter
at the flagship operating point — dozens of small matmuls, layout copies and
f32 converts between them. Linear attention factorizes over tokens, so each
layer becomes TWO streaming kernels with everything else fused in:

  stats kernel  — stream KEY/VALUE token chunks; accumulate the cross-head
                  products KV = K^T V and KOnes = K^T 1 ([C, C] f32
                  accumulators revisited across grid steps).
  apply kernel  — stream QUERY token chunks; Q projection + elu feature map,
                  per-head normalizer and attention output from the stats,
                  merge + post-LN, concat-MLP FFN + post-LN, residual — one
                  HBM read and one write per token.

Numerics follow ops/attention.linear_attention exactly: elu+1 feature maps,
V pre-scaled by 1/S (bf16-overflow guard), KV cast to the activation dtype,
f32 normalizer Z = 1 / (Q . K_sum + eps), output scaled by S. The per-head
normalizer uses the KOnes-blockdiag trick of ops/pallas_fine_stage (each
head's K_sum replicated across its own lane block — no 32-wide lane slices).

Self layers run both images in one twin-stacked launch; cross layers keep
the reference's sequential ordering (feat1 attends the UPDATED feat0,
transformer.py:93-95).

Forward-only (no VJP): the training path uses the XLA attention.
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

from featurematching_tpu.ops.pallas_fine_stage import (
    _dot2,
    _elu1,
    _layer_values,
    _ln2d,
)

_EPS = 1e-6


def _stats_kernel(src_ref, wkv_ref, okv_ref, oko_ref, *, S, C):
    """Accumulate KV = K^T V (V pre-scaled by 1/S) and KOnes = K^T 1."""
    j = pl.program_id(1)
    blk = src_ref[...]
    chunk = blk.shape[1]
    s2 = blk.reshape(chunk, C)
    dtype = s2.dtype
    kv3 = _dot2(s2, wkv_ref[...])  # [chunk, 2C] f32
    K = _elu1(kv3[:, :C]).astype(dtype)
    V = (kv3[:, C:] * (1.0 / S)).astype(dtype)

    tcontract = (((0,), (0,)), ((), ()))
    KV = jax.lax.dot_general(
        K, V, tcontract, preferred_element_type=jnp.float32
    ).reshape(1, C, C)
    ones = jnp.ones((chunk, C), dtype)
    KOnes = jax.lax.dot_general(
        K, ones, tcontract, preferred_element_type=jnp.float32
    ).reshape(1, C, C)

    @pl.when(j == 0)
    def _init():
        okv_ref[...] = KV
        oko_ref[...] = KOnes

    @pl.when(j > 0)
    def _accum():
        okv_ref[...] += KV
        oko_ref[...] += KOnes


def _apply_kernel(
    x_ref, kv_ref, ko_ref, bm_ref,
    wq_ref, wmerge_ref, n1s_ref, n1b_ref, wmlp1_ref, wmlp2_ref, n2s_ref, n2b_ref,
    out_ref, *, S, C,
):
    blk = x_ref[...]
    chunk = blk.shape[1]
    x2 = blk.reshape(chunk, C)
    dtype = x2.dtype
    bm = bm_ref[...]

    qf = _dot2(x2, wq_ref[...])  # [chunk, C] f32
    Q = _elu1(qf).astype(dtype)
    kv = kv_ref[...].reshape(C, C)
    ko = ko_ref[...].reshape(C, C)
    KV_bd = (kv * bm).astype(dtype)  # attention.py:57 dtype cast
    # normalizer operands in the activation dtype: attention.py:58-61 keeps
    # K_sum in f32, but an f32 MXU dot is ~4x the passes of bf16 (device
    # A/B: 4.45 -> 4.36 ms for the 8-layer stage, same 1.4% bf16-level max
    # deviation vs the XLA path). The bf16 rounding of K_sum perturbs Z by
    # ~0.4% relative; f32 accumulation is unchanged.
    KO_bd = (ko * bm).astype(dtype)

    Z = _dot2(Q, KO_bd)  # [chunk, C] f32 — per-head K_sum, lane-replicated
    o = _dot2(Q, KV_bd)  # [chunk, C] f32
    o = o * (float(S) / (Z + _EPS))

    msg = _dot2(o.astype(dtype), wmerge_ref[...]).astype(dtype)
    msg = _ln2d(msg, n1s_ref[...], n1b_ref[...], dtype)

    wmlp1 = wmlp1_ref[...]
    y = _dot2(x2, wmlp1[:C]) + _dot2(msg, wmlp1[C:])  # [chunk, 2C] f32
    y = jnp.maximum(y, 0.0).astype(dtype)
    y = _dot2(y, wmlp2_ref[...]).astype(dtype)
    y = _ln2d(y, n2s_ref[...], n2b_ref[...], dtype)
    out_ref[...] = (x2 + y).reshape(1, chunk, C)


# trace-time tunable (benchmarks/chunk_sweep.py): fwd stats/apply chunk rows
TUNE = {"fwd_rows": 1600}


def _pick_chunk(n: int, c: int, target_rows: int | None = None) -> int:
    """Largest multiple-of-8 divisor of n at or below target_rows.

    Device sweep at [4, 4800, 256] bf16 (8-layer fwd stage): 240 = 5.26 ms,
    480 = 5.02, 600 = 4.60, 960 = 4.81, 1600 = 4.26, 2400 = 4.52. The bwd
    kernels pass their own smaller target (480 — scoped-vmem bound)."""
    if target_rows is None:
        target_rows = TUNE["fwd_rows"]
    best = 0
    for chunk in range(8, min(n, target_rows) + 1, 8):
        if n % chunk == 0:
            best = chunk
    return best


def coarse_transformer_supported(
    layer_names: Sequence[str], d_model: int, nhead: int, n_tokens: int
) -> bool:
    return (
        _HAS_PALLAS
        and d_model % 128 == 0
        and nhead >= 1
        and d_model % nhead == 0
        and (d_model // nhead) % 8 == 0
        and all(n in ("self", "cross") for n in layer_names)
        and _pick_chunk(n_tokens, d_model) >= 8
    )


def _full_spec(a):
    nd = a.ndim
    return pl.BlockSpec(a.shape, lambda g, j, _nd=nd: (0,) * _nd)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def _layer_stats(src, wkv, chunk, interpret):
    G, S, C = src.shape
    kern = functools.partial(_stats_kernel, S=S, C=C)
    return pl.pallas_call(
        kern,
        grid=(G, S // chunk),
        in_specs=[
            pl.BlockSpec((1, chunk, C), lambda g, j: (g, j, 0)),
            _full_spec(wkv),
        ],
        out_specs=(
            pl.BlockSpec((1, C, C), lambda g, j: (g, 0, 0)),
            pl.BlockSpec((1, C, C), lambda g, j: (g, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G, C, C), jnp.float32),
            jax.ShapeDtypeStruct((G, C, C), jnp.float32),
        ),
        interpret=interpret,
    )(src, wkv)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def _layer_apply(x, kv, ko, bm, wvals, chunk, interpret):
    G, N, C = x.shape
    wq, _, wmerge, n1s, n1b, wmlp1, wmlp2, n2s, n2b = wvals
    kern = functools.partial(_apply_kernel, S=N, C=C)
    operands = [wq, wmerge, n1s.reshape(1, C), n1b.reshape(1, C),
                wmlp1, wmlp2, n2s.reshape(1, C), n2b.reshape(1, C)]
    return pl.pallas_call(
        kern,
        grid=(G, N // chunk),
        in_specs=[
            pl.BlockSpec((1, chunk, C), lambda g, j: (g, j, 0)),
            pl.BlockSpec((1, C, C), lambda g, j: (g, 0, 0)),
            pl.BlockSpec((1, C, C), lambda g, j: (g, 0, 0)),
            _full_spec(bm),
        ] + [_full_spec(a) for a in operands],
        out_specs=pl.BlockSpec((1, chunk, C), lambda g, j: (g, j, 0)),
        out_shape=jax.ShapeDtypeStruct((G, N, C), x.dtype),
        interpret=interpret,
    )(x, kv, ko, bm, *operands)


def coarse_transformer_fused(
    feat0: jnp.ndarray,
    feat1: jnp.ndarray,
    tf_params: Dict,
    layer_names: Tuple[str, ...],
    nhead: int,
    chunk: int | None = None,
    interpret: bool = False,
):
    """Run the full alternating self/cross stack. feat*: [B, N, C]."""
    B, N, C = feat0.shape
    dtype = feat0.dtype
    d = C // nhead
    if chunk is None:
        chunk = _pick_chunk(N, C)

    head_of = np.arange(C) // d
    bm = jnp.asarray((head_of[:, None] == head_of[None, :]).astype(np.float32))

    # NOTE the apply kernel's S-scale assumes queries and keys share N — true
    # for this architecture (twin images at one resolution)
    for i, name in enumerate(layer_names):
        wvals = _layer_values(tf_params[f"layer_{i}"], dtype)
        wkv = wvals[1]
        if name == "self":
            stacked = jnp.concatenate([feat0, feat1], axis=0)
            kv, ko = _layer_stats(stacked, wkv, chunk, interpret)
            out = _layer_apply(stacked, kv, ko, bm, wvals, chunk, interpret)
            feat0, feat1 = out[:B], out[B:]
        else:  # cross — feat1 attends the UPDATED feat0 (transformer.py:93-95)
            kv1, ko1 = _layer_stats(feat1, wkv, chunk, interpret)
            feat0 = _layer_apply(feat0, kv1, ko1, bm, wvals, chunk, interpret)
            kv0, ko0 = _layer_stats(feat0, wkv, chunk, interpret)
            feat1 = _layer_apply(feat1, kv0, ko0, bm, wvals, chunk, interpret)
    return feat0, feat1
