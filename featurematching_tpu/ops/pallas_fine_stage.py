"""Fully-fused fine stage — Pallas TPU kernel (inference).

Runs the ENTIRE fine refinement transformer in one kernel over chunks of
match windows resident in VMEM:

    for name, W_l in zip(layer_names, layers):   # e.g. ('self', 'cross')
        if name == 'self':
            w0 = enc(w0, w0, W_l); w1 = enc(w1, w1, W_l)
        else:  # cross — reference order: w1 attends to the UPDATED w0
            w0 = enc(w0, w1, W_l); w1 = enc(w1, w0, W_l)
    m0 = mix(w0); m1 = mix(w1)                   # learned ww->1 mixing

where `enc` is the LoFTR encoder layer (QKV projections without bias,
head-packed linear attention, merge + post-LN, concat-MLP FFN + post-LN,
residual) — the math of models/transformer.EncoderLayer with
ops/attention.linear_attention_packed, reference
/root/reference/network/module/transformer.py:6-57 and attentions.py:19-46.

The XLA op-chain for this stage is ~20 small [B*K, ww, C] ops, each an HBM
round trip; at the flagship operating point (4096 windows x 49 tokens x 64
channels) the device profiler attributes ~2.5 ms/iter to it. One kernel
removes all intermediate traffic.

Mosaic constraints honored (docs/ROADMAP.md "measured dead ends"): only
batched dots, leading-dim splits/merges, 64-aligned lane slices, lane
reductions, and leading/scalar broadcasts — no lane-dim shape casts, no
unit-dim insertion between sublane and lane axes, no mid-axis reductions.
Per-head (h=8, d=8) contractions are packed into full-channel [C, C] dots
with a block-diagonal mask, exactly as linear_attention_packed does at the
XLA level. The per-head normalizer is itself a pair of batched dots:

    KOnes = K^T @ 1      — every column c holds sum_n K[n, :]  ([C, C])
    Z     = Q @ (KOnes ⊙ blockdiag)   — Z[l, c] = sum_{d in head(c)}
                                           Q[l, d] * Ksum[d]

which lands each head's normalizer replicated across its own lane block with
no 8-wide lane slices and no [:, None, :] broadcasts.

Forward-only (no VJP): training uses the XLA path.
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

from featurematching_tpu.ops.tuning import vmem_params

_EPS = 1e-6  # linear-attention normalizer epsilon (ops/attention.py)

# trace-time tunables (benchmarks/chunk_sweep.py): fwd chunk VMEM budget in
# bytes-of-live-set (chunk derives from it) + Mosaic scoped-VMEM limit MiB
TUNE = {"fwd_budget": int(7e6), "fwd_vmem_mb": 0}


def _elu1(x):
    """elu(x) + 1 on f32 values (Mosaic-safe: exp + where only)."""
    return jnp.where(x > 0, x + 1.0, jnp.exp(x))


def _ln2d(v, s, b, dtype):
    """LayerNorm over lanes of [M, C] with f32 statistics (flax semantics)."""
    v32 = v.astype(jnp.float32)
    mu = jnp.mean(v32, axis=-1, keepdims=True)
    var = jnp.mean((v32 - mu) ** 2, axis=-1, keepdims=True)
    return ((v32 - mu) * jax.lax.rsqrt(var + 1e-6) * s + b).astype(dtype)


def _dot2(a, w):
    return jax.lax.dot_general(
        a, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _bdot(a, b, contract):
    """Batched dot over leading dim: a [G, ...], b [G, ...]."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=((contract[0], contract[1]), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _enc_math(x, src, wl, blockmask, kvmask, n_real):
    """One LoFTR encoder layer on VALUES. x/src: [CH, Np, C] bf16/f32.

    Np is the sublane-padded token count (Mosaic only lowers leading-dim
    reshape merges when the collapsed dim is a multiple of the 8-sublane
    tile; ww=49 is padded to 56 outside). kvmask [Np, C] zeroes the padded
    KEY/VALUE tokens so attention sums see exactly the n_real live tokens;
    padded QUERY rows produce finite junk that the caller slices off.
    """
    CH, Np, C = x.shape
    dtype = x.dtype
    wq, wkv, wmerge, n1s, n1b, wmlp1, wmlp2, n2s, n2b = wl

    x2 = x.reshape(CH * Np, C)
    s2 = src.reshape(CH * Np, C)
    qf = _dot2(x2, wq)  # [CH*Np, C] f32
    kv3 = _dot2(s2, wkv).reshape(CH, Np, 2 * C)  # f32
    Qb = _elu1(qf).astype(dtype).reshape(CH, Np, C)
    Kb = (_elu1(kv3[:, :, :C]) * kvmask).astype(dtype)
    # /n_real: low-precision overflow guard (attention.py:50)
    Vb = (kv3[:, :, C:] * (kvmask * (1.0 / n_real))).astype(dtype)

    # per-window cross-head products, block-diagonal kept: KV[g] = K^T V
    KV = _bdot(Kb, Vb, (((1,), (1,))))  # [CH, C, C] f32
    KV_bd = (KV * blockmask[None]).astype(dtype)

    # normalizer: KOnes[g, d, c] = Ksum[g, d] for all c; then
    # Z[g, l, c] = sum_{d in head(c)} Q[g, l, d] * Ksum[g, d]
    ones_b = jnp.ones((CH, Np, C), dtype)
    KOnes = _bdot(Kb, ones_b, (((1,), (1,))))  # [CH, C, C] f32
    KOnes_bd = (KOnes * blockmask[None]).astype(dtype)
    Z = _bdot(Qb, KOnes_bd, (((2,), (1,))))  # [CH, Np, C] f32

    o = _bdot(Qb, KV_bd, (((2,), (1,))))  # [CH, Np, C] f32
    o = o * (float(n_real) / (Z + _EPS))
    msg = _dot2(o.astype(dtype).reshape(CH * Np, C), wmerge).astype(dtype)
    msg = _ln2d(msg, n1s, n1b, dtype)

    # FFN on [x || msg]: split-weight form avoids the lane concat
    y = _dot2(x2, wmlp1[:C]) + _dot2(msg, wmlp1[C:])  # [CH*Np, 2C] f32
    y = jnp.maximum(y, 0.0).astype(dtype)
    y = _dot2(y, wmlp2).astype(dtype)
    y = _ln2d(y, n2s, n2b, dtype)
    return (x2 + y).reshape(CH, Np, C)


def _mix_math(w, mk_row, mb):
    """Learned ww->1 window mixing as ONE batched dot: [CH, Np, C] -> [CH, C].

    mk_row: [1, Np] mixing weights, zero at padded tokens (bf16 operands,
    f32 accumulation — the _WindowMix einsum semantics). mb: [1] f32 bias.
    """
    CH, Np, C = w.shape
    mk_b = jnp.broadcast_to(mk_row[None], (CH, 1, Np)).astype(w.dtype)
    acc = _bdot(mk_b, w, (((2,), (1,))))  # [CH, 1, C] f32
    # mb arrives pre-broadcast as [1, C] (a 1x1 -> CHxC vector.broadcast
    # does not lower on this Mosaic); only a sublane broadcast remains
    return acc.reshape(CH, C).astype(w.dtype) + mb.astype(w.dtype)


def _mix_acc3(w, mk_row, mb):
    """_mix_math keeping the [CH, 1, C] batched-dot form (same values)."""
    CH, Np, C = w.shape
    mk_b = jnp.broadcast_to(mk_row[None], (CH, 1, Np)).astype(w.dtype)
    acc = _bdot(mk_b, w, (((2,), (1,))))  # [CH, 1, C] f32
    return acc.astype(w.dtype) + mb.astype(w.dtype)  # [1, C] sublane-bcast


def _heat_math(m, win, padbias, temp):
    """Center-vs-window correlation + masked softmax (fine_matching_new.py:
    56-63 / matching/fine.fine_soft_argmax). m: [CH, 1, C] mixed centers,
    win: [CH, Np, C] windows. Returns [CH, 1, Np] f32 heatmaps; padded taps
    carry exactly zero mass (padbias = -1e9 at r >= n_real).

    The q@k^T-style batched dot (both operands contract their lane dim) is
    the standard Mosaic attention contraction; bf16 operands with f32
    accumulation reproduce the XLA path bit-wise up to summation order
    (bf16 products are exact in f32).
    """
    sim = _bdot(m, win, (((2,), (2,))))  # [CH, 1, Np] f32
    s = sim * temp + padbias[None]
    mx = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - mx)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fine_kernel(*refs, layer_names, n_real, fold):
    """refs: x0, x1, blockmask, kvmask, mk0, mb0, mk1, mb1, [padbias], then
    9 weight refs per layer, then outputs — (w0, w1, m0, m1) in the plain
    mode, (h0, h1) heatmaps in fold mode."""
    nl = len(layer_names)
    x0_ref, x1_ref = refs[0], refs[1]
    blockmask = refs[2][...]
    kvmask = refs[3][...]
    mk0, mb0, mk1, mb1 = (r[...] for r in refs[4:8])
    base = 8
    if fold:
        padbias = refs[8][...]
        base = 9
    wrefs = refs[base : base + 9 * nl]
    outs = refs[base + 9 * nl :]

    a0 = x0_ref[...]
    a1 = x1_ref[...]
    for i, name in enumerate(layer_names):
        wl = tuple(r[...] for r in wrefs[9 * i : 9 * (i + 1)])
        if name == "self":
            a0 = _enc_math(a0, a0, wl, blockmask, kvmask, n_real)
            a1 = _enc_math(a1, a1, wl, blockmask, kvmask, n_real)
        else:  # cross: a1 sees the UPDATED a0 (transformer.py order)
            a0 = _enc_math(a0, a1, wl, blockmask, kvmask, n_real)
            a1 = _enc_math(a1, a0, wl, blockmask, kvmask, n_real)
    if fold:
        C = a0.shape[-1]
        temp = 1.0 / (C**0.5)
        m0 = _mix_acc3(a0, mk0, mb0)
        m1 = _mix_acc3(a1, mk1, mb1)
        o_h0, o_h1 = outs
        o_h0[...] = _heat_math(m0, a1, padbias, temp)
        o_h1[...] = _heat_math(m1, a0, padbias, temp)
    else:
        o_w0, o_w1, o_m0, o_m1 = outs
        o_w0[...] = a0
        o_w1[...] = a1
        o_m0[...] = _mix_math(a0, mk0, mb0)
        o_m1[...] = _mix_math(a1, mk1, mb1)


def _layer_values(p: Dict, dtype):
    """Pack one EncoderLayer param subtree into kernel operand arrays."""
    wq = p["q_proj"]["kernel"].astype(dtype)
    wkv = jnp.concatenate(
        [p["k_proj"]["kernel"], p["v_proj"]["kernel"]], axis=1
    ).astype(dtype)
    return (
        wq,
        wkv,
        p["merge"]["kernel"].astype(dtype),
        p["norm1"]["scale"].astype(jnp.float32),
        p["norm1"]["bias"].astype(jnp.float32),
        p["mlp1"]["kernel"].astype(dtype),
        p["mlp2"]["kernel"].astype(dtype),
        p["norm2"]["scale"].astype(jnp.float32),
        p["norm2"]["bias"].astype(jnp.float32),
    )


def fine_stage_supported(layer_names: Sequence[str], d_model: int, nhead: int) -> bool:
    """Kernel applicability: lane-aligned channels, per-head lane blocks."""
    return (
        _HAS_PALLAS
        and d_model % 64 == 0
        and nhead >= 1
        and d_model % nhead == 0
        and len(layer_names) >= 1
        and all(n in ("self", "cross") for n in layer_names)
    )


@functools.partial(
    jax.jit,
    static_argnames=("layer_names", "nhead", "chunk", "interpret", "fold_softargmax"),
)
def fine_stage_fused(
    w0: jnp.ndarray,
    w1: jnp.ndarray,
    tf_params: Dict,
    mix0: Dict,
    mix1: Dict,
    layer_names: Tuple[str, ...],
    nhead: int,
    chunk: int | None = None,
    interpret: bool = False,
    fold_softargmax: bool = False,
):
    """Fused fine transformer + window mixing (+ optional soft-argmax fold).

    Args:
      w0, w1: [B_, N, C] fine windows (B_ = batch * K matches, N = ww).
      tf_params: LocalFeatureTransformer subtree ({'layer_0': {...}, ...}).
      mix0, mix1: _WindowMix subtrees ({'kernel': [N, 1], 'bias': [1]}).
      fold_softargmax: when True, also run the center-vs-window correlation
        and masked softmax of fine_matching_new.py:56-63 IN the kernel and
        return ONLY (heat0, heat1) [B_, N] f32 — the [B_, N, C] window
        writebacks (and their downstream XLA re-reads) are skipped entirely.
    Returns: (w0_out [B_, N, C], w1_out, m0 [B_, C], m1), or (heat0, heat1)
    in fold mode.
    """
    B_, N, C = w0.shape
    dtype = w0.dtype
    nl = len(layer_names)
    d = C // nhead

    # Mosaic lowers the in-kernel [CH, Np, C] <-> [CH*Np, C] reshape merges
    # only when the token dim is a multiple of the 8-sublane tile; pad ww=49
    # to 56 and mask the pads out of every attention sum (kvmask) and the
    # mixing weights. Padded QUERY rows compute finite junk (LN of zeros =
    # bias) that is sliced off below.
    Np = ((N + 7) // 8) * 8
    if Np != N:
        w0 = jnp.pad(w0, ((0, 0), (0, Np - N), (0, 0)))
        w1 = jnp.pad(w1, ((0, 0), (0, Np - N), (0, 0)))

    if chunk is None:
        # live set per chunk: a few [CH, Np, C] f32 intermediates + two
        # [CH, C, C] products; target ~7 MB under Mosaic double buffering
        # (device sweep at [4096, 49->56, 64]: chunk 32 = 3.96 ms, 64 =
        # 3.72 ms, 128 = scoped-vmem OOM at 23.6M/16M unless TUNE raises
        # fwd_vmem_mb)
        chunk = max(1, int(TUNE["fwd_budget"]) // (Np * C * 4 * 5 + 2 * C * C * 4))
    chunk = min(chunk, B_)
    while B_ % chunk:
        chunk -= 1
    # Mosaic requires 2-D output blocks [chunk, C] to have chunk % 8 == 0
    # unless chunk == B_ (full array). Prefer the largest multiple-of-8
    # divisor; else take the whole array in one grid step.
    if chunk != B_ and chunk % 8:
        c8 = chunk - (chunk % 8)
        while c8 >= 8 and B_ % c8:
            c8 -= 8
        chunk = c8 if c8 >= 8 else B_

    head_of = np.arange(C) // d
    blockmask = jnp.asarray(
        (head_of[:, None] == head_of[None, :]).astype(np.float32)
    )
    kvmask = jnp.asarray(
        np.broadcast_to((np.arange(Np) < N)[:, None], (Np, C)).astype(np.float32)
    )
    pad_k = [(0, Np - N), (0, 0)]
    mk0 = jnp.pad(mix0["kernel"], pad_k).reshape(1, Np).astype(dtype)
    mk1 = jnp.pad(mix1["kernel"], pad_k).reshape(1, Np).astype(dtype)
    mb0 = jnp.broadcast_to(mix0["bias"].astype(jnp.float32), (1, C))
    mb1 = jnp.broadcast_to(mix1["bias"].astype(jnp.float32), (1, C))

    layer_vals = []
    for i in range(nl):
        layer_vals.extend(_layer_values(tf_params[f"layer_{i}"], dtype))

    def spec_of(a):
        nd = a.ndim
        return pl.BlockSpec(a.shape, lambda g, _nd=nd: (0,) * _nd)

    extra = []
    if fold_softargmax:
        padbias = jnp.asarray(
            np.where(np.arange(Np) < N, 0.0, -1e9).astype(np.float32)
        ).reshape(1, Np)
        extra = [padbias]

    in_specs = [
        pl.BlockSpec((chunk, Np, C), lambda g: (g, 0, 0)),
        pl.BlockSpec((chunk, Np, C), lambda g: (g, 0, 0)),
        spec_of(blockmask), spec_of(kvmask),
        spec_of(mk0), spec_of(mb0), spec_of(mk1), spec_of(mb1),
    ] + [spec_of(a) for a in extra] + [spec_of(a) for a in layer_vals]

    kernel = functools.partial(
        _fine_kernel, layer_names=tuple(layer_names), n_real=N,
        fold=fold_softargmax,
    )
    if fold_softargmax:
        out_specs = (
            pl.BlockSpec((chunk, 1, Np), lambda g: (g, 0, 0)),
            pl.BlockSpec((chunk, 1, Np), lambda g: (g, 0, 0)),
        )
        out_shape = (
            jax.ShapeDtypeStruct((B_, 1, Np), jnp.float32),
            jax.ShapeDtypeStruct((B_, 1, Np), jnp.float32),
        )
    else:
        out_specs = (
            pl.BlockSpec((chunk, Np, C), lambda g: (g, 0, 0)),
            pl.BlockSpec((chunk, Np, C), lambda g: (g, 0, 0)),
            pl.BlockSpec((chunk, C), lambda g: (g, 0)),
            pl.BlockSpec((chunk, C), lambda g: (g, 0)),
        )
        out_shape = (
            jax.ShapeDtypeStruct((B_, Np, C), dtype),
            jax.ShapeDtypeStruct((B_, Np, C), dtype),
            jax.ShapeDtypeStruct((B_, C), dtype),
            jax.ShapeDtypeStruct((B_, C), dtype),
        )
    outs = pl.pallas_call(
        kernel,
        grid=(B_ // chunk,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else vmem_params(TUNE["fwd_vmem_mb"]),
    )(w0, w1, blockmask, kvmask, mk0, mb0, mk1, mb1, *extra, *layer_vals)
    if fold_softargmax:
        h0, h1 = outs
        # padded taps have exactly zero mass: slicing keeps sum == 1
        return h0.reshape(B_, Np)[:, :N], h1.reshape(B_, Np)[:, :N]
    w0f, w1f, m0, m1 = outs
    if Np != N:
        w0f = w0f[:, :N]
        w1f = w1f[:, :N]
    return w0f, w1f, m0, m1
