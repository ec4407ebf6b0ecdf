"""Differentiable fused fine transformer — Pallas forward + backward.

Completes the "every hot kernel differentiable" story: after the Swin block
(ops/pallas_swin_block_grad) and the coarse stack (ops/pallas_coarse_grad),
the training path's remaining per-op XLA transformer was the FINE stage —
[B*G, 49, 64] windows through ('self','cross') encoder layers (device
profile: part of the ~17 ms XLA-fusion bucket of the 72 ms train step).

Unlike the coarse stack, windows are tiny: an entire chunk of windows fits
VMEM, so there is no streaming-stats split — ONE forward kernel (the plain
mode of ops/pallas_fine_stage) and ONE backward kernel that

  * recomputes the forward layer-by-layer from the saved inputs, stashing
    only each layer's input activations in VMEM,
  * backprops through the layers in reverse (including the reference's
    sequential cross ordering: a1 attends the UPDATED a0 —
    transformer.py:93-95), with per-window attention products recomputed
    in-register, and
  * accumulates every weight gradient across the sequential grid.

Per-layer backward math (head-packed linear attention, kvmask = window-pad
mask, n = n_real tokens, eps = 1e-6):

  A    = Q KV_bd,  Z = Q KOnes_bd,  o = A * n/(Z+eps)
  dA   = do * n/(Z+eps),  dZ = -(do ⊙ o) / (Z + eps)
  dQ   = dA KV_bd^T + dZ KOnes_bd^T          (per-window batched dots)
  dKV  = Q^T dA ⊙ bm,   dKOnes = Q^T dZ ⊙ bm
  dK   = (V dKV^T + 1 rowsum(dKOnes)) ⊙ kvmask
  dV   = (K dKV) ⊙ kvmask / n

All dots use activation-dtype operands with f32 accumulation; with f32
inputs the math matches flax autodiff exactly (tested to 2e-4).
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
    _bdot,
    _dot2,
    _elu1,
    _layer_values,
    fine_stage_supported,
)
from featurematching_tpu.ops.tuning import vmem_params

_EPS = 1e-6


def _ln_fwd3(v_lo, s, b):
    """LN forward over lanes of [CH, Np, C]; returns (y_lo, xhat, rstd)."""
    v32 = v_lo.astype(jnp.float32)
    mu = jnp.mean(v32, axis=-1, keepdims=True)
    var = jnp.mean((v32 - mu) ** 2, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + 1e-6)
    xhat = (v32 - mu) * rstd
    return (xhat * s + b).astype(v_lo.dtype), xhat, rstd


def _ln_bwd3(dh, xhat, rstd, scale):
    """LN backward on [CH, Np, C] f32; dscale/dbias reduced to [1, C]."""
    dscale = jnp.sum(dh * xhat, axis=(0, 1))[None]
    dbias = jnp.sum(dh, axis=(0, 1))[None]
    dxhat = dh * scale
    mean1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    mean2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dv = rstd * (dxhat - mean1 - xhat * mean2)
    return dv, dscale, dbias


def _enc_fwd_stash(x, src, wl, bm, kvmask, n_real):
    """Forward of one encoder layer, returning (out, stash) where stash holds
    what the backward needs beyond (x, src). Must reproduce
    pallas_fine_stage._enc_math bit-for-bit."""
    CH, Np, C = x.shape
    dtype = x.dtype
    wq, wkv, wmerge, n1s, n1b, wmlp1, wmlp2, n2s, n2b = wl

    x2 = x.reshape(CH * Np, C)
    s2 = src.reshape(CH * Np, C)
    qf = _dot2(x2, wq)
    kv3 = _dot2(s2, wkv).reshape(CH, Np, 2 * C)
    Q = _elu1(qf).astype(dtype).reshape(CH, Np, C)
    K = (_elu1(kv3[:, :, :C]) * kvmask).astype(dtype)
    V = (kv3[:, :, C:] * (kvmask * (1.0 / n_real))).astype(dtype)

    KV = _bdot(K, V, (((1,), (1,))))  # [CH, C, C] f32
    KV_bd = (KV * bm[None]).astype(dtype)
    ones_b = jnp.ones((CH, Np, C), dtype)
    KOnes = _bdot(K, ones_b, (((1,), (1,))))
    KO_bd = (KOnes * bm[None]).astype(dtype)
    Z = _bdot(Q, KO_bd, (((2,), (1,))))  # [CH, Np, C] f32
    A = _bdot(Q, KV_bd, (((2,), (1,))))
    nfac = float(n_real) / (Z + _EPS)
    o_lo = (A * nfac).astype(dtype)
    m1_lo = _dot2(o_lo.reshape(CH * Np, C), wmerge).astype(dtype).reshape(CH, Np, C)
    msg, xhat1, rstd1 = _ln_fwd3(m1_lo, n1s, n1b)

    y1 = (
        _dot2(x2, wmlp1[:C]) + _dot2(msg.reshape(CH * Np, C), wmlp1[C:])
    )  # [CH*Np, 2C] f32
    h_lo = jnp.maximum(y1, 0.0).astype(dtype)
    y2_lo = _dot2(h_lo, wmlp2).astype(dtype).reshape(CH, Np, C)
    y, xhat2, rstd2 = _ln_fwd3(y2_lo, n2s, n2b)
    out = x + y
    stash = (qf, kv3, Q, K, V, KV_bd, KO_bd, Z, A, nfac, o_lo,
             xhat1, rstd1, msg, y1, h_lo, xhat2, rstd2)
    return out, stash


def _enc_bwd(x, src, dout, wl, bm, kvmask, n_real, stash, wacc):
    """Backward of one encoder layer. Returns (dx, dsrc); weight grads are
    ADDED into the `wacc` list of 9 f32 arrays (same order as wl)."""
    CH, Np, C = x.shape
    dtype = x.dtype
    wq, wkv, wmerge, n1s, n1b, wmlp1, wmlp2, n2s, n2b = wl
    (qf, kv3, Q, K, V, KV_bd, KO_bd, Z, A, nfac, o_lo,
     xhat1, rstd1, msg, y1, h_lo, xhat2, rstd2) = stash

    g = dout.astype(jnp.float32)
    x2 = x.reshape(CH * Np, C)
    s2 = src.reshape(CH * Np, C)

    # out = x + LN2(y2)
    dy2, dn2s, dn2b = _ln_bwd3(g, xhat2, rstd2, n2s)
    wacc[7] += dn2s
    wacc[8] += dn2b
    dy2_lo = dy2.astype(dtype).reshape(CH * Np, C)
    wacc[6] += jax.lax.dot_general(
        h_lo, dy2_lo, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dh = jax.lax.dot_general(
        dy2_lo, wmlp2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [CH*Np, 2C] f32
    dy1 = dh * (y1 > 0.0).astype(jnp.float32)
    dy1_lo = dy1.astype(dtype)
    msg2 = msg.reshape(CH * Np, C)
    wacc[5] += jnp.concatenate(
        [
            jax.lax.dot_general(x2, dy1_lo, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32),
            jax.lax.dot_general(msg2, dy1_lo, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32),
        ],
        axis=0,
    )
    dx2 = jax.lax.dot_general(
        dy1_lo, wmlp1[:C], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # d x through the FFN x-term, [CH*Np, C] f32
    dmsg = jax.lax.dot_general(
        dy1_lo, wmlp1[C:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(CH, Np, C)

    dm1, dn1s, dn1b = _ln_bwd3(dmsg, xhat1, rstd1, n1s)
    wacc[3] += dn1s
    wacc[4] += dn1b
    dm1_lo = dm1.astype(dtype).reshape(CH * Np, C)
    wacc[2] += jax.lax.dot_general(
        o_lo.reshape(CH * Np, C), dm1_lo, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    do = jax.lax.dot_general(
        dm1_lo, wmerge, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(CH, Np, C)

    dA = do * nfac
    o32 = A * nfac
    dZ = -(do * o32) / (Z + _EPS)
    dA_lo = dA.astype(dtype)
    dZ_lo = dZ.astype(dtype)
    dKV = (_bdot(Q, dA_lo, (((1,), (1,)))) * bm[None]).astype(dtype)  # [CH,C,C]
    dKO = (_bdot(Q, dZ_lo, (((1,), (1,)))) * bm[None]).astype(dtype)
    dQ = _bdot(dA_lo, KV_bd, (((2,), (2,)))) + _bdot(dZ_lo, KO_bd, (((2,), (2,))))
    dqf = (dQ.reshape(CH * Np, C)) * jnp.where(qf > 0, 1.0, jnp.exp(qf))
    dqf_lo = dqf.astype(dtype)
    wacc[0] += jax.lax.dot_general(
        x2, dqf_lo, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dx2 = dx2 + jax.lax.dot_general(
        dqf_lo, wq, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    # stats side: dK/dV from the per-window products
    dV = _bdot(K, dKV, (((2,), (1,))))  # [CH, Np, C] f32
    dK = _bdot(V, dKV, (((2,), (2,))))
    # rowsum(dKOnes) replicated over rows via a full-height ones dot — a
    # [CH,1,C] -> [CH,Np,C] sublane broadcast does NOT lower on this Mosaic
    # (vector_extract_slice check-fail, 7 tiles from 1)
    ones_b = jnp.ones((CH, Np, C), dtype)
    dK = dK + _bdot(ones_b, dKO, (((2,), (2,))))
    kf = kv3[:, :, :C]
    dkf = dK * kvmask * jnp.where(kf > 0, 1.0, jnp.exp(kf))
    dvraw = dV * (kvmask * (1.0 / n_real))
    dkv3_lo = jnp.concatenate(
        [dkf.astype(dtype), dvraw.astype(dtype)], axis=-1
    ).reshape(CH * Np, 2 * C)
    wacc[1] += jax.lax.dot_general(
        s2, dkv3_lo, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dsrc2 = jax.lax.dot_general(
        dkv3_lo, wkv, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    dx = g + dx2.reshape(CH, Np, C)
    return dx, dsrc2.reshape(CH, Np, C)


def _fine_bwd_kernel(*refs, layer_names, n_real, C, has_o0=False):
    """refs: x0, x1, g0, g1, [o0 if has_o0], blockmask, kvmask, then 9 weight
    refs per layer, then outputs dx0, dx1, then 9 weight-grad refs per layer.

    VMEM discipline: the forward replay stores ONLY each call's input
    activations (trace); the per-layer intermediate stash is recomputed
    inside the reverse sweep right before its _enc_bwd, so at most one
    call's stash is live at a time. Weight grads accumulate straight into
    the revisited output refs.

    has_o0 (round 5, single-cross-layer calls only): the cross layer's
    first output o0 = enc(a0, a1) is ALREADY a forward output (the per-layer
    fwd saves every layer boundary), so the caller passes it in and the
    whole replay sweep is skipped — one fewer _enc_fwd_stash recompute
    (~0.6 ms/step at the flagship shape)."""
    nl = len(layer_names)
    x0 = refs[0][...]
    x1 = refs[1][...]
    g0 = refs[2][...]
    g1 = refs[3][...]
    base = 4
    o0_in = None
    if has_o0:
        o0_in = refs[4][...]
        base = 5
    bm = refs[base][...]
    kvmask = refs[base + 1][...]
    wrefs = refs[base + 2 : base + 2 + 9 * nl]
    dx0_ref, dx1_ref = refs[base + 2 + 9 * nl], refs[base + 3 + 9 * nl]
    wgrefs = refs[base + 4 + 9 * nl :]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in wgrefs:
            r[...] = jnp.zeros_like(r)

    layers = [tuple(r[...] for r in wrefs[9 * i : 9 * (i + 1)]) for i in range(nl)]

    if has_o0:
        assert nl == 1 and layer_names[0] != "self"
        trace = [(x0, x1, o0_in)]
    else:
        # forward replay storing ONLY layer-call inputs
        a0, a1 = x0, x1
        trace = []
        for i, name in enumerate(layer_names):
            wl = layers[i]
            if name == "self":
                o0, _ = _enc_fwd_stash(a0, a0, wl, bm, kvmask, n_real)
                o1, _ = _enc_fwd_stash(a1, a1, wl, bm, kvmask, n_real)
                trace.append((a0, a1, None))
                a0, a1 = o0, o1
            else:
                o0, _ = _enc_fwd_stash(a0, a1, wl, bm, kvmask, n_real)
                o1, _ = _enc_fwd_stash(a1, o0, wl, bm, kvmask, n_real)
                trace.append((a0, a1, o0))
                a0, a1 = o0, o1

    class _WAcc:
        """list-like adapter: wacc[j] += v accumulates into the grad refs."""

        def __init__(self, base):
            self._b = base

        def __getitem__(self, j):
            return wgrefs[self._b + j][...]

        def __setitem__(self, j, v):
            wgrefs[self._b + j][...] = v

    d0 = g0.astype(jnp.float32)
    d1 = g1.astype(jnp.float32)
    for i in range(nl - 1, -1, -1):
        wl = layers[i]
        acc = _WAcc(9 * i)
        ax0, ax1, o0 = trace[i]
        if layer_names[i] == "self":
            _, st0 = _enc_fwd_stash(ax0, ax0, wl, bm, kvmask, n_real)
            dxa, dsa = _enc_bwd(ax0, ax0, d0, wl, bm, kvmask, n_real, st0, acc)
            _, st1 = _enc_fwd_stash(ax1, ax1, wl, bm, kvmask, n_real)
            dxb, dsb = _enc_bwd(ax1, ax1, d1, wl, bm, kvmask, n_real, st1, acc)
            d0 = dxa + dsa
            d1 = dxb + dsb
        else:  # cross: o0 = enc(a0, a1); o1 = enc(a1, o0)
            _, st1 = _enc_fwd_stash(ax1, o0, wl, bm, kvmask, n_real)
            dx1_, dsrc_o0 = _enc_bwd(ax1, o0, d1, wl, bm, kvmask, n_real, st1, acc)
            d0_total = d0 + dsrc_o0
            _, st0 = _enc_fwd_stash(ax0, ax1, wl, bm, kvmask, n_real)
            dx0_, dsrc_a1 = _enc_bwd(
                ax0, ax1, d0_total, wl, bm, kvmask, n_real, st0, acc
            )
            d0 = dx0_
            d1 = dx1_ + dsrc_a1

    dx0_ref[...] = d0.astype(dx0_ref.dtype)
    dx1_ref[...] = d1.astype(dx1_ref.dtype)


def fine_train_supported(layer_names: Sequence[str], d_model: int, nhead: int,
                         n_tokens: int) -> bool:
    return (
        fine_stage_supported(layer_names, d_model, nhead)
        and n_tokens <= 128  # windows only — everything VMEM-resident
    )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6)
)
def fine_transformer_train(
    w0: jnp.ndarray,
    w1: jnp.ndarray,
    tf_params: Dict,
    layer_names: Tuple[str, ...],
    nhead: int,
    chunk: int | None = None,
    interpret: bool = False,
):
    """Differentiable fused fine transformer. w*: [B_, N, C]."""
    out, _ = _fwd_impl(w0, w1, tf_params, layer_names, nhead, chunk, interpret)
    return out


def _pads(w0, w1, N):
    Np = ((N + 7) // 8) * 8
    if Np != N:
        w0 = jnp.pad(w0, ((0, 0), (0, Np - N), (0, 0)))
        w1 = jnp.pad(w1, ((0, 0), (0, Np - N), (0, 0)))
    return w0, w1, Np


# trace-time tunables (benchmarks/chunk_sweep.py): bwd chunk VMEM budget in
# bytes-of-live-set + Mosaic scoped-VMEM limit MiB (0 = 16M default)
TUNE = {"bwd_budget": int(12e6), "bwd_vmem_mb": 0}


def _chunk_of(B_, Np, C, nl, chunk):
    if chunk is None:
        # measured footprint: the replay + reverse sweep holds ~48 f32
        # [Np, C] planes per chunk row PER LAYER (43.3M at chunk 32 for the
        # 2-layer whole-stack variant vs the 16M scoped-vmem limit) — the
        # compiler keeps the full per-layer trace live; the backward runs
        # one kernel per layer so nl is 1 there
        chunk = max(1, int(TUNE["bwd_budget"]) // (Np * C * 4 * 48 * max(1, nl)))
    chunk = min(chunk, B_)
    while B_ % chunk:
        chunk -= 1
    return chunk


def _masks(Np, N, C, nhead):
    d = C // nhead
    head_of = np.arange(C) // d
    bm = jnp.asarray((head_of[:, None] == head_of[None, :]).astype(np.float32))
    kvmask = jnp.asarray(
        np.broadcast_to((np.arange(Np) < N)[:, None], (Np, C)).astype(np.float32)
    )
    return bm, kvmask


def _fwd_impl(w0, w1, tf_params, layer_names, nhead, chunk, interpret):
    """Forward as per-layer fused calls (bitwise identical to the whole-stack
    fused loop — same op sequence), saving each layer's input pair so the
    backward can run ONE kernel per layer with half the VMEM footprint."""
    from featurematching_tpu.ops.pallas_fine_stage import fine_stage_fused

    B_, N, C = w0.shape
    zmix = {"kernel": jnp.zeros((N, 1), jnp.float32),
            "bias": jnp.zeros((1,), jnp.float32)}
    a0, a1 = w0, w1
    inputs = []
    for i, name in enumerate(layer_names):
        inputs.append((a0, a1))
        a0, a1, _, _ = fine_stage_fused(
            a0, a1, {"layer_0": tf_params[f"layer_{i}"]}, zmix, zmix,
            (name,), nhead, chunk=chunk, interpret=interpret,
        )
    return (a0, a1), (inputs, tf_params)


def _vjp_fwd(w0, w1, tf_params, layer_names, nhead, chunk, interpret):
    out, (inputs, tfp) = _fwd_impl(
        w0, w1, tf_params, layer_names, nhead, chunk, interpret
    )
    # the layer OUTPUTS ride along as residuals too: a cross layer's first
    # output o0 = enc(a0, a1) is exactly what its backward would otherwise
    # replay (next layer's input / the final out — no extra compute)
    return out, (inputs, out, tfp)


def _layer_bwd_call(name, x0, x1, d0, d1, wvals, nhead, N, chunk, interpret,
                    o0=None):
    """One encoder layer's backward as a single pallas_call (nl=1 kernel).

    o0: for cross layers, the layer's saved first output enc(x0, x1) — lets
    the kernel skip the forward replay (see _fine_bwd_kernel)."""
    B_, _, C = x0.shape
    dtype = x0.dtype
    x0p, x1p, Np = _pads(x0, x1, N)
    d0p, d1p, _ = _pads(d0.astype(dtype), d1.astype(dtype), N)
    has_o0 = o0 is not None and name != "self"
    extra = []
    if has_o0:
        o0p, _, _ = _pads(o0.astype(dtype), o0.astype(dtype), N)
        extra = [o0p]
    chunk = _chunk_of(B_, Np, C, 1, chunk)
    bm, kvmask = _masks(Np, N, C, nhead)

    def spec_of(a):
        nd = a.ndim
        return pl.BlockSpec(a.shape, lambda gidx, _nd=nd: (0,) * _nd)

    wg_shapes = [
        (C, C), (C, 2 * C), (C, C), (1, C), (1, C),
        (2 * C, 2 * C), (2 * C, C), (1, C), (1, C),
    ]
    kern = functools.partial(
        _fine_bwd_kernel, layer_names=(name,), n_real=N, C=C, has_o0=has_o0
    )
    chunk_spec = pl.BlockSpec((chunk, Np, C), lambda gi: (gi, 0, 0))
    outs = pl.pallas_call(
        kern,
        grid=(B_ // chunk,),
        in_specs=[chunk_spec] * (4 + len(extra)) + [
            spec_of(bm), spec_of(kvmask),
        ] + [spec_of(a) for a in wvals],
        out_specs=tuple(
            [pl.BlockSpec((chunk, Np, C), lambda gi: (gi, 0, 0))] * 2
            + [pl.BlockSpec(s, (lambda gi, _nd=len(s): (0,) * _nd)) for s in wg_shapes]
        ),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((B_, Np, C), dtype)] * 2
            + [jax.ShapeDtypeStruct(s, jnp.float32) for s in wg_shapes]
        ),
        interpret=interpret,
        compiler_params=None if interpret else vmem_params(TUNE["bwd_vmem_mb"]),
    )(x0p, x1p, d0p, d1p, *extra, bm, kvmask, *wvals)
    return outs[0][:, :N], outs[1][:, :N], outs[2:]


def _vjp_bwd(layer_names, nhead, chunk, interpret, res, g):
    inputs, final_out, tf_params = res
    d0, d1 = g
    N = d0.shape[1]
    dtype = inputs[0][0].dtype
    nl = len(layer_names)

    wgs_all = [None] * nl
    for i in range(nl - 1, -1, -1):
        wvals = _layer_values(tf_params[f"layer_{i}"], dtype)
        x0, x1 = inputs[i]
        o0 = None
        if layer_names[i] != "self":
            o0 = inputs[i + 1][0] if i + 1 < nl else final_out[0]
        d0, d1, wgs_all[i] = _layer_bwd_call(
            layer_names[i], x0, x1, d0, d1, wvals, nhead, N, chunk, interpret,
            o0=o0,
        )
    dw0, dw1 = d0, d1

    C = inputs[0][0].shape[2]
    dptree = {}
    for i in range(nl):
        dwq, dwkv, dwm, dn1s, dn1b, dw1_, dw2_, dn2s, dn2b = wgs_all[i]
        p = tf_params[f"layer_{i}"]

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
            "mlp1": {"kernel": like(dw1_, p["mlp1"]["kernel"])},
            "mlp2": {"kernel": like(dw2_, p["mlp2"]["kernel"])},
            "norm2": {
                "scale": like(dn2s[0], p["norm2"]["scale"]),
                "bias": like(dn2b[0], p["norm2"]["bias"]),
            },
        }
    return dw0, dw1, dptree


fine_transformer_train.defvjp(_vjp_fwd, _vjp_bwd)
