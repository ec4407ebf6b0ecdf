"""Attention primitives as pure functions over [B, N, H, D] arrays.

Re-designs /root/reference/network/module/attentions.py for TPU:
  * linear attention (elu+1 feature map, O(N)) — the coarse/fine default.
    The KV and normalizer contractions are MXU matmuls with fp32 accumulation
    regardless of the bf16 activation dtype.
  * full softmax attention — kept for config parity ('full'), fused by XLA.

The reference's `/ v_length` fp16-overflow guard (attentions.py:41) is kept:
with bf16 activations the same overflow risk applies on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def elu_feature_map(x: jnp.ndarray) -> jnp.ndarray:
    """elu(x) + 1 (reference attentions.py:10-11) — positive feature map."""
    return jax.nn.elu(x) + 1.0


def linear_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_mask: jnp.ndarray | None = None,
    kv_mask: jnp.ndarray | None = None,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """O(N) linear attention ("Transformers are RNNs").

    Args:
      q: [B, L, H, D], k/v: [B, S, H, D], masks: [B, L] / [B, S] (1 = keep).
    Returns: [B, L, H, D].

    Port of LinearAttention.forward (attentions.py:19-46) with identical
    normalizer semantics; contractions accumulate in fp32 on the MXU.
    """
    Q = elu_feature_map(q)
    K = elu_feature_map(k)
    if q_mask is not None:
        Q = Q * q_mask[:, :, None, None].astype(Q.dtype)
    if kv_mask is not None:
        K = K * kv_mask[:, :, None, None].astype(K.dtype)
        v = v * kv_mask[:, :, None, None].astype(v.dtype)

    v_length = v.shape[1]
    v = v / v_length  # prevent low-precision overflow (reference :41)
    # KV: [B, H, D, Dv]. Operands stay in the input dtype with f32 MXU
    # accumulation (see linear_attention_packed note): upcasting Q/KV to f32
    # doubles HBM traffic and quadruples MXU passes; with f32 inputs (CPU
    # tests, parity oracles) nothing changes.
    KV = jnp.einsum(
        "bshd,bshv->bhdv", K, v, preferred_element_type=jnp.float32
    ).astype(q.dtype)
    K_sum = jnp.sum(K.astype(jnp.float32), axis=1)  # [B, H, D]
    Z = 1.0 / (
        jnp.einsum("blhd,bhd->blh", Q.astype(jnp.float32), K_sum) + eps
    )  # [B, L, H]
    out = jnp.einsum(
        "blhd,bhdv->blhv", Q, KV, preferred_element_type=jnp.float32
    )
    out = out * Z[..., None] * v_length
    return out.astype(q.dtype)


def linear_attention_packed(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_mask: jnp.ndarray | None = None,
    kv_mask: jnp.ndarray | None = None,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Head-packed linear attention for SHORT sequences (fine windows).

    With per-head dims of ~8 the standard per-head einsums become thousands of
    tiny MXU passes. Packing all heads into full-channel matmuls computes an
    8x-redundant [C, C] cross-head product in ONE pass and reads only the
    block-diagonal — a large net win when pass-rate-bound (N ~ 49, C = 64):

        KV_full = K'^T V'            [C, C]   (1 pass; need diag h-blocks)
        Z       = Q' (K_sum ⊙ head) [*, h]   (1 pass)
        out     = Q' blockdiag(KV)  [*, C]   (1 pass)

    Numerically identical to linear_attention (same contractions, fp32 accum).
    """
    B, L, H, D = q.shape
    S = k.shape[1]
    C = H * D
    # operands stay in the input dtype (bf16 in production) with f32 MXU
    # accumulation: upcasting Q/K/V to f32 here doubled HBM traffic and
    # quadrupled MXU passes — device-profiled at ~1.5 ms/iter of the flagship
    # forward (a [8192,49,64] f32 layout copy alone was 0.49 ms). With f32
    # inputs (CPU tests, parity oracles) the math is unchanged.
    Q = elu_feature_map(q).reshape(B, L, C)
    K = elu_feature_map(k)
    if q_mask is not None:
        Q = Q * q_mask[:, :, None].astype(Q.dtype)
    if kv_mask is not None:
        K = K * kv_mask[:, :, None, None].astype(K.dtype)
        v = v * kv_mask[:, :, None, None].astype(v.dtype)
    K = K.reshape(B, S, C)
    V = (v / S).reshape(B, S, C)

    # [B, C, C] cross-head products; keep only the 8 diagonal [D, D] blocks
    KV_full = jnp.einsum("bsc,bsd->bcd", K, V, preferred_element_type=jnp.float32)
    head_of = jnp.arange(C) // D
    blockmask = (head_of[:, None] == head_of[None, :]).astype(KV_full.dtype)
    KV_bd = (KV_full * blockmask[None]).astype(q.dtype)

    K_sum = jnp.sum(K.astype(jnp.float32), axis=1)  # [B, C]
    # Z[l, h] = sum_d Q[l, h*D+d] * K_sum[h*D+d]
    onehot = jax.nn.one_hot(head_of, H, dtype=jnp.float32)  # [C, H]
    Z = 1.0 / (
        jnp.einsum(
            "blc,bc,ch->blh", Q.astype(jnp.float32), K_sum, onehot
        ) + eps
    )  # [B, L, H]

    # cast the dot output back to the input dtype IN THE EPILOGUE (f32 MXU
    # accumulation is internal): asking XLA for an f32 result materialized a
    # 100 MB f32 [8192,49,64] store + an f32 layout copy (~1 ms/iter traced)
    out = jnp.einsum(
        "blc,bcd->bld", Q, KV_bd, preferred_element_type=jnp.float32
    ).astype(q.dtype)  # [B, L, C]
    return out.reshape(B, L, H, D) * (Z * S).astype(q.dtype)[..., None]


# sequences at or below this length route to the packed variant
_PACKED_MAX_LEN = 256


def full_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_mask: jnp.ndarray | None = None,
    kv_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Softmax attention with 1/sqrt(D) temperature (attentions.py:54-78).

    Args: q [B, L, H, D], k/v [B, S, H, D]. Returns [B, L, H, D].
    """
    softmax_temp = 1.0 / (q.shape[-1] ** 0.5)
    qk = jnp.einsum("blhd,bshd->bhls", q, k, preferred_element_type=jnp.float32)
    if kv_mask is not None:
        mask = (
            q_mask[:, None, :, None].astype(bool)
            & kv_mask[:, None, None, :].astype(bool)
        )
        qk = jnp.where(mask, qk, -jnp.inf)
    attn = jax.nn.softmax(softmax_temp * qk, axis=-1)
    out = jnp.einsum(
        "bhls,bshd->blhd", attn.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)
