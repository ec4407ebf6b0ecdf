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
    # KV: [B, H, D, Dv]
    KV = jnp.einsum("bshd,bshv->bhdv", K, v, preferred_element_type=jnp.float32)
    K_sum = jnp.sum(K.astype(jnp.float32), axis=1)  # [B, H, D]
    Z = 1.0 / (
        jnp.einsum("blhd,bhd->blh", Q.astype(jnp.float32), K_sum) + eps
    )  # [B, L, H]
    out = jnp.einsum(
        "blhd,bhdv->blhv", Q.astype(jnp.float32), KV, preferred_element_type=jnp.float32
    )
    out = out * Z[..., None] * v_length
    return out.astype(q.dtype)


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
