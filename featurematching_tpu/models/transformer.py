"""LoFTR-style local feature transformer in Flax linen.

Re-design of /root/reference/network/module/transformer.py:6-97 — same math
(QKV projections without bias, linear/full attention, concat-MLP FFN with
post-norm residual), NHWC/sequence-major layouts, bf16-friendly.

Weight-sharing note: the reference deep-copies one EncoderLayer per name
(transformer.py:70), i.e. layers do NOT share weights; we instantiate one
linen module per layer accordingly.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from featurematching_tpu.ops.attention import (
    _PACKED_MAX_LEN,
    full_attention,
    linear_attention,
    linear_attention_packed,
)


class _DenseKernel(nn.Module):
    """nn.Dense-identical kernel param (no op, no bias) so the fused-train
    path can read the raw weight while keeping the param tree
    checkpoint-compatible with the per-op path."""

    in_features: int
    features: int

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features),
        )


class _LayerNormParams(nn.Module):
    features: int

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones_init(), (self.features,))
        self.bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))


class _EncoderLayerParams(nn.Module):
    """EncoderLayer-identical param subtree without the ops."""

    d_model: int

    def setup(self):
        C = self.d_model
        self.q_proj = _DenseKernel(C, C)
        self.k_proj = _DenseKernel(C, C)
        self.v_proj = _DenseKernel(C, C)
        self.merge = _DenseKernel(C, C)
        self.norm1 = _LayerNormParams(C)
        self.mlp1 = _DenseKernel(2 * C, 2 * C)
        self.mlp2 = _DenseKernel(2 * C, C)
        self.norm2 = _LayerNormParams(C)

    def tree(self):
        return {
            "q_proj": {"kernel": self.q_proj.kernel},
            "k_proj": {"kernel": self.k_proj.kernel},
            "v_proj": {"kernel": self.v_proj.kernel},
            "merge": {"kernel": self.merge.kernel},
            "norm1": {"scale": self.norm1.scale, "bias": self.norm1.bias},
            "mlp1": {"kernel": self.mlp1.kernel},
            "mlp2": {"kernel": self.mlp2.kernel},
            "norm2": {"scale": self.norm2.scale, "bias": self.norm2.bias},
        }


class EncoderLayer(nn.Module):
    """One self- or cross-attention encoder layer (transformer.py:6-57)."""

    d_model: int
    nhead: int
    attention: str = "linear"  # 'linear' | 'full'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, source, x_mask=None, source_mask=None):
        """x: [B, L, C] queries; source: [B, S, C] keys/values."""
        bs = x.shape[0]
        dim = self.d_model // self.nhead
        dense = lambda name: nn.Dense(  # noqa: E731
            self.d_model, use_bias=False, dtype=self.dtype, name=name
        )
        query = dense("q_proj")(x).reshape(bs, -1, self.nhead, dim)
        key = dense("k_proj")(source).reshape(bs, -1, self.nhead, dim)
        value = dense("v_proj")(source).reshape(bs, -1, self.nhead, dim)

        if self.attention == "linear":
            # short sequences (fine windows) use the head-packed form — same
            # math, ~5x fewer MXU passes at N ~ 49
            short = x.shape[1] <= _PACKED_MAX_LEN and source.shape[1] <= _PACKED_MAX_LEN
            attn_fn = linear_attention_packed if short else linear_attention
        else:
            attn_fn = full_attention
        message = attn_fn(query, key, value, q_mask=x_mask, kv_mask=source_mask)
        message = dense("merge")(message.reshape(bs, -1, self.nhead * dim))
        message = nn.LayerNorm(dtype=self.dtype, name="norm1")(message)

        # feed-forward on [x || message] (transformer.py:24-28,54-55)
        y = jnp.concatenate([x, message], axis=-1)
        y = nn.Dense(2 * self.d_model, use_bias=False, dtype=self.dtype, name="mlp1")(y)
        y = nn.relu(y)
        y = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="mlp2")(y)
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(y)

        return x + y


class LocalFeatureTransformer(nn.Module):
    """Alternating self/cross stack (transformer.py:59-97).

    `use_fused_train`: route through the differentiable fused Pallas kernels
    (ops/pallas_coarse_grad.coarse_transformer_train — fwd AND bwd streamed
    on-chip). Callers enable it on TPU; it transparently falls back to the
    per-op path when unsupported (masks, odd dims, 'full' attention). On CPU
    the fused path runs in Pallas interpret mode (tests only — slow).
    """

    d_model: int
    nhead: int
    layer_names: Sequence[str]
    attention: str = "linear"
    dtype: jnp.dtype = jnp.float32
    use_fused_train: bool = False

    @nn.compact
    def __call__(self, feat0, feat1, mask0=None, mask1=None):
        assert feat0.shape[-1] == self.d_model
        if self.use_fused_train and self.attention == "linear" and (
            mask0 is None and mask1 is None and feat0.shape == feat1.shape
        ):
            from featurematching_tpu.ops.pallas_coarse_grad import (
                coarse_train_supported,
                coarse_transformer_train,
            )
            from featurematching_tpu.ops.pallas_fine_grad import (
                fine_train_supported,
                fine_transformer_train,
            )

            n_tokens = feat0.shape[1]
            use_coarse = coarse_train_supported(
                self.layer_names, self.d_model, self.nhead, n_tokens
            )
            use_fine = not use_coarse and fine_train_supported(
                self.layer_names, self.d_model, self.nhead, n_tokens
            )
            if use_coarse or use_fine:
                tree = {
                    f"layer_{i}": _EncoderLayerParams(
                        self.d_model, name=f"layer_{i}"
                    ).tree()
                    for i in range(len(self.layer_names))
                }
                fn = coarse_transformer_train if use_coarse else fine_transformer_train
                return fn(
                    feat0.astype(self.dtype), feat1.astype(self.dtype), tree,
                    tuple(self.layer_names), self.nhead, None,
                    jax.default_backend() == "cpu",  # interpret for CPU tests
                )
        for i, name in enumerate(self.layer_names):
            layer = EncoderLayer(
                self.d_model, self.nhead, self.attention, self.dtype, name=f"layer_{i}"
            )
            if name == "self":
                if (
                    feat0.shape == feat1.shape
                    and mask0 is None
                    and mask1 is None
                ):
                    # both self-attention calls are independent and share
                    # weights — stack them into ONE call (identical math,
                    # 2x matmul M, half the op count)
                    stacked = jnp.concatenate([feat0, feat1], axis=0)
                    stacked = layer(stacked, stacked)
                    feat0, feat1 = jnp.split(stacked, 2, axis=0)
                else:
                    feat0 = layer(feat0, feat0, mask0, mask0)
                    feat1 = layer(feat1, feat1, mask1, mask1)
            elif name == "cross":
                # NOTE the reference updates feat0 first and feeds the UPDATED
                # feat0 into feat1's cross step (transformer.py:93-95); keep
                # that asymmetric ordering for checkpoint-level parity.
                feat0 = layer(feat0, feat1, mask0, mask1)
                feat1 = layer(feat1, feat0, mask1, mask0)
            else:
                raise ValueError(f"unknown layer name {name!r}")
        return feat0, feat1
