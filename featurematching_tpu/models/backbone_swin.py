"""Swin-T U-Net backbone in Flax linen, NHWC — the framework default.

Re-design of /root/reference/network/backbone/swin_backbone_modify_unetarchecture.py
(SwinTransformer_v1, :548-704): a 3-stage Swin-T encoder (depths [2,2,6],
heads [4,8,16], window 8, embed 64) followed by a 3-stage decoder of Swin
blocks + PatchExpand upsamplers (no skip connections — the reference's
"U-Net" decoder is a straight chain, :692-702). Outputs:
  * coarse: 1/8 resolution, 256 ch (decoder stage 0 via a 128->256 linear)
  * fine:   1/2 resolution,  64 ch (decoder stage 2 via a 64->64 linear)

TPU adaptations:
  * window partition/reverse are pure reshapes/transposes (XLA fuses them).
  * the SW-MSA region mask is computed with numpy at trace time (shapes are
    static under jit) and baked as a constant additive bias.
  * all attention matmuls run on the MXU with fp32 accumulation.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# window helpers (pure reshapes; reference swin_...py:40-67)
# ---------------------------------------------------------------------------

def window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*nW, w*w, C] (H, W divisible by w)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // w, w, W // w, w, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w * w, C)


def window_reverse(windows: jnp.ndarray, w: int, H: int, W: int) -> jnp.ndarray:
    """[B*nW, w*w, C] -> [B, H, W, C]."""
    C = windows.shape[-1]
    B = windows.shape[0] // ((H // w) * (W // w))
    x = windows.reshape(B, H // w, W // w, w, w, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


@functools.lru_cache(maxsize=None)
def _shift_attn_mask(Hp: int, Wp: int, w: int, shift: int) -> np.ndarray:
    """Additive SW-MSA mask [nW, w*w, w*w] (0 / -100), numpy at trace time.

    Port of the region-labelling construction at swin_...py:402-421.
    """
    img = np.zeros((Hp, Wp), dtype=np.int32)
    slices = (slice(0, -w), slice(-w, -shift), slice(-shift, None))
    cnt = 0
    for hs in slices:
        for ws in slices:
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(Hp // w, w, Wp // w, w).transpose(0, 2, 1, 3).reshape(-1, w * w)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _rel_pos_bias_from_table(table: jnp.ndarray, w: int, h: int) -> jnp.ndarray:
    """[(2w-1)^2, h] learned table -> [h, N, N] additive bias (N = w*w)."""
    N = w * w
    coords = np.stack(
        np.meshgrid(np.arange(w), np.arange(w), indexing="ij"), 0
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # [2, N, N]
    rel = rel.transpose(1, 2, 0) + (w - 1)
    rel_idx = (rel[..., 0] * (2 * w - 1) + rel[..., 1]).reshape(-1)  # [N*N]
    return table[rel_idx].reshape(N, N, h).transpose(2, 0, 1)


def drop_path(x: jnp.ndarray, rate: float, deterministic: bool, rng) -> jnp.ndarray:
    """Stochastic depth on the batch axis (timm DropPath semantics)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
    return x / keep * mask


class _DenseParams(nn.Module):
    """Declares nn.Dense-identical params (names/shapes/inits) without the op,
    so the fused-block path can read raw kernels while keeping the param tree
    checkpoint-compatible with the per-op path."""

    in_features: int
    features: int
    use_bias: bool = True

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features),
        )
        if self.use_bias:
            self.bias = self.param(
                "bias", nn.initializers.zeros_init(), (self.features,)
            )


class _LayerNormParams(nn.Module):
    """nn.LayerNorm-identical params (scale/bias) without the op."""

    features: int

    def setup(self):
        self.scale = self.param(
            "scale", nn.initializers.ones_init(), (self.features,)
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,)
        )


class _WindowAttentionParams(nn.Module):
    """WindowAttention-identical param subtree (qkv/proj/rel_pos_bias)."""

    dim: int
    window: int
    num_heads: int
    qkv_bias: bool = True

    def setup(self):
        self.qkv = _DenseParams(self.dim, 3 * self.dim, self.qkv_bias)
        self.proj = _DenseParams(self.dim, self.dim, True)
        self.rel_pos_bias = self.param(
            "rel_pos_bias",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window - 1) * (2 * self.window - 1), self.num_heads),
        )


class WindowAttention(nn.Module):
    """W-MSA with learned relative position bias (swin_...py:70-148).

    `use_fused` routes through the Pallas fused kernel
    (ops/pallas_window_attention) — forward-only (no VJP), so callers enable
    it for inference paths on TPU.
    """

    dim: int
    window: int
    num_heads: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    use_fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
        """x: [B_, N, C] windows (N = window^2); mask: [nW, N, N] or None."""
        B_, N, C = x.shape
        h = self.num_heads
        head_dim = C // h
        scale = head_dim**-0.5

        if self.use_fused:
            # heads packed per-head-contiguous in C for the fused kernel
            qkv_p = nn.Dense(
                3 * C, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv"
            )(x)
            from featurematching_tpu.ops.pallas_window_attention import (
                window_attention_pallas,
            )

            # Dense packs 3C as [q|k|v] blocks with heads d-contiguous within
            # each — exactly the fused kernel's expected layout.
            w = self.window
            table = self.param(
                "rel_pos_bias",
                nn.initializers.truncated_normal(0.02),
                ((2 * w - 1) * (2 * w - 1), h),
            )
            bias = _rel_pos_bias_from_table(table, w, h)
            out = window_attention_pallas(qkv_p, bias, mask, h, scale, chunk=16)
            return nn.Dense(C, dtype=self.dtype, name="proj")(out)

        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B_, N, 3, h, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # [B_, h, N, hd]

        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", q * scale, k, preferred_element_type=jnp.float32
        )

        # relative position bias table: [(2w-1)^2, h]
        w = self.window
        table = self.param(
            "rel_pos_bias",
            nn.initializers.truncated_normal(0.02),
            ((2 * w - 1) * (2 * w - 1), h),
        )
        bias = _rel_pos_bias_from_table(table, w, h)
        attn = attn + bias[None].astype(attn.dtype)

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, h, N, N) + mask[None, :, None].astype(
                attn.dtype
            )
            attn = attn.reshape(B_, h, N, N)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)

        out = jnp.einsum(
            "bhnm,bhmd->bhnd", attn, v, preferred_element_type=jnp.float32
        ).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B_, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    """One W-MSA/SW-MSA block with MLP (swin_...py:151-248)."""

    dim: int
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_fused: bool = False
    use_fused_block: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, H: int, W: int, deterministic: bool = True):
        """x: [B, H*W, C]."""
        B, L, C = x.shape
        w = self.window
        if self.use_fused_block:
            # fully-fused differentiable Pallas block (fwd + bwd kernels);
            # numerics note: window padding enters the kernel pre-LN (the
            # per-op path pads post-LN zeros), so padded-window scores differ
            # at the pad keys — same modeling choice as models/fast_inference.
            from featurematching_tpu.ops.pallas_swin_block_grad import (
                swin_block_train,
            )

            norm1 = _LayerNormParams(C, name="norm1")
            attn = _WindowAttentionParams(
                C, w, self.num_heads, self.qkv_bias, name="attn"
            )
            norm2 = _LayerNormParams(C, name="norm2")
            mlp1 = _DenseParams(C, int(C * self.mlp_ratio), name="mlp1")
            mlp2 = _DenseParams(int(C * self.mlp_ratio), C, name="mlp2")
            params = {
                "ln1_scale": norm1.scale,
                "ln1_bias": norm1.bias,
                "w_qkv": attn.qkv.kernel,
                "b_qkv": attn.qkv.bias,
                "rel_bias": _rel_pos_bias_from_table(
                    attn.rel_pos_bias, w, self.num_heads
                ),
                "w_proj": attn.proj.kernel,
                "b_proj": attn.proj.bias,
                "ln2_scale": norm2.scale,
                "ln2_bias": norm2.bias,
                "w_mlp1": mlp1.kernel,
                "b_mlp1": mlp1.bias,
                "w_mlp2": mlp2.kernel,
                "b_mlp2": mlp2.bias,
            }

            xi = x.reshape(B, H, W, C)
            pad_b = (w - H % w) % w
            pad_r = (w - W % w) % w
            if pad_b or pad_r:
                xi = jnp.pad(xi, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
            Hp, Wp = H + pad_b, W + pad_r
            nW = (Hp // w) * (Wp // w)
            if self.shift > 0:
                xi = jnp.roll(xi, shift=(-self.shift, -self.shift), axis=(1, 2))
                mask = jnp.asarray(_shift_attn_mask(Hp, Wp, w, self.shift))
                mask_pw = mask[jnp.arange(B * nW) % nW]
            else:
                mask_pw = None

            if not deterministic and self.drop_path_rate > 0:
                keep = 1.0 - self.drop_path_rate
                m1 = jax.random.bernoulli(
                    self.make_rng("droppath"), keep, (B,)
                ).astype(jnp.float32) / keep
                m2 = jax.random.bernoulli(
                    self.make_rng("droppath"), keep, (B,)
                ).astype(jnp.float32) / keep
                s1 = jnp.repeat(m1, nW)
                s2 = jnp.repeat(m2, nW)
            else:
                s1 = s2 = None

            xw = window_partition(xi, w)
            ow = swin_block_train(
                xw, mask_pw, s1, s2, params, self.num_heads, None,
                jax.default_backend() == "cpu",  # interpret for CPU tests
            )
            oi = window_reverse(ow, w, Hp, Wp)
            if self.shift > 0:
                oi = jnp.roll(oi, shift=(self.shift, self.shift), axis=(1, 2))
            if pad_b or pad_r:
                oi = oi[:, :H, :W]
            return oi.reshape(B, H * W, C)

        shortcut = x
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x.reshape(B, H, W, C)

        pad_b = (w - H % w) % w
        pad_r = (w - W % w) % w
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r

        if self.shift > 0:
            x = jnp.roll(x, shift=(-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(Hp, Wp, w, self.shift))
        else:
            mask = None

        windows = window_partition(x, w)  # [B*nW, w*w, C]
        attn_out = WindowAttention(
            self.dim, w, self.num_heads, self.qkv_bias, self.dtype,
            use_fused=self.use_fused and deterministic, name="attn"
        )(windows, mask)
        x = window_reverse(attn_out, w, Hp, Wp)

        if self.shift > 0:
            x = jnp.roll(x, shift=(self.shift, self.shift), axis=(1, 2))
        if pad_b or pad_r:
            x = x[:, :H, :W]
        x = x.reshape(B, H * W, C)

        rng = self.make_rng("droppath") if not deterministic and self.drop_path_rate > 0 else None
        x = shortcut + drop_path(x, self.drop_path_rate, deterministic, rng)

        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype, name="mlp1")(y)
        y = nn.gelu(y, approximate=False)  # torch GELU is exact
        y = nn.Dense(C, dtype=self.dtype, name="mlp2")(y)
        rng2 = self.make_rng("droppath") if not deterministic and self.drop_path_rate > 0 else None
        return x + drop_path(y, self.drop_path_rate, deterministic, rng2)


class PatchMerging(nn.Module):
    """2x2 space-to-depth + LN + 4C->2C linear (swin_...py:251-290)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, H: int, W: int):
        B, L, C = x.shape
        x = x.reshape(B, H, W, C)
        if H % 2 or W % 2:
            x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = x.reshape(B, -1, 4 * C)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * C, use_bias=False, dtype=self.dtype, name="reduction")(x)


class PatchExpand(nn.Module):
    """Linear C->scale*C + depth-to-space x2 + LN (swin_...py:437-458)."""

    dim: int
    dim_scale: int  # 2 or 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, H: int, W: int):
        B, L, C = x.shape
        x = nn.Dense(self.dim_scale * C, use_bias=False, dtype=self.dtype, name="expand")(x)
        Ce = x.shape[-1]
        # Depth-to-space via lane-half splits instead of a 6-d transpose
        # (round-4 redesign, shared with ops/pallas_patch_expand): with the
        # expand output viewed as [B, H, W, (i, j, c)], each row-half
        # x[..., i*Ce/2:(i+1)*Ce/2].reshape(B, H, 2W, Ce/4) is CONTIGUOUS
        # ((w,(j,c)) -> ((w,j),c)), so XLA lowers it as one relayout copy
        # per half, and the row interleave is a single stack — replacing the
        # [8,120,2,160,2,64]-class transpose pairs that cost ~2.5 ms/step
        # fwd+bwd in the round-3 train trace. All three ops are trivially
        # transposable, so the backward gets the same structure for free.
        x = x.reshape(B, H, W, Ce)
        x0 = x[..., : Ce // 2].reshape(B, H, 2 * W, Ce // 4)
        x1 = x[..., Ce // 2 :].reshape(B, H, 2 * W, Ce // 4)
        x = jnp.stack([x0, x1], axis=2).reshape(B, 4 * H * W, Ce // 4)
        # keep the reshuffle in bf16 in BOTH directions: without the barrier
        # XLA moves the LN's f32 convert across the reshape/copy chain
        # (forward) and sinks the f32->bf16 grad convert below the inverse
        # copies (backward), doubling the bytes of the layout copies.
        x = jax.lax.optimization_barrier(x)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(x)


class SwinUNet(nn.Module):
    """SwinTransformer_v1 equivalent. Input [B, H, W, C_in] (H, W mult of 8).

    Returns (coarse [B, H/8, W/8, 256], fine [B, H/2, W/2, 64]).
    """

    in_channels: int = 3
    patch_size: int = 4
    embed_dim: int = 64
    depths: Sequence[int] = (2, 2, 6)
    depths_up: Sequence[int] = (1, 1, 1)
    num_heads: Sequence[int] = (4, 8, 16)
    window: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.2
    patch_norm: bool = True
    dtype: jnp.dtype = jnp.float32
    fused_attention: bool = False
    fused_block: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        deterministic = not train
        B, H, W, _ = x.shape
        p = self.patch_size
        # patch embed: conv pxp stride p (+LN) — swin_...py:293-332
        x = nn.Conv(
            self.embed_dim, (p, p), strides=(p, p), padding="VALID",
            dtype=self.dtype, name="patch_embed",
        )(x)
        Wh, Ww = x.shape[1], x.shape[2]
        x = x.reshape(B, Wh * Ww, self.embed_dim)
        if self.patch_norm:
            x = nn.LayerNorm(dtype=self.dtype, name="patch_norm")(x)

        n_stages = len(self.depths)
        dpr = list(np.linspace(0, self.drop_path_rate, sum(self.depths)))

        # ----- encoder (swin_...py:685-689)
        for i in range(n_stages):
            dim = self.embed_dim * (2**i)
            for b in range(self.depths[i]):
                x = SwinBlock(
                    dim=dim,
                    num_heads=self.num_heads[i],
                    window=self.window,
                    shift=0 if b % 2 == 0 else self.window // 2,
                    mlp_ratio=self.mlp_ratio,
                    qkv_bias=self.qkv_bias,
                    drop_path_rate=float(dpr[sum(self.depths[:i]) + b]),
                    dtype=self.dtype,
                    use_fused=self.fused_attention,
                    use_fused_block=self.fused_block,
                    name=f"enc{i}_blk{b}",
                )(x, Wh, Ww, deterministic)
            if i < n_stages - 1:
                x = PatchMerging(dim, self.dtype, name=f"enc{i}_merge")(x, Wh, Ww)
                Wh, Ww = (Wh + 1) // 2, (Ww + 1) // 2
            # norm_down applied AFTER downsampling (reference norms the stage
            # output x, which is post-merge: swin_...py:687-689)
            x = nn.LayerNorm(dtype=self.dtype, name=f"norm_down{i}")(x)

        # ----- decoder (swin_...py:692-702); dims [256, 128, 64]
        out_c = out_f = None
        n_up = len(self.depths_up)
        for j in range(n_up):
            dim = self.embed_dim * (2 ** (n_up - 1 - j))
            depth = self.depths_up[n_up - 1 - j]
            heads = self.num_heads[n_up - 1 - j]
            dp_slice = dpr[sum(self.depths_up[: n_up - 1 - j]) : sum(self.depths_up[: n_up - j])]
            for b in range(depth):
                x = SwinBlock(
                    dim=dim,
                    num_heads=heads,
                    window=self.window,
                    shift=0 if b % 2 == 0 else self.window // 2,
                    mlp_ratio=self.mlp_ratio,
                    qkv_bias=self.qkv_bias,
                    drop_path_rate=float(dp_slice[b] if b < len(dp_slice) else 0.0),
                    dtype=self.dtype,
                    use_fused=self.fused_attention,
                    use_fused_block=self.fused_block,
                    name=f"dec{j}_blk{b}",
                )(x, Wh, Ww, deterministic)
            scale = 2 if j < n_up - 1 else 4
            x = PatchExpand(dim, scale, self.dtype, name=f"dec{j}_expand")(x, Wh, Ww)
            Wh, Ww = Wh * 2, Ww * 2
            x = nn.LayerNorm(dtype=self.dtype, name=f"norm_up{j}")(x)
            if j == 0:
                c = nn.Dense(256, use_bias=False, dtype=self.dtype, name="linear_middle")(x)
                out_c = c.reshape(B, Wh, Ww, 256)
            elif j == n_up - 1:
                f = nn.Dense(64, use_bias=False, dtype=self.dtype, name="linear_end")(x)
                out_f = f.reshape(B, Wh, Ww, 64)

        return out_c, out_f
