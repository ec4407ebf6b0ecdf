"""ResNet-FPN backbone (1/8 coarse + 1/2 fine) in Flax linen, NHWC.

Re-design of /root/reference/network/backbone/resnet_fpn.py:18-201. Same
topology (7x7 stem stride 2; three 2-block stages; top-down FPN with bilinear
x2 upsampling and 3x3 smoothing), NHWC layout for TPU conv efficiency and
BatchNorm via linen's batch_stats collection.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear x2 with align_corners=True — matches F.interpolate at
    resnet_fpn.py:113,117 exactly (jax.image.resize only offers half-pixel
    sampling, so the gather+lerp is written out)."""
    B, H, W, C = x.shape
    Ho, Wo = 2 * H, 2 * W

    def axis_coords(n_in, n_out):
        if n_in == 1:
            return jnp.zeros((n_out,)), jnp.zeros((n_out,), jnp.int32), jnp.zeros((n_out,), jnp.int32)
        src = jnp.arange(n_out) * (n_in - 1) / (n_out - 1)
        lo = jnp.floor(src).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n_in - 1)
        return (src - lo).astype(x.dtype), lo, hi

    wy, y0, y1 = axis_coords(H, Ho)
    wx, x0, x1 = axis_coords(W, Wo)
    top = x[:, y0][:, :, x0] * (1 - wx)[None, None, :, None] + x[:, y0][:, :, x1] * wx[None, None, :, None]
    bot = x[:, y1][:, :, x0] * (1 - wx)[None, None, :, None] + x[:, y1][:, :, x1] * wx[None, None, :, None]
    return top * (1 - wy)[None, :, None, None] + bot * wy[None, :, None, None]


class BasicBlock(nn.Module):
    """Two 3x3 convs + BN + residual (resnet_fpn.py:18-43)."""

    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = lambda k, s, name: nn.Conv(  # noqa: E731
            # explicit torch-symmetric padding: SAME != torch for stride 2
            self.planes, (k, k), strides=(s, s),
            padding=((k // 2, k // 2), (k // 2, k // 2)), use_bias=False,
            dtype=self.dtype, name=name,
        )
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, dtype=self.dtype, name=name
        )
        y = nn.relu(bn("bn1")(conv(3, self.stride, "conv1")(x)))
        y = bn("bn2")(conv(3, 1, "conv2")(y))
        if self.stride != 1:
            x = bn("bn_down")(conv(1, self.stride, "down")(x))
        return nn.relu(x + y)


class ResNetFPN_16_4(nn.Module):
    """1/16 coarse + 1/4 fine variant (reference ResNetFPN_16_4,
    resnet_fpn.py:123-201): four stages, top-down FPN stops at 1/4."""

    initial_dim: int = 128
    block_dims: Sequence[int] = (128, 196, 256, 512)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        d0, d1, d2, d3 = self.block_dims
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, dtype=self.dtype, name=name
        )
        x0 = nn.Conv(
            self.initial_dim, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        x0 = nn.relu(bn("bn1")(x0))

        def stage(y, dim, stride, name):
            y = BasicBlock(dim, stride, self.dtype, name=f"{name}_0")(y, train)
            y = BasicBlock(dim, 1, self.dtype, name=f"{name}_1")(y, train)
            return y

        x1 = stage(x0, d0, 1, "layer1")  # 1/2
        x2 = stage(x1, d1, 2, "layer2")  # 1/4
        x3 = stage(x2, d2, 2, "layer3")  # 1/8
        x4 = stage(x3, d3, 2, "layer4")  # 1/16

        conv1x1 = lambda dim, name: nn.Conv(  # noqa: E731
            dim, (1, 1), use_bias=False, dtype=self.dtype, name=name
        )
        conv3x3 = lambda dim, name: nn.Conv(  # noqa: E731
            dim, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype, name=name
        )

        x4_out = conv1x1(d3, "layer4_outconv")(x4)

        x3_out = conv1x1(d3, "layer3_outconv")(x3)
        y = x3_out + _upsample2x(x4_out)
        y = conv3x3(d3, "layer3_outconv2_a")(y)
        y = nn.leaky_relu(bn("layer3_bn")(y), 0.01)
        x3_out = conv3x3(d2, "layer3_outconv2_b")(y)

        x2_out = conv1x1(d2, "layer2_outconv")(x2)
        y = x2_out + _upsample2x(x3_out)
        y = conv3x3(d2, "layer2_outconv2_a")(y)
        y = nn.leaky_relu(bn("layer2_bn")(y), 0.01)
        x2_out = conv3x3(d1, "layer2_outconv2_b")(y)

        return x4_out, x2_out  # coarse 1/16, fine 1/4


class ResNetFPN(nn.Module):
    """Outputs [coarse 1/8 (block_dims[2] ch), fine 1/2 (block_dims[0] ch)].

    Input: [B, H, W, C_in]. Reference: ResNetFPN_8_2 (resnet_fpn.py:46-121).
    """

    initial_dim: int = 128
    block_dims: Sequence[int] = (128, 196, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        d0, d1, d2 = self.block_dims
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, dtype=self.dtype, name=name
        )
        # stem: 7x7 stride 2
        x0 = nn.Conv(
            self.initial_dim, (7, 7), strides=(2, 2),
            padding=((3, 3), (3, 3)), use_bias=False,
            dtype=self.dtype, name="conv1",
        )(x)
        x0 = nn.relu(bn("bn1")(x0))

        def stage(y, dim, stride, name):
            y = BasicBlock(dim, stride, self.dtype, name=f"{name}_0")(y, train)
            y = BasicBlock(dim, 1, self.dtype, name=f"{name}_1")(y, train)
            return y

        x1 = stage(x0, d0, 1, "layer1")  # 1/2
        x2 = stage(x1, d1, 2, "layer2")  # 1/4
        x3 = stage(x2, d2, 2, "layer3")  # 1/8

        conv1x1 = lambda dim, name: nn.Conv(  # noqa: E731
            dim, (1, 1), use_bias=False, dtype=self.dtype, name=name
        )
        conv3x3 = lambda dim, name: nn.Conv(  # noqa: E731
            dim, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype, name=name
        )

        # FPN top-down (resnet_fpn.py:110-120)
        x3_out = conv1x1(d2, "layer3_outconv")(x3)

        x2_out = conv1x1(d2, "layer2_outconv")(x2)
        y = x2_out + _upsample2x(x3_out)
        y = conv3x3(d2, "layer2_outconv2_a")(y)
        y = nn.leaky_relu(bn("layer2_bn")(y), 0.01)
        x2_out = conv3x3(d1, "layer2_outconv2_b")(y)

        x1_out = conv1x1(d1, "layer1_outconv")(x1)
        y = x1_out + _upsample2x(x2_out)
        y = conv3x3(d1, "layer1_outconv2_a")(y)
        y = nn.leaky_relu(bn("layer1_bn")(y), 0.01)
        x1_out = conv3x3(d0, "layer1_outconv2_b")(y)

        return x3_out, x1_out  # coarse 1/8, fine 1/2
