"""Compute primitives: attention variants, fused Pallas kernels, windowing."""

from featurematching_tpu.ops.attention import (  # noqa: F401
    linear_attention,
    full_attention,
)
