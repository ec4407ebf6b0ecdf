"""featurematching_tpu — a TPU-native coarse-to-fine feature-matching + SLAM/SfM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`Iheckzza/FeatureMatching` (LoFTR-style detector-free matching for endoscopic
video): Swin-UNet / ResNet-FPN backbones, linear-attention LoFTR transformers,
dual-softmax coarse matching with mutual-NN selection, local-window fine
refinement with soft-argmax, pose heads, epipolar metrics, on-device RANSAC
essential-matrix solving, and a pjit/shard_map data-parallel training harness.

Design principles (TPU-first, not a port):
  * fixed shapes everywhere — match lists are top-K + validity masks, never
    dynamic `where` outputs (reference: network/utils/coarse_matching_new.py:109)
  * a functional, immutable pytree threaded through jit-ed stages replaces the
    reference's single mutable `data` dict (reference: network/net.py:40-92)
  * NHWC layouts, bfloat16 matmuls on the MXU, Pallas kernels for the fused
    dual-softmax correlation hot loop
  * multi-chip scaling via jax.sharding.Mesh + collectives, not NCCL wrappers
    (reference: utils/comm.py)
"""

__version__ = "0.1.0"

from featurematching_tpu.config import (  # noqa: F401
    Config,
    default_config,
    highres_eval_config,
)
