"""Typed, frozen configuration tree.

Replaces the reference's global yacs `CfgNode` (`/root/reference/config.py:3-161`)
with validated frozen dataclasses. One schema; per-app variants are explicit
`dataclasses.replace` overrides instead of drifting config clones
(reference kept 4 divergent copies: config.py, network/configs/config_pred_mdified.py,
demo/net_config.py, origin_match_config.py).

All fields that shape traced programs (resolutions, window sizes, top-K capacities)
are static Python ints so jit sees constant shapes.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple


def _frozen(cls):
    return dataclass(frozen=True)(cls)


@_frozen
class ResNetFPNConfig:
    """Reference: /root/reference/config.py:16-18."""

    initial_dim: int = 128
    block_dims: Tuple[int, ...] = (128, 196, 256)


@_frozen
class SwinConfig:
    """Swin-T U-Net backbone dims.

    Reference: /root/reference/network/backbone/swin_backbone_modify_unetarchecture.py:549-567.
    """

    patch_size: int = 4
    embed_dim: int = 64
    depths: Tuple[int, ...] = (2, 2, 6)
    depths_up: Tuple[int, ...] = (1, 1, 1)
    num_heads: Tuple[int, ...] = (4, 8, 16)
    window_size: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.2
    patch_norm: bool = True
    # fused Pallas window attention: 'auto' (TPU inference), 'on', 'off'
    fused_attention: str = "auto"
    # fully-fused differentiable Pallas Swin block (fwd + bwd kernels,
    # ops/pallas_swin_block_grad): 'auto' (any accelerator, train AND eval),
    # 'on', 'off'. Supersedes fused_attention when active.
    fused_block: str = "auto"


@_frozen
class TransformerConfig:
    """LoFTR transformer stack. Reference: /root/reference/config.py:20-25,39-43."""

    d_model: int = 256
    nhead: int = 8
    layer_names: Tuple[str, ...] = ("self", "cross") * 4
    attention: str = "linear"  # 'linear' | 'full'
    # differentiable fused Pallas stack (ops/pallas_coarse_grad) for the
    # training/eval Matcher path: 'auto' (on accelerators), 'on', 'off'.
    # Falls back per-call when unsupported (masks, odd dims, 'full').
    fused_train: str = "auto"


@_frozen
class CoarseMatchConfig:
    """Dual-softmax coarse matching. Reference: /root/reference/config.py:29-36.

    `max_matches` is new: the static top-K capacity of the match list. The
    reference used dynamic `torch.where` lists (coarse_matching_new.py:109);
    we keep a fixed K with a validity mask so everything stays jit-able.
    """

    thr: float = 0.20
    border_rm: int = 2
    dsmax_temperature: float = 0.1
    max_matches: int = 1024
    # training-time fine-stage sampling capacity (reference pads with GT ids,
    # coarse_matching_new.py:113-120; spv ids are padded to this length)
    max_gt_matches: int = 1024


@_frozen
class FineMatchConfig:
    """Fine window refinement. Reference: /root/reference/config.py:12-13,39-43."""

    window_size: int = 7  # must be odd
    d_model: int = 64
    nhead: int = 8
    layer_names: Tuple[str, ...] = ("self", "cross")
    attention: str = "linear"
    concat_coarse_feat: bool = True
    # differentiable fused Pallas window transformer (ops/pallas_fine_grad)
    # for the training/eval Matcher path: 'auto' (on accelerators), 'on',
    # 'off'. One backward kernel per encoder layer (the whole-stack variant
    # exceeded scoped vmem); device A/B 72.0 -> 69.8 ms/step.
    fused_train: str = "auto"


@_frozen
class PoseHeadConfig:
    """Learned relative-pose regression heads.

    Reference: /root/reference/config.py:46-66 (POSE / POSE_NEW namespaces).
    flag: 'none' | 'old' (axis-angle+translation, pose_pred.py:196) |
          'new' (quaternion+translation, pose_pred_new.py, bit-faithful incl.
          its direction-softmax quat normalization that cannot represent
          rotations) | 'new_fixed' (same trunk/params, per-direction
          L2-normalized w>=0 quaternion — the head the reference author
          needed; ours-only capability).
    """

    flag: str = "none"
    d_model: int = 256
    nhead: int = 8
    layer_names_old: Tuple[str, ...] = ("self", "cross")
    layer_names_new: Tuple[str, ...] = ("cross", "cross", "cross", "cross")
    attention: str = "linear"
    size: Tuple[int, int] = (60, 80)
    axis_w: float = 1.0
    trans_w: float = 1.0


@_frozen
class LossConfig:
    """Reference: /root/reference/config.py:70-85."""

    coarse_type: str = "focal"  # 'focal' | 'cross_entropy'
    coarse_weight: float = 1.0
    # NOTE: the reference Loss reads sparse_spvs from MATCH_COARSE (loss.py:15),
    # whose default is True (config.py:36) — not LOSS.SPARSE_SPVS=False.
    sparse_spvs: bool = True
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    pos_weight: float = 1.0
    neg_weight: float = 1.0
    fine_weight: float = 1.0
    fine_correct_thr: float = 1.0
    r_weight: float = 1.0
    t_weight: float = 1.0
    # add the pose-head loss to the total. The reference COMPUTES loss_pose
    # but leaves the accumulation commented out (loss.py:169 `# loss +=
    # loss_pose`), so its pose heads receive no gradient; False reproduces
    # that quirk. True actually trains the head (used by the pose-parity
    # protocol, which re-adds the commented line on the torch side too).
    pose_in_total: bool = False


@_frozen
class ModelConfig:
    backbone_type: str = "swin_v1"  # 'resnet_fpn' | 'swin_v1'
    input_channels: int = 3
    resolution: Tuple[int, int] = (8, 2)  # (coarse, fine) strides
    resnet_fpn: ResNetFPNConfig = field(default_factory=ResNetFPNConfig)
    swin: SwinConfig = field(default_factory=SwinConfig)
    coarse: TransformerConfig = field(default_factory=TransformerConfig)
    match_coarse: CoarseMatchConfig = field(default_factory=CoarseMatchConfig)
    fine: FineMatchConfig = field(default_factory=FineMatchConfig)
    pose: PoseHeadConfig = field(default_factory=PoseHeadConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    # compute dtype for matmul-heavy paths ('bfloat16' on TPU, 'float32' for tests)
    compute_dtype: str = "bfloat16"
    # coarse-only matcher (no fine refinement) — the LoFTR-tiny mode used by
    # the reference as a frozen teacher (network/module/loftr_tiny.py)
    coarse_only: bool = False
    # positional encoding before the coarse transformer. None = auto (on for
    # resnet_fpn, off for swin — the reference's net.py:66-70 comments PE out
    # entirely, but LoFTR-tiny applies it; auto gives each backbone the
    # sensible default). Set False to reproduce the reference net exactly.
    positional_encoding: Optional[bool] = None


@_frozen
class OptimizerConfig:
    """Reference: /root/reference/config.py:100-123 and optimizers/__init__.py."""

    name: str = "adamw"  # 'adam' | 'adamw'
    canonical_bs: int = 64
    canonical_lr: float = 6e-3
    adam_decay: float = 0.0
    adamw_decay: float = 0.1
    warmup_type: str = "linear"  # 'linear' | 'constant'
    warmup_ratio: float = 0.0
    warmup_steps: int = 4800
    scheduler: str = "multistep"  # 'multistep' | 'cosine' | 'exponential'
    scheduler_interval: str = "epoch"
    mslr_milestones: Tuple[int, ...] = (3, 6, 9, 12, 15, 18, 21, 24, 27)
    mslr_gamma: float = 0.5
    cosa_tmax: int = 30
    elr_gamma: float = 0.999992
    gradient_clipping: float = 0.5


@_frozen
class RansacConfig:
    """On-device RANSAC pose solver. Reference: /root/reference/config.py:131-138."""

    epi_err_thr: float = 5e-4
    pixel_thr: float = 0.5
    conf: float = 0.99999
    # fixed iteration count for the jit-able solver (the reference's adaptive
    # cv2 loop caps at 10000; we run a static batch of hypotheses)
    num_hypotheses: int = 512
    refine_iters: int = 2


@_frozen
class TrainerConfig:
    seed: int = 114514
    batch_size: int = 4  # per-host micro batch
    steps_per_epoch: int = 1000
    num_epochs: int = 30
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    ransac: RansacConfig = field(default_factory=RansacConfig)
    # sampler (reference: config.py:140-149)
    data_sampler: str = "normal"
    n_samples_per_subset: int = 200
    # error-colored match figures dumped per val epoch (reference
    # lightning_new.py:277-312 via utils/plotting.py:107-128); 0 disables
    val_plot_pairs: int = 3


@_frozen
class DataConfig:
    """Reference: /root/reference/config.py:88-96."""

    trainval_data_root: str = ""
    train_data_root: str = ""
    val_data_root: str = ""
    test_data_root: str = ""
    data_enhance: Tuple[int, ...] = (1,)
    img_read_gray: bool = False
    img_size: Tuple[int, int] = (640, 480)  # (W, H)


@_frozen
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    trainer: TrainerConfig = field(default_factory=TrainerConfig)
    data: DataConfig = field(default_factory=DataConfig)


def default_config() -> Config:
    return Config()


def replace(cfg: Any, **kwargs: Any) -> Any:
    """Functional override of any (nested) config node."""
    return dataclasses.replace(cfg, **kwargs)


def tpu_optimized_config() -> Config:
    """Performance profile: same capability/quality class as the default, but
    MXU-friendly head widths (head_dim 64 instead of the reference's 16 — the
    systolic array's contraction dim is 128, so 16-wide heads run the window
    attention at ~6% MXU utilization). NOT weight-compatible with reference
    checkpoints; use default_config() for checkpoint import/parity.
    """
    model = ModelConfig(
        swin=SwinConfig(num_heads=(1, 2, 4)),
        coarse=TransformerConfig(d_model=256, nhead=4),
        fine=FineMatchConfig(d_model=64, nhead=1),
        pose=PoseHeadConfig(nhead=4),
    )
    return Config(model=model)


def loftr_tiny_config() -> Config:
    """Frozen-teacher profile: a coarse-only matcher weight-compatible with the
    official LoFTR `outdoor_ds.ckpt` as consumed by the reference's LoFTR_tiny
    (/root/reference/network/module/loftr_tiny.py:244-281): ResNetFPN_8_2 with
    initial_dim 128 / block_dims (128, 196, 256), grayscale input, 8-layer
    linear-attention coarse transformer (d=256, h=8), positional encoding ON,
    dual-softmax matching thr 0.2 / border 2 / T 0.1. Load weights with
    utils.torch_convert.load_loftr_tiny_checkpoint."""
    model = ModelConfig(
        backbone_type="resnet_fpn",
        input_channels=1,
        resnet_fpn=ResNetFPNConfig(initial_dim=128, block_dims=(128, 196, 256)),
        coarse=TransformerConfig(
            d_model=256, nhead=8, layer_names=("self", "cross") * 4,
            attention="linear",
        ),
        fine=FineMatchConfig(d_model=128),
        compute_dtype="float32",
        coarse_only=True,
    )
    return Config(model=model)


def highres_eval_config() -> Config:
    """High-resolution serving profile: 1280x960 input -> 120x160 = 19200
    coarse tokens, so the [L, S] = 19200^2 fp32 correlation is ~1.5 GB/pair —
    past what a single chip should materialize. The coarse matching stage is
    meant to run sequence-parallel over a ('data', 'model') mesh
    (Matcher(..., shard_mesh=mesh) / evaluate --model-shard N): each chip
    holds an S/N shard of image-1 tokens and the row statistics flash-merge
    over ICI (ops/sharded_matching.py). Weight-compatible with the default
    flagship config — same parameter tree, larger input.
    """
    model = ModelConfig(
        match_coarse=CoarseMatchConfig(max_matches=4096, max_gt_matches=1024),
    )
    return Config(
        model=model,
        data=DataConfig(img_size=(1280, 960)),
    )


def tiny_test_config() -> Config:
    """A miniature config for fast CPU tests: small images, tiny towers."""
    model = ModelConfig(
        backbone_type="resnet_fpn",
        input_channels=1,
        resnet_fpn=ResNetFPNConfig(initial_dim=8, block_dims=(8, 12, 16)),
        coarse=TransformerConfig(d_model=16, nhead=2, layer_names=("self", "cross")),
        match_coarse=CoarseMatchConfig(max_matches=32, max_gt_matches=32),
        fine=FineMatchConfig(d_model=8, nhead=2, layer_names=("self", "cross"), window_size=5),
        compute_dtype="float32",
    )
    return Config(model=model)


def config_to_dict(cfg: Any) -> dict:
    """Nested frozen-dataclass config -> plain dict (json-serializable)."""
    import dataclasses as _dc

    return _dc.asdict(cfg)


def config_from_dict(cls: Any, d: dict) -> Any:
    """Inverse of config_to_dict: rebuild `cls` (and nested config
    dataclasses) from a plain dict; json round trips lists back to the
    tuples the frozen configs declare."""
    import dataclasses as _dc
    import typing

    kwargs = {}
    for f in _dc.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        t = f.type
        if isinstance(t, str):  # from __future__ annotations
            t = typing.get_type_hints(cls).get(f.name, t)
        if _dc.is_dataclass(t) and isinstance(v, dict):
            v = config_from_dict(t, v)
        elif isinstance(v, list):
            v = tuple(tuple(x) if isinstance(x, list) else x for x in v)
        kwargs[f.name] = v
    return cls(**kwargs)
