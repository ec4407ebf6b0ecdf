"""Frozen-teacher deep-match source for offline pseudo-GT caches.

The reference has two "deep matcher as labeler" capabilities:

  * a frozen coarse-only LoFTR loaded next to the trainable matcher
    (/root/reference/lightning_new.py:200-211 — loaded via ``loftr_cfg`` /
    ``loftr_ckpt``; the module itself is ``network/module/loftr_tiny.py:107-242``).
    Note the reference never calls ``self.loftr`` after loading it — the
    capability ends at weight loading.
  * DISK deep matches computed inside ``UnityDataset.__getitem__`` and
    unioned with cached SIFT-smnn matches before the homography-RANSAC
    pseudo-GT filter (/root/reference/datasets/unity_data.py:215-235).

This module implements both as ONE offline tool (TPU-first design: no
accelerator work inside dataloader workers — SURVEY.md §3.1): a frozen
coarse-only :class:`~featurematching_tpu.models.matcher.Matcher` (the
LoFTR-tiny profile, optionally with converted official-LoFTR weights)
produces per-pair deep matches, which ``pseudo_gt.build_match_cache`` unions
with SIFT mutual-NN matches before RANSAC — exactly the unity_data mixed-
keypoint recipe, but cached to disk instead of recomputed per epoch.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np

MatchFn = Callable[[np.ndarray, np.ndarray], Tuple[np.ndarray, np.ndarray]]


def _pad_to_multiple(img: np.ndarray, mult: int) -> np.ndarray:
    """Zero-pad H/W up to the next multiple (the reference pads DISK inputs
    with pad_if_not_divisible, unity_data.py:228)."""
    h, w = img.shape
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        img = np.pad(img, ((0, ph), (0, pw)))
    return img


def make_teacher_fn(
    ckpt: Optional[str] = None,
    cfg=None,
    thr: Optional[float] = None,
    platform: str = "cpu",
) -> MatchFn:
    """Build a frozen-teacher match function.

    Args:
      ckpt: optional official-LoFTR/.ckpt path (converted via
        ``utils.torch_convert.load_loftr_tiny_checkpoint``). Without it the
        teacher is randomly initialized — only useful for plumbing tests.
      cfg: full :class:`~featurematching_tpu.config.Config`; defaults to
        ``config.loftr_tiny_config()`` (the reference's frozen-teacher
        profile, loftr_tiny.py:244-281). ``model.coarse_only`` is forced on.
      thr: override the coarse confidence threshold (e.g. a tiny value for
        an untrained teacher in tests).
      platform: 'cpu' keeps the teacher off the (single-tenant) TPU tunnel —
        this is offline tooling; 'device' uses the default backend.

    Returns: fn(img0_gray, img1_gray) -> (kp0 [M,2], kp1 [M,2]) full-res
      (x, y) float32 keypoints; images are [H, W] uint8 or float in [0,1].
    """
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from featurematching_tpu.config import loftr_tiny_config
    from featurematching_tpu.models.matcher import Matcher

    native = None
    if ckpt and ckpt.endswith(".npz"):
        # native TRAINED teacher: the npz carries its own ModelConfig.
        # coarse_only is NOT forced — the saved params cover whatever
        # submodules the teacher was trained with, and the match fn only
        # consumes the coarse outputs either way.
        saved_cfg, native_params, native_stats = load_teacher_ckpt(ckpt)
        native = (native_params, native_stats)
        model_cfg = saved_cfg
    else:
        cfg = cfg or loftr_tiny_config()
        model_cfg = dc.replace(cfg.model, coarse_only=True)
    if thr is not None:
        model_cfg = dc.replace(
            model_cfg, match_coarse=dc.replace(model_cfg.match_coarse, thr=thr)
        )
    model = Matcher(model_cfg)

    device = None
    if platform == "cpu":
        device = jax.devices("cpu")[0]

    variables = {}

    def _init(img: jnp.ndarray) -> None:
        nonlocal variables
        if variables:
            return
        if native is not None:
            params = jax.tree.map(jnp.asarray, native[0])
            stats = jax.tree.map(jnp.asarray, native[1])
        elif ckpt:
            from featurematching_tpu.utils.torch_convert import (
                load_loftr_tiny_checkpoint,
            )

            params, stats = load_loftr_tiny_checkpoint(ckpt)
            params = jax.tree.map(jnp.asarray, params)
            stats = jax.tree.map(jnp.asarray, stats)
        else:
            v = model.init(jax.random.PRNGKey(0), img, img)
            params, stats = v["params"], v.get("batch_stats", {})
        variables = {"params": params, "batch_stats": stats}

    @jax.jit
    def _apply(vars_, img0, img1):
        out = model.apply(vars_, img0, img1, train=False)
        c = out.coarse
        if model_cfg.coarse_only:
            return c.mkpts0_c, c.mkpts1_c, c.mask
        # fine-refined keypoints (round 5): coarse centers are quantized to
        # the 1/8 grid (up to ~4 px off), which passed the loose homography
        # gate but diluted epipolar precision of the union cache — the
        # reference's DISK teacher likewise emits subpixel keypoints
        # (unity_data.py:225-232). mkpts*_f carry (x, y, std); drop the std.
        return out.fine.mkpts0_f[..., :2], out.fine.mkpts1_f[..., :2], c.mask

    def match(img0: np.ndarray, img1: np.ndarray):
        sc = model_cfg.resolution[0]
        h, w = img0.shape
        a0 = _pad_to_multiple(np.asarray(img0), sc).astype(np.float32)
        a1 = _pad_to_multiple(np.asarray(img1), sc).astype(np.float32)
        if a0.max() > 1.5:  # uint8 range
            a0, a1 = a0 / 255.0, a1 / 255.0
        with jax.default_device(device) if device is not None else _null():
            b0 = jnp.asarray(a0)[None, :, :, None]
            b1 = jnp.asarray(a1)[None, :, :, None]
            _init(b0)
            k0, k1, mask = _apply(variables, b0, b1)
        k0 = np.asarray(k0[0], np.float32)
        k1 = np.asarray(k1[0], np.float32)
        m = np.array(mask[0], bool)  # writable copy (np.asarray views jax buffers)
        # drop matches that landed in the divisibility pad
        m &= (k0[:, 0] < w) & (k0[:, 1] < h) & (k1[:, 0] < w) & (k1[:, 1] < h)
        return k0[m], k1[m]

    return match


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def deep_match_paths(match_fn: MatchFn) -> Callable[[str, str], Tuple[np.ndarray, np.ndarray]]:
    """Lift an image-array match fn to one over image file paths (grayscale
    read, like unity_data.py:205-208)."""
    def fn(path0: str, path1: str):
        import cv2

        g0 = cv2.imread(path0, cv2.IMREAD_GRAYSCALE)
        g1 = cv2.imread(path1, cv2.IMREAD_GRAYSCALE)
        if g0 is None or g1 is None:
            raise FileNotFoundError(path0 if g0 is None else path1)
        return match_fn(g0, g1)

    return fn


# ---------------------------------------------------------------------------
# native teacher checkpoints (round 4): a TRAINED teacher, not just the
# converted-official-LoFTR path. The npz carries both the weights and the
# ModelConfig json so the loader reconstructs the exact teacher architecture.
# ---------------------------------------------------------------------------


def save_teacher_ckpt(path: str, model_cfg, params, batch_stats) -> None:
    """Save a trained matcher as a frozen-teacher checkpoint (.npz)."""
    import json

    from flax.traverse_util import flatten_dict

    from featurematching_tpu.config import config_to_dict

    arrs = {}
    for k, v in flatten_dict(params).items():
        arrs["p:" + "/".join(k)] = np.asarray(v)
    for k, v in flatten_dict(batch_stats or {}).items():
        arrs["s:" + "/".join(k)] = np.asarray(v)
    arrs["cfg_json"] = np.frombuffer(
        json.dumps(config_to_dict(model_cfg)).encode(), np.uint8
    )
    np.savez_compressed(path, **arrs)


def load_teacher_ckpt(path: str):
    """Load a native teacher checkpoint -> (model_cfg, params, batch_stats)."""
    import json

    from flax.traverse_util import unflatten_dict

    from featurematching_tpu.config import ModelConfig, config_from_dict

    z = dict(np.load(path))
    cfg = config_from_dict(
        ModelConfig, json.loads(bytes(z.pop("cfg_json")).decode())
    )
    p = {tuple(k[2:].split("/")): v for k, v in z.items() if k.startswith("p:")}
    s = {tuple(k[2:].split("/")): v for k, v in z.items() if k.startswith("s:")}
    return cfg, unflatten_dict(p), unflatten_dict(s)
