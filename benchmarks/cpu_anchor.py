"""CPU-forward anchor: the ACTUAL reference codebase vs ours, same host.

The round-1 baseline compared TPU throughput against the published
LoFTR-2080Ti number because the reference publishes nothing and no GPU
exists here. This benchmark anchors the comparison to the reference
codebase itself: both frameworks run the full flagship forward (Swin-UNet +
coarse LoFTR + dual-softmax matching + fine refinement) on the SAME host
CPU, single 640x480 gray pair, float32.

    python benchmarks/cpu_anchor.py [--iters 3] [--size 640 480]

Prints one JSON line with ms/pair for both and the ratio.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def bench_reference(imgs: np.ndarray, iters: int) -> float:
    """Full reference net (demo eval surface: backbone 'swin', pose off)."""
    import torch

    from featurematching_tpu.utils.ref_oracle import install_shims, load_ref_module

    install_shims()
    net_mod = load_ref_module("network/net.py")

    # demo/net_config.py lowered by hand (yacs is not in this image):
    # backbone 'swin', coarse d256 h8 linear x4, fine d64 h8 linear x1,
    # dual-softmax thr 0.2 T 0.1, pose off
    config = {
        "backbone_type": "swin",
        "input_channel": 1,
        "resolution": (8, 2),
        "fine_window_size": 7,
        "fine_concat_coarse_feat": True,
        "resnetfpn": {"initial_dim": 128, "block_dims": [128, 196, 256]},
        "coarse": {
            "d_model": 256, "nhead": 8,
            "layer_names": ["self", "cross"] * 4, "attention": "linear",
        },
        "match_coarse": {
            "thr": 0.2, "border_rm": 2, "match_type": "dual_softmax",
            "dsmax_temperature": 0.1, "train_coarse_percent": 1.0,
            "train_pad_num_gt_min": 200,
        },
        "pose_net_flag": "none",
        "fine": {
            "d_model": 64, "nhead": 8,
            "layer_names": ["self", "cross"] * 1, "attention": "linear",
        },
    }
    torch.manual_seed(0)
    net = net_mod.net(config).eval()

    t0 = torch.from_numpy(imgs[0:1])  # [1, 1, H, W]
    t1 = torch.from_numpy(imgs[1:2])

    def run():
        data = {"image0": t0, "image1": t1}
        with torch.no_grad():
            net(data)
        return data["mkpts0_f"]

    run()  # warmup
    start = time.perf_counter()
    for _ in range(iters):
        run()
    return (time.perf_counter() - start) / iters * 1000


def bench_ours(imgs: np.ndarray, iters: int) -> float:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax.numpy as jnp

    import featurematching_tpu as fm
    from featurematching_tpu.models import Matcher

    cfg = fm.default_config()
    mcfg = dataclasses.replace(
        cfg.model, compute_dtype="float32", input_channels=1,
        positional_encoding=False,  # reference net.py:66-70 comments PE out
    )
    model = Matcher(mcfg)
    # NCHW [2,1,H,W] -> NHWC
    img0 = jnp.asarray(imgs[0:1].transpose(0, 2, 3, 1))
    img1 = jnp.asarray(imgs[1:2].transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), img0, img1, train=False)

    @jax.jit
    def fwd(v, a, b):
        out = model.apply(v, a, b, train=False)
        return out.fine.mkpts0_f

    float(jnp.sum(fwd(variables, img0, img1)))  # compile+warmup
    start = time.perf_counter()
    for _ in range(iters):
        r = fwd(variables, img0, img1)
    float(jnp.sum(r))
    return (time.perf_counter() - start) / iters * 1000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--size", type=int, nargs=2, default=(640, 480))
    args = ap.parse_args()

    W, H = args.size
    rng = np.random.default_rng(0)
    imgs = rng.random((2, 1, H, W)).astype(np.float32)

    ours_ms = bench_ours(imgs, args.iters)
    ref_ms = bench_reference(imgs, args.iters)
    print(
        json.dumps(
            {
                "metric": "cpu_forward_ms_per_pair",
                "reference_torch_cpu": round(ref_ms, 1),
                "ours_jax_cpu": round(ours_ms, 1),
                "speedup": round(ref_ms / ours_ms, 3),
                "size": [W, H],
            }
        )
    )


if __name__ == "__main__":
    main()
