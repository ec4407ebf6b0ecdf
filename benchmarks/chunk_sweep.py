"""In-process sweep of kernel chunk budgets past the 16 MB scoped-VMEM wall.

Round-5 lever: several hot train kernels documented their chunk ceiling as
"one step up OOMs scoped vmem" — but the 16 MB limit is a Mosaic DEFAULT
(double-buffering headroom), not hardware (v5e VMEM is 128 MB). ops/tuning
added per-kernel TUNE dicts (chunk budget + vmem_limit_bytes); this bench
re-jits the FULL train step (and the inference forward for the fine fwd
knob) per configuration in ONE process — the tunnel's ±8% cross-process
noise would swamp the 1-3 ms effects otherwise.

    python benchmarks/chunk_sweep.py [--iters 12] [--which train,infer]
        [--out benchmarks/chunk_sweep.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure_train(iters: int, warmup: int = 3, batch: int = 4):
    from train_step_bench import build

    import jax

    step, state, batch_dev = build("fused", batch)
    rng = jax.random.PRNGKey(1)
    state, metrics = step(state, batch_dev, rng)
    float(metrics["loss"])
    for _ in range(warmup - 1):
        state, metrics = step(state, batch_dev, rng)
        float(metrics["loss"])
    t0 = time.time()
    for _ in range(iters):
        state, metrics = step(state, batch_dev, rng)
    loss = float(metrics["loss"])
    return (time.time() - t0) / iters * 1e3, loss


def measure_infer(iters: int, warmup: int = 2, batch: int = 4):
    import jax
    import jax.numpy as jnp

    import featurematching_tpu as fm
    from featurematching_tpu.models import Matcher
    from featurematching_tpu.models.fast_inference import make_fast_matcher_fn
    from featurematching_tpu.utils.host_init import host_init_variables

    cfg = fm.default_config()
    model = Matcher(cfg.model)
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.random((batch, 480, 640, 3)).astype(np.float32))
    img1 = jnp.asarray(rng.random((batch, 480, 640, 3)).astype(np.float32))
    variables = host_init_variables(model, jax.random.PRNGKey(0), img0, img1)
    fast = make_fast_matcher_fn(cfg.model)

    @jax.jit
    def fwd(variables, a, b):
        out = fast(variables, a, b)
        return out.coarse.mask, out.fine.mkpts0_f, out.fine.mkpts1_f, out.coarse.mconf

    def fetch(res):
        return float(jnp.sum(res[1].astype(jnp.float32)))

    for _ in range(warmup):
        fetch(fwd(variables, img0, img1))
    t0 = time.time()
    for _ in range(iters):
        res = fwd(variables, img0, img1)
    fetch(res)
    return (time.time() - t0) / iters * 1e3


def set_tune(cfgspec: dict):
    """cfgspec: {'swin': {...}, 'coarse': {...}, 'fine_grad': {...},
    'fine_stage': {...}} — partial updates over each module's TUNE."""
    from featurematching_tpu.ops import (
        pallas_coarse_grad,
        pallas_coarse_transformer,
        pallas_dual_softmax,
        pallas_fine_grad,
        pallas_fine_stage,
        pallas_swin_block_grad,
        sparse_focal_loss,
    )

    mods = {
        "swin": pallas_swin_block_grad,
        "coarse": pallas_coarse_grad,
        "coarse_fwd": pallas_coarse_transformer,
        "dsm": pallas_dual_softmax,
        "fine_grad": pallas_fine_grad,
        "fine_stage": pallas_fine_stage,
        "sfl": sparse_focal_loss,
    }
    for key, mod in mods.items():
        for k, v in cfgspec.get(key, {}).items():
            mod.TUNE[k] = v


BASE = {
    "swin": {"fwd_budget": 2048, "bwd_budget": 1024, "fwd_vmem_mb": 0, "bwd_vmem_mb": 0},
    "coarse": {"bwd_rows": 1600, "bwd_vmem_mb": 48},
    "coarse_fwd": {"fwd_rows": 1600},
    "dsm": {"row_tile": 512},
    "fine_grad": {"bwd_budget": int(12e6), "bwd_vmem_mb": 0},
    "fine_stage": {"fwd_budget": int(7e6), "fwd_vmem_mb": 0},
    "sfl": {"use_pallas": True},
}

TRAIN_SWEEPS = [
    ("base", {}),
    ("swin_bwd_x2", {"swin": {"bwd_budget": 2048, "bwd_vmem_mb": 40}}),
    ("swin_bwd_x3", {"swin": {"bwd_budget": 3072, "bwd_vmem_mb": 56}}),
    ("swin_fwd_x2", {"swin": {"fwd_budget": 4096, "fwd_vmem_mb": 40}}),
    ("coarse_bwd_960", {"coarse": {"bwd_rows": 960, "bwd_vmem_mb": 32}}),
    ("coarse_bwd_1600", {"coarse": {"bwd_rows": 1600, "bwd_vmem_mb": 48}}),
    ("fine_bwd_x2", {"fine_grad": {"bwd_budget": int(24e6), "bwd_vmem_mb": 40}}),
    ("fine_fwd_x2", {"fine_stage": {"fwd_budget": int(14e6), "fwd_vmem_mb": 40}}),
]

INFER_SWEEPS = [
    ("base", {}),
    ("fine_fwd_x2", {"fine_stage": {"fwd_budget": int(14e6), "fwd_vmem_mb": 40}}),
    ("fine_fwd_x3", {"fine_stage": {"fwd_budget": int(21e6), "fwd_vmem_mb": 56}}),
    ("dsm_960", {"dsm": {"row_tile": 960}}),
    ("dsm_1600", {"dsm": {"row_tile": 1600}}),
    ("coarse_fwd_2400", {"coarse_fwd": {"fwd_rows": 2400}}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--which", default="train,infer")
    ap.add_argument("--extra", default="",
                    help="json list of extra (name, cfgspec) train sweeps")
    ap.add_argument("--only", default="",
                    help="comma-separated config names to run (others skipped)")
    ap.add_argument("--out", default="benchmarks/chunk_sweep.json")
    args = ap.parse_args()

    import jax

    cache_dir = os.path.expanduser("~/.cache/fmtpu_jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    results = {"train": [], "infer": []}
    which = args.which.split(",")
    train_sweeps = list(TRAIN_SWEEPS)
    if args.extra:
        train_sweeps += [tuple(x) for x in json.loads(args.extra)]
    if args.only:
        keep = set(args.only.split(","))
        train_sweeps = [t for t in train_sweeps if t[0] in keep]
    if "train" in which:
        for name, spec in train_sweeps:
            set_tune({k: dict(v) for k, v in BASE.items()})
            set_tune(spec)
            try:
                ms, loss = measure_train(args.iters)
                row = {"name": name, "ms_per_step": round(ms, 2),
                       "loss": round(loss, 4)}
            except Exception as e:  # compile OOM etc — record and continue
                row = {"name": name, "error": str(e)[:300]}
            results["train"].append(row)
            print(json.dumps(row), flush=True)
    if "infer" in which:
        for name, spec in INFER_SWEEPS:
            set_tune({k: dict(v) for k, v in BASE.items()})
            set_tune(spec)
            try:
                ms = measure_infer(args.iters * 4)
                row = {"name": name, "ms_per_batch": round(ms, 2),
                       "pairs_per_s": round(4e3 / ms, 1)}
            except Exception as e:
                row = {"name": name, "error": str(e)[:300]}
            results["infer"].append(row)
            print(json.dumps(row), flush=True)
    set_tune({k: dict(v) for k, v in BASE.items()})
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
