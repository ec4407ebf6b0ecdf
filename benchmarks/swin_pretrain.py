"""Pretrain the DEFAULT Swin-UNet flagship on streaming synthetic pairs —
the shared warm init for the round-4 Swin trained-parity campaign.

Round-3 finding (BASELINE.md "Swin-flagship matched-step control"): from
scratch on a FROZEN 64-pair fixture, NEITHER framework's Swin-UNet escapes
the uniform-dual-softmax plateau — a data-starvation property of training a
ViT-class backbone on 64 images, not a framework gap. This script removes
the starvation: it trains ours' flagship (production bf16 + fused Pallas
train kernels, one TPU chip) on a LARGE pool of freshly generated two-plane
pairs (default 4096 — 64x the fixture), then exports the weights as a
reference-format torch state_dict via utils.torch_convert.make_deconverter
(mechanical exact inverse of the weight converter, roundtrip-tested). Both
frameworks then FINE-TUNE from this common checkpoint under the fixed
trained_parity protocol — closing the "fused Swin VJP kernels have never
trained the default backbone to quality" gap (VERDICT round 3, weak #2).

    python benchmarks/swin_pretrain.py --steps 20000 --bs 8 \
        --out-sd /tmp/swin_warm.npz [--state /tmp/swin_init.npz]

The init is the reference module's own torch init (seed --seed), so the
warm checkpoint stays bit-compatible with the reference's loader.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trained_parity import ARCHS, NUM_GT, our_config, ref_module_config  # noqa: E402


def make_ref_init(seed: int) -> dict:
    """Instantiate the reference torch module and dump its init state dict."""
    import torch

    from featurematching_tpu.utils.ref_oracle import load_ref_module, sd_numpy

    net_mod = load_ref_module("network/net.py")
    torch.manual_seed(seed)
    return sd_numpy(net_mod.net(ref_module_config(ARCHS["flagship"])))


def gen_pool(rng, n_pairs, H, W, num_gt):
    """Pool of two-plane pairs in train.step batch layout (host numpy)."""
    from featurematching_tpu.data.synthetic import synthetic_batch

    batches = []
    per = 16
    for _ in range(-(-n_pairs // per)):
        b = synthetic_batch(
            rng, batch_size=per, image_size=(H, W), channels=1,
            num_gt=num_gt, n_planes=2, rot_scale=0.08, trans_scale=0.15,
        )
        batches.append(b)
    return {k: np.concatenate([b[k] for b in batches])[:n_pairs] for k in batches[0]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--size", type=int, nargs=2, default=(96, 128))
    ap.add_argument("--pool", type=int, default=4096)
    ap.add_argument("--lr", type=float, default=4e-4)
    ap.add_argument("--warmup", type=int, default=1000)
    ap.add_argument("--clip", type=float, default=0.5)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--state", default="", help="reuse a saved torch init npz")
    ap.add_argument("--pool-file", default="",
                    help="pre-generated pool npz (benchmarks/gen_pool.py); "
                         "skips the ~29 min in-process serial generation")
    ap.add_argument("--out-sd", default="ckpts/swin_warm.npz")
    ap.add_argument("--out-log", default="benchmarks/swin_pretrain_log.json")
    ap.add_argument("--log-every", type=int, default=500)
    ap.add_argument("--cosine", action="store_true",
                    help="warmup + cosine lr decay to 10%% (long runs)")
    args = ap.parse_args()

    import jax

    cache_dir = os.path.expanduser("~/.cache/fmtpu_jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import optax

    from featurematching_tpu.models.matcher import Matcher
    from featurematching_tpu.train.step import (
        TrainState,
        make_eval_step,
        make_opt_state,
        make_train_step,
    )
    from featurematching_tpu.utils.torch_convert import (
        convert_matcher,
        make_deconverter,
    )

    H, W = args.size
    for path in (args.state, args.out_sd, args.out_log):
        if path and os.path.dirname(path):
            os.makedirs(os.path.dirname(path), exist_ok=True)
    if args.state and os.path.exists(args.state):
        init_sd = dict(np.load(args.state))
    else:
        init_sd = make_ref_init(args.seed)
        if args.state:
            np.savez_compressed(args.state, **init_sd)

    cfg = our_config(ARCHS["flagship"], dtype="bfloat16", fused="auto")
    model = Matcher(cfg.model)
    params, stats = convert_matcher(init_sd, coarse_layers=8, fine_layers=2)
    params = jax.tree.map(jnp.asarray, params)
    stats = jax.tree.map(jnp.asarray, stats)

    def sched(count):
        warm = jnp.minimum(1.0, (count + 1) / max(args.warmup, 1))
        if not args.cosine:
            return args.lr * warm
        # warmup + cosine decay to a 10% floor: the 50k constant-lr run
        # diverged (NaN at ~25k steps despite clip + apply_if_finite —
        # bf16 loss spikes at a flat 4e-4 eventually produce a finite-but-
        # huge update); long-horizon runs need the decay
        prog = jnp.clip(
            (count - args.warmup) / max(args.steps - args.warmup, 1), 0.0, 1.0
        )
        cos = 0.1 + 0.9 * 0.5 * (1.0 + jnp.cos(jnp.pi * prog))
        return args.lr * warm * cos

    tx = optax.adam(sched)
    if args.clip:
        tx = optax.chain(optax.clip_by_global_norm(args.clip), tx)
    # divergence guard: the first run escaped the plateau (26 probe
    # matches/pair at step 3k, lr 4e-4) then hit a non-finite loss at ~3.5k
    # and never recovered — clip passes NaN grads through, apply_if_finite
    # skips those updates instead of poisoning the state
    tx = optax.apply_if_finite(tx, max_consecutive_errors=1000)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=stats,
        opt_state=make_opt_state(tx, params),
        tx=tx,
    )
    train_step = jax.jit(make_train_step(model, cfg))
    eval_step = jax.jit(make_eval_step(model, cfg))

    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    if args.pool_file:
        pool = dict(np.load(args.pool_file))
        args.pool = len(next(iter(pool.values())))
        print(f"[pretrain] pool of {args.pool} pairs from {args.pool_file}", flush=True)
    else:
        print(f"[pretrain] generating pool of {args.pool} pairs...", flush=True)
        pool = gen_pool(rng, args.pool, H, W, NUM_GT)
    probe = gen_pool(np.random.default_rng(args.seed + 999), 16, H, W, NUM_GT)
    probe_dev = {k: jnp.asarray(v) for k, v in probe.items()}
    print(f"[pretrain] pool ready in {time.time()-t0:.0f}s", flush=True)

    key = jax.random.PRNGKey(args.seed)
    log = []
    t0 = time.time()
    for step_i in range(args.steps):
        idx = rng.integers(0, args.pool, args.bs)
        batch = {k: jnp.asarray(v[idx]) for k, v in pool.items()}
        key, sub = jax.random.split(key)
        state, metrics = train_step(state, batch, sub)
        if (step_i + 1) % args.log_every == 0 or step_i == 0:
            loss = float(metrics["loss"])
            out, _ = eval_step(state, probe_dev)
            n_match = float(jnp.sum(out.coarse.mask.astype(jnp.float32))) / 16.0
            rec = dict(step=step_i + 1, loss=round(loss, 4),
                       probe_matches=round(n_match, 2),
                       wall_s=round(time.time() - t0, 1))
            log.append(rec)
            print(f"[pretrain] {json.dumps(rec)}", flush=True)
            if not np.isfinite(loss):
                # long-horizon bf16 runs can still diverge past the
                # clip/apply_if_finite guards (the 50k constant-lr run
                # NaN'd at ~25k) — stop burning chip time; the exported
                # params below are whatever the guards preserved
                print("[pretrain] non-finite probe loss — stopping early",
                      flush=True)
                break

    dec = make_deconverter(init_sd, coarse_layers=8, fine_layers=2)
    params_np = jax.tree.map(lambda a: np.asarray(a, np.float32), state.params)
    finite = all(
        bool(np.isfinite(a).all()) for a in jax.tree.leaves(params_np)
    )
    print(f"[pretrain] exported params finite: {finite}", flush=True)
    warm_sd = dec(params_np)
    np.savez_compressed(args.out_sd, **warm_sd)
    with open(args.out_log, "w") as f:
        json.dump(dict(args=vars(args), log=log), f, indent=1)
    print(f"[pretrain] warm sd -> {args.out_sd}; log -> {args.out_log}", flush=True)


if __name__ == "__main__":
    main()
