"""Train-step throughput benchmark at the flagship operating point.

Measures ms/step of the jitted train step (fwd + bwd + adamw) at 640x480
batch-4 bf16 — the number VERDICT round 1 flagged as 3.2x slower than the
inference forward (127 ms vs 39.8 ms). A/Bs the fully-fused differentiable
Pallas Swin block (ops/pallas_swin_block_grad) against the per-op XLA path
IN ONE PROCESS (the tunnel platform has ±8% run-to-run variance).

    python benchmarks/train_step_bench.py [--batch 4] [--iters 10]
        [--modes fused,plain]

Tunnel rules honored: persistent compile cache, host-side param init,
scalar-fetch sync (block_until_ready is a no-op on axon).
"""

from __future__ import annotations

import argparse
import dataclasses as dc
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(mode: str, batch: int):
    import jax
    import jax.numpy as jnp
    import optax

    import featurematching_tpu as fm
    from featurematching_tpu.data.synthetic import synthetic_batch
    from featurematching_tpu.models.matcher import Matcher
    from featurematching_tpu.train.step import TrainState, make_opt_state, make_train_step
    from featurematching_tpu.utils.host_init import host_init_variables

    cfg = fm.default_config()
    cfg = dc.replace(
        cfg,
        model=dc.replace(
            cfg.model,
            swin=dc.replace(
                cfg.model.swin,
                fused_block="on" if mode == "fused" else "off",
                fused_attention="off",
            ),
        ),
    )
    model = Matcher(cfg.model)

    rng = np.random.default_rng(0)
    b = synthetic_batch(rng, batch_size=batch, image_size=(480, 640))
    batch_dev = {k: jnp.asarray(v) for k, v in b.items()}

    variables = host_init_variables(
        model, jax.random.PRNGKey(0), batch_dev["image0"], batch_dev["image1"]
    )
    tx = optax.adamw(1e-4, weight_decay=0.1)
    params = variables["params"]
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=make_opt_state(tx, params),
        tx=tx,
    )
    step = jax.jit(make_train_step(model, cfg))
    return step, state, batch_dev


def run_mode(mode: str, batch: int, iters: int, warmup: int):
    import jax
    import jax.numpy as jnp

    step, state, batch_dev = build(mode, batch)
    rng = jax.random.PRNGKey(1)

    t0 = time.time()
    state, metrics = step(state, batch_dev, rng)
    loss = float(metrics["loss"])  # scalar fetch = completion barrier
    compile_s = time.time() - t0

    for _ in range(warmup - 1):
        state, metrics = step(state, batch_dev, rng)
        float(metrics["loss"])

    t0 = time.time()
    for _ in range(iters):
        state, metrics = step(state, batch_dev, rng)
    loss = float(metrics["loss"])
    dt = (time.time() - t0) / iters
    return {
        "mode": mode,
        "ms_per_step": dt * 1e3,
        "pairs_per_s": batch / dt,
        "first_loss": loss,
        "compile_s": compile_s,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--modes", default="fused,plain")
    args = ap.parse_args()

    import jax

    cache_dir = os.path.expanduser("~/.cache/fmtpu_jax")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    for mode in args.modes.split(","):
        res = run_mode(mode.strip(), args.batch, args.iters, args.warmup)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
