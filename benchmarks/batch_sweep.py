"""In-process batch-size sweep of the serving (fast-inference) throughput.

The bench.py headline has always been measured at batch 4 — our choice, not
the reference's (its demo runs batch 1, `/root/reference/demo/demo.py`;
nothing in the reference pins a serving batch). At a fixed per-pair byte/FLOP
cost, larger batches amortize per-iteration fixed costs (kernel launch gaps,
sub-full tail tiles of the row-chunked Pallas grids, small XLA fusions whose
cost does not scale with batch), so the throughput-optimal batch is an
empirical question. This sweep jits the SAME fused serving function at
several batch sizes in one process and reports pairs/s for each.

    python benchmarks/batch_sweep.py [--batches 4,8,16] [--iters 60]
        [--out benchmarks/batch_sweep.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(batch: int, iters: int, warmup: int = 2):
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
    t0 = time.perf_counter()
    for _ in range(iters):
        res = fwd(variables, img0, img1)
    fetch(res)
    dt = time.perf_counter() - t0
    return batch * iters / dt, dt / iters * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="4,8,16")
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default="benchmarks/batch_sweep.json")
    args = ap.parse_args()

    cache_dir = os.path.expanduser("~/.cache/fmtpu_jax")
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    rows = []
    for b in [int(x) for x in args.batches.split(",")]:
        best = None
        for _ in range(args.reps):
            pps, ms = measure(b, args.iters)
            if best is None or pps > best[0]:
                best = (pps, ms)
        rows.append(
            {"batch": b, "pairs_per_s": round(best[0], 1), "ms_per_batch": round(best[1], 2)}
        )
        print(json.dumps(rows[-1]), flush=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
