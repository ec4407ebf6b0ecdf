"""Device-op profile of the fast inference path (or the train step).

Runs the flagship forward under `jax.profiler.trace`, parses the resulting
`vm.trace.json.gz`, and prints per-op and per-bucket device time. This is the
tool behind the docs/ROADMAP.md profile tables.

    python benchmarks/profile_inference.py [--train] [--iters 10]

Tunnel notes (docs/ROADMAP.md): block_until_ready is a no-op — completion is
forced by a scalar host fetch; run ONE device process at a time.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


BUCKETS = [
    ("pallas_block_bwd", re.compile(r"swin_block.*(vjp|bwd|grad)|.*grad.*swin_block|_bwd_impl")),
    ("pallas_block_fwd", re.compile(r"swin_block|_fwd_impl")),
    ("pallas_matcher", re.compile(r"dual_softmax|match_stats|_pallas_forward")),
    ("pallas_fine", re.compile(r"fine_stage_fused")),
    ("pallas_coarse", re.compile(r"layer_stats|layer_apply")),
    ("pallas_ln", re.compile(r"layer_norm_chain")),
    ("pallas_other", re.compile(r"pallas|mosaic|custom-call")),
    ("gather", re.compile(r"gather")),
    ("conv", re.compile(r"convolution")),
    ("copy", re.compile(r"^copy|copy-start|copy-done|transpose")),
    ("convert", re.compile(r"convert")),
    ("reshape", re.compile(r"reshape|bitcast")),
    ("fusion", re.compile(r"fusion|dot|cublas|add|multiply|subtract|divide")),
]


def bucket_of(name: str) -> str:
    for b, rx in BUCKETS:
        if rx.search(name):
            return b
    return "other"


def parse_trace(trace_dir: str, iters: int) -> None:
    paths = glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no trace under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    # device lanes: pick pids whose process_name mentions TPU/device, else all
    # pids that carry XLA op events
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    op_dur = collections.Counter()
    op_cnt = collections.Counter()
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "Device" not in pname and "/device" not in pname:
            continue
        name = e.get("name", "")
        if name.startswith("Steps") or name.startswith("run_"):
            continue
        if name.startswith("jit_"):  # whole-module parent span, double-counts
            continue
        if name.isdigit():  # per-step marker span, double-counts everything
            continue
        op_dur[name] += e.get("dur", 0)
        op_cnt[name] += 1

    # span/gap analysis: per device lane (pid,tid), wall span covered by ops
    # vs busy time — the difference is device idle (dispatch/launch gaps)
    lane_iv = collections.defaultdict(list)
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "Device" not in pname and "/device" not in pname:
            continue
        name = e.get("name", "")
        if (name.startswith("Steps") or name.startswith("run_")
                or name.startswith("jit_") or name.isdigit()):
            continue
        lane_iv[(e["pid"], e.get("tid", 0))].append((e["ts"], e["ts"] + e.get("dur", 0)))
    # merge intervals across ALL lanes: busy-union vs total span
    allint = sorted(iv for ivs in lane_iv.values() for iv in ivs)
    busy_union = 0.0
    span = 0.0
    if allint:
        span = max(b for _, b in allint) - allint[0][0]
        cs, ce = allint[0]
        for s, t in allint[1:]:
            if s > ce:
                busy_union += ce - cs
                cs, ce = s, t
            else:
                ce = max(ce, t)
        busy_union += ce - cs

    total = sum(op_dur.values())
    print(f"trace: {path}")
    print(f"device op time total: {total/1000:.2f} ms over {iters} iters "
          f"=> {total/1000/iters:.2f} ms/iter")
    if allint:
        print(f"device span {span/1000:.2f} ms, busy-union {busy_union/1000:.2f} ms, "
              f"idle {(span-busy_union)/1000:.2f} ms => "
              f"{(span-busy_union)/1000/iters:.2f} ms idle/iter "
              f"({len(allint)} op instances, {len(lane_iv)} lanes)")
    print()

    buckets = collections.Counter()
    for name, d in op_dur.items():
        buckets[bucket_of(name.lower())] += d
    print("== buckets (ms/iter) ==")
    for b, d in buckets.most_common():
        print(f"  {b:18s} {d/1000/iters:8.2f}")

    print("\n== top 30 ops (ms/iter) ==")
    for name, d in op_dur.most_common(30):
        print(f"  {d/1000/iters:8.3f}  x{op_cnt[name]:<4d} {name[:100]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--trace-dir", default="/tmp/fmtpu_prof")
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()

    if args.parse_only:
        parse_trace(args.trace_dir, args.iters)
        return

    import jax

    cache_dir = os.path.expanduser("~/.cache/fmtpu_jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    import featurematching_tpu as fm
    from featurematching_tpu.models import Matcher
    from featurematching_tpu.utils.host_init import host_init_variables

    cfg = fm.default_config()
    model = Matcher(cfg.model)
    rng = np.random.default_rng(0)
    H, W = 480, 640
    img0 = jnp.asarray(rng.random((args.batch, H, W, 3)).astype(np.float32))
    img1 = jnp.asarray(rng.random((args.batch, H, W, 3)).astype(np.float32))
    variables = host_init_variables(model, jax.random.PRNGKey(0), img0, img1)

    if args.train:
        from featurematching_tpu.benchmarks_support import make_train_callable  # type: ignore
        fwd, fetch = make_train_callable(cfg, variables, img0, img1)
    else:
        from featurematching_tpu.models.fast_inference import make_fast_matcher_fn

        fast = make_fast_matcher_fn(cfg.model)

        @jax.jit
        def fwd_fn(variables, a, b):
            out = fast(variables, a, b)
            return out.coarse.mask, out.fine.mkpts0_f, out.fine.mkpts1_f

        def fwd():
            return fwd_fn(variables, img0, img1)

        def fetch(res):
            return float(jnp.sum(res[2].astype(jnp.float32)))

    for _ in range(2):
        fetch(fwd())

    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.iters):
            res = fwd()
        fetch(res)

    parse_trace(args.trace_dir, args.iters)


if __name__ == "__main__":
    main()
