"""Parallel synthetic-pool generator for swin_pretrain.py.

The round-4 pretrain run spent ~29 min generating its 4096-pair two-plane
pool serially inside the (TPU-holding) training process. The generator is
pure numpy (data/synthetic.py), so this script fans it out over processes
with JAX_PLATFORMS=cpu and writes one .npz the trainer loads — pool
generation no longer occupies the chip and is cached across reruns.

    python benchmarks/gen_pool.py --pairs 4096 --size 96 128 \
        --out ckpts/pool_two_plane_4096.npz
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _gen_chunk(args):
    seed, per, H, W, num_gt = args
    from featurematching_tpu.data.synthetic import synthetic_batch

    rng = np.random.default_rng(seed)
    return synthetic_batch(
        rng, batch_size=per, image_size=(H, W), channels=1,
        num_gt=num_gt, n_planes=2, rot_scale=0.08, trans_scale=0.15,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=4096)
    ap.add_argument("--size", type=int, nargs=2, default=(96, 128))
    ap.add_argument("--num-gt", type=int, default=160)  # trained_parity.NUM_GT
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--workers", type=int, default=os.cpu_count())
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    H, W = args.size
    per = 16
    n_chunks = -(-args.pairs // per)
    # derive per-chunk seeds from one root SeedSequence so the pool is
    # reproducible regardless of worker count / completion order
    seeds = np.random.SeedSequence(args.seed).generate_state(n_chunks)
    work = [(int(s), per, H, W, args.num_gt) for s in seeds]

    t0 = time.time()
    from concurrent.futures import ProcessPoolExecutor

    with ProcessPoolExecutor(max_workers=args.workers) as ex:
        batches = list(ex.map(_gen_chunk, work))
    pool = {k: np.concatenate([b[k] for b in batches])[: args.pairs] for k in batches[0]}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez(args.out, **pool)
    sizes = {k: v.shape for k, v in pool.items()}
    print(f"[gen_pool] {args.pairs} pairs in {time.time()-t0:.0f}s -> {args.out} {sizes}")


if __name__ == "__main__":
    main()
