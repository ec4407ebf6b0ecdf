"""Training CLI — the launcher the reference kept out-of-repo (SURVEY.md L5:
"the launcher script itself is not in the repo").

    python -m featurematching_tpu.apps.train DATASET [ROOT ...] \
        [--workdir runs/x] [--epochs 30] [--batch 4] [--gray] \
        [--size 640 480] [--steps-per-epoch N] [--val-fraction 0.15] \
        [--num-gt 512] [--seed 114514] [--synthetic-pairs N]

DATASET: scared | endoslam | unity | synthetic. For scared, ROOT may be a
data root containing dataset_*/keyframe_* trees (auto-discovered) or explicit
keyframe roots.
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import List

import numpy as np


def build_datasets(args) -> List:
    size = tuple(args.size)
    if args.dataset == "synthetic":
        from featurematching_tpu.data.synthetic import synthetic_batch

        class _Synth:
            def __init__(self, n, seed):
                rng = np.random.default_rng(seed)
                W, H = size
                batch = synthetic_batch(
                    rng, batch_size=n, image_size=(H, W),
                    channels=1 if args.gray else 3, num_gt=args.num_gt,
                )
                self.samples = [
                    {k: v[i] for k, v in batch.items()} | {"pair_id": np.int32(i)}
                    for i in range(n)
                ]

            def __len__(self):
                return len(self.samples)

            def __getitem__(self, i):
                return self.samples[i]

        return [_Synth(args.synthetic_pairs, args.seed)]

    roots = list(args.roots)
    if args.dataset == "scared":
        from featurematching_tpu.data.scared import (
            ScaredPairDataset,
            discover_keyframe_roots,
        )

        if len(roots) == 1:
            found = discover_keyframe_roots(roots[0])
            if found:
                roots = found
        return [
            ScaredPairDataset(
                r, img_size=size, read_img_gray=args.gray, num_gt=args.num_gt,
                data_enhance=tuple(args.gaps), min_gt_matches=args.min_inliers,
            )
            for r in roots
        ]
    if args.dataset == "endoslam":
        from featurematching_tpu.data.endoslam import EndoSlamPairDataset

        return [
            EndoSlamPairDataset(
                r, img_size=size, read_img_gray=args.gray, num_gt=args.num_gt,
                data_enhance=tuple(args.gaps), min_gt_matches=args.min_inliers,
            )
            for r in roots
        ]
    from featurematching_tpu.data.unity import UnityPairDataset

    return [
        UnityPairDataset(
            r, img_size=size, read_img_gray=args.gray, num_gt=args.num_gt,
            data_enhance=tuple(args.gaps), min_gt_matches=args.min_inliers,
        )
        for r in roots
    ]


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dataset", choices=["scared", "endoslam", "unity", "synthetic"])
    p.add_argument("roots", nargs="*", default=[])
    p.add_argument("--workdir", default="runs/default")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--gray", action="store_true")
    p.add_argument("--size", type=int, nargs=2, default=(640, 480))
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--val-fraction", type=float, default=0.15)
    p.add_argument("--num-gt", type=int, default=512)
    p.add_argument("--min-inliers", type=int, default=250)
    p.add_argument("--gaps", type=int, nargs="+", default=[1])
    p.add_argument("--seed", type=int, default=114514)
    p.add_argument("--synthetic-pairs", type=int, default=64)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--warmup-steps", type=int, default=None)
    p.add_argument("--native-cache", default=None, metavar="PATH.fmtp",
                   help="use the native C++ mmap/threadpool loader through a "
                        "binary sample cache at PATH (built on first run; "
                        "3.2-7.6x the Python loader, benchmarks/loader_bench)")
    p.add_argument("--lr", type=float, default=None,
                   help="canonical LR override (scaled by batch/canonical_bs)")
    p.add_argument("--init-torch-npz", default=None,
                   help="warm-start from a reference-format torch state-dict "
                        "npz (e.g. ckpts/swin_warm_s7.npz from "
                        "benchmarks/swin_pretrain.py); arch/channels must "
                        "match — the warm init is grayscale, pass --gray")
    args = p.parse_args(argv)

    import jax

    import featurematching_tpu as fm
    from featurematching_tpu.data.loader import BatchLoader, ConcatDataset, make_loader, train_val_split
    from featurematching_tpu.train.runner import Runner

    datasets = build_datasets(args)
    if len(datasets) > 1:
        train_sets, val_sets = train_val_split(datasets, args.val_fraction, args.seed)
        train_ds = ConcatDataset(train_sets)
        val_ds = ConcatDataset(val_sets) if val_sets else None
    else:
        # single dataset: split at the pair level
        ds = datasets[0]
        n = len(ds)
        idx_train, idx_val = train_val_split(list(range(n)), args.val_fraction, args.seed)

        class _Subset:
            def __init__(self, base, idx):
                self.base, self.idx = base, list(idx)

            def __len__(self):
                return len(self.idx)

            def __getitem__(self, i):
                return self.base[self.idx[i]]

        train_ds = _Subset(ds, idx_train)
        val_ds = _Subset(ds, idx_val) if idx_val else None

    cfg = fm.default_config()
    W, H = args.size
    model_over = dict(input_channels=1 if args.gray else 3)
    if jax.default_backend() == "cpu":
        model_over["compute_dtype"] = "float32"
    steps = args.steps_per_epoch or max(1, len(train_ds) // args.batch)
    opt = cfg.trainer.optimizer
    opt_over = {}
    if args.warmup_steps is not None:
        opt_over["warmup_steps"] = args.warmup_steps
    if args.lr is not None:
        opt_over["canonical_lr"] = args.lr
    if opt_over:
        opt = dataclasses.replace(opt, **opt_over)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, **model_over),
        trainer=dataclasses.replace(
            cfg.trainer,
            batch_size=args.batch,
            steps_per_epoch=steps,
            num_epochs=args.epochs or cfg.trainer.num_epochs,
            seed=args.seed,
            optimizer=opt,
        ),
    )

    if args.native_cache:
        # live-input production path: one-time cache build, then the C++
        # loader feeds Runner.fit without the GIL (auto-falls back to the
        # Python loader when the toolchain is unavailable)
        tl = make_loader(train_ds, args.batch, cache_path=args.native_cache,
                         build_cache=True, seed=args.seed)
        vl = make_loader(
            val_ds, args.batch,
            cache_path=args.native_cache.replace(".fmtp", "") + "_val.fmtp",
            build_cache=True, shuffle=False, drop_last=False,
        ) if val_ds else None
    else:
        tl = BatchLoader(train_ds, args.batch, seed=args.seed)
        vl = BatchLoader(val_ds, args.batch, shuffle=False, drop_last=False) if val_ds else None
    runner = Runner(cfg, tl, vl, workdir=args.workdir, resume=not args.no_resume,
                    init_torch_npz=args.init_torch_npz)
    results = runner.fit(args.epochs)
    print("final:", results)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
