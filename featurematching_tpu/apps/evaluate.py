"""Dataset evaluation CLI: matching + pose metrics over a pair dataset.

The standalone eval harness the reference kept half-外部 (network/
pose_estimate/test.py ran a ckpt over a dataset; the AUC machinery lived in
the Lightning val loop). Usage:

    python -m featurematching_tpu.apps.evaluate scared ROOT [--ckpt DIR]
        [--batch 4] [--limit N] [--gray] [--out metrics.json]

Datasets: scared | endoslam | unity | synthetic (no data needed).
Prints the aggregate metric dict (pose AUC@5/10/20, precision@5e-4) as JSON.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from typing import Optional

import numpy as np


def evaluate_dataset(
    dataset,
    ckpt: Optional[str] = None,
    batch_size: int = 4,
    limit: Optional[int] = None,
    gray: bool = False,
    image_size=(640, 480),
    thr: float = 0.2,
    num_hypotheses: int = 512,
    model_shard: int = 1,
):
    """model_shard > 1: run the coarse correlation sequence-parallel over a
    ('data', 'model') mesh (n_model=model_shard) — the high-resolution serving
    mode where the [L, S] correlation volume is S-sharded across chips
    (config.highres_eval_config, ops/sharded_matching.py). Requires
    jax.device_count() >= model_shard."""
    import jax
    import jax.numpy as jnp

    import featurematching_tpu as fm
    from featurematching_tpu.data.loader import BatchLoader
    from featurematching_tpu.models import Matcher
    from featurematching_tpu.train.optimizer import build_optimizer
    from featurematching_tpu.utils.metrics import (
        aggregate_metrics,
        compute_pose_errors,
        compute_symmetrical_epipolar_errors,
    )

    cfg = fm.default_config()
    mcfg = dataclasses.replace(
        cfg.model,
        input_channels=1 if gray else 3,
        match_coarse=dataclasses.replace(cfg.model.match_coarse, thr=thr),
    )
    if jax.default_backend() == "cpu":
        mcfg = dataclasses.replace(mcfg, compute_dtype="float32")
    model = Matcher(mcfg)

    W, H = image_size
    dummy = jnp.zeros((batch_size, H, W, 1 if gray else 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), dummy, dummy)
    if ckpt:
        from featurematching_tpu.utils.checkpoints import load_matcher_variables

        variables = load_matcher_variables(ckpt)

    mesh = None
    if model_shard > 1:
        from featurematching_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(
            n_data=max(1, jax.device_count() // model_shard),
            n_model=model_shard,
        )
        fwd = jax.jit(lambda v, a, b: model.apply(v, a, b, shard_mesh=mesh))
    elif mcfg.backbone_type == "swin_v1" and jax.default_backend() != "cpu":
        from featurematching_tpu.models.fast_inference import make_fast_matcher_fn

        fast = make_fast_matcher_fn(mcfg)
        fwd = jax.jit(lambda v, a, b: fast(v, a, b))
    else:
        fwd = jax.jit(lambda v, a, b: model.apply(v, a, b))

    loader = BatchLoader(
        dataset, batch_size, shuffle=False, drop_last=False,
        process_index=0, process_count=1,
    )
    agg = {"identifiers": [], "R_errs": [], "t_errs": [], "epi_errs": []}
    key = jax.random.PRNGKey(0)
    n_done = 0
    for batch in loader.epoch(0):
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        out = fwd(variables, jb["image0"], jb["image1"])
        epi = compute_symmetrical_epipolar_errors(
            out.fine.mkpts0_f, out.fine.mkpts1_f, out.coarse.mask,
            jb["T_0to1"], jb["K0"], jb["K1"],
        )
        key, k2 = jax.random.split(key)
        pose = compute_pose_errors(
            out.fine.mkpts0_f, out.fine.mkpts1_f, out.coarse.mask,
            jb["T_0to1"], jb["K0"], jb["K1"], k2,
            num_hypotheses=num_hypotheses,
        )
        epi_np = np.asarray(epi)
        mask_np = np.asarray(out.coarse.mask)
        for b in range(epi_np.shape[0]):
            agg["identifiers"].append(int(batch["pair_id"][b]))
            agg["epi_errs"].append(epi_np[b][mask_np[b]])
        agg["R_errs"].extend(np.asarray(pose["R_errs"]).tolist())
        agg["t_errs"].extend(np.asarray(pose["t_errs"]).tolist())
        n_done += epi_np.shape[0]
        if limit and n_done >= limit:
            break

    return aggregate_metrics(agg)


def build_dataset(kind: str, root: Optional[str], args) -> object:
    size = tuple(args.size)
    if kind == "scared":
        from featurematching_tpu.data.scared import ScaredPairDataset

        return ScaredPairDataset(root, img_size=size, read_img_gray=args.gray)
    if kind == "endoslam":
        from featurematching_tpu.data.endoslam import EndoSlamPairDataset

        return EndoSlamPairDataset(root, img_size=size, read_img_gray=args.gray)
    if kind == "unity":
        from featurematching_tpu.data.unity import UnityPairDataset

        return UnityPairDataset(root, img_size=size, read_img_gray=args.gray)
    if kind == "synthetic":
        from featurematching_tpu.data.synthetic import synthetic_batch

        class _Synth:
            def __init__(self, n, W, H, gray):
                rng = np.random.default_rng(0)
                batch = synthetic_batch(
                    rng, batch_size=n, image_size=(H, W),
                    channels=1 if gray else 3,
                )
                self.samples = [
                    {k: v[i] for k, v in batch.items()}
                    | {"pair_id": np.int32(i)}
                    for i in range(n)
                ]

            def __len__(self):
                return len(self.samples)

            def __getitem__(self, i):
                return self.samples[i]

        return _Synth(args.limit or 8, size[0], size[1], args.gray)
    raise ValueError(kind)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dataset", choices=["scared", "endoslam", "unity", "synthetic"])
    p.add_argument("root", nargs="?", default=None)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--gray", action="store_true")
    p.add_argument("--size", type=int, nargs=2, default=(640, 480))
    p.add_argument("--thr", type=float, default=0.2)
    p.add_argument("--model-shard", type=int, default=1,
                   help="shard the coarse correlation over N mesh 'model' "
                        "devices (high-res serving; see highres_eval_config)")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    ds = build_dataset(args.dataset, args.root, args)
    results = evaluate_dataset(
        ds, ckpt=args.ckpt, batch_size=args.batch, limit=args.limit,
        gray=args.gray, image_size=tuple(args.size), thr=args.thr,
        model_shard=args.model_shard,
    )
    text = json.dumps(results, indent=2)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
