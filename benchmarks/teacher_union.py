"""Union pseudo-GT with a REAL trained teacher (VERDICT round 3, missing #1).

The reference unions SIFT with matches from a pretrained DISK model when
building Unity pseudo-GT (/root/reference/datasets/unity_data.py:215-235).
Round 3 shipped the machinery (data/teacher.py + build_cache --source union)
but only ever exercised it with a RANDOM-weight teacher forced open by a thr
override. This benchmark closes the evidence gap:

  1. trains the tiny matcher on a two-plane synthetic fixture (the round-3
     tiny-protocol recipe that measurably converges),
  2. saves it as a NATIVE teacher checkpoint (data/teacher.save_teacher_ckpt,
     .npz with the ModelConfig embedded),
  3. rebuilds match caches for HELD-OUT pairs with --source sift vs the
     trained-teacher union at the DEFAULT confidence threshold (no override),
  4. reports per-pair post-RANSAC match counts and epipolar precision of the
     cached matches against the fixture's ground-truth essential matrix.

    python benchmarks/teacher_union.py [--epochs 40] [--platform device]
        [--out benchmarks/teacher_union.json] [--ckpt /tmp/teacher_tiny.npz]
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

import cv2  # noqa: E402

from trained_parity import (  # noqa: E402
    ARCHS,
    make_fixture,
    our_batch,
    our_config,
    symmetric_epipolar_distance,
)


def _essential(T_0to1):
    R, t = T_0to1[:3, :3], T_0to1[:3, 3]
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    return tx @ R


def train_teacher(pairs, n_train, epochs, lr, seed, platform, ckpt_path):
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    else:
        cache_dir = os.path.expanduser("~/.cache/fmtpu_jax")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import optax

    from featurematching_tpu.data.teacher import save_teacher_ckpt
    from featurematching_tpu.models.matcher import Matcher
    from featurematching_tpu.train.step import (
        TrainState,
        make_opt_state,
        make_train_step,
    )

    dtype = "float32" if platform == "cpu" else "bfloat16"
    cfg = our_config(ARCHS["tiny"], dtype=dtype, fused="auto")
    model = Matcher(cfg.model)
    sample = our_batch(pairs[0])
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(seed),
        jnp.asarray(sample["image0"]),
        jnp.asarray(sample["image1"]),
    )
    params, stats = variables["params"], variables.get("batch_stats", {})
    # round-3 tiny-protocol recipe knobs (clip stabilizes the known spikes)
    tx = optax.chain(optax.clip_by_global_norm(0.5), optax.adam(lr))
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, batch_stats=stats,
        opt_state=make_opt_state(tx, params), tx=tx,
    )
    step_fn = jax.jit(make_train_step(model, cfg))
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    t0 = time.time()
    for ep in range(epochs):
        order = rng.permutation(n_train)
        for i in order:
            b = {k: jnp.asarray(v) for k, v in our_batch(pairs[i]).items()}
            key, sub = jax.random.split(key)
            state, metrics = step_fn(state, b, sub)
        if (ep + 1) % 10 == 0:
            print(f"[teacher] epoch {ep+1}/{epochs} loss="
                  f"{float(metrics['loss']):.4f} ({time.time()-t0:.0f}s)",
                  flush=True)
    params_np = jax.tree.map(lambda a: np.asarray(a, np.float32), state.params)
    stats_np = jax.tree.map(np.asarray, state.batch_stats)
    save_teacher_ckpt(ckpt_path, cfg.model, params_np, stats_np)
    return ckpt_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-pairs", type=int, default=48)
    ap.add_argument("--val-pairs", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--lr", type=float, default=6e-4)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--platform", choices=("cpu", "device"), default="device")
    ap.add_argument("--ckpt", default="/tmp/teacher_tiny.npz")
    ap.add_argument("--use-ckpt", action="store_true",
                    help="skip teacher training; --ckpt is an existing "
                         "native teacher checkpoint (e.g. the 50k flagship "
                         "converted via --convert-flagship)")
    ap.add_argument("--convert-flagship", default="",
                    help="reference-format state-dict npz (swin_pretrain "
                         "--out-sd) to convert + save as the native teacher "
                         "ckpt at --ckpt before evaluating")
    ap.add_argument("--out", default="benchmarks/teacher_union.json")
    ap.add_argument("--workdir", default="/tmp/teacher_union_eval")
    args = ap.parse_args()

    pairs = make_fixture(
        args.seed, args.train_pairs, args.val_pairs, scene="two_plane"
    )
    if args.convert_flagship:
        import jax

        jax.config.update("jax_platforms", "cpu")
        from featurematching_tpu.data.teacher import save_teacher_ckpt
        from featurematching_tpu.utils.torch_convert import convert_matcher

        sd = dict(np.load(args.convert_flagship))
        params, stats = convert_matcher(sd, coarse_layers=8, fine_layers=2)
        cfg = our_config(ARCHS["flagship"], dtype="float32", fused="auto")
        save_teacher_ckpt(args.ckpt, cfg.model, params, stats)
        print(f"[teacher_union] converted {args.convert_flagship} -> {args.ckpt}")
    elif not args.use_ckpt:
        train_teacher(
            pairs, args.train_pairs, args.epochs, args.lr, args.seed,
            args.platform, args.ckpt,
        )

    from featurematching_tpu.data.pseudo_gt import (
        build_match_cache,
        extract_sift_cache,
        load_match_cache,
    )
    from featurematching_tpu.data.teacher import deep_match_paths, make_teacher_fn

    os.makedirs(args.workdir, exist_ok=True)
    frames = os.path.join(args.workdir, "Frames")
    os.makedirs(frames, exist_ok=True)
    val = pairs[args.train_pairs:]
    paths = {}
    pair_names = []
    for i, p in enumerate(val):
        for side, img in (("a", p["img0"]), ("b", p["img1"])):
            name = f"v{i:03d}{side}"
            cv2.imwrite(
                os.path.join(frames, name + ".png"),
                (np.clip(img, 0, 1) * 255).astype(np.uint8),
            )
            paths[name] = os.path.join(frames, name + ".png")
        pair_names.append((f"v{i:03d}a", f"v{i:03d}b"))

    kp_dir = os.path.join(args.workdir, "keypoints")
    extract_sift_cache(list(paths.values()), kp_dir, max_keypoints=1024)

    # teacher at its DEFAULT threshold — the point of a trained teacher
    teacher = make_teacher_fn(ckpt=args.ckpt)
    results = {"pairs": []}
    sift_counts = build_match_cache(
        kp_dir, pair_names, os.path.join(args.workdir, "m_sift"),
    )
    union_counts = build_match_cache(
        kp_dir, pair_names, os.path.join(args.workdir, "m_union"),
        deep_fn=deep_match_paths(teacher), image_paths=paths,
    )

    def precision(cache_dir, name, pair, thr=5e-4):
        kp0, kp1 = load_match_cache(os.path.join(cache_dir, name))
        if len(kp0) == 0:
            return 0.0, 0
        d = symmetric_epipolar_distance(
            kp0, kp1, _essential(pair["T_0to1"]), pair["K"], pair["K"]
        )
        return float(np.mean(d < thr)), len(kp0)

    tot = {"sift": 0, "union": 0}
    prec = {"sift": [], "union": []}
    for i, (a, b) in enumerate(pair_names):
        name = f"{a}__{b}.npz"
        ps, ns = precision(os.path.join(args.workdir, "m_sift"), name, val[i])
        pu, nu = precision(os.path.join(args.workdir, "m_union"), name, val[i])
        tot["sift"] += ns
        tot["union"] += nu
        prec["sift"].append(ps)
        prec["union"].append(pu)
        results["pairs"].append(
            dict(pair=name, sift_n=ns, union_n=nu,
                 sift_prec=round(ps, 4), union_prec=round(pu, 4))
        )
    results["total_matches"] = tot
    results["mean_precision"] = {
        k: round(float(np.mean(v)), 4) for k, v in prec.items()
    }
    results["args"] = vars(args)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: results[k] for k in
                      ("total_matches", "mean_precision")}))
    ok = tot["union"] > tot["sift"]
    print(f"[teacher_union] union beats sift on held-out match count: {ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
