"""Offline cache-building CLI: SIFT keypoints + pseudo-GT matches + native
binary training caches.

Replaces /root/reference/datasets/create_matches.py:338-431 (create_kps /
create_endokps / create_unitykps) and moves the reference's per-__getitem__
GPU RANSAC fully offline. Usage:

    # per-frame SIFT caches for a SCARED keyframe root
    python -m featurematching_tpu.apps.build_cache sift ROOT --layout scared

    # pseudo-GT match caches for the pair list
    python -m featurematching_tpu.apps.build_cache matches ROOT \
        --layout scared --gaps 1 2

    # flat native training cache for the C++ loader
    python -m featurematching_tpu.apps.build_cache native ROOT out.fmtp \
        --layout scared
"""

from __future__ import annotations

import argparse
import os
from typing import List, Tuple

from featurematching_tpu.data.pairs import enumerate_pairs
from featurematching_tpu.data.pseudo_gt import build_match_cache, extract_sift_cache

_LAYOUTS = {
    "scared": ("raw_images/Left", "keypoints", "matches"),
    "endoslam": ("Frames", "keypoints", "matches"),
    "unity": ("Frames", "keypoints", "matches"),
}


def _frames(root: str, layout: str) -> Tuple[List[str], List[str]]:
    img_dir, _, _ = _LAYOUTS[layout]
    d = os.path.join(root, img_dir)
    names = sorted(
        f for f in os.listdir(d) if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    return [os.path.join(d, f) for f in names], [os.path.splitext(f)[0] for f in names]


def cmd_sift(args) -> int:
    paths, _ = _frames(args.root, args.layout)
    out = os.path.join(args.root, _LAYOUTS[args.layout][1])
    extract_sift_cache(
        paths, out, max_keypoints=args.max_keypoints,
        resize=tuple(args.size) if args.size else None,
    )
    print(f"wrote {len(paths)} SIFT caches to {out}")
    return 0


def cmd_matches(args) -> int:
    paths, stems = _frames(args.root, args.layout)
    pairs = enumerate_pairs(len(stems), tuple(args.gaps))
    pair_stems = [(stems[p.idx0], stems[p.idx1]) for p in pairs]
    sift_dir = os.path.join(args.root, _LAYOUTS[args.layout][1])
    out = os.path.join(args.root, _LAYOUTS[args.layout][2])
    deep_fn = None
    image_paths = None
    if args.source == "union":
        # frozen-teacher deep matches unioned with SIFT before RANSAC — the
        # reference's Unity mixed-keypoint recipe (unity_data.py:215-235) with
        # the coarse-only teacher of lightning_new.py:200-211 as the deep source
        from featurematching_tpu.data.teacher import deep_match_paths, make_teacher_fn

        deep_fn = deep_match_paths(
            make_teacher_fn(ckpt=args.teacher_ckpt or None, thr=args.teacher_thr)
        )
        image_paths = dict(zip(stems, paths))
    counts = build_match_cache(
        sift_dir, pair_stems, out, args.ransac_thresh,
        deep_fn=deep_fn, image_paths=image_paths,
        extra_gate=(args.extra_gate if args.extra_gate > 0 else None),
    )
    kept = sum(1 for c in counts.values() if c >= args.min_inliers)
    print(
        f"wrote {len(counts)} match caches to {out}; "
        f"{kept} have >= {args.min_inliers} inliers"
    )
    return 0


def cmd_native(args) -> int:
    from featurematching_tpu.data.native_cache import write_cache

    if args.layout == "scared":
        from featurematching_tpu.data.scared import ScaredPairDataset

        ds = ScaredPairDataset(
            args.root, data_enhance=tuple(args.gaps),
            img_size=tuple(args.size or (640, 480)), num_gt=args.num_gt,
            min_gt_matches=args.min_inliers,
        )
    elif args.layout == "endoslam":
        from featurematching_tpu.data.endoslam import EndoSlamPairDataset

        ds = EndoSlamPairDataset(
            args.root, data_enhance=tuple(args.gaps),
            img_size=tuple(args.size or (640, 480)), num_gt=args.num_gt,
            min_gt_matches=args.min_inliers,
        )
    else:
        from featurematching_tpu.data.unity import UnityPairDataset

        ds = UnityPairDataset(
            args.root, data_enhance=tuple(args.gaps),
            img_size=tuple(args.size or (640, 480)), num_gt=args.num_gt,
            min_gt_matches=args.min_inliers,
        )
    if len(ds) == 0:
        raise SystemExit(
            "no pairs passed the min-inlier filter; lower --min-inliers or "
            "rebuild the match caches"
        )
    write_cache(args.out, ds)
    print(f"wrote native cache {args.out} with {len(ds)} samples")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("root")
        sp.add_argument("--layout", choices=list(_LAYOUTS), default="scared")
        sp.add_argument("--gaps", type=int, nargs="+", default=[1])
        sp.add_argument("--size", type=int, nargs=2, default=None)

    sp = sub.add_parser("sift")
    common(sp)
    sp.add_argument("--max-keypoints", type=int, default=2048)
    sp.set_defaults(fn=cmd_sift)

    sp = sub.add_parser("matches")
    common(sp)
    sp.add_argument("--ransac-thresh", type=float, default=5.0)
    sp.add_argument("--min-inliers", type=int, default=250)
    sp.add_argument(
        "--source", choices=("sift", "union"), default="sift",
        help="'union' adds frozen-teacher deep matches before RANSAC "
        "(reference unity_data.py:215-235 mixed-keypoint recipe)",
    )
    sp.add_argument("--teacher-ckpt", default="",
                    help="official-LoFTR .ckpt for the frozen teacher "
                    "(lightning_new.py:200-211); random init if omitted")
    sp.add_argument("--teacher-thr", type=float, default=None,
                    help="override the teacher's coarse confidence threshold")
    sp.add_argument("--extra-gate", type=float, default=1.5,
                    help="SIFT-model consistency gate (px) on teacher matches "
                         "before the union; <=0 disables")
    sp.set_defaults(fn=cmd_matches)

    sp = sub.add_parser("native")
    common(sp)
    sp.add_argument("out")
    sp.add_argument("--num-gt", type=int, default=512)
    sp.add_argument("--min-inliers", type=int, default=0)
    sp.set_defaults(fn=cmd_native)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
