"""SCARED toolkit CLI — offline dataset generation/eval scripts.

Covers the capability of /root/reference/datasets/scared_toolkits/scripts/
(evaluate.py, flow generation, disparity<->depth conversion, keyframe GT
extraction) as subcommands over directories of files.

    python -m featurematching_tpu.apps.scared_toolkit_cli evaluate REF_DIR COMP_DIR \
        [--kind depth|disparity] [--bad-thr 3.0]
    python -m featurematching_tpu.apps.scared_toolkit_cli disparity-to-depth \
        DISP_DIR OUT_DIR --calib calib.yaml
    python -m featurematching_tpu.apps.scared_toolkit_cli depth-to-disparity \
        DEPTH_DIR OUT_DIR --calib calib.yaml
    python -m featurematching_tpu.apps.scared_toolkit_cli flow \
        PLY_OR_OBJ POSES_DIR OUT_DIR --calib calib.yaml --size 1024 1280
    python -m featurematching_tpu.apps.scared_toolkit_cli undistort \
        IMG_DIR OUT_DIR --calib calib.yaml [--stereo-stacked]
"""

from __future__ import annotations

import argparse
import json
import os
from typing import List

import numpy as np

from featurematching_tpu.toolkit import conversions as cv_
from featurematching_tpu.toolkit import evaluation as ev
from featurematching_tpu.toolkit import io as tio
from featurematching_tpu.toolkit.calibration import Calibrator, undistort


def _list(dirpath: str, exts) -> List[str]:
    return sorted(
        os.path.join(dirpath, f)
        for f in os.listdir(dirpath)
        if f.lower().endswith(exts)
    )


def _load_calib(path: str):
    c = Calibrator((0, 0), 0.0)
    return c.load(path)


def _load_map(path: str) -> np.ndarray:
    if path.endswith((".tiff", ".tif")):
        return np.asarray(tio.read_flow_tiff(path), np.float64)
    return tio.load_subpix_png(path)


def cmd_evaluate(args) -> int:
    refs = _list(args.ref_dir, (".png", ".tiff", ".tif"))
    comps = _list(args.comp_dir, (".png", ".tiff", ".tif"))
    assert len(refs) == len(comps), (len(refs), len(comps))
    maes, bads, skipped = [], [], 0
    for r, c in zip(refs, comps):
        ref = _load_map(r)
        comp = _load_map(c)
        if args.kind == "depth":
            err = ev.depthmap_error(ref, comp)
            if err is None:
                skipped += 1
                continue
            maes.append(err)
        else:
            mae, bad = ev.disparity_error(ref, comp, args.bad_thr)
            if mae is None:
                skipped += 1
                continue
            maes.append(mae)
            bads.append(bad)
    out = {
        "n": len(maes),
        "skipped_low_coverage": skipped,
        "mae": float(np.mean(maes)) if maes else None,
    }
    if bads:
        out[f"bad{args.bad_thr:g}_pct"] = float(np.mean(bads))
    print(json.dumps(out, indent=2))
    return 0


def cmd_disp_to_depth(args) -> int:
    calib = _load_calib(args.calib)
    os.makedirs(args.out_dir, exist_ok=True)
    for p in _list(args.in_dir, (".png", ".tiff", ".tif")):
        disp = np.nan_to_num(_load_map(p)).astype(np.float32)
        depth = cv_.disparity_to_depthmap(disp, calib["Q"])
        tio.save_subpix_png(
            os.path.join(args.out_dir, os.path.basename(p)), np.abs(depth)
        )
    print(f"converted {args.in_dir} -> {args.out_dir}")
    return 0


def cmd_depth_to_disp(args) -> int:
    calib = _load_calib(args.calib)
    os.makedirs(args.out_dir, exist_ok=True)
    for p in _list(args.in_dir, (".png", ".tiff", ".tif")):
        depth = _load_map(p)
        disp = cv_.depthmap_to_disparity(np.nan_to_num(depth), calib["Q"])
        tio.save_subpix_png(
            os.path.join(args.out_dir, os.path.basename(p)), np.abs(disp)
        )
    print(f"converted {args.in_dir} -> {args.out_dir}")
    return 0


def cmd_flow(args) -> int:
    calib = _load_calib(args.calib)
    K = calib.get("K1", calib.get("K"))
    D = calib.get("D1", calib.get("D"))
    if args.cloud.endswith(".ply"):
        cloud = tio.load_ply_as_ptcloud(args.cloud)
    else:
        cloud = tio.load_scared_obj(args.cloud)
    poses = tio.load_pose_sequence(args.poses)
    os.makedirs(args.out_dir, exist_ok=True)
    keys = sorted(poses.keys())
    for a, b in zip(keys[:-1], keys[1:]):
        flow = cv_.ptcloud_to_flow(
            cloud, np.linalg.inv(poses[a]), np.linalg.inv(poses[b]),
            tuple(args.size), K, D,
        )
        tio.save_flow_kitti(
            os.path.join(args.out_dir, f"flow_{a:06d}.png"), flow
        )
    print(f"wrote {len(keys) - 1} flow maps to {args.out_dir}")
    return 0


def cmd_undistort(args) -> int:
    import cv2

    calib = _load_calib(args.calib)
    os.makedirs(args.out_dir, exist_ok=True)
    for p in _list(args.in_dir, (".png", ".jpg", ".jpeg")):
        img = cv2.imread(p, -1)
        if args.stereo_stacked:
            from featurematching_tpu.toolkit.calibration import (
                split_and_undistort_stereo,
            )

            left, right = split_and_undistort_stereo(img, calib, tuple(args.size))
            base = os.path.splitext(os.path.basename(p))[0]
            cv2.imwrite(os.path.join(args.out_dir, base + "_L.png"), left)
            cv2.imwrite(os.path.join(args.out_dir, base + "_R.png"), right)
        else:
            K = calib.get("K1", calib.get("K"))
            D = calib.get("D1", calib.get("D"))
            out, _ = undistort(img, K, D)
            out = cv2.resize(out, tuple(args.size))
            cv2.imwrite(os.path.join(args.out_dir, os.path.basename(p)), out)
    print(f"undistorted {args.in_dir} -> {args.out_dir}")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("evaluate")
    sp.add_argument("ref_dir")
    sp.add_argument("comp_dir")
    sp.add_argument("--kind", choices=["depth", "disparity"], default="disparity")
    sp.add_argument("--bad-thr", type=float, default=3.0)
    sp.set_defaults(fn=cmd_evaluate)

    sp = sub.add_parser("disparity-to-depth")
    sp.add_argument("in_dir")
    sp.add_argument("out_dir")
    sp.add_argument("--calib", required=True)
    sp.set_defaults(fn=cmd_disp_to_depth)

    sp = sub.add_parser("depth-to-disparity")
    sp.add_argument("in_dir")
    sp.add_argument("out_dir")
    sp.add_argument("--calib", required=True)
    sp.set_defaults(fn=cmd_depth_to_disp)

    sp = sub.add_parser("flow")
    sp.add_argument("cloud")
    sp.add_argument("poses")
    sp.add_argument("out_dir")
    sp.add_argument("--calib", required=True)
    sp.add_argument("--size", type=int, nargs=2, default=(1024, 1280))
    sp.set_defaults(fn=cmd_flow)

    sp = sub.add_parser("undistort")
    sp.add_argument("in_dir")
    sp.add_argument("out_dir")
    sp.add_argument("--calib", required=True)
    sp.add_argument("--size", type=int, nargs=2, default=(640, 480))
    sp.add_argument("--stereo-stacked", action="store_true")
    sp.set_defaults(fn=cmd_undistort)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
