"""SCARED toolkit CLI — offline dataset generation/eval scripts.

Covers the FULL script surface of /root/reference/datasets/scared_toolkits/
scripts/ as subcommands over directories of files:

    evaluate REF_DIR COMP_DIR [--kind depth|disparity] [--bad-thr 3.0]
    disparity-to-depth DISP_DIR OUT_DIR --calib calib.yaml
    depth-to-disparity DEPTH_DIR OUT_DIR --calib calib.yaml
    flow PLY_OR_OBJ POSES_DIR OUT_DIR --calib calib.yaml --size 1024 1280
    undistort IMG_DIR OUT_DIR --calib calib.yaml [--stereo-stacked]
    generate-keyframe-dataset ROOT [-r] [--depth] [--undistort] [--disparity]
        (generate_keyframe_dataset.py: keyframe GT products from obj/ply/tiff)
    generate-sequence-dataset ROOT [-r] [--depth] [--undistort] [--disparity]
        (generate_sequence_dataset.py: per-frame products from keyframe cloud
         + frame_data.tar.gz kinematics + rgb.mp4)
    extract-sequence-dataset ROOT [-r] [--depth] [--undistort] [--disparity]
        (extract_sequence_dataset.py: per-frame products from the provided
         scene_points.tar.gz GT + rgb.mp4, plus coverage-gated valid.csv)
    aggregate-keyframes SRC DST [--overwrite]
        (aggregate_keyframes.py: regroup keyframe files by product name)
    disparity-to-original-depthmap DISP_DIR OUT_DIR CALIB
        (disparity_to_original_depthmap.py: rectified disparity -> depthmap in
         the original distorted frame of reference)
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from featurematching_tpu.toolkit import conversions as cv_
from featurematching_tpu.toolkit import evaluation as ev
from featurematching_tpu.toolkit import io as tio
from featurematching_tpu.toolkit.calibration import (
    Calibrator,
    StereoCalibrator,
    undistort,
)


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


# ---------------------------------------------------------------------------
# dataset generation (generate_keyframe_dataset.py and siblings)
# ---------------------------------------------------------------------------

def _keyframe_dirs(root: str, recursive: bool) -> List[Path]:
    rootp = Path(root)
    if recursive:
        return sorted(p for p in rootp.rglob("keyframe*") if p.is_dir())
    return [rootp]


def _load_stereo_calib(path) -> Tuple[StereoCalibrator, Dict[str, np.ndarray]]:
    sc = StereoCalibrator((0, 0), 0.0)
    sc.load(path)
    # return the live dict: rectify()/compute_rectification() add R1/R2/P1/P2/Q
    return sc, sc.calib


def _load_keyframe_cloud(kf: Path, ptcloud_name: Optional[str], calib, size_hw):
    """(gt_ptcloud, gt_img3d|None) per generate_keyframe_dataset.py:44-62:
    a user ply is re-projected to a 3D image; the provided obj keeps the
    shipped left_depth_map.tiff for pixel coverage."""
    if ptcloud_name is not None:
        cloud = tio.load_ply_as_ptcloud(kf / ptcloud_name)
        img3d = cv_.ptcloud_to_img3d(cloud, calib["K1"], calib["D1"], size_hw)
        return cloud, img3d
    try:
        cloud = tio.load_scared_obj(kf / "point_cloud.obj")
    except FileNotFoundError:
        cloud = tio.load_scared_obj(kf / "left_point_cloud.obj")
    img3d = tio.load_img3d(kf / "left_depth_map.tiff")
    return cloud, img3d


def _emit_products(
    stereo: StereoCalibrator,
    calib: Dict[str, np.ndarray],
    left: np.ndarray,
    right: Optional[np.ndarray],
    ptcloud: np.ndarray,
    depthmap_direct: Optional[np.ndarray],
    args,
) -> Dict[str, Tuple[str, np.ndarray]]:
    """One frame's products keyed by reference product name.
    kinds: 'img' (cv2.imwrite) / 'subpix' (16-bit scaled png)."""
    out: Dict[str, Tuple[str, np.ndarray]] = {}
    size_hw = left.shape[:2]
    if args.depth:
        dm = (
            depthmap_direct
            if depthmap_direct is not None
            else cv_.ptcloud_to_depthmap(ptcloud, calib["K1"], np.zeros(5), size_hw)
        )
        out["left"] = ("img", left)
        out["depthmap"] = ("subpix", dm)
    if args.undistort:
        left_u, _ = undistort(left, calib["K1"], calib["D1"])
        dm_u = cv_.ptcloud_to_depthmap(ptcloud, calib["K1"], calib["D1"], size_hw)
        out["left_undistorted"] = ("img", left_u)
        out["depthmap_undistorted"] = ("subpix", dm_u)
    if args.disparity:
        assert right is not None, "--disparity needs the right view"
        lrect, rrect = stereo.rectify(left, right, args.alpha)
        rot = cv_.transform_pts(ptcloud, cv_.create_RT(R=calib["R1"]))
        disp = cv_.ptcloud_to_disparity(rot, calib["P1"], calib["P2"], size_hw)
        dm_r = cv_.ptcloud_to_depthmap(rot, calib["P1"][:, :3], np.zeros(5), size_hw)
        out["left_rectified"] = ("img", lrect)
        out["right_rectified"] = ("img", rrect)
        out["depthmap_rectified"] = ("subpix", dm_r)
        out["disparity"] = ("subpix", disp)
    return out


def _write_products(products, out_dir: Path, scale_factor: float, fid: Optional[int]):
    """fid=None -> flat keyframe filenames (Left_Image.png/depthmap.png …);
    fid=k -> per-product subdirectories of 000k.png frames."""
    import cv2

    flat_names = {"left": "Left_Image.png", "left_undistorted": "left_undistorted.png"}
    for name, (kind, arr) in products.items():
        if fid is None:
            fname = flat_names.get(name, f"{name}.png")
            path = out_dir / fname
        else:
            path = out_dir / name / f"{fid:06d}.png"
        path.parent.mkdir(parents=True, exist_ok=True)
        if kind == "img":
            cv2.imwrite(str(path), arr)
        else:
            tio.save_subpix_png(path, np.nan_to_num(arr), scale_factor)


def cmd_generate_keyframe_dataset(args) -> int:
    n = 0
    for kf in _keyframe_dirs(args.root_dir, args.recursive):
        out_dir = (
            Path(args.out_dir) / kf.parent.name / kf.name if args.out_dir else kf
        )
        out_dir.mkdir(parents=True, exist_ok=True)
        stereo, calib = _load_stereo_calib(kf / "endoscope_calibration.yaml")
        import cv2

        left = cv2.imread(str(kf / "Left_Image.png"))
        right = cv2.imread(str(kf / "Right_Image.png"))
        size_hw = left.shape[:2] if left is not None else tuple(args.size)
        cloud, img3d = _load_keyframe_cloud(kf, args.ptcloud, calib, size_hw)
        dm = cv_.img3d_to_depthmap(img3d) if img3d is not None else None
        products = _emit_products(stereo, calib, left, right, cloud, dm, args)
        _write_products(products, out_dir, args.scale_factor, fid=None)
        if args.disparity:
            stereo.save(out_dir / "stereo_calib.json")
        n += 1
    print(f"processed {n} keyframe(s)")
    return 0


def cmd_generate_sequence_dataset(args) -> int:
    """Per-frame products from the keyframe cloud moved by the kinematics
    poses (generate_sequence_dataset.py: no per-frame GT tar needed)."""
    import cv2

    n = 0
    for kf in _keyframe_dirs(args.root_dir, args.recursive):
        out_dir = (
            Path(args.out_dir) / kf.parent.name / kf.name if args.out_dir else kf
        )
        out_dir.mkdir(parents=True, exist_ok=True)
        stereo, calib = _load_stereo_calib(kf / "endoscope_calibration.yaml")
        poses = tio.load_pose_sequence(kf / "data" / "frame_data.tar.gz")
        video = tio.StereoVideoCapture(kf / "data" / "rgb.mp4")
        if args.ptcloud is not None:
            cloud = tio.load_ply_as_ptcloud(kf / args.ptcloud)
        else:
            cloud = tio.load_scared_obj(kf / "point_cloud.obj")
        for fid in sorted(poses.keys()):
            ok, (left, right) = video.read()
            if not ok:
                break
            moved = cv_.transform_pts(cloud, poses[fid])
            products = _emit_products(stereo, calib, left, right, moved, None, args)
            _write_products(products, out_dir, args.scale_factor, fid=fid)
            n += 1
        video.release()
        if args.disparity:
            stereo.save(out_dir / "stereo_calib.json")
    print(f"processed {n} frame(s)")
    return 0


def cmd_extract_sequence_dataset(args) -> int:
    """Per-frame products from the PROVIDED scene_points GT tar
    (extract_sequence_dataset.py), plus the >=10%-coverage valid.csv gate."""
    import cv2

    total = 0
    for kf in _keyframe_dirs(args.root_dir, args.recursive):
        out_dir = (
            Path(args.out_dir) / kf.parent.name / kf.name if args.out_dir else kf
        )
        (out_dir / "data").mkdir(parents=True, exist_ok=True)
        stereo, calib = _load_stereo_calib(kf / "endoscope_calibration.yaml")

        video = None
        if (kf / "data" / "rgb.mp4").is_file():
            video = tio.StereoVideoCapture(kf / "data" / "rgb.mp4")
            gt_seq = tio.Img3dTarLoader(kf / "data" / "scene_points.tar.gz")
            frame_count = len(gt_seq)
        else:  # keyframe 5 is a single frame (extract_sequence_dataset.py:66)
            gt_seq = None
            frame_count = 1

        valid = []
        for fid in range(frame_count):
            if video is not None:
                ok, (left, right) = video.read()
                assert ok, f"video ended early at frame {fid}"
                img3d = gt_seq[fid][: left.shape[0]]
            else:
                left = cv2.imread(str(kf / "Left_Image.png"))
                right = cv2.imread(str(kf / "Right_Image.png"))
                img3d = tio.load_img3d(kf / "left_depth_map.tiff")
            cloud = cv_.img3d_to_ptcloud(img3d)
            dm = cv_.img3d_to_depthmap(img3d)
            products = _emit_products(stereo, calib, left, right, cloud, dm, args)
            _write_products(products, out_dir / "data", args.scale_factor, fid=fid)
            # coverage: fraction of non-NaN GT pixels (reference uses y channel)
            coverage = 1.0 - np.count_nonzero(np.isnan(img3d[..., -2])) / (
                img3d.shape[0] * img3d.shape[1]
            )
            if coverage >= 0.1:
                valid.append(fid)
            total += 1
        if video is not None:
            video.release()
            gt_seq.close()
        stereo.save(out_dir / "stereo_calib.json")
        np.savetxt(out_dir / "valid.csv", valid, fmt="%i", delimiter=",")
    print(f"extracted {total} frame(s)")
    return 0


def cmd_aggregate_keyframes(args) -> int:
    """Regroup dataset_D/keyframe_K/<product>.ext as <product>/D_K.ext
    (aggregate_keyframes.py)."""
    import shutil

    src = Path(args.src_dataset)
    dst = Path(args.dst_dataset)
    kf_dirs = sorted(p for p in src.rglob("keyframe_[0-5]") if p.is_dir())
    if not kf_dirs:
        print("no keyframe folders found under src_dataset")
        return 1
    for kf in kf_dirs:
        for fp in sorted(p for p in kf.iterdir() if p.is_file()):
            d = dst / fp.stem
            d.mkdir(parents=True, exist_ok=True)
            target = d / f"{kf.parent.name[-1]}_{kf.name[-1]}{fp.suffix}"
            if target.exists() and not args.overwrite:
                print(f"{target} exists; rerun with --overwrite")
                return 1
            shutil.copy(fp, target)
    print(f"aggregated {len(kf_dirs)} keyframe(s) into {dst}")
    return 0


def _distort_maps(src_k, dst_k, dst_d, h, w):
    """Inverse-undistortion remap tables: for each ORIGINAL-frame pixel, where
    to sample in the rectified projection (disparity_to_original_depthmap.py:
    15-25)."""
    import cv2

    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    pts = np.stack([xx.reshape(-1), yy.reshape(-1)], -1).astype(np.float32)
    maps = np.squeeze(cv2.undistortPoints(pts[:, None], dst_k, dst_d)).reshape(h, w, 2)
    return (
        (src_k[0, 0] * maps[..., 0] + src_k[0, 2]).astype(np.float32),
        (src_k[1, 1] * maps[..., 1] + src_k[1, 2]).astype(np.float32),
    )


def _interp_nan(img: np.ndarray) -> np.ndarray:
    """1-D linear infill of NaN pixels over the flattened image
    (disparity_to_original_depthmap.py:28-40)."""
    h, w = img.shape[:2]
    flat = img.reshape(-1).copy()
    bad = np.isnan(flat)
    if bad.all():
        return img
    if bad.any():
        ok_idx = (~bad).nonzero()[0]
        flat[bad] = np.interp(bad.nonzero()[0], ok_idx, flat[ok_idx])
    return flat.reshape(h, w)


def _disp_to_original_depth_one(
    disp_path, out_path, map_x, map_y, calib, scale_factor
):
    import cv2

    disp = tio.load_subpix_png(disp_path, scale_factor)
    cloud = cv_.disparity_to_ptcloud(np.nan_to_num(disp), calib["Q"])
    cloud = cv_.transform_pts(cloud, cv_.create_RT(R=np.linalg.inv(calib["R1"])))
    img3d = cv_.ptcloud_to_img3d(
        cloud, calib["P1"][:3, :3], np.zeros_like(calib["D1"]), disp.shape[:2]
    )
    z = img3d[..., -1].astype(np.float32)
    z[z == 0] = np.nan  # scatter holes (conversions fill 0) -> NaN for infill
    depth = cv2.remap(z, map_x, map_y, cv2.INTER_NEAREST)
    depth = _interp_nan(depth)
    tio.save_subpix_png(out_path, depth, scale_factor)


def cmd_disp_to_original_depth(args) -> int:
    _, calib = _load_stereo_calib(args.calibration)
    dst = Path(args.dst_depth_dir)
    dst.mkdir(parents=True, exist_ok=True)
    h, w = args.size
    map_x, map_y = _distort_maps(calib["P1"][:3, :3], calib["K1"], calib["D1"], h, w)
    paths = sorted(p for p in Path(args.disparity_dir).iterdir() if p.is_file())
    jobs = []
    for p in paths:
        out_p = dst / (p.stem + ".png")
        if out_p.exists() and not args.overwrite:
            continue
        jobs.append((p, out_p, map_x, map_y, calib, args.scale_factor))
    if args.jobs > 1:
        from multiprocessing import Pool

        with Pool(args.jobs) as pool:
            pool.starmap(_disp_to_original_depth_one, jobs)
    else:
        for j in jobs:
            _disp_to_original_depth_one(*j)
    print(f"wrote {len(jobs)} depthmap(s) to {dst}")
    return 0


def cmd_prepare_training_tree(args) -> int:
    """Raw SCARED keyframe (data/rgb.mp4 + data/frame_data.tar.gz +
    endoscope_calibration.yaml) -> the TRAINING layout data/scared.py reads
    (raw_images/Left/*.png + frame_data/*.json), with the left frames
    undistorted (reference datasets/img_distort.py:31-68) and KL written at
    the 1280x1024 calibration resolution scared_new2's convertK assumes.

    This is the bridge the reference leaves to the user between its toolkit
    scripts and its training datasets — shipped as a CLI here so the full
    raw-download -> training journey is scripted end to end
    (tests/test_end_to_end.py raw rehearsal)."""
    import cv2

    from featurematching_tpu.data.scared import RAW_H, RAW_W

    n = 0
    for kf in _keyframe_dirs(args.root_dir, args.recursive):
        out_dir = (
            Path(args.out_dir) / kf.parent.name / kf.name if args.out_dir else kf
        )
        img_dir = out_dir / "raw_images" / "Left"
        json_dir = out_dir / "frame_data"
        img_dir.mkdir(parents=True, exist_ok=True)
        json_dir.mkdir(parents=True, exist_ok=True)

        _, calib = _load_stereo_calib(kf / "endoscope_calibration.yaml")
        K1, D1 = calib["K1"], calib["D1"]
        poses = tio.load_pose_sequence(kf / "data" / "frame_data.tar.gz")

        video = None
        if (kf / "data" / "rgb.mp4").is_file():
            video = tio.StereoVideoCapture(kf / "data" / "rgb.mp4")
        for fid in sorted(poses):
            if video is not None:
                ok, (left, _right) = video.read()
                if not ok:
                    break
            else:
                left = cv2.imread(str(kf / "Left_Image.png"))
            und, newK = undistort(left, K1, D1)
            h, w = und.shape[:2]
            # store intrinsics at the raw calibration resolution so the
            # dataset's convert_K rescale round-trips exactly
            K_cal = newK.copy()
            K_cal[0, :] *= RAW_W / w
            K_cal[1, :] *= RAW_H / h
            name = f"frame{fid:06d}"
            cv2.imwrite(str(img_dir / (name + ".png")), und)
            rec = {
                "camera-pose": np.asarray(poses[fid], np.float64).tolist(),
                "camera-calibration": {
                    "KL": K_cal.tolist(),
                    "DL": np.zeros(5).tolist(),  # undistorted
                    "KR": K_cal.tolist(),
                    "DR": np.zeros(5).tolist(),
                },
            }
            with open(json_dir / (name + ".json"), "w") as f:
                json.dump(rec, f)
            n += 1
        if video is not None:
            video.release()
    print(f"prepared {n} training frame(s)")
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

    def _gen_common(sp):
        sp.add_argument("root_dir")
        sp.add_argument("-r", "--recursive", action="store_true")
        sp.add_argument("--out-dir", dest="out_dir", default=None)
        sp.add_argument("--depth", action="store_true")
        sp.add_argument("--undistort", action="store_true")
        sp.add_argument("--disparity", action="store_true")
        sp.add_argument("--alpha", type=float, default=-1.0)
        sp.add_argument("--scale-factor", type=float, default=256.0)

    sp = sub.add_parser("generate-keyframe-dataset")
    _gen_common(sp)
    sp.add_argument("--ptcloud", default=None,
                    help="use this ply instead of the shipped point_cloud.obj")
    sp.add_argument("--size", type=int, nargs=2, default=(1024, 1280),
                    metavar=("H", "W"))
    sp.set_defaults(fn=cmd_generate_keyframe_dataset)

    sp = sub.add_parser("generate-sequence-dataset")
    _gen_common(sp)
    sp.add_argument("--ptcloud", default=None)
    sp.set_defaults(fn=cmd_generate_sequence_dataset)

    sp = sub.add_parser("extract-sequence-dataset")
    _gen_common(sp)
    sp.set_defaults(fn=cmd_extract_sequence_dataset)

    sp = sub.add_parser("aggregate-keyframes")
    sp.add_argument("src_dataset")
    sp.add_argument("dst_dataset")
    sp.add_argument("--overwrite", action="store_true")
    sp.set_defaults(fn=cmd_aggregate_keyframes)

    sp = sub.add_parser("prepare-training-tree")
    sp.add_argument("root_dir")
    sp.add_argument("--out-dir", default=None)
    sp.add_argument("-r", "--recursive", action="store_true")
    sp.set_defaults(fn=cmd_prepare_training_tree)

    sp = sub.add_parser("disparity-to-original-depthmap")
    sp.add_argument("disparity_dir")
    sp.add_argument("dst_depth_dir")
    sp.add_argument("calibration")
    sp.add_argument("--size", type=int, nargs=2, default=(1024, 1280),
                    metavar=("H", "W"))
    sp.add_argument("--scale-factor", type=float, default=256.0)
    sp.add_argument("--overwrite", action="store_true")
    sp.add_argument("--jobs", type=int, default=1)
    sp.set_defaults(fn=cmd_disp_to_original_depth)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
