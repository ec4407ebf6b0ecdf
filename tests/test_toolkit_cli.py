"""End-to-end tests for the SCARED dataset-generation CLI subcommands.

Builds a raw-SCARED-shaped fixture (calibration yaml, stereo keyframe images,
point_cloud.obj, left_depth_map.tiff, frame_data.tar.gz kinematics, stacked
rgb.mp4, scene_points.tar.gz GT) and drives it through the CLI surface that
mirrors /root/reference/datasets/scared_toolkits/scripts/:
generate_keyframe_dataset.py, generate_sequence_dataset.py,
extract_sequence_dataset.py, aggregate_keyframes.py,
disparity_to_original_depthmap.py.
"""

from __future__ import annotations

import io
import json
import shutil
import tarfile
import time

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from featurematching_tpu.apps.scared_toolkit_cli import main
from featurematching_tpu.toolkit import conversions as cvs
from featurematching_tpu.toolkit import io as tio
from featurematching_tpu.toolkit.calibration import StereoCalibrator

H, W = 48, 64
K = np.array([[70.0, 0.0, 32.0], [0.0, 70.0, 24.0], [0.0, 0.0, 1.0]])
D = np.zeros((1, 5))
T_STEREO = np.array([[-5.0], [0.0], [0.0]])  # 5mm baseline
N_FRAMES = 3


def _gt_geometry():
    """Tilted depth plane -> (depthmap, img3d, ptcloud)."""
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    depth = 100.0 + 0.1 * xx + 0.05 * yy
    img3d = cvs.depthmap_to_img3d(depth, K)
    cloud = cvs.img3d_to_ptcloud(img3d)
    return depth, img3d, cloud


def _add_tar_bytes(tar, name, payload: bytes, mtime: float):
    info = tarfile.TarInfo(name)
    info.size = len(payload)
    info.mtime = mtime
    tar.addfile(info, io.BytesIO(payload))


@pytest.fixture(scope="module")
def scared_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("raw_scared")
    kf = root / "dataset_1" / "keyframe_1"
    (kf / "data").mkdir(parents=True)

    sc = StereoCalibrator((0, 0), 0.0)
    sc.calib = {
        "K1": K, "D1": D, "K2": K, "D2": D,
        "R": np.eye(3), "T": T_STEREO,
    }
    sc.save(kf / "endoscope_calibration.yaml")

    rng = np.random.default_rng(0)
    left = rng.integers(0, 255, (H, W, 3), np.uint8)
    right = rng.integers(0, 255, (H, W, 3), np.uint8)
    cv2.imwrite(str(kf / "Left_Image.png"), left)
    cv2.imwrite(str(kf / "Right_Image.png"), right)

    depth, img3d, cloud = _gt_geometry()
    tio.save_img3d(kf / "left_depth_map.tiff", img3d)
    with open(kf / "point_cloud.obj", "w") as f:
        for p in cloud:
            f.write(f"v {p[0]} {p[1]} {p[2]}\n")

    now = time.time()
    with tarfile.open(kf / "data" / "frame_data.tar.gz", "w:gz") as tar:
        for i in range(N_FRAMES):
            payload = json.dumps(
                {"camera-pose": np.eye(4).tolist()}
            ).encode()
            _add_tar_bytes(tar, f"frame_data{i:06d}.json", payload, now)

    with tarfile.open(kf / "data" / "scene_points.tar.gz", "w:gz") as tar:
        import imageio.v2 as imageio

        for i in range(N_FRAMES):
            buf = io.BytesIO()
            imageio.imwrite(buf, img3d.astype(np.float32), format="tiff")
            _add_tar_bytes(tar, f"scene_points{i:06d}.tiff", buf.getvalue(), now)

    vw = cv2.VideoWriter(
        str(kf / "data" / "rgb.mp4"),
        cv2.VideoWriter_fourcc(*"mp4v"), 10, (W, 2 * H),
    )
    assert vw.isOpened()
    for _ in range(N_FRAMES):
        vw.write(np.vstack([left, right]))
    vw.release()
    return root


class TestGenerateKeyframeDataset:
    def test_full_products(self, scared_root, tmp_path):
        out = tmp_path / "gen_kf"
        rc = main([
            "generate-keyframe-dataset", str(scared_root), "-r",
            "--out-dir", str(out), "--depth", "--undistort", "--disparity",
        ])
        assert rc == 0
        kf = out / "dataset_1" / "keyframe_1"
        for name in (
            "Left_Image.png", "depthmap.png", "left_undistorted.png",
            "depthmap_undistorted.png", "left_rectified.png",
            "right_rectified.png", "depthmap_rectified.png", "disparity.png",
            "stereo_calib.json",
        ):
            assert (kf / name).is_file(), name

        depth_gt, _, _ = _gt_geometry()
        dm = tio.load_subpix_png(kf / "depthmap.png")
        valid = np.isfinite(dm)
        assert valid.mean() > 0.9
        np.testing.assert_allclose(dm[valid], depth_gt[valid], atol=0.05)

        # disparity = fx * baseline / z on the rectified (≈original) frame
        disp = tio.load_subpix_png(kf / "disparity.png")
        dv = disp[np.isfinite(disp)]
        expected = K[0, 0] * 5.0 / depth_gt.mean()
        assert abs(np.median(dv) - expected) / expected < 0.1

    def test_reprojected_user_ply(self, scared_root, tmp_path):
        kf_src = scared_root / "dataset_1" / "keyframe_1"
        _, _, cloud = _gt_geometry()
        tio.save_ptcloud_as_ply(kf_src / "user_cloud.ply", cloud)
        out = tmp_path / "gen_ply"
        rc = main([
            "generate-keyframe-dataset", str(scared_root), "-r",
            "--out-dir", str(out), "--depth",
            "--ptcloud", "user_cloud.ply", "--size", str(H), str(W),
        ])
        assert rc == 0
        dm = tio.load_subpix_png(out / "dataset_1" / "keyframe_1" / "depthmap.png")
        depth_gt, _, _ = _gt_geometry()
        valid = np.isfinite(dm)
        assert valid.mean() > 0.5  # scatter holes allowed
        np.testing.assert_allclose(dm[valid], depth_gt[valid], atol=0.6)


class TestGenerateSequenceDataset:
    def test_per_frame_products(self, scared_root, tmp_path):
        out = tmp_path / "gen_seq"
        rc = main([
            "generate-sequence-dataset", str(scared_root), "-r",
            "--out-dir", str(out), "--depth",
        ])
        assert rc == 0
        kf = out / "dataset_1" / "keyframe_1"
        for i in range(N_FRAMES):
            assert (kf / "left" / f"{i:06d}.png").is_file()
            assert (kf / "depthmap" / f"{i:06d}.png").is_file()
        # identity kinematics -> every frame's depth equals the keyframe GT
        depth_gt, _, _ = _gt_geometry()
        dm = tio.load_subpix_png(kf / "depthmap" / "000002.png")
        valid = np.isfinite(dm)
        assert valid.mean() > 0.5
        np.testing.assert_allclose(dm[valid], depth_gt[valid], atol=0.6)


class TestExtractSequenceDataset:
    def test_gt_tar_products_and_valid_gate(self, scared_root, tmp_path):
        out = tmp_path / "ext_seq"
        rc = main([
            "extract-sequence-dataset", str(scared_root), "-r",
            "--out-dir", str(out), "--depth",
        ])
        assert rc == 0
        kf = out / "dataset_1" / "keyframe_1"
        depth_gt, _, _ = _gt_geometry()
        for i in range(N_FRAMES):
            dm = tio.load_subpix_png(kf / "data" / "depthmap" / f"{i:06d}.png")
            valid = np.isfinite(dm)
            assert valid.mean() > 0.9
            np.testing.assert_allclose(dm[valid], depth_gt[valid], atol=0.05)
        valid_ids = np.loadtxt(kf / "valid.csv", delimiter=",").astype(int)
        np.testing.assert_array_equal(valid_ids, np.arange(N_FRAMES))
        assert (kf / "stereo_calib.json").is_file()


class TestAggregateKeyframes:
    def test_regroup_by_product(self, scared_root, tmp_path):
        src = tmp_path / "agg_src"
        main([
            "generate-keyframe-dataset", str(scared_root), "-r",
            "--out-dir", str(src), "--depth",
        ])
        dst = tmp_path / "agg_dst"
        rc = main(["aggregate-keyframes", str(src), str(dst)])
        assert rc == 0
        assert (dst / "Left_Image" / "1_1.png").is_file()
        assert (dst / "depthmap" / "1_1.png").is_file()
        # second run without --overwrite refuses
        assert main(["aggregate-keyframes", str(src), str(dst)]) == 1
        assert main(["aggregate-keyframes", str(src), str(dst), "--overwrite"]) == 0


class TestDisparityToOriginalDepthmap:
    def test_roundtrip_to_original_frame(self, scared_root, tmp_path):
        gen = tmp_path / "for_disp"
        main([
            "generate-keyframe-dataset", str(scared_root), "-r",
            "--out-dir", str(gen), "--disparity",
        ])
        kf = gen / "dataset_1" / "keyframe_1"
        disp_dir = tmp_path / "disp_in"
        disp_dir.mkdir()
        shutil.copy(kf / "disparity.png", disp_dir / "000000.png")
        out = tmp_path / "depth_out"
        rc = main([
            "disparity-to-original-depthmap", str(disp_dir), str(out),
            str(kf / "stereo_calib.json"), "--size", str(H), str(W),
        ])
        assert rc == 0
        depth = tio.load_subpix_png(out / "000000.png")
        depth_gt, _, _ = _gt_geometry()
        valid = np.isfinite(depth)
        assert valid.mean() > 0.9
        # nearest-neighbour remap + hole infill: compare medians
        med_err = np.median(np.abs(depth[valid] - depth_gt[valid]))
        assert med_err < 1.0, med_err

    def test_skip_existing_and_jobs(self, scared_root, tmp_path):
        gen = tmp_path / "for_disp2"
        main([
            "generate-keyframe-dataset", str(scared_root), "-r",
            "--out-dir", str(gen), "--disparity",
        ])
        kf = gen / "dataset_1" / "keyframe_1"
        disp_dir = tmp_path / "disp_in2"
        disp_dir.mkdir()
        for i in range(2):
            shutil.copy(kf / "disparity.png", disp_dir / f"{i:06d}.png")
        out = tmp_path / "depth_out2"
        main([
            "disparity-to-original-depthmap", str(disp_dir), str(out),
            str(kf / "stereo_calib.json"), "--size", str(H), str(W),
            "--jobs", "2",
        ])
        mtimes = {p.name: p.stat().st_mtime_ns for p in out.iterdir()}
        assert len(mtimes) == 2
        # rerun without --overwrite leaves files untouched
        main([
            "disparity-to-original-depthmap", str(disp_dir), str(out),
            str(kf / "stereo_calib.json"), "--size", str(H), str(W),
        ])
        assert {p.name: p.stat().st_mtime_ns for p in out.iterdir()} == mtimes
