"""SCARED toolkit tests: conversion roundtrips, io formats, evaluation gates."""

import numpy as np
import pytest

from featurematching_tpu.toolkit import conversions as cv_
from featurematching_tpu.toolkit import evaluation as ev
from featurematching_tpu.toolkit import io as tio


def synthetic_cloud(rng, n=500):
    X = rng.standard_normal((n, 3)) * [20, 20, 10] + [0, 0, 80]
    return X


class TestConversions:
    def setup_method(self):
        self.K = np.array([[500.0, 0, 160], [0, 500.0, 120], [0, 0, 1]])
        self.size = (240, 320)

    def test_transform_roundtrip(self, rng):
        pts = synthetic_cloud(rng)
        R = np.eye(3)
        RT = cv_.create_RT(R, [1, 2, 3])
        back = cv_.transform_pts(cv_.transform_pts(pts, RT), np.linalg.inv(RT))
        np.testing.assert_allclose(back, pts, atol=1e-9)

    def test_depthmap_img3d_roundtrip(self, rng):
        depth = np.full((240, 320), 50.0)
        img3d = cv_.depthmap_to_img3d(depth, self.K)
        np.testing.assert_allclose(cv_.img3d_to_depthmap(img3d), depth)
        # center pixel backprojects to the optical axis
        np.testing.assert_allclose(img3d[120, 160], [0, 0, 50.0], atol=0.2)

    def test_ptcloud_depthmap_projection(self, rng):
        pts = synthetic_cloud(rng)
        depth = cv_.ptcloud_to_depthmap(pts, self.K, np.zeros(5), self.size)
        assert depth.shape == self.size
        filled = depth[depth > 0]
        assert len(filled) > 100
        assert filled.min() > 10 and filled.max() < 200

    def test_disparity_depth_consistency(self):
        # rectified setup: f=500, baseline=5 -> Q matrix convention
        f, b = 500.0, 5.0
        Q = np.array(
            [
                [1, 0, 0, -160],
                [0, 1, 0, -120],
                [0, 0, 0, f],
                [0, 0, -1.0 / b, 0],
            ]
        )
        depth = np.full((10, 10), 100.0)
        disp = cv_.depthmap_to_disparity(depth, Q)
        np.testing.assert_allclose(disp, f * b / 100.0, rtol=1e-6)
        depth_back = cv_.disparity_to_depthmap(disp.astype(np.float32), Q)
        np.testing.assert_allclose(depth_back, -depth, rtol=1e-4)  # cv2 sign conv

    def test_ptcloud_disparity(self, rng):
        pts = synthetic_cloud(rng)
        P1 = np.hstack([self.K, np.zeros((3, 1))])
        K2 = self.K.copy()
        P2 = np.hstack([K2, np.array([[-500.0 * 5.0], [0], [0]])])  # baseline 5
        disp = cv_.ptcloud_to_disparity(pts, P1, P2, self.size)
        got = disp[disp != 0]
        want = 500.0 * 5.0 / pts[:, 2]
        assert got.min() >= want.min() - 1e-6 and got.max() <= want.max() + 1e-6

    def test_flow_zero_for_static_pose(self, rng):
        pts = synthetic_cloud(rng, 200)
        T = cv_.create_RT()
        flow = cv_.ptcloud_to_flow(pts, T, T, self.size, self.K)
        vals = flow[~np.isnan(flow).any(-1)]
        np.testing.assert_allclose(vals, 0, atol=1e-9)

    def test_flow_translation(self, rng):
        pts = synthetic_cloud(rng, 300)
        T1 = cv_.create_RT()
        T2 = cv_.create_RT(T=[1.0, 0, 0])  # move cloud +x -> flow +u
        flow = cv_.ptcloud_to_flow(pts, T1, T2, self.size, self.K)
        vals = flow[~np.isnan(flow).any(-1)]
        assert (vals[:, 0] > 0).all()
        assert np.abs(vals[:, 1]).max() < 1e-6


class TestIO:
    def test_ply_roundtrip(self, tmp_path, rng):
        pts = rng.standard_normal((50, 3))
        p = tmp_path / "cloud.ply"
        tio.save_ptcloud_as_ply(p, pts)
        back = tio.load_ply_as_ptcloud(p)
        np.testing.assert_allclose(back, pts, rtol=1e-6)

    def test_obj_vertices(self, tmp_path):
        p = tmp_path / "mesh.obj"
        p.write_text("# comment\nv 1 2 3\nv 4 5 6\nf 1 2 3\n")
        pts = tio.load_scared_obj(p)
        np.testing.assert_allclose(pts, [[1, 2, 3], [4, 5, 6]])

    def test_subpix_png_roundtrip(self, tmp_path, rng):
        img = rng.random((32, 32)) * 100
        img[0, 0] = np.nan
        p = tmp_path / "d.png"
        tio.save_subpix_png(p, img)
        back = tio.load_subpix_png(p)
        valid = ~np.isnan(back)
        np.testing.assert_allclose(back[valid], img[valid], atol=1 / 256.0 + 1e-6)
        assert np.isnan(back[0, 0])

    def test_kitti_flow_roundtrip(self, tmp_path, rng):
        flow = rng.standard_normal((16, 16, 2)) * 10
        flow[0, 0] = np.nan
        p = tmp_path / "flow.png"
        tio.save_flow_kitti(p, flow)
        back = tio.read_flow_kitti(p)
        valid = ~np.isnan(back).any(-1)
        np.testing.assert_allclose(back[valid], flow[valid], atol=1 / 64.0 + 1e-6)
        assert np.isnan(back[0, 0]).all()

    def test_pose_sequence_from_dir(self, tmp_path):
        import json

        for i in range(3):
            pose = np.eye(4)
            pose[0, 3] = i
            (tmp_path / f"frame{i:03d}.json").write_text(
                json.dumps({"camera-pose": pose.tolist()})
            )
        poses = tio.load_pose_sequence(tmp_path)
        assert len(poses) == 3
        np.testing.assert_allclose(poses[2][0, 3], 2)


class TestEvaluation:
    def test_coverage_gate(self):
        ref = np.full((10, 10), np.nan)
        ref[0, 0] = 5.0  # 1% coverage < 10%
        assert ev.depthmap_error(ref, np.ones((10, 10))) is None

    def test_depth_mae(self):
        ref = np.full((10, 10), 10.0)
        comp = np.full((10, 10), 12.5)
        assert ev.depthmap_error(ref, comp) == pytest.approx(2.5)

    def test_xyz_error(self):
        ref = np.zeros((4, 4, 3))
        comp = np.zeros((4, 4, 3))
        comp[..., 0] = 3.0
        comp[..., 1] = 4.0
        ref[..., 2] = 1.0
        comp[..., 2] = 1.0
        assert ev.xyz_error(ref, comp) == pytest.approx(5.0)

    def test_disparity_mae_bad3(self):
        ref = np.full((10, 10), 20.0)
        comp = ref.copy()
        comp[:5] += 4.0  # half the pixels are 'bad3'
        mae, bad3 = ev.disparity_error(ref, comp)
        assert mae == pytest.approx(2.0)
        assert bad3 == pytest.approx(50.0)
