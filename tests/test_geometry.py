"""Geometry-layer unit tests with golden values from independent numpy math.

Mirrors SURVEY.md §4 recommendation (a): pure-function tests for SE(3)/epipolar/
E-solver numerics before any learned component exists.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from featurematching_tpu.geometry import (
    axis_angle_to_matrix,
    matrix_to_euler_zyx,
    euler_zyx_to_matrix,
    quat_to_matrix,
    matrix_to_quat,
    transform_from_params,
    invert_se3,
    relative_pose_error,
    so3_exp,
    so3_log,
    se3_exp,
    se3_log,
    cross_product_matrix,
    essential_from_pose,
    symmetric_epipolar_distance,
    sampson_distance,
    normalize_keypoints,
    estimate_essential_ransac,
    recover_pose_from_essential,
    triangulate_linear,
)
from featurematching_tpu.geometry.triangulation import projection_from_pose, reproject


def random_rotation(rng):
    """Haar-ish random rotation via QR."""
    A = rng.standard_normal((3, 3))
    Q, R = np.linalg.qr(A)
    Q = Q @ np.diag(np.sign(np.diag(R)))
    if np.linalg.det(Q) < 0:
        Q[:, 0] = -Q[:, 0]
    return Q


def make_pose(rng, t_scale=1.0):
    R = random_rotation(rng)
    t = rng.standard_normal(3) * t_scale
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


def make_viewing_pose(rng, rot_scale=0.25, t_scale=0.5):
    """A physically plausible second-camera pose: small rotation + baseline, so
    scene points in front of cam0 stay in front of cam1 (real matches)."""
    rotvec = rng.standard_normal(3) * rot_scale
    R = np.asarray(axis_angle_to_matrix(jnp.asarray(rotvec)))
    t = rng.standard_normal(3) * t_scale
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


def make_two_view_scene(rng, n, noise=0.0):
    """Synthetic correspondences visible in BOTH cameras (positive depths)."""
    T = make_viewing_pose(rng)
    R, t = T[:3, :3], T[:3, 3]
    pts = []
    while len(pts) < n:
        X = rng.standard_normal((4 * n, 3)) * np.array([2.0, 2.0, 1.5]) + np.array(
            [0, 0, 8.0]
        )
        Xc1 = X @ R.T + t
        ok = (X[:, 2] > 0.5) & (Xc1[:, 2] > 0.5)
        pts.extend(X[ok])
    X = np.asarray(pts[:n])
    Xc1 = X @ R.T + t
    x0 = X[:, :2] / X[:, 2:3]
    x1 = Xc1[:, :2] / Xc1[:, 2:3]
    if noise:
        x0 = x0 + rng.standard_normal(x0.shape) * noise
        x1 = x1 + rng.standard_normal(x1.shape) * noise
    return T, x0, x1


class TestSO3:
    def test_axis_angle_roundtrip_identity(self):
        R = axis_angle_to_matrix(jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)

    def test_axis_angle_quarter_turn_z(self):
        # pi/2 about z: x -> y
        R = axis_angle_to_matrix(jnp.array([0.0, 0.0, np.pi / 2]))
        v = np.asarray(R) @ np.array([1.0, 0, 0])
        np.testing.assert_allclose(v, [0, 1, 0], atol=1e-6)

    def test_orthonormal(self, rng):
        vecs = jnp.asarray(rng.standard_normal((16, 3)))
        Rs = axis_angle_to_matrix(vecs)
        eye = np.broadcast_to(np.eye(3), (16, 3, 3))
        np.testing.assert_allclose(
            np.asarray(Rs @ jnp.swapaxes(Rs, -1, -2)), eye, atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(jnp.linalg.det(Rs)), np.ones(16), atol=1e-5)

    def test_euler_roundtrip(self, rng):
        for _ in range(10):
            R = random_rotation(rng)
            e = matrix_to_euler_zyx(jnp.asarray(R))
            R2 = euler_zyx_to_matrix(e)
            np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)

    def test_quat_roundtrip(self, rng):
        Rs = np.stack([random_rotation(rng) for _ in range(32)])
        q = matrix_to_quat(jnp.asarray(Rs))
        R2 = quat_to_matrix(q)
        np.testing.assert_allclose(np.asarray(R2), Rs, atol=1e-5)

    def test_quat_matches_scipy(self, rng):
        from scipy.spatial.transform import Rotation as SR

        Rs = np.stack([random_rotation(rng) for _ in range(8)])
        q_ours = np.asarray(matrix_to_quat(jnp.asarray(Rs)))
        q_scipy = SR.from_matrix(Rs).as_quat()  # x, y, z, w
        # sign-normalize both to w >= 0
        q_scipy = q_scipy * np.where(q_scipy[:, 3:4] < 0, -1, 1)
        np.testing.assert_allclose(q_ours, q_scipy, atol=1e-5)

    def test_so3_exp_log_roundtrip(self, rng):
        w = jnp.asarray(rng.standard_normal((16, 3)) * 0.8)
        np.testing.assert_allclose(np.asarray(so3_log(so3_exp(w))), np.asarray(w), atol=1e-5)

    def test_so3_exp_matches_axis_angle(self, rng):
        w = jnp.asarray(rng.standard_normal((8, 3)))
        np.testing.assert_allclose(
            np.asarray(so3_exp(w)), np.asarray(axis_angle_to_matrix(w)), atol=1e-5
        )

    def test_se3_exp_log_roundtrip(self, rng):
        xi = jnp.asarray(rng.standard_normal((16, 6)) * 0.5)
        np.testing.assert_allclose(np.asarray(se3_log(se3_exp(xi))), np.asarray(xi), atol=1e-4)


class TestSE3:
    def test_invert(self, rng):
        T = jnp.asarray(make_pose(rng))
        np.testing.assert_allclose(np.asarray(invert_se3(T) @ T), np.eye(4), atol=1e-6)

    def test_transform_from_params(self):
        T = transform_from_params(jnp.zeros((1, 3)), jnp.array([[1.0, 2.0, 3.0]]))
        np.testing.assert_allclose(np.asarray(T[0, :3, 3]), [1, 2, 3], atol=1e-6)
        np.testing.assert_allclose(np.asarray(T[0, :3, :3]), np.eye(3), atol=1e-6)

    def test_relative_pose_error_zero(self, rng):
        T = make_pose(rng)
        R_err, t_err = relative_pose_error(
            jnp.asarray(T), jnp.asarray(T[:3, :3]), jnp.asarray(T[:3, 3])
        )
        assert float(R_err) < 1e-3
        assert float(t_err) < 1e-6

    def test_relative_pose_error_known_angle(self):
        T = np.eye(4)
        R10 = np.asarray(axis_angle_to_matrix(jnp.array([0.0, 0.0, np.deg2rad(10)])))
        R_err, _ = relative_pose_error(jnp.asarray(T), jnp.asarray(R10), jnp.zeros(3))
        np.testing.assert_allclose(float(R_err), 10.0, atol=1e-3)


class TestEpipolar:
    def test_cross_product_matrix(self, rng):
        a = rng.standard_normal(3)
        b = rng.standard_normal(3)
        Ax = np.asarray(cross_product_matrix(jnp.asarray(a)))
        np.testing.assert_allclose(Ax @ b, np.cross(a, b), atol=1e-6)

    def _synth_pair(self, rng, n=100, noise=0.0):
        return make_two_view_scene(rng, n, noise)

    def test_epipolar_distance_zero_for_true_geometry(self, rng):
        T, x0, x1 = self._synth_pair(rng)
        E = essential_from_pose(jnp.asarray(T))
        d = symmetric_epipolar_distance(jnp.asarray(x0), jnp.asarray(x1), E)
        assert float(jnp.max(d)) < 1e-8
        ds = sampson_distance(jnp.asarray(x0), jnp.asarray(x1), E)
        assert float(jnp.max(ds)) < 1e-8

    def test_epipolar_distance_matches_reference_formula(self, rng):
        """Golden check vs a direct numpy transcription of metrics.py:33-53."""
        T, x0, x1 = self._synth_pair(rng, noise=2e-3)
        E = np.asarray(essential_from_pose(jnp.asarray(T)))
        p0 = np.concatenate([x0, np.ones((len(x0), 1))], 1)
        p1 = np.concatenate([x1, np.ones((len(x1), 1))], 1)
        Ep0 = p0 @ E.T
        p1Ep0 = np.sum(p1 * Ep0, -1)
        Etp1 = p1 @ E
        d_ref = p1Ep0**2 * (
            1.0 / (Ep0[:, 0] ** 2 + Ep0[:, 1] ** 2)
            + 1.0 / (Etp1[:, 0] ** 2 + Etp1[:, 1] ** 2)
        )
        d_ours = np.asarray(
            symmetric_epipolar_distance(jnp.asarray(x0), jnp.asarray(x1), jnp.asarray(E))
        )
        # ours runs in fp32 (TPU-native); the numpy transcription is fp64 —
        # the squared-residual formula amplifies fp32 rounding, so compare at
        # fp32-appropriate tolerance.
        np.testing.assert_allclose(d_ours, d_ref, rtol=2e-2, atol=1e-12)

    def test_normalize_keypoints(self):
        K = jnp.array([[100.0, 0, 320], [0, 100.0, 240], [0, 0, 1]])
        pts = jnp.array([[320.0, 240.0], [420.0, 340.0]])
        out = np.asarray(normalize_keypoints(pts, K))
        np.testing.assert_allclose(out, [[0, 0], [1, 1]], atol=1e-6)


class TestRansac:
    def _matches(self, rng, n_in=200, n_out=50, noise=1e-4):
        T, x0, x1 = make_two_view_scene(rng, n_in, noise)
        # outliers
        x0o = rng.standard_normal((n_out, 2)) * 0.5
        x1o = rng.standard_normal((n_out, 2)) * 0.5
        pts0 = np.concatenate([x0, x0o]) if n_out else x0
        pts1 = np.concatenate([x1, x1o]) if n_out else x1
        mask = np.ones(len(pts0), dtype=bool)
        return T, pts0, pts1, mask

    def test_ransac_recovers_pose(self, rng):
        T, pts0, pts1, mask = self._matches(rng)
        res = estimate_essential_ransac(
            jnp.asarray(pts0, jnp.float32),
            jnp.asarray(pts1, jnp.float32),
            jnp.asarray(mask),
            jax.random.PRNGKey(0),
            thresh=3e-3,
            num_hypotheses=256,
        )
        assert bool(res.valid)
        assert int(res.num_inliers) > 150
        # rotation should match GT closely; translation direction up to scale
        R_err, _ = relative_pose_error(jnp.asarray(T), res.R, res.t)
        assert float(R_err) < 1.0, f"R_err={float(R_err)}"
        t_gt = T[:3, 3] / np.linalg.norm(T[:3, 3])
        cos = abs(float(np.dot(np.asarray(res.t), t_gt)))
        assert cos > 0.99, f"translation direction cos={cos}"

    def test_ransac_padded_invalid_rows(self, rng):
        """Padding rows must not perturb the solution."""
        T, pts0, pts1, mask = self._matches(rng, n_out=0)
        pad = 64
        pts0p = np.concatenate([pts0, np.full((pad, 2), 1e3)])
        pts1p = np.concatenate([pts1, np.full((pad, 2), -1e3)])
        maskp = np.concatenate([mask, np.zeros(pad, dtype=bool)])
        res = estimate_essential_ransac(
            jnp.asarray(pts0p, jnp.float32),
            jnp.asarray(pts1p, jnp.float32),
            jnp.asarray(maskp),
            jax.random.PRNGKey(1),
            thresh=3e-3,
            num_hypotheses=256,
        )
        assert bool(res.valid)
        assert not bool(jnp.any(res.inliers[-pad:]))
        R_err, _ = relative_pose_error(jnp.asarray(T), res.R, res.t)
        assert float(R_err) < 1.0

    def test_recover_pose_cheirality(self, rng):
        T, pts0, pts1, _ = self._matches(rng, n_in=100, n_out=0, noise=0.0)
        E = essential_from_pose(jnp.asarray(T))
        E = E / jnp.linalg.norm(E)
        R, t, votes = recover_pose_from_essential(
            E, jnp.asarray(pts0, jnp.float32), jnp.asarray(pts1, jnp.float32),
            jnp.ones(len(pts0), jnp.float32),
        )
        R_err, _ = relative_pose_error(jnp.asarray(T), R, t)
        assert float(R_err) < 0.1
        assert int(jnp.max(votes)) == 100


class TestTriangulation:
    def test_roundtrip(self, rng):
        T0 = np.eye(4)
        T1 = make_pose(rng, t_scale=0.5)
        X = rng.standard_normal((50, 3)) * 2 + np.array([0, 0, 6.0])
        x0 = np.asarray(reproject(jnp.asarray(X), jnp.asarray(T0)))
        x1 = np.asarray(reproject(jnp.asarray(X), jnp.asarray(T1)))
        P0 = projection_from_pose(jnp.asarray(T0))
        P1 = projection_from_pose(jnp.asarray(T1))
        X_tri = triangulate_linear(P0, P1, jnp.asarray(x0), jnp.asarray(x1))
        np.testing.assert_allclose(np.asarray(X_tri), X, atol=1e-4)


class TestHomography:
    def _synth(self, rng, n_in=100, n_out=30, noise=0.3):
        H_gt = np.array(
            [[1.1, 0.05, 12.0], [-0.03, 0.95, -8.0], [1e-4, -5e-5, 1.0]]
        )
        p0 = rng.uniform(0, 500, (n_in, 2))
        ph = np.concatenate([p0, np.ones((n_in, 1))], 1) @ H_gt.T
        p1 = ph[:, :2] / ph[:, 2:3] + rng.standard_normal((n_in, 2)) * noise
        p0o = rng.uniform(0, 500, (n_out, 2))
        p1o = rng.uniform(0, 500, (n_out, 2))
        pts0 = np.concatenate([p0, p0o]).astype(np.float32)
        pts1 = np.concatenate([p1, p1o]).astype(np.float32)
        return H_gt, pts0, pts1

    def test_dlt_exact(self, rng):
        from featurematching_tpu.geometry.homography import (
            dlt_homography,
            homography_transfer_error,
        )

        H_gt, pts0, pts1 = self._synth(rng, n_out=0, noise=0.0)
        H = dlt_homography(
            jnp.asarray(pts0), jnp.asarray(pts1), jnp.ones(len(pts0))
        )
        np.testing.assert_allclose(np.asarray(H), H_gt / H_gt[2, 2], rtol=1e-3, atol=1e-4)
        err = homography_transfer_error(jnp.asarray(pts0), jnp.asarray(pts1), H)
        assert float(jnp.max(err)) < 1e-3

    def test_ransac_with_outliers(self, rng):
        from featurematching_tpu.geometry.homography import (
            estimate_homography_ransac,
            homography_corner_error,
        )

        H_gt, pts0, pts1 = self._synth(rng)
        mask = np.ones(len(pts0), bool)
        res = estimate_homography_ransac(
            jnp.asarray(pts0), jnp.asarray(pts1), jnp.asarray(mask),
            jax.random.PRNGKey(0), thresh=3.0, num_hypotheses=256,
        )
        assert bool(res.valid)
        assert int(res.num_inliers) >= 90
        assert not np.asarray(res.inliers)[100:].any() or np.asarray(res.inliers)[100:].mean() < 0.2
        err = homography_corner_error(res.H, jnp.asarray(H_gt), 640.0, 480.0)
        assert float(err) < 3.0, f"corner err {float(err)}"

    def test_padded_rows_ignored(self, rng):
        from featurematching_tpu.geometry.homography import estimate_homography_ransac

        H_gt, pts0, pts1 = self._synth(rng, n_out=0)
        pad = 50
        p0p = np.concatenate([pts0, np.full((pad, 2), -1e4, np.float32)])
        p1p = np.concatenate([pts1, np.full((pad, 2), 1e4, np.float32)])
        maskp = np.concatenate([np.ones(len(pts0), bool), np.zeros(pad, bool)])
        res = estimate_homography_ransac(
            jnp.asarray(p0p), jnp.asarray(p1p), jnp.asarray(maskp),
            jax.random.PRNGKey(1), thresh=3.0, num_hypotheses=128,
        )
        assert bool(res.valid)
        assert not np.asarray(res.inliers)[-pad:].any()
