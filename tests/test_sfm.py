"""SfM back-end tests: BA convergence on synthetic scenes, pose-graph
optimization, padded-observation invariance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from featurematching_tpu.geometry.se3 import invert_se3, relative_pose_error, se3_exp
from featurematching_tpu.sfm import (
    BAProblem,
    PoseGraph,
    bundle_adjust,
    optimize_pose_graph,
    reprojection_residuals,
)


def synthetic_ba_problem(rng, Nc=4, Np=60, noise=0.0, pose_noise=0.0, pad_obs=0):
    """Cameras on a small arc looking at a point cloud; full visibility."""
    points = rng.standard_normal((Np, 3)) * [2.0, 2.0, 1.0] + [0, 0, 8.0]
    poses = []
    for c in range(Nc):
        w = np.array([0.0, 0.02 * c, 0.0])
        t = np.array([0.3 * c, 0.05 * c, 0.0])
        T = np.asarray(se3_exp(jnp.asarray(np.concatenate([t, w]), jnp.float32)))
        poses.append(T)
    poses = np.stack(poses)

    cam_idx, pt_idx, uvs = [], [], []
    for c in range(Nc):
        Xc = points @ poses[c][:3, :3].T + poses[c][:3, 3]
        uv = Xc[:, :2] / Xc[:, 2:3]
        cam_idx.extend([c] * Np)
        pt_idx.extend(range(Np))
        uvs.append(uv)
    uv = np.concatenate(uvs) + rng.standard_normal((Nc * Np, 2)) * noise
    M = len(uv)
    mask = np.ones(M, bool)
    if pad_obs:
        cam_idx = list(cam_idx) + [0] * pad_obs
        pt_idx = list(pt_idx) + [0] * pad_obs
        uv = np.concatenate([uv, np.full((pad_obs, 2), 1e3)])
        mask = np.concatenate([mask, np.zeros(pad_obs, bool)])

    # perturb initial estimates (cameras after the first, all points)
    init_poses = poses.copy()
    for c in range(1, Nc):
        xi = rng.standard_normal(6) * pose_noise
        init_poses[c] = np.asarray(se3_exp(jnp.asarray(xi, jnp.float32))) @ poses[c]
    init_points = points + rng.standard_normal(points.shape) * (pose_noise * 2)

    problem = BAProblem(
        poses=jnp.asarray(init_poses, jnp.float32),
        points=jnp.asarray(init_points, jnp.float32),
        cam_idx=jnp.asarray(cam_idx, jnp.int32),
        pt_idx=jnp.asarray(pt_idx, jnp.int32),
        uv=jnp.asarray(uv, jnp.float32),
        mask=jnp.asarray(mask),
    )
    return problem, poses, points


class TestBundleAdjustment:
    def test_zero_noise_zero_residual(self, rng):
        problem, poses_gt, points_gt = synthetic_ba_problem(rng, pose_noise=0.0)
        r = reprojection_residuals(problem.poses, problem.points, problem)
        assert float(jnp.abs(r).max()) < 1e-5

    def test_converges_from_perturbation(self, rng):
        problem, poses_gt, points_gt = synthetic_ba_problem(
            rng, pose_noise=0.03
        )
        res = bundle_adjust(problem, iters=15)
        costs = np.asarray(res.cost_history)
        assert costs[-1] < costs[0] * 1e-3, f"costs {costs}"
        # recovered camera poses close to GT
        for c in range(1, 4):
            R_err, t_err = relative_pose_error(
                jnp.asarray(poses_gt[c]), res.poses[c][:3, :3], res.poses[c][:3, 3]
            )
            assert float(R_err) < 0.2, f"cam {c} R_err {float(R_err)}"
            assert float(t_err) < 0.02, f"cam {c} t_err {float(t_err)}"

    def test_padded_observations_no_effect(self, rng):
        p1, _, _ = synthetic_ba_problem(rng, pose_noise=0.02)
        rng2 = np.random.default_rng(0)
        p2, _, _ = synthetic_ba_problem(rng2, pose_noise=0.02, pad_obs=64)
        r1 = bundle_adjust(p1, iters=5)
        r2 = bundle_adjust(p2, iters=5)
        np.testing.assert_allclose(
            np.asarray(r1.poses), np.asarray(r2.poses), atol=1e-5
        )

    def test_gauge_fixed_camera_unchanged(self, rng):
        problem, _, _ = synthetic_ba_problem(rng, pose_noise=0.05)
        res = bundle_adjust(problem, iters=8)
        np.testing.assert_allclose(
            np.asarray(res.poses[0]), np.asarray(problem.poses[0]), atol=1e-6
        )

    def test_noisy_observations_reasonable(self, rng):
        problem, poses_gt, _ = synthetic_ba_problem(
            rng, noise=1e-3, pose_noise=0.03
        )
        res = bundle_adjust(problem, iters=15)
        R_err, t_err = relative_pose_error(
            jnp.asarray(poses_gt[2]), res.poses[2][:3, :3], res.poses[2][:3, 3]
        )
        assert float(R_err) < 0.5
        assert float(t_err) < 0.05


class TestPoseGraph:
    def make_chain(self, rng, N=6, noise=0.0, drift=0.05):
        """Chain of poses + loop-closure edge; initial guess has drift."""
        poses_gt = [np.eye(4, dtype=np.float32)]
        for i in range(1, N):
            xi = np.concatenate([[0.5, 0.02 * i, 0], [0, 0.05, 0]])
            poses_gt.append(
                np.asarray(se3_exp(jnp.asarray(xi, jnp.float32))) @ poses_gt[-1]
            )
        poses_gt = np.stack(poses_gt)

        edges_i, edges_j, Z, w = [], [], [], []
        for i in range(N - 1):
            edges_i.append(i)
            edges_j.append(i + 1)
            Zij = poses_gt[i + 1] @ np.linalg.inv(poses_gt[i])
            Z.append(Zij)
            w.append(1.0)
        # loop closure 0 -> N-1
        edges_i.append(0)
        edges_j.append(N - 1)
        Z.append(poses_gt[N - 1] @ np.linalg.inv(poses_gt[0]))
        w.append(1.0)

        init = poses_gt.copy()
        for i in range(1, N):
            xi = rng.standard_normal(6) * drift
            init[i] = np.asarray(se3_exp(jnp.asarray(xi, jnp.float32))) @ init[i]

        graph = PoseGraph(
            poses=jnp.asarray(init),
            edge_i=jnp.asarray(edges_i, jnp.int32),
            edge_j=jnp.asarray(edges_j, jnp.int32),
            measurements=jnp.asarray(np.stack(Z), jnp.float32),
            weights=jnp.asarray(w, jnp.float32),
        )
        return graph, poses_gt

    def test_chain_with_loop_closure_converges(self, rng):
        graph, poses_gt = self.make_chain(rng)
        poses, costs = optimize_pose_graph(graph, iters=12)
        costs = np.asarray(costs)
        assert costs[-1] < costs[0] * 1e-4, costs
        for i in range(1, len(poses_gt)):
            R_err, t_err = relative_pose_error(
                jnp.asarray(poses_gt[i]), poses[i][:3, :3], poses[i][:3, 3]
            )
            assert float(R_err) < 0.1 and float(t_err) < 0.01

    def test_zero_weight_edge_ignored(self, rng):
        graph, _ = self.make_chain(rng, drift=0.01)
        # corrupt the loop closure but zero its weight
        bad = graph.measurements.at[-1].set(jnp.eye(4))
        g_bad = graph._replace(measurements=bad, weights=graph.weights.at[-1].set(0.0))
        poses, costs = optimize_pose_graph(g_bad, iters=8)
        assert float(costs[-1]) < float(costs[0]) * 1e-2


class TestDistributedBA:
    def test_sharded_matches_single_chip(self, rng):
        """8-way observation-sharded BA must match the single-chip solver."""
        from featurematching_tpu.parallel.mesh import make_mesh
        from featurematching_tpu.sfm.distributed import bundle_adjust_sharded

        assert jax.device_count() >= 8
        mesh = make_mesh(n_data=8)
        problem, poses_gt, _ = synthetic_ba_problem(rng, Nc=3, Np=40, pose_noise=0.03)
        res_single = bundle_adjust(problem, iters=8)
        res_shard = bundle_adjust_sharded(problem, mesh, iters=8)
        np.testing.assert_allclose(
            np.asarray(res_shard.poses), np.asarray(res_single.poses), atol=2e-4
        )
        costs = np.asarray(res_shard.cost_history)
        assert costs[-1] < costs[0] * 1e-2


class TestPipeline:
    def test_two_view_reconstruction(self, rng):
        from tests.test_geometry import make_two_view_scene
        from featurematching_tpu.sfm.pipeline import two_view_reconstruction

        T_gt, x0, x1 = make_two_view_scene(rng, 256, noise=1e-4)
        K = np.eye(3, dtype=np.float32)  # already-normalized coords
        mask = np.ones(256, bool)
        T_rel, points, good, n_inl = two_view_reconstruction(
            jnp.asarray(x0, jnp.float32), jnp.asarray(x1, jnp.float32),
            jnp.asarray(mask), jnp.asarray(K), jnp.asarray(K),
            jax.random.PRNGKey(0), pixel_thr=3e-3 * 1.0, num_hypotheses=256,
        )
        assert int(n_inl) > 200
        R_err, _ = relative_pose_error(
            jnp.asarray(T_gt, jnp.float32), T_rel[:3, :3], T_rel[:3, 3]
        )
        assert float(R_err) < 1.0
        t_gt = T_gt[:3, 3] / np.linalg.norm(T_gt[:3, 3])
        cos = abs(float(np.dot(np.asarray(T_rel[:3, 3]), t_gt))) / max(
            float(jnp.linalg.norm(T_rel[:3, 3])), 1e-9
        )
        assert cos > 0.98

    def test_sequence_ate(self, rng):
        """Synthetic odometry with a perfect matcher oracle: ATE after
        alignment should be small."""
        from tests.test_geometry import make_viewing_pose
        from featurematching_tpu.sfm.pipeline import Trajectory, ate_rmse, run_sequence

        # build a camera trajectory and a dense point cloud
        n_frames = 5
        poses = [np.eye(4)]
        for _ in range(n_frames - 1):
            step = make_viewing_pose(rng, rot_scale=0.05, t_scale=0.3)
            poses.append(step @ poses[-1])
        poses = np.stack(poses).astype(np.float32)
        X = rng.standard_normal((400, 3)) * [3, 3, 2] + [0, 0, 10.0]

        def project(T):
            Xc = X @ T[:3, :3].T + T[:3, 3]
            return Xc[:, :2] / Xc[:, 2:3], Xc[:, 2] > 0.5

        def matcher_fn(i0, i1):
            # frames are just indices; oracle returns projected correspondences
            p0, v0 = project(poses[i0])
            p1, v1 = project(poses[i1])
            m = v0 & v1
            return p0.astype(np.float32), p1.astype(np.float32), m

        frames = list(range(n_frames))
        traj = run_sequence(matcher_fn, frames, np.eye(3), pixel_thr=3e-3)
        assert traj.valid.all()
        err = ate_rmse(traj.poses, poses)
        # unit-scale steps vs true scale: alignment has one global scale, and
        # per-step scale errors remain — accept a loose bound, the real check
        # is that the trajectory shape is recovered (not degenerate)
        assert np.isfinite(err)
        spread = np.linalg.norm(traj.poses[:, :3, 3], axis=1)
        assert (spread[1:] > 1e-3).all()


class TestWindowedSequence:
    def _make_sequence(self, rng, step_norms, rot_scale=0.04):
        """GT trajectory with deliberately VARYING step lengths + point cloud."""
        from tests.test_geometry import make_viewing_pose

        poses = [np.eye(4)]
        for s in step_norms:
            step = make_viewing_pose(rng, rot_scale=rot_scale, t_scale=1.0)
            step[:3, 3] *= s / np.linalg.norm(step[:3, 3])
            poses.append(step @ poses[-1])
        poses = np.stack(poses).astype(np.float64)
        X = rng.standard_normal((400, 3)) * [3.0, 3.0, 2.0] + [0, 0, 12.0]
        return poses, X

    def test_windowed_beats_chained_on_varying_scale(self, rng):
        """The whole point of scale propagation + windowed BA: when true step
        lengths vary, unit-norm two-view chaining distorts the trajectory in a
        way one global Sim(3) alignment cannot undo; the windowed pipeline
        resolves each step's scale against the map and should get close to GT."""
        from featurematching_tpu.sfm.pipeline import ate_rmse, run_sequence
        from featurematching_tpu.sfm.windowed import run_sequence_windowed

        # strongly varying step lengths (4x spread)
        step_norms = [0.12, 0.48, 0.15, 0.50, 0.20]
        gt_poses, X = self._make_sequence(rng, step_norms)
        K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1]])

        def project(T):
            Xc = X @ T[:3, :3].T + T[:3, 3]
            uv = (Xc[:, :2] / Xc[:, 2:3]) * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
            return uv, Xc[:, 2] > 0.5

        def matcher_fn(i0, i1):
            p0, v0 = project(gt_poses[i0])
            p1, v1 = project(gt_poses[i1])
            return p0.astype(np.float32), p1.astype(np.float32), v0 & v1

        frames = list(range(len(gt_poses)))
        traj_chain = run_sequence(matcher_fn, frames, K.astype(np.float32))
        traj_win = run_sequence_windowed(
            matcher_fn, frames, K.astype(np.float32), window=4
        )
        assert traj_win.valid.all()

        err_chain = ate_rmse(traj_chain.poses, gt_poses.astype(np.float32))
        err_win = ate_rmse(traj_win.poses, gt_poses.astype(np.float32))
        # windowed must clearly beat chaining AND be accurate in absolute
        # terms (scene scale ~0.3/step; GT projections are noise-free)
        assert err_win < err_chain, (err_win, err_chain)
        assert err_win < 0.05, err_win

    def test_full_returns_map_state(self, rng):
        """run_sequence_windowed_full must expose tracks + per-frame pixel
        tables covering BOTH sides of each pair (loop closure links by them)."""
        from featurematching_tpu.sfm.windowed import run_sequence_windowed_full

        gt_poses, X = self._make_sequence(rng, [0.2, 0.3, 0.25])
        K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1]])

        def project(T):
            Xc = X @ T[:3, :3].T + T[:3, 3]
            uv = (Xc[:, :2] / Xc[:, 2:3]) * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
            return uv, Xc[:, 2] > 0.5

        def matcher_fn(i0, i1):
            p0, v0 = project(gt_poses[i0])
            p1, v1 = project(gt_poses[i1])
            return p0.astype(np.float32), p1.astype(np.float32), v0 & v1

        odo = run_sequence_windowed_full(
            matcher_fn, list(range(len(gt_poses))), K.astype(np.float32), window=4
        )
        assert odo.trajectory.valid.all()
        assert len(odo.tracks) > 100
        assert len(odo.frame_tables) == len(gt_poses)
        for t in odo.frame_tables:  # every frame participates in some pair
            assert len(t) > 50

    def test_windowed_handles_tracking_failure(self, rng):
        """A pair with no matches must not crash: pose repeats, valid=False,
        and the map/link state resets cleanly."""
        from featurematching_tpu.sfm.windowed import run_sequence_windowed

        gt_poses, X = self._make_sequence(rng, [0.2, 0.3, 0.25, 0.3])
        K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1]])

        def project(T):
            Xc = X @ T[:3, :3].T + T[:3, 3]
            uv = (Xc[:, :2] / Xc[:, 2:3]) * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
            return uv, Xc[:, 2] > 0.5

        def matcher_fn(i0, i1):
            if i0 == 1:  # simulate a dropout on the second pair
                z = np.zeros((400, 2), np.float32)
                return z, z, np.zeros(400, bool)
            p0, v0 = project(gt_poses[i0])
            p1, v1 = project(gt_poses[i1])
            return p0.astype(np.float32), p1.astype(np.float32), v0 & v1

        traj = run_sequence_windowed(
            matcher_fn, list(range(len(gt_poses))), K.astype(np.float32), window=4
        )
        assert not traj.valid[2]
        assert traj.valid[[0, 1, 3, 4]].all()
        # pose repeated at the failed step (up to later in-window BA float noise)
        np.testing.assert_allclose(traj.poses[2], traj.poses[1], atol=1e-4)


class TestLoopClosure:
    """Retrieval + verification + pose-graph correction on a synthetic loop."""

    def _make_loop_scene(self, rng, n_frames=12, radius=4.0):
        """Camera circles a point cloud, ending back near the start."""
        X = rng.standard_normal((400, 3)) * [2.0, 2.0, 2.0]
        poses = []
        for i in range(n_frames):
            # close the circle: the last frame nearly repeats frame 0
            ang = 2 * np.pi * i / n_frames
            C = np.array([radius * np.sin(ang), 0.1 * np.sin(2 * ang),
                          -radius * np.cos(ang)])
            # look at the origin: camera z-axis toward -C
            z = -C / np.linalg.norm(C)
            up = np.array([0.0, 1.0, 0.0])
            x = np.cross(up, z)
            x /= np.linalg.norm(x)
            y = np.cross(z, x)
            R_wc = np.stack([x, y, z])  # rows = camera axes in world
            t = -R_wc @ C
            T = np.eye(4)
            T[:3, :3] = R_wc
            T[:3, 3] = t
            poses.append(T)
        return np.stack(poses), X

    def _oracle(self, gt_poses, X, K, rng, noise_px=0.6):
        def project(T):
            Xc = X @ T[:3, :3].T + T[:3, 3]
            uv = (Xc[:, :2] / Xc[:, 2:3]) * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
            return uv, Xc[:, 2] > 0.5

        def matcher_fn(i0, i1):
            p0, v0 = project(gt_poses[i0])
            p1, v1 = project(gt_poses[i1])
            p0 = p0 + rng.standard_normal(p0.shape) * noise_px
            p1 = p1 + rng.standard_normal(p1.shape) * noise_px
            inb = lambda p: (np.abs(p[:, 0] - 320) < 320) & (np.abs(p[:, 1] - 240) < 240)
            m = v0 & v1 & inb(p0) & inb(p1)
            return p0.astype(np.float32), p1.astype(np.float32), m

        def descriptor_fn(i):
            # view-dependent occupancy descriptor: where the cloud projects
            uv, v = project(gt_poses[i])
            gx = np.clip((uv[:, 0] / 640 * 8).astype(int), 0, 7)
            gy = np.clip((uv[:, 1] / 480 * 8).astype(int), 0, 7)
            h = np.zeros((8, 8), np.float32)
            np.add.at(h, (gy[v], gx[v]), 1.0)
            h = h.reshape(-1)
            h -= h.mean()
            return h / max(np.linalg.norm(h), 1e-9)

        return matcher_fn, descriptor_fn

    def test_detector_gap_and_threshold(self):
        from featurematching_tpu.sfm.loop_closure import LoopDetector

        det = LoopDetector(min_gap=3, sim_thresh=0.9, topk=2)
        d = np.zeros(4)
        d[0] = 1.0
        for i in range(4):
            assert det.query(d, i) == []  # nothing far enough in the past yet
            det.add(d if i == 0 else np.array([0, 1.0, 0, 0]))
        # frame 4 vs stored frame 0 (the only one >= min_gap back): matches d
        cands = det.query(d, 4)
        assert cands == [(0, 1.0)]
        # frame 4 searches frames [0, 1): the d-unlike frame 1 is excluded
        assert det.query(np.array([0, 1.0, 0, 0]), 4) == []
        # below threshold: orthogonal query finds nothing
        assert det.query(np.array([0, 0, 0, 1.0]), 4) == []

    def test_close_loops_no_edges_is_identity(self, rng):
        from featurematching_tpu.sfm.loop_closure import close_loops
        from featurematching_tpu.sfm.pipeline import Trajectory

        poses = np.stack([np.eye(4, dtype=np.float32)] * 3)
        traj = Trajectory(poses=poses, valid=np.ones(3, bool))
        out = close_loops(traj, [])
        np.testing.assert_array_equal(out.poses, traj.poses)

    def test_loop_closure_reduces_ate(self, rng):
        """End to end: noisy odometry drifts around the circle; retrieval must
        find the revisit, verification must accept it, and PGO must pull the
        trajectory back — measurably lower ATE than odometry alone."""
        from featurematching_tpu.sfm.loop_closure import run_sequence_loop_closed
        from featurematching_tpu.sfm.pipeline import ate_rmse
        from featurematching_tpu.sfm.windowed import run_sequence_windowed

        gt_poses, X = self._make_loop_scene(rng)
        K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1]])
        frames = list(range(len(gt_poses)))

        # identical noise sequences for the odometry-only and loop-closed runs
        matcher_a, desc_fn = self._oracle(gt_poses, X, K, np.random.default_rng(3))
        matcher_b, _ = self._oracle(gt_poses, X, K, np.random.default_rng(3))

        traj_odo = run_sequence_windowed(matcher_a, frames, K.astype(np.float32),
                                         window=4)
        traj_lc, edges = run_sequence_loop_closed(
            matcher_b, frames, K.astype(np.float32), descriptor_fn=desc_fn,
            window=4, min_gap=4, sim_thresh=0.8, topk=2, min_inliers=30,
        )
        assert edges, "no loop edge detected on a closed-loop trajectory"
        assert any(e.j - e.i >= 4 for e in edges)
        for e in edges:
            assert e.n_inliers >= 30

        err_odo = ate_rmse(traj_odo.poses, gt_poses.astype(np.float32))
        err_lc = ate_rmse(traj_lc.poses, gt_poses.astype(np.float32))
        assert err_lc < err_odo, (err_lc, err_odo)
