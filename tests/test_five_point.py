"""Nistér 5-point solver tests: exact recovery, degenerate handling, and
RANSAC-level parity against cv2.findEssentialMat(RANSAC) + recoverPose — the
reference's eval pose path (/root/reference/utils/metrics.py:79-109)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from featurematching_tpu.geometry.five_point import (
    _constraint_matrix,
    _durand_kerner,
    five_point_candidates,
)
from featurematching_tpu.geometry.ransac import estimate_essential_ransac


def _rand_pose(rng, rot_scale=0.3):
    w = rng.standard_normal(3) * rot_scale
    a = np.linalg.norm(w)
    ax = w / (a + 1e-12)
    K = np.array(
        [[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]], [-ax[1], ax[0], 0]]
    )
    R = np.eye(3) + np.sin(a) * K + (1 - np.cos(a)) * K @ K
    t = rng.standard_normal(3)
    t /= np.linalg.norm(t)
    return R, t


def _problem(rng, n, noise_px=0.0, outlier_frac=0.0, planar=False, f=500.0):
    R, t = _rand_pose(rng)
    if planar:
        X = np.concatenate(
            [rng.uniform(-2, 2, (n, 2)), np.full((n, 1), 5.0)], 1
        )
    else:
        X = np.concatenate(
            [rng.uniform(-2, 2, (n, 2)), rng.uniform(3, 10, (n, 1))], 1
        )
    p0 = X[:, :2] / X[:, 2:]
    X1 = X @ R.T + t
    p1 = X1[:, :2] / X1[:, 2:]
    p0 = p0 + rng.normal(0, noise_px / f, p0.shape)
    p1 = p1 + rng.normal(0, noise_px / f, p1.shape)
    n_out = int(n * outlier_frac)
    if n_out:
        p1[:n_out] = rng.uniform(-0.5, 0.5, (n_out, 2))
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = tx @ R
    return (
        p0.astype(np.float32),
        p1.astype(np.float32),
        R,
        t,
        E / np.linalg.norm(E),
    )


def _rot_err(R_est, R_gt):
    cos = (np.trace(np.asarray(R_est).T @ R_gt) - 1) / 2
    return np.rad2deg(np.abs(np.arccos(np.clip(cos, -1, 1))))


def _t_ang_err(t_est, t_gt):
    c = abs(
        np.dot(np.asarray(t_est), t_gt)
        / (np.linalg.norm(t_est) * np.linalg.norm(t_gt) + 1e-12)
    )
    return np.rad2deg(np.arccos(np.clip(c, -1, 1)))


class TestMinimalSolver:
    def test_constraint_matrix_vanishes_on_essential(self, rng):
        """The 10x20 cubic system must vanish at any (x,y,z) whose E lies on
        the essential manifold — checked by plugging a true E's coordinates."""
        p0, p1, R, t, E_true = _problem(rng, 5)
        from featurematching_tpu.geometry.five_point import (
            _epipolar_rows,
            _monomials_and_grad,
        )

        A = np.asarray(_epipolar_rows(jnp.asarray(p0), jnp.asarray(p1)))
        _, _, Vt = np.linalg.svd(A, full_matrices=True)
        basis = Vt[5:9]
        coef, _, _, _ = np.linalg.lstsq(basis.T, E_true.reshape(9), rcond=None)
        x, y, z = (coef[:3] / coef[3]).astype(np.float32)
        Ep = jnp.moveaxis(jnp.asarray(basis.reshape(4, 3, 3)), 0, -1)[None]
        M = _constraint_matrix(Ep.astype(jnp.float32))
        m, _ = _monomials_and_grad(
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(z)
        )
        resid = np.asarray(jnp.einsum("ik,k->i", M[0], m))
        scale = float(np.abs(np.asarray(M[0])).max()) * max(
            1.0, abs(x), abs(y), abs(z)
        ) ** 3
        assert np.abs(resid).max() < 2e-4 * scale

    def test_durand_kerner_known_roots(self):
        """Aberth iteration recovers the roots of a known factorized poly."""
        roots = np.array([-25.0, -3.0, -1.5, -0.2, 0.1, 0.4, 2.0, 7.0, 30.0, 55.0])
        c = np.poly(roots)[::-1].astype(np.float32)  # ascending
        r, ok = _durand_kerner(jnp.asarray(c)[None])
        r = np.sort(np.real(np.asarray(r[0])))
        assert bool(ok[0])
        np.testing.assert_allclose(r, np.sort(roots), rtol=2e-3, atol=2e-3)

    @pytest.mark.slow

    def test_exact_recovery_rate(self, rng):
        """On exact correspondences the candidate set must contain the true E
        in the overwhelming majority of samples (float32; incl. planar)."""
        hits = 0
        trials = 30
        for k in range(trials):
            p0, p1, _, _, E_true = _problem(rng, 5, planar=(k % 3 == 0))
            E, valid = five_point_candidates(
                jnp.asarray(p0)[None], jnp.asarray(p1)[None]
            )
            E = np.asarray(E[0])
            valid = np.asarray(valid[0])
            errs = [
                min(
                    np.linalg.norm(E[i] - E_true),
                    np.linalg.norm(E[i] + E_true),
                )
                for i in range(10)
                if valid[i]
            ]
            hits += bool(errs) and min(errs) < 2e-2
        assert hits >= int(0.7 * trials), f"{hits}/{trials}"

    def test_batched_shapes(self, rng):
        p0 = rng.standard_normal((7, 5, 2)).astype(np.float32) * 0.3
        p1 = rng.standard_normal((7, 5, 2)).astype(np.float32) * 0.3
        E, valid = five_point_candidates(jnp.asarray(p0), jnp.asarray(p1))
        assert E.shape == (7, 10, 3, 3) and valid.shape == (7, 10)
        assert bool(jnp.all(jnp.isfinite(E)))

    def test_degenerate_all_same_point(self):
        """A fully degenerate sample must not produce NaNs; candidates are
        either masked invalid or harmless."""
        p = jnp.ones((1, 5, 2), jnp.float32) * 0.1
        E, valid = five_point_candidates(p, p)
        assert bool(jnp.all(jnp.isfinite(E)))


class TestRansacVsOpenCV:
    def _cv2_pose(self, p0, p1, thr):
        import cv2

        E, m = cv2.findEssentialMat(
            p0.astype(np.float64), p1.astype(np.float64), np.eye(3),
            cv2.RANSAC, 0.999, thr,
        )
        if E is None:
            return None
        best, bn = None, -1
        for Ek in np.split(E, len(E) // 3):
            nin, Rc, tc, _ = cv2.recoverPose(
                Ek, p0.astype(np.float64), p1.astype(np.float64), np.eye(3),
                mask=m.copy(),
            )
            if nin > bn:
                bn, best = nin, (Rc, tc[:, 0])
        return best

    @pytest.mark.slow
    @pytest.mark.parametrize(
        "n,noise_px,outliers,planar,trials",
        [
            (100, 1.0, 0.3, False, 20),
            (50, 0.5, 0.1, False, 20),
            (8, 0.5, 0.0, False, 20),
            (6, 0.1, 0.0, False, 20),
            (100, 1.0, 0.2, True, 20),
        ],
    )
    def test_pose_error_parity(self, rng, n, noise_px, outliers, planar, trials):
        """R/t errors statistically indistinguishable from (or better than)
        OpenCV across random problems, incl. low-N and planar-degenerate
        scenes (VERDICT round-1 item 3)."""
        ours_R, ours_t, cv_R, cv_t = [], [], [], []
        for trial in range(trials):
            p0, p1, R_gt, t_gt, _ = _problem(
                rng, n, noise_px=noise_px, outlier_frac=outliers, planar=planar
            )
            res = estimate_essential_ransac(
                jnp.asarray(p0), jnp.asarray(p1), jnp.ones(n, bool),
                jax.random.PRNGKey(trial), thresh=1.0 / 500,
                num_hypotheses=512,
            )
            ours_R.append(_rot_err(res.R, R_gt))
            ours_t.append(_t_ang_err(res.t, t_gt))
            cv = self._cv2_pose(p0, p1, 1.0 / 500)
            if cv is None:
                cv_R.append(180.0)
                cv_t.append(90.0)
            else:
                cv_R.append(_rot_err(cv[0], R_gt))
                cv_t.append(_t_ang_err(cv[1], t_gt))
        # medians within 1.5x of OpenCV (+0.3deg absolute floor)
        assert np.median(ours_R) <= 1.5 * np.median(cv_R) + 0.3, (
            np.median(ours_R), np.median(cv_R))
        assert np.median(ours_t) <= 1.5 * np.median(cv_t) + 1.0, (
            np.median(ours_t), np.median(cv_t))

    def test_low_n_five_points_only(self, rng):
        """N=5: below the 8-point minimum — only the 5-point path can solve.
        Five exact points leave up to 10 valid interpretations, so assert
        what they determine: a valid result whose E fits every point."""
        from featurematching_tpu.geometry.epipolar import sampson_distance

        p0, p1, R_gt, t_gt, _ = _problem(rng, 5, noise_px=0.0)
        res = estimate_essential_ransac(
            jnp.asarray(p0), jnp.asarray(p1), jnp.ones(5, bool),
            jax.random.PRNGKey(0), thresh=1.0 / 500, num_hypotheses=64,
        )
        assert bool(res.valid)
        assert int(res.num_inliers) == 5
        d = np.asarray(
            sampson_distance(jnp.asarray(p0), jnp.asarray(p1), res.E)
        )
        assert d.max() < (1.0 / 500) ** 2
