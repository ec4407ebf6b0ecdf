"""Legacy-variant tests: training-id mixing, original fine matcher, geometric
supervision."""

import jax
import jax.numpy as jnp
import numpy as np

from featurematching_tpu.matching.legacy import (
    compute_supervision_coarse_geometric,
    fine_match_legacy,
    sample_coarse_training_ids,
)


class TestTrainingIdSampling:
    def test_mix_capacities_and_masks(self, rng):
        B, K, G, OUT = 2, 16, 32, 24
        pred_i = jnp.asarray(rng.integers(0, 100, (B, K)))
        pred_j = jnp.asarray(rng.integers(0, 100, (B, K)))
        pred_mask = jnp.asarray(rng.random((B, K)) < 0.5)
        spv_i = jnp.asarray(rng.integers(0, 100, (B, G)))
        spv_j = jnp.asarray(rng.integers(0, 100, (B, G)))
        spv_mask = jnp.asarray(np.ones((B, G), bool))
        i_ids, j_ids, mask, is_gt = sample_coarse_training_ids(
            pred_i, pred_j, pred_mask, spv_i, spv_j, spv_mask,
            jax.random.PRNGKey(0), num_out=OUT,
            train_coarse_percent=0.5, train_pad_num_gt_min=8,
        )
        assert i_ids.shape == (B, OUT)
        # pred slots (first 12) carry only valid predictions
        gt_part = np.asarray(is_gt)
        assert gt_part[:, -8:].all()  # at least the min-gt tail is GT
        # gt-sampled ids must come from the spv tables
        gi = np.asarray(i_ids)[np.asarray(is_gt, bool)]
        assert np.isin(gi, np.asarray(spv_i)).all()

    def test_no_valid_predictions_all_gt_padded(self, rng):
        B, K, G, OUT = 1, 8, 8, 16
        pred_mask = jnp.zeros((B, K), bool)
        spv_mask = jnp.ones((B, G), bool)
        z = jnp.zeros((B, K), jnp.int32)
        s = jnp.asarray(rng.integers(0, 50, (B, G)))
        i_ids, j_ids, mask, is_gt = sample_coarse_training_ids(
            z, z, pred_mask, s, s, spv_mask, jax.random.PRNGKey(1), OUT
        )
        m = np.asarray(mask)
        g = np.asarray(is_gt, bool)
        assert m[g].all()  # all GT rows valid
        assert not m[~g].any()  # no phantom predicted rows


class TestFineLegacy:
    def test_center_peak_zero_offset(self, rng):
        B, K, W, C = 1, 4, 5, 8
        ww = W * W
        center = ww // 2

        def unit(x):
            return x / np.linalg.norm(x, axis=-1, keepdims=True)

        feat1 = unit(rng.standard_normal((B, K, ww, C))).astype(np.float32)
        feat0 = np.zeros_like(feat1)
        feat0[:, :, center] = feat1[:, :, center] * 50  # strong center match
        mk0 = np.zeros((B, K, 2), np.float32)
        mk1 = np.zeros((B, K, 2), np.float32)
        m0, m1, std = fine_match_legacy(
            jnp.asarray(feat0), jnp.asarray(feat1), jnp.asarray(mk0),
            jnp.asarray(mk1), W, 2.0,
        )
        np.testing.assert_allclose(np.asarray(m0), mk0)  # mkpts0 untouched
        np.testing.assert_allclose(
            np.asarray(m1), np.full((B, K, 2), W // 2), atol=0.5
        )


class TestGeometricSupervision:
    def test_identity_pose_diagonal(self):
        """Identity transform + fronto-parallel plane: each cell maps to
        itself."""
        B, H, W = 1, 32, 32
        sc = 8
        K = jnp.asarray([[[8.0, 0, 16], [0, 8.0, 16], [0, 0, 1]]])
        # scene points = backprojection of pixel centers at depth 8 => u = x
        ys, xs = np.mgrid[0:H, 0:W]
        Z = 8.0
        X = (xs - 16) / 8.0 * Z
        Y = (ys - 16) / 8.0 * Z
        scene = np.stack([X, Y, np.full_like(X, Z)], -1)[None].astype(np.float32)
        T = jnp.eye(4)[None]
        conf = compute_supervision_coarse_geometric(
            jnp.asarray(scene), T, K, (4, 4), (4, 4), sc
        )
        conf = np.asarray(conf[0])
        np.testing.assert_allclose(conf, np.eye(16), atol=1e-6)

    def test_unknown_points_excluded(self):
        B, H, W = 1, 16, 16
        scene = np.zeros((B, H, W, 3), np.float32)  # all unknown
        K = jnp.asarray([[[8.0, 0, 8], [0, 8.0, 8], [0, 0, 1]]])
        conf = compute_supervision_coarse_geometric(
            jnp.asarray(scene), jnp.eye(4)[None], K, (2, 2), (2, 2), 8
        )
        assert float(conf.sum()) == 0.0
