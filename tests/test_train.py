"""Supervision, loss, and train-step tests — including the sharded DP path on
the 8-device virtual CPU mesh (SURVEY.md §4 (b): fake multi-chip backend)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from featurematching_tpu.config import tiny_test_config
from featurematching_tpu.data.synthetic import synthetic_batch
from featurematching_tpu.losses.loss import (
    compute_coarse_loss,
    compute_fine_loss,
    total_loss,
)
from featurematching_tpu.matching.supervision import (
    compute_supervision_coarse,
    compute_supervision_fine,
    dedup_by_cells,
)
from featurematching_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from featurematching_tpu.train.optimizer import build_lr_schedule, build_optimizer
from featurematching_tpu.train.step import (
    create_train_state,
    make_eval_step,
    make_train_step,
)


def tiny_batch(rng, B=2, H=64, W=96, G=64):
    return jax.tree.map(
        jnp.asarray,
        synthetic_batch(rng, batch_size=B, image_size=(H, W), channels=1, num_gt=G),
    )


class TestSupervision:
    def test_conf_gt_one_hot_positions(self):
        gt0 = jnp.asarray([[[8.0, 16.0], [24.0, 8.0]]])  # cells (1,2)->i=..., etc
        gt1 = jnp.asarray([[[16.0, 8.0], [8.0, 24.0]]])
        mask = jnp.asarray([[True, True]])
        sup = compute_supervision_coarse(gt0, gt1, mask, (4, 4), (4, 4), 8)
        conf = np.asarray(sup.conf_matrix_gt[0])
        # kp (8,16) -> cell (1,2) -> i = 1 + 2*4 = 9 ; kp1 (16,8) -> (2,1) -> j=6
        # kp (24,8) -> cell (3,1) -> i = 3 + 1*4 = 7 ; kp1 (8,24) -> (1,3) -> j=13
        assert conf[9, 6] == 1 and conf[7, 13] == 1
        assert conf.sum() == 2

    def test_padding_rows_do_not_pollute(self):
        gt0 = jnp.asarray([[[8.0, 16.0], [999.0, 999.0]]])
        gt1 = jnp.asarray([[[16.0, 8.0], [999.0, 999.0]]])
        mask = jnp.asarray([[True, False]])
        sup = compute_supervision_coarse(gt0, gt1, mask, (4, 4), (4, 4), 8)
        assert float(sup.conf_matrix_gt.sum()) == 1
        assert int(sup.spv_mask.sum()) == 1
        # fine_mtx cell 0 must stay zero (padding dump cell)
        np.testing.assert_allclose(np.asarray(sup.fine_mtx_0[0, 0]), [0, 0])

    def test_dedup_keeps_one_per_cell(self):
        ci = jnp.asarray([[3, 3, 5, 7]])
        cj = jnp.asarray([[2, 2, 9, 9]])
        valid = jnp.ones((1, 4), bool)
        keep = np.asarray(dedup_by_cells(ci, cj, valid, 16, 16)[0])
        assert keep.sum() == 2  # (3,2) once, (5,9)/(7,9) share j-cell -> one
        assert keep[2] ^ keep[3]

    def test_fine_supervision_gather(self):
        fm0 = jnp.arange(32, dtype=jnp.float32).reshape(1, 16, 2)
        fm1 = fm0 + 100
        g0, g1 = compute_supervision_fine(fm0, fm1, jnp.asarray([[3, 5]]), jnp.asarray([[2, 7]]))
        np.testing.assert_allclose(np.asarray(g0[0, 0]), [6, 7])
        np.testing.assert_allclose(np.asarray(g1[0, 1]), [114, 115])

    def test_supervision_matches_dataset_scale(self, rng):
        """End-to-end: synthetic GT keypoints land on consistent cells."""
        batch = tiny_batch(rng)
        sup = compute_supervision_coarse(
            batch["gt_kp0"], batch["gt_kp1"], batch["gt_mask"], (8, 12), (8, 12), 8
        )
        n_pos = float(sup.conf_matrix_gt.sum())
        assert n_pos > 10  # plenty of unique cells
        assert n_pos == float(sup.spv_mask.sum())


class TestLosses:
    def test_coarse_focal_perfect_prediction_small(self):
        cfg = tiny_test_config().model.loss
        gt = jnp.zeros((1, 8, 8)).at[0, 2, 3].set(1.0)
        good = jnp.full((1, 8, 8), 0.01).at[0, 2, 3].set(0.99)
        bad = jnp.full((1, 8, 8), 0.01).at[0, 2, 3].set(0.02)
        assert float(compute_coarse_loss(good, gt, cfg)) < float(
            compute_coarse_loss(bad, gt, cfg)
        )

    def test_coarse_dense_vs_sparse(self):
        cfg = tiny_test_config().model.loss
        dense_cfg = dataclasses.replace(cfg, sparse_spvs=False)
        gt = jnp.zeros((1, 8, 8)).at[0, 2, 3].set(1.0)
        conf = jnp.full((1, 8, 8), 0.5)
        sparse = float(compute_coarse_loss(conf, gt, cfg))
        dense = float(compute_coarse_loss(conf, gt, dense_cfg))
        assert dense > sparse  # dense adds the negative term

    def test_fine_loss_zero_when_exact(self):
        gt = jnp.asarray([[[10.0, 20.0], [30.0, 40.0]]])
        pred = jnp.concatenate([gt, jnp.full((1, 2, 1), 0.5)], -1)
        mask = jnp.ones((1, 2), bool)
        loss = compute_fine_loss(pred, pred, gt, gt, mask)
        assert float(loss) < 1e-10

    def test_fine_loss_ignores_masked(self):
        gt = jnp.asarray([[[10.0, 20.0], [30.0, 40.0]]])
        pred_bad = jnp.asarray([[[10.0, 20.0, 0.5], [999.0, 999.0, 0.5]]])
        mask_all = jnp.ones((1, 2), bool)
        mask_one = jnp.asarray([[True, False]])
        l_all = float(compute_fine_loss(pred_bad, pred_bad, gt, gt, mask_all))
        l_one = float(compute_fine_loss(pred_bad, pred_bad, gt, gt, mask_one))
        assert l_one < 1e-10 and l_all > 1.0


class TestOptimizer:
    def test_lr_schedule_warmup_and_decay(self):
        cfg = tiny_test_config().trainer.optimizer
        cfg = dataclasses.replace(cfg, warmup_steps=100, canonical_bs=64, canonical_lr=6e-3)
        sched = build_lr_schedule(cfg, global_batch_size=64, steps_per_epoch=1000)
        lr0 = float(sched(0))
        lr_mid = float(sched(50))
        lr_full = float(sched(100))
        assert lr0 < lr_mid < lr_full
        np.testing.assert_allclose(lr_full, 6e-3, rtol=1e-5)
        # after milestone 3 epochs -> halved
        lr_decayed = float(sched(3 * 1000 + 1))
        np.testing.assert_allclose(lr_decayed, 3e-3, rtol=1e-5)

    def test_lr_scaling_rule(self):
        cfg = tiny_test_config().trainer.optimizer
        cfg = dataclasses.replace(cfg, warmup_steps=0)
        sched = build_lr_schedule(cfg, global_batch_size=16, steps_per_epoch=100)
        np.testing.assert_allclose(float(sched(0)), 6e-3 * 16 / 64, rtol=1e-6)


class TestTrainStep:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = tiny_test_config()
        rng = np.random.default_rng(0)
        batch = tiny_batch(rng)
        tx = build_optimizer(cfg.trainer.optimizer, 2, 100)
        model, state = create_train_state(cfg, tx, jax.random.PRNGKey(0), batch)
        return cfg, model, state, batch

    def test_loss_decreases(self, setup):
        cfg, model, state, batch = setup
        step = jax.jit(make_train_step(model, cfg))
        losses = []
        for i in range(5):
            state, metrics = step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(metrics["loss"]))
            assert np.isfinite(losses[-1]), f"loss diverged at step {i}: {losses}"
        assert losses[-1] < losses[0], f"no learning signal: {losses}"

    def test_grad_norm_finite_and_clipped_state(self, setup):
        cfg, model, state, batch = setup
        step = jax.jit(make_train_step(model, cfg))
        _, metrics = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["grad_norm"]))

    def test_eval_step(self, setup):
        cfg, model, state, batch = setup
        ev = jax.jit(make_eval_step(model, cfg))
        out, losses = ev(state, batch)
        assert np.isfinite(float(losses.loss))
        # default config uses the conf-matrix-free sparse loss path
        assert out.conf_matrix is None

    @pytest.mark.slow

    def test_sharded_train_step_8_devices(self, setup):
        """The multi-chip path: batch sharded over an 8-device 'data' mesh,
        params replicated; GSPMD handles the gradient psum."""
        cfg, model, _, _ = setup
        assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
        mesh = make_mesh(n_data=8)
        rng = np.random.default_rng(1)
        batch = tiny_batch(rng, B=8)
        tx = build_optimizer(cfg.trainer.optimizer, 8, 100)
        model, state = create_train_state(cfg, tx, jax.random.PRNGKey(0), batch)
        state = replicate(state, mesh)
        sbatch = shard_batch(batch, mesh)
        step = jax.jit(make_train_step(model, cfg))
        state2, metrics = step(state, sbatch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))

        # sharded result must equal the unsharded result (same math)
        state_r, metrics_r = step(state, jax.tree.map(jnp.asarray, batch), jax.random.PRNGKey(0))
        np.testing.assert_allclose(
            float(metrics["loss"]), float(metrics_r["loss"]), rtol=1e-4
        )


class TestPoseHeadTraining:
    @pytest.mark.slow
    def test_train_step_with_pose_head(self, rng):
        """Training with the quaternion pose head: pose loss recorded (not
        added to total, matching reference loss.py:169)."""
        cfg = tiny_test_config()
        pose_cfg = dataclasses.replace(
            cfg.model.pose, flag="new", d_model=16, nhead=2,
            layer_names_new=("cross", "cross"),
        )
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, pose=pose_cfg))
        batch = tiny_batch(rng)
        tx = build_optimizer(cfg.trainer.optimizer, 2, 100)
        model, state = create_train_state(cfg, tx, jax.random.PRNGKey(0), batch)
        step = jax.jit(make_train_step(model, cfg))
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))

    @pytest.mark.slow

    def test_old_pose_head_metric(self, rng):
        cfg = tiny_test_config()
        pose_cfg = dataclasses.replace(
            cfg.model.pose, flag="old", d_model=16, nhead=2,
            layer_names_old=("self", "cross"),
        )
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, pose=pose_cfg))
        batch = tiny_batch(rng)
        tx = build_optimizer(cfg.trainer.optimizer, 2, 100)
        model, state = create_train_state(cfg, tx, jax.random.PRNGKey(0), batch)
        from featurematching_tpu.train.step import make_eval_step
        ev = jax.jit(make_eval_step(model, cfg))
        out, losses = ev(state, batch)
        assert out.T_0to1_pred is not None
        assert np.isfinite(float(losses.loss_pose))


class TestRound5TrainPath:
    """uint8 wire format, the sparse-train match-extraction skip, and the
    fixed-mode pose loss (round-5 features)."""

    @pytest.fixture(scope="class")
    def setup(self):
        cfg = tiny_test_config()
        rng = np.random.default_rng(3)
        batch = tiny_batch(rng)
        tx = build_optimizer(cfg.trainer.optimizer, 2, 100)
        model, state = create_train_state(cfg, tx, jax.random.PRNGKey(0), batch)
        return cfg, model, state, batch

    def test_uint8_wire_format_matches_f32(self, setup):
        """A uint8 image batch must train identically to the SAME images fed
        as f32 (the step dequantizes on device; train/step.py round 5)."""
        cfg, model, state, batch = setup
        q = {
            k: (
                jnp.asarray(
                    np.clip(np.asarray(v) * 255.0, 0, 255).astype(np.uint8)
                )
                if k in ("image0", "image1")
                else v
            )
            for k, v in batch.items()
        }
        deq = dict(q)
        for k in ("image0", "image1"):
            deq[k] = q[k].astype(jnp.float32) / 255.0
        step = jax.jit(make_train_step(model, cfg))
        _, m_u8 = step(state, q, jax.random.PRNGKey(1))
        _, m_f32 = step(state, deq, jax.random.PRNGKey(1))
        # in-jit dequantize fuses differently than a pre-dequantized input;
        # the difference is f32 rounding order only
        assert float(m_u8["loss"]) == pytest.approx(float(m_f32["loss"]), rel=1e-5)

    def test_sparse_train_skips_match_extraction(self, setup):
        """With GT ids + the sparse loss, the train forward emits an EMPTY
        fixed-shape match list (extraction is dead weight, ~1.4 ms/step at
        the flagship point); eval still extracts real matches."""
        cfg, model, state, batch = setup
        assert cfg.model.loss.sparse_spvs  # precondition of the skip
        from featurematching_tpu.matching.supervision import (
            compute_supervision_coarse,
        )

        H, W = batch["image0"].shape[1:3]
        sc = cfg.model.resolution[0]
        grid = (H // sc, W // sc)
        sup = compute_supervision_coarse(
            batch["gt_kp0"], batch["gt_kp1"], batch["gt_mask"], grid, grid, sc
        )
        out, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["image0"], batch["image1"], train=True,
            gt_ids=(sup.spv_i_ids, sup.spv_j_ids, sup.spv_mask),
            want_conf_matrix=False, mutable=["batch_stats"],
        )
        assert not bool(np.asarray(out.coarse.mask).any())
        # fine ids are the GT ids, not the (empty) extracted matches
        np.testing.assert_array_equal(
            np.asarray(out.fine_ids[0]), np.asarray(sup.spv_i_ids)
        )

    def test_pose_loss_fixed_mode_invariances(self):
        """mode='fixed': translation loss is scale-free and quat loss is
        sign-invariant (two-view pose is scale-free; eval is angular)."""
        from featurematching_tpu.losses.loss import compute_pose_loss_new

        cfg = tiny_test_config()
        r = np.random.default_rng(1)
        q = jnp.asarray(r.normal(size=(2, 2, 4)), jnp.float32)
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        t = jnp.asarray(r.normal(size=(2, 2, 3)), jnp.float32)
        lc = cfg.model.loss
        perfect = compute_pose_loss_new(
            q, t, q[:, 0], q[:, 1], t[:, 0], t[:, 1], lc, mode="fixed"
        )
        scaled = compute_pose_loss_new(
            q, 5.0 * t, q[:, 0], q[:, 1], t[:, 0], t[:, 1], lc, mode="fixed"
        )
        negated = compute_pose_loss_new(
            -q, t, q[:, 0], q[:, 1], t[:, 0], t[:, 1], lc, mode="fixed"
        )
        for v in (perfect, scaled, negated):
            assert abs(float(v)) < 1e-5
        wrong = compute_pose_loss_new(
            jnp.roll(q, 1, axis=-1), t, q[:, 0], q[:, 1], t[:, 0], t[:, 1],
            lc, mode="fixed",
        )
        assert float(wrong) > 1e-3
