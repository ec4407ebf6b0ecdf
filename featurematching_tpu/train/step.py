"""The jit-able training/eval step — the TPU equivalent of the reference's
Lightning module (/root/reference/lightning_new.py:187-339).

The reference's `_trainval_inference` pipeline (lightning_new.py:216-230):
    data_preprocess -> compute_supervision_coarse -> matcher ->
    compute_supervision_fine -> loss
becomes ONE pure function over a fixed-shape batch pytree, differentiated and
pjit-sharded over a data-parallel mesh. Gradient all-reduce is implicit in
jit-of-sharded-batch (GSPMD inserts the psum), replacing PL's DDP/NCCL hooks.

Batch pytree (all arrays; see data/synthetic.py for a generator):
    image0, image1: [B, H, W, C]
    gt_kp0, gt_kp1: [B, G, 2] pseudo-GT keypoint pairs (full-res px)
    gt_mask:        [B, G]
    T_0to1, T_1to0: [B, 4, 4]   (pose heads / eval)
    K0, K1:         [B, 3, 3]
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from featurematching_tpu.config import Config
from featurematching_tpu.losses.loss import LossOutput, total_loss
from featurematching_tpu.matching.supervision import (
    compute_supervision_coarse,
    compute_supervision_fine,
)
from featurematching_tpu.models.matcher import Matcher


@flax.struct.dataclass
class FlatOptState:
    """Marker wrapper: the inner optax state lives on ONE flat f32 vector.

    The round-3 train-step trace showed ~600-800 tiny per-leaf fusions/step
    (adamw moments, weight decay, global-norm squares — one XLA fusion per
    param leaf, ~5-10 us fixed cost each, ~4-5 ms/step total). Adam/adamw/
    sgd/clip-by-global-norm are elementwise or whole-tree-uniform, so running
    them over the raveled parameter vector is NUMERICALLY IDENTICAL while
    lowering to a handful of large fusions."""

    inner: Any


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        if isinstance(self.opt_state, FlatOptState):
            from jax.flatten_util import ravel_pytree

            flat_g, _ = ravel_pytree(grads)
            flat_p, unravel = ravel_pytree(self.params)
            updates, new_inner = self.tx.update(
                flat_g, self.opt_state.inner, flat_p
            )
            new_params = unravel(flat_p + updates)
            new_opt_state = FlatOptState(inner=new_inner)
        else:
            updates, new_opt_state = self.tx.update(
                grads, self.opt_state, self.params
            )
            new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def make_opt_state(
    tx: optax.GradientTransformation, params, flat: bool = False
):
    """Optimizer state, optionally over the raveled param vector.

    flat=True is a MEASURED DEAD END on TPU (round 4): it does collapse the
    ~400 per-leaf adamw fusions into a handful of large ones (fusion bucket
    12.9 -> 11.8 ms/step), but every leaf's [a,b,c] -> [n] ravel and the
    unravel slices are tiled-layout relayout copies (reshape bucket
    2.8 -> 9.3 ms/step): 65.5 -> 72.2 ms/step net. Kept for the record and
    for non-TPU backends where reshapes are free."""
    if not flat:
        return tx.init(params)
    from jax.flatten_util import ravel_pytree

    return FlatOptState(inner=tx.init(ravel_pytree(params)[0]))


def create_train_state(
    cfg: Config,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    sample_batch: Dict[str, jnp.ndarray],
) -> Tuple[Matcher, TrainState]:
    model = Matcher(cfg.model)
    # jit the init: on tunnel-attached accelerators an un-jitted init runs
    # op-by-op through the relay (~minutes); jitted it is one program
    variables = jax.jit(model.init)(
        rng, sample_batch["image0"], sample_batch["image1"]
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = make_opt_state(tx, params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        tx=tx,
    )
    return model, state


def _forward_with_loss(
    model: Matcher,
    cfg: Config,
    params,
    batch_stats,
    batch: Dict[str, jnp.ndarray],
    droppath_rng: Optional[jax.Array],
    train: bool,
):
    H, W = batch["image0"].shape[1:3]
    sc = cfg.model.resolution[0]
    grid = (H // sc, W // sc)

    # uint8 wire format (round 5): images may cross host->device as bytes
    # (4x less interconnect traffic than f32 — the loaders/caches carry
    # whatever dtype the dataset emits); dequantize on device. Real SCARED/
    # EndoSLAM frames are 8-bit to begin with, so this is lossless for them.
    if batch["image0"].dtype == jnp.uint8:
        batch = dict(batch)
        batch["image0"] = batch["image0"].astype(jnp.float32) / 255.0
        batch["image1"] = batch["image1"].astype(jnp.float32) / 255.0

    # conf-matrix-free coarse loss (ops/sparse_focal_loss.py) whenever the
    # config allows it — removes the [B, L, S] materialization (B x 92 MB at
    # 640x480) from BOTH the forward and backward graphs
    use_sparse = (
        cfg.model.loss.sparse_spvs and cfg.model.loss.coarse_type == "focal"
    )

    sup = compute_supervision_coarse(
        batch["gt_kp0"], batch["gt_kp1"], batch["gt_mask"], grid, grid, sc
    )
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        rngs = {"droppath": droppath_rng} if droppath_rng is not None else {}
        out, mutated = model.apply(
            variables,
            batch["image0"],
            batch["image1"],
            train=True,
            gt_ids=(sup.spv_i_ids, sup.spv_j_ids, sup.spv_mask),
            want_conf_matrix=not use_sparse,
            mutable=["batch_stats"],
            rngs=rngs,
        )
    else:
        out = model.apply(
            variables,
            batch["image0"],
            batch["image1"],
            train=False,
            want_conf_matrix=not use_sparse,
        )
        mutated = {"batch_stats": batch_stats}

    fid_i, fid_j, fid_mask = out.fine_ids
    gt0, gt1 = compute_supervision_fine(sup.fine_mtx_0, sup.fine_mtx_1, fid_i, fid_j)

    # pose loss/metric when a pose head is enabled; mirrors loss.py:144-170
    # ('old' -> metric only; 'new' -> quat+trans loss, also NOT added to the
    # total, matching the reference's commented-out accumulation at :169)
    loss_pose = None
    flag = cfg.model.pose.flag
    if flag in ("new", "new_fixed") and out.quat_pred is not None:
        from featurematching_tpu.geometry.se3 import matrix_to_quat
        from featurematching_tpu.losses.loss import compute_pose_loss_new

        q01 = matrix_to_quat(batch["T_0to1"][:, :3, :3])
        q10 = matrix_to_quat(batch["T_1to0"][:, :3, :3])
        loss_pose = compute_pose_loss_new(
            out.quat_pred, out.trans_pred, q01, q10,
            batch["T_0to1"][:, :3, 3], batch["T_1to0"][:, :3, 3],
            cfg.model.loss,
            mode="fixed" if flag == "new_fixed" else "ref",
        )
    elif flag == "old" and out.T_0to1_pred is not None:
        from featurematching_tpu.losses.loss import compute_pose_metric_old

        loss_pose = compute_pose_metric_old(
            batch["T_0to1"], batch["T_1to0"],
            out.T_0to1_pred, out.T_1to0_pred, cfg.model.loss,
        )

    loss_c_override = None
    if use_sparse:
        from featurematching_tpu.ops.sparse_focal_loss import sparse_focal_loss

        C = out.feat_c0.shape[-1]
        inv_temp = 1.0 / (C * cfg.model.match_coarse.dsmax_temperature)
        loss_c_override = cfg.model.loss.pos_weight * sparse_focal_loss(
            out.feat_c0, out.feat_c1, sup.spv_i_ids, sup.spv_j_ids,
            sup.spv_mask, inv_temp, cfg.model.loss.focal_alpha,
            cfg.model.loss.focal_gamma,
        )

    losses = total_loss(
        out.conf_matrix,
        sup.conf_matrix_gt if not use_sparse else None,
        out.fine.mkpts0_f,
        out.fine.mkpts1_f,
        gt0,
        gt1,
        fid_mask,
        cfg.model.loss,
        window=cfg.model.fine.window_size,
        loss_pose=loss_pose,
        loss_c_override=loss_c_override,
    )
    return losses, out, mutated.get("batch_stats", batch_stats)


def make_train_step(model: Matcher, cfg: Config) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, metrics). jit-able;
    shard `batch` over the mesh 'data' axis and GSPMD handles the rest."""

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        def loss_fn(params):
            losses, out, new_bs = _forward_with_loss(
                model, cfg, params, state.batch_stats, batch, rng, train=True
            )
            return losses.loss, (losses, new_bs)

        (loss, (losses, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads, new_bs)
        metrics = {
            "loss": losses.loss,
            "loss_c": losses.loss_c,
            "loss_f": losses.loss_f,
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    return train_step


def make_eval_step(model: Matcher, cfg: Config) -> Callable:
    """Returns eval_step(state, batch) -> (matcher_output, losses)."""

    def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        losses, out, _ = _forward_with_loss(
            model, cfg, state.params, state.batch_stats, batch, None, train=False
        )
        return out, losses

    return eval_step
