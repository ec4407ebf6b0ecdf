"""Legacy matching variants kept for capability parity with the reference.

1. `sample_coarse_training_ids` — the original LoFTR training-time scheme
   (reference network/utils/coarse_matching.py:114-141): the fine stage sees a
   mix of PREDICTED matches (up to train_coarse_percent of capacity) padded
   with randomly-sampled GT matches (at least train_pad_num_gt_min). The
   reference needed this to balance DDP loads; here it is a fixed-shape
   gather-with-masks that some training recipes still prefer over pure-GT
   sampling (supervision signal closer to inference distribution).

2. `fine_match_legacy` — the original LoFTR fine matcher (reference
   network/utils/fine_matching.py:45-72): symmetric per-window correlation of
   the CENTER feature of window0 against all of window1, one heatmap, refines
   only mkpts1 (mkpts0 stays at the coarse center).

3. `compute_supervision_coarse_geometric` — true geometric supervision from
   dense scene-point images instead of keypoint pseudo-GT (reference
   network/utils/supervision.py:13-72): sample the 3D point under each coarse
   cell center, reproject with T_0to1/K1, mark the landing cell.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from featurematching_tpu.matching.fine import spatial_expectation


def sample_coarse_training_ids(
    pred_i: jnp.ndarray,
    pred_j: jnp.ndarray,
    pred_mask: jnp.ndarray,
    spv_i: jnp.ndarray,
    spv_j: jnp.ndarray,
    spv_mask: jnp.ndarray,
    key: jax.Array,
    num_out: int,
    train_coarse_percent: float = 0.4,
    train_pad_num_gt_min: int = 200,
):
    """Mix predicted and GT match ids into a fixed-size training set.

    All inputs [B, K]/[B, G]; returns (i_ids, j_ids, mask, is_gt) each
    [B, num_out]. Capacity split: at most round(num_out * percent) predicted
    rows (random subset of valid predictions), the rest GT rows (sampled with
    replacement like the reference's randint padding,
    coarse_matching.py:126-135).
    """
    B = pred_i.shape[0]
    n_pred_cap = min(
        int(num_out * train_coarse_percent), num_out - train_pad_num_gt_min
    )
    n_pred_cap = max(n_pred_cap, 0)
    n_gt = num_out - n_pred_cap

    k_pred, k_gt = jax.random.split(key)

    # choose up to n_pred_cap valid predictions per item (gumbel top-k on mask)
    g = jax.random.gumbel(k_pred, pred_mask.shape) + jnp.where(
        pred_mask, 0.0, -jnp.inf
    )
    _, sel = jax.lax.top_k(g, n_pred_cap)  # [B, n_pred_cap]
    pi = jnp.take_along_axis(pred_i, sel, axis=1)
    pj = jnp.take_along_axis(pred_j, sel, axis=1)
    pm = jnp.take_along_axis(pred_mask, sel, axis=1)

    # GT sample with replacement from valid spv rows
    G = spv_i.shape[1]
    probs = spv_mask.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(axis=1, keepdims=True), 1.0)
    idx = jax.vmap(
        lambda k, p: jax.random.choice(k, G, (n_gt,), replace=True, p=p)
    )(jax.random.split(k_gt, B), probs)
    gi = jnp.take_along_axis(spv_i, idx, axis=1)
    gj = jnp.take_along_axis(spv_j, idx, axis=1)
    gm = jnp.take_along_axis(spv_mask, idx, axis=1)

    i_ids = jnp.concatenate([pi, gi], axis=1)
    j_ids = jnp.concatenate([pj, gj], axis=1)
    mask = jnp.concatenate([pm, gm], axis=1)
    is_gt = jnp.concatenate(
        [jnp.zeros_like(pm), jnp.ones_like(gm)], axis=1
    )
    return i_ids, j_ids, mask, is_gt


def fine_match_legacy(
    feat0: jnp.ndarray,
    feat1: jnp.ndarray,
    mkpts0_c: jnp.ndarray,
    mkpts1_c: jnp.ndarray,
    window: int,
    img_to_fine_scale: float,
):
    """Original LoFTR fine matching (fine_matching.py:45-72).

    feat*: [B, K, WW, C] post-fine-transformer windows. The center feature of
    window0 correlates against window1; softmax heatmap -> soft-argmax; only
    mkpts1 is refined. Returns (mkpts0_f [B,K,2], mkpts1_f [B,K,2],
    std [B,K]).
    """
    B, K, WW, C = feat0.shape
    center = WW // 2
    f0c = feat0[:, :, center]  # [B, K, C]
    sim = jnp.einsum(
        "bkc,bkrc->bkr", f0c, feat1, preferred_element_type=jnp.float32
    )
    temp = 1.0 / (C**0.5)
    heat = jax.nn.softmax(temp * sim, axis=-1)
    coords, std = spatial_expectation(heat, window)
    half = window // 2
    mkpts1_f = mkpts1_c + coords * (half * img_to_fine_scale) + half
    return mkpts0_c, mkpts1_f, std


def compute_supervision_coarse_geometric(
    scene_img0: jnp.ndarray,
    T_0to1: jnp.ndarray,
    K1: jnp.ndarray,
    grid0: Tuple[int, int],
    grid1: Tuple[int, int],
    coarse_scale: int = 8,
):
    """Dense geometric supervision from scene-point images.

    scene_img0: [B, H, W, 3] per-pixel 3D points in cam0 frame (zeros =
    unknown). For each coarse cell center of image0, transform the 3D point by
    T_0to1, project with K1, and mark the landing coarse cell of image1.
    Returns conf_matrix_gt [B, L, S]. (Port of supervision.py:13-72's
    warp_with_grid path, vectorized over the coarse grid.)
    """
    B, H, W, _ = scene_img0.shape
    h0, w0 = grid0
    h1, w1 = grid1
    L, S = h0 * w0, h1 * w1

    ys = (jnp.arange(h0) * coarse_scale + coarse_scale // 2).astype(jnp.int32)
    xs = (jnp.arange(w0) * coarse_scale + coarse_scale // 2).astype(jnp.int32)
    pts3d = scene_img0[:, ys][:, :, xs]  # [B, h0, w0, 3]
    pts3d = pts3d.reshape(B, L, 3)
    known = jnp.any(pts3d != 0.0, axis=-1)  # [B, L]

    R = T_0to1[:, :3, :3]
    t = T_0to1[:, :3, 3]
    warped = jnp.einsum("bij,blj->bli", R, pts3d) + t[:, None, :]
    proj = jnp.einsum("bij,blj->bli", K1, warped)
    uv = proj[..., :2] / (proj[..., 2:3] + 1e-6)
    in_front = warped[..., 2] > 1e-6

    cell_x = (uv[..., 0] // coarse_scale).astype(jnp.int32)
    cell_y = (uv[..., 1] // coarse_scale).astype(jnp.int32)
    in_grid = (cell_x >= 0) & (cell_x < w1) & (cell_y >= 0) & (cell_y < h1)
    valid = known & in_front & in_grid
    j_ids = jnp.where(valid, cell_x + cell_y * w1, 0)

    conf_gt = jnp.zeros((B, L, S))
    conf_gt = conf_gt.at[
        jnp.arange(B)[:, None], jnp.arange(L)[None, :], j_ids
    ].max(valid.astype(jnp.float32))
    return conf_gt
