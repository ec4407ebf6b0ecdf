"""Training supervision from padded pseudo-GT keypoint pairs — pure functions.

Re-design of /root/reference/datasets/data_preprocessing.py (the np.unique
CPU round-trip dedup, :10-28) and network/utils/supervision_new.py. The
dataset supplies fixed-size padded arrays:

    gt_kp0, gt_kp1: [B, G, 2] full-resolution (x, y) pixel coords
    gt_mask:        [B, G]    validity (False = padding)

and supervision becomes three fixed-shape scatters/gathers:
  * conf_matrix_gt [B, L, S]: one-hot at (cell0, cell1) pairs
  * spv ids [B, G]: coarse cell indices feeding the fine stage
  * fine_mtx [B, L, 2]: per-coarse-cell target keypoint (scatter, last write
    wins — matching the reference's fine_mtx[lists] = fine_kp semantics,
    data_preprocessing.py:49-53)

Dedup note: the reference dedups pseudo-GT to one pair per kp1 coarse cell
via np.unique on CPU (and — likely a bug — never dedups kp0 cells:
data_preprocessing.py:17-25 runs unique on columns 2:4 twice). We dedup on
BOTH images' cells with an in-graph scatter-min first-occurrence mask.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class CoarseSupervision(NamedTuple):
    conf_matrix_gt: jnp.ndarray  # [B, L, S] float 0/1
    spv_i_ids: jnp.ndarray  # [B, G] int32
    spv_j_ids: jnp.ndarray  # [B, G] int32
    spv_mask: jnp.ndarray  # [B, G] bool
    fine_mtx_0: jnp.ndarray  # [B, L, 2]
    fine_mtx_1: jnp.ndarray  # [B, S, 2]


def _first_occurrence_mask(
    keys: jnp.ndarray, valid: jnp.ndarray, num_cells: int
) -> jnp.ndarray:
    """[B, G] keys in [0, num_cells) -> mask keeping the first occurrence of
    each key among valid rows. Fixed-shape replacement for
    np.unique(return_index=True).

    Implemented as a scatter-min of row positions into a [B, num_cells]
    buffer + one gather-back — the earlier argsort/inverse-argsort
    formulation lowered to TPU sorting-network while-loops costing ~1.5 ms
    of the 640x480 batch-4 train step (round-5 trace, while.7/8); the
    scatter-min is a few hundred descriptors. Semantics identical (stable
    sort first-occurrence == minimum original position)."""
    B, G = keys.shape
    pos = jnp.broadcast_to(jnp.arange(G, dtype=jnp.int32)[None], (B, G))
    p = jnp.where(valid, pos, jnp.int32(G))
    k = jnp.where(valid, keys.astype(jnp.int32), 0)
    buf = jnp.full((B, num_cells), jnp.int32(G))
    buf = buf.at[jnp.arange(B)[:, None], k].min(p)
    firstpos = jnp.take_along_axis(buf, k, axis=1)
    return valid & (firstpos == pos)


def dedup_by_cells(
    cell_i: jnp.ndarray,
    cell_j: jnp.ndarray,
    valid: jnp.ndarray,
    num_cells_i: int,
    num_cells_j: int,
) -> jnp.ndarray:
    """Keep one GT pair per image1 cell AND per image0 cell (first
    occurrence). Replaces remove_overlap_kps (data_preprocessing.py:10-28)."""
    keep_j = _first_occurrence_mask(cell_j, valid, num_cells_j)
    keep_i = _first_occurrence_mask(cell_i, valid & keep_j, num_cells_i)
    return keep_i & keep_j & valid


def compute_supervision_coarse(
    gt_kp0: jnp.ndarray,
    gt_kp1: jnp.ndarray,
    gt_mask: jnp.ndarray,
    grid0: Tuple[int, int],
    grid1: Tuple[int, int],
    coarse_scale: int = 8,
) -> CoarseSupervision:
    """Build coarse + fine supervision targets (supervision_new.py:13-47).

    Padding rows scatter into a dump cell that is immediately zeroed, so they
    never contaminate the targets.
    """
    B, G, _ = gt_kp0.shape
    h0, w0 = grid0
    h1, w1 = grid1
    L, S = h0 * w0, h1 * w1

    cell0 = (gt_kp0 // coarse_scale).astype(jnp.int32)  # [B, G, 2] (x, y)
    cell1 = (gt_kp1 // coarse_scale).astype(jnp.int32)
    i_ids = cell0[..., 0] + cell0[..., 1] * w0  # [B, G]
    j_ids = cell1[..., 0] + cell1[..., 1] * w1
    in_grid = (
        (i_ids >= 0) & (i_ids < L) & (j_ids >= 0) & (j_ids < S) & gt_mask
    )
    keep = dedup_by_cells(i_ids, j_ids, in_grid, L, S)

    i_safe = jnp.where(keep, i_ids, 0)
    j_safe = jnp.where(keep, j_ids, 0)

    # one-hot conf matrix via scatter of flattened (i*S + j)
    flat = i_safe * S + j_safe  # [B, G]
    conf_gt = jnp.zeros((B, L * S), jnp.float32)
    conf_gt = conf_gt.at[jnp.arange(B)[:, None], flat].max(
        keep.astype(jnp.float32)
    )
    conf_gt = conf_gt.reshape(B, L, S)

    # per-cell fine keypoint targets (full-res pixel coords)
    fkp0 = jnp.where(keep[..., None], gt_kp0.astype(jnp.float32), 0.0)
    fkp1 = jnp.where(keep[..., None], gt_kp1.astype(jnp.float32), 0.0)
    fine_mtx_0 = jnp.zeros((B, L, 2), jnp.float32)
    fine_mtx_0 = fine_mtx_0.at[jnp.arange(B)[:, None], i_safe].set(fkp0)
    fine_mtx_1 = jnp.zeros((B, S, 2), jnp.float32)
    fine_mtx_1 = fine_mtx_1.at[jnp.arange(B)[:, None], j_safe].set(fkp1)
    # padding rows wrote into cell 0 — clear it unless cell 0 is a real target
    cell0_real_0 = jnp.any((i_safe == 0) & keep, axis=1)
    cell0_real_1 = jnp.any((j_safe == 0) & keep, axis=1)
    fine_mtx_0 = fine_mtx_0.at[:, 0].multiply(cell0_real_0[:, None].astype(jnp.float32))
    fine_mtx_1 = fine_mtx_1.at[:, 0].multiply(cell0_real_1[:, None].astype(jnp.float32))

    return CoarseSupervision(
        conf_matrix_gt=conf_gt,
        spv_i_ids=i_safe,
        spv_j_ids=j_safe,
        spv_mask=keep,
        fine_mtx_0=fine_mtx_0,
        fine_mtx_1=fine_mtx_1,
    )


def compute_supervision_fine(
    fine_mtx_0: jnp.ndarray,
    fine_mtx_1: jnp.ndarray,
    i_ids: jnp.ndarray,
    j_ids: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather fine GT at the ids used by the fine stage
    (supervision_new.py:49-58). Returns (expec_f_gt_0, expec_f_gt_1) [B, G, 2]."""
    g0 = jnp.take_along_axis(fine_mtx_0, i_ids[..., None], axis=1)
    g1 = jnp.take_along_axis(fine_mtx_1, j_ids[..., None], axis=1)
    return g0, g1
