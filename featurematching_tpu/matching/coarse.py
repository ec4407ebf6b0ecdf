"""Coarse-level dual-softmax matching with fixed-shape top-K selection.

Re-design of /root/reference/network/utils/coarse_matching_new.py. The
reference materializes a [B, L, S] confidence matrix, thresholds, masks
borders, applies mutual-NN, then extracts a DYNAMIC match list with
`torch.where` (coarse_matching_new.py:109) — un-jittable and the root cause of
its DDP-deadlock workarounds (SURVEY.md §5 race-detection notes).

TPU design:
  * mutual-NN implies ≤1 match per row, so match extraction is a per-row
    argmax + mutuality check + top-K over L rows — never a top-K over L*S.
  * the output is a static [B, K] match list with a validity mask, so every
    downstream stage (fine refinement, RANSAC, losses) stays fixed-shape.
  * `dual_softmax_confidence` is the XLA reference path; a fused Pallas kernel
    (ops/pallas_dual_softmax.py) provides the same row-max/col-max statistics
    without materializing [L, S] when gradients are not needed.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class CoarseMatches(NamedTuple):
    """Static-capacity coarse match list.

    i_ids/j_ids: [B, K] flat coarse-grid indices into image0/image1 grids.
    mask: [B, K] validity (False = padding row).
    mconf: [B, K] dual-softmax confidence (0 where invalid).
    mkpts0_c/mkpts1_c: [B, K, 2] (x, y) pixel coords at full image resolution.
    """

    i_ids: jnp.ndarray
    j_ids: jnp.ndarray
    mask: jnp.ndarray
    mconf: jnp.ndarray
    mkpts0_c: jnp.ndarray
    mkpts1_c: jnp.ndarray


def dual_softmax_confidence(
    feat_c0: jnp.ndarray,
    feat_c1: jnp.ndarray,
    temperature: float = 0.1,
) -> jnp.ndarray:
    """conf = softmax_rows(sim) * softmax_cols(sim), sim = <f0, f1>/(C*T).

    Port of coarse_matching_new.py:64-68 (feats pre-scaled by 1/sqrt(C) each,
    so sim carries 1/C). fp32 output for a numerically stable loss.
    """
    C = feat_c0.shape[-1]
    sim = jnp.einsum(
        "blc,bsc->bls", feat_c0, feat_c1, preferred_element_type=jnp.float32
    ) / (C * temperature)
    return jax.nn.softmax(sim, axis=1) * jax.nn.softmax(sim, axis=2)


def border_mask_flat(
    hc: int, wc: int, border: int, dtype=jnp.bool_
) -> jnp.ndarray:
    """[hc*wc] mask, False within `border` cells of any image edge.

    Flat-grid equivalent of `mask_border` (coarse_matching_new.py:11-28); the
    reference masks the 5-D [B, H0, W0, H1, W1] view — with per-image masks
    m0[i] & m1[j] this factorizes exactly.
    """
    if border <= 0:
        return jnp.ones((hc * wc,), dtype=dtype)
    rows = jax.lax.broadcasted_iota(jnp.int32, (hc, wc), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (hc, wc), 1)
    ok = (
        (rows >= border)
        & (rows < hc - border)
        & (cols >= border)
        & (cols < wc - border)
    )
    return ok.reshape(-1).astype(dtype)


def extract_matches(
    conf: jnp.ndarray,
    grid0: Tuple[int, int],
    grid1: Tuple[int, int],
    thr: float = 0.2,
    border_rm: int = 2,
    max_matches: int = 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fixed-shape mutual-NN match extraction from a confidence matrix.

    Args:
      conf: [B, L, S] dual-softmax confidences.
      grid0/grid1: (hc, wc) coarse grid shapes with L = h0*w0, S = h1*w1.
    Returns:
      (i_ids, j_ids, mask, mconf), each [B, K] with K = max_matches, sorted by
      descending confidence.

    Equivalent to coarse_matching_new.py:98-110 under the fact that a mutual
    max lies at (i, rowargmax_i), reducing selection to O(L + S) per pair.
    """
    B, L, S = conf.shape
    h0, w0 = grid0
    h1, w1 = grid1
    assert h0 * w0 == L and h1 * w1 == S

    j_star = jnp.argmax(conf, axis=2)  # [B, L] best col per row
    i_star = jnp.argmax(conf, axis=1)  # [B, S] best row per col
    row_conf = jnp.take_along_axis(conf, j_star[:, :, None], axis=2)[..., 0]  # [B, L]

    rows = jnp.arange(L, dtype=j_star.dtype)[None, :]  # [B, L] broadcast
    mutual = jnp.take_along_axis(i_star, j_star, axis=1) == rows  # [B, L]

    ok0 = border_mask_flat(h0, w0, border_rm)[None, :]  # [1, L]
    ok1 = border_mask_flat(h1, w1, border_rm)  # [S]
    ok1_j = jnp.take(ok1, j_star)  # [B, L] via gather

    valid = mutual & (row_conf > thr) & ok0 & ok1_j  # [B, L]
    score = jnp.where(valid, row_conf, 0.0)

    k = min(max_matches, L)
    mconf, i_ids = jax.lax.top_k(score, k)  # [B, K]
    j_ids = jnp.take_along_axis(j_star, i_ids, axis=1)
    mask = mconf > 0.0
    if k < max_matches:  # pad up to static capacity
        pad = max_matches - k
        mconf = jnp.pad(mconf, ((0, 0), (0, pad)))
        i_ids = jnp.pad(i_ids, ((0, 0), (0, pad)))
        j_ids = jnp.pad(j_ids, ((0, 0), (0, pad)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    return i_ids, j_ids, mask, mconf


def extract_matches_from_stats(
    stats,
    grid0: Tuple[int, int],
    grid1: Tuple[int, int],
    thr: float = 0.2,
    border_rm: int = 2,
    max_matches: int = 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Match extraction from fused MatchStats (no [L, S] materialization).

    `stats` is an ops.pallas_dual_softmax.MatchStats. Selection math is
    identical to extract_matches: a mutual max at (i, j) requires
    col_argmax[row_argmax[i]] == i, the confidence at the mutual position is
    row_max[i], and border/threshold gating is per-row/per-column.
    """
    B, L = stats.row_max.shape
    S = stats.col_max.shape[1]
    h0, w0 = grid0
    h1, w1 = grid1
    assert h0 * w0 == L and h1 * w1 == S

    j_star = stats.row_argmax  # [B, L]
    rows = jnp.arange(L, dtype=j_star.dtype)[None, :]
    mutual = jnp.take_along_axis(stats.col_argmax, j_star, axis=1) == rows

    ok0 = border_mask_flat(h0, w0, border_rm)[None, :]
    ok1 = border_mask_flat(h1, w1, border_rm)
    ok1_j = jnp.take(ok1, j_star)

    valid = mutual & (stats.row_max > thr) & ok0 & ok1_j
    score = jnp.where(valid, stats.row_max, 0.0)

    k = min(max_matches, L)
    mconf, i_ids = jax.lax.top_k(score, k)
    j_ids = jnp.take_along_axis(j_star, i_ids, axis=1)
    mask = mconf > 0.0
    if k < max_matches:
        pad = max_matches - k
        mconf = jnp.pad(mconf, ((0, 0), (0, pad)))
        i_ids = jnp.pad(i_ids, ((0, 0), (0, pad)))
        j_ids = jnp.pad(j_ids, ((0, 0), (0, pad)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    return i_ids, j_ids, mask, mconf


def ids_to_keypoints(
    ids: jnp.ndarray, wc: int, scale: float
) -> jnp.ndarray:
    """Flat coarse ids [B, K] -> (x, y) pixel coords [B, K, 2].

    Reference: coarse_matching_new.py:129-134 (x = i % w, y = i // w, * scale).
    """
    x = (ids % wc).astype(jnp.float32) * scale
    y = (ids // wc).astype(jnp.float32) * scale
    return jnp.stack([x, y], axis=-1)


def coarse_match(
    feat_c0: jnp.ndarray,
    feat_c1: jnp.ndarray,
    grid0: Tuple[int, int],
    grid1: Tuple[int, int],
    img_to_coarse_scale: float,
    thr: float = 0.2,
    border_rm: int = 2,
    temperature: float = 0.1,
    max_matches: int = 1024,
    conf: Optional[jnp.ndarray] = None,
    impl: str = "auto",
    mesh=None,
    shard_axis: str = "model",
    batch_axis: Optional[str] = "data",
) -> Tuple[CoarseMatches, Optional[jnp.ndarray]]:
    """Full coarse stage: confidence + fixed-shape mutual-NN selection.

    Returns (matches, conf_matrix). Pass a precomputed `conf` to skip the
    einsum (used when the training loss already materialized it). When no
    conf matrix is given or needed, the fused Pallas stats path is used on
    TPU (`impl='auto'`) and conf_matrix comes back as None.

    `mesh`: a jax.sharding.Mesh with a >1-sized `shard_axis` switches the
    stats computation to the sequence-parallel S-sharded path
    (ops/sharded_matching) — the [L, S] correlation never exists on one chip
    (SURVEY.md §5 long-context notes). Selection math is unchanged.
    """
    if conf is None:
        # match SELECTION is non-differentiable (ids + thresholded maxima);
        # stop_gradient keeps the Pallas kernels out of JVP/VJP graphs when
        # coarse_match runs inside a differentiated training step
        f0 = jax.lax.stop_gradient(feat_c0)
        f1 = jax.lax.stop_gradient(feat_c1)
        if mesh is not None and mesh.shape.get(shard_axis, 1) > 1:
            from featurematching_tpu.ops.sharded_matching import (
                dual_softmax_match_stats_sharded,
            )

            ba = batch_axis
            if ba is not None and (
                ba not in mesh.shape or f0.shape[0] % mesh.shape[ba]
            ):
                ba = None
            stats = dual_softmax_match_stats_sharded(
                f0, f1, mesh, temperature=temperature, axis=shard_axis,
                batch_axis=ba,
            )
        else:
            from featurematching_tpu.ops.pallas_dual_softmax import (
                dual_softmax_match_stats,
            )

            stats = dual_softmax_match_stats(
                f0, f1, temperature=temperature, impl=impl,
            )
        i_ids, j_ids, mask, mconf = extract_matches_from_stats(
            stats, grid0, grid1, thr, border_rm, max_matches
        )
        mkpts0_c = ids_to_keypoints(i_ids, grid0[1], img_to_coarse_scale)
        mkpts1_c = ids_to_keypoints(j_ids, grid1[1], img_to_coarse_scale)
        matches = CoarseMatches(
            i_ids=i_ids, j_ids=j_ids, mask=mask, mconf=mconf,
            mkpts0_c=mkpts0_c, mkpts1_c=mkpts1_c,
        )
        return matches, None
    i_ids, j_ids, mask, mconf = extract_matches(
        conf, grid0, grid1, thr, border_rm, max_matches
    )
    mkpts0_c = ids_to_keypoints(i_ids, grid0[1], img_to_coarse_scale)
    mkpts1_c = ids_to_keypoints(j_ids, grid1[1], img_to_coarse_scale)
    matches = CoarseMatches(
        i_ids=i_ids, j_ids=j_ids, mask=mask, mconf=mconf,
        mkpts0_c=mkpts0_c, mkpts1_c=mkpts1_c,
    )
    return matches, conf
