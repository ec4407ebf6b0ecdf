"""Fine-level local-window refinement: window gather + soft-argmax.

Re-design of /root/reference/network/module/fine_preprocess.py and
network/utils/fine_matching_new.py. The reference unfolds the ENTIRE fine
feature map into 7x7 windows (fine_preprocess.py:43-46, ~60 MB per map) and
then gathers the matched rows; on TPU we gather only the K matched windows
directly with a single batched fancy-index (static K from CoarseMatches), with
out-of-bounds taps zeroed — bitwise equivalent to F.unfold's zero padding.

The learned parts (49->1 window mixers, coarse-context merge) live in
models/matcher.py; this module is the pure index/math layer.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class FineMatches(NamedTuple):
    """mkpts*_f: [B, K, 3] = (x, y, std) — reference concatenates the soft-
    argmax std as a 3rd column (fine_matching_new.py:78-79)."""

    mkpts0_f: jnp.ndarray
    mkpts1_f: jnp.ndarray
    coords0: jnp.ndarray  # [B, K, 2] normalized offsets in [-1, 1]
    coords1: jnp.ndarray
    std0: jnp.ndarray  # [B, K]
    std1: jnp.ndarray


def window_center_offset(window: int, stride: int) -> int:
    """Offset of the window's top-left tap from stride*id, replicating
    F.unfold(kernel=W, stride=stride, padding=2) for (7, 4) —
    fine_preprocess.py:43: start = stride*id - padding, padding = W//2 - 1."""
    return -(window // 2 - 1)


def gather_fine_windows(
    feat_f: jnp.ndarray,
    ids: jnp.ndarray,
    grid_c: Tuple[int, int],
    window: int,
    stride: int,
) -> jnp.ndarray:
    """Gather [W, W] windows of the fine map at coarse match ids.

    Args:
      feat_f: [B, Hf, Wf, C] fine features (NHWC).
      ids: [B, K] flat coarse-grid indices.
      grid_c: (hc, wc) coarse grid; Hf = hc*stride, Wf = wc*stride.
      window: W (odd); stride: fine-per-coarse ratio (typically 4).
    Returns:
      [B, K, W*W, C] window features, zero outside the image (matches the
      reference's zero-padded unfold).

    Implementation note: a full-map unfold (conv_general_dilated_patches) +
    contiguous row gather was benchmarked at 10.3 ms vs 6.5 ms for this direct
    per-tap gather on TPU v5e — the unfold writes W*W copies of the map and
    loses; the direct gather stays.
    """
    B, Hf, Wf, C = feat_f.shape
    hc, wc = grid_c
    K = ids.shape[1]
    off = window_center_offset(window, stride)

    cell_y = (ids // wc).astype(jnp.int32)  # [B, K]
    cell_x = (ids % wc).astype(jnp.int32)
    y0 = cell_y * stride + off  # top-left tap, may be negative
    x0 = cell_x * stride + off

    dy = jax.lax.broadcasted_iota(jnp.int32, (window, window), 0)
    dx = jax.lax.broadcasted_iota(jnp.int32, (window, window), 1)
    ys = y0[:, :, None, None] + dy[None, None]  # [B, K, W, W]
    xs = x0[:, :, None, None] + dx[None, None]
    inb = (ys >= 0) & (ys < Hf) & (xs >= 0) & (xs < Wf)
    ys_c = jnp.clip(ys, 0, Hf - 1)
    xs_c = jnp.clip(xs, 0, Wf - 1)

    flat = feat_f.reshape(B, Hf * Wf, C)
    lin = (ys_c * Wf + xs_c).reshape(B, K * window * window)  # [B, KWW]
    gathered = jnp.take_along_axis(flat, lin[..., None], axis=1)  # [B, KWW, C]
    gathered = gathered.reshape(B, K, window * window, C)
    return gathered * inb.reshape(B, K, window * window, 1).astype(gathered.dtype)


def normalized_grid(window: int, dtype=jnp.float32) -> jnp.ndarray:
    """[W*W, 2] (x, y) grid with coords in [-1, 1] inclusive — kornia
    create_meshgrid(normalize=True) semantics (fine_matching_new.py:66)."""
    line = jnp.linspace(-1.0, 1.0, window, dtype=dtype)
    gx = jnp.tile(line[None, :], (window, 1))  # x varies along width
    gy = jnp.tile(line[:, None], (1, window))
    return jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)


def spatial_expectation(heatmap: jnp.ndarray, window: int):
    """Soft-argmax expectation + std over a [-1,1]^2 grid.

    heatmap: [..., W*W] (already softmaxed). Returns (coords [..., 2],
    std [...]) replicating kornia dsnt.spatial_expectation2d + the reference's
    std formula (fine_matching_new.py:63-73): std = sum_dims sqrt(var_dim).
    """
    grid = normalized_grid(window, heatmap.dtype)  # [WW, 2]
    coords = jnp.einsum("...r,rc->...c", heatmap, grid)
    e2 = jnp.einsum("...r,rc->...c", heatmap, grid * grid)
    var = e2 - coords * coords
    std = jnp.sum(jnp.sqrt(jnp.clip(var, min=1e-10)), axis=-1)
    return coords, std


def fine_soft_argmax(
    feat0_mixed: jnp.ndarray,
    feat1_mixed: jnp.ndarray,
    feat0: jnp.ndarray,
    feat1: jnp.ndarray,
    mkpts0_c: jnp.ndarray,
    mkpts1_c: jnp.ndarray,
    window: int,
    img_to_fine_scale: float,
) -> FineMatches:
    """Center-vs-window correlation -> heatmaps -> subpixel keypoints.

    Args:
      feat*_mixed: [B, K, C] learned per-window mixtures (the 49->1 linear of
        fine_matching_new.py:18-19 applied upstream).
      feat*: [B, K, WW, C] window features (post fine-transformer).
      mkpts*_c: [B, K, 2] coarse pixel coords.
    Port of fine_matching_new.py:56-79, batched over [B, K] instead of a flat
    dynamic M.
    """
    C = feat0.shape[-1]
    temp = 1.0 / (C**0.5)
    sim0 = jnp.einsum(
        "bkc,bkrc->bkr", feat0_mixed, feat1, preferred_element_type=jnp.float32
    )
    sim1 = jnp.einsum(
        "bkc,bkrc->bkr", feat1_mixed, feat0, preferred_element_type=jnp.float32
    )
    heat0 = jax.nn.softmax(temp * sim0, axis=-1)  # [B, K, WW]
    heat1 = jax.nn.softmax(temp * sim1, axis=-1)

    coords0, std0 = spatial_expectation(heat0, window)
    coords1, std1 = spatial_expectation(heat1, window)

    half = window // 2
    mkpts0_f = mkpts0_c + coords0 * (half * img_to_fine_scale) + half
    mkpts1_f = mkpts1_c + coords1 * (half * img_to_fine_scale) + half

    return FineMatches(
        mkpts0_f=jnp.concatenate([mkpts0_f, std0[..., None]], axis=-1),
        mkpts1_f=jnp.concatenate([mkpts1_f, std1[..., None]], axis=-1),
        coords0=coords0,
        coords1=coords1,
        std0=std0,
        std1=std1,
    )
