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

import functools
import os
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
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

    Implementation note (perf history): a full-map unfold
    (conv_general_dilated_patches) + contiguous row gather benched 10.3 ms vs
    6.5 ms for a per-tap row gather on TPU v5e; the per-tap gather then
    profiled at ~32 GB/s (128 B rows — DMA-descriptor bound, 1.64 ms/call at
    the flagship shape). Current form: zero-pad x so every window ROW is one
    in-bounds contiguous [W, C] slice and lax.gather W-pixel segments
    (W*C*2 = 896 B per DMA) — one descriptor per (match, row) instead of per
    tap. The backward is pinned (custom VJP below) to the per-tap
    scatter-add: the adjoint of the row-segment gather lowers to a strided
    segment scatter that doubled the train step (93 -> 194 ms/step).
    """
    return _gather_rows(feat_f, ids, grid_c, window, stride)


def _tap_coords(ids, grid_c, window, stride, Hf, Wf):
    """Per-tap (y, x) coords and in-bounds mask. Returns [B, K, W, W] each."""
    wc = grid_c[1]
    off = window_center_offset(window, stride)
    cell_y = (ids // wc).astype(jnp.int32)  # [B, K]
    cell_x = (ids % wc).astype(jnp.int32)
    y0 = cell_y * stride + off  # top-left tap, may be negative
    x0 = cell_x * stride + off
    dy = jax.lax.broadcasted_iota(jnp.int32, (window, window), 0)
    dx = jax.lax.broadcasted_iota(jnp.int32, (window, window), 1)
    ys = y0[:, :, None, None] + dy[None, None]
    xs = x0[:, :, None, None] + dx[None, None]
    inb = (ys >= 0) & (ys < Hf) & (xs >= 0) & (xs < Wf)
    return ys, xs, inb


def _gather_rows(feat_f, ids, grid_c, window, stride):
    B, Hf, Wf, C = feat_f.shape
    wc = grid_c[1]
    K = ids.shape[1]
    W = window
    off = window_center_offset(W, stride)
    pad = max(0, -off)  # left x-margin so x0 + pad >= 0

    cell_y = (ids // wc).astype(jnp.int32)  # [B, K]
    cell_x = (ids % wc).astype(jnp.int32)
    y0 = cell_y * stride + off
    x0 = cell_x * stride + off

    # pad x with zeros on both sides: window rows never clamp, and
    # out-of-image x taps read zeros (matching the zero-padded unfold)
    right = max(0, ((wc - 1) * stride + off + W) - Wf)
    fp = jnp.pad(feat_f, ((0, 0), (0, 0), (pad, right), (0, 0)))

    dy = jnp.arange(W, dtype=jnp.int32)
    ys = y0[:, :, None] + dy[None, None]  # [B, K, W]
    row_ok = (ys >= 0) & (ys < Hf)
    ys_c = jnp.clip(ys, 0, Hf - 1)
    starts = jnp.stack(
        [ys_c, jnp.broadcast_to((x0 + pad)[:, :, None], ys.shape)], axis=-1
    ).reshape(B, K * W, 2)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2),
        collapsed_slice_dims=(0,),
        start_index_map=(0, 1),
    )
    gathered = jax.vmap(
        lambda op, st: jax.lax.gather(
            op, st, dnums, slice_sizes=(1, W, C), mode="clip"
        )
    )(fp, starts)  # [B, K*W, W, C]
    gathered = gathered.reshape(B, K, W * W, C)
    ok = jnp.repeat(row_ok, W, axis=-1).reshape(B, K, W * W, 1)
    return gathered * ok.astype(gathered.dtype)


def _gather_fwd(feat_f, ids, grid_c, window, stride):
    out = _gather_rows(feat_f, ids, grid_c, window, stride)
    # dtype rides on a 0-sized array (dtype objects are not valid residuals)
    return out, (ids, feat_f.shape, jnp.zeros((0,), feat_f.dtype))


def _gather_bwd_taps(ids, B, Hf, Wf, C, dtype, grid_c, window, stride, g):
    """Per-tap scatter-add: B*K*W*W updates of one [C] row each."""
    K = ids.shape[1]
    ys, xs, inb = _tap_coords(ids, grid_c, window, stride, Hf, Wf)
    lin = (jnp.clip(ys, 0, Hf - 1) * Wf + jnp.clip(xs, 0, Wf - 1)).reshape(
        B, K * window * window
    )
    gm = (g * inb.reshape(B, K, window * window, 1).astype(g.dtype)).reshape(
        B, K * window * window, C
    )
    zero = jnp.zeros((B, Hf * Wf, C), dtype)
    dflat = jax.vmap(lambda z, i, v: z.at[i].add(v))(zero, lin, gm.astype(dtype))
    return dflat.reshape(B, Hf, Wf, C)


def _gather_bwd_rows(ids, B, Hf, Wf, C, dtype, grid_c, window, stride, g):
    """Row-strip scatter-add: the exact mirror of _gather_rows' gather.

    B*K*W descriptors of one CONTIGUOUS [W*C] row strip each — 7x fewer
    update descriptors than the per-tap path (which issues one [C] row per
    tap) at identical bytes. X-clipping is handled like the forward: scatter
    into an x-padded operand, then slice the pad off; y-clipped rows are
    zero-masked (their clamped writes add zeros)."""
    wc = grid_c[1]
    K = ids.shape[1]
    W = window
    off = window_center_offset(W, stride)
    pad = max(0, -off)
    right = max(0, ((wc - 1) * stride + off + W) - Wf)
    Wp = pad + Wf + right

    cell_y = (ids // wc).astype(jnp.int32)
    cell_x = (ids % wc).astype(jnp.int32)
    y0 = cell_y * stride + off
    x0 = cell_x * stride + off

    dy = jnp.arange(W, dtype=jnp.int32)
    ys = y0[:, :, None] + dy[None, None]  # [B, K, W]
    row_ok = (ys >= 0) & (ys < Hf)
    ys_c = jnp.clip(ys, 0, Hf - 1)
    starts = jnp.stack(
        [ys_c, jnp.broadcast_to((x0 + pad)[:, :, None], ys.shape)], axis=-1
    ).reshape(B, K * W, 2)

    gm = g.astype(dtype).reshape(B, K, W, W, C) * row_ok[..., None, None].astype(
        dtype
    )
    updates = gm.reshape(B, K * W, W, C)

    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2),
        inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0, 1),
    )
    zero = jnp.zeros((B, Hf, Wp, C), dtype)
    out = jax.vmap(
        lambda z, st, up: jax.lax.scatter_add(
            z, st, up, dnums, mode="clip",
            indices_are_sorted=False, unique_indices=False,
        )
    )(zero, starts, updates)
    return out[:, :, pad : pad + Wf, :]


def _fold_combos(s: int, W: int, off: int):
    """col2im bookkeeping: for output residue r (mod stride s), the (cell
    shift e, tap index d) pairs with s*e + r - off == d, 0 <= d < W."""
    out = []
    for r in range(s):
        combos = []
        for e in range((off - r + s - 1) // s, (W - 1 + off - r) // s + 1):
            d = s * e + r - off
            if 0 <= d < W:
                combos.append((e, d))
        out.append(combos)
    return out


def _gather_bwd_fold(ids, B, Hf, Wf, C, dtype, grid_c, window, stride, g):
    """col2im backward: scatter whole window-grads as CONTIGUOUS rows into a
    dense per-cell grid (B*K descriptors of W*W*C bytes — vs B*K*W*W one-row
    descriptors in the per-tap path), then resolve the overlapping-window
    sums with a STATIC shifted-add fold (every fine pixel is covered by at
    most ceil(W/stride)^2 windows). The scatter has no overlapping-window
    structure left, so XLA lowers it to clean row DMAs."""
    hc, wc = grid_c
    K = ids.shape[1]
    W = window
    s = stride
    off = window_center_offset(W, s)

    dense = jnp.zeros((B, hc * wc, W * W * C), dtype)
    dense = jax.vmap(lambda z, i, v: z.at[i].add(v))(
        dense, ids, g.astype(dtype).reshape(B, K, W * W * C)
    )
    combos = _fold_combos(s, W, off)
    all_e = [e for c in combos for (e, _) in c]
    P = max(max(all_e), -min(all_e))  # cell pad: shifted reads stay in range
    cells = dense.reshape(B, hc, wc, W, W, C)
    cp = jnp.pad(cells, ((0, 0), (P, P), (P, P), (0, 0), (0, 0), (0, 0)))

    rows = []
    for ry in range(s):
        cols = []
        for rx in range(s):
            acc = None
            for ey, dy in combos[ry]:
                for ex, dx in combos[rx]:
                    # cell cy = q - e  ->  padded index q + P - e
                    part = jax.lax.slice(
                        cp,
                        (0, P - ey, P - ex, dy, dx, 0),
                        (B, P - ey + hc, P - ex + wc, dy + 1, dx + 1, C),
                    )[:, :, :, 0, 0, :]
                    acc = part if acc is None else acc + part
            if acc is None:  # window < stride: residue never covered
                acc = jnp.zeros((B, hc, wc, C), dtype)
            cols.append(acc)
        rows.append(jnp.stack(cols, axis=3))  # [B, hc, wc, s, C]
    out6 = jnp.stack(rows, axis=2)  # [B, hc, s, wc, s, C]
    return out6.reshape(B, hc * s, wc * s, C)


# Backward strategy. Device A/B at the flagship train shape (one process,
# fused Swin + fused coarse, batch 4):
#   quiet host:      per-tap 73.3 ms/step  vs  col2im-fold 75.2 ms/step
#   contended host:  per-tap 90.4 ms/step  vs  col2im-fold 79.0 ms/step
# The per-tap scatter is device-efficient but dispatch-heavy (B*K*W*W row
# descriptors) — it degrades badly when the host is loaded; the fold trades
# ~2 ms of dense-grid HBM traffic for dispatch-independence. Default to the
# quiet-host winner; set FMTPU_GATHER_BWD=fold (env) on dispatch-bound hosts.
# 'rows' (round-4 measured dead end): scattering whole [W*C] row strips via
# windowed lax.scatter_add mirrors the forward gather and issues 7x fewer
# descriptors — but XLA-TPU lowers windowed scatter-adds with potentially
# overlapping regions to a SERIAL per-update loop (~100k dynamic-update-slice
# ops/step, 65.5 -> 77+ ms device). The flat one-row .at[].add() form is the
# one XLA pattern-matches to its parallel kCustom scatter.
GATHER_BWD_MODE = os.environ.get("FMTPU_GATHER_BWD", "tap")


def _gather_bwd(grid_c, window, stride, res, g):
    ids, (B, Hf, Wf, C), proto = res
    dtype = proto.dtype
    hc, wc = grid_c
    on_grid = Hf == hc * stride and Wf == wc * stride
    if GATHER_BWD_MODE == "fold" and on_grid:
        d = _gather_bwd_fold(ids, B, Hf, Wf, C, dtype, grid_c, window, stride, g)
    elif GATHER_BWD_MODE == "rows":
        d = _gather_bwd_rows(ids, B, Hf, Wf, C, dtype, grid_c, window, stride, g)
    else:
        d = _gather_bwd_taps(ids, B, Hf, Wf, C, dtype, grid_c, window, stride, g)
    return d, None


gather_fine_windows.defvjp(_gather_fwd, _gather_bwd)


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


def fine_from_heatmaps(
    heat0: jnp.ndarray,
    heat1: jnp.ndarray,
    mkpts0_c: jnp.ndarray,
    mkpts1_c: jnp.ndarray,
    window: int,
    img_to_fine_scale: float,
) -> FineMatches:
    """fine_soft_argmax's tail when the correlation + softmax already ran
    (e.g. inside ops/pallas_fine_stage.fine_stage_fused's fold mode).

    heat*: [B, K, W*W] softmaxed heatmaps (pad-free probability mass).
    """
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
