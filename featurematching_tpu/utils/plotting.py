"""Match visualization figures.

Re-design of /root/reference/utils/plotting.py (epipolar-error-colored match
figures, :20-128; dynamic alpha :131-142; error colormap :145-149) and the
demo's fast cv2-based plot (demo/demo.py:61-92). Consumes the framework's
fixed-shape padded match lists (mask-aware).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def dynamic_alpha(
    n_matches: int,
    milestones=(0, 300, 1000, 2000),
    alphas=(1.0, 0.8, 0.4, 0.2),
) -> float:
    """Fade match lines as counts grow: piecewise-linear alpha through the
    (milestone, alpha) control points, clamped to the last alpha beyond the
    final milestone (same behavior class as the reference plotting.py:131-142)."""
    return float(np.interp(n_matches, milestones, alphas))


def error_colormap(err: np.ndarray, thr: float, alpha: float = 1.0) -> np.ndarray:
    """Quality -> RGBA ramp: err 0 is pure green, err >= 2*thr pure red,
    linear red<->green crossfade between (reference plotting.py:145-149
    renders the same green-to-red semantics)."""
    quality = 1.0 - np.clip(err / (2.0 * thr), 0.0, 1.0)  # 1 = good
    r = np.clip(2.0 * (1.0 - quality), 0.0, 1.0)
    g = np.clip(2.0 * quality, 0.0, 1.0)
    zero = np.zeros_like(quality)
    return np.stack([r, g, zero, np.full_like(quality, alpha)], axis=-1)


def make_matching_figure(
    img0: np.ndarray,
    img1: np.ndarray,
    mkpts0: np.ndarray,
    mkpts1: np.ndarray,
    color: np.ndarray,
    kpts0: Optional[np.ndarray] = None,
    kpts1: Optional[np.ndarray] = None,
    text: Optional[list] = None,
    dpi: int = 75,
    path: Optional[str] = None,
):
    """Side-by-side pair figure with match lines (plotting.py:20-59)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(10, 6), dpi=dpi)
    for ax, img in zip(axes, (img0, img1)):
        ax.imshow(img, cmap="gray" if img.ndim == 2 else None)
        ax.get_yaxis().set_ticks([])
        ax.get_xaxis().set_ticks([])
        for spine in ax.spines.values():
            spine.set_visible(False)
    plt.tight_layout(pad=1)

    if kpts0 is not None:
        axes[0].scatter(kpts0[:, 0], kpts0[:, 1], c="w", s=2)
    if kpts1 is not None:
        axes[1].scatter(kpts1[:, 0], kpts1[:, 1], c="w", s=2)

    if len(mkpts0) > 0:
        fig.canvas.draw()
        transFigure = fig.transFigure.inverted()
        fkpts0 = transFigure.transform(axes[0].transData.transform(mkpts0))
        fkpts1 = transFigure.transform(axes[1].transData.transform(mkpts1))
        from matplotlib.lines import Line2D

        fig.lines = [
            Line2D(
                (fkpts0[i, 0], fkpts1[i, 0]),
                (fkpts0[i, 1], fkpts1[i, 1]),
                transform=fig.transFigure,
                c=color[i],
                linewidth=1,
            )
            for i in range(len(mkpts0))
        ]
        axes[0].scatter(mkpts0[:, 0], mkpts0[:, 1], c=color, s=4)
        axes[1].scatter(mkpts1[:, 0], mkpts1[:, 1], c=color, s=4)

    if text:
        axes[0].text(
            0.01, 0.99, "\n".join(text), transform=axes[0].transAxes,
            fontsize=15, va="top", ha="left", color="k",
        )

    if path:
        plt.savefig(path, bbox_inches="tight", pad_inches=0)
        plt.close(fig)
        return None
    return fig


def make_evaluation_figure(
    img0: np.ndarray,
    img1: np.ndarray,
    mkpts0: np.ndarray,
    mkpts1: np.ndarray,
    epi_errs: np.ndarray,
    epi_err_thr: float = 5e-4,
    path: Optional[str] = None,
):
    """Error-colored evaluation figure (plotting.py:62-104) for one pair;
    inputs are the VALID (masked) match rows."""
    alpha = dynamic_alpha(len(mkpts0))
    color = error_colormap(epi_errs, epi_err_thr, alpha)
    n_correct = int(np.sum(epi_errs < epi_err_thr))
    precision = n_correct / max(len(epi_errs), 1)
    text = [
        f"#Matches {len(mkpts0)}",
        f"Precision({epi_err_thr:.2e}) ({100 * precision:.1f}%): "
        f"{n_correct}/{len(mkpts0)}",
    ]
    return make_matching_figure(
        img0, img1, mkpts0, mkpts1, color, text=text, path=path
    )
