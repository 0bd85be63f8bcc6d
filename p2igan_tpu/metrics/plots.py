"""Online-run visualization: colorized GT|pred example grids.

The reference ships an empty ``p2igan_bench/metrics/plots.py`` and inlines
its example-image rendering in the trainer (``scripts/train.py:384-466``);
here the rendering is a real module shared by the trainer's artifact logging
(``training/trainer.py::_log_examples``). Offline figures (GIFs, paper
panels, NSE plots) live in ``experiments/exp2.py`` / ``exp3.py``.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def value_range(gt: np.ndarray, pred: np.ndarray, scale: str = "joint",
                vmin: float | None = None,
                vmax: float | None = None) -> Tuple[float, float]:
    """Color-scale policy of the reference's example images: fixed bounds,
    GT-derived, or the joint min/max of both sequences."""
    if scale == "fixed" and vmin is not None and vmax is not None:
        return float(vmin), float(vmax)
    if scale == "fixed":
        # only one bound configured: fill the other from the data so a
        # half-specified viz config degrades instead of crashing the epoch
        lo = float(vmin) if vmin is not None else float(min(gt.min(), pred.min()))
        hi = float(vmax) if vmax is not None else float(max(gt.max(), pred.max()))
        return lo, hi
    if scale == "gt":
        return float(gt.min()), float(gt.max())
    return (float(min(gt.min(), pred.min())),
            float(max(gt.max(), pred.max())))


def colorize_grid(gt: np.ndarray, pred: np.ndarray, vmin: float,
                  vmax: float, cmap_name: str = "viridis") -> np.ndarray:
    """(T, H, W) GT/pred -> stacked RGB uint8 grid: one row per sequence,
    frames concatenated along width (train.py:384-430)."""
    import matplotlib

    cmap = matplotlib.colormaps[cmap_name]
    norm = lambda x: (x - vmin) / (vmax - vmin + 1e-6)  # noqa: E731
    rows = [np.concatenate([cmap(norm(fr))[..., :3] for fr in seq], axis=1)
            for seq in (gt, pred)]
    return (np.concatenate(rows, axis=0) * 255).astype(np.uint8)


def annotate_stats(img: np.ndarray, gt: np.ndarray, pred: np.ndarray,
                   cmap_name: str = "viridis"):
    """PIL image with the reference's min/mean/max caption (train.py:440-459)."""
    from PIL import Image, ImageDraw

    pil = Image.fromarray(img)
    ImageDraw.Draw(pil).text(
        (5, 5),
        f"GT min/mean/max: {gt.min():.3f}/{gt.mean():.3f}/{gt.max():.3f} | "
        f"Pred min/mean/max: {pred.min():.3f}/{pred.mean():.3f}/{pred.max():.3f} | "
        f"cmap={cmap_name}",
        fill=(255, 255, 255))
    return pil


def example_image(gt: np.ndarray, pred: np.ndarray, scale: str = "joint",
                  vmin: float | None = None, vmax: float | None = None):
    """Full example-artifact pipeline: color scale -> grid -> caption."""
    lo, hi = value_range(gt, pred, scale=scale, vmin=vmin, vmax=vmax)
    return annotate_stats(colorize_grid(gt, pred, lo, hi), gt, pred)
