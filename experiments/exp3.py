"""exp3 — NSE analysis: per-event scores, scatter/residual panels, boxplot.

Re-design of reference ``experiments/exp3.py``: per-event per-frame NSE
(clamped >= 0, nan-mean per event), aggregate NSE per method, scatter and
residual panels with linregress R^2 + slope, log-frequency histogram, and a
per-event NSE boxplot.
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple, Union

import numpy as np

from .exp1 import transform_mmhr
from .io import align_length, crop_center, ensure_dir, select_by_mask

SCATTER_COLORS = ['#1f77b4', '#ff7f0e', '#2ca02c', '#d62728', '#9467bd', '#8c564b']


def nse(pred: np.ndarray, gt: np.ndarray) -> float:
    pred = np.asarray(pred, dtype=np.float64)
    gt = np.asarray(gt, dtype=np.float64)
    m = np.isfinite(pred) & np.isfinite(gt)
    if not np.any(m):
        return float("nan")
    pred, gt = pred[m], gt[m]
    num = np.sum((pred - gt) ** 2)
    den = np.sum((gt - np.mean(gt)) ** 2)
    return float(1.0 - num / (den + 1e-10))


def _select_values(pred, gt, mask, mode: str) -> Tuple[np.ndarray, np.ndarray]:
    invert = mode == "radar"
    if mode not in ("radar", "gauge"):
        raise ValueError(f"Unknown mode: {mode}")
    return (select_by_mask(pred, mask, invert=invert).ravel(),
            select_by_mask(gt, mask, invert=invert).ravel())


def nse_per_frame(pred: np.ndarray, gt: np.ndarray, mask: np.ndarray,
                  mode: str) -> np.ndarray:
    t = min(pred.shape[0], gt.shape[0])
    out = np.full(t, np.nan, dtype=np.float64)
    for i in range(t):
        p_sel, g_sel = _select_values(pred[i:i + 1], gt[i:i + 1], mask, mode)
        out[i] = nse(p_sel, g_sel)
    return out


def _subsample(x, y, max_points, rng):
    if x.size > max_points:
        idx = rng.choice(x.size, size=max_points, replace=False)
        return x[idx], y[idx]
    return x, y


def _panel_base(pred_list, true, min_value):
    tf = np.asarray(true, np.float64).ravel()
    mask_t = np.isfinite(tf)
    return tf[mask_t], mask_t


def _fit_and_annotate(ax, x, y, lim_x):
    from scipy import stats

    if x.size >= 2:
        slope, intercept, r, _, _ = stats.linregress(x, y)
        x_line = np.linspace(lim_x[0], lim_x[1], 200)
        ax.plot(x_line, intercept + slope * x_line, 'k--', lw=1.0)
        ax.text(0.04, 0.82, f"R²={r ** 2:.3f}\nslope={slope:.3f}",
                transform=ax.transAxes, fontsize=11)


def scatter_panels(pred_list, true, labels, save_path, lim=(0, 32),
                   max_points=2000, alpha=0.6, s=10, min_value=0.1,
                   seed=42, residual=False, lim_y=(-24, 8)) -> None:
    """Scatter (pred vs obs) or residual (pred-obs vs obs) panel row."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rng = np.random.default_rng(seed)
    n = len(pred_list)
    fig, axes = plt.subplots(1, n, figsize=(18, 3), dpi=200)
    if n == 1:
        axes = [axes]
    tf, mask_t = _panel_base(pred_list, true, min_value)
    if tf.size == 0:
        plt.close(fig)
        return
    for i, (pred, label) in enumerate(zip(pred_list, labels)):
        ax = axes[i]
        pf = np.asarray(pred, np.float64).ravel()
        pf = pf[mask_t[:pf.size]] if pf.size <= mask_t.size else pf
        m = np.isfinite(pf) & np.isfinite(tf[:pf.size])
        x = tf[:pf.size][m]
        yv = pf[m] - tf[:pf.size][m] if residual else pf[m]
        keep = x >= min_value
        x, yv = _subsample(x[keep], yv[keep], max_points, rng)
        ax.scatter(x, yv, s=s, alpha=alpha, color=SCATTER_COLORS[i % 6],
                   edgecolors='none', zorder=1)
        x_line = np.linspace(lim[0], lim[1], 200)
        if residual:
            ax.plot(x_line, np.zeros_like(x_line), color='gray', ls=':', lw=1.0)
            ax.axhline(0, color='black', lw=1.0, ls='--')
            ax.set_ylim(*lim_y)
            if i == 0:
                ax.set_ylabel("Residual (Pred - Obs, mm/h)", fontsize=12)
        else:
            ax.plot(x_line, x_line, color='gray', ls=':', lw=1.0)
            ax.set_ylim(*lim)
            ax.set_aspect('equal', 'box')
            if i == 0:
                ax.set_ylabel("Pred (mm/h)", fontsize=12)
        _fit_and_annotate(ax, x, yv, lim)
        ax.set_title(label, fontsize=13, fontweight='bold', pad=4)
        ax.set_xlim(*lim)
        ax.set_xlabel("Obs (mm/h)", fontsize=12)
        ax.grid(False)
    plt.tight_layout(pad=1.0)
    plt.savefig(save_path, bbox_inches='tight')
    plt.close(fig)


def logfreq_plot(pred_list, true, labels, save_path, lim=(0, 32), bins=64) -> None:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(1, 1, figsize=(6, 4), dpi=200)
    bin_edges = np.linspace(lim[0], lim[1], bins + 1)
    tf = np.asarray(true, np.float64).ravel()
    tf = tf[np.isfinite(tf)]
    if tf.size == 0:
        plt.close(fig)
        return
    hist_t, _ = np.histogram(tf, bins=bin_edges)
    ax.semilogy(bin_edges[:-1], hist_t / max(hist_t.sum(), 1), color='black',
                lw=1.6, label='Obs')
    for pred, label, color in zip(pred_list, labels, SCATTER_COLORS):
        pf = np.asarray(pred, np.float64).ravel()
        pf = pf[np.isfinite(pf)]
        if pf.size == 0:
            continue
        hist_p, _ = np.histogram(pf, bins=bin_edges)
        ax.semilogy(bin_edges[:-1], hist_p / max(hist_p.sum(), 1), color=color,
                    lw=1.6, label=label)
    ax.set_xlim(*lim)
    ax.set_xlabel("Rainfall (mm/h)")
    ax.set_ylabel("Relative Frequency (log scale)")
    ax.legend(frameon=True, fontsize=9)
    plt.tight_layout()
    plt.savefig(save_path, bbox_inches="tight")
    plt.close(fig)


def nse_boxplot(nse_by_method: Dict[str, List[float]], out_path: str) -> None:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    methods = list(nse_by_method.keys())
    data = [nse_by_method[m] for m in methods]
    fig, ax = plt.subplots(figsize=(6, 4), dpi=200)
    box = ax.boxplot(data, tick_labels=methods, patch_artist=True, showmeans=True,
                     boxprops=dict(linewidth=1.2, color='black'),
                     medianprops=dict(linewidth=2.0, color='black'),
                     meanprops=dict(marker='D', markerfacecolor='white',
                                    markeredgecolor='black', markersize=5))
    for patch, color in zip(box['boxes'], SCATTER_COLORS):
        patch.set_facecolor(color)
        patch.set_alpha(0.7)
    ax.set_ylabel('NSE', fontsize=14)
    ax.set_xlabel('Methods', fontsize=13)
    ax.set_title(f'NSE Comparison ({len(data[0])} Rain Events)', fontsize=14,
                 fontweight='bold')
    ax.set_ylim(-0.2, 1.0)
    plt.tight_layout()
    plt.savefig(out_path, format='pdf', bbox_inches='tight')
    plt.close(fig)


def run_exp3(preds: Dict[str, Union[np.ndarray, Dict[str, np.ndarray]]],
             truth: Union[np.ndarray, Dict[str, np.ndarray]],
             mask: np.ndarray,
             mode: str,
             crop_size: int,
             out_dir: str) -> Dict[str, float]:
    """Reference run_exp3 (exp3.py:258-362)."""
    ensure_dir(out_dir)
    metrics: Dict[str, float] = {}
    already_transformed = False
    nse_by_method: Dict[str, List[float]] = {}

    if isinstance(truth, dict):
        event_keys = list(truth.keys())
        truth_list: List[np.ndarray] = []
        preds_concat: Dict[str, List[np.ndarray]] = {name: [] for name in preds}
        nse_by_method = {name: [] for name in preds}
        for event_key in event_keys:
            truth_ev = truth.get(event_key)
            if truth_ev is None:
                continue
            truth_ev = crop_center(transform_mmhr(truth_ev), crop_size)
            truth_list.append(truth_ev)
            for name, src in preds.items():
                if not isinstance(src, dict):
                    continue
                pred_ev = src.get(event_key)
                if pred_ev is None:
                    continue
                pred_ev = transform_mmhr(pred_ev)
                pred_ev, truth_aligned = align_length(pred_ev, truth_ev)
                pred_ev = crop_center(pred_ev, crop_size)
                frames = nse_per_frame(pred_ev, truth_aligned, mask, mode)
                frames = np.where(np.isfinite(frames), np.maximum(frames, 0.0), np.nan)
                nse_event = float(np.nanmean(frames)) if np.any(np.isfinite(frames)) \
                    else float("nan")
                nse_by_method[name].append(nse_event)
                preds_concat[name].append(pred_ev)
                truth_ev = truth_aligned
        truth = np.concatenate(truth_list, axis=0) if truth_list else np.empty((0,))
        preds = {name: np.concatenate(lst, axis=0) if lst else np.empty((0,))
                 for name, lst in preds_concat.items()}
        already_transformed = True

    if not already_transformed:
        truth = transform_mmhr(truth)
    truth = crop_center(truth, crop_size)

    pred_list, labels = [], []
    for name, pred in preds.items():
        if not already_transformed:
            pred = transform_mmhr(pred)
        pred, truth_aligned = align_length(pred, truth)
        pred = crop_center(pred, crop_size)
        p_sel, g_sel = _select_values(pred, truth_aligned, mask, mode)
        metrics[f"NSE_{name}"] = nse(p_sel, g_sel)
        pred_list.append(pred.ravel())
        labels.append(name)

    gt_flat = truth.ravel()
    scatter_panels(pred_list, gt_flat, labels,
                   os.path.join(out_dir, "scatter_panels.pdf"), residual=False)
    scatter_panels(pred_list, gt_flat, labels,
                   os.path.join(out_dir, "residual_panels.pdf"), residual=True)
    if nse_by_method:
        nse_boxplot(nse_by_method, os.path.join(out_dir, "nse_boxplot.pdf"))
        logfreq_plot(pred_list, gt_flat, labels,
                     os.path.join(out_dir, "logfreq.pdf"))
    return metrics
