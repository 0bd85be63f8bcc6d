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
from .io import (align_length, crop_center, ensure_dir, ensure_thw,
                 select_by_mask)

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


def _mode_invert(mode: str) -> bool:
    """Shared mask-mode semantics (one definition with exp1's
    apply_mask_mode): radar scores the masked-OUT pixels, gauge the
    observed ones."""
    if mode not in ("radar", "gauge"):
        raise ValueError(f"Unknown mode: {mode}")
    return mode == "radar"


def _select_values(pred, gt, mask, mode: str) -> Tuple[np.ndarray, np.ndarray]:
    invert = _mode_invert(mode)
    return (select_by_mask(pred, mask, invert=invert).ravel(),
            select_by_mask(gt, mask, invert=invert).ravel())


def nse_per_frame(pred: np.ndarray, gt: np.ndarray, mask: np.ndarray,
                  mode: str) -> np.ndarray:
    """Per-frame NSE over the mode-selected pixels, vectorized over T.

    Matches the reference's frame loop (exp3.py:31-48): non-finite pixels are
    dropped per frame; frames with no finite pixel give NaN.
    """
    t = min(pred.shape[0], gt.shape[0])
    invert = _mode_invert(mode)
    p = np.asarray(select_by_mask(pred[:t], mask, invert=invert), np.float64)
    g = np.asarray(select_by_mask(gt[:t], mask, invert=invert), np.float64)
    ok = np.isfinite(p) & np.isfinite(g)          # (T, n_sel)
    n_ok = ok.sum(axis=1)
    with np.errstate(invalid="ignore", divide="ignore"):
        resid = np.where(ok, (p - g) ** 2, 0.0).sum(axis=1)
        g_mean = np.where(ok, g, 0.0).sum(axis=1) / np.maximum(n_ok, 1)
        spread = np.where(ok, (g - g_mean[:, None]) ** 2, 0.0).sum(axis=1)
        out = 1.0 - resid / (spread + 1e-10)
    return np.where(n_ok > 0, out, np.nan)


def _subsample(x, y, max_points, rng):
    if x.size > max_points:
        idx = rng.choice(x.size, size=max_points, replace=False)
        return x[idx], y[idx]
    return x, y


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
    # `true` is either one shared observation array or a per-method list of
    # paired truths (methods with missing events carry their own pairing)
    trues = list(true) if isinstance(true, (list, tuple)) else [true] * n
    if n == 0 or all(np.asarray(t).size == 0 for t in trues):
        return  # BEFORE subplots: plt.subplots(1, 0) raises ValueError
    fig, axes = plt.subplots(1, n, figsize=(18, 3), dpi=200)
    if n == 1:
        axes = [axes]
    for i, (pred, label) in enumerate(zip(pred_list, labels)):
        ax = axes[i]
        tf = np.asarray(trues[i], np.float64).ravel()
        pf = np.asarray(pred, np.float64).ravel()
        k = min(tf.size, pf.size)
        tf, pf = tf[:k], pf[:k]
        m = np.isfinite(pf) & np.isfinite(tf)
        x = tf[m]
        yv = pf[m] - tf[m] if residual else pf[m]
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
    for i, (pred, label) in enumerate(zip(pred_list, labels)):
        color = SCATTER_COLORS[i % len(SCATTER_COLORS)]
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
    # non-finite per-event scores (empty / all-NaN events) would make
    # matplotlib draw NaN percentiles; the event count still reports the
    # largest method's coverage below
    data = [[v for v in nse_by_method[m] if np.isfinite(v)] for m in methods]
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
    n_events = max((len(v) for v in nse_by_method.values()), default=0)
    ax.set_title(f'NSE Comparison ({n_events} Rain Events)', fontsize=14,
                 fontweight='bold')
    ax.set_ylim(-0.2, 1.0)
    plt.tight_layout()
    plt.savefig(out_path, format='pdf', bbox_inches='tight')
    plt.close(fig)


def _event_nse_score(pred_ev: np.ndarray, truth_ev: np.ndarray,
                     mask: np.ndarray, mode: str) -> float:
    """One event's NSE: per-frame scores clamped >= 0, NaN-mean'd
    (reference exp3.py:294-297)."""
    frames = nse_per_frame(pred_ev, truth_ev, mask, mode)
    frames = np.where(np.isfinite(frames), np.maximum(frames, 0.0), np.nan)
    if not np.any(np.isfinite(frames)):
        return float("nan")
    return float(np.nanmean(frames))


def _per_event_pass(preds: Dict[str, Dict[str, np.ndarray]],
                    truth: Dict[str, np.ndarray], mask: np.ndarray, mode: str,
                    crop_size: int):
    """Walk events once: per-event NSE scores + transformed/cropped
    per-method (pred, truth) pairs for the aggregate metrics and plots.

    Pairing is PER EVENT and per method: a method store missing an event (or
    holding a shorter prediction) drops/truncates that event's truth for
    that method only — concatenating full truth against gap-skipped
    predictions would silently score later events against the wrong truth
    frames, and the per-event alignment must not leak into other methods."""
    import logging

    scores: Dict[str, List[float]] = {name: [] for name in preds}
    chunks: Dict[str, List[np.ndarray]] = {name: [] for name in preds}
    truth_by: Dict[str, List[np.ndarray]] = {name: [] for name in preds}
    # legacy flat (non-dict) stores hold all events concatenated in truth's
    # key order (the layout exp1's pairing also accepts): slice sequentially
    flat_offset: Dict[str, int] = {}

    for key, truth_ev in truth.items():
        if truth_ev is None:
            continue
        # normalize to (T, H, W) BEFORE any slicing, like exp1's pairing
        # (a (1,T,C,H,W) layout would otherwise give t_len=1 and flat
        # stores would slice the wrong axis, silently mispairing events)
        truth_ev = ensure_thw(np.asarray(truth_ev))
        t_len = int(truth_ev.shape[0])
        truth_ev = crop_center(transform_mmhr(truth_ev), crop_size)
        for name, src in preds.items():
            if isinstance(src, dict):
                raw_ev = src.get(key)
            else:
                off = flat_offset.get(name, 0)
                raw_ev = ensure_thw(np.asarray(src))[off:off + t_len]
                flat_offset[name] = off + t_len
                if raw_ev.shape[0] == 0:
                    raw_ev = None
            if raw_ev is None:
                logging.warning("exp3: method %r has no frames for event %r; "
                                "event excluded from its aggregates", name, key)
                continue
            pred_ev = transform_mmhr(raw_ev)
            pred_ev, truth_al = align_length(pred_ev, truth_ev)
            pred_ev = crop_center(pred_ev, crop_size)
            scores[name].append(_event_nse_score(pred_ev, truth_al, mask, mode))
            chunks[name].append(pred_ev)
            truth_by[name].append(truth_al)

    cat = lambda lst: np.concatenate(lst, axis=0) if lst else np.empty((0,))  # noqa: E731
    paired = {name: (cat(chunks[name]), cat(truth_by[name]))
              for name in preds if chunks[name]}
    return paired, scores


def run_exp3(preds: Dict[str, Union[np.ndarray, Dict[str, np.ndarray]]],
             truth: Union[np.ndarray, Dict[str, np.ndarray]],
             mask: np.ndarray,
             mode: str,
             crop_size: int,
             out_dir: str) -> Dict[str, float]:
    """Aggregate + per-event NSE analysis with the four reference figures
    (reference exp3.py:258-362; per-event boxplot data only exists for
    dict-of-events inputs, as there)."""
    ensure_dir(out_dir)

    if isinstance(truth, dict):
        paired, nse_by_method = _per_event_pass(preds, truth, mask, mode,
                                                crop_size)
        truth_flat = np.concatenate(
            [crop_center(transform_mmhr(ev), crop_size).ravel()
             for ev in truth.values() if ev is not None]) \
            if any(ev is not None for ev in truth.values()) else np.empty((0,))
    else:
        nse_by_method = {}
        truth = crop_center(transform_mmhr(truth), crop_size)
        paired = {}
        for name, p in preds.items():
            pr, tr = align_length(transform_mmhr(p), truth)
            paired[name] = (crop_center(pr, crop_size), tr)
        truth_flat = truth.ravel()

    metrics: Dict[str, float] = {}
    pred_list: List[np.ndarray] = []
    truth_list: List[np.ndarray] = []
    for name, (pred, truth_al) in paired.items():
        p_sel, g_sel = _select_values(pred, truth_al, mask, mode)
        metrics[f"NSE_{name}"] = nse(p_sel, g_sel)
        pred_list.append(pred.ravel())
        truth_list.append(truth_al.ravel())

    labels = list(paired.keys())
    figure = lambda fname: os.path.join(out_dir, fname)  # noqa: E731
    scatter_panels(pred_list, truth_list, labels, figure("scatter_panels.pdf"),
                   residual=False)
    scatter_panels(pred_list, truth_list, labels, figure("residual_panels.pdf"),
                   residual=True)
    if nse_by_method:
        nse_boxplot(nse_by_method, figure("nse_boxplot.pdf"))
    if pred_list and truth_flat.size:
        # logfreq needs no per-event data — flat-truth runs produce it too
        logfreq_plot(pred_list, truth_flat, labels, figure("logfreq.pdf"))
    return metrics
