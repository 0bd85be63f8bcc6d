"""exp1 — numerical metrics over concatenated test events.

Re-design of reference ``experiments/exp1.py`` in pure numpy (the reference
uses torch for the SSIM helpers; the math is identical):

* ``transform_mmhr``: clip>=0.001, /3, 10^min(x*0.0625, 38)*0.036, clip [0,200]
* MAE / RMSE over mask-selected pixels
* PSS: per-frame histogram-overlap score above ``min_value``
* SSIM: *global-statistics* per-frame SSIM (means/vars over the whole frame,
  not windowed) with optional 8x average pooling — deliberately different
  from the online suite's gaussian-windowed SSIM, as in the reference
* DTSSIM: lag-1/2 temporal-consistency delta of the t-SSIM series
* NSE and categorical POD/FAR/CSI/HSS — note this file's HSS denominator
  differs from ``metrics/metric.py``'s (reference exp1.py:170-173); each is
  preserved in its own context
* mask-mode selection: radar => held-out (inverted mask) pixels; gauge =>
  gauge pixels
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple, Union

import numpy as np

from .io import align_length, crop_center, ensure_thw, select_by_mask


def mae(pred: np.ndarray, gt: np.ndarray) -> float:
    return float(np.mean(np.abs(pred - gt)))


def rmse(pred: np.ndarray, gt: np.ndarray) -> float:
    return float(np.sqrt(np.mean((pred - gt) ** 2)))


def pss(pred: np.ndarray, gt: np.ndarray, bins: int = 50, min_value: float = 0.5,
        value_range: Optional[Tuple[float, float]] = None) -> float:
    """Per-frame histogram-overlap (Perkins) skill score, averaged over frames."""
    pred = np.asarray(pred, dtype=np.float32)
    gt = np.asarray(gt, dtype=np.float32)
    if pred.size == 0 or gt.size == 0:
        return float("nan")

    if value_range is None:
        both = np.concatenate([pred.ravel(), gt.ravel()])
        both = both[np.isfinite(both)]
        if min_value is not None:
            both = both[both > min_value]
        if both.size == 0:
            return float("nan")
        vmin, vmax = float(both.min()), float(both.max())
        if vmin == vmax:
            vmax = vmin + 1e-6
        value_range = (vmin, vmax)

    scores = []
    for i in range(pred.shape[0]):
        p = pred[i].ravel()
        g = gt[i].ravel()
        p = p[np.isfinite(p)]
        g = g[np.isfinite(g)]
        if min_value is not None:
            p = p[p > min_value]
            g = g[g > min_value]
        if p.size == 0 or g.size == 0:
            continue
        p_hist, _ = np.histogram(p, bins=bins, range=value_range)
        g_hist, _ = np.histogram(g, bins=bins, range=value_range)
        p_freq = p_hist / (p_hist.sum() + 1e-12)
        g_freq = g_hist / (g_hist.sum() + 1e-12)
        scores.append(float(np.minimum(p_freq, g_freq).sum()))
    return float(np.mean(scores)) if scores else float("nan")


def ssim2d(a: np.ndarray, b: np.ndarray, c1: float = 0.01 ** 2,
           c2: float = 0.03 ** 2) -> float:
    """Global-statistics SSIM over one frame (reference exp1.py:66-74)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mu_a, mu_b = a.mean(), b.mean()
    sig_a = ((a - mu_a) ** 2).mean()
    sig_b = ((b - mu_b) ** 2).mean()
    sig_ab = ((a - mu_a) * (b - mu_b)).mean()
    num = (2 * mu_a * mu_b + c1) * (2 * sig_ab + c2)
    den = (mu_a ** 2 + mu_b ** 2 + c1) * (sig_a + sig_b + c2)
    return float(num / (den + 1e-10))


def _ensure_bt(x: np.ndarray) -> np.ndarray:
    """(T,H,W) -> (1,T,H,W); (B,T,H,W) stays."""
    x = np.asarray(x, np.float32)
    if x.ndim == 3:
        x = x[None]
    return x


def _pool8(x: np.ndarray) -> np.ndarray:
    """8x8 average pooling on (B,T,H,W) (reference _pool8, exp1.py:89-92)."""
    b, t, h, w = x.shape
    h8, w8 = h // 8, w // 8
    x = x[:, :, :h8 * 8, :w8 * 8]
    return x.reshape(b, t, h8, 8, w8, 8).mean(axis=(3, 5))


def ssim_spatial(pred: np.ndarray, gt: np.ndarray, use_pool8: bool = True) -> float:
    pred = _ensure_bt(pred)
    gt = _ensure_bt(gt)
    if use_pool8:
        pred = _pool8(pred)
        gt = _pool8(gt)
    vals = [ssim2d(pred[b, t], gt[b, t])
            for b in range(pred.shape[0]) for t in range(pred.shape[1])]
    return float(np.mean(vals))


def _tssim_series(x: np.ndarray, lag: int) -> np.ndarray:
    """(B, T) series of SSIM(frame_t, frame_{t-lag}) -> (B, T-lag)."""
    vals = [[ssim2d(x[b, t], x[b, t - lag]) for t in range(lag, x.shape[1])]
            for b in range(x.shape[0])]
    return np.asarray(vals)


def delta_tssim(pred: np.ndarray, gt: np.ndarray, lag: int = 1,
                use_pool8: bool = True) -> float:
    pred = _ensure_bt(pred)
    gt = _ensure_bt(gt)
    if pred.shape[1] <= lag:
        return float("nan")
    if use_pool8:
        pred = _pool8(pred)
        gt = _pool8(gt)
    return float((_tssim_series(pred, lag) - _tssim_series(gt, lag)).mean())


def nse(pred: np.ndarray, gt: np.ndarray) -> float:
    num = np.sum((pred - gt) ** 2)
    den = np.sum((gt - np.mean(gt)) ** 2)
    return float(1.0 - num / (den + 1e-10))


def transform_mmhr(arr: np.ndarray, divide_by_3: bool = True) -> np.ndarray:
    """Offline rain-rate transform (reference exp1.py:147-155)."""
    arr = np.asarray(arr, dtype=np.float64)
    arr = np.maximum(arr, 0.001)
    if divide_by_3:
        arr = arr / 3.0
    exp = np.clip(arr * 0.0625, a_min=None, a_max=38.0)
    out = 10 ** exp * 0.036
    return np.clip(out, 0.0, 200.0)


def categorical_metrics(pred: np.ndarray, gt: np.ndarray, threshold: float) -> Dict[str, float]:
    pred_bin = pred >= threshold
    gt_bin = gt >= threshold
    hits = np.logical_and(pred_bin, gt_bin).sum()
    misses = np.logical_and(~pred_bin, gt_bin).sum()
    false_alarms = np.logical_and(pred_bin, ~gt_bin).sum()
    correct = np.logical_and(~pred_bin, ~gt_bin).sum()
    pod = hits / (hits + misses + 1e-10)
    far = false_alarms / (hits + false_alarms + 1e-10)
    csi = hits / (hits + misses + false_alarms + 1e-10)
    n_total = hits + misses + false_alarms + correct
    if n_total > 0:
        # NOTE: this exp1-specific HSS denominator is preserved verbatim from
        # the reference (exp1.py:170-173); it differs from metric.py's HSS.
        hss = 2 * (hits * correct - misses * false_alarms) / (
            misses ** 2 + false_alarms ** 2 + 2 * hits * correct
            + (misses + false_alarms) * (hits + correct) + 1e-10)
    else:
        hss = float("nan")
    return {"POD": float(pod), "FAR": float(far), "CSI": float(csi), "HSS": float(hss)}


def apply_mask_mode(pred: np.ndarray, gt: np.ndarray, mask: np.ndarray,
                    mode: str) -> Dict[str, np.ndarray]:
    if mode == "radar":
        return {"pred": select_by_mask(pred, mask, invert=True),
                "gt": select_by_mask(gt, mask, invert=True)}
    if mode == "gauge":
        return {"pred": select_by_mask(pred, mask, invert=False),
                "gt": select_by_mask(gt, mask, invert=False)}
    raise ValueError(f"Unknown mode: {mode}")


def run_exp1(preds: Dict[str, Union[np.ndarray, Dict[str, np.ndarray]]],
             truth: Union[np.ndarray, Dict[str, np.ndarray]],
             mask: np.ndarray,
             mode: str,
             crop_size: int,
             thresholds: Tuple[float, ...] = (0.5, 2.0, 4.0, 8.0),
             use_pool8: bool = True,
             divide_by_3: bool = True) -> Dict[str, Dict[str, float]]:
    """Per-method metrics over concatenated events (reference exp1.py:191-242)."""
    if isinstance(truth, dict):
        event_keys = list(truth.keys())
        if not event_keys:
            return {}
        truth_list = [truth[k] for k in event_keys if truth.get(k) is not None]
        truth = np.concatenate([ensure_thw(t) for t in truth_list], axis=0) \
            if truth_list else np.empty((0,))
        preds_concat: Dict[str, np.ndarray] = {}
        for name, src in preds.items():
            if not isinstance(src, dict):
                continue
            lst = [ensure_thw(src[k]) for k in event_keys if src.get(k) is not None]
            preds_concat[name] = np.concatenate(lst, axis=0) if lst else np.empty((0,))
        preds = preds_concat

    results: Dict[str, Dict[str, float]] = {}
    truth = transform_mmhr(truth, divide_by_3=divide_by_3)
    truth = crop_center(truth, crop_size)

    for name, pred in preds.items():
        pred = transform_mmhr(pred, divide_by_3=divide_by_3)
        pred, truth_aligned = align_length(pred, truth)
        pred = crop_center(pred, crop_size)
        sel = apply_mask_mode(pred, truth_aligned, mask, mode)
        pred_sel, gt_sel = sel["pred"], sel["gt"]

        results[name] = {
            "MAE": mae(pred_sel, gt_sel),
            "RMSE": rmse(pred_sel, gt_sel),
            "PSS": pss(pred_sel, gt_sel),
            "SSIM": ssim_spatial(pred, truth_aligned, use_pool8=use_pool8),
            "DTSSIM_L1": delta_tssim(pred, truth_aligned, lag=1, use_pool8=use_pool8),
            "DTSSIM_L2": delta_tssim(pred, truth_aligned, lag=2, use_pool8=use_pool8),
            "NSE": nse(pred_sel, gt_sel),
        }
        for thr in thresholds:
            results[name][f"CAT_{thr:g}"] = categorical_metrics(pred_sel, gt_sel, thr)

    return results
