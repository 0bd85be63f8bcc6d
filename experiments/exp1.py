"""exp1 — numerical evaluation over concatenated test events.

Array-first re-implementation of the reference's metric suite
(``/root/reference/experiments/exp1.py``). The math is formula-identical —
protected by ``tests/test_reference_parity_exp.py`` which executes the
reference itself — but the organization is this framework's own:

* frame-wise SSIM statistics are computed for the whole (B, T) stack in one
  vectorized pass (the reference loops frame pairs through torch scalars);
* the contingency counts behind POD/FAR/CSI/HSS live in a small
  ``Contingency`` value class;
* the per-method metric schedule is data (``_SCALAR_METRICS``), not an
  inline block.

Preserved reference quirks (each documented at its site): the exp1-specific
HSS denominator (differs from ``metrics/metric.py``), PSS value-range shared
between pred/gt after thresholding, and the crop/align ordering (truth is
cropped before length alignment, predictions after).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple, Union

import numpy as np

from .io import align_length, crop_center, ensure_thw, select_by_mask

EPS_RATIO = 1e-10
EPS_HIST = 1e-12
THRESHOLDS_MMHR: Tuple[float, ...] = (0.5, 2.0, 4.0, 8.0)

ArrayOrEvents = Union[np.ndarray, Dict[str, np.ndarray]]


# --------------------------------------------------------------------------
# rain-rate transform
# --------------------------------------------------------------------------

def transform_mmhr(arr: np.ndarray, divide_by_3: bool = True) -> np.ndarray:
    """Normalized field -> mm/h (reference exp1.py:147-155): floor at 0.001,
    optional /3, 10^min(x*0.0625, 38) * 0.036, clipped to [0, 200]."""
    x = np.maximum(np.asarray(arr, np.float64), 0.001)
    if divide_by_3:
        x = x / 3.0
    rate = 0.036 * np.power(10.0, np.minimum(x * 0.0625, 38.0))
    return np.clip(rate, 0.0, 200.0)


# --------------------------------------------------------------------------
# scalar error scores
# --------------------------------------------------------------------------

def mae(pred: np.ndarray, gt: np.ndarray) -> float:
    return float(np.abs(pred - gt).mean())


def rmse(pred: np.ndarray, gt: np.ndarray) -> float:
    return float(np.sqrt(((pred - gt) ** 2).mean()))


def nse(pred: np.ndarray, gt: np.ndarray) -> float:
    """Nash–Sutcliffe efficiency with the reference's 1e-10 guard."""
    resid = ((pred - gt) ** 2).sum()
    spread = ((gt - gt.mean()) ** 2).sum()
    return float(1.0 - resid / (spread + EPS_RATIO))


# --------------------------------------------------------------------------
# PSS — per-frame histogram overlap (Perkins skill score)
# --------------------------------------------------------------------------

def _finite_above(v: np.ndarray, floor: Optional[float]) -> np.ndarray:
    v = v[np.isfinite(v)]
    return v if floor is None else v[v > floor]


def pss(pred: np.ndarray, gt: np.ndarray, bins: int = 50,
        min_value: float = 0.5,
        value_range: Optional[Tuple[float, float]] = None) -> float:
    """Mean over frames of the overlap between pred/gt value histograms.

    The histogram range is shared across frames and methods of one call:
    derived from the union of both arrays after the ``min_value`` threshold
    (reference exp1.py:29-41).
    """
    pred = np.asarray(pred, np.float32)
    gt = np.asarray(gt, np.float32)
    if pred.size == 0 or gt.size == 0:
        return float("nan")

    if value_range is None:
        pool = _finite_above(np.concatenate([pred.ravel(), gt.ravel()]), min_value)
        if pool.size == 0:
            return float("nan")
        lo, hi = float(pool.min()), float(pool.max())
        value_range = (lo, hi + 1e-6 if lo == hi else hi)

    overlaps = []
    for p_frame, g_frame in zip(pred, gt):
        p = _finite_above(p_frame.ravel(), min_value)
        g = _finite_above(g_frame.ravel(), min_value)
        if p.size == 0 or g.size == 0:
            continue
        hp = np.histogram(p, bins=bins, range=value_range)[0]
        hg = np.histogram(g, bins=bins, range=value_range)[0]
        fp = hp / (hp.sum() + EPS_HIST)
        fg = hg / (hg.sum() + EPS_HIST)
        overlaps.append(float(np.minimum(fp, fg).sum()))
    return float(np.mean(overlaps)) if overlaps else float("nan")


# --------------------------------------------------------------------------
# global-statistics SSIM, vectorized over the frame stack
# --------------------------------------------------------------------------

def _as_stack(x: np.ndarray) -> np.ndarray:
    """(T,H,W) or (B,T,H,W) -> (B,T,H,W) float array."""
    x = np.asarray(x, np.float32)
    return x[None] if x.ndim == 3 else x


def _block_mean8(x: np.ndarray) -> np.ndarray:
    """8x8 average pooling of (B,T,H,W) (== the reference's avg_pool2d)."""
    b, t, h, w = x.shape
    hb, wb = h // 8, w // 8
    x = x[:, :, :hb * 8, :wb * 8].reshape(b, t, hb, 8, wb, 8)
    return x.mean(axis=(3, 5))


def ssim2d(a: np.ndarray, b: np.ndarray, c1: float = 0.01 ** 2,
           c2: float = 0.03 ** 2) -> float:
    """Single-frame global-statistics SSIM (kept for exp2/exp3 callers)."""
    return float(_ssim_stack(np.asarray(a, np.float64)[None, None],
                             np.asarray(b, np.float64)[None, None],
                             c1, c2)[0, 0])

def _ssim_stack(a: np.ndarray, b: np.ndarray, c1: float = 0.01 ** 2,
                c2: float = 0.03 ** 2) -> np.ndarray:
    """Global-statistics SSIM of every frame pair at once: (B,T,H,W) x2 ->
    (B,T). Whole-frame means/variances, NOT the windowed SSIM of the online
    metric suite (reference exp1.py:66-74 keeps both variants distinct)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    ax = (-2, -1)
    mu_a, mu_b = a.mean(ax), b.mean(ax)
    da = a - mu_a[..., None, None]
    db = b - mu_b[..., None, None]
    var_a, var_b = (da ** 2).mean(ax), (db ** 2).mean(ax)
    cov = (da * db).mean(ax)
    num = (2 * mu_a * mu_b + c1) * (2 * cov + c2)
    den = (mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2)
    return num / (den + EPS_RATIO)


def ssim_spatial(pred: np.ndarray, gt: np.ndarray, use_pool8: bool = True) -> float:
    pred, gt = _as_stack(pred), _as_stack(gt)
    if use_pool8:
        pred, gt = _block_mean8(pred), _block_mean8(gt)
    return float(_ssim_stack(pred, gt).mean())


def delta_tssim(pred: np.ndarray, gt: np.ndarray, lag: int = 1,
                use_pool8: bool = True) -> float:
    """Temporal-consistency delta: SSIM(frame_t, frame_{t-lag}) series of the
    prediction minus the same series of the truth, averaged."""
    pred, gt = _as_stack(pred), _as_stack(gt)
    if pred.shape[1] <= lag:
        return float("nan")
    if use_pool8:
        pred, gt = _block_mean8(pred), _block_mean8(gt)
    series = lambda x: _ssim_stack(x[:, lag:], x[:, :-lag])  # noqa: E731
    return float((series(pred) - series(gt)).mean())


# --------------------------------------------------------------------------
# categorical scores from a 2x2 contingency table
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class Contingency:
    hits: float
    misses: float
    false_alarms: float
    correct_negatives: float

    @classmethod
    def at_threshold(cls, pred: np.ndarray, gt: np.ndarray,
                     threshold: float) -> "Contingency":
        p = pred >= threshold
        g = gt >= threshold
        return cls(hits=float((p & g).sum()),
                   misses=float((~p & g).sum()),
                   false_alarms=float((p & ~g).sum()),
                   correct_negatives=float((~p & ~g).sum()))

    @property
    def pod(self) -> float:
        return self.hits / (self.hits + self.misses + EPS_RATIO)

    @property
    def far(self) -> float:
        return self.false_alarms / (self.hits + self.false_alarms + EPS_RATIO)

    @property
    def csi(self) -> float:
        return self.hits / (self.hits + self.misses + self.false_alarms + EPS_RATIO)

    @property
    def hss(self) -> float:
        # exp1-specific denominator, preserved verbatim from reference
        # exp1.py:170-173 — it intentionally differs from metric.py's HSS
        h, m, f, c = (self.hits, self.misses, self.false_alarms,
                      self.correct_negatives)
        if h + m + f + c <= 0:
            return float("nan")
        den = m ** 2 + f ** 2 + 2 * h * c + (m + f) * (h + c) + EPS_RATIO
        return 2 * (h * c - m * f) / den


def categorical_metrics(pred: np.ndarray, gt: np.ndarray,
                        threshold: float) -> Dict[str, float]:
    tab = Contingency.at_threshold(pred, gt, threshold)
    return {"POD": tab.pod, "FAR": tab.far, "CSI": tab.csi, "HSS": tab.hss}


# --------------------------------------------------------------------------
# evaluation-pixel selection and event concatenation
# --------------------------------------------------------------------------

def apply_mask_mode(pred: np.ndarray, gt: np.ndarray, mask: np.ndarray,
                    mode: str) -> Dict[str, np.ndarray]:
    """radar => score the *held-out* (mask==0) pixels; gauge => score the
    gauge (mask==1) pixels (reference exp1.py:179-188)."""
    if mode not in ("radar", "gauge"):
        raise ValueError(f"Unknown mode: {mode}")
    invert = mode == "radar"
    return {"pred": select_by_mask(pred, mask, invert=invert),
            "gt": select_by_mask(gt, mask, invert=invert)}


def _pair_method(name: str, src: ArrayOrEvents,
                 truth_events: Dict[str, np.ndarray],
                 keys) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(pred, truth) frame stacks with event-wise correspondence.

    Alignment happens PER EVENT: a method store missing an event (or holding
    a shorter prediction) drops/truncates that event's truth for THAT method
    only, with a warning — a global tail-truncate after concatenation would
    silently score later events against the wrong truth frames."""
    import logging

    if not isinstance(src, dict):
        # pre-concatenated flat prediction array: pair against the full
        # truth concatenation (legacy layout; still reported)
        full = np.concatenate([truth_events[k] for k in keys], axis=0)
        return align_length(ensure_thw(src), full)
    pred_chunks, truth_chunks = [], []
    for k in keys:
        pv = src.get(k)
        if pv is None:
            logging.warning("exp1: method %r has no event %r; event excluded "
                            "from its scores", name, k)
            continue
        p, t = align_length(ensure_thw(pv), truth_events[k])
        pred_chunks.append(p)
        truth_chunks.append(t)
    if not pred_chunks:
        logging.warning("exp1: method %r shares no events with the truth "
                        "store; skipped", name)
        return None
    return (np.concatenate(pred_chunks, axis=0),
            np.concatenate(truth_chunks, axis=0))


# --------------------------------------------------------------------------
# driver
# --------------------------------------------------------------------------

_SCALAR_METRICS = (
    ("MAE", mae),
    ("RMSE", rmse),
    ("PSS", pss),
    ("NSE", nse),
)


def run_exp1(preds: Dict[str, ArrayOrEvents],
             truth: ArrayOrEvents,
             mask: np.ndarray,
             mode: str,
             crop_size: int,
             thresholds: Tuple[float, ...] = THRESHOLDS_MMHR,
             use_pool8: bool = True,
             divide_by_3: bool = True) -> Dict[str, Dict[str, float]]:
    """Score every method against the truth over all concatenated events.

    Selected-pixel scores (MAE/RMSE/PSS/NSE/categorical) use the mask-mode
    pixels; SSIM/DTSSIM use the full cropped frames. Truth is transformed +
    cropped once; each prediction is transformed, length-aligned against the
    cropped truth, then cropped (reference exp1.py:191-242 ordering).
    """
    if isinstance(truth, dict):
        truth_events = {k: ensure_thw(v) for k, v in truth.items()
                        if v is not None}
        keys = list(truth_events.keys())
        if not keys:
            return {}
        paired = {}
        for name, src in preds.items():
            pt = _pair_method(name, src, truth_events, keys)
            if pt is not None:
                paired[name] = pt
    else:
        t_full = ensure_thw(truth)
        paired = {name: align_length(ensure_thw(src), t_full)
                  for name, src in preds.items()}

    report: Dict[str, Dict[str, float]] = {}
    for name, (pred_raw, truth_raw) in paired.items():
        # reference quirk preserved: truth transformed+cropped, prediction
        # transformed, length-aligned (now per event, above), then cropped.
        # transform is elementwise and crop spatial, so they commute with
        # the temporal alignment — values identical to the reference order.
        truth_t = crop_center(transform_mmhr(truth_raw, divide_by_3=divide_by_3),
                              crop_size)
        pred = crop_center(transform_mmhr(pred_raw, divide_by_3=divide_by_3),
                           crop_size)
        sel = apply_mask_mode(pred, truth_t, mask, mode)

        row: Dict[str, float] = {k: fn(sel["pred"], sel["gt"])
                                 for k, fn in _SCALAR_METRICS}
        row["SSIM"] = ssim_spatial(pred, truth_t, use_pool8=use_pool8)
        row["DTSSIM_L1"] = delta_tssim(pred, truth_t, lag=1, use_pool8=use_pool8)
        row["DTSSIM_L2"] = delta_tssim(pred, truth_t, lag=2, use_pool8=use_pool8)
        for thr in thresholds:
            row[f"CAT_{thr:g}"] = categorical_metrics(sel["pred"], sel["gt"], thr)
        # reference result ordering: MAE, RMSE, PSS, SSIM, DTSSIMs, NSE, CATs
        report[name] = {k: row[k] for k in
                        ("MAE", "RMSE", "PSS", "SSIM", "DTSSIM_L1",
                         "DTSSIM_L2", "NSE")} | {
                        f"CAT_{t:g}": row[f"CAT_{t:g}"] for t in thresholds}

    return report
