"""Online evaluation metric suite (regression / categorical / FSS).

Re-design of the reference torchmetrics suite
(``p2igan_bench/metrics/metric.py``) as **pure accumulator pytrees**: each
metric is (init, update, compute) where ``update`` is jit-able and states are
float arrays — so metric accumulation runs on device inside the step function
and multi-device reduction is a plain ``psum`` over the state pytree (this
realizes the torchmetrics ``dist_reduce_fx="sum"`` declarations the reference
leaves dormant).

Rainfall transform here is ``10^(x*0.0625)*0.036`` (metric.py:16-20) — note
this intentionally differs from ``losses.transform`` and from the offline
``experiments.exp1.transform_mmhr``; each context keeps its own scaling, as in
the reference.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-10


def transform(output: jax.Array) -> jax.Array:
    """Normalized values -> rainfall intensity (reference metric.py:16-20)."""
    return jnp.power(10.0, output * 0.0625) * 0.036


def _flatten_spatial(x: jax.Array) -> jax.Array:
    """(..., H, W) -> (N, H, W)."""
    h, w = x.shape[-2], x.shape[-1]
    return x.reshape(-1, h, w)


def _to_nhw(x: jax.Array) -> jax.Array:
    """Accept (B,T,H,W,C) / (B,T,H,W) / (B,H,W) etc. -> (N, H, W).

    5D input is always (B,T,H,W,C); C>1 folds each channel into its own
    (H,W) plane (previously the trailing (W,C) pair was silently treated as
    the image plane). 4D input is (..., H, W) by convention."""
    if x.ndim >= 3 and x.shape[-1] == 1:
        x = x[..., 0]
    elif x.ndim == 5:
        x = jnp.moveaxis(x, -1, 2)  # (B,T,C,H,W)
    return _flatten_spatial(x)


# ---------------------------------------------------------------------------
# SSIM (torchmetrics-compatible: gaussian 11x11 sigma 1.5, reflect pad,
# border crop, per-image mean)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=4)
def _gaussian_kernel1d(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(coords ** 2) / (2.0 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _gaussian_blur_valid(x: jax.Array, size: int = 11,
                         sigma: float = 1.5) -> jax.Array:
    """Separable VALID-mode gaussian filter on (N, H, W) -> (N, H-2p, W-2p).

    torchmetrics reflect-pads, blurs, then crops the pad-influenced border
    away; valid-mode convolution of the unpadded image is the identical
    result with none of the padded overcompute — and one stacked conv pair
    replaces the reference's five independent pad+blur passes."""
    k = jnp.asarray(_gaussian_kernel1d(size, sigma))
    y = x[:, None]  # (N, 1, H, W)
    y = jax.lax.conv_general_dilated(y, k.reshape(1, 1, size, 1), (1, 1),
                                     "VALID")
    y = jax.lax.conv_general_dilated(y, k.reshape(1, 1, 1, size), (1, 1),
                                     "VALID")
    return y[:, 0]


def ssim_per_image(preds: jax.Array, target: jax.Array, data_range: float = 1.0,
                   size: int = 11, sigma: float = 1.5,
                   k1: float = 0.01, k2: float = 0.03) -> jax.Array:
    """Per-image SSIM over (N, H, W); torchmetrics SSIM semantics."""
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    pad = (size - 1) // 2
    if preds.shape[1] <= 2 * pad or preds.shape[2] <= 2 * pad:
        # the border crop would empty the image and the mean of an empty
        # slice is NaN, which would silently poison the running ssim_sum
        raise ValueError(
            f"SSIM window {size} needs images larger than {2 * pad} per "
            f"side, got {preds.shape[1]}x{preds.shape[2]}")

    n = preds.shape[0]
    stacked = jnp.concatenate(
        [preds, target, preds * preds, target * target, preds * target],
        axis=0)
    mu_x, mu_y, e_xx, e_yy, e_xy = jnp.split(
        _gaussian_blur_valid(stacked, size, sigma), 5, axis=0)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sig_x = e_xx - mu_x2
    sig_y = e_yy - mu_y2
    sig_xy = e_xy - mu_xy

    num = (2 * mu_xy + c1) * (2 * sig_xy + c2)
    den = (mu_x2 + mu_y2 + c1) * (sig_x + sig_y + c2)
    ssim_map = num / den
    return ssim_map.reshape(n, -1).mean(axis=-1)


# ---------------------------------------------------------------------------
# Regression metrics: MAE / RMSE / SSIM
# ---------------------------------------------------------------------------


def regression_metrics_init() -> Dict[str, jax.Array]:
    z = jnp.zeros((), jnp.float32)
    return {"abs_sum": z, "squared_sum": z, "n_obs": z, "ssim_sum": z, "ssim_n": z}


def regression_metrics_update(state: Dict[str, jax.Array], preds: jax.Array,
                              target: jax.Array, apply_transform: bool = True,
                              data_range: float = 1.0) -> Dict[str, jax.Array]:
    preds = preds.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if apply_transform:
        preds = transform(preds)
        target = transform(target)
    diff = preds - target
    pn = _to_nhw(preds)
    tn = _to_nhw(target)
    ssim_vals = ssim_per_image(pn, tn, data_range=data_range)
    return {
        "abs_sum": state["abs_sum"] + jnp.sum(jnp.abs(diff)),
        "squared_sum": state["squared_sum"] + jnp.sum(diff * diff),
        "n_obs": state["n_obs"] + diff.size,
        "ssim_sum": state["ssim_sum"] + jnp.sum(ssim_vals),
        "ssim_n": state["ssim_n"] + ssim_vals.shape[0],
    }


def regression_metrics_compute(state: Dict[str, jax.Array]) -> Dict[str, float]:
    n = jnp.maximum(state["n_obs"], 1.0)
    return {
        "mae": float(state["abs_sum"] / n),
        "rmse": float(jnp.sqrt(state["squared_sum"] / n)),
        "ssim": float(state["ssim_sum"] / jnp.maximum(state["ssim_n"], 1.0)),
    }


# ---------------------------------------------------------------------------
# Categorical metrics: POD / FAR / CSI / HSS per threshold
# ---------------------------------------------------------------------------


def categorical_metrics_init(n_thresholds: int) -> Dict[str, jax.Array]:
    z = jnp.zeros((n_thresholds,), jnp.float32)
    return {"hits": z, "misses": z, "false": z, "correct": z}


def categorical_metrics_update(state: Dict[str, jax.Array], preds: jax.Array,
                               target: jax.Array,
                               thresholds: Tuple[float, ...]) -> Dict[str, jax.Array]:
    preds = transform(preds.astype(jnp.float32)).reshape(1, -1)
    target = transform(target.astype(jnp.float32)).reshape(1, -1)
    thr = jnp.asarray(thresholds, jnp.float32).reshape(-1, 1)
    tp = preds >= thr
    tt = target >= thr
    return {
        "hits": state["hits"] + jnp.sum(tp & tt, axis=1).astype(jnp.float32),
        "misses": state["misses"] + jnp.sum(~tp & tt, axis=1).astype(jnp.float32),
        "false": state["false"] + jnp.sum(tp & ~tt, axis=1).astype(jnp.float32),
        "correct": state["correct"] + jnp.sum(~tp & ~tt, axis=1).astype(jnp.float32),
    }


def categorical_metrics_compute(state: Dict[str, jax.Array],
                                thresholds: Tuple[float, ...]) -> Dict[str, float]:
    metrics: Dict[str, float] = {}
    for idx, thr in enumerate(thresholds):
        hits = float(state["hits"][idx])
        misses = float(state["misses"][idx])
        false = float(state["false"][idx])
        correct = float(state["correct"][idx])
        pod = hits / (hits + misses + EPS)
        far = false / (hits + false + EPS)
        csi = hits / (hits + misses + false + EPS)
        # REFERENCE QUIRK kept for parity (metric.py:126): the first HSS
        # denominator term is (misses+false)*(false+correct) where the
        # textbook Heidke formula uses (hits+false)*(false+correct) — a
        # perfect forecast scores 2.0 here, not 1.0. The offline exp1 suite
        # uses its own (different, also reference-matching) HSS; both are
        # pinned by the executed-reference oracle tests.
        denom = (misses + false) * (false + correct) + (hits + misses) * (misses + correct)
        hss = 2 * (hits * correct - misses * false) / (denom + EPS)
        prefix = f"cat_thr{thr:.2f}"
        metrics[f"{prefix}/pod"] = pod
        metrics[f"{prefix}/far"] = far
        metrics[f"{prefix}/csi"] = csi
        metrics[f"{prefix}/hss"] = hss
    return metrics


# ---------------------------------------------------------------------------
# Fractional Skill Score across thresholds x spatial scales
# ---------------------------------------------------------------------------


def fss_init(n_thresholds: int, n_scales: int) -> Dict[str, jax.Array]:
    z = jnp.zeros((n_thresholds, n_scales), jnp.float32)
    return {"score_sum": z, "counts": z}


def _fractional_mean(x: jax.Array, scale: int) -> jax.Array:
    """avg_pool2d(kernel=scale, stride=1, padding=scale//2) on (N, H, W)."""
    from ..ops.convs import avg_pool2d

    if scale == 1:
        return x
    y = avg_pool2d(x[..., None], scale, 1, padding=scale // 2)
    return y[..., 0]


def fss_update(state: Dict[str, jax.Array], preds: jax.Array, target: jax.Array,
               thresholds: Tuple[float, ...], scales: Tuple[int, ...]) -> Dict[str, jax.Array]:
    preds = transform(_to_nhw(preds.astype(jnp.float32)))
    target = transform(_to_nhw(target.astype(jnp.float32)))
    scores = []
    for thr in thresholds:
        pm = (preds >= thr).astype(jnp.float32)
        tm = (target >= thr).astype(jnp.float32)
        row = []
        for scale in scales:
            fp = _fractional_mean(pm, int(scale))
            ft = _fractional_mean(tm, int(scale))
            num = jnp.mean((fp - ft) ** 2)
            den = jnp.mean(fp ** 2 + ft ** 2)
            # REFERENCE QUIRK kept for parity (metric.py:166-173): a batch
            # with no pixels above the threshold in pred AND target scores
            # 1.0 (0/EPS) and is counted, inflating high-threshold FSS on
            # dry data; standard FSS treats the no-event case as undefined
            row.append(1.0 - num / (den + EPS))
        scores.append(jnp.stack(row))
    return {
        "score_sum": state["score_sum"] + jnp.stack(scores),
        "counts": state["counts"] + 1.0,
    }


def fss_compute(state: Dict[str, jax.Array], thresholds: Tuple[float, ...],
                scales: Tuple[int, ...]) -> Dict[str, float]:
    metrics: Dict[str, float] = {}
    for ti, thr in enumerate(thresholds):
        for si, scale in enumerate(scales):
            if float(state["counts"][ti, si]) == 0:
                continue
            metrics[f"fss_thr{thr:.2f}_s{int(scale)}"] = float(
                state["score_sum"][ti, si] / state["counts"][ti, si])
    return metrics


# ---------------------------------------------------------------------------
# Orchestrator
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Loss-averaging metrics (reference losses.py:256-310 torchmetrics wrappers:
# WeightedL1Metric / K1LossMetric / ShockDifferenceMetric) as accumulators
# ---------------------------------------------------------------------------


def loss_metric_init() -> Dict[str, jax.Array]:
    z = jnp.zeros((), jnp.float32)
    return {"loss_sum": z, "n_obs": z}


def loss_metric_update(state: Dict[str, jax.Array],
                       loss: jax.Array) -> Dict[str, jax.Array]:
    return {"loss_sum": state["loss_sum"] + loss, "n_obs": state["n_obs"] + 1.0}


def loss_metric_compute(state: Dict[str, jax.Array]) -> float:
    return float(state["loss_sum"] / jnp.maximum(state["n_obs"], 1.0))


def weighted_l1_metric_update(state, preds, target):
    from ..losses import weighted_l1_distance

    return loss_metric_update(state, weighted_l1_distance(preds, target))


def k1_loss_metric_update(state, preds, target, temp_alpha: float = 1.0,
                          k1_alpha: float = 0.0):
    from ..losses import k1_loss

    return loss_metric_update(state, k1_loss(preds, target, temp_alpha, k1_alpha))


def shock_difference_metric_update(state, preds, target, beta: float = 0.02,
                                   border_ignore: int = 2, pool: int = 1):
    from ..losses import shock_map_loss

    return loss_metric_update(
        state, shock_map_loss(preds, target, beta=beta,
                              border_ignore=border_ignore, pool=pool).mean())


@dataclass
class MetricConfig:
    thresholds: Sequence[float] = (0.5, 2.0, 4.0, 8.0)
    scales: Sequence[int] = (1, 2, 4, 8)
    apply_transform: bool = True
    data_range: float = 1.0


class RainfallMetricSuite:
    """Bundles regression/categorical/FSS metrics (reference metric.py:194-229).

    Holds the accumulator pytree; ``update`` runs jitted on device. For
    multi-device runs, ``psum_state`` reduces the pytree across a mesh axis.
    """

    def __init__(self, config: MetricConfig | None = None):
        cfg = config or MetricConfig()
        # freeze the config at construction: the thresholds/scales are baked
        # into the jitted _update closure, so reset()/compute() must read
        # the SAME values — mutating suite.cfg afterwards would silently
        # mislabel the accumulated counts
        self.cfg = MetricConfig(
            thresholds=tuple(float(t) for t in cfg.thresholds),
            scales=tuple(int(s) for s in cfg.scales),
            apply_transform=bool(cfg.apply_transform),
            data_range=float(cfg.data_range))
        self.reset()
        thr = self.cfg.thresholds
        sc = self.cfg.scales

        @jax.jit
        def _update(state, preds, target):
            reg, cat, fss = state
            reg = regression_metrics_update(reg, preds, target,
                                            self.cfg.apply_transform,
                                            self.cfg.data_range)
            cat = categorical_metrics_update(cat, preds, target, thr)
            fss = fss_update(fss, preds, target, thr, sc)
            return reg, cat, fss

        self._update = _update

    def reset(self) -> None:
        self.state = (
            regression_metrics_init(),
            categorical_metrics_init(len(self.cfg.thresholds)),
            fss_init(len(self.cfg.thresholds), len(self.cfg.scales)),
        )

    def update(self, preds, target) -> None:
        self.state = self._update(self.state, preds, target)

    @staticmethod
    def psum_state(state, axis_name: str = "data"):
        """Reduce a sharded accumulator pytree across a mesh axis.

        Call inside ``shard_map``/``pmap`` on the local state; every leaf is
        a sum-accumulator, so a plain psum realizes the reference's
        torchmetrics ``dist_reduce_fx="sum"`` declarations
        (p2igan_bench/metrics/metric.py:45-188)."""
        return jax.tree_util.tree_map(
            lambda x: jax.lax.psum(x, axis_name), state)

    def compute(self) -> Dict[str, float]:
        thr, sc = self.cfg.thresholds, self.cfg.scales
        reg, cat, fss = self.state
        out: Dict[str, float] = {}
        out.update(regression_metrics_compute(reg))
        out.update(categorical_metrics_compute(cat, thr))
        out.update(fss_compute(fss, thr, sc))
        return out


__all__ = [
    "transform",
    "MetricConfig",
    "RainfallMetricSuite",
    "ssim_per_image",
]
