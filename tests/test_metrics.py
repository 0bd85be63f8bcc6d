import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from p2igan_tpu.metrics import metric as M
import pytest


def test_transform_matches_reference():
    x = np.array([0.0, 8.0, 16.0], np.float32)
    ref = (10.0 ** (x * 0.0625)) * 0.036
    np.testing.assert_allclose(ref, np.asarray(M.transform(jnp.asarray(x))), rtol=1e-6)


def _np_gaussian_ssim(a, b, data_range=1.0, size=11, sigma=1.5):
    """Independent numpy SSIM with reflect pad + border crop (torchmetrics style)."""
    from scipy.ndimage import correlate1d

    k = M._gaussian_kernel1d(size, sigma).astype(np.float64)

    def blur(x):
        y = correlate1d(x, k, axis=0, mode="reflect")
        return correlate1d(y, k, axis=1, mode="reflect")

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_a, mu_b = blur(a), blur(b)
    sa = blur(a * a) - mu_a ** 2
    sb = blur(b * b) - mu_b ** 2
    sab = blur(a * b) - mu_a * mu_b
    num = (2 * mu_a * mu_b + c1) * (2 * sab + c2)
    den = (mu_a ** 2 + mu_b ** 2 + c1) * (sa + sb + c2)
    smap = num / den
    pad = (size - 1) // 2
    return smap[pad:-pad, pad:-pad].mean()


def test_ssim_matches_numpy_reference(rng):
    a = rng.random((2, 32, 32)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.normal(size=a.shape), 0, 1).astype(np.float32)
    ours = np.asarray(M.ssim_per_image(jnp.asarray(a), jnp.asarray(b)))
    for i in range(2):
        ref = _np_gaussian_ssim(a[i].astype(np.float64), b[i].astype(np.float64))
        assert abs(ours[i] - ref) < 1e-4
    # identical images -> 1
    same = np.asarray(M.ssim_per_image(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(same, 1.0, atol=1e-5)


def test_regression_metrics(rng):
    preds = rng.random((2, 3, 16, 16, 1)).astype(np.float32)
    target = rng.random((2, 3, 16, 16, 1)).astype(np.float32)
    st = M.regression_metrics_init()
    st = M.regression_metrics_update(st, jnp.asarray(preds), jnp.asarray(target))
    out = M.regression_metrics_compute(st)
    tp = M.transform(jnp.asarray(preds))
    tt = M.transform(jnp.asarray(target))
    mae_ref = float(jnp.mean(jnp.abs(tp - tt)))
    rmse_ref = float(jnp.sqrt(jnp.mean((tp - tt) ** 2)))
    assert abs(out["mae"] - mae_ref) < 1e-5
    assert abs(out["rmse"] - rmse_ref) < 1e-5


def test_categorical_counts(rng):
    thresholds = (0.5, 2.0, 4.0, 8.0)
    preds = (rng.random((40, 8, 8)) * 40).astype(np.float32)
    target = (rng.random((40, 8, 8)) * 40).astype(np.float32)
    # run on *pre-transform* values like the suite does
    pn = np.log10(preds.clip(1e-3) / 0.036) / 0.0625
    tn = np.log10(target.clip(1e-3) / 0.036) / 0.0625
    st = M.categorical_metrics_init(len(thresholds))
    st = M.categorical_metrics_update(st, jnp.asarray(pn), jnp.asarray(tn), thresholds)
    out = M.categorical_metrics_compute(st, thresholds)
    for thr in thresholds:
        hits = np.sum((preds >= thr) & (target >= thr))
        misses = np.sum((preds < thr) & (target >= thr))
        false = np.sum((preds >= thr) & (target < thr))
        pod_ref = hits / (hits + misses + 1e-10)
        csi_ref = hits / (hits + misses + false + 1e-10)
        assert abs(out[f"cat_thr{thr:.2f}/pod"] - pod_ref) < 1e-3
        assert abs(out[f"cat_thr{thr:.2f}/csi"] - csi_ref) < 1e-3


def test_fss_perfect_prediction(rng):
    x = (rng.random((4, 16, 16)) * 20).astype(np.float32)
    xn = np.log10(x.clip(1e-3) / 0.036) / 0.0625
    thresholds, scales = (0.5, 2.0), (1, 2, 4)
    st = M.fss_init(2, 3)
    st = M.fss_update(st, jnp.asarray(xn), jnp.asarray(xn), thresholds, scales)
    out = M.fss_compute(st, thresholds, scales)
    for k, v in out.items():
        assert abs(v - 1.0) < 1e-5


def test_fss_fractions_match_torch_pool(rng):
    x = (rng.random((3, 12, 12)) > 0.5).astype(np.float32)
    ours = np.asarray(M._fractional_mean(jnp.asarray(x), 4))
    ref = F.avg_pool2d(torch.from_numpy(x)[:, None], kernel_size=4, stride=1,
                       padding=2).numpy()[:, 0]
    np.testing.assert_allclose(ref, ours, atol=1e-6)


def test_suite_end_to_end(rng):
    suite = M.RainfallMetricSuite(M.MetricConfig(thresholds=(0.5, 2.0), scales=(1, 2)))
    preds = jnp.asarray(rng.random((1, 2, 16, 16, 1)).astype(np.float32))
    target = jnp.asarray(rng.random((1, 2, 16, 16, 1)).astype(np.float32))
    suite.update(preds, target)
    suite.update(preds, target)
    out = suite.compute()
    assert set(k.split("/")[0] for k in out) >= {"mae", "rmse", "ssim", "cat_thr0.50"}
    suite.reset()
    assert float(suite.state[0]["n_obs"]) == 0.0


def test_plots_example_image():
    from p2igan_tpu.metrics import plots

    rng = np.random.default_rng(0)
    gt = rng.random((3, 8, 8)).astype(np.float32)
    pred = rng.random((3, 8, 8)).astype(np.float32)
    lo, hi = plots.value_range(gt, pred)
    assert lo <= gt.min() and hi >= pred.max()
    assert plots.value_range(gt, pred, scale="fixed", vmin=0, vmax=1) == (0.0, 1.0)
    grid = plots.colorize_grid(gt, pred, lo, hi)
    assert grid.shape == (16, 24, 3) and grid.dtype == np.uint8
    img = plots.example_image(gt, pred)
    assert img.size == (24, 16)


def test_value_range_partial_fixed_bounds():
    """scale='fixed' with only one bound configured fills the other from the
    data instead of crashing epoch-end artifact logging on float(None)."""
    import numpy as np

    from p2igan_tpu.metrics.plots import value_range

    gt = np.asarray([[0.1, 0.4]])
    pred = np.asarray([[0.2, 0.9]])
    assert value_range(gt, pred, scale="fixed", vmin=0.0) == (0.0, 0.9)
    assert value_range(gt, pred, scale="fixed", vmax=1.0) == (0.1, 1.0)
    assert value_range(gt, pred, scale="fixed", vmin=0.0, vmax=2.0) == (0.0, 2.0)


def test_to_nhw_multichannel_folds_channels_into_planes():
    """(B,T,H,W,C>1) must score each channel as its own (H,W) plane, not
    treat the trailing (W,C) pair as the image."""
    import jax.numpy as jnp

    from p2igan_tpu.metrics.metric import _to_nhw

    x = jnp.arange(2 * 3 * 4 * 5 * 2, dtype=jnp.float32).reshape(2, 3, 4, 5, 2)
    out = _to_nhw(x)
    assert out.shape == (2 * 3 * 2, 4, 5)
    # plane content preserved: batch 0, frame 0, channel 1
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(x[0, 0, :, :, 1]))


def test_ssim_small_image_raises():
    """Images the 11x11 window's border crop would empty must raise a named
    error instead of silently poisoning ssim_sum with NaN."""
    x = jnp.zeros((1, 8, 8), jnp.float32)
    with pytest.raises(ValueError, match="SSIM window"):
        M.ssim_per_image(x, x)


def test_suite_config_frozen_at_init():
    """thresholds/scales are baked into the jitted update closure; the suite
    freezes its cfg copy so later mutation of the caller's config object
    cannot desynchronize accumulation from reporting."""
    cfg = M.MetricConfig(thresholds=[0.5, 2.0], scales=[1, 2])
    suite = M.RainfallMetricSuite(cfg)
    cfg.thresholds = (9.0, 99.0)  # caller mutates AFTER construction
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.random((1, 2, 16, 16, 1)).astype(np.float32))
    suite.update(p, p)
    out = suite.compute()
    assert "cat_thr0.50/pod" in out and "cat_thr9.00/pod" not in out
