"""run_exp1 end-to-end parity against the REFERENCE's executed exp1.

Loads ``/root/reference/experiments`` under an alias package (the repo's own
top-level ``experiments`` keeps its name) and compares full metric reports on
a shared fake dataset, radar and gauge modes (VERDICT item 2; oracle
``/root/reference/experiments/exp1.py:191-242``).
"""

from __future__ import annotations

import importlib
import importlib.util
import sys

import numpy as np
import pytest

REF_EXPERIMENTS = "/root/reference/experiments"


@pytest.fixture(scope="module")
def ref_exp1():
    if "ref_experiments" not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            "ref_experiments", REF_EXPERIMENTS + "/__init__.py",
            submodule_search_locations=[REF_EXPERIMENTS])
        pkg = importlib.util.module_from_spec(spec)
        sys.modules["ref_experiments"] = pkg
        spec.loader.exec_module(pkg)
    return importlib.import_module("ref_experiments.exp1")


def _fake_eval_dataset(seed=0, n_events=3, h=24, w=24):
    rng = np.random.default_rng(seed)
    lengths = [10, 14, 12][:n_events]
    truth = {f"event_{i:02d}": (rng.random((t, h, w)) * 2.5).astype(np.float32)
             for i, t in enumerate(lengths)}
    preds = {}
    for method, noise in (("m_good", 0.05), ("m_bad", 0.6)):
        preds[method] = {
            k: np.clip(v + rng.normal(0, noise, v.shape), 0, None).astype(np.float32)
            for k, v in truth.items()}
    mask = np.zeros((16, 16), bool)
    mask[rng.integers(0, 16, 40), rng.integers(0, 16, 40)] = True
    return preds, truth, mask


def _flatten(d, prefix=""):
    out = {}
    for k, v in d.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "."))
        else:
            out[key] = v
    return out


@pytest.mark.parametrize("mode", ["radar", "gauge"])
@pytest.mark.parametrize("use_pool8", [True, False])
def test_run_exp1_matches_reference(ref_exp1, mode, use_pool8):
    from experiments.exp1 import run_exp1

    preds, truth, mask = _fake_eval_dataset()
    kw = dict(mask=mask, mode=mode, crop_size=16, use_pool8=use_pool8)
    want = _flatten(ref_exp1.run_exp1(preds, truth, **kw))
    got = _flatten(run_exp1(preds, truth, **kw))

    assert set(got) == set(want)
    for key in want:
        np.testing.assert_allclose(
            got[key], want[key], rtol=2e-5, atol=1e-7,
            err_msg=f"{mode}/pool8={use_pool8}: {key}")


def test_run_exp1_flat_arrays_match_reference(ref_exp1):
    """Non-dict (already concatenated) input path."""
    from experiments.exp1 import run_exp1

    preds, truth, mask = _fake_eval_dataset(seed=3)
    flat_truth = np.concatenate(list(truth.values()), axis=0)
    flat_preds = {k: np.concatenate(list(v.values()), axis=0)
                  for k, v in preds.items()}
    kw = dict(mask=mask, mode="radar", crop_size=16)
    want = _flatten(ref_exp1.run_exp1(flat_preds, flat_truth, **kw))
    got = _flatten(run_exp1(flat_preds, flat_truth, **kw))
    for key in want:
        np.testing.assert_allclose(got[key], want[key], rtol=2e-5, atol=1e-7,
                                   err_msg=key)


def test_transform_and_helpers_match_reference(ref_exp1):
    from experiments.exp1 import (categorical_metrics, delta_tssim, nse, pss,
                                  ssim_spatial, transform_mmhr)

    rng = np.random.default_rng(7)
    x = (rng.random((6, 20, 20)) * 3).astype(np.float32)
    y = (rng.random((6, 20, 20)) * 3).astype(np.float32)

    np.testing.assert_allclose(transform_mmhr(x), ref_exp1.transform_mmhr(x))
    np.testing.assert_allclose(transform_mmhr(x, divide_by_3=False),
                               ref_exp1.transform_mmhr(x, divide_by_3=False))
    np.testing.assert_allclose(nse(x, y), ref_exp1.nse(x, y), rtol=1e-7)
    np.testing.assert_allclose(pss(x, y), ref_exp1.pss(x, y), rtol=1e-6)
    np.testing.assert_allclose(ssim_spatial(x, y, use_pool8=False),
                               ref_exp1.ssim_spatial(x, y, use_pool8=False),
                               rtol=2e-5)
    np.testing.assert_allclose(delta_tssim(x, y, lag=2),
                               ref_exp1.delta_tssim(x, y, lag=2),
                               rtol=2e-4, atol=1e-6)
    for thr in (0.5, 2.0):
        w = ref_exp1.categorical_metrics(x, y, thr)
        g = categorical_metrics(x, y, thr)
        for k in w:
            np.testing.assert_allclose(g[k], w[k], rtol=1e-7, err_msg=k)


@pytest.mark.parametrize("mode", ["radar", "gauge"])
def test_run_exp3_metrics_match_reference(ref_exp1, mode, tmp_path):
    """run_exp3 aggregate + boxplot inputs vs the executed reference exp3
    (figures are written by both; the comparison is the metric values)."""
    import importlib

    ref_exp3 = importlib.import_module("ref_experiments.exp3")
    from experiments.exp3 import run_exp3

    preds, truth, mask = _fake_eval_dataset(seed=11)
    want = ref_exp3.run_exp3(preds, truth, mask, mode, 16,
                             str(tmp_path / "ref"))
    got = run_exp3(preds, truth, mask, mode, 16, str(tmp_path / "ours"))
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-6, err_msg=k)


def test_nse_per_frame_matches_reference(ref_exp1):
    import importlib

    ref_exp3 = importlib.import_module("ref_experiments.exp3")
    from experiments.exp3 import nse_per_frame

    rng = np.random.default_rng(13)
    pred = (rng.random((8, 16, 16)) * 3).astype(np.float32)
    gt = (rng.random((8, 16, 16)) * 3).astype(np.float32)
    pred[2, 3, 4] = np.nan  # non-finite pixels dropped per frame
    mask = np.zeros((16, 16), bool)
    mask[rng.integers(0, 16, 30), rng.integers(0, 16, 30)] = True
    for mode in ("radar", "gauge"):
        want = ref_exp3._nse_per_frame(pred, gt, mask, mode)
        got = nse_per_frame(pred, gt, mask, mode)
        np.testing.assert_allclose(got, want, rtol=1e-6, equal_nan=True,
                                   err_msg=mode)
