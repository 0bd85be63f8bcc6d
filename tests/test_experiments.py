import json

import numpy as np
import pytest

from experiments import exp1, exp3
from experiments.io import (ensure_thw, load_zarr_array,
                            mask_for_input, select_by_mask)
from p2igan_tpu.data import fake, zarrlite


def test_ensure_thw_variants(rng):
    base = rng.random((4, 8, 8)).astype(np.float32)
    for shape in [(4, 8, 8), (1, 4, 1, 8, 8), (4, 1, 8, 8), (4, 8, 8, 1)]:
        arr = base.reshape(shape)
        np.testing.assert_array_equal(ensure_thw(arr), base)


def test_select_and_mask_roundtrip(rng):
    arr = rng.random((3, 6, 6)).astype(np.float32)
    mask = rng.random((6, 6)) < 0.3
    sel = select_by_mask(arr, mask)
    assert sel.shape == (3, mask.sum())
    inv = select_by_mask(arr, mask, invert=True)
    assert sel.shape[1] + inv.shape[1] == 36
    zeroed = mask_for_input(arr, mask)
    assert np.all(zeroed[:, mask] == 0)


def test_transform_mmhr_properties():
    arr = np.array([-5.0, 0.0, 24.0, 96.0, 1000.0])
    out = exp1.transform_mmhr(arr)
    # clip >= 0.001 then /3 then 10^(x*0.0625)*0.036, clipped to [0, 200]
    assert out[0] == out[1]  # negatives clipped to 0.001
    expected = 10 ** ((24 / 3) * 0.0625) * 0.036
    assert abs(out[2] - expected) < 1e-9
    assert out[-1] == 200.0


def test_exp1_perfect_prediction(rng):
    truth = {"event_01": (rng.random((6, 32, 32)) * 100).astype(np.float32)}
    preds = {"perfect": {"event_01": truth["event_01"].copy()}}
    mask = rng.random((32, 32)) < 0.1
    res = exp1.run_exp1(preds, truth, mask, mode="gauge", crop_size=32,
                        use_pool8=False)
    m = res["perfect"]
    assert m["MAE"] < 1e-9
    assert m["RMSE"] < 1e-9
    assert abs(m["SSIM"] - 1.0) < 1e-6
    assert abs(m["NSE"] - 1.0) < 1e-6
    assert abs(m["CAT_0.5"]["POD"] - 1.0) < 1e-6
    assert m["CAT_0.5"]["FAR"] < 1e-6


def test_exp1_ssim_global_stats(rng):
    a = rng.random((16, 16))
    b = rng.random((16, 16))
    v = exp1.ssim2d(a, b)
    assert -1.0 <= v <= 1.0
    assert abs(exp1.ssim2d(a, a) - 1.0) < 1e-9


def test_pss_identical_is_one(rng):
    x = (rng.random((4, 16, 16)) * 30).astype(np.float32)
    assert abs(exp1.pss(x, x) - 1.0) < 1e-9


def test_exp2_event_key_sort():
    keys = ["event_10", "event_2", "event_1", "other"]
    import re
    # numeric sort must actually apply (reference bug fixed)
    z = sorted(keys, key=lambda k: (int(re.search(r"event[_-]?(\d+)", k).group(1))
                                    if re.search(r"event[_-]?(\d+)", k) else 10 ** 9, k))
    assert z[:3] == ["event_1", "event_2", "event_10"]


def test_exp3_nse_and_perfect(rng):
    x = rng.random((100,))
    assert abs(exp3.nse(x, x) - 1.0) < 1e-9
    # constant truth -> large negative or nan-safe
    v = exp3.nse(x, np.zeros_like(x) + 0.5)
    assert np.isfinite(v)


@pytest.mark.slow
def test_full_experiment_suite_on_fake_data(tmp_path):
    """End-to-end: fake stores -> exp1/exp2/exp3 outputs on disk."""
    root = tmp_path / "data"
    T, HW = 8, 64
    fake.write_test_zarr(root / "nimrod_test.zarr", n_events=2, T=T, H=HW, W=HW)
    fake.write_gauge_mask(root / "masks" / "gauge_mask_128_train.txt", H=HW, W=HW,
                          n_gauges=30)
    fake.write_gauge_mask(root / "masks" / "gauge_mask_128_test.txt", H=HW, W=HW,
                          n_gauges=30, seed=9)
    # fake "method" prediction stores: truth + noise
    rng = np.random.default_rng(0)
    truth = load_zarr_array(str(root / "nimrod_test.zarr"), return_events=True)
    for method in ("p2igan", "dk"):
        g = zarrlite.open_group(root / "infer" / f"{method}_nimrod.zarr", mode="w")
        for k, v in truth.items():
            noisy = v + rng.normal(0, 2.0, v.shape).astype(np.float32)
            g.create_dataset(k, shape=noisy.shape, dtype="float32", data=noisy)

    econf = {
        "experiment_name": "suite-test",
        "save_dir": str(tmp_path / "results"),
        "mode": "radar",
        "run_exp1": True, "run_exp2_gif": True, "run_exp2_pdf": True,
        "run_exp3": True,
        "exp2_paper_crop_pdf": True,
        "crop_size": HW,
        "exp2_paper_events": [
            {"event_id": 1, "select_idx": [0, 1], "title": "Event 1"},
            {"event_id": 2, "select_idx": [0, 1], "title": "Event 2"},
        ],
        "data": {
            "radar": {
                "observation_path": str(root / "nimrod_test.zarr"),
                "truth_path": str(root / "nimrod_test.zarr"),
                "methods": {"P2IGAN": str(root / "infer" / "p2igan_nimrod.zarr"),
                            "DK": str(root / "infer" / "dk_nimrod.zarr")},
                "mask_train_path": str(root / "masks" / "gauge_mask_128_train.txt"),
                "mask_test_path": str(root / "masks" / "gauge_mask_128_test.txt"),
            },
        },
    }
    cfg_path = tmp_path / "exp.json"
    cfg_path.write_text(json.dumps(econf))

    from experiments.main import main as exp_main

    exp_main(config_path=str(cfg_path))
    out = tmp_path / "results" / "suite-test"
    metrics = json.loads((out / "exp1" / "metrics.json").read_text())
    assert set(metrics) == {"P2IGAN", "DK"}
    assert 0 <= metrics["P2IGAN"]["CAT_0.5"]["POD"] <= 1
    assert (out / "exp1" / "metrics.txt").exists()
    assert (out / "exp2_gif" / "comparison_event_01.gif").exists()
    assert (out / "exp2_gif" / "event_ranges.txt").exists()
    assert (out / "exp2_pdf" / "two_events_stacked_titles.pdf").exists()
    # crop/stitch deliverable (reference exp2.py:571-633) must be produced
    # even without PyMuPDF (PIL fallback over the figure's PNG twin): a
    # valid PDF whose page stitches the two default y-range strips of the
    # rendered page with an 8 px gap
    stitched = out / "exp2_pdf" / "cropped_stitched.pdf"
    assert stitched.exists()
    assert stitched.read_bytes()[:5] == b"%PDF-"
    from PIL import Image

    png_twin = out / "exp2_pdf" / "two_events_stacked_titles.pdf.png"
    assert png_twin.exists()
    W, H = Image.open(png_twin).size
    exp_h = ((round(0.5 * H) - round(0.019 * H))
             + (H - round(0.58 * H)) + 8)
    from experiments.exp2 import crop_pdf_panels

    got = crop_pdf_panels(str(out / "exp2_pdf" / "two_events_stacked_titles.pdf"),
                          str(stitched))
    assert got == (W, exp_h)
    assert (out / "exp3" / "metrics.json").exists()
    assert (out / "exp3" / "nse_boxplot.pdf").exists()
    assert (out / "exp3" / "scatter_panels.pdf").exists()


def test_visualize_and_inspection_scripts(tmp_path, rng, monkeypatch):
    """Smoke the two untested CLI scripts (SURVEY #26/#29): the zarr GIF
    preview and the data-inspection histogram report."""
    import subprocess
    import sys

    store = tmp_path / "preds.zarr"
    z = zarrlite.open(store, mode="w")
    data = rng.random((5, 12, 12)).astype(np.float32) * 30
    z.create_dataset("event_00", shape=data.shape, dtype="float32", data=data)

    gif = tmp_path / "preview.gif"
    subprocess.run(
        [sys.executable, "scripts/visualize.py", "--zarr", str(store),
         "--output", str(gif), "--num-frames", "3"],
        check=True, capture_output=True)
    assert gif.exists() and gif.stat().st_size > 0

    cfg = {"save_dir": str(tmp_path / "results"), "mode": "radar",
           "data": {"radar": {"observation_path": str(store),
                              "truth_path": str(store),
                              "methods": {"P2IGAN": str(store),
                                          "missing": str(tmp_path / "nope.zarr")},
                              "mask_train_path": "", "mask_test_path": ""}}}
    cfg_path = tmp_path / "inspect.json"
    cfg_path.write_text(json.dumps(cfg))
    monkeypatch.setenv("P2I_EXPERIMENTS_CONFIG", str(cfg_path))
    from experiments.test import main as inspect_main

    inspect_main()
    out = tmp_path / "results" / "data_inspection" / "value_histograms.png"
    assert out.exists() and out.stat().st_size > 0


def test_exp1_event_pairing_survives_missing_and_short_events(rng):
    """Per-event alignment: a method missing event_02 (or holding a shorter
    event) must still score its remaining events against the RIGHT truth
    frames. The old global tail-truncate silently paired event_03 predictions
    with event_02 truth."""
    truth = {f"event_{i:02d}": (rng.random((6, 32, 32)) * 100).astype(np.float32)
             for i in (1, 2, 3)}
    mask = rng.random((32, 32)) < 0.2

    # perfect predictions for events 1 and 3; event 2 entirely absent
    preds = {"gappy": {"event_01": truth["event_01"].copy(),
                       "event_03": truth["event_03"].copy()}}
    res = exp1.run_exp1(preds, truth, mask, mode="gauge", crop_size=32,
                        use_pool8=False)
    assert res["gappy"]["MAE"] < 1e-9
    assert abs(res["gappy"]["NSE"] - 1.0) < 1e-6

    # event_01 prediction 2 frames short but exact where present
    preds = {"short": {k: v.copy() if k != "event_01" else v[:4].copy()
                       for k, v in truth.items()}}
    res = exp1.run_exp1(preds, truth, mask, mode="gauge", crop_size=32,
                        use_pool8=False)
    assert res["short"]["MAE"] < 1e-9

    # flat pre-concatenated array methods still appear in the report
    flat = np.concatenate([truth[k] for k in truth], axis=0)
    res = exp1.run_exp1({"flat": flat}, truth, mask, mode="gauge",
                        crop_size=32, use_pool8=False)
    assert res["flat"]["MAE"] < 1e-9


def test_exp3_event_pairing_survives_missing_events(tmp_path, rng):
    """run_exp3's aggregates must pair each method's events with their own
    truth; a method missing an event drops that event for that method only."""
    from experiments import exp3

    truth = {f"event_{i:02d}": (rng.random((5, 32, 32)) * 100).astype(np.float32)
             for i in (1, 2, 3)}
    mask = rng.random((32, 32)) < 0.2
    preds = {"gappy": {"event_01": truth["event_01"].copy(),
                       "event_03": truth["event_03"].copy()},
             "full": {k: v.copy() for k, v in truth.items()}}
    metrics = exp3.run_exp3(preds, truth, mask, mode="gauge", crop_size=32,
                            out_dir=str(tmp_path))
    assert abs(metrics["NSE_gappy"] - 1.0) < 1e-6
    assert abs(metrics["NSE_full"] - 1.0) < 1e-6


def test_exp3_accepts_flat_prediction_store():
    """A legacy flat (non-dict) prediction array pairs against the truth
    events sequentially — the layout exp1 already accepts — instead of being
    silently dropped from every exp3 aggregate."""
    from experiments.exp3 import _per_event_pass

    rng = np.random.default_rng(5)
    truth = {"event_01": rng.random((4, 16, 16)).astype(np.float32),
             "event_02": rng.random((6, 16, 16)).astype(np.float32)}
    flat = np.concatenate([truth["event_01"], truth["event_02"]], axis=0)
    mask = np.ones((16, 16), np.float32)
    paired, scores = _per_event_pass(
        {"flat": flat * 0.9, "keyed": {k: v * 0.9 for k, v in truth.items()}},
        truth, mask, "radar", 16)
    assert set(paired) == {"flat", "keyed"}
    np.testing.assert_allclose(paired["flat"][0], paired["keyed"][0])
    assert len(scores["flat"]) == 2
    np.testing.assert_allclose(scores["flat"], scores["keyed"])
