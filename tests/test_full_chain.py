"""Full benchmark chain: fake h5 events -> tozarr truth store -> train ->
sliding-window inference -> offline experiments suite over the real outputs.

This is the framework-level equivalent of the reference's documented workflow
(README: prepare data -> train.py -> infer.py -> experiments.main)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from p2igan_tpu.data import fake, zarrlite
from p2igan_tpu.inference.driver import run_inference
from p2igan_tpu.training.trainer import Trainer


@pytest.mark.slow
def test_fake_data_to_experiments(tmp_path, monkeypatch):
    monkeypatch.setenv("P2IGAN_FORCE_FILE_TRACKER", "1")
    hw, t = 32, 4
    events_dir = tmp_path / "test_events"
    fake.write_h5_events(events_dir, n_events=2, T=10, H=hw, W=hw)
    mask_train = fake.write_gauge_mask(tmp_path / "masks" / "train.txt", H=hw,
                                       W=hw, n_gauges=12, seed=1)
    mask_test = fake.write_gauge_mask(tmp_path / "masks" / "test.txt", H=hw,
                                      W=hw, n_gauges=12, seed=2)

    # truth store via the tozarr CLI (event_%02d keys match inference order)
    truth_zarr = tmp_path / "nimrod_test.zarr"
    subprocess.run([sys.executable, "scripts/tozarr.py", "--h5-dir",
                    str(events_dir), "--output", str(truth_zarr)], check=True)
    tz = zarrlite.open(truth_zarr)
    assert tz.array_keys() == ["event_01", "event_02"]

    cfg = {
        "seed": 5,
        "save_dir": str(tmp_path / "weights"),
        "model": {"name": "simple", "in_channels": 1, "base_channels": 4},
        "data": {
            "train": {"data_root": str(events_dir), "w": hw, "h": hw,
                      "sample_length": t,
                      "mask": {"type": "stis", "file": str(mask_train)}},
            "test": {"data_root": str(events_dir), "w": hw, "h": hw,
                     "sample_length": None},
        },
        "loss": {"use_gan": 0, "k1_weight": 0.0},
        "train": {"optimizer": {"lr": 1e-3}, "batch_size": 2, "num_workers": 1,
                  "iterations": 2, "log_step": 1, "use_validation": False},
    }
    Trainer(cfg).train()
    preds_zarr = run_inference(cfg, stride=t, overlap=1,
                               output=str(tmp_path / "infer" / "p2igan.zarr"),
                               overwrite=True)

    econf = {
        "experiment_name": "chain", "save_dir": str(tmp_path / "results"),
        "mode": "radar", "run_exp1": True, "run_exp2_gif": False,
        "run_exp2_pdf": False, "run_exp3": True, "crop_size": hw,
        "data": {"radar": {
            "observation_path": str(truth_zarr),
            "truth_path": str(truth_zarr),
            "methods": {"P2IGAN": str(preds_zarr)},
            "mask_train_path": str(mask_train),
            "mask_test_path": str(mask_test),
        }},
    }
    cfg_path = tmp_path / "exp.json"
    cfg_path.write_text(json.dumps(econf))
    from experiments.main import main as exp_main

    exp_main(config_path=str(cfg_path))
    metrics = json.loads(
        (tmp_path / "results" / "chain" / "exp1" / "metrics.json").read_text())
    m = metrics["P2IGAN"]
    for key in ("MAE", "RMSE", "SSIM", "NSE", "CAT_0.5"):
        assert key in m
    assert np.isfinite(m["MAE"]) and m["MAE"] >= 0
    exp3 = json.loads(
        (tmp_path / "results" / "chain" / "exp3" / "metrics.json").read_text())
    assert "NSE_P2IGAN" in exp3


@pytest.mark.slow
def test_bench_small_staged_output():
    """bench.py's staged-output discipline (round-2 postmortem: BENCH_r02
    timed out with ZERO captured output). Every stage must print a complete,
    parseable, CUMULATIVE JSON line the moment it lands, so a driver timeout
    preserves all finished stages. BENCH_SMALL=1 shrinks the geometry so all
    three stages (inference / train / families) run the real code paths on
    the CPU backend in seconds."""
    env = dict(os.environ, BENCH_SMALL="1", JAX_PLATFORMS="cpu")
    env.pop("BENCH_FULL", None)
    out = subprocess.run([sys.executable, "bench.py"], env=env, check=True,
                         capture_output=True, text=True, timeout=900)
    lines = [json.loads(ln) for ln in out.stdout.strip().splitlines()]
    assert [ln["stages_done"] for ln in lines] == [
        ["inference"], ["inference", "train"],
        ["inference", "train", "families"],
        ["inference", "train", "families", "family_train"]]
    # each staged line is a complete superset of the previous: whichever
    # line is last when a timeout hits carries every finished stage
    for prev, cur in zip(lines, lines[1:]):
        assert set(prev) <= set(cur)
    final = lines[-1]
    assert final["unit"] == "events/sec"
    assert final["value"] and final["value"] > 0
    for key in ("events_per_sec_batched", "mfu_inference",
                "gan_steps_per_sec", "gan_samples_per_sec", "mfu_train",
                "dk_events_per_sec", "stdk_events_per_sec",
                "simple_events_per_sec", "dk_train_steps_per_sec",
                "stdk_train_steps_per_sec", "simple_train_steps_per_sec"):
        assert final.get(key), key
    # run-to-run spread rows (VERDICT r4 item 8): [min, max] around medians
    for key in ("events_per_sec_spread", "gan_steps_per_sec_spread",
                "simple_events_per_sec_spread",
                "dk_train_steps_per_sec_spread"):
        lo, hi = final[key]
        assert 0 < lo <= hi
    assert not [k for k in final if k.endswith("_error")]


@pytest.mark.slow
def test_convergence_smoke_tiny(tmp_path):
    """scripts/convergence_smoke.py end-to-end at toy size on CPU: the
    real CLI training path records a rec-loss trajectory, renders an
    example image, and the harness parses/judges it (VERDICT r4 item 4b;
    the on-chip 400-step run's trajectory lives in BASELINE.md)."""
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               P2I_SMOKE_DIR=str(tmp_path / "smoke"))
    out = subprocess.run(
        [sys.executable, "scripts/convergence_smoke.py", "--steps", "6",
         "--log-step", "2", "--events", "4", "--event-frames", "12",
         "--size", "32", "--frames", "4", "--batch", "2",
         "--learn-ratio", "1e9", "--fresh"],
        env=env, check=True, capture_output=True, text=True, timeout=420)
    assert "rec-loss trajectory" in out.stdout
    assert "LEARNS" in out.stdout  # ratio gate disabled: parse-path check
    runs = list((tmp_path / "smoke" / "mlruns").glob(
        "convergence-smoke/*/metrics.jsonl"))
    assert runs, out.stdout
