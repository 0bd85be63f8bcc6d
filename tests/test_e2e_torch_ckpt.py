"""North-star path: reference-format torch .pt checkpoint -> full inference.

Builds a synthetic checkpoint with the reference's exact state_dict layout
(as ``torch.save``d by reference train.py:475-485), then drives
``run_inference`` end-to-end: config -> datamodule -> torch import ->
sliding-window reconstruction -> per-event zarr with provenance attrs.
"""

import numpy as np
import torch

from p2igan_tpu.data import fake, zarrlite
from p2igan_tpu.inference.driver import run_inference
from tests.test_torch_import import _synthetic_p2igan_state


def test_infer_from_torch_checkpoint(tmp_path, monkeypatch):
    monkeypatch.setenv("P2IGAN_FORCE_FILE_TRACKER", "1")
    t, base, hw = 4, 16, 32
    fake.write_h5_events(tmp_path / "events", n_events=2, T=10, H=hw, W=hw)
    mask_file = fake.write_gauge_mask(tmp_path / "mask.txt", H=hw, W=hw,
                                     n_gauges=15)

    # reference-format checkpoint dict with a "generator" state_dict
    state = _synthetic_p2igan_state(t=t, base=base, h=hw, w=hw, num_res=4)
    ckpt = {
        "epoch": 1,
        "global_step": 100,
        "generator": {k: torch.from_numpy(v) for k, v in state.items()},
    }
    ckpt_path = tmp_path / "P2IGAN_test.pt"
    torch.save(ckpt, ckpt_path)

    cfg = {
        "seed": 3,
        "save_dir": str(tmp_path / "weights"),
        "model": {"name": "p2igan", "in_channels": 1, "base_channels": base},
        "data": {
            "train": {"data_root": str(tmp_path / "events"), "w": hw, "h": hw,
                      "sample_length": t,
                      "mask": {"type": "stis", "file": str(mask_file)}},
            "test": {"data_root": str(tmp_path / "events"), "w": hw, "h": hw,
                     "sample_length": None},
        },
        "loss": {"use_gan": 0},
        "train": {"optimizer": {"lr": 1e-4}, "batch_size": 1, "num_workers": 1},
    }
    out = run_inference(cfg, checkpoint=str(ckpt_path), stride=t, overlap=2,
                        output=str(tmp_path / "preds.zarr"), overwrite=True)
    g = zarrlite.open(out, mode="r")
    assert g.attrs["checkpoint"].endswith("P2IGAN_test.pt")
    assert g.array_keys() == ["event_01", "event_02"]
    ev = g["event_01"][:]
    assert ev.shape == (10, hw, hw, 1)
    assert np.isfinite(ev).all() and ev.min() >= 0.0
    # tanh output scaled by 255 stays bounded
    assert ev.max() <= 255.0 + 1e-3
